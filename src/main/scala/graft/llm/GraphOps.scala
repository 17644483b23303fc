package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Materializer

/** Link-graph centrality — the page-importance signal web-scale
  * corpus curation weights documents by (CommonCrawl-style crawls
  * rank hosts/pages before content filters ever run).
  *
  * PageRank here is the classic bulk-synchronous iteration: one keyed
  * join (edges ⋈ ranks) + one hash aggregate per round — Spark's
  * canonical iterative-graph shape. Two deliberate design points:
  *
  *  - **Integer arithmetic end-to-end.** Ranks live in micro-units
  *    (`scale` per node at init); each round applies
  *    `floor(rank / outdeg)` per edge and damping as
  *    `(num * Σ) div den`. Integer sums are order-independent, so the
  *    result is BIT-IDENTICAL under any partitioning, shuffle order,
  *    or engine — the property that lets a DuckDB oracle replay the
  *    iteration exactly (floating-point PageRank differs in the last
  *    ulps between engines and even between runs). The floor loses
  *    ≤1 micro-unit per edge per round: deterministic, negligible at
  *    scale=1e6, and identical on both sides.
  *  - **Ranks stay a (node, rank) table.** Edges are the big side and
  *    are never re-shuffled between rounds once keyed; the rank table
  *    is |V| rows — when |V| ≪ |E| (every real link graph) Spark
  *    broadcasts it into the join (plan-asserted), so a round costs
  *    one scan of the edge list + one aggregate. At 100 TB of edges
  *    with |V| past broadcast range, the same plan degrades to a
  *    co-partitioned shuffle join on `src` — freeze the edge list
  *    through `mat = Materializer.Bucketed(n)` (bucketed by `src`,
  *    [[graft.sources.Materializer]]) and the per-round shuffle
  *    disappears too. For horizons past a handful of rounds,
  *    `localCheckpoint` the rank table every ~5 rounds to truncate
  *    lineage.
  *
  * Every operator here takes a `mat: Materializer` deciding HOW the
  * static per-round intermediates (edge list + degrees, node set)
  * freeze: `Local` (localCheckpoint — local-mode default, lost on
  * executor failure), `Reliable` (HDFS/S3 checkpoint — survives
  * executor churn on a real cluster), `Bucketed` (catalog table keyed
  * on the round-join key — reliable AND exchange-free rounds), or
  * `Lazy` (no freeze; every round re-derives — correct but k-round =
  * (k+1)-derivation cost).
  */
object GraphOps {

  /** Fixed-iteration integer PageRank.
    *
    * @param edges   directed edge list; dangling nodes (outdeg 0) get
    *                no out-contribution but still receive teleport mass
    * @param iters   bulk-synchronous rounds (each: join + aggregate)
    * @param dampNum / @param dampDen damping factor as a ratio (85/100)
    * @param scale   micro-unit scale; init rank per node, teleport =
    *                `scale * (dampDen - dampNum) div dampDen`
    * @return (node LONG, rank LONG) — total mass ≈ |V| * scale
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int, dampNum: Long = 85L, dampDen: Long = 100L,
                  scale: Long = 1000000L,
                  mat: Materializer = Materializer.Local,
                  broadcastRanks: Boolean = true,
                  freezeEvery: Int = 8): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    require(freezeEvery >= 0)
    def hint(df: DataFrame) = if (broadcastRanks) broadcast(df) else df
    // Freeze the deduped edge list FIRST: three consumers follow (the
    // degree aggregate, the join probe side, and the node set), and
    // unfrozen each one re-derives the upstream plan — for an edge
    // list built from a join, that is three executions of the join +
    // distinct (measured 4.8 s → 3.1 s on g1_pagerank at sf0.1 from
    // this one change; guide §2.4 "remove shuffles outright").
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct(),
      Seq("src"), "pr_e")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Static across rounds: edge list with outdegree, and the node set.
    // Under one lazy plan each round would RE-DERIVE both from the raw
    // input (k rounds = k+1 scans of the upstream joins); `mat` freezes
    // them once — Bucketed keys the edge table by `src`, the column
    // every round joins ranks on, so past-broadcast rounds run
    // exchange-free on the edge side. A checkpointed edge table has NO
    // catalyst size stats (Scan ExistingRDD), so the |V|-sized
    // rank/summed sides carry an explicit broadcast hint
    // (`broadcastRanks`); set it false past broadcast range and the
    // rounds run as co-partitioned joins.
    val ed = mat.freeze(e.join(deg, "src"), Seq("src"), "pr_edges")
    val nodes = mat.freeze(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(),
      Seq("node"), "pr_nodes")
    val teleport = scale * (dampDen - dampNum) / dampDen

    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    for (i <- 1 to iters) {
      val contrib = ed
        .join(hint(rank.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
      val summed = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(hint(summed), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("rank"))
      // rank lineage grows by one join+agg layer per round; at deep
      // iteration counts catalyst analysis dominates the round time.
      // Freezing the |V|-row rank table every freezeEvery rounds caps
      // plan depth — bit-identical values (spec-pinned at several
      // cadences); 0 disables (the fully unrolled oracle-replay shape)
      if (freezeEvery > 0 && i % freezeEvery == 0 && i < iters && mat.frozen)
        rank = mat.freeze(rank, Seq("node"), s"pr_rank_$i")
    }
    rank
  }

  /** [[pageRankInt]] over WEIGHTED edges: node `u`'s rank splits
    * proportionally to integer edge weights —
    * `contribution(u→v) = (rank(u) * w(u,v)) div Σ_out w(u,·)` —
    * the natural form when an edge carries multiplicity (purchase
    * counts, link counts, co-occurrence) instead of mere existence.
    * Duplicate (src, dst) rows pre-aggregate into one weighted edge.
    * Same integer-determinism and broadcast-rank properties; with all
    * weights 1 it reduces exactly to [[pageRankInt]] (spec-pinned).
    */
  def pageRankWeightedInt(edges: DataFrame, srcCol: String, dstCol: String,
                          weightCol: String, iters: Int,
                          dampNum: Long = 85L, dampDen: Long = 100L,
                          scale: Long = 1000000L,
                          mat: Materializer = Materializer.Local,
                          broadcastRanks: Boolean = true,
                          freezeEvery: Int = 8): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    require(freezeEvery >= 0)
    def hint(df: DataFrame) = if (broadcastRanks) broadcast(df) else df
    // freeze the aggregated edge list first — same three-consumer
    // re-derivation as pageRankInt (see the comment there)
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"),
          col(weightCol).cast("long").as("w"))
        .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w")),
      Seq("src"), "prw_e")
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val ed = mat.freeze(e.join(deg, "src"), Seq("src"), "prw_edges")
    val nodes = mat.freeze(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(),
      Seq("node"), "prw_nodes")
    val teleport = scale * (dampDen - dampNum) / dampDen

    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    for (i <- 1 to iters) {
      val contrib = ed
        .join(hint(rank.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          expr("(rank * w) div outw").as("c"))
      val summed = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(hint(summed), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("rank"))
      // same deep-iteration lineage cap as pageRankInt (bit-identical)
      if (freezeEvery > 0 && i % freezeEvery == 0 && i < iters && mat.frozen)
        rank = mat.freeze(rank, Seq("node"), s"prw_rank_$i")
    }
    rank
  }

  /** Synchronous min-label propagation — the label-propagation shape
    * of connected components (each round every node takes the minimum
    * label in its closed neighborhood; after diameter rounds labels
    * equal per-component minima). Exposed at a FIXED round count so
    * the result is a deterministic, oracle-replayable intermediate
    * state — the alternating large-star/small-star loop
    * ([[DedupOps.clusterNearDups]]) remains the production CC path
    * (O(log L) rounds vs diameter); this is the bounded-round probe
    * of convergence a pipeline runs to decide whether a graph is
    * "mostly one blob" before paying for the full loop.
    *
    * Integer labels + min-aggregation are order-independent, so the
    * result is bit-identical under any partitioning — same discipline
    * as [[pageRankInt]], same per-round cost shape (one join of the
    * static symmetric edge list against the |V|-row label table +
    * one min-aggregate; labels broadcast while |V| ≪ |E|).
    */
  def minLabelPropagate(edges: DataFrame, srcCol: String, dstCol: String,
                        iters: Int,
                        mat: Materializer = Materializer.Local,
                        broadcastLabels: Boolean = true,
                        ckptEvery: Int = 5): DataFrame = {
    require(iters >= 0)
    require(ckptEvery > 0, "ckptEvery must be positive")
    def hint(df: DataFrame) = if (broadcastLabels) broadcast(df) else df
    val raw = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // symmetric edge set frozen keyed by `b` — the side every round's
    // neighbor-label join probes. union(raw, raw.swap) looks like it
    // derives `raw` twice, but ReuseExchange shares the upstream
    // join's shuffles between the branches and the two projections run
    // in parallel — measured FASTER than an explode-based single-scan
    // symmetrization at sf0.1 (g4_label_prop 2.83 s vs 3.16 s), so the
    // union form stays.
    val e = mat.freeze(
      raw.union(raw.select(col("b").as("a"), col("a").as("b"))).distinct(),
      Seq("b"), "lp_edges")
    val nodes = mat.freeze(e.select(col("a").as("node")).distinct(),
      Seq("node"), "lp_nodes")
    var lab = nodes.select(col("node"), col("node").as("label"))
    for (i <- 1 to iters) {
      val neigh = e.join(hint(lab.withColumnRenamed("node", "b")
          .withColumnRenamed("label", "nl")), "b")
        .groupBy(col("a").as("node")).agg(min(col("nl")).as("nmin"))
      lab = lab.join(hint(neigh), Seq("node"), "left")
        .select(col("node"), least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // each round references `lab` TWICE (as the join's probe side and
      // inside `neigh`), so an unfrozen label table doubles the plan
      // per round — 2^iters subtree copies by the end, which stalls
      // catalyst long before data size matters (observed at iters=21
      // on a 60-node graph). Freezing the |V|-row label table every
      // ckptEvery rounds caps growth at 2^ckptEvery between freezes;
      // deep-diameter probes stay linear-time. Lazy deliberately keeps
      // the unbounded form (single-digit-round probes only).
      if (i % ckptEvery == 0 && i < iters && mat.frozen)
        lab = mat.freeze(lab, Seq("node"), s"lp_lab_$i")
    }
    lab
  }

  /** Triangle census by degree-ordered edge orientation (the
    * MapReduce-clustering-coefficient classic — Suri & Vassilvitskii,
    * WWW'11). Input is an undirected edge list in either/both
    * directions; self-loops and duplicates are dropped.
    *
    * Why orientation matters at scale: counting wedges u—v—w from the
    * raw adjacency puts Σ deg(u)² pairs through the shuffle — a
    * single celebrity node with degree 10⁶ alone contributes 10¹²
    * wedges. Directing every edge from its lower-(degree, id) endpoint
    * to its higher one makes every out-degree ≤ O(√|E|) (a node of
    * degree d only keeps out-edges to neighbors of degree ≥ d), so the
    * wedge join is bounded by Σ outdeg(u)² ≤ |E|^{3/2} regardless of
    * skew — the optimal exponent for triangle enumeration. Each
    * triangle is then produced exactly once (its vertices appear in
    * strict rank order), so the count needs no /3 correction.
    *
    * Plan shape: two shuffles to build (edge ⋈ degree) on each
    * endpoint, one self-join on the shared low vertex (wedge
    * generation), one semi-ish inner join probing wedges against the
    * oriented edge set, one global count. All integer arithmetic —
    * bit-identical under any partitioning, so a SQL oracle can replay
    * it exactly.
    *
    * @return one row: n_nodes, n_edges (undirected, deduped),
    *         n_wedges (open two-paths Σ C(deg,2)), n_triangles,
    *         gcc_ppm = 3·triangles·10⁶ div wedges (global clustering
    *         coefficient in parts-per-million; 0 when wedge-free)
    */
  def triangleStats(edges: DataFrame, srcCol: String, dstCol: String,
                    mat: Materializer = Materializer.Local): DataFrame = {
    // canonical undirected edge set: (lo, hi), no loops, no dups.
    // Five downstream branches (degree, orientation, wedge self-join
    // probe, and the four census aggregates) all consume `e`; under
    // one lazy plan each branch re-derives it from the raw input —
    // for a derived edge list (e.g. a co-occurrence self-join) that
    // multiplies the most expensive stage of the whole query.
    // `mat` caps it at one derivation (Bucketed keys by `u`, the
    // wedge-closing probe's leading join column; Reliable for
    // executor-churn clusters).
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct(),
      Seq("u"), "tri_edges")
    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, node): strict total order, ties broken by id
    val withDeg = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
    val oriented = withDeg.select(
      when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    // wedges from the shared LOW-rank vertex, endpoint pair
    // canonicalized by id; the closing probe then goes against the
    // id-canonical undirected edge set `e` itself — a pure equi-join
    // on (wa, wb), hash-joinable (an OR over the two stored
    // orientations would force a nested-loop join)
    val o2 = oriented.select(col("s").as("s2"), col("t").as("t2"))
    val wedges = oriented.join(o2, col("s") === col("s2") && col("t") < col("t2"))
      .select(col("t").as("wa"), col("t2").as("wb"))
    val triangles = wedges.join(e, col("wa") === col("u") && col("wb") === col("v"))
    val nNodes = deg.agg(count(lit(1)).as("n")).select(col("n"))
    val nEdges = e.agg(count(lit(1)).as("n")).select(col("n"))
    val nWedges = deg.agg(sum(expr("deg * (deg - 1) div 2")).as("n")).select(col("n"))
    val nTri = triangles.agg(count(lit(1)).as("n")).select(col("n"))
    broadcast(nNodes.select(col("n").as("n_nodes")))
      .crossJoin(broadcast(nEdges.select(col("n").as("n_edges"))))
      .crossJoin(broadcast(nWedges.select(col("n").as("n_wedges"))))
      .crossJoin(broadcast(nTri.select(col("n").as("n_triangles"))))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(0L))
          .otherwise(expr("(3 * n_triangles * 1000000) div n_wedges")).as("gcc_ppm"))
  }

  /** Bounded-round k-core peeling probe: each round drops every node
    * of degree < k (with its edges) and reports the shrinking graph —
    * the density-core extraction that separates a link graph's
    * load-bearing web from its pendant fringe (spam/SEO link farms
    * peel off in early rounds; true k-core membership is the
    * fixpoint, which bounded rounds approach monotonically — same
    * bounded-probe contract as [[minLabelPropagate]]).
    *
    * Per round: one degree aggregate and two LEFT-SEMI joins against
    * the surviving-node set (never materializing a node×node
    * structure), with the edge set frozen per round so the next
    * round's two consumers re-read files rather than re-deriving the
    * peel. All-integer output — replayable by an unrolled oracle.
    *
    * @param edges undirected edge list; both directions are derived
    *              internally, self-loops dropped
    * @return one row per round: `round, n_nodes, n_edges,
    *         node_checksum` (Σ surviving node ids) AFTER that round's
    *         peel, ordered by round
    */
  def kCoreProbe(edges: DataFrame, srcCol: String, dstCol: String,
                 k: Int, rounds: Int,
                 mat: Materializer = Materializer.Local): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val raw = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // union form kept deliberately — see [[minLabelPropagate]]'s
    // ReuseExchange note (explode-symmetrize measured slower)
    var e = mat.freeze(
      raw.union(raw.select(col("b").as("a"), col("a").as("b"))).distinct(),
      Seq("a"), "kcore_e0")
    val perRound = (1 to rounds).map { r =>
      val deg = e.groupBy(col("a")).agg(count(lit(1)).as("__deg"))
      val keep = deg.filter(col("__deg") >= k).select(col("a").as("__n"))
      val e2 = e
        .join(keep.withColumnRenamed("__n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("__n", "b"), Seq("b"), "left_semi")
      e = mat.freeze(e2, Seq("a"), s"kcore_e$r")
      e.agg(
          countDistinct(col("a")).as("n_nodes"),
          count(lit(1)).as("n_edges"),
          coalesce(sum_distinct(col("a")), lit(0L)).as("node_checksum"))
        .select(lit(r.toLong).as("round"), col("n_nodes"), col("n_edges"),
          col("node_checksum"))
    }
    perRound.reduce(_ unionByName _).orderBy(col("round"))
  }

  /** Integer HITS (Kleinberg 1999): hub and authority scores on a
    * DIRECTED graph — authorities are endorsed by good hubs, hubs
    * endorse good authorities. On a bipartite purchase graph
    * (customer → supplier) the two sides get separately meaningful
    * rankings, which PageRank's single score conflates.
    *
    * Bit-replayable like [[pageRankInt]]: scores live on the integer
    * `scale` grid; each half-step is Σ neighbor scores followed by
    * max-normalization `s·scale div max` — exact Long arithmetic, so
    * an unrolled SQL oracle reproduces every value. Standard update
    * order within a round: authorities from the PREVIOUS hubs, then
    * hubs from the NEW authorities. (Long bound: Σ in-scores ≤
    * deg·scale and the normalize multiply adds ×scale — exact to
    * deg ≈ 9×10⁶ at scale 10⁶; promote to decimal beyond.)
    *
    * Scale shape mirrors [[pageRankInt]]: the edge table freezes once
    * (bucketed by the join side), per-round score tables carry the
    * `broadcastScores` hint while |V| is broadcastable, flip it false
    * past that and rounds run as keyed shuffle joins.
    *
    * @return one row per node: `node, hub, auth` (both on the scale
    *         grid; a node with no out-edges has hub 0, no in-edges
    *         auth 0), ordered by node
    */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
              rounds: Int, scale: Long = 1000000L,
              mat: Materializer = Materializer.Local,
              broadcastScores: Boolean = true): DataFrame = {
    require(rounds >= 1 && scale > 0)
    def hint(df: DataFrame) = if (broadcastScores) broadcast(df) else df
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct(),
      Seq("src"), "hits_edges")
    val nodes = mat.freeze(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct(),
      Seq("node"), "hits_nodes")

    var step = 0
    def normalized(summed0: DataFrame, out: String): DataFrame = {
      // summed is consumed TWICE per half-step (the max aggregate and
      // the node join), and its plan contains the whole previous
      // half-step — unfrozen, the plan tree doubles per half-step
      // (2^(2·rounds) subtree copies; g7_hits' 8.7 s at sf0.1 was
      // catalyst + recompute cost, not data). Freezing the ≤|V|-row
      // sum table once per half-step makes every half-step's plan
      // constant-size. Values are untouched (spec-pinned); Lazy keeps
      // the unrolled single-plan shape for oracle replay.
      step += 1
      val summed = mat.freeze(summed0, Seq("node"), s"hits_sum_$step")
      // max over ≤|V| rows — one-row broadcast; all-zero degenerates
      // to max 1 (scores stay 0)
      val mx = summed.agg(greatest(max(col("s")), lit(1L)).as("mx"))
      nodes.join(hint(summed), Seq("node"), "left")
        .crossJoin(broadcast(mx))
        .select(col("node"),
          expr(s"(coalesce(s, 0L) * $scale) div mx").as(out))
    }

    var hub = nodes.select(col("node"), lit(scale).as("hub"))
    var auth = nodes.select(col("node"), lit(0L).as("auth"))
    for (_ <- 1 to rounds) {
      val aSum = e.join(hint(hub.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("s"))
      auth = normalized(aSum, "auth")
      val hSum = e.join(hint(auth.withColumnRenamed("node", "dst")), "dst")
        .groupBy(col("src").as("node")).agg(sum(col("auth")).as("s"))
      hub = normalized(hSum, "hub")
    }
    hub.join(hint(auth), "node").select(col("node"), col("hub"), col("auth"))
      .orderBy(col("node"))
  }

  /** Adamic–Adar link prediction: score every non-adjacent node pair
    * by Σ over common neighbors w of 1/ln(deg(w)) — shared obscure
    * neighbors count more than shared hubs (Adamic & Adar 2003). The
    * top-k pairs are the missing-edge candidates (entity-resolution
    * hints on a co-occurrence graph, "you may also like" on an
    * interaction graph).
    *
    * Scale shape: wedges enumerate per common neighbor by pairing its
    * adjacency list — quadratic in degree, so neighbors above
    * `maxDeg` are excluded from PAIRING (the standard hub cut: a
    * 10⁶-degree hub contributes 1/ln(10⁶) ≈ 0.07 to a pair's score
    * but 10¹² wedges to the join; its score mass is noise, its wedge
    * mass is the job). Scores still use the TRUE degree. Per-wedge
    * contributions quantize to integer micro-units before the
    * order-free sum; existing edges drop via one left-anti join; the
    * global top-k is orderBy+limit — TakeOrderedAndProject.
    *
    * @param maxDeg pairing cap: common neighbors with more than this
    *               many neighbors generate no wedges
    * @return top-k rows: `x, y, common_cnt, score_q` (Σ
    *         round(1e6/ln(deg)), micro-units), ordered
    *         (score_q desc, x, y)
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 maxDeg: Int = 64, topK: Int = 50,
                 mat: Materializer = Materializer.Local): DataFrame = {
    require(maxDeg >= 2 && topK >= 1)
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct(),
      Seq("u"), "aa_edges")
    val adj = e.select(col("u").as("node"), col("v").as("nbr"))
      .union(e.select(col("v").as("node"), col("u").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // the wedge self-join consumes this table TWICE (both pairing
    // sides); unfrozen, the adjacency + degree join computes twice —
    // freeze the ≤2|E|-row scored adjacency once (values unchanged)
    val pairable = mat.freeze(adj
      .join(deg.filter(col("deg") >= 2 && col("deg") <= maxDeg), Seq("node"))
      .withColumn("aa_q",
        round(lit(1e6) / log(col("deg").cast("double"))).cast("long")),
      Seq("node"), "aa_pairable")
    val r = pairable.select(col("node").as("node2"), col("nbr").as("nbr2"))
    val scored = pairable
      .join(r, col("node") === col("node2") && col("nbr") < col("nbr2"))
      .groupBy(col("nbr").as("x"), col("nbr2").as("y"))
      .agg(count(lit(1)).as("common_cnt"), sum(col("aa_q")).as("score_q"))
    scored
      .join(e, col("x") === col("u") && col("y") === col("v"), "left_anti")
      .orderBy(col("score_q").desc, col("x"), col("y"))
      .limit(topK)
  }

  /** Multi-source BFS hop distance, frontier-propagating form: round
    * `k` expands only the nodes FIRST reached at round `k-1` (a
    * left-anti join against the seen set makes "first reached" exact —
    * BFS distance IS the first round a node appears). Integer
    * distances with set semantics are order-independent, so the result
    * is bit-identical under any partitioning — same oracle-replay
    * discipline as [[pageRankInt]].
    *
    * Cost shape per round: one join of the static edge list against
    * the CURRENT FRONTIER (not the full distance table) + one distinct
    * + one anti-join against the seen set — on a real graph the
    * frontier is a small fraction of |V|, so this beats the min-plus
    * formulation (which joins all of `dist` every round) by the
    * frontier/|V| ratio. The frontier freezes every round (it is
    * consumed twice: expansion join + seen-set union); the growing
    * seen set freezes on the [[pageRankInt]] `freezeEvery` cadence to
    * cap lineage depth. Bounded `maxHops` keeps the loop free of
    * driver-side convergence counts (an empty frontier makes the
    * remaining rounds no-ops at one empty-join each).
    *
    * Seeds outside the graph still report distance 0 (they are
    * "reached" by definition and simply never expand).
    *
    * @return (node LONG, dist LONG) — one row per node within
    *         `maxHops` of any seed
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int,
              mat: Materializer = Materializer.Local,
              broadcastFrontier: Boolean = true,
              freezeEvery: Int = 8): DataFrame = {
    require(maxHops >= 0)
    require(freezeEvery >= 0)
    def hint(df: DataFrame) = if (broadcastFrontier) broadcast(df) else df
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct(),
      Seq("src"), "bfs_edges")
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    var frontier = dist.select(col("node"))
    for (k <- 1 to maxHops) {
      val nxt = mat.freeze(
        e.join(hint(frontier.withColumnRenamed("node", "src")), "src")
          .select(col("dst").as("node")).distinct()
          .join(dist.select(col("node")), Seq("node"), "left_anti"),
        Seq("node"), s"bfs_frontier_$k")
      dist = dist.union(nxt.select(col("node"), lit(k.toLong).as("dist")))
      frontier = nxt
      if (freezeEvery > 0 && k % freezeEvery == 0 && k < maxHops && mat.frozen)
        dist = mat.freeze(dist, Seq("node"), s"bfs_dist_$k")
    }
    dist
  }

  /** Bounded-round single/multi-source shortest path over INTEGER
    * edge weights — Bellman-Ford as min-plus iteration: after round
    * `k`, `dist(v)` is the exact cheapest cost among paths of ≤ k
    * edges (so `rounds` ≥ the hop diameter gives true shortest
    * paths; fewer gives the bounded-horizon cost a crawl scheduler
    * actually budgets). Unlike [[bfsHops]], a settled node can still
    * improve (a longer-hop path may be cheaper), so every round joins
    * the FULL distance table, not a frontier — min over integer sums
    * is order-independent, so the round-k state is bit-replayable
    * like [[pageRankInt]].
    *
    * Parallel (src, dst) edges pre-collapse to their minimum weight.
    * Per round: one keyed join (edges ⋈ dist) + one min-aggregate;
    * the distance table carries the [[pageRankInt]] broadcast hint
    * while it fits, and freezes on the `freezeEvery` cadence.
    * Negative weights are rejected — bounded-round Bellman-Ford would
    * be well-defined, but no corpus-curation cost is negative and
    * rejecting them keeps "dist never increases across rounds" as an
    * invariant callers may rely on.
    *
    * @return (node LONG, dist LONG) — one row per node reachable from
    *         any seed within `rounds` edges (seeds at 0)
    */
  def ssspInt(edges: DataFrame, srcCol: String, dstCol: String, wCol: String,
              seeds: DataFrame, seedCol: String, rounds: Int,
              mat: Materializer = Materializer.Local,
              broadcastDist: Boolean = true,
              freezeEvery: Int = 8): DataFrame = {
    require(rounds >= 0)
    require(freezeEvery >= 0)
    def hint(df: DataFrame) = if (broadcastDist) broadcast(df) else df
    val e = mat.freeze(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"),
          when(col(wCol).cast("long") < 0,
            raise_error(lit("ssspInt: negative edge weight")))
            .otherwise(col(wCol).cast("long")).as("w"))
        .groupBy(col("src"), col("dst")).agg(min(col("w")).as("w")),
      Seq("src"), "sssp_edges")
    var dist = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    for (k <- 1 to rounds) {
      val cand = e
        .join(hint(dist.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(cand).groupBy(col("node")).agg(min(col("dist")).as("dist"))
      if (freezeEvery > 0 && k % freezeEvery == 0 && k < rounds && mat.frozen)
        dist = mat.freeze(dist, Seq("node"), s"sssp_dist_$k")
    }
    dist
  }
}
