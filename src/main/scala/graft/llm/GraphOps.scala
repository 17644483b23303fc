package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  *    co-partitioned shuffle join on `src` — pre-bucket the edge list
  *    by `src` ([[graft.sources.Sinks.writeBucketed]]) and the
  *    per-round shuffle disappears too. For horizons past a handful
  *    of rounds, `localCheckpoint` the rank table every ~5 rounds to
  *    truncate lineage.
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
                  scale: Long = 1000000L, materialize: Boolean = true,
                  broadcastRanks: Boolean = true): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    def hint(df: DataFrame) = if (broadcastRanks) broadcast(df) else df
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Static across rounds: edge list with outdegree, and the node set.
    // Under one lazy plan each round would RE-DERIVE both from the raw
    // input (k rounds = k+1 scans of the upstream joins); materializing
    // once cuts that to a single derivation. localCheckpoint is the
    // local-mode stand-in — on a cluster with executor churn, persist
    // the edge list to a bucketed table instead
    // ([[graft.sources.Sinks.writeBucketed]]) and reliable-checkpoint.
    // A checkpointed table has NO catalyst size stats (Scan
    // ExistingRDD), so the |V|-sized rank/summed sides carry an
    // explicit broadcast hint (`broadcastRanks`); set it false past
    // broadcast range and the rounds run as co-partitioned joins.
    val edPlan = e.join(deg, "src")
    val ed = if (materialize) edPlan.localCheckpoint() else edPlan
    val nodesPlan = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes = if (materialize) nodesPlan.localCheckpoint() else nodesPlan
    val teleport = scale * (dampDen - dampNum) / dampDen

    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(hint(rank.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
      val summed = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(hint(summed), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("rank"))
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
                          materialize: Boolean = true,
                          broadcastRanks: Boolean = true): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    def hint(df: DataFrame) = if (broadcastRanks) broadcast(df) else df
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val edPlan = e.join(deg, "src")
    val ed = if (materialize) edPlan.localCheckpoint() else edPlan
    val nodesPlan = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes = if (materialize) nodesPlan.localCheckpoint() else nodesPlan
    val teleport = scale * (dampDen - dampNum) / dampDen

    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(hint(rank.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"),
          expr("(rank * w) div outw").as("c"))
      val summed = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(hint(summed), Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("rank"))
    }
    rank
  }
}
