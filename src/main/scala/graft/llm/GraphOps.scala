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
                  scale: Long = 1000000L): DataFrame = {
    require(iters >= 0 && dampNum >= 0 && dampNum <= dampDen)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, "src") // static: edge list with outdegree, keyed once
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val teleport = scale * (dampDen - dampNum) / dampDen

    var rank = nodes.select(col("node"), lit(scale).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
      val summed = contrib.groupBy(col("node")).agg(sum(col("c")).as("s"))
      rank = nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
            .as("rank"))
    }
    rank
  }
}
