package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.DedupOps

/** Dev harness (VERDICT r8 item 6): skew soak for the fuzzy-dedup
  * connected-components loop. `clusterNearDups` is O(log n) rounds by
  * the alternating large-star/small-star argument, but each round
  * shuffles the surviving edge set — so the question at 100 TB is
  * (a) how many rounds a REALISTIC skewed duplicate graph actually
  * takes, and (b) how fast the edge set decays per round (the
  * per-round shuffle cost).
  *
  * Fixtures (all deterministic — xxhash-seeded attachment, no RNG):
  *  - `powerlaw`: Zipf(α=2) cluster sizes with one mega-cluster
  *    holding ~60% of all duplicate nodes — the shape LSH dedup
  *    produces on web corpora (boilerplate/template mega-cluster plus
  *    a long tail). Intra-cluster edges are random-attachment trees
  *    (O(log n) diameter w.h.p.) plus 30% redundant extra edges, the
  *    LSH-banding reality where most dup pairs get a direct edge.
  *  - `chain`: one n-node path — maximum-diameter adversarial core;
  *    NOT what LSH emits (a chain of near-dups needs every adjacent
  *    pair similar but no transitive pair bandable), included as the
  *    worst-case bound on rounds.
  *  - `powerchain`: the power-law tail with the mega-cluster replaced
  *    by a chain — skewed AND deep.
  *
  * For each fixture: rounds to convergence, per-round edge counts
  * (decay), wall seconds per round, and a label-correctness verdict
  * (every node must land on its cluster's min id, known by
  * construction from the contiguous id ranges).
  *
  * `tools/run.sh graft.tools.CcSoak [nNodes] [shape|all]`
  */
object CcSoak {

  /** Zipf cluster sizes: size_j ∝ n/j², j=1.. until exhausted, each
    * cluster a contiguous id range [start, start+size). Returns
    * (start, size) pairs; cluster 1 is the mega-cluster (~60% of n
    * at α=2: Σ1/j² = π²/6 ≈ 1.645 ⇒ s₁ ≈ n/1.645).
    */
  def zipfClusters(n: Long): Seq[(Long, Long)] = {
    val norm = (1 to 10000).map(j => 1.0 / (j.toLong * j)).sum
    val sizes = Iterator.from(1)
      .map(j => math.max(2L, math.round(n / (norm * j.toLong * j))))
      .scanLeft((0L, 0L)) { case ((start, sz), next) => (start + sz, next) }
      .drop(1)
      .takeWhile { case (start, _) => start < n }
      .map { case (start, sz) => (start, math.min(sz, n - start)) }
      .toSeq
    sizes.filter(_._2 >= 2)
  }

  /** Non-root cluster nodes as one explode plan: ~600 (cstart, csize)
    * rows fan out to every node id > its cluster root, then
    * repartition for parallelism. One plan regardless of cluster
    * count — a per-cluster union would build a 600-way plan tree.
    */
  private def clusterNodes(spark: SparkSession, clusters: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    clusters.toDF("cstart", "csize")
      .select(col("cstart"),
        explode(expr("sequence(cstart + 1, cstart + csize - 1)")).as("id"))
      .repartition(16)
  }

  /** Edges: per non-root node one random-attachment tree edge to a
    * pseudo-random (xxhash-derived) earlier node in its cluster —
    * O(log size) expected diameter — plus 30% redundant extra edges,
    * the LSH-banding reality where most dup pairs get a direct edge.
    * `powerchain` rewires the mega-cluster (cluster 0) to a pure
    * chain: maximum diameter under the same skew.
    */
  def fixture(spark: SparkSession, shape: String, n: Long): DataFrame = shape match {
    case "chain" =>
      spark.range(1, n).select((col("id") - 1).as("doc1"), col("id").as("doc2"))
    case "powerlaw" | "powerchain" =>
      val clusters = zipfClusters(n)
      val nodes = clusterNodes(spark, clusters).localCheckpoint()
      val megaChain = lit(shape == "powerchain") && col("cstart") === clusters.head._1
      val tree = nodes.select(
        when(megaChain, col("id") - 1)
          .otherwise(col("cstart") + pmod(xxhash64(col("id"), lit(1)), col("id") - col("cstart")))
          .as("doc1"),
        col("id").as("doc2"))
      val extra = nodes
        .filter(pmod(xxhash64(col("id"), lit(2)), lit(100)) < 30 && !megaChain)
        .select(
          (col("cstart") + pmod(xxhash64(col("id"), lit(3)), col("id") - col("cstart"))).as("doc1"),
          col("id").as("doc2"))
      tree.union(extra)
    case other => sys.error(s"unknown shape: $other")
  }

  /** Expected label for every node: its cluster's range start (known
    * by construction from the contiguous id ranges).
    */
  def expectedLabels(spark: SparkSession, shape: String, n: Long): DataFrame = {
    import spark.implicits._
    val ranges = shape match {
      case "chain" => Seq((0L, n))
      case _ => zipfClusters(n)
    }
    ranges.toDF("cstart", "csize")
      .select(col("cstart").as("expected_cluster"),
        explode(expr("sequence(cstart, cstart + csize - 1)")).as("doc_id"))
      .repartition(16)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 300000L
    val which = if (args.length > 1) args(1) else "all"
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.shuffle.partitions", "16"), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shapes = if (which == "all") Seq("powerlaw", "powerchain", "chain") else Seq(which)
    shapes.foreach { shape =>
      val edges = fixture(spark, shape, n).localCheckpoint()
      val edgeCount = edges.count()
      println(s"\n== shape=$shape nodes=$n inputEdges=$edgeCount ==")
      val t0 = System.nanoTime()
      var last = t0
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
      // localEdgeThreshold=0 forces the distributed iteration — the
      // soak measures the loop, not the driver union-find fast path
      val labels = DedupOps.clusterNearDups(edges, maxIter = 60, localEdgeThreshold = 0,
        roundHook = (round, edgesNow) => {
          val now = System.nanoTime()
          rows += ((round, edgesNow, (now - last) / 1e9))
          last = now
        })
      // correctness: every node carries its cluster's min id
      val bad = labels.join(expectedLabels(spark, shape, n), "doc_id")
        .filter(col("cluster_id") =!= col("expected_cluster")).count()
      val total = (System.nanoTime() - t0) / 1e9
      println(f"${"round"}%5s ${"edges"}%12s ${"sec"}%8s  decay")
      rows.foreach { case (r, e, s) =>
        val prev = if (r == 1) edgeCount else rows(r - 2)._2
        println(f"$r%5d $e%12d $s%8.2f  ${e.toDouble / math.max(prev, 1)}%.3f")
      }
      println(f"rounds=${rows.size} totalSec=$total%.1f mislabeled=$bad " +
        s"verdict=${if (bad == 0) "PASS" else "FAIL"}")
    }
    spark.stop()
  }
}
