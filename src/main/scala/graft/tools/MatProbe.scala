package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.GraphOps
import graft.sources.{Materializer, Tables}

/** Dev harness (round 13): measure the [[graft.sources.Materializer]]
  * strategies on a real iterative operator — 3-round integer PageRank
  * over the g1 customer↔supplier purchase graph (~1.2 M edges at
  * sf0.1) — and confirm the bucketed-table cluster path costs what it
  * should: one table write up front, then rounds priced like the
  * localCheckpoint path, with Lazy's re-derivation tax as the
  * baseline the freeze exists to avoid.
  *
  * `tools/run.sh graft.tools.MatProbe [sfDir] [reps]`
  */
object MatProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges = {
      val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (col("l_suppkey").cast("long") + 1000000L).as("dst"))
      cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
    }

    var checksum = Map.empty[String, Long]
    for ((name, mat) <- Seq(
        "local" -> Materializer.Local,
        "bucketed" -> Materializer.Bucketed(16, prefix = "graft_matprobe"),
        "lazy" -> Materializer.Lazy)) {
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val sum = GraphOps.pageRankInt(edges, "src", "dst", iters = 3, mat = mat)
          .agg(org.apache.spark.sql.functions.sum(col("rank"))).collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"RUN$i pagerank_$name $sec%.3f (rank mass $sum)")
        checksum += name -> sum
        sec
      }
      println(f"MEDIAN pagerank_$name ${times.sorted.apply(times.size / 2)}%.3f")
    }
    require(checksum.values.toSet.size == 1,
      s"strategies disagree on rank mass: $checksum")
    println(s"rank mass identical across strategies: ${checksum("local")}")

    // Deep-iteration posture (VERDICT r13/r14): at 20+ rounds the
    // UNFROZEN rank lineage makes catalyst analysis the dominant cost;
    // the freezeEvery cadence caps plan depth. Same rank mass required.
    var deepMass = Map.empty[Int, Long]
    for (cadence <- Seq(0, 8)) {
      val t0 = System.nanoTime()
      val sum = GraphOps.pageRankInt(edges, "src", "dst", iters = 24,
          freezeEvery = cadence)
        .agg(org.apache.spark.sql.functions.sum(col("rank"))).collect()(0).getLong(0)
      println(f"DEEP24 freezeEvery=$cadence ${(System.nanoTime() - t0) / 1e9}%.3f (rank mass $sum)")
      deepMass += cadence -> sum
    }
    require(deepMass.values.toSet.size == 1,
      s"freezeEvery cadences disagree on rank mass: $deepMass")
    spark.stop()
  }
}
