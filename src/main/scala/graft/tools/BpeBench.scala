package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness (VERDICT r6 item 4 / r7 item 4): time the SAMPLED BPE
  * trainer at production-ish merge counts against the distributed
  * per-round loop at a small count — the evidence that the sampled
  * path removes the 2-jobs-per-merge scheduler wall.
  *
  * `tools/run.sh graft.tools.BpeBench <sfDir> [nMerges] [maxWords]`
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 256
    val maxWords = if (args.length > 2) args(2).toInt else Int.MaxValue
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.count() // warm the scan

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sampled = time(s"bpeTrainSampled nMerges=$nMerges maxWords=$maxWords") {
      graft.llm.TextOps.bpeTrainSampled(docs, "doc_id", "text", nMerges, maxWords).collect()
    }
    println(s"  learned ${sampled.length} merges; " +
      s"last: ${sampled.lastOption.map(r => s"${r.getString(1)}+${r.getString(2)} freq=${r.getLong(3)}").getOrElse("-")}")

    // the distributed loop at the same small count the oracle replays —
    // per-round cost × nMerges is its scaling law, printed for contrast
    val n0 = 4
    val perRound = time(s"bpeTrain (distributed loop) nMerges=$n0") {
      graft.llm.TextOps.bpeTrain(docs, "doc_id", "text", n0).collect()
    }
    println(s"  distributed loop learned ${perRound.length} merges " +
      s"(cost scales linearly in nMerges: 2 Spark jobs per round)")
    spark.stop()
  }
}
