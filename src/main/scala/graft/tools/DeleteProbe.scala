package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.IvfIndex
import graft.sources.Tables

/** Dev harness: measure the index DELETE lifecycle costs at a given
  * SF — full lists build vs O(delta) tombstone delete vs compact, plus
  * the per-read anti-join overhead a tombstoned index carries until
  * compaction. `tools/run.sh graft.tools.DeleteProbe <sfDir>`.
  * Feeds the BASELINE.md "index delete/compact" rows.
  */
object DeleteProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val idx = java.nio.file.Files.createTempDirectory("delete-probe")
      .resolve("lists").toString

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val emb = Tables.load(spark, dir, "embeddings")
    val nRows = emb.count()
    val after = emb.filter(col("vec_id") % 7 =!= 0)
    val deleted = emb.filter(col("vec_id") % 7 === 0).select("vec_id")
    println(s"corpus rows: $nRows (deleting ~1/7)")

    val cents = timed("centroids_build") {
      graft.llm.SimilarityOps.ivfCentroids(emb, "vec_id", "embedding", 16, 2)
        .localCheckpoint()
    }
    val preSig = IvfIndex.corpusSig(emb)
    timed("lists_full_build") {
      IvfIndex.loadOrBuildLists(emb, "vec_id", "embedding", 16, 2, cents, idx,
        rebuild = true).count()
    }
    timed("delete_odelta") {
      require(IvfIndex.removeFromLists(deleted, "vec_id", 16, 2, after, idx, preSig))
    }
    timed("read_with_tombstones") {
      IvfIndex.loadOrBuildLists(after, "vec_id", "embedding", 16, 2, cents, idx).count()
    }
    timed("compact") { IvfIndex.compactLists(spark, idx) }
    timed("read_after_compact") {
      IvfIndex.loadOrBuildLists(after, "vec_id", "embedding", 16, 2, cents, idx).count()
    }
    spark.stop()
  }
}
