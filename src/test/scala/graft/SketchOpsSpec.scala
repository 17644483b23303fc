package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.llm.SketchOps

/** Spark-level contract for the KMV sketch index
  * ([[graft.llm.SketchOps]]): the persisted sketch table reproduces
  * the direct build, O(delta) append equals a from-scratch build over
  * the grown corpus (the merge-concat law at DataFrame level), and
  * the indexed overlap query equals the plain one.
  */
class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private val srcs = Seq("a", "b")
  private def docs(ids: Range): DataFrame =
    ids.map(i => (i.toLong, srcs(i % 2),
      s"tok${i % 11} tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 13} shared common tail"))
      .toDF("doc_id", "source", "text")

  private def sketchRows(df: DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r =>
      r.getString(0) -> r.getAs[scala.collection.Seq[Long]]("sk").toSeq).toMap

  test("appendToSourceSketches: delta merge is bit-identical to a full rebuild") {
    val full = SketchOps.sourceSketches(docs(0 until 40), srcs, n = 3, k = 64)
    val base = SketchOps.sourceSketches(docs(0 until 25), srcs, n = 3, k = 64)
    val grown = SketchOps.appendToSourceSketches(base, docs(25 until 40), srcs, n = 3, k = 64)
    sketchRows(grown) shouldBe sketchRows(full)
  }

  test("indexed overlap: persisted sketches load back and reproduce the direct result") {
    val idx = Files.createTempDirectory("kmv-idx").resolve("sk").toString
    val corpus = docs(0 until 40)
    val direct = SketchOps.sourceOverlapCertified(corpus, srcs, n = 3, k = 64).collect()
    val indexed = SketchOps.sourceOverlapCertifiedIndexed(corpus, srcs, n = 3, k = 64, idx).collect()
    indexed shouldBe direct
    // second call reuses the sidecar-signed artifact (no rebuild):
    // the stored sketch rows are unchanged
    val stored = sketchRows(spark.read.parquet(idx))
    SketchOps.sourceOverlapCertifiedIndexed(corpus, srcs, n = 3, k = 64, idx)
    sketchRows(spark.read.parquet(idx)) shouldBe stored
  }

  test("cumulativeDistinctUsersCertified: anchors exact, verdicts green, curve monotone") {
    import java.sql.Timestamp
    // 5 days; user u appears from day (u % 5) onward — returning users
    // must NOT re-count in n_cum, and day d's new users are exactly
    // those with u % 5 == d.
    val events = (for {
      d <- 0 until 5
      u <- 0 until 200
      if u % 5 <= d
    } yield (Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"), u.toLong))
      .toDF("ts", "user_id")
    val out = SketchOps.cumulativeDistinctUsersCertified(events, lgK = 14)
      .collect()
    out.length shouldBe 5
    out.zipWithIndex.foreach { case (r, d) =>
      r.getLong(1) shouldBe (d + 1) * 40L      // n_daily
      r.getLong(2) shouldBe 40L                // n_new per day
      r.getLong(3) shouldBe (d + 1) * 40L      // n_cum == distinct so far
      r.getInt(4) shouldBe 1                   // daily_ok
      r.getInt(5) shouldBe 1                   // cum_ok
    }
  }
}
