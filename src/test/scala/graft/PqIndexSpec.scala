package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.llm.{PqIndex, SimilarityOps}

/** The persisted PQ-codebook lifecycle: build-on-miss, reuse-on-hit,
  * rebuild on corpus drift / parameter change / explicit force — and
  * search results from a loaded index equal the inline build.
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, Seq.tabulate(8)(j => (i * 8 + j).toFloat / 100)))
      .toDF("vec_id", "embedding")

  private def partMTimes(dir: String): Map[String, Long] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap

  private def freshDir(): String =
    Files.createTempDirectory("pq-index-spec").resolve("idx").toString

  test("loadOrBuild round-trips pqCodebooks exactly; searches from the loaded index match inline") {
    val dir = freshDir()
    val c = corpus(40)
    val loaded = PqIndex.loadOrBuild(c, "vec_id", "embedding", 2, 8, 1, dir)
    val direct = SimilarityOps.pqCodebooks(c, "vec_id", "embedding", 2, 8, 1)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
    key(loaded.select("m", "code", "__cw", "__cwn2")) shouldBe
      key(direct.select("m", "code", "__cw", "__cwn2"))
    val q = c.filter(col("vec_id") % 10 === 0)
    val a = SimilarityOps.pqTopK(q, c, "vec_id", "embedding", 3, loaded, 2)
    val b = SimilarityOps.pqTopK(q, c, "vec_id", "embedding", 3, direct, 2)
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }

  test("reuse on hit; rebuild on parameter change, corpus drift, or force") {
    val dir = freshDir()
    val c = corpus(40)
    PqIndex.loadOrBuild(c, "vec_id", "embedding", 2, 8, 1, dir).count()
    val built = partMTimes(dir)

    // same corpus + params: untouched
    PqIndex.loadOrBuild(c, "vec_id", "embedding", 2, 8, 1, dir).count()
    partMTimes(dir) shouldBe built

    // parameter change rebuilds
    Thread.sleep(5)
    PqIndex.loadOrBuild(c, "vec_id", "embedding", 2, 4, 1, dir).count()
    val reparam = partMTimes(dir)
    reparam should not be built

    // corpus drift rebuilds
    Thread.sleep(5)
    val grown = c.union(Seq((1000L, Seq.tabulate(8)(_.toFloat))).toDF("vec_id", "embedding"))
    PqIndex.loadOrBuild(grown, "vec_id", "embedding", 2, 4, 1, dir).count()
    val drifted = partMTimes(dir)
    drifted should not be reparam

    // force rebuilds with nothing changed
    Thread.sleep(5)
    PqIndex.loadOrBuild(grown, "vec_id", "embedding", 2, 4, 1, dir, rebuild = true).count()
    partMTimes(dir) should not be drifted
  }
}
