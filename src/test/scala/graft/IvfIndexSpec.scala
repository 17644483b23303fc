package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.llm.{IvfIndex, SimilarityOps}

/** The persisted IVF index lifecycle: build-on-miss, reuse-on-hit,
  * rebuild on corpus drift / parameter change / explicit force.
  */
class IvfIndexSpec extends SparkSpec {
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
    Files.createTempDirectory("ivf-index-spec").resolve("idx").toString

  test("loadOrBuild round-trips ivfCentroids exactly and writes a meta sidecar") {
    val dir = freshDir()
    val c = corpus(40)
    val loaded = IvfIndex.loadOrBuild(c, "vec_id", "embedding", 4, 1, dir)
    val direct = SimilarityOps.ivfCentroids(c, "vec_id", "embedding", 4, 1)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("centroid_id"), col("__centq"), col("__centn2"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).sortBy(_._1)
    key(loaded) shouldBe key(direct)
    // in-memory corpus (no input files): signature falls back to count
    // (+ the ADVICE-r7 plan hash — non-bare plans carry query identity)
    val meta = IvfIndex.readMeta(c, dir)
    meta.map(m => (m.nCentroids, m.kmeansIters)) shouldBe Some((4, 1))
    meta.get.corpusSig should startWith("count:40")
  }

  test("unchanged corpus and params reuse the stored index; drift or force rebuilds") {
    val dir = freshDir()
    val c = corpus(40)
    IvfIndex.loadOrBuild(c, "vec_id", "embedding", 4, 1, dir).count()
    val built = partMTimes(dir)

    // same corpus, same params: stored files untouched
    IvfIndex.loadOrBuild(c, "vec_id", "embedding", 4, 1, dir).count()
    partMTimes(dir) shouldBe built

    // rebuild = true forces a rewrite even with nothing changed
    Thread.sleep(5)
    IvfIndex.loadOrBuild(c, "vec_id", "embedding", 4, 1, dir, rebuild = true).count()
    val forced = partMTimes(dir)
    forced should not be built

    // corpus drift (row count change) rebuilds and refreshes the meta
    val grown = c.union(Seq((1000L, Seq.tabulate(8)(_.toFloat))).toDF("vec_id", "embedding"))
    Thread.sleep(5)
    IvfIndex.loadOrBuild(grown, "vec_id", "embedding", 4, 1, dir).count()
    partMTimes(dir) should not be forced
    val m1 = IvfIndex.readMeta(grown, dir)
    m1.map(m => (m.nCentroids, m.kmeansIters)) shouldBe Some((4, 1))
    m1.get.corpusSig should startWith("count:41")

    // parameter change rebuilds under its own meta
    IvfIndex.loadOrBuild(grown, "vec_id", "embedding", 8, 1, dir).count()
    val m2 = IvfIndex.readMeta(grown, dir)
    m2.map(m => (m.nCentroids, m.kmeansIters)) shouldBe Some((8, 1))
    m2.get.corpusSig should startWith("count:41")
  }

  test("file-backed corpus: metadata signature on warm load; file drift still rebuilds") {
    val base = Files.createTempDirectory("ivf-index-spec")
    val corpusDir = base.resolve("corpus").toString
    val dir = base.resolve("idx").toString
    corpus(40).write.parquet(corpusDir)
    IvfIndex.loadOrBuild(spark.read.parquet(corpusDir), "vec_id", "embedding", 4, 1, dir).count()
    val built = partMTimes(dir)
    // production path: signature is file metadata, never a count scan
    // (CorpusSignatureSpec pins the zero-jobs claim on the check itself)
    IvfIndex.readMeta(spark.read.parquet(corpusDir), dir).get.corpusSig should startWith("files:")

    // warm load: same files, same signature — stored index reused
    IvfIndex.loadOrBuild(spark.read.parquet(corpusDir), "vec_id", "embedding", 4, 1, dir)
    partMTimes(dir) shouldBe built

    // appending a file changes the signature and triggers a rebuild
    Thread.sleep(5)
    corpus(1).write.mode("append").parquet(corpusDir)
    IvfIndex.loadOrBuild(spark.read.parquet(corpusDir), "vec_id", "embedding", 4, 1, dir).count()
    partMTimes(dir) should not be built
  }

  test("appendToLists: delta-only maintenance equals a full rebuild, next load reuses") {
    val base = Files.createTempDirectory("ivf-lists-append")
    val corpusDir = base.resolve("corpus").toString
    val centDir = base.resolve("cents").toString
    val listsDir = base.resolve("lists").toString
    corpus(40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val cents = IvfIndex.loadOrBuild(c0, "vec_id", "embedding", 4, 1, centDir)
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 4, 1, cents, listsDir).count()

    // new rows arrive: snapshot the pre-append signature, append to
    // the corpus store, then delta-maintain
    val sigBefore = IvfIndex.corpusSig(c0)
    val delta = (100 until 110)
      .map(i => (i.toLong, Seq.tabulate(8)(j => (i * 8 + j).toFloat / 100)))
      .toDF("vec_id", "embedding")
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    IvfIndex.appendToLists(delta, "vec_id", "embedding", 4, 1, cents, grown, listsDir, sigBefore)

    // next loadOrBuildLists REUSES the extended index (no rebuild):
    // the part files written so far keep their mtimes
    val afterAppend = partMTimes(listsDir)
    val loaded = IvfIndex.loadOrBuildLists(grown, "vec_id", "embedding", 4, 1, cents, listsDir)
    partMTimes(listsDir) shouldBe afterAppend

    // and the extended index equals a from-scratch build over the
    // grown corpus (same centroids — append does not move them)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("centroid_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    key(loaded) shouldBe key(
      graft.llm.SimilarityOps.ivfInvertedLists(grown, "vec_id", "embedding", cents))
  }

  test("appendToLists guards freshness: missing/stale/mismatched index falls back to rebuild (ADVICE r8)") {
    val base = Files.createTempDirectory("ivf-lists-guard")
    val corpusDir = base.resolve("corpus").toString
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("centroid_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    corpus(40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val cents = IvfIndex.loadOrBuild(c0, "vec_id", "embedding", 4, 1, base.resolve("cents").toString)
    val sigBefore = IvfIndex.corpusSig(c0)
    val delta = (100 until 110)
      .map(i => (i.toLong, Seq.tabulate(8)(j => (i * 8 + j).toFloat / 100)))
      .toDF("vec_id", "embedding")
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    val truth = key(graft.llm.SimilarityOps.ivfInvertedLists(grown, "vec_id", "embedding", cents))

    // 1) append before any build: no sidecar → must NOT commit a
    // delta-only table; full rebuild over the grown corpus instead
    val neverBuilt = base.resolve("never-built").toString
    IvfIndex.appendToLists(delta, "vec_id", "embedding", 4, 1, cents, grown, neverBuilt, sigBefore)
    key(spark.read.parquet(neverBuilt)) shouldBe truth

    // 2) params changed since the build: appending delta rows encoded
    // with 4 centroids onto an 8-centroid table would mix parameters —
    // guard must rebuild under the requested params
    val paramsDir = base.resolve("params").toString
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 8, 1,
      IvfIndex.loadOrBuild(c0, "vec_id", "embedding", 8, 1, base.resolve("cents8").toString),
      paramsDir).count()
    IvfIndex.appendToLists(delta, "vec_id", "embedding", 4, 1, cents, grown, paramsDir, sigBefore)
    key(spark.read.parquet(paramsDir)) shouldBe truth

    // 3) stale signature: index built against a DIFFERENT corpus state
    // than the claimed pre-append one → rebuild, not append
    val staleDir = base.resolve("stale").toString
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 4, 1, cents, staleDir).count()
    IvfIndex.appendToLists(delta, "vec_id", "embedding", 4, 1, cents, grown, staleDir,
      preAppendSig = "files:999:deadbeef")
    key(spark.read.parquet(staleDir)) shouldBe truth

    // 4) and the happy path on a genuinely fresh index still appends
    // (no rewrite of existing part files)
    val freshDir2 = base.resolve("fresh").toString
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 4, 1, cents, freshDir2).count()
    val before = partMTimes(freshDir2)
    IvfIndex.appendToLists(delta, "vec_id", "embedding", 4, 1, cents, grown, freshDir2, sigBefore)
    partMTimes(freshDir2).view.filterKeys(before.contains).toMap shouldBe before
    key(spark.read.parquet(freshDir2)) shouldBe truth
  }
}
