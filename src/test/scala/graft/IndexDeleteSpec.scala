package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{DedupOps, IvfIndex, SimilarityOps}

/** O(delta) DELETE wired into every index family (VERDICT r14 item 2):
  * for IVF inverted lists, the MinHash-LSH tables, and the RHP tables,
  * append + delete + compact must equal a from-scratch rebuild over
  * the final corpus, bit-identical — and a deleted id that is later
  * re-appended must come back to life.
  */
class IndexDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"the quick document $i talks about topic ${i % 5} in words ${i % 7} and ${i % 3}"))
      .toDF("doc_id", "text")

  private def vecs(ids: Range) =
    ids.map(i => (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("|")).toSeq.sorted

  // ------------------------------------------------------------- IVF lists

  test("IVF lists: append + delete + compact == rebuild over the final corpus, bit-identical") {
    val base = Files.createTempDirectory("ivf-delete")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("lists").toString
    vecs(0 until 40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val centroids = SimilarityOps.ivfCentroids(c0, "vec_id", "embedding", 4, 1)
      .localCheckpoint() // centroids are FIXED across maintenance ops
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 4, 1, centroids, idx).count()

    // append a delta
    val sigPreAppend = IvfIndex.corpusSig(c0)
    val delta = vecs(100 until 110)
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    IvfIndex.appendToLists(delta, "vec_id", "embedding", 4, 1, centroids,
      grown, idx, sigPreAppend)

    // delete ids from both the original corpus and the delta
    val deletedIds = Seq(3L, 7L, 100L, 105L)
    val sigPreDelete = IvfIndex.corpusSig(grown)
    val afterDelete = grown.filter(!col("vec_id").isin(deletedIds: _*))
    IvfIndex.removeFromLists(deletedIds.toDF("vec_id"), "vec_id", 4, 1,
      afterDelete, idx, sigPreDelete) shouldBe true

    // tombstone-subtracted view equals the per-row truth immediately
    val truth = sortedRows(
      SimilarityOps.ivfInvertedLists(afterDelete, "vec_id", "embedding", centroids))
    sortedRows(IvfIndex.loadOrBuildLists(afterDelete, "vec_id", "embedding",
      4, 1, centroids, idx)) shouldBe truth

    // compact folds the tombstones in; stored parquet == rebuild,
    // bit-identical row set
    IvfIndex.compactLists(spark, idx)
    Files.exists(Paths.get(idx, "_graft_tombstones")) shouldBe false
    sortedRows(spark.read.parquet(idx)) shouldBe truth
    // warm load after compact: reuse, same rows
    sortedRows(IvfIndex.loadOrBuildLists(afterDelete, "vec_id", "embedding",
      4, 1, centroids, idx)) shouldBe truth
  }

  test("IVF lists: stale or missing sidecar makes removeFromLists refuse (caller rebuilds)") {
    val base = Files.createTempDirectory("ivf-delete-guard")
    val corpusDir = base.resolve("corpus").toString
    vecs(0 until 20).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    // never built
    IvfIndex.removeFromLists(Seq(1L).toDF("vec_id"), "vec_id", 4, 1,
      c0, base.resolve("never").toString, IvfIndex.corpusSig(c0)) shouldBe false
    // built, but wrong params requested
    val centroids = SimilarityOps.ivfCentroids(c0, "vec_id", "embedding", 4, 1).localCheckpoint()
    val idx = base.resolve("lists").toString
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 4, 1, centroids, idx).count()
    IvfIndex.removeFromLists(Seq(1L).toDF("vec_id"), "vec_id", 8, 2,
      c0, idx, IvfIndex.corpusSig(c0)) shouldBe false
    // stale signature
    IvfIndex.removeFromLists(Seq(1L).toDF("vec_id"), "vec_id", 4, 1,
      c0, idx, "files:999:deadbeef") shouldBe false
    Files.exists(Paths.get(idx, "_graft_tombstones")) shouldBe false
  }

  test("IVF lists: delete then re-append resurrects the id (no silent loss)") {
    val base = Files.createTempDirectory("ivf-reinsert")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("lists").toString
    vecs(0 until 20).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val centroids = SimilarityOps.ivfCentroids(c0, "vec_id", "embedding", 4, 1).localCheckpoint()
    IvfIndex.loadOrBuildLists(c0, "vec_id", "embedding", 4, 1, centroids, idx).count()

    // delete id 5 (corpus shrinks to a filtered view)
    val afterDelete = c0.filter(col("vec_id") =!= 5L)
    IvfIndex.removeFromLists(Seq(5L).toDF("vec_id"), "vec_id", 4, 1,
      afterDelete, idx, IvfIndex.corpusSig(c0)) shouldBe true

    // the id returns with a NEW row (vector may differ): corpus grows
    // by a parquet append of the re-inserted row
    val sigPreAppend = IvfIndex.corpusSig(afterDelete)
    val reinserted = vecs(5 until 6)
    reinserted.write.mode("append").parquet(corpusDir)
    // post-append corpus = all files minus nothing; id 5 lives again
    val afterAppend = spark.read.parquet(corpusDir)
      .filter(col("vec_id") =!= 5L).union(reinserted)
    // appendToLists against the afterDelete-stamped sidecar
    IvfIndex.appendToLists(reinserted, "vec_id", "embedding", 4, 1, centroids,
      afterAppend, idx, sigPreAppend)

    val loaded = IvfIndex.loadOrBuildLists(afterAppend, "vec_id", "embedding",
      4, 1, centroids, idx)
    loaded.filter(col("vec_id") === 5L).count() shouldBe 1L
    // and compact must keep it (the anomaly was permanent loss here)
    IvfIndex.compactLists(spark, idx)
    spark.read.parquet(idx).filter(col("vec_id") === 5L).count() shouldBe 1L
  }

  // ------------------------------------------------------------- MinHash

  test("MinHash: delete + compact == rebuild over the post-delete corpus, bit-identical") {
    val base = Files.createTempDirectory("minhash-delete")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    docs(0 until 30).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    DedupOps.loadOrBuildMinHashIndex(c0, "doc_id", "text", 3, 16, 4, idx)._1.count()

    val deletedIds = Seq(2L, 11L, 19L)
    val afterDelete = c0.filter(!col("doc_id").isin(deletedIds: _*))
    DedupOps.deleteFromMinHashIndex(deletedIds.toDF("doc_id"), "doc_id",
      3, 16, 4, afterDelete, idx, IvfIndex.corpusSig(c0)) shouldBe true

    val shTruth = DedupOps.wordShingles(afterDelete, "doc_id", "text", 3)
    val (banded, sh) =
      DedupOps.loadOrBuildMinHashIndex(afterDelete, "doc_id", "text", 3, 16, 4, idx)
    sortedRows(sh) shouldBe sortedRows(shTruth)
    sortedRows(banded) shouldBe sortedRows(DedupOps.minHashBandedFromShingles(shTruth, 16, 4))

    DedupOps.compactMinHashIndex(spark, idx)
    sortedRows(spark.read.parquet(s"$idx/shingles")) shouldBe sortedRows(shTruth)
    sortedRows(spark.read.parquet(s"$idx/banded")) shouldBe
      sortedRows(DedupOps.minHashBandedFromShingles(shTruth, 16, 4))

    // the gate no longer matches a deleted document
    val resub = Seq((500L, docs(2 until 3).collect()(0).getString(1))).toDF("doc_id", "text")
    val (b2, s2) = DedupOps.loadOrBuildMinHashIndex(afterDelete, "doc_id", "text", 3, 16, 4, idx)
    DedupOps.minHashGateIndexed(resub, b2, s2, "doc_id", "text", 3, 16, 4, 1, 2)
      .count() shouldBe 0L
  }

  test("MinHash: freshness guard — params or signature mismatch refuses the delta delete") {
    val base = Files.createTempDirectory("minhash-delete-guard")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    docs(0 until 20).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    DedupOps.loadOrBuildMinHashIndex(c0, "doc_id", "text", 3, 16, 4, idx)._1.count()
    DedupOps.deleteFromMinHashIndex(Seq(1L).toDF("doc_id"), "doc_id",
      2, 16, 8, c0, idx, IvfIndex.corpusSig(c0)) shouldBe false
    DedupOps.deleteFromMinHashIndex(Seq(1L).toDF("doc_id"), "doc_id",
      3, 16, 4, c0, idx, "files:999:deadbeef") shouldBe false
    Files.exists(Paths.get(idx, "shingles", "_graft_tombstones")) shouldBe false
    Files.exists(Paths.get(idx, "banded", "_graft_tombstones")) shouldBe false
  }

  // ------------------------------------------------------------- RHP

  private val parity: (Long, Long) => Long = graft.functions.RhpSign.xxhashParity _

  test("RHP: delete + compact == rebuild over the post-delete corpus, bit-identical") {
    val base = Files.createTempDirectory("rhp-delete")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    vecs(0 until 40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    SimilarityOps.loadOrBuildRhpIndex(c0, "vec_id", "embedding", 6, 2, "xxhash", parity, 64, idx)
      ._1.count()

    val deletedIds = Seq(0L, 13L, 39L)
    val afterDelete = c0.filter(!col("vec_id").isin(deletedIds: _*))
    SimilarityOps.deleteFromRhpIndex(deletedIds.toDF("vec_id"), "vec_id",
      6, 2, "xxhash", 64, afterDelete, idx, IvfIndex.corpusSig(c0)) shouldBe true

    val (buckets, qc) = SimilarityOps.loadOrBuildRhpIndex(afterDelete, "vec_id", "embedding",
      6, 2, "xxhash", parity, 64, idx)
    sortedRows(qc) shouldBe
      sortedRows(SimilarityOps.rhpQuantizedCorpus(afterDelete, "vec_id", "embedding"))
    sortedRows(buckets) shouldBe
      sortedRows(SimilarityOps.rhpCorpusBuckets(afterDelete, "vec_id", "embedding", 6, 2, parity, 64))

    SimilarityOps.compactRhpIndex(spark, idx)
    sortedRows(spark.read.parquet(s"$idx/quantized")) shouldBe
      sortedRows(SimilarityOps.rhpQuantizedCorpus(afterDelete, "vec_id", "embedding"))
    sortedRows(spark.read.parquet(s"$idx/buckets")) shouldBe
      sortedRows(SimilarityOps.rhpCorpusBuckets(afterDelete, "vec_id", "embedding", 6, 2, parity, 64))
  }

  // ------------------------------------------------------------- PQ codes

  test("PQ codes: append + delete + compact == rebuild over the final corpus, bit-identical") {
    val base = Files.createTempDirectory("pq-codes-delete")
    val corpusDir = base.resolve("corpus").toString
    val cbIdx = base.resolve("codebooks").toString
    val idx = base.resolve("codes").toString
    vecs(0 until 40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    // codebooks are FIXED across code maintenance (same contract as
    // IVF centroids: retrain => full codes rebuild)
    val cb = graft.llm.PqIndex.loadOrBuild(c0, "vec_id", "embedding", 4, 8, 1, cbIdx)
      .localCheckpoint()
    graft.llm.PqIndex.loadOrBuildCodes(c0, "vec_id", "embedding", cb, 4, 8, 1, idx).count()

    // append a delta
    val sigPreAppend = IvfIndex.corpusSig(c0)
    val delta = vecs(100 until 110)
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    graft.llm.PqIndex.appendToCodes(delta, "vec_id", "embedding", cb, 4, 8, 1,
      grown, idx, sigPreAppend)

    // delete ids from both the original corpus and the delta
    val deletedIds = Seq(3L, 7L, 100L, 105L)
    val sigPreDelete = IvfIndex.corpusSig(grown)
    val afterDelete = grown.filter(!col("vec_id").isin(deletedIds: _*))
    graft.llm.PqIndex.removeFromCodes(deletedIds.toDF("vec_id"), "vec_id", 4, 8, 1,
      afterDelete, idx, sigPreDelete) shouldBe true

    // tombstone-subtracted view equals the per-row truth immediately
    val truth = sortedRows(
      SimilarityOps.pqEncode(afterDelete, "vec_id", "embedding", cb, 4))
    sortedRows(graft.llm.PqIndex.loadOrBuildCodes(afterDelete, "vec_id", "embedding",
      cb, 4, 8, 1, idx)) shouldBe truth

    // compact folds the tombstones in; stored parquet == rebuild
    graft.llm.PqIndex.compactCodes(spark, idx)
    Files.exists(Paths.get(idx, "_graft_tombstones")) shouldBe false
    sortedRows(spark.read.parquet(idx)) shouldBe truth
    // warm load after compact: reuse, same rows
    graft.llm.PqIndex.codesFresh(afterDelete, 4, 8, 1, idx) shouldBe true
    sortedRows(graft.llm.PqIndex.loadOrBuildCodes(afterDelete, "vec_id", "embedding",
      cb, 4, 8, 1, idx)) shouldBe truth
  }

  test("PQ codes: stale or missing sidecar makes removeFromCodes refuse; delete-then-reappend resurrects") {
    val base = Files.createTempDirectory("pq-codes-guard")
    val corpusDir = base.resolve("corpus").toString
    vecs(0 until 20).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    // never built
    graft.llm.PqIndex.removeFromCodes(Seq(1L).toDF("vec_id"), "vec_id", 4, 8, 1,
      c0, base.resolve("never").toString, IvfIndex.corpusSig(c0)) shouldBe false
    val cbIdx = base.resolve("codebooks").toString
    val idx = base.resolve("codes").toString
    val cb = graft.llm.PqIndex.loadOrBuild(c0, "vec_id", "embedding", 4, 8, 1, cbIdx)
      .localCheckpoint()
    graft.llm.PqIndex.loadOrBuildCodes(c0, "vec_id", "embedding", cb, 4, 8, 1, idx).count()
    // wrong params / stale signature refuse
    graft.llm.PqIndex.removeFromCodes(Seq(1L).toDF("vec_id"), "vec_id", 8, 16, 0,
      c0, idx, IvfIndex.corpusSig(c0)) shouldBe false
    graft.llm.PqIndex.removeFromCodes(Seq(1L).toDF("vec_id"), "vec_id", 4, 8, 1,
      c0, idx, "files:999:deadbeef") shouldBe false
    Files.exists(Paths.get(idx, "_graft_tombstones")) shouldBe false

    // delete id 5, then re-append it: the id must come back to life
    val afterDelete = c0.filter(col("vec_id") =!= 5L)
    graft.llm.PqIndex.removeFromCodes(Seq(5L).toDF("vec_id"), "vec_id", 4, 8, 1,
      afterDelete, idx, IvfIndex.corpusSig(c0)) shouldBe true
    graft.llm.PqIndex.loadOrBuildCodes(afterDelete, "vec_id", "embedding",
      cb, 4, 8, 1, idx).filter(col("vec_id") === 5L).count() shouldBe 0L
    val sigPreAppend = IvfIndex.corpusSig(afterDelete)
    val reinserted = vecs(5 until 6)
    val afterAppend = afterDelete.union(reinserted)
    graft.llm.PqIndex.appendToCodes(reinserted, "vec_id", "embedding", cb, 4, 8, 1,
      afterAppend, idx, sigPreAppend)
    val loaded = graft.llm.PqIndex.loadOrBuildCodes(afterAppend, "vec_id", "embedding",
      cb, 4, 8, 1, idx)
    loaded.filter(col("vec_id") === 5L).count() shouldBe 1L
    graft.llm.PqIndex.compactCodes(spark, idx)
    spark.read.parquet(idx).filter(col("vec_id") === 5L).count() shouldBe 1L
  }
}
