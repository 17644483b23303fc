package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.llm.{DedupOps, IvfIndex, SimilarityOps}

/** Incremental maintenance for the MinHash and RHP index families
  * (VERDICT r8 item 5): delta-append must equal a from-scratch build
  * over the grown corpus, reuse on the next load, and fall back to a
  * full rebuild whenever the stored sidecar is missing, stale, or
  * built under different parameters — the same protocol
  * [[graft.llm.IvfIndex.appendToLists]] pins in IvfIndexSpec.
  */
class IndexAppendSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) =
    ids.map(i => (i.toLong, s"the quick document $i talks about topic ${i % 5} in words ${i % 7} and ${i % 3}"))
      .toDF("doc_id", "text")

  private def vecs(ids: Range) =
    ids.map(i => (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j).toFloat)))
      .toDF("vec_id", "embedding")

  private def partMTimes(dir: String): Map[String, Long] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.mkString("[", ",", "]")
      case x => String.valueOf(x)
    }.mkString("|")).toSeq.sorted

  // ---------------------------------------------------------------- MinHash

  test("appendToMinHashIndex: delta maintenance equals a full rebuild, next load reuses") {
    val base = Files.createTempDirectory("minhash-append")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    docs(0 until 30).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    DedupOps.loadOrBuildMinHashIndex(c0, "doc_id", "text", 3, 16, 4, idx)._1.count()

    val sigBefore = IvfIndex.corpusSig(c0)
    val delta = docs(100 until 110)
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)

    val beforeSh = partMTimes(s"$idx/shingles")
    val beforeBd = partMTimes(s"$idx/banded")
    val (banded, sh) =
      DedupOps.appendToMinHashIndex(delta, "doc_id", "text", 3, 16, 4, grown, idx, sigBefore)

    // existing part files untouched — delta-only writes
    partMTimes(s"$idx/shingles").view.filterKeys(beforeSh.contains).toMap shouldBe beforeSh
    partMTimes(s"$idx/banded").view.filterKeys(beforeBd.contains).toMap shouldBe beforeBd

    // extended tables equal a from-scratch build over the grown corpus
    val shTruth = DedupOps.wordShingles(grown, "doc_id", "text", 3)
    sortedRows(sh) shouldBe sortedRows(shTruth)
    sortedRows(banded) shouldBe sortedRows(DedupOps.minHashBandedFromShingles(shTruth, 16, 4))

    // next loadOrBuild reuses the extended index — no rewrite
    val afterAppendSh = partMTimes(s"$idx/shingles")
    val afterAppendBd = partMTimes(s"$idx/banded")
    DedupOps.loadOrBuildMinHashIndex(grown, "doc_id", "text", 3, 16, 4, idx)._1.count()
    partMTimes(s"$idx/shingles") shouldBe afterAppendSh
    partMTimes(s"$idx/banded") shouldBe afterAppendBd
  }

  test("ingest loop: gate flags known dups, accepted novel docs append, re-submissions are then caught") {
    val base = Files.createTempDirectory("minhash-ingest")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    docs(0 until 30).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val (b0, s0) = DedupOps.loadOrBuildMinHashIndex(c0, "doc_id", "text", 3, 16, 4, idx)

    // incoming batch: one exact copy of corpus doc 3, one novel doc
    val doc3Text = docs(3 until 4).collect()(0).getString(1)
    val novelText = "genuinely novel submission with entirely fresh vocabulary streams"
    val incoming = Seq((200L, doc3Text), (201L, novelText)).toDF("doc_id", "text")
    val hits0 = DedupOps.minHashGateIndexed(incoming, b0, s0, "doc_id", "text",
        shingleW = 3, numHashes = 16, bands = 4, num = 1, den = 2)
      .select("in_id").as[Long].collect().toSet
    hits0 shouldBe Set(200L) // the copy is flagged, the novel doc passes

    // accept the novel doc: corpus append + O(delta) index append
    val sigBefore = IvfIndex.corpusSig(c0)
    val accepted = Seq((201L, novelText)).toDF("doc_id", "text")
    accepted.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    val (b1, s1) =
      DedupOps.appendToMinHashIndex(accepted, "doc_id", "text", 3, 16, 4, grown, idx, sigBefore)

    // a re-submission of the accepted doc is now caught against it
    val resub = Seq((300L, novelText)).toDF("doc_id", "text")
    val hits1 = DedupOps.minHashGateIndexed(resub, b1, s1, "doc_id", "text",
        shingleW = 3, numHashes = 16, bands = 4, num = 1, den = 2)
      .select("corpus_id").as[Long].collect().toSet
    hits1 shouldBe Set(201L)
  }

  test("loadOrBuildMinHashGate: stored artifacts gate equals the in-memory gate, next load reuses") {
    val base = Files.createTempDirectory("minhash-gate-store")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    docs(0 until 30).write.parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val incoming = Seq(
      (200L, docs(5 until 6).collect()(0).getString(1)),
      (201L, "entirely unrelated probing text with distinct words only")).toDF("doc_id", "text")

    val (bandedGate, shSets) =
      DedupOps.loadOrBuildMinHashGate(corpus, "doc_id", "text", 3, 16, 4, idx)
    val stored = DedupOps.minHashGatePrepared(incoming, bandedGate, shSets,
      "doc_id", "text", 3, 16, 4, 1, 2)
    val (banded, sh) = DedupOps.loadOrBuildMinHashIndex(corpus, "doc_id", "text", 3, 16, 4, idx)
    val inMemory = DedupOps.minHashGateIndexed(incoming, banded, sh,
      "doc_id", "text", 3, 16, 4, 1, 2)
    sortedRows(stored) shouldBe sortedRows(inMemory)
    stored.select("in_id").collect().map(_.getLong(0)).toSet shouldBe Set(200L)

    // warm load: no rewrite of either artifact table
    val beforeB = partMTimes(s"$idx/gate_bands")
    val beforeS = partMTimes(s"$idx/gate_shsets")
    DedupOps.loadOrBuildMinHashGate(corpus, "doc_id", "text", 3, 16, 4, idx)._1.count()
    partMTimes(s"$idx/gate_bands") shouldBe beforeB
    partMTimes(s"$idx/gate_shsets") shouldBe beforeS
  }

  test("appendToMinHashIndex guards freshness: missing/params/stale sidecar falls back to rebuild") {
    val base = Files.createTempDirectory("minhash-append-guard")
    val corpusDir = base.resolve("corpus").toString
    docs(0 until 30).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val sigBefore = IvfIndex.corpusSig(c0)
    val delta = docs(100 until 110)
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    val shTruth = sortedRows(DedupOps.wordShingles(grown, "doc_id", "text", 3))

    // 1) append before any build: no sidecar → full rebuild, never a
    // delta-only table
    val neverBuilt = base.resolve("never-built").toString
    val (_, sh1) =
      DedupOps.appendToMinHashIndex(delta, "doc_id", "text", 3, 16, 4, grown, neverBuilt, sigBefore)
    sortedRows(sh1) shouldBe shTruth

    // 2) params changed since the build (different shingle width /
    // band count) → rebuild under the requested params
    val paramsDir = base.resolve("params").toString
    DedupOps.loadOrBuildMinHashIndex(c0, "doc_id", "text", 2, 16, 8, paramsDir)._1.count()
    val (banded2, sh2) =
      DedupOps.appendToMinHashIndex(delta, "doc_id", "text", 3, 16, 4, grown, paramsDir, sigBefore)
    sortedRows(sh2) shouldBe shTruth
    sortedRows(banded2) shouldBe
      sortedRows(DedupOps.minHashBandedFromShingles(DedupOps.wordShingles(grown, "doc_id", "text", 3), 16, 4))

    // 3) stale signature: stored index stamped against a different
    // corpus state → rebuild, not append
    val staleDir = base.resolve("stale").toString
    DedupOps.loadOrBuildMinHashIndex(c0, "doc_id", "text", 3, 16, 4, staleDir)._1.count()
    val (_, sh3) = DedupOps.appendToMinHashIndex(delta, "doc_id", "text", 3, 16, 4, grown, staleDir,
      preAppendSig = "files:999:deadbeef")
    sortedRows(sh3) shouldBe shTruth
  }

  // ---------------------------------------------------------------- RHP

  private val parity: (Long, Long) => Long = graft.functions.RhpSign.xxhashParity _

  test("appendToRhpIndex: delta maintenance equals a full rebuild, next load reuses") {
    val base = Files.createTempDirectory("rhp-append")
    val corpusDir = base.resolve("corpus").toString
    val idx = base.resolve("idx").toString
    vecs(0 until 40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    SimilarityOps.loadOrBuildRhpIndex(c0, "vec_id", "embedding", 6, 2, "xxhash", parity, 64, idx)
      ._1.count()

    val sigBefore = IvfIndex.corpusSig(c0)
    val delta = vecs(100 until 112)
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)

    val beforeQc = partMTimes(s"$idx/quantized")
    val beforeBk = partMTimes(s"$idx/buckets")
    val (buckets, qc) = SimilarityOps.appendToRhpIndex(delta, "vec_id", "embedding",
      6, 2, "xxhash", parity, 64, grown, idx, sigBefore)

    partMTimes(s"$idx/quantized").view.filterKeys(beforeQc.contains).toMap shouldBe beforeQc
    partMTimes(s"$idx/buckets").view.filterKeys(beforeBk.contains).toMap shouldBe beforeBk

    sortedRows(qc) shouldBe
      sortedRows(SimilarityOps.rhpQuantizedCorpus(grown, "vec_id", "embedding"))
    sortedRows(buckets) shouldBe
      sortedRows(SimilarityOps.rhpCorpusBuckets(grown, "vec_id", "embedding", 6, 2, parity, 64))

    val afterQc = partMTimes(s"$idx/quantized")
    val afterBk = partMTimes(s"$idx/buckets")
    SimilarityOps.loadOrBuildRhpIndex(grown, "vec_id", "embedding", 6, 2, "xxhash", parity, 64, idx)
      ._1.count()
    partMTimes(s"$idx/quantized") shouldBe afterQc
    partMTimes(s"$idx/buckets") shouldBe afterBk
  }

  test("appendToRhpIndex guards freshness: missing/params/stale sidecar falls back to rebuild") {
    val base = Files.createTempDirectory("rhp-append-guard")
    val corpusDir = base.resolve("corpus").toString
    vecs(0 until 40).write.parquet(corpusDir)
    val c0 = spark.read.parquet(corpusDir)
    val sigBefore = IvfIndex.corpusSig(c0)
    val delta = vecs(100 until 112)
    delta.write.mode("append").parquet(corpusDir)
    val grown = spark.read.parquet(corpusDir)
    val bkTruth =
      sortedRows(SimilarityOps.rhpCorpusBuckets(grown, "vec_id", "embedding", 6, 2, parity, 64))

    // 1) no prior build
    val neverBuilt = base.resolve("never-built").toString
    val (bk1, _) = SimilarityOps.appendToRhpIndex(delta, "vec_id", "embedding",
      6, 2, "xxhash", parity, 64, grown, neverBuilt, sigBefore)
    sortedRows(bk1) shouldBe bkTruth

    // 2) params drift: built with nBits=8, append requested at nBits=6
    val paramsDir = base.resolve("params").toString
    SimilarityOps.loadOrBuildRhpIndex(c0, "vec_id", "embedding", 8, 2, "xxhash", parity, 64,
      paramsDir)._1.count()
    val (bk2, _) = SimilarityOps.appendToRhpIndex(delta, "vec_id", "embedding",
      6, 2, "xxhash", parity, 64, grown, paramsDir, sigBefore)
    sortedRows(bk2) shouldBe bkTruth

    // 3) stale signature
    val staleDir = base.resolve("stale").toString
    SimilarityOps.loadOrBuildRhpIndex(c0, "vec_id", "embedding", 6, 2, "xxhash", parity, 64,
      staleDir)._1.count()
    val (bk3, _) = SimilarityOps.appendToRhpIndex(delta, "vec_id", "embedding",
      6, 2, "xxhash", parity, 64, grown, staleDir, preAppendSig = "files:999:deadbeef")
    sortedRows(bk3) shouldBe bkTruth
  }
}
