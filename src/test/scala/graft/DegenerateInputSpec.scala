package graft

import org.apache.spark.sql.functions._

import graft.dfw.{QuantileOps, SplitOps, TimeSeriesOps, TransformOps}
import graft.llm.{DedupOps, MultimodalOps, SimilarityOps, TextOps}

/** Degenerate-input sweep: at 100 TB an EMPTY input is routine (a
  * filter that matches nothing, a partition with no rows, a fresh
  * corpus before first ingest) — every operator must return an empty
  * result, never throw. Each case here collects on a 0-row frame with
  * the right schema.
  */
class DegenerateInputSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEvents = Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "ts")
  private val noCat = Seq.empty[(String, Int)].toDF("cat", "y")

  test("text/dedup operators return empty on an empty corpus") {
    TextOps.packGreedy(noDocs, "doc_id", "text", 2048, 8).collect() shouldBe empty
    TextOps.paddingWaste(noDocs, "doc_id", "text", 16, 8, 8).count() shouldBe 2 // accounting rows with zero batches
    DedupOps.wordShingles(noDocs, "doc_id", "text", 5).collect() shouldBe empty
    DedupOps.minHashLshPairs(noDocs, "doc_id", "text", 5, 64, 16, 1, 2).collect() shouldBe empty
    DedupOps.clusterNearDups(Seq.empty[(Long, Long)].toDF("doc1", "doc2")).collect() shouldBe empty
    DedupOps.clusterNearDupsIncremental(
      Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"),
      Seq.empty[(Long, Long)].toDF("doc1", "doc2")).collect() shouldBe empty
  }

  test("mixture/encoding/aggregation operators return empty on empty input") {
    TransformOps.mixtureWeightsTemperature(noDocs, "text", 0.5).collect() shouldBe empty
    TransformOps.epochSchedule(noDocs, "text", lit(1L), 0.5, 1000L).collect() shouldBe empty
    TransformOps.targetEncodeLoo(noCat, "cat", "y").collect() shouldBe empty
    TransformOps.standardizeByGroup(noCat.withColumn("y", col("y").cast("long")),
      Seq("cat"), Seq("y")).collect() shouldBe empty
    TimeSeriesOps.rollingActiveUsers(noEvents, "ts", "user_id", 7).collect() shouldBe empty
    // the histogram's bucket spine exists even with no data: nb rows,
    // all-zero counts and fractions (the q_histogram ADVICE-r12 pin)
    val hist = QuantileOps.equiWidthHistogram(
      noCat.select(col("y").cast("double").as("v")), "v", 10).collect()
    hist.length shouldBe 10
    hist.map(_.getAs[Long]("cnt")).sum shouldBe 0L
    hist.map(_.getAs[Long]("frac_ppm")).sum shouldBe 0L
  }

  test("audio operators return empty on an empty blob table") {
    val noBlobs = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "blob")
    MultimodalOps.documentsAsAudio(noDocs, "doc_id").collect() shouldBe empty
    MultimodalOps.audioStats(noBlobs, "doc_id", "blob").collect() shouldBe empty
    MultimodalOps.audioEnergyWindows(noBlobs, "doc_id", "blob", 160).collect() shouldBe empty
    MultimodalOps.audioUpsample2x(noBlobs, "doc_id", "blob").collect() shouldBe empty
  }

  test("similarity operators return empty on empty lists/corpus") {
    val noLists = Seq.empty[(Long, Long, Seq[Long], Long)]
      .toDF("centroid_id", "vec_id", "__qv", "__n2")
    val cents = SimilarityOps.ivfCentroids(
      Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", 2)
    SimilarityOps.cellOutliersIndexed(noLists, cents, "vec_id", 5).collect() shouldBe empty
    SimilarityOps.diversitySampleIndexed(noLists, "vec_id", 5,
      DedupOps.md5TokenHash).collect() shouldBe empty
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    SimilarityOps.bruteForceTopK(noVecs, noVecs, "vec_id", "embedding", 5)
      .collect() shouldBe empty
  }

  test("split operators return empty on empty input") {
    SplitOps.hashSplit(noDocs, col("doc_id").cast("string"),
      Seq("train" -> 0.8, "test" -> 0.2), DedupOps.md5TokenHash)
      .collect() shouldBe empty
  }
}
