package graft

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** X3: top-k cosine search, exact and IVF-bucketed. */
class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  // four unit-ish vectors: 0 ≈ 1 (same direction), 2 orthogonal, 3 opposite
  private val corpus = Seq(
    (0L, Seq(1.0f, 0.0f)),
    (1L, Seq(0.999f, 0.01f)),
    (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self") {
    val q = corpus.filter(col("vec_id") === 0L)
    val got = SimilarityOps.bruteForceTopK(q, corpus, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    got.map(_._2) shouldBe Array(1L, 2L, 3L) // nearest first, never itself
    got.map(_._1) shouldBe Array(1L, 2L, 3L)
  }

  test("bruteForceTopK cosine of identical vectors is 1.0") {
    val dup = Seq((10L, Seq(0.5f, 0.5f)), (11L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.bruteForceTopK(dup.filter(col("vec_id") === 10L), dup,
        "vec_id", "embedding", 1).head()
    got.getLong(2) shouldBe 11L
    got.getDouble(3) shouldBe 1.0 +- 1e-12
  }

  test("ivfTopK with full probing matches brute force") {
    val q = corpus.filter(col("vec_id") === 0L)
    val bf = SimilarityOps.bruteForceTopK(q, corpus, "vec_id", "embedding", 2)
      .select("rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(q, corpus, "vec_id", "embedding",
        k = 2, nCentroids = 4, nProbe = 4)
      .select("rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ivf shouldBe bf
  }
}
