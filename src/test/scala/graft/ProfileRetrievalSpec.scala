package graft

import org.apache.spark.sql.functions._
import graft.dfw.QuantileOps
import graft.llm.{DedupOps, TextOps}

/** Round-12 additions: equi-width histogram, BM25 retrieval,
  * within-doc repetition removal, sorted-neighborhood blocking.
  */
class ProfileRetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("equiWidthHistogram: dense spine, correct bucketing, max folds into last bucket") {
    val df = Seq(0.0, 1.0, 2.5, 5.0, 9.9, 10.0).toDF("v")
    val got = QuantileOps.equiWidthHistogram(df, "v", nb = 4).orderBy("bucket").collect()
    got.length shouldBe 4 // every bucket present even when empty
    // boundary values land in the upper bucket: 2.5 -> 1, 5.0 -> 2
    got.map(_.getAs[Long]("cnt")).toSeq shouldBe Seq(2L, 1L, 1L, 2L)
    got.map(_.getAs[Long]("bucket")).toSeq shouldBe Seq(0L, 1L, 2L, 3L)
    got(0).getAs[Double]("lo") shouldBe 0.0
    got(3).getAs[Double]("hi") shouldBe 10.0
    got.map(_.getAs[Long]("frac_ppm")).sum should be <= 1000000L
  }

  test("equiWidthHistogram: degenerate min==max collapses to bucket 0") {
    val got = QuantileOps.equiWidthHistogram(Seq(7.0, 7.0, 7.0).toDF("v"), "v", nb = 3)
      .orderBy("bucket").collect()
    got.map(_.getAs[Long]("cnt")).toSeq shouldBe Seq(3L, 0L, 0L)
  }

  test("bm25TopK: a doc with more distinct query terms outranks tf-saturated repetition") {
    val docs = Seq(
      (1L, "hash join merge filler filler filler"),      // 3 distinct terms
      (2L, "hash hash hash hash hash hash"),             // 1 term, saturating tf
      (3L, "filler filler filler filler filler filler"), // no terms
      (4L, "hash join filler filler filler filler")      // 2 distinct terms
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, "doc_id", "text", Seq("hash", "join", "merge"), topK = 10)
      .collect()
    got.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 4L, 2L) // no row for doc 3
    got.map(_.getAs[Long]("rnk")).toSeq shouldBe Seq(1L, 2L, 3L)
    got.head.getAs[Long]("n_terms") shouldBe 3L
    all(got.map(_.getAs[Long]("score_q"))) should be > 0L
  }

  test("bm25TopK: longer documents are penalized at equal tf") {
    val docs = Seq(
      (1L, "hash short doc"),
      (2L, "hash " + Seq.fill(40)("pad").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, "doc_id", "text", Seq("hash"), topK = 10).collect()
    got.map(_.getAs[Long]("doc_id")).toSeq shouldBe Seq(1L, 2L)
  }

  test("dedupWithinDoc: keep-first order, counts, ratio") {
    val docs = Seq((1L, "a b a c b a"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextOps.dedupWithinDoc(docs, "doc_id", "text").orderBy("doc_id").collect()
    got(0).getAs[String]("dedup_text") shouldBe "a b c"
    got(0).getAs[Long]("n_before") shouldBe 6L
    got(0).getAs[Long]("n_after") shouldBe 3L
    got(0).getAs[Long]("rep_ratio_ppm") shouldBe 500000L
    got(1).getAs[String]("dedup_text") shouldBe "x y z"
    got(1).getAs[Long]("rep_ratio_ppm") shouldBe 0L
  }

  test("sortedNeighborhood: near keys inside a block pair up; across blocks never") {
    val docs = Seq(
      (1L, "alpha 0001", "alpha"), (2L, "alpha 0002", "alpha"), // dist 1, adjacent
      (3L, "alpha zzzz", "alpha"),                              // far from both
      (4L, "beta 0001", "beta")                                 // other block
    ).toDF("doc_id", "k", "blk")
    val got = DedupOps.sortedNeighborhoodPairs(docs, "doc_id",
        col("k"), col("blk"), w = 2, maxDist = 2)
      .orderBy("id_a", "id_b").collect()
    got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe Seq((1L, 2L, 1L))
  }

  test("psiDrift: identical slices score ~0; a shifted slice scores high") {
    import graft.llm.{TextOps => _}
    val same = (1 to 100).flatMap(i => Seq((i.toDouble % 10, true), (i.toDouble % 10, false)))
      .toDF("v", "ref")
    val psiSame = QuantileOps.psiDrift(same, "v", col("ref"), nb = 8)
      .select("psi_total_q").head().getLong(0)
    psiSame shouldBe 0L
    // current slice shifted wholesale into the top half of the range
    val drift = ((1 to 100).map(i => ((i % 10).toDouble, true)) ++
      (1 to 100).map(i => ((i % 10).toDouble + 10.0, false))).toDF("v", "ref")
    val psiDrift = QuantileOps.psiDrift(drift, "v", col("ref"), nb = 8)
      .select("psi_total_q").head().getLong(0)
    psiDrift should be > 250000L // PSI > 0.25 = "drifted" threshold
    // every bucket present on both, spine is dense
    QuantileOps.psiDrift(drift, "v", col("ref"), nb = 8).count() shouldBe 8L
  }

  test("charEntropy: uniform alphabet hits ln(k); single-char text is zero") {
    val docs = Seq((1L, "abcd"), (2L, "aaaa"), (3L, "aabb")).toDF("doc_id", "text")
    val got = TextOps.charEntropy(docs, "doc_id", "text").orderBy("doc_id").collect()
    got(0).getAs[Double]("entropy") shouldBe (math.log(4.0) +- 1e-5)
    got(0).getAs[Long]("n_distinct") shouldBe 4L
    got(1).getAs[Double]("entropy") shouldBe 0.0
    got(2).getAs[Double]("entropy") shouldBe (math.log(2.0) +- 1e-5)
    got.map(_.getAs[Long]("n_chars")).toSeq shouldBe Seq(4L, 4L, 4L)
  }

  test("charEntropy: repetitive text scores below varied text of the same length") {
    val docs = Seq((1L, "spam spam spam spam"), (2L, "the quick brown fox")).toDF("doc_id", "text")
    val got = TextOps.charEntropy(docs, "doc_id", "text").orderBy("doc_id").collect()
    got(0).getAs[Double]("entropy") should be < got(1).getAs[Double]("entropy")
  }

  test("sortedNeighborhood: window w bounds how far comparisons reach") {
    // identical keys rank by id: 1,2,3,4 in one block; w=1 compares
    // only successive pairs
    val docs = (1L to 4L).map(i => (i, "same", "b")).toDF("doc_id", "k", "blk")
    val got = DedupOps.sortedNeighborhoodPairs(docs, "doc_id",
        col("k"), col("blk"), w = 1, maxDist = 0)
      .orderBy("id_a", "id_b").collect()
    got.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((1L, 2L), (2L, 3L), (3L, 4L))
  }
}
