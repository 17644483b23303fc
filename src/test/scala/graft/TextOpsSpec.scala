package graft

import org.apache.spark.sql.functions._

import graft.llm.{MultimodalOps, TextOps}

/** X4/X5: text statistics and multimodal plumbing. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "aa bb aa cccc")).toDF("doc_id", "text")

  test("tokenStats computes exact counts and ratios") {
    val r = TextOps.tokenStats(docs, "doc_id", "text").head()
    r.getLong(1) shouldBe 4L                 // n_tokens
    r.getLong(2) shouldBe 3L                 // n_uniq
    r.getDouble(3) shouldBe 0.75             // ttr
    r.getDouble(4) shouldBe 10.0 / 4         // avg_tok_len: 10 non-space chars
    r.getLong(5) shouldBe 4L                 // longest token
  }

  test("langScore counts marker tokens and thresholds the label") {
    val d = Seq((1L, "the cat in the hat"), (2L, "chat chapeau")).toDF("doc_id", "text")
    val got = TextOps.langScore(d, "doc_id", "text", Seq("the"), threshold = 2, label = "en")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    got(1L) shouldBe ((2L, "en"))
    got(2L) shouldBe ((0L, "other"))
  }

  test("quote-bearing markers/stopwords are literals, not SQL text") {
    // markers containing quotes previously broke expr() parsing
    val d = Seq((1L, "don't can't won't plain")).toDF("doc_id", "text")
    val ls = TextOps.langScore(d, "doc_id", "text", Seq("don't", "can't"), 1, "en").head()
    ls.getLong(1) shouldBe 2L
    ls.getString(2) shouldBe "en"
    val qs = TextOps.qualityScore(d, "doc_id", "text", Seq("don't")).head()
    qs.getAs[Long]("n_stop") shouldBe 1L
  }

  test("fingerprint is a deterministic left fold over tokens") {
    def fold(text: String): Long =
      text.split(" ").foldLeft(0L)((h, t) =>
        (h * 1000003L + t.head.toInt * 256L + t.length) % 2147483647L)
    val r = TextOps.fingerprint(docs, "doc_id", "text").head()
    r.getLong(1) shouldBe fold("aa bb aa cccc")
  }

  test("X5 extractFeatures: normalized 8-bin histogram sums to ~1") {
    val blobs = MultimodalOps.documentsAsBlobs(docs, "doc_id", "text")
    val f = MultimodalOps.extractFeatures(blobs, "doc_id", "blob").collect().head
    f.features.length shouldBe 8
    f.features.map(_.toDouble).sum shouldBe 1.0 +- 1e-6
  }

  test("X5 resizeMedia emits exactly w*h bytes from the source blob") {
    val blobs = MultimodalOps.documentsAsBlobs(docs, "doc_id", "text")
    val r = MultimodalOps.resizeMedia(blobs, "doc_id", "blob", 4, 3).collect().head
    r.blob.length shouldBe 12
    // subsampled bytes come from the source
    val src = "aa bb aa cccc".getBytes("UTF-8").toSet
    r.blob.toSet.subsetOf(src) shouldBe true
  }

  test("X5 sampleFrames explodes every stride-th fixed-size chunk") {
    val blobs = MultimodalOps.documentsAsBlobs(
      Seq((9L, "x" * 100)).toDF("doc_id", "text"), "doc_id", "text")
    val frames = MultimodalOps.sampleFrames(blobs, "doc_id", "blob", frameSize = 16, stride = 2)
      .collect().sortBy(_.frame_no)
    frames.map(_.frame_no) shouldBe Array(0, 2, 4) // 100/16 = 6 frames, stride 2
    all(frames.map(_.frame.length)) shouldBe 16
  }

  test("X5 decodeBlobs is deterministic and preserves row count") {
    val blobs = MultimodalOps.documentsAsBlobs(docs, "doc_id", "text")
    val metas = MultimodalOps.decodeBlobs(blobs, "doc_id", "blob").collect()
    metas.length shouldBe 1
    val m = metas.head
    m.doc_id shouldBe 1L
    m.blob_len shouldBe "aa bb aa cccc".getBytes("UTF-8").length.toLong
    m.channels should (be >= 1 and be <= 3)
    // determinism: same input -> same fake decode
    MultimodalOps.decodeBlobs(blobs, "doc_id", "blob").collect().head shouldBe m
  }
}
