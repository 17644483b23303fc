package graft

import org.apache.spark.sql.functions._

import graft.llm.{AudioCodec, MultimodalOps}

class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  test("WAV round-trip: build then parse through the JDK codec returns identical samples") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 10)
    val wav = AudioCodec.buildWavPcm16(8000, samples)
    // canonical RIFF container: 44-byte header + 2 bytes per sample
    wav.length shouldBe 44 + samples.length * 2
    new String(wav.take(4), "US-ASCII") shouldBe "RIFF"
    val Some((rate, got)) = AudioCodec.parseWavPcm16(wav)
    rate shouldBe 8000
    got.toSeq shouldBe samples.toSeq
  }

  test("parseWavPcm16 returns None for undecodable bytes") {
    AudioCodec.parseWavPcm16("not audio at all".getBytes) shouldBe None
    AudioCodec.parseWavPcm16(Array.empty[Byte]) shouldBe None
  }

  test("fast chunk-walk parse and the JDK codec path agree sample-for-sample") {
    val samples = Array[Short](3, -3, 12000, -12000, 0)
    val wav = AudioCodec.buildWavPcm16(16000, samples)
    val fast = AudioCodec.fastParse(wav)
    val jdk = AudioCodec.parseViaJdk(wav)
    fast shouldBe defined
    jdk shouldBe defined
    fast.get._1 shouldBe jdk.get._1
    fast.get._2.toSeq shouldBe jdk.get._2.toSeq
  }

  test("chunk walk skips unknown chunks (LIST metadata between fmt and data)") {
    val samples = Array[Short](1, 2, 3)
    val canonical = AudioCodec.buildWavPcm16(8000, samples)
    // splice a 10-byte LIST chunk between "fmt " (ends at offset 36)
    // and "data"; RIFF sizes are advisory in the walk, so only the
    // chunk ids/lengths matter
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](10, 0, 0, 0) ++ Array.fill[Byte](10)(7)
    val spliced = canonical.take(36) ++ list ++ canonical.drop(36)
    val Some((rate, got)) = AudioCodec.fastParse(spliced)
    rate shouldBe 8000
    got.toSeq shouldBe samples.toSeq
  }

  test("audioStats: exact integer stats from decoded samples") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 10)
    val df = Seq((7L, AudioCodec.buildWavPcm16(8000, samples))).toDF("doc_id", "blob")
    val r = MultimodalOps.audioStats(df, "doc_id", "blob").collect().head
    r.doc_id shouldBe 7L
    r.sample_rate shouldBe 8000L
    r.n_samples shouldBe 6L
    r.duration_us shouldBe 750L // 6 * 1e6 div 8000
    r.peak_abs shouldBe 32768L
    r.sum_sq shouldBe (100L * 100 * 2 + 32767L * 32767 + 32768L * 32768 + 10L * 10)
    r.silence_ppm shouldBe (2L * 1000000 / 6) // samples 0 and 10
  }

  test("audioEnergyWindows: frames of windowSamples with a kept partial tail") {
    val samples = Array[Short](0, 0, 0, 0, 500, -500)
    val df = Seq((1L, AudioCodec.buildWavPcm16(8000, samples))).toDF("doc_id", "blob")
    val got = MultimodalOps.audioEnergyWindows(df, "doc_id", "blob",
        windowSamples = 4).collect().sortBy(_.win_no)
    got.map(w => (w.win_no, w.n, w.sum_sq, w.peak_abs, w.is_silent)).toSeq shouldBe
      Seq((0L, 4L, 0L, 0L, true), (1L, 2L, 500000L, 500L, false))
  }

  test("audioUpsample2x: midpoint interpolation exact, truncation on negative sums") {
    val samples = Array[Short](0, 100, -101, 3)
    // out: 0, 50, 100, trunc(-1/2)=0, -101, -49, 3 — truncation toward
    // zero matches Spark div and DuckDB // (floorDiv would give -1)
    val df = Seq((1L, AudioCodec.buildWavPcm16(8000, samples))).toDF("doc_id", "blob")
    val r = MultimodalOps.audioUpsample2x(df, "doc_id", "blob").collect().head
    r.in_rate shouldBe 8000L
    r.out_rate shouldBe 16000L
    r.n_in shouldBe 4L
    r.n_out shouldBe 7L
    r.out_peak shouldBe 101L
    r.out_sum_sq shouldBe (0L + 50L * 50 + 100L * 100 + 0L + 101L * 101 + 49L * 49 + 3L * 3)
  }

  test("documentsAsAudio → VAD: even windows are digital silence, odd windows loud") {
    val docs = Seq((7L, "x"), (47L, "y")).toDF("doc_id", "text")
    val wins = MultimodalOps.audioEnergyWindows(
        MultimodalOps.documentsAsAudio(docs, "doc_id"), "doc_id", "blob",
        windowSamples = 160).collect()
    wins.filter(_.win_no % 2 == 0).foreach { w => w.is_silent shouldBe true }
    wins.filter(_.win_no % 2 == 1).foreach { w =>
      w.is_silent shouldBe false
      w.sum_sq should be > 0L
    }
    // n_samples = 200 + id%100 → doc 7 has 207 samples = windows of 160 + 47
    wins.filter(_.doc_id == 7L).map(w => w.win_no -> w.n).toMap shouldBe
      Map(0L -> 160L, 1L -> 47L)
  }
}
