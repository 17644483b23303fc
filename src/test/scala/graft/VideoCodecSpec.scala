package graft

import org.apache.spark.sql.functions._

import graft.llm.{MultimodalOps, VideoCodec}

class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def twoTrackFile(): Array[Byte] = {
    val video = VideoCodec.TrackSpec(1, "vide", "avc1", 600, 25, 640, 360,
      Array(100, 120, 80, 90, 110), syncEvery = 2)
    val audio = VideoCodec.TrackSpec(2, "soun", "mp4a", 8000, 1024, 0, 0,
      Array.fill(7)(32), syncEvery = 0)
    VideoCodec.buildMp4(Seq(video, audio), movieTimescale = 600,
      (ti, i, j) => ((ti + 1) * 50 + i * 7 + j).toByte)
  }

  test("MP4 round-trip: every written container field parses back exactly") {
    val bytes = twoTrackFile()
    new String(bytes.slice(4, 8), "US-ASCII") shouldBe "ftyp"
    val m = VideoCodec.parseMp4(bytes).get
    m.brand shouldBe "isom"
    m.timescale shouldBe 600L
    // movie duration = LONGEST track in movie timescale: video is
    // 5·25 = 125, audio is 7·1024 media units at 8000 Hz = 537 movie
    // units (integer floor of 537.6) — audio wins
    m.duration shouldBe 537L
    m.tracks.length shouldBe 2
    val v = m.tracks.find(_.handler == "vide").get
    (v.trackId, v.codec, v.timescale, v.duration) shouldBe ((1L, "avc1", 600L, 125L))
    (v.width, v.height) shouldBe ((640, 360))
    v.sampleSizes.toSeq shouldBe Seq(100, 120, 80, 90, 110)
    v.syncSamples.toSeq shouldBe Seq(1, 3, 5) // every 2nd, 1-based
    v.sampleBytesTotal shouldBe 500L
    val a = m.tracks.find(_.handler == "soun").get
    (a.trackId, a.codec, a.timescale, a.duration) shouldBe ((2L, "mp4a", 8000L, 7L * 1024))
    a.nSamples shouldBe 7L
    a.nSync shouldBe 7L // no stss => spec says every sample is sync
    a.sampleBytesTotal shouldBe 224L
  }

  test("demux reads the exact byte range of each sample (stsc/stco/stsz walk)") {
    val bytes = twoTrackFile()
    val m = VideoCodec.parseMp4(bytes).get
    val v = m.tracks.find(_.handler == "vide").get
    // sample i of the video track was written as bytes 50 + i*7 + j
    for (i <- 0 until 5) {
      val frame = VideoCodec.sampleData(bytes, v, i)
      frame.length shouldBe v.sampleSizes(i)
      frame.zipWithIndex.foreach { case (b, j) =>
        (b & 0xff) shouldBe ((50 + i * 7 + j) & 0xff)
      }
    }
    // audio chunk sits after the whole video chunk in mdat
    val a = m.tracks.find(_.handler == "soun").get
    a.sampleOffsets.head shouldBe (v.sampleOffsets.head + v.sampleBytesTotal)
    val aFrame = VideoCodec.sampleData(bytes, a, 3)
    aFrame.zipWithIndex.foreach { case (b, j) =>
      (b & 0xff) shouldBe ((100 + 3 * 7 + j) & 0xff)
    }
  }

  test("parseMp4 rejects non-MP4 bytes and truncated/malformed boxes") {
    VideoCodec.parseMp4("this is not a video file at all.....".getBytes) shouldBe None
    VideoCodec.parseMp4(Array.empty[Byte]) shouldBe None
    VideoCodec.parseMp4(null) shouldBe None
    // valid prefix, then truncate inside moov: the walk stops at the
    // malformed tail; with no complete moov the parse is None
    val bytes = twoTrackFile()
    VideoCodec.parseMp4(bytes.take(bytes.length / 2)) shouldBe None
    // a RIFF/WAV file is not an MP4
    VideoCodec.parseMp4(graft.llm.AudioCodec.buildWavPcm16(8000,
      Array[Short](1, 2, 3))) shouldBe None
  }

  test("documentsAsVideo -> videoMeta: parsed rows equal the integer generator spec") {
    val docs = (0L until 20L).toDF("doc_id")
    val rows = MultimodalOps.videoMeta(
        MultimodalOps.documentsAsVideo(docs, "doc_id"), "doc_id", "blob")
      .orderBy("doc_id", "track_id").collect()
    // one video row per doc + one audio row per even doc
    rows.length shouldBe 20 + 10
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      r.getAs[String]("brand") shouldBe "isom"
      r.getAs[Long]("movie_timescale") shouldBe 600L
      val nV = 24 + (id % 48)
      // longest track in movie units: audio (40·1024 @8000 → 3072)
      // beats video (nV·25 <= 1775) whenever the audio track exists
      r.getAs[Long]("movie_duration") shouldBe
        (if (id % 2 == 0) 3072L else nV * 25)
      if (r.getAs[Long]("track_id") == 1L) {
        r.getAs[String]("handler") shouldBe "vide"
        r.getAs[String]("codec") shouldBe (if (id % 3 == 0) "hev1" else "avc1")
        r.getAs[Int]("width") shouldBe 320 + (id % 8).toInt * 16
        r.getAs[Int]("height") shouldBe 240 + (id % 5).toInt * 16
        r.getAs[Long]("n_samples") shouldBe nV
        r.getAs[Long]("n_sync") shouldBe (nV + 11) / 12
        r.getAs[Long]("sample_bytes") shouldBe
          (0L until nV).map(i => 64 + (id * 7 + i * 13) % 96).sum
      } else {
        id % 2 shouldBe 0L
        r.getAs[String]("handler") shouldBe "soun"
        r.getAs[String]("codec") shouldBe "mp4a"
        (r.getAs[Long]("n_samples"), r.getAs[Long]("n_sync")) shouldBe ((40L, 40L))
        r.getAs[Long]("sample_bytes") shouldBe 1280L
      }
    }
  }

  test("sampleSyncFrames demuxes exactly the stss samples with exact byte sums") {
    val docs = Seq(5L, 6L).toDF("doc_id")
    val got = MultimodalOps.sampleSyncFrames(
        MultimodalOps.documentsAsVideo(docs, "doc_id"), "doc_id", "blob")
      .orderBy("doc_id", "sample_no")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val expected = Seq(5L, 6L).flatMap { id =>
      val nV = 24 + (id % 48).toInt
      (1 to nV by 12).map { s =>
        val i = s - 1
        val len = 64 + ((id * 7 + i.toLong * 13) % 96).toInt
        val sum = (0 until len).map(j => (id + i.toLong * 31 + j.toLong * 7) % 256).sum
        (id, s, len.toLong, sum)
      }
    }
    got shouldBe expected
  }

  test("motion-JPEG pipeline: keyframes decode through the real JDK JPEG codec " +
    "with container-exact dims and bounded luma error") {
    val docs = Seq(3L, 4L, 7L).toDF("doc_id")
    val rows = MultimodalOps.videoFrameRefError(
        MultimodalOps.documentsAsMjpeg(docs, "doc_id", "jpg"),
        "doc_id", "blob")(MultimodalOps.mjpegFramePixel)
      .orderBy("doc_id", "sample_no")
      .as[(Long, String, Int, Int, Int, Long, Long)].collect().toSeq
    val expectedKeys = Seq(3L, 4L, 7L).flatMap { id =>
      val (w, h, nF) = (32 + (id % 4).toInt * 16, 24 + (id % 3).toInt * 8, 6 + (id % 6).toInt)
      (1 to nF by 3).map(s => (id, "jpeg", s, w, h, w.toLong * h))
    }
    rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)) shouldBe expectedKeys
    // lossy codec: bounded, not exact (measured max 1 on this gradient)
    all(rows.map(_._7)) should be <= 16L
  }

  test("png-track pipeline: keyframes decode losslessly — exact closed-form gray sums") {
    val docs = Seq(2L, 9L).toDF("doc_id")
    val rows = MultimodalOps.videoFramePixels(
        MultimodalOps.documentsAsMjpeg(docs, "doc_id", "png"),
        "doc_id", "blob")
      .orderBy("doc_id", "sample_no")
      .as[(Long, String, Int, Int, Int, Long, Long)].collect().toSeq
    val expected = Seq(2L, 9L).flatMap { id =>
      val (w, h, nF) = (32 + (id % 4).toInt * 16, 24 + (id % 3).toInt * 8, 6 + (id % 6).toInt)
      (1 to nF by 3).map { s =>
        val f = s - 1
        (id, "png ", s, w, h, w.toLong * h,
          w.toLong * h * ((f + (id % 8)) + (w - 1) + (h - 1)))
      }
    }
    rows shouldBe expected
  }
}
