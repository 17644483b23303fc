package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** X6: the same transform bodies must work in batch and on a real
  * Structured Streaming source. The streaming tests drive a
  * MemoryStream through `writeStream` into a memory sink.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val eventRows = Seq(
    (1L, "u1", "click", 1.0, ts(0)),
    (2L, "u1", "click", 2.0, ts(5)),
    (3L, "u1", "view", 4.0, ts(40)),  // 35-min gap: new session for u1
    (4L, "u2", "click", 8.0, ts(2)))

  private def events = eventRows.toDF("event_id", "user_id", "event_type", "value", "ts")

  test("sessionizeBatch splits on gaps > threshold") {
    val got = StreamOps.sessionizeBatch(events, gapMinutes = 10)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set(("u1", 1L, 2L), ("u1", 2L, 1L), ("u2", 1L, 1L))
  }

  test("sessionStats: one-row rollup — counts, bounce ppm, exact duration percentiles") {
    // sessions (gap 10 min): u1 [10:00,10:05] (2 events, 300 s),
    // u1 [10:40] (bounce, 0 s), u2 [10:02] (bounce, 0 s)
    val got = StreamOps.sessionStats(events, gapMinutes = 10).collect().head
    got.getLong(0) shouldBe 3L        // n_sessions
    got.getLong(1) shouldBe 2L        // n_users
    got.getLong(2) shouldBe 4L        // n_events_total
    got.getLong(3) shouldBe 2L        // n_bounce
    got.getLong(4) shouldBe 666666L   // bounce_ppm = 2e6 div 3
    got.getLong(5) shouldBe 300000000L // sum_dur_us
    got.getDouble(6) shouldBe 0.0     // p50 of (0, 0, 300)
    got.getDouble(7) shouldBe (240.0 +- 1e-9) // p90: 0.9*(3-1)=1.8 → 0 + 0.8*300
  }

  test("tumblingAgg buckets by window start") {
    val got = StreamOps.tumblingAgg(events, "1 hour")
      .select("ws", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val hour = Timestamp.valueOf("2026-01-01 10:00:00")
    got shouldBe Set((hour, "click", 3L), (hour, "view", 1L))
  }

  test("tumblingAggStream runs on a real stream and matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = StreamOps.tumblingAggStream(streamDf, "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("tumbling_test").outputMode("complete").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val got = spark.table("tumbling_test")
        .select("ws", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val hour = Timestamp.valueOf("2026-01-01 10:00:00")
      got shouldBe Set((hour, "click", 3L, 11.0), (hour, "view", 1L, 4.0))
    } finally q.stop()
  }

  test("heavyHittersStream: per-window sketch on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val docRows = Seq(
      (1L, "spark spark shuffle join", ts(1)),
      (2L, "shuffle spark scan", ts(7)),
      (3L, "join join codegen", ts(40)),   // second 30-min window
      (4L, "spark", ts(45)))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val streamDf = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamOps.heavyHittersStream(streamDf, "text", "30 minutes",
        watermark = "2 hours", d = 3, w = 64)
      .writeStream.format("memory").queryName("hh_stream_test").outputMode("complete").start()
    try {
      mem.addData(docRows: _*)
      q.processAllAvailable()
      val got = spark.table("hh_stream_test")
        .select("ws", "sketch", "n_tokens").collect()
        .map(r => r.getTimestamp(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
      val batch = StreamOps.heavyHittersWindowed(
          docRows.toDF("doc_id", "text", "ts"), "text", "30 minutes", d = 3, w = 64)
        .select("ws", "sketch", "n_tokens").collect()
        .map(r => r.getTimestamp(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
      // commutative-monoid merge: the sketches must be IDENTICAL
      // arrays regardless of arrival order / partitioning
      got shouldBe batch
      batch.values.map(_._2).sum shouldBe 11L
    } finally q.stop()
  }

  test("distinctUsersStream: per-window HLL estimate on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 repeats across batches in window 1 (must count once);
    // window 2 has two distinct users arriving out of order
    val rows = Seq(
      (1L, 1L, "click", 1.0, ts(1)),
      (2L, 2L, "click", 1.0, ts(7)),
      (3L, 1L, "click", 1.0, ts(12)),
      (4L, 9L, "view", 1.0, ts(40)),   // second 30-min window
      (5L, 8L, "view", 1.0, ts(35)))
    val mem = MemoryStream[(Long, Long, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = StreamOps.distinctUsersStream(streamDf, "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("du_stream_test").outputMode("complete").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*) // second batch re-sends user 1 + out-of-order window 2
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))
      val got = spark.table("du_stream_test")
        .select("ws", "event_type", "est_users", "n_events").collect().map(key).toMap
      val batch = StreamOps.distinctUsersWindowed(
          rows.toDF("event_id", "user_id", "event_type", "value", "ts"), "30 minutes")
        .select("ws", "event_type", "est_users", "n_events").collect().map(key).toMap
      // register merge is max-per-register: estimate must be identical
      // regardless of batch boundaries and arrival order
      got shouldBe batch
      // HLL is exact at these cardinalities: 2 distinct in w1, 2 in w2
      batch.values.map(_._1).toSeq.sorted shouldBe Seq(2L, 2L)
    } finally q.stop()
  }

  test("mixDriftStream: per-window PSI on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // window 1: 3 click + 1 view + 1 out-of-vocab; window 2: 2 error —
    // heavy drift from the reference mix in both windows
    val rows = Seq(
      (1L, "click", ts(1)), (2L, "click", ts(7)), (3L, "view", ts(12)),
      (4L, "bogus", ts(14)), (5L, "click", ts(20)),
      (6L, "error", ts(40)), (7L, "error", ts(45)))
    val ref = Seq("click" -> 500000L, "view" -> 300000L, "error" -> 200000L)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "event_type", "ts")
    val q = StreamOps.mixDriftStream(streamDf, "event_type", ref,
        "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("mix_drift_test")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(3): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(3): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        r.getTimestamp(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
      val got = spark.table("mix_drift_test")
        .select("ws", "n_rows", "n_invocab", "psi_q").collect().map(key).toMap
      val batch = StreamOps.mixDriftWindowed(
          rows.toDF("event_id", "event_type", "ts"), "event_type", ref,
          "30 minutes")
        .select("ws", "n_rows", "n_invocab", "psi_q").collect().map(key).toMap
      got shouldBe batch // integer psi_q: exact under any batching
      val w1 = batch(Timestamp.valueOf("2026-01-01 10:00:00"))
      w1._1 shouldBe 5L // all rows counted...
      w1._2 shouldBe 4L // ...but 'bogus' is not in the mix
      val w2 = batch(Timestamp.valueOf("2026-01-01 10:30:00"))
      w2._2 shouldBe 2L
      w2._3 should be > 0L // all-error window: strong positive PSI
    } finally q.stop()
  }

  test("mixDriftWindowed: a window matching the reference mix scores ~zero PSI") {
    val ref = Seq("a" -> 500000L, "b" -> 500000L)
    val rows = (1 to 10).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", ts(i))).toDF("event_id", "event_type", "ts")
    val got = StreamOps.mixDriftWindowed(rows, "event_type", ref, "30 minutes")
      .collect()
    got.length shouldBe 1
    math.abs(got(0).getAs[Long]("psi_q")) should be < 100L // smoothing-only residual
  }

  test("intervalJoin runs as a stream-stream join and matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, String, Double, Timestamp)]
    val views = MemoryStream[(Long, Long, String, Double, Timestamp)]
    def named(m: MemoryStream[(Long, Long, String, Double, Timestamp)]) =
      m.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val joined = StreamOps.intervalJoin(
      named(clicks).withWatermark("ts", "2 hours"),
      named(views).withWatermark("ts", "2 hours"),
      withinMinutes = 10)
    val q = joined.writeStream.format("memory").queryName("ivj_test")
      .outputMode("append").start()
    try {
      // user 7: click at :00 -> views at :05 (in) and :20 (out of window);
      // user 8: view only (no click -> no pair); the second batch's view
      // must still join the FIRST batch's click (buffered state)
      clicks.addData((1L, 7L, "click", 0.0, ts(0)))
      views.addData((2L, 7L, "view", 0.0, ts(5)), (3L, 8L, "view", 0.0, ts(1)))
      q.processAllAvailable()
      views.addData((4L, 7L, "view", 0.0, ts(9)), (5L, 7L, "view", 0.0, ts(20)))
      q.processAllAvailable()
      val got = spark.table("ivj_test")
        .select("left_id", "right_id", "gap_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      got shouldBe Set((1L, 2L, 5L * 60 * 1000000), (1L, 4L, 9L * 60 * 1000000))
      // batch twin on the union of everything fed
      val all = Seq(
        (1L, 7L, "click", 0.0, ts(0)), (2L, 7L, "view", 0.0, ts(5)),
        (3L, 8L, "view", 0.0, ts(1)), (4L, 7L, "view", 0.0, ts(9)),
        (5L, 7L, "view", 0.0, ts(20)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")
      val batch = StreamOps.intervalJoin(
          all.filter(col("event_type") === "click"),
          all.filter(col("event_type") === "view"), 10)
        .select("left_id", "right_id", "gap_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      batch shouldBe got
    } finally q.stop()
  }

  test("intervalJoinOuter: unmatched lefts emit a null right once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, String, Double, Timestamp)]
    val views = MemoryStream[(Long, Long, String, Double, Timestamp)]
    def named(m: MemoryStream[(Long, Long, String, Double, Timestamp)]) =
      m.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    // short watermark so the null row can finalize inside the test
    val joined = StreamOps.intervalJoinOuterWithin(
      named(clicks).withWatermark("ts", "5 minutes"),
      named(views).withWatermark("ts", "5 minutes"),
      "10 MINUTES")
    val q = joined.writeStream.format("memory").queryName("ivjo_test")
      .outputMode("append").start()
    try {
      // user 7 converts; user 9's click never gets a view
      clicks.addData((1L, 7L, "click", 0.0, ts(0)), (6L, 9L, "click", 0.0, ts(0)))
      views.addData((2L, 7L, "view", 0.0, ts(5)))
      q.processAllAvailable()
      // advance event time far past click+window+watermark on BOTH
      // streams so user 9's null row is forced out
      clicks.addData((7L, 1L, "click", 0.0, ts(59)))
      views.addData((8L, 1L, "view", 0.0, ts(59)))
      q.processAllAvailable()
      clicks.addData((9L, 2L, "click", 0.0, Timestamp.valueOf("2026-01-01 12:00:00")))
      views.addData((10L, 2L, "view", 0.0, Timestamp.valueOf("2026-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("ivjo_test")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      got should contain((1L, 2L))   // matched pair
      got should contain((6L, -1L))  // unconverted click emitted with null view
      // batch twin agrees on the same union of inputs
      val all = Seq(
        (1L, 7L, "click", 0.0, ts(0)), (6L, 9L, "click", 0.0, ts(0)),
        (2L, 7L, "view", 0.0, ts(5)), (7L, 1L, "click", 0.0, ts(59)),
        (8L, 1L, "view", 0.0, ts(59)),
        (9L, 2L, "click", 0.0, Timestamp.valueOf("2026-01-01 12:00:00")),
        (10L, 2L, "view", 0.0, Timestamp.valueOf("2026-01-01 12:00:00")))
        .toDF("event_id", "user_id", "event_type", "value", "ts")
      val batch = StreamOps.intervalJoinOuterWithin(
          all.filter(col("event_type") === "click"),
          all.filter(col("event_type") === "view"), "10 MINUTES")
        .select("left_id", "right_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      batch shouldBe got
    } finally q.stop()
  }

  test("dedupStream keeps first arrivals only, across micro-batches, equal to batch dedup") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = StreamOps.dedupStream(streamDf, Seq("user_id", "event_type"), watermark = "2 hours")
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      // batch 1: first arrivals + an in-batch duplicate
      mem.addData(
        (1L, "u1", "click", 1.0, ts(0)),
        (2L, "u1", "click", 2.0, ts(5)), // dup of (u1, click) in the same batch
        (3L, "u2", "view", 3.0, ts(1)))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (state must remember u1/click)
      // and one genuinely new key
      mem.addData(
        (4L, "u1", "click", 4.0, ts(10)),
        (5L, "u2", "click", 5.0, ts(12)))
      q.processAllAvailable()
      val got = spark.table("dedup_test")
        .select("event_id").collect().map(_.getLong(0)).toSet
      got shouldBe Set(1L, 3L, 5L)
      // the batch twin keyed identically keeps the same survivors
      val batchIds = graft.llm.DedupOps.exactDedup(
          Seq((1L, "u1", "click"), (2L, "u1", "click"), (3L, "u2", "view"),
            (4L, "u1", "click"), (5L, "u2", "click"))
            .toDF("event_id", "user_id", "event_type"),
          struct(col("user_id"), col("event_type")), "event_id")
        .select("event_id").collect().map(_.getLong(0)).toSet
      batchIds shouldBe got
    } finally q.stop()
  }

  test("file-source readStream: tumbling agg over real parquet matches the batch run") {
    // file streams want a directory; stage the sf0.001 events file into one
    val dir = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("part-0.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    // same type-adaptive ts normalization as the batch loader — the
    // testdata's physical timestamp encoding has shifted between rounds
    val streamed = graft.sources.Tables.adaptEventTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = StreamOps.tumblingAggStream(streamed, "1 hour", watermark = "1 hour")
      .writeStream.format("memory").queryName("file_stream_test").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_stream_test")
        .agg(sum("n")).as[Long].head()
      val batch = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events").count()
      got shouldBe batch
    } finally q.stop()
  }

  test("flatMapGroupsWithState running stats converge to the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Long, String, Double, Timestamp)]
    val streamEvents = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .as[StreamOps.Event]
    val q = StreamOps.runningUserStats(streamEvents)
      .writeStream.format("memory").queryName("running_test").outputMode("update").start()
    try {
      // two micro-batches: state must carry across them
      mem.addData((1L, 7L, "click", 1.5, ts(0)), (2L, 7L, "click", 2.5, ts(1)))
      q.processAllAvailable()
      mem.addData((3L, 7L, "view", 6.0, ts(2)), (4L, 8L, "click", 10.0, ts(3)))
      q.processAllAvailable()
      // last update per user == final state
      val finalRows = spark.table("running_test")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("sum_value"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.sum_value")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      finalRows shouldBe Set((7L, 3L, 10.0), (8L, 1L, 10.0))
      // equals the batch twin over the same rows
      val batch = Seq((1L, 7L, "click", 1.5, ts(0)), (2L, 7L, "click", 2.5, ts(1)),
        (3L, 7L, "view", 6.0, ts(2)), (4L, 8L, "click", 10.0, ts(3)))
        .toDF("event_id", "user_id", "event_type", "value", "ts")
      val twin = StreamOps.userStatsBatch(batch).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      twin shouldBe finalRows
    } finally q.stop()
  }

  test("foreachBatch streams micro-batches into a partitioned parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val outDir = java.nio.file.Files.createTempDirectory("stream-sink").toString
    val q = streamDf.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sources.Sinks.writePartitioned(batch, outDir, Seq("event_type"),
          org.apache.spark.sql.SaveMode.Append)
      }
      .start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val back = spark.read.parquet(outDir)
      back.count() shouldBe 4
      new java.io.File(outDir).list().count(_.startsWith("event_type=")) shouldBe 2
    } finally q.stop()
  }

  test("enrichWithDim runs as a stream-static join and equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("u1", "gold"), ("u2", "silver")).toDF("user_key", "tier")
    val batch = StreamOps.enrichWithDim(events, dim, "user_id", "user_key")
      .select("event_id", "user_id", "tier").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val mem = MemoryStream[(Long, String, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = StreamOps.enrichWithDim(streamDf, dim, "user_id", "user_key")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enrich_test").outputMode("append").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val got = spark.table("enrich_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      got shouldBe batch
      got.map(_._1) shouldBe eventRows.map(_._1).toSet // left join drops no facts
    } finally q.stop()
  }

  test("enrichPointInTime: each event picks the version valid at ITS time; stream equals batch") {
    implicit val sqlCtx = spark.sqlContext
    // two versions for u1 (days 0 and 2), one for u2 (day 1)
    val hist = Seq(
      ("u1", 0L, Some(2L), 100L), ("u1", 2L, None, 200L),
      ("u2", 1L, None, 300L))
      .toDF("h_uid", "valid_from", "valid_to", "feature_q")
    def run(d: org.apache.spark.sql.DataFrame) =
      StreamOps.enrichPointInTime(
        d.select(col("event_id"), col("user_id"),
          (minute(col("ts")) / 10).cast("long").as("day_no")),
        hist, "user_id", "h_uid", col("day_no"), Seq("feature_q"))
        .select("event_id", "feature_q_pit")
    // batch: events at "days" 0, 0, 4, 0 (minute/10)
    val batch = run(events).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    batch shouldBe Map(
      1L -> Some(100L),  // u1 day 0 → v[0,2)
      2L -> Some(100L),  // u1 day 0
      3L -> Some(200L),  // u1 day 4 → open current version
      4L -> None)        // u2 day 0 predates its first version
    val mem = MemoryStream[(Long, String, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = run(streamDf)
      .writeStream.format("memory").queryName("pit_test").outputMode("append").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val got = spark.table("pit_test").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      got shouldBe batch
      q.lastProgress.stateOperators shouldBe empty // stateless: no state operator at all
    } finally q.stop()
  }

  test("sessionizeStream (session_window) agrees with sessionizeBatch session sizes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, Double, Timestamp)]
    val streamDf = mem.toDF().toDF("event_id", "user_id", "event_type", "value", "ts")
    val q = StreamOps.sessionizeStream(streamDf, gapMinutes = 10, watermark = "2 hours")
      .writeStream.format("memory").queryName("session_test").outputMode("complete").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val got = spark.table("session_test")
        .select("user_id", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
      got shouldBe Map("u1" -> Seq(1L, 2L), "u2" -> Seq(1L))
    } finally q.stop()
  }

  test("decontaminateStream: stateless Bloom gate on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val docRows = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely unrelated document about query engines today"),
      (3L, "short one"), // < w tokens: absent by contract
      (4L, "the quick brown fox jumps over nothing else entirely"))
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val bm = graft.llm.DedupOps.bloomBitmap(eval, w = 5, mBits = 1 << 16, k = 3)
      .localCheckpoint() // static side: compute the bitmap once
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    val q = StreamOps.decontaminateStream(streamDf, bm, w = 5, mBits = 1 << 16, k = 3)
      .writeStream.format("memory").queryName("decontam_test").outputMode("append").start()
    try {
      mem.addData(docRows.take(2): _*)
      q.processAllAvailable()
      mem.addData(docRows.drop(2): _*) // second micro-batch: no state carried
      q.processAllAvailable()
      val got = spark.table("decontam_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
      val want = graft.llm.DedupOps.bloomDecontaminateStateless(
          docRows.toDF("doc_id", "text"), bm, w = 5, mBits = 1 << 16, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
      got shouldBe want
      // the exact-dup doc is flagged on every shingle; doc 3 absent
      got.find(_._1 == 1L).get._4 shouldBe true
      got.map(_._1) shouldBe Set(1L, 2L, 4L)
    } finally q.stop()
  }

  test("neardupGateStream: stateless MinHash gate on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "completely different text about distributed query engines here now"),
      (3L, "yet another unrelated corpus document of moderate length overall"))
      .toDF("doc_id", "text")
    val sh = graft.llm.DedupOps.wordShingles(corpus, "doc_id", "text", 5)
      .localCheckpoint() // static index artifacts: built once
    val banded = graft.llm.DedupOps.minHashBandedFromShingles(sh, 64, 16)
      .localCheckpoint()
    val incoming = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again today"),    // exact dup of 1
      (101L, "the quick brown fox jumps over the lazy dog again tomorrow"), // near dup of 1
      (102L, "totally novel content that matches nothing already stored anywhere"),
      (103L, "tiny doc")) // < 5 tokens: absent by contract
    val mem = MemoryStream[(Long, String)]
    val q = StreamOps.neardupGateStream(mem.toDF().toDF("doc_id", "text"),
        banded, sh, shingleW = 5, numHashes = 64, bands = 16, num = 1, den = 2)
      .writeStream.format("memory").queryName("neardup_gate_test")
      .outputMode("append").start()
    try {
      mem.addData(incoming.take(2): _*)
      q.processAllAvailable()
      mem.addData(incoming.drop(2): _*) // second micro-batch: no state carried
      q.processAllAvailable()
      val got = spark.table("neardup_gate_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = StreamOps.neardupGateStream(incoming.toDF("doc_id", "text"),
          banded, sh, shingleW = 5, numHashes = 64, bands = 16, num = 1, den = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got shouldBe want
      got.map(t => (t._1, t._2)) should contain((100L, 1L)) // exact dup: one row despite all-band collision
      got.map(t => (t._1, t._2)) should contain((101L, 1L)) // near dup
      got.exists(t => t._1 == 102L || t._1 == 103L) shouldBe false
    } finally q.stop()
  }

  test("imageGateStream: stateless pHash gate on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // corpus images from the deterministic generator; incoming ids
    // 1280 apart have IDENTICAL pixels (the provable duplicate rule)
    val corpusBlobs = graft.llm.MultimodalOps.documentsAsImages(
      Seq(7L, 8L, 9L).toDF("doc_id"), "doc_id").localCheckpoint()
    val fps = graft.llm.MultimodalOps.pHashImages(corpusBlobs, "doc_id", "blob")
      .localCheckpoint() // static fingerprint artifact: built once
    val incomingIds = Seq(1287L, 2567L, 42L) // dups of 7 (+1280, +2560); novel
    val incomingRows = graft.llm.MultimodalOps.documentsAsImages(
        incomingIds.toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toSeq
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.imageGateStream(mem.toDF().toDF("doc_id", "blob"),
        fps, corpusBlobs)
      .writeStream.format("memory").queryName("image_gate_test")
      .outputMode("append").start()
    try {
      mem.addData(incomingRows.take(1): _*)
      q.processAllAvailable()
      mem.addData(incomingRows.drop(1): _*) // second micro-batch: no state carried
      q.processAllAvailable()
      val got = spark.table("image_gate_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = StreamOps.imageGateStream(
          incomingRows.toDF("doc_id", "blob"), fps, corpusBlobs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe want
      got shouldBe Set((1287L, 7L), (2567L, 7L)) // 42 stays silent
    } finally q.stop()
  }

  test("annGateStream: stateless ANN gate on a real stream equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // static corpus: two clusters; incoming rows: one near-dup of the
    // x-cluster, one orthogonal (silent), one near-dup of the y-cluster
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.99f, 0.05f)), (3L, Seq(0.05f, 0.99f))).toDF("vec_id", "embedding")
    val cents = graft.llm.SimilarityOps
      .ivfCentroids(corpus, "vec_id", "embedding", 2).localCheckpoint()
    val incoming = Seq(
      (10L, Seq(0.98f, 0.1f)),  // hits 0 and 2
      (11L, Seq(-0.7f, 0.7f)),  // hits nothing at 0.9
      (12L, Seq(0.02f, 1.0f)))  // hits 1 and 3
    val mem = MemoryStream[(Long, Seq[Float])]
    val streamDf = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.annGateStream(streamDf, corpus, "vec_id", "embedding",
        num = 9, den = 10, centroids = cents, nProbe = 2)
      .writeStream.format("memory").queryName("ann_gate_test").outputMode("append").start()
    try {
      mem.addData(incoming.take(1): _*)
      q.processAllAvailable()
      mem.addData(incoming.drop(1): _*) // second micro-batch: no state carried
      q.processAllAvailable()
      val got = spark.table("ann_gate_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = StreamOps.annGateStream(incoming.toDF("vec_id", "embedding"),
          corpus, "vec_id", "embedding", num = 9, den = 10,
          centroids = cents, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe want
      got shouldBe Set((10L, 0L), (10L, 2L), (12L, 1L), (12L, 3L)) // 11 stays silent
    } finally q.stop()
  }

  test("annGateStreamIndexed: persisted-lists gate on a real stream equals the plain gate") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.99f, 0.05f)), (3L, Seq(0.05f, 0.99f))).toDF("vec_id", "embedding")
    val cents = graft.llm.SimilarityOps
      .ivfCentroids(corpus, "vec_id", "embedding", 2).localCheckpoint()
    val lists = graft.llm.SimilarityOps
      .ivfInvertedLists(corpus, "vec_id", "embedding", cents).localCheckpoint()
    val incoming = Seq(
      (10L, Seq(0.98f, 0.1f)), (11L, Seq(-0.7f, 0.7f)), (12L, Seq(0.02f, 1.0f)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val streamDf = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.annGateStreamIndexed(streamDf, lists, "vec_id", "embedding",
        num = 9, den = 10, centroids = cents, nProbe = 2)
      .writeStream.format("memory").queryName("ann_gate_idx").outputMode("append").start()
    try {
      mem.addData(incoming: _*)
      q.processAllAvailable()
      val got = spark.table("ann_gate_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the indexed gate is the SAME gate with the corpus side persisted
      val want = StreamOps.annGateStream(incoming.toDF("vec_id", "embedding"),
          corpus, "vec_id", "embedding", num = 9, den = 10,
          centroids = cents, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe want
      got shouldBe Set((10L, 0L), (10L, 2L), (12L, 1L), (12L, 3L))
    } finally q.stop()
  }

  test("annGateStream: zero-norm vectors pass un-flagged, no NaN cosine, stream == batch (VERDICT r7 item 8)") {
    implicit val sqlCtx = spark.sqlContext
    // corpus includes a zero-norm member too: neither side of the pair
    // test may go vacuous (the 0 >= 0 bug dropped whole dup groups)
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.05f))).toDF("vec_id", "embedding")
    val cents = graft.llm.SimilarityOps
      .ivfCentroids(corpus, "vec_id", "embedding", 2).localCheckpoint()
    val incoming = Seq(
      (20L, Seq(0.0f, 0.0f)),   // zero-norm probe: must match NOTHING
      (21L, Seq(0.98f, 0.1f)))  // sanity row: still hits 0 and 2
    val mem = MemoryStream[(Long, Seq[Float])]
    val streamDf = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamOps.annGateStream(streamDf, corpus, "vec_id", "embedding",
        num = 9, den = 10, centroids = cents, nProbe = 2)
      .writeStream.format("memory").queryName("ann_gate_zero").outputMode("append").start()
    try {
      mem.addData(incoming.head)
      q.processAllAvailable()
      mem.addData(incoming(1))
      q.processAllAvailable()
      val rows = spark.table("ann_gate_zero").collect()
      // the gate never emits a NaN cosine (0/sqrt(0) would)
      rows.foreach(r => r.getDouble(2).isNaN shouldBe false)
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = StreamOps.annGateStream(incoming.toDF("vec_id", "embedding"),
          corpus, "vec_id", "embedding", num = 9, den = 10,
          centroids = cents, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe want
      // zero-norm query matches nothing; zero-norm corpus member is
      // never a reported neighbor; the real near-dup still fires
      got shouldBe Set((21L, 0L), (21L, 2L))
    } finally q.stop()
  }

  test("funnelStream: state advances across micro-batches and the final reach equals the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.Event
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[Event]
    val q = StreamOps.funnelStream(mem.toDS(), steps, withinSeconds = Seq(3600L, 3600L))
      .writeStream.format("memory").queryName("funnel_stream_test")
      .outputMode("update").start()
    // u1 cascades two stages inside batch 1 (events sorted by ts within
    // the batch); u2's pre-view click must not count; u3's click in
    // batch 2 lands 88 min after their view — outside the 1 h window
    val batch1 = Seq(
      Event(2L, 1L, "click", 0.0, ts(1)), Event(1L, 1L, "view", 0.0, ts(0)),
      Event(3L, 2L, "click", 0.0, ts(1)), Event(4L, 3L, "view", 0.0, ts(2)))
    val batch2 = Seq(
      Event(5L, 1L, "purchase", 0.0, ts(10)), Event(6L, 2L, "view", 0.0, ts(11)),
      Event(7L, 2L, "click", 0.0, ts(12)),
      Event(8L, 3L, "click", 0.0, Timestamp.valueOf("2026-01-01 11:30:00")))
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val updates = spark.table("funnel_stream_test")
      // the latest per-user row carries the full prefix of first times
      val finalTimes = updates
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("step").desc)))
        .filter(col("__rn") === 1)
        .collect().map(r => r.getLong(0) -> r.getSeq[Timestamp](2)).toMap
      finalTimes(1L) shouldBe Seq(ts(0), ts(1), ts(10))
      finalTimes(2L) shouldBe Seq(ts(11), ts(12))
      finalTimes(3L) shouldBe Seq(ts(2)) // windowed click rejected
      val latest = updates.groupBy("user_id").agg(max("step").as("step"))
      val got = StreamOps.funnelReachFromProgress(latest, steps)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val want = graft.dfw.FunnelOps.sequentialFunnel(
          (batch1 ++ batch2).toDF(), "user_id", "event_type", "ts", steps,
          withinSeconds = Seq(3600L, 3600L))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      got shouldBe want
      got shouldBe Array((1, "view", 3L, 100L), (2, "click", 2L, 66L), (3, "purchase", 1L, 33L))
    } finally q.stop()
  }

  test("funnelStream advances on sub-millisecond event spacing (micros, not getTime)") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.Event
    // 50 µs apart — same millisecond, distinct microseconds, like a
    // 20k rows/s feed; Timestamp.getTime comparisons would tie and stall
    def tus(us: Int) = Timestamp.valueOf(f"2026-01-01 10:00:00.${us}%06d")
    val mem = MemoryStream[Event]
    val q = StreamOps.funnelStream(mem.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_us_test")
      .outputMode("update").start()
    try {
      mem.addData(Event(1L, 7L, "view", 0.0, tus(100)),
        Event(2L, 7L, "click", 0.0, tus(150)),
        Event(3L, 7L, "purchase", 0.0, tus(200)))
      q.processAllAvailable()
      spark.table("funnel_us_test").agg(max("step")).collect().head.getInt(0) shouldBe 3
    } finally q.stop()
  }

  test("funnelStream evictCompleted: same reach, completed users leave the state store") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.Event
    val steps = Seq("view", "click", "purchase")
    val mem = MemoryStream[Event]
    val q = StreamOps.funnelStream(mem.toDS(), steps, evictCompleted = true)
      .writeStream.format("memory").queryName("funnel_evict_test")
      .outputMode("update").start()
    try {
      // u1 completes across two batches (state must survive batch 1,
      // drop after batch 2); u2 stays in flight
      mem.addData(Event(1L, 1L, "view", 0.0, ts(0)), Event(2L, 1L, "click", 0.0, ts(1)),
        Event(3L, 2L, "view", 0.0, ts(2)))
      q.processAllAvailable()
      mem.addData(Event(4L, 1L, "purchase", 0.0, ts(5)))
      q.processAllAvailable()
      val latest = spark.table("funnel_evict_test")
        .groupBy("user_id").agg(max("step").as("step"))
      val got = StreamOps.funnelReachFromProgress(latest, steps)
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      got shouldBe Array((1, 2L, 100L), (2, 1L, 50L), (3, 1L, 50L))
      // state proof: u1 is GONE from state, so a fresh view re-enters
      // at step 1 (a kept state row would reject it as non-advancing)
      mem.addData(Event(5L, 1L, "view", 0.0, ts(30)))
      q.processAllAvailable()
      val rows = spark.table("funnel_evict_test")
        .filter(col("user_id") === 1L).select("step").collect().map(_.getInt(0)).sorted
      rows shouldBe Array(1, 2, 3) // journeys: step2 (b1), step3 (b2), fresh step1 (b3)
      // readout is unaffected by the re-entry row
      val latest2 = spark.table("funnel_evict_test")
        .groupBy("user_id").agg(max("step").as("step"))
      StreamOps.funnelReachFromProgress(latest2, steps)
        .collect().map(r => (r.getInt(0), r.getLong(2))) shouldBe
        Array((1, 2L), (2, 1L), (3, 1L))
    } finally q.stop()
  }

  test("quotaGateStream admits first-quota arrivals per source across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.DocArrival]
    val q = StreamOps.quotaGateStream(mem.toDS().repartition(1), quota = 2)
      .writeStream.format("memory").queryName("quota_gate_test").outputMode("update").start()
    try {
      // batch 1: s1 gets two admissions, s2 one
      mem.addData(StreamOps.DocArrival(1L, "s1"), StreamOps.DocArrival(2L, "s1"),
        StreamOps.DocArrival(3L, "s2"))
      q.processAllAvailable()
      // batch 2: s1 over quota (4 dropped), s2 fills (5), then over (6)
      mem.addData(StreamOps.DocArrival(4L, "s1"), StreamOps.DocArrival(5L, "s2"),
        StreamOps.DocArrival(6L, "s2"))
      q.processAllAvailable()
      val got = spark.table("quota_gate_test")
        .select("doc_id", "source", "pick").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      got shouldBe Set((1L, "s1", 1L), (2L, "s1", 2L), (3L, "s2", 1L), (5L, "s2", 2L))
    } finally q.stop()
  }

  test("quotaGateStream never exceeds quota under many arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.DocArrival]
    val q = StreamOps.quotaGateStream(mem.toDS().repartition(1), quota = 5)
      .writeStream.format("memory").queryName("quota_gate_vol").outputMode("update").start()
    try {
      (1 to 4).foreach { b =>
        mem.addData((1 to 50).map(i =>
          StreamOps.DocArrival(b * 100L + i, s"src${i % 3}")): _*)
        q.processAllAvailable()
      }
      val counts = spark.table("quota_gate_vol")
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts.values.foreach(_ shouldBe 5L)
      counts.keySet shouldBe Set("src0", "src1", "src2")
    } finally q.stop()
  }
}
