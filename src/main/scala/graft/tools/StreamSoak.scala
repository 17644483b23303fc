package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.StreamOps

/** Dev harness (VERDICT r6 item 3 / r7 item 3): soak the streaming
  * operators against the RocksDB state-store provider at sustained
  * volume and MEASURE what the X6 scaladocs argue — flat (zero) state
  * for the stateless ingest gates, watermark-bounded state for
  * streaming dedup, per-key-bounded state for the custom
  * flatMapGroupsWithState aggregation.
  *
  * Each scenario runs a rate-source stream for `soakSec` seconds under
  * `RocksDBStateStoreProvider`, then reports per-batch progress
  * (input rows/s, state rows, state memory, RocksDB SST bytes) and a
  * PASS/FAIL verdict on the state-growth claim:
  *  - user_stats: state rows must plateau at the key cardinality
  *    (nUsers), not grow with stream length;
  *  - dedup: every key unique → state rows must plateau at
  *    ~rate×watermark once expiry kicks in (the claim is the
  *    watermark BOUNDS state; without expiry rows grow linearly);
  *  - decontam_gate / ann_gate: the plan must contain NO state
  *    operator at all (stream-static joins + per-row probes only).
  *
  * `tools/run.sh graft.tools.StreamSoak [soakSec] [rowsPerSec]
  *   [scenario...]` — trailing args select scenarios by name (e.g.
  * `mix_drift funnel_evict`); no trailing args runs all of them.
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val soakSec = if (args.length > 0) args(0).toInt else 60
    val rate = if (args.length > 1) args(1).toInt else 20000
    // verdicts read q.recentProgress, which Spark caps at
    // spark.sql.streaming.numRecentProgressUpdates (default 100): with
    // the 2 s trigger a soak past ~200 s would silently truncate the
    // series while the dedup sub-linear check still compares against
    // full-run totals (ADVICE r8). Size the buffer to hold every
    // progress update the soak can produce, with slack for empty-batch
    // reports.
    val triggerSec = 2
    val progressCap = (soakSec / triggerSec + 120).toString
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[8]")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
          .config("spark.sql.streaming.numRecentProgressUpdates", progressCap)
          .config("spark.sql.shuffle.partitions", "8"), 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ckRoot = java.nio.file.Files.createTempDirectory("soak-ck").toString

    def rateSrc = spark.readStream.format("rate")
      .option("rowsPerSecond", rate).load() // (timestamp, value)

    // trailing args select scenarios by name; empty selection = all
    val only = args.drop(2).toSet
    def scenario(name: String)(body: => Unit): Unit =
      if (only.isEmpty || only.contains(name)) body
      else println(s"--- $name: skipped ---")

    /** Run `q` for soakSec, then dump per-batch state metrics and
      * return (stateRows per batch, max throughput).
      */
    def soak(name: String, q: StreamingQuery): Seq[Long] = {
      val t0 = System.currentTimeMillis()
      while (System.currentTimeMillis() - t0 < soakSec * 1000L && q.isActive)
        Thread.sleep(1000)
      val progresses = q.recentProgress.toSeq
      q.stop()
      println(s"--- $name: ${progresses.length} progress reports ---")
      val stateRows = progresses.flatMap { p =>
        val ops = p.stateOperators
        val rows = if (ops.isEmpty) 0L else ops.map(_.numRowsTotal).sum
        val mem = if (ops.isEmpty) 0L else ops.map(_.memoryUsedBytes).sum
        val sst = if (ops.isEmpty) 0L
          else ops.flatMap(o => Option(o.customMetrics.get("rocksdbSstFileSize")).map(_.toLong)).sum
        if (p.numInputRows > 0 || rows > 0) {
          println(f"$name batch=${p.batchId}%4d in=${p.numInputRows}%8d " +
            f"rows/s=${p.processedRowsPerSecond}%10.0f stateRows=$rows%9d " +
            f"stateMem=${mem / 1024}%8d KB sst=${sst / 1024}%8d KB")
          Some(rows)
        } else None
      }
      stateRows
    }

    // shared across scenarios (hoisted so any selection subset works)
    val nUsers = 10000
    val wmSec = 10
    def textStream = rateSrc.select(col("value").as("doc_id"),
      concat_ws(" ", (0 until 8).map(j =>
        concat(lit("tok"), pmod(hash(col("value"), lit(j)), lit(1000)))): _*).as("text"))
    lazy val corpus = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    lazy val cents = graft.llm.SimilarityOps
      .ivfCentroids(corpus, "vec_id", "embedding", 16).localCheckpoint()
    def vecStream = rateSrc.select(col("value").as("vec_id"),
      expr("transform(sequence(0, 63), j -> cast(pmod(hash(value, j), 1000) as float) / 1000.0)")
        .as("embedding"))

    // 1) flatMapGroupsWithState running per-user stats: key space is
    // nUsers — state must plateau there regardless of input volume
    scenario("user_stats") {
    val events = rateSrc.select(
        col("value").as("event_id"), pmod(col("value"), lit(nUsers.toLong)).as("user_id"),
        lit("evt").as("event_type"), (col("value") % 100).cast("double").as("value"),
        col("timestamp").as("ts"))
      .as[StreamOps.Event]
    val usRows = soak("user_stats", StreamOps.runningUserStats(events)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/us").trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val usPlateau = usRows.lastOption.getOrElse(0L)
    println(s"user_stats: final stateRows=$usPlateau (bound=$nUsers) " +
      (if (usPlateau <= nUsers) "PASS bounded by key cardinality" else "FAIL state exceeds key space"))
    }

    // 2) watermarked dedup, EVERY key unique — the hard case: without
    // watermark expiry state grows linearly forever; with it, state
    // plateaus at ~rate x (watermark + batch cadence)
    scenario("dedup_watermark") {
    val docsStream = rateSrc.select(col("value").as("k"), col("timestamp").as("ts"))
    val ddRows = soak("dedup_watermark", StreamOps.dedupStream(docsStream, Seq("k"), s"$wmSec seconds")
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckRoot/dd").trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    // plateau check — the claim is "state stops growing once expiry
    // kicks in", so the verdict is on the TAIL: over the last third of
    // the run the state must be flat (watermark retention ≈ delay +
    // batch cadence + trigger lag, so the absolute plateau level is
    // rate-dependent; what must NOT happen is continued growth) and
    // far below the linear-growth total
    val ddFinal = ddRows.lastOption.getOrElse(0L)
    val tail = ddRows.drop(ddRows.length * 2 / 3)
    val flat = tail.nonEmpty && tail.max - tail.min <= (tail.max / 50).max(1000)
    val subLinear = ddFinal < soakSec.toLong * rate / 2
    println(s"dedup_watermark: final stateRows=$ddFinal, tail ${tail.headOption.getOrElse(0L)}→${tail.lastOption.getOrElse(0L)} " +
      s"(linear-growth would be ~${soakSec.toLong * rate}) " +
      (if (flat && subLinear) "PASS watermark-bounded (plateau, input continuing)"
       else "FAIL state still growing at end of soak"))
    }

    // 3) stateless Bloom decontamination gate: static eval-set bitmap,
    // per-row probes — the PLAN must carry no state operator
    scenario("decontam_gate") {
    val evalDocs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .limit(500)
    val bm = graft.llm.DedupOps.bloomBitmap(evalDocs,
      w = 5, mBits = 1 << 20, k = 3).localCheckpoint()
    val dgStates = soak("decontam_gate", StreamOps.decontaminateStream(textStream, bm,
        w = 5, mBits = 1 << 20, k = 3)
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckRoot/dg").trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    println(s"decontam_gate: stateRows across all batches=${dgStates.sum} " +
      (if (dgStates.sum == 0) "PASS stateless (no state operator)" else "FAIL unexpected state"))
    }

    // 4) stateless ANN ingest gate: static IVF-bucketed corpus,
    // stream-static joins only — same zero-state requirement
    scenario("ann_gate") {
    val agStates = soak("ann_gate", StreamOps.annGateStream(vecStream, corpus,
        "vec_id", "embedding", num = 9, den = 10, centroids = cents, nProbe = 2)
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckRoot/ag").trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    println(s"ann_gate: stateRows across all batches=${agStates.sum} " +
      (if (agStates.sum == 0) "PASS stateless (no state operator)" else "FAIL unexpected state"))
    }

    // 5) the INDEXED ANN gate on the same stream: corpus side is the
    // precomputed list table, so each micro-batch assigns only its own
    // rows — same zero-state requirement, higher sustained throughput
    // (the plain gate re-buckets the corpus every batch)
    scenario("ann_gate_indexed") {
    val lists = graft.llm.SimilarityOps
      .ivfInvertedLists(corpus, "vec_id", "embedding", cents).localCheckpoint()
    val agiStates = soak("ann_gate_indexed", StreamOps.annGateStreamIndexed(vecStream, lists,
        "vec_id", "embedding", num = 9, den = 10, centroids = cents, nProbe = 2)
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckRoot/agi").trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    println(s"ann_gate_indexed: stateRows across all batches=${agiStates.sum} " +
      (if (agiStates.sum == 0) "PASS stateless (no state operator)" else "FAIL unexpected state"))
    }

    // 5b) the stateless MinHash text near-dup gate on the same text
    // stream: persisted-index artifacts static, the per-row signature
    // runs as the native MinHashBandHashes expression, pairs emit
    // exactly once via the first-matching-band rule — same zero-state
    // requirement as the other two ingest gates
    scenario("neardup_gate") {
    val gateDocs = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .limit(2000)
    val gateSh = graft.llm.DedupOps.wordShingles(gateDocs, "doc_id", "text", 5)
      .localCheckpoint()
    val gateBanded = graft.llm.DedupOps.minHashBandedFromShingles(gateSh, 64, 16)
      .localCheckpoint()
    val (gbc0, gss0) = graft.llm.DedupOps.minHashGateArtifacts(gateBanded, gateSh)
    val gbc = gbc0.localCheckpoint()
    val gss = gss0.localCheckpoint()
    val ngStates = soak("neardup_gate", StreamOps.neardupGateStreamPrepared(textStream,
        gbc, gss, shingleW = 5, numHashes = 64, bands = 16, num = 1, den = 2)
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", s"$ckRoot/ng")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    println(s"neardup_gate: stateRows across all batches=${ngStates.sum} " +
      (if (ngStates.sum == 0) "PASS stateless (no state operator)" else "FAIL unexpected state"))
    }

    // 6) stream-stream interval join: BOTH sides buffer in the state
    // store until the watermark passes the join bound — the time-bound
    // condition is exactly what licenses expiry, so state must plateau
    // at ~2 × rate × (watermark + bound + cadence) and NOT track
    // stream length. Sub-minute bound (15 s) so expiry is observable
    // within the soak; left side thinned 20× (attribution shape:
    // sparse impressions joined to dense events, keyed per user).
    scenario("interval_join") {
    def evStream = rateSrc.select(
      col("value").as("event_id"),
      pmod(col("value"), lit(nUsers.toLong)).as("user_id"),
      col("timestamp").as("ts"))
    val ijLeft = evStream.where(pmod(col("event_id"), lit(20L)) === 0)
      .withWatermark("ts", s"$wmSec seconds")
    val ijRight = evStream.withWatermark("ts", s"$wmSec seconds")
    val ijRows = soak("interval_join",
      StreamOps.intervalJoinWithin(ijLeft, ijRight, "15 SECONDS")
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$ckRoot/ij")
        .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val ijFinal = ijRows.lastOption.getOrElse(0L)
    val ijTail = ijRows.drop(ijRows.length * 2 / 3)
    val ijFlat = ijTail.nonEmpty &&
      ijTail.max - ijTail.min <= (ijTail.max / 20).max(2000)
    // linear growth would be both sides' full history: ~2 × rate × soakSec
    val ijSubLinear = ijFinal < soakSec.toLong * rate
    println(s"interval_join: final stateRows=$ijFinal, tail ${ijTail.headOption.getOrElse(0L)}→${ijTail.lastOption.getOrElse(0L)} " +
      s"(linear-growth would be ~${2L * soakSec * rate}) " +
      (if (ijFlat && ijSubLinear) "PASS watermark-bounded join state (plateau, input continuing)"
       else "FAIL join state still growing at end of soak"))
    }

    // 7) windowed distinct users via HLL sketch agg, EVERY user id
    // unique — the worst case for distinct counting: any id-holding
    // formulation (pre-dedup groupBy(window, user_id)) buffers
    // ~rate × (window + watermark) rows of live state. The sketch
    // keeps ONE state row per (window × event_type) holding a fixed
    // register block, so state rows must track live GROUPS (single
    // digits), not id cardinality.
    scenario("distinct_users_hll") {
    val duStream = rateSrc.select(
      col("value").as("user_id"),
      concat(lit("t"), pmod(col("value"), lit(3L))).as("event_type"),
      col("timestamp").as("ts"))
    val duRows = soak("distinct_users_hll", StreamOps.distinctUsersStream(
        duStream, "10 seconds", s"$wmSec seconds")
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/du")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val duFinal = duRows.lastOption.getOrElse(0L)
    // live groups: (windows inside the watermark horizon, + slack for
    // trigger lag) × 3 types
    val duBound = 3L * ((wmSec + 10) / 10 + 3)
    println(s"distinct_users_hll: final stateRows=$duFinal (group bound=$duBound; " +
      s"id-holding state would be ~${rate.toLong * (wmSec + 10)}) " +
      (if (duFinal > 0 && duFinal <= duBound)
        "PASS sketch-bounded state (rows = live groups, not ids)"
       else "FAIL state exceeds group bound"))
    }

    // 8) streaming CDC apply: foreachBatch merge into a persisted
    // snapshot — state lives in the SNAPSHOT TABLE, not the state
    // store. Two claims to measure: (a) the streaming plan carries no
    // state operator at all; (b) the snapshot is bounded by KEY
    // cardinality (LWW winners + tombstones), never by stream length.
    scenario("cdc_apply") {
    val nKeys = 10000L
    val cdcStream = rateSrc.select(
      pmod(col("value"), lit(nKeys)).as("k"),
      col("value").as("version"),
      when(pmod(col("value"), lit(20L)) === 0, lit("delete"))
        .otherwise(lit("update")).as("op"),
      concat(lit("n"), col("value")).as("name"),
      (col("value") % 100).cast("double").as("bal"))
    val snapRoot = java.nio.file.Files.createTempDirectory("soak-cdc").toString
    val cdcStates = soak("cdc_apply", StreamOps.cdcApplyStream(
      cdcStream, snapRoot, "k", "version", "op", s"$ckRoot/cdc"))
    val versioned = StreamOps.readVersionedSnapshot(spark, snapRoot)
      .map(_.count()).getOrElse(-1L)
    val live = StreamOps.readSnapshot(spark, snapRoot, "version", "op")
      .map(_.count()).getOrElse(-1L)
    val cdcTotal = soakSec.toLong * rate
    println(s"cdc_apply: state-store rows=${cdcStates.sum}, snapshot versioned=$versioned " +
      s"live=$live (key bound=$nKeys; feed was ~$cdcTotal rows) " +
      (if (cdcStates.sum == 0 && versioned > 0 && versioned <= nKeys)
        "PASS snapshot-bounded (no state store, rows = keys not stream length)"
       else "FAIL state store used or snapshot exceeds key space"))
    }

    // 9) streaming OHLC downsampling: one six-scalar aggregate row per
    // (window × series) — state rows must track LIVE BARS (window
    // buckets inside the watermark horizon × series), never event
    // volume; watermark expiry must evict finalized bars.
    scenario("ohlc_bars") {
    val ohlcStream0 = rateSrc.select(
      col("value").as("event_id"),
      concat(lit("s"), pmod(col("value"), lit(4L))).as("event_type"),
      (col("value") % 1000).cast("double").as("value"),
      col("timestamp").as("ts"))
    val obRows = soak("ohlc_bars", StreamOps.ohlcStream(
        ohlcStream0, "event_type", watermark = s"$wmSec seconds",
        windowDuration = "10 seconds")
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/ob")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val obFinal = obRows.lastOption.getOrElse(0L)
    // live bars: windows in the watermark horizon (+ trigger slack) × 4 series
    val obBound = 4L * ((wmSec + 10) / 10 + 3)
    println(s"ohlc_bars: final stateRows=$obFinal (bar bound=$obBound; " +
      s"event-holding state would be ~${rate.toLong * (wmSec + 10)}) " +
      (if (obFinal > 0 && obFinal <= obBound)
        "PASS bar-bounded state (rows = live bars, not events)"
       else "FAIL state exceeds live-bar bound"))
    }

    // 10) streaming funnel: per-user FunnelProgress state — one row of
    // ≤ |steps| timestamps per user. The rate source cycles each user
    // through view→click→purchase (value div nUsers picks the stage),
    // so users keep advancing while ids repeat forever; state rows
    // must plateau at the key cardinality like user_stats, NEVER track
    // event volume.
    scenario("funnel") {
    val fnEvents = rateSrc.select(
        col("value").as("event_id"),
        pmod(col("value"), lit(nUsers.toLong)).as("user_id"),
        element_at(typedLit(Seq("view", "click", "purchase")),
          (pmod(expr(s"value div $nUsers"), lit(3L)) + 1).cast("int")).as("event_type"),
        lit(0.0).as("value"),
        col("timestamp").as("ts"))
      .as[StreamOps.Event]
    val fnRows = soak("funnel", StreamOps.funnelStream(
        fnEvents, Seq("view", "click", "purchase"))
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/fn")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val fnFinal = fnRows.lastOption.getOrElse(0L)
    println(s"funnel: final stateRows=$fnFinal (bound=$nUsers) " +
      (if (fnFinal > 0 && fnFinal <= nUsers)
        "PASS bounded by key cardinality (one FunnelProgress row per user)"
       else "FAIL state exceeds key space"))
    }

    // 11) funnel with completed-user eviction on an EVER-GROWING user
    // space: each 3000-row epoch completes 1000 fresh users
    // (user = epoch·1000 + value%1000, stage = (value div 1000) % 3),
    // so without eviction state grows linearly with the stream; with
    // evictCompleted=true a completed user's provably-final row drops
    // immediately and live state is just the in-flight tail. A user's
    // three stages sit 1000 rows = 50 ms apart ON PURPOSE: the rate
    // source stamps MILLISECOND-resolution timestamps, so consecutive
    // rows (50 µs at this rate) genuinely tie — the funnel's
    // strictly-after rule then correctly refuses to advance, no matter
    // the comparison precision. (The first cut used value div 3 as the
    // user — three same-millisecond events per user — and state
    // tracked user cardinality exactly because nobody could ever
    // complete; that run is what exposed the getTime-vs-micros
    // comparison AND this generator bug.)
    scenario("funnel_evict") {
    val fneEvents = rateSrc.select(
        col("value").as("event_id"),
        expr("(value div 3000) * 1000 + value % 1000").as("user_id"),
        element_at(typedLit(Seq("view", "click", "purchase")),
          (pmod(expr("value div 1000"), lit(3L)) + 1).cast("int")).as("event_type"),
        lit(0.0).as("value"),
        col("timestamp").as("ts"))
      .as[StreamOps.Event]
    val fneRows = soak("funnel_evict", StreamOps.funnelStream(
        fneEvents, Seq("view", "click", "purchase"), evictCompleted = true)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/fne")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val fneFinal = fneRows.lastOption.getOrElse(0L)
    // users seen ≈ soakSec × rate / 3 — linear-growth state would sit
    // there; in-flight is at most the users straddling batch edges
    val fneUsers = soakSec.toLong * rate / 3
    println(s"funnel_evict: final stateRows=$fneFinal (users seen ~$fneUsers) " +
      (if (fneFinal >= 0 && fneFinal < fneUsers / 10)
        "PASS completed-user eviction keeps state at the in-flight tail, not user cardinality"
       else "FAIL state tracks user cardinality despite eviction"))
    }

    // 13) quota admission gate: 200 sources on an unbounded document
    // stream — state is ONE counter per source, so rows must plateau
    // at the source cardinality however long the stream runs (and
    // most counters freeze at the quota within the first seconds).
    scenario("quota_gate") {
    val nSources = 200
    val qgDocs = rateSrc.select(
        col("value").as("doc_id"),
        concat(lit("src"), pmod(col("value"), lit(nSources.toLong))).as("source"))
      .as[StreamOps.DocArrival]
    val qgRows = soak("quota_gate", StreamOps.quotaGateStream(qgDocs, quota = 1000L)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/qg")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val qgFinal = qgRows.lastOption.getOrElse(0L)
    println(s"quota_gate: final stateRows=$qgFinal (bound=$nSources) " +
      (if (qgFinal > 0 && qgFinal <= nSources)
        "PASS state plateaus at source cardinality (one counter per source)"
       else "FAIL state exceeds the source space"))
    }

    // 14) categorical-mix drift gate: per-window PSI against a static
    // reference — state is ONE row of k+2 counters per live window
    // (the conditional-sum aggregate), so rows must track live windows
    // inside the watermark horizon, never event volume or category
    // arrival counts.
    scenario("mix_drift") {
    val mixRef = (0 until 5).map(i => s"c$i" -> 200000L)
    val mixStream = rateSrc.select(
      concat(lit("c"), pmod(col("value"), lit(5L))).as("event_type"),
      col("timestamp").as("ts"))
    val mdRows = soak("mix_drift", StreamOps.mixDriftStream(
        mixStream, "event_type", mixRef, "10 seconds", s"$wmSec seconds")
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", s"$ckRoot/md")
      .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    val mdFinal = mdRows.lastOption.getOrElse(0L)
    // live windows in the horizon (+ trigger slack), one state row each
    val mdBound = (wmSec + 10L) / 10 + 3
    println(s"mix_drift: final stateRows=$mdFinal (window bound=$mdBound; " +
      s"event-holding state would be ~${rate.toLong * (wmSec + 10)}) " +
      (if (mdFinal > 0 && mdFinal <= mdBound)
        "PASS window-bounded state (one counter row per live window)"
       else "FAIL state exceeds the live-window bound"))
    }

    // 15) exactly-once CDC sink under micro-batch REPLAY (VERDICT
    // r13/r14): run the foreachBatch CDC apply over a bounded file
    // feed, stop, then delete the last entry of the checkpoint's
    // commit log — Structured Streaming's at-least-once window — and
    // restart so the sink SEES the same micro-batch twice. The
    // replayed epoch must be detected and skipped (applyCdcEpoch's
    // already-committed guard), leaving the snapshot BIT-IDENTICAL:
    // same _LATEST pointer, same row set, and equal to the one-shot
    // batch merge of the whole feed.
    scenario("cdc_replay") {
    val feedDir = java.nio.file.Files.createTempDirectory("soak-cdc-feed").toString
    val snapRoot = java.nio.file.Files.createTempDirectory("soak-cdc-replay").toString
    val ck = s"$ckRoot/cdc_replay"
    val nKeys = 500L
    def mkBatch(lo: Long, hi: Long) = spark.range(lo, hi).select(
      pmod(col("id"), lit(nKeys)).as("k"), col("id").as("version"),
      when(pmod(col("id"), lit(20L)) === 0, lit("delete")).otherwise(lit("update")).as("op"),
      concat(lit("n"), col("id")).as("name"))
    (0 until 4).foreach(i =>
      mkBatch(i * 2500L, (i + 1) * 2500L).coalesce(1)
        .write.parquet(s"$feedDir/f$i"))
    val schema = mkBatch(0, 1).schema
    def startApply() = StreamOps.cdcApplyStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$feedDir/*"),
      snapRoot, "k", "version", "op", ck)
    val q1 = startApply(); q1.processAllAvailable(); q1.stop()
    def snapState() = {
      val ptr = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$snapRoot/_LATEST")), "UTF-8")
      val rows = StreamOps.readVersionedSnapshot(spark, snapRoot).get
        .collect().map(_.toString).sorted.toSeq
      (ptr, rows)
    }
    val before = snapState()
    // force redelivery: drop the latest commit marker, keeping offsets
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    val dropped = commits.last.getName.toLong
    require(commits.last.delete(), "could not drop the last commit marker")
    // the local-FS checkpoint manager writes a .<N>.crc checksum
    // sidecar; the replayed commit's rename fails if it survives
    new java.io.File(s"$ck/commits/.$dropped.crc").delete()
    val q2 = startApply(); q2.processAllAvailable(); q2.stop()
    val after = snapState()
    // ground truth: one-shot batch merge of the full feed
    val oneShot = graft.dfw.MergeOps.applyChangesLwwVersioned(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        mkBatch(0L, 10000L), "k", "version", "op")
      .collect().map(_.toString).sorted.toSeq
    println(s"cdc_replay: replayed micro-batch $dropped; snapshot pointer " +
      s"${if (before._1 == after._1) "unchanged" else s"MOVED ${before._1} -> ${after._1}"}, " +
      s"rows ${if (before._2 == after._2) "bit-identical" else "DIFFER"}, " +
      s"batch-twin ${if (after._2 == oneShot) "equal" else "DIFFERS"} " +
      (if (before == after && after._2 == oneShot)
        "PASS exactly-once under at-least-once redelivery"
       else "FAIL replay mutated the snapshot or diverged from the batch twin"))
    }

    // 16) the stateless pHash IMAGE ingest gate — completes soak
    // coverage of the ingest-gate quartet (Bloom / ANN / MinHash /
    // pHash): incoming REAL PNGs (JDK-encoded from the same generator
    // as the batch corpus, so stream rows are byte-identical to batch
    // rows per id) fingerprint in-row, probe the static pHash table at
    // Hamming 0, and byte-verify against the stored corpus blobs.
    // Stream-static joins only — the plan must carry NO state operator.
    scenario("image_gate") {
    val igCorpus = graft.llm.MultimodalOps.documentsAsImages(
        graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "documents").limit(2000),
        "doc_id")
      .localCheckpoint()
    val igFps = graft.llm.MultimodalOps.pHashImages(igCorpus, "doc_id", "blob")
      .localCheckpoint()
    val igStream = rateSrc.select(col("value").as("doc_id")).as[Long]
      .map(id => (id, graft.llm.MultimodalOps.synthImagePng(id)))
      .toDF("doc_id", "blob")
    val igStates = soak("image_gate",
      StreamOps.imageGateStream(igStream, igFps, igCorpus)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", s"$ckRoot/ig")
        .trigger(Trigger.ProcessingTime(s"$triggerSec seconds")).start())
    println(s"image_gate: stateRows across all batches=${igStates.sum} " +
      (if (igStates.sum == 0) "PASS stateless (no state operator)" else "FAIL unexpected state"))
    }

    // ================= KILL-RESTART SCENARIOS (VERDICT r17 item 3) =====
    // The steady-state scenarios above measure state SIZE; these measure
    // the claim a user actually bets on at 100 TB — exactly-once ACROSS
    // a mid-stream crash. Each runs the stateful op over a bounded,
    // DETERMINISTICALLY REPLAYABLE file source (the property object
    // storage gives a real cluster), kills the query mid-run (q.stop()
    // interrupts the microbatch thread; the in-flight batch commits
    // neither offsets nor sink), restarts from the RocksDB checkpoint,
    // and asserts the final committed output equals the
    // batch-boundary-independent expected result — no dupes, no loss —
    // and that state re-plateaus after the restart.
    //
    // Batch-boundary independence is engineered into the generator, not
    // assumed: dedup keys recur only as ADJACENT rows (always same
    // file, so always same batch, far inside the watermark); interval
    // join partners sit ≤15 s of event time apart while the watermark
    // delay (120 s) exceeds the worst-case batch span (2 files = 84 s),
    // so no candidate can expire before its partner arrives under ANY
    // batching; funnel events per user are written in event-time order,
    // so every batching processes them in order and the final
    // per-user state is invariant. Without those properties the outputs
    // would LEGITIMATELY differ across batchings and the test would
    // measure the generator, not the recovery.
    lazy val restartInDir: String = {
      val d = s"$ckRoot/restart-in"
      val nFiles = 40; val perFile = 6000
      // SEQUENTIAL one-file writes: the file source orders by
      // (modification time, path), and a parallel write could land
      // part files out of event order — late data the watermark would
      // then drop batch-dependently.
      for (i <- 0 until nFiles) {
        spark.range(i.toLong * perFile, (i + 1).toLong * perFile).select(
            col("id").as("event_id"),
            pmod(col("id"), lit(5000L)).as("user_id"),       // funnel grain
            pmod(col("id"), lit(500L)).as("join_id"),        // interval-join grain
            (col("id") / 2).cast("long").as("k"),            // dedup key: each key 2×, adjacent
            element_at(typedLit(Seq("view", "click", "purchase")),
              (pmod(expr("id div 5000"), lit(3L)) + 1).cast("int")).as("event_type"),
            lit(0.0).as("value"),
            timestamp_millis(lit(1700000000000L) + col("id") * 7).as("ts"))
          .coalesce(1).write.mode("append").parquet(d)
      }
      d
    }
    lazy val restartSchema = spark.read.parquet(restartInDir).schema
    def restartSrc = spark.readStream.schema(restartSchema)
      .option("maxFilesPerTrigger", "2").parquet(restartInDir)

    /** Run `mk`'s query against one checkpoint until `killAtBatch`
      * commits, then interrupt it mid-stream; returns post-run state
      * rows per progress report. killAtBatch < 0 = run to completion
      * (Trigger.AvailableNow drains the source).
      */
    def runPhase(name: String, mk: () => StreamingQuery, killAtBatch: Long): Seq[Long] = {
      val q = mk()
      if (killAtBatch >= 0) {
        while (q.isActive &&
               Option(q.lastProgress).map(_.batchId).getOrElse(-1L) < killAtBatch)
          Thread.sleep(50)
        // stop() interrupts the stream execution thread: the batch in
        // flight has committed neither its offset-log entry nor its
        // sink transaction — the crash point a dying executor/driver
        // leaves behind
        q.stop()
        println(s"$name: KILLED after batch ${Option(q.lastProgress).map(_.batchId).getOrElse(-1L)}")
      } else {
        q.awaitTermination()
      }
      val rows = q.recentProgress.toSeq.map { p =>
        val ops = p.stateOperators
        if (ops.isEmpty) 0L else ops.map(_.numRowsTotal).sum
      }
      rows
    }

    // R1) dedup-within-watermark: 240k rows, every key exactly twice →
    // committed sink must hold each key EXACTLY once after the
    // kill-restart (a dupe = replayed batch re-emitted; a loss = offset
    // skipped). Parquet sink = the transactional file sink; the batch
    // read below sees only committed files via _spark_metadata.
    scenario("dedup_restart") {
      val outDir = s"$ckRoot/ddr-out"
      def mk(trigger: Trigger) = () => StreamOps.dedupStream(
          restartSrc.select(col("k"), col("ts")), Seq("k"), "120 seconds")
        .writeStream.format("parquet").outputMode("append")
        .option("path", outDir)
        .option("checkpointLocation", s"$ckRoot/ddr-ck")
        .trigger(trigger).start()
      runPhase("dedup_restart", mk(Trigger.ProcessingTime("0 seconds")), killAtBatch = 6)
      val post = runPhase("dedup_restart", mk(Trigger.AvailableNow()), killAtBatch = -1)
      val out = spark.read.parquet(outDir)
      val (n, nk, sk) = {
        val r = out.agg(count(lit(1)), countDistinct(col("k")), sum(col("k"))).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val expN = 120000L; val expSum = (0L until 120000L).sum
      // live state ≈ keys inside the 120 s watermark horizon (~17k ids
      // ≈ 8.5k keys) plus lag slack — far below the 120k total keys a
      // no-expiry run would hold
      val plateau = post.nonEmpty && post.max < 60000L
      println(s"dedup_restart: committed rows=$n distinct=$nk keySum=$sk " +
        s"(expected $expN/$expN/$expSum) postRestartStateMax=${if (post.isEmpty) -1 else post.max} " +
        (if (n == expN && nk == expN && sk == expSum && plateau)
          "PASS exactly-once across kill-restart (no dupes, no loss; state re-plateaued)"
         else "FAIL output diverged across restart"))
    }

    // R2) watermarked stream-stream interval join: the committed pair
    // set must equal the BATCH join over the same input — the
    // strictest possible oracle, and one the kill cannot perturb
    // because the generator keeps every partner inside the watermark
    // horizon under any batching.
    scenario("interval_join_restart") {
      val outDir = s"$ckRoot/ijr-out"
      def sides(df: org.apache.spark.sql.DataFrame)
          : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
        val ev = df.select(col("event_id"), col("join_id").as("user_id"), col("ts"))
        (ev.where(pmod(col("event_id"), lit(20L)) === 0)
           .withWatermark("ts", "120 seconds"),
         ev.withWatermark("ts", "120 seconds"))
      }
      def mk(trigger: Trigger) = () => {
        val (l, r) = sides(restartSrc)
        StreamOps.intervalJoinWithin(l, r, "15 SECONDS")
          .writeStream.format("parquet").outputMode("append")
          .option("path", outDir)
          .option("checkpointLocation", s"$ckRoot/ijr-ck")
          .trigger(trigger).start()
      }
      runPhase("interval_join_restart", mk(Trigger.ProcessingTime("0 seconds")), killAtBatch = 6)
      val post = runPhase("interval_join_restart", mk(Trigger.AvailableNow()), killAtBatch = -1)
      val got = spark.read.parquet(outDir)
        .agg(count(lit(1)), sum(col("left_id") * 31 + col("right_id"))).head()
      val (lb, rb) = sides(spark.read.parquet(restartInDir))
      val exp = StreamOps.intervalJoinWithin(lb, rb, "15 SECONDS")
        .agg(count(lit(1)), sum(col("left_id") * 31 + col("right_id"))).head()
      // both sides buffer ≤ the (120+15) s horizon ≈ 20k rows; a
      // no-expiry run would hold the full 252k-row history
      val plateau = post.nonEmpty && post.max < 100000L
      println(s"interval_join_restart: committed pairs=${got.getLong(0)} ck=${got.getLong(1)} " +
        s"batch-join expected=${exp.getLong(0)}/${exp.getLong(1)} " +
        s"postRestartStateMax=${if (post.isEmpty) -1 else post.max} " +
        (if (got.getLong(0) == exp.getLong(0) && got.getLong(1) == exp.getLong(1) && plateau)
          "PASS stream≡batch across kill-restart (no dupes, no loss; state re-plateaued)"
         else "FAIL join output diverged across restart"))
    }

    // R3) funnel FMGWS: update-mode emissions are batching-DEPENDENT
    // (one batch may coalesce two step advances), so the invariant is
    // the FINAL per-user state — last update per user, which must land
    // every user at step 3 with the analytically known stage times.
    // foreachBatch is at-least-once; a replayed batch carries the same
    // batchId and identical deterministic rows, so keeping the
    // max-batchId update per user is idempotent under replay — the
    // sink-side discipline any real FMGWS consumer needs.
    scenario("funnel_restart") {
      val updates = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Int, Long)]()
      def mk(trigger: Trigger) = () => StreamOps.funnelStream(
          restartSrc.select(col("event_id"), col("user_id"), col("event_type"),
            col("value"), col("ts")).as[StreamOps.Event],
          Seq("view", "click", "purchase"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$ckRoot/fnr-ck")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.FunnelProgress], batchId: Long) =>
          batch.collect().foreach { fp =>
            val ckSum = fp.times.map(t => t.getTime).sum
            updates.merge(fp.user_id, (batchId, fp.step, ckSum),
              (a, b) => if (b._1 >= a._1) b else a)
          }
        }
        .trigger(trigger).start()
      runPhase("funnel_restart", mk(Trigger.ProcessingTime("0 seconds")), killAtBatch = 6)
      val post = runPhase("funnel_restart", mk(Trigger.AvailableNow()), killAtBatch = -1)
      // user u advances at ids u (view), u+5000 (click), u+10000
      // (purchase); ts = 1700000000000 + id*7 ms
      def expCk(u: Long): Long =
        (0 to 2).map(j => 1700000000000L + (u + 5000L * j) * 7).sum
      val nUsersR = 5000L
      val finals = updates.entrySet().iterator()
      var okUsers = 0L; var badUsers = 0L
      while (finals.hasNext) {
        val e = finals.next(); val u = e.getKey; val (_, step, ck) = e.getValue
        if (step == 3 && ck == expCk(u)) okUsers += 1 else badUsers += 1
      }
      val plateau = post.nonEmpty && post.max <= nUsersR
      println(s"funnel_restart: finalUsers=${updates.size} ok=$okUsers bad=$badUsers " +
        s"(expected $nUsersR/$nUsersR/0) postRestartStateMax=${if (post.isEmpty) -1 else post.max} " +
        (if (okUsers == nUsersR && badUsers == 0 && updates.size == nUsersR && plateau)
          "PASS final FMGWS state identical across kill-restart (state ≤ key cardinality)"
         else "FAIL funnel state diverged across restart"))
    }

    spark.stop()
  }
}
