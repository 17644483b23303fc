package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming operators (SURVEY.md §2.8 X6). The reference is fully
  * batch; these are the extension surface. Each transform is written
  * against a plain DataFrame so the SAME function body serves both the
  * batch oracle queries and `readStream` sources — Structured
  * Streaming's unified API. Watermark-dependent variants are the
  * `withWatermark` wrappers below.
  */
object StreamOps {

  /** Tumbling-window counts/sums. On a stream: append-mode safe once
    * combined with [[withEventTimeWatermark]].
    */
  def tumblingAgg(events: DataFrame, windowDuration: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window aggregation (windowDuration every slideDuration). */
  def slidingAgg(events: DataFrame, windowDuration: String, slideDuration: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowDuration, slideDuration).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Batch sessionization: gap-based sessions per user via lag +
    * running sum. The streaming twin is `session_window` (below) —
    * same session semantics, incremental state.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
      .withColumn("new_s", when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
  }

  /** Streaming sessionization via `session_window` — state-store backed,
    * watermark-bounded; semantics match [[sessionizeBatch]]'s gap rule.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start"), col("w.end").as("end"), col("n_events"))

  /** Watermarked tumbling aggregation for append-mode streams. */
  def tumblingAggStream(events: DataFrame, windowDuration: String, watermark: String): DataFrame =
    tumblingAgg(events.withWatermark("ts", watermark), windowDuration)
}
