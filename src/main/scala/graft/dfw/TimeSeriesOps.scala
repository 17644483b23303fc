package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event time-series shapes over an append-only event log: bucketed
  * OHLC bars and first-order (Markov) transition counts. Both are
  * one-window-plus-one-aggregate plans whose window partition keys are
  * high-cardinality ((series, bucket) / user), so no reducer ever sees
  * more than one series' bucket — the shape that survives a 100 TB
  * event log.
  */
object TimeSeriesOps {

  /** Time-bucketed OHLC bars per series: open/close are the first/last
    * value in the bucket by (time, tiebreak) order, high/low/volume/
    * mean aggregate over the bucket. The standard downsampling shape
    * for metric and market data.
    *
    * Determinism: equal timestamps are broken by `tieCol` (a unique
    * id), so open/close are well-defined under any shuffle order —
    * first_value/last_value run over a total order, never an arbitrary
    * one. The mean is emitted in integer micro-units (an order-free
    * sum followed by one integer division), engine-exact.
    *
    * Plan shape: one window partitioned by (series, bucket) —
    * high-cardinality, skew-free for any realistic bucket width — then
    * one hash aggregate on the same key; Catalyst reuses the window's
    * partitioning for the aggregate, so the plan has a single shuffle.
    */
  def ohlcBars(events: DataFrame, seriesCol: String, tsCol: String,
               valueCol: String, tieCol: String,
               bucket: String = "hour"): DataFrame = {
    // bucket materialized as an attribute BEFORE the window so the
    // window partitioning and the downstream groupBy key are the SAME
    // attribute — Catalyst then reuses one exchange for both (keying
    // the window on the raw date_trunc expression leaves the aggregate
    // unable to prove co-partitioning and inserts a second shuffle)
    val w = Window.partitionBy(col(seriesCol), col("bucket_ts"))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events
      .withColumn("bucket_ts", date_trunc(bucket, col(tsCol)))
      .select(col(seriesCol), col("bucket_ts"), col(tsCol), col(tieCol), col(valueCol),
        first(col(valueCol)).over(w).as("open"),
        last(col(valueCol)).over(w).as("close"))
      .groupBy(col(seriesCol), col("bucket_ts"))
      .agg(
        first(col("open")).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        first(col("close")).as("close"),
        count(lit(1)).as("volume"),
        sum(round(col(valueCol) * 1000000).cast("long")).as("sum_q"))
      .withColumn("mean_q", expr("sum_q div volume"))
  }

  /** OHLC bars as ONE pure hash aggregate — `min_by`/`max_by` over the
    * unique (ts, tiebreak) struct pick open/close with no window and
    * no sort: partials combine map-side, so per-group state is six
    * scalars regardless of bucket size (the window form sorts each
    * partition). Same output contract as [[ohlcBars]] (TimeSeriesOps
    * Spec pins equality); being a plain aggregation it is ALSO legal
    * as a streaming query body — see
    * [[graft.streaming.StreamOps.ohlcStream]].
    */
  def ohlcBarsAgg(events: DataFrame, seriesCol: String, tsCol: String,
                  valueCol: String, tieCol: String,
                  bucket: String = "hour"): DataFrame = {
    val okey = struct(col(tsCol), col(tieCol))
    events
      .withColumn("bucket_ts", date_trunc(bucket, col(tsCol)))
      .groupBy(col(seriesCol), col("bucket_ts"))
      .agg(
        min_by(col(valueCol), okey).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), okey).as("close"),
        count(lit(1)).as("volume"),
        sum(round(col(valueCol) * 1000000).cast("long")).as("sum_q"))
      .withColumn("mean_q", expr("sum_q div volume"))
  }

  /** First-order transition counts over per-entity event sequences —
    * the empirical Markov chain of "what happens after X" (session
    * flow analysis, next-event models, anomalous-sequence mining).
    *
    * Each entity's events are ordered by (time, tiebreak); every
    * consecutive pair contributes one (from_state, to_state)
    * observation; counts aggregate globally with a parts-per-million
    * row probability per source state (integer division — order-free,
    * engine-exact).
    *
    * Plan shape: one window partitioned by entity (high-cardinality),
    * one hash aggregate on (from, to) — state-vocabulary sized — and a
    * broadcast-sized per-from total joined back. Nothing scales with
    * more than the event count.
    */
  def transitionCounts(events: DataFrame, entityCol: String, stateCol: String,
                       tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(entityCol), col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .filter(col("to_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_state")).agg(sum(col("n")).as("tot"))
    counts.join(broadcast(totals), "from_state")
      .select(col("from_state"), col("to_state"), col("n"),
        expr("n * 1000000 div tot").as("p_ppm"))
  }

  /** Rolling active users — DAU, trailing-`windowDays` AU, and the
    * stickiness ratio (DAU/WAU per million) per active day: the
    * engagement accounting every product-analytics stack reports.
    *
    * EXACT at scale without a window self-join: the naive plan joins
    * every day against `windowDays` days of raw events (w× the event
    * scan); here the corpus first collapses to DISTINCT (day, user) —
    * one map-side-combinable aggregation, ≤ |users|×|days| rows no
    * matter how many raw events — and each active pair then explodes
    * to the ≤`windowDays` window-end days it covers. The expansion is
    * bounded by w (not by data), and both counts are plain hash
    * aggregations. `count_distinct` here is exact; at extreme user
    * cardinality swap the final count for `approx_count_distinct`/HLL
    * sketches, merging daily sketches instead of re-listing users
    * (the [[graft.llm.SketchOps]] posture).
    *
    * @return (day DATE, dau, wau, stickiness_ppm — all LONG), one row
    *         per day with ≥1 active user; a window is the trailing
    *         `windowDays` ENDING that day
    */
  def rollingActiveUsers(events: DataFrame, tsCol: String, userCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays > 0, "windowDays must be positive")
    val du = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("__u"))
      .distinct()
    val covered = du.select(col("__u"),
      explode(expr(s"sequence(day, date_add(day, ${windowDays - 1}))")).as("wday"))
    val wau = covered.groupBy("wday").agg(countDistinct(col("__u")).as("wau"))
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    dau.join(wau.withColumnRenamed("wday", "day"), "day")
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
  }
}
