package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for every left row, the most recent
  * right row with `ts_right <= ts_left` on the same keys.
  *
  * Spark has no native as-of join; the naive range join explodes to
  * O(left × right) pairs per key before picking the max. This
  * implementation is the scalable composition: tag both sides, UNION
  * them, and carry the latest right payload forward with one
  * `last(..., ignoreNulls)` window over a running frame — a single
  * shuffle on the join keys, linear in input size, no pair explosion.
  * (The same shape under `ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
  * ROW` is what stream-stream joins do with state.)
  *
  * Determinism: at equal timestamps the right row sorts before the
  * left (`__side` 0 < 1), making the match inclusive; among equal
  * right timestamps the greatest `tieCol` wins.
  */
object AsofOps {

  /** @param left        probe side; keeps all its rows
    * @param right       build side whose `payloadCols` are fetched as-of
    * @param keys        equi-join keys
    * @param tsCol       event-time column, present on both sides
    * @param tieCol      total-order tiebreaker within equal timestamps
    * @param payloadCols right columns to surface (null when no match yet)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, tieCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__side", lit(1))
      .withColumns(payloadCols.map(c => s"__p_$c" -> lit(null)).toMap)
    val r = right
      .withColumn("__side", lit(0))
      .withColumns(payloadCols.map(c => s"__p_$c" -> col(c)).toMap)
      .select((keys :+ tsCol :+ tieCol).map(col) ++ Seq(col("__side")) ++
        payloadCols.map(c => col(s"__p_$c")): _*)
    val unioned = l.select((keys :+ tsCol :+ tieCol).map(col) ++ Seq(col("__side")) ++
        payloadCols.map(c => col(s"__p_$c")) ++
        leftCols.filterNot((keys :+ tsCol :+ tieCol).contains).map(col): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"${c}_asof", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .drop("__side")
      .drop(payloadCols.map(c => s"__p_$c"): _*)
  }

  /** Point-in-time FEATURE join with an embargo — the feature-store
    * training-set builder with leakage protection: for each label row
    * at time t, the latest feature row with
    * `feature_ts <= t − embargo`. The embargo models pipeline
    * latency: a feature computed at 09:59 is not SERVABLE at 10:00 if
    * the feature pipeline takes an hour, so training on it leaks
    * (the backtest looks great, production can't reproduce it —
    * the classic financial-ML purge/embargo rule).
    *
    * Implementation: shift the feature side's event time by
    * +embargo, then [[asofJoin]] — same single keyed shuffle, no pair
    * explosion. Boundary is inclusive: a feature exactly `embargo`
    * old qualifies.
    */
  def pitFeatureJoin(labels: DataFrame, features: DataFrame, keys: Seq[String],
                     tsCol: String, tieCol: String, payloadCols: Seq[String],
                     embargoSeconds: Long): DataFrame = {
    require(embargoSeconds >= 0, s"embargo must be >= 0, got $embargoSeconds")
    val shifted = features.withColumn(tsCol,
      col(tsCol) + expr(s"INTERVAL $embargoSeconds SECONDS"))
    asofJoin(labels, shifted, keys, tsCol, tieCol, payloadCols)
  }
}
