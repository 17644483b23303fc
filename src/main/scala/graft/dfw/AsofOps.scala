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
}
