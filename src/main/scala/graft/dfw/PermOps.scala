package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Permutation gather and index normalization
  * (SURVEY.md §2.3, J1/J2).
  *
  * The reference stores per-class permutation matrices and gathers
  * `x[k][r[k][no,:],:]` (`/root/reference/DFW/preprocess.py:53`) —
  * semantically an equi-join of the data against an index table with
  * order restored by position.
  */
object PermOps {

  /** J1: permutation gather — join samples against one trial of the
    * permutation table; the permutation's `pos` column carries the
    * gathered order. The permutation side is filtered to a single
    * trial first (predicate pushdown makes this a cheap scan) and is
    * normally small enough to broadcast; at equal scale Catalyst/AQE
    * falls back to a shuffled join on the same keys.
    *
    * @param samples data table with `keyCols` + `sampleIdCol`
    * @param perm    permutation table `(keyCols..., trial, pos, sampleId)`
    * @param trial   which stored permutation row to use (the reference's `no`)
    */
  def gather(samples: DataFrame, perm: DataFrame, keyCols: Seq[String],
             sampleIdCol: String, trial: Int): DataFrame = {
    val p = perm.filter(col("trial") === trial).select((keyCols :+ sampleIdCol :+ "pos").map(col): _*)
    samples.join(p, keyCols :+ sampleIdCol)
  }

  /** J2: MATLAB 1-based index normalization — if a class's permutation
    * values top out at exactly the class size, the whole class shifts
    * down by one (`preprocess.py:423-424`). A per-class analytic max
    * (no extra shuffle if the data is already partitioned by the keys)
    * drives a conditional subtract.
    */
  def normalizeIndices(perm: DataFrame, keyCols: Seq[String], posValCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    perm
      .withColumn("__mx", max(col(posValCol)).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn(posValCol,
        when(col("__mx") === col("__n"), col(posValCol) - 1).otherwise(col(posValCol)))
      .drop("__mx", "__n")
  }
}
