package graft.dfw

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** J3: hyperparameter grid — the reference's `Lambda` class builds the
  * full cartesian product of per-parameter choice lists via iterated
  * `np.kron` (`/root/reference/DFW/preprocess.py:481-497`), producing
  * rows in lexicographic order of the *list positions* (parameter 0
  * varies slowest, the last parameter fastest), all values promoted to
  * float64.
  *
  * Spark-first: a chain of `crossJoin`s over one-row-per-choice literal
  * DataFrames. Catalyst plans each as a `BroadcastNestedLoopJoin` (every
  * side is tiny); the combo id is the closed-form mixed-radix index of
  * the choice positions, so no window/sort is needed to reproduce kron
  * order deterministically.
  */
object GridOps {

  /** Build the grid. Output schema:
    * `combo_id BIGINT, p1 DOUBLE, p2 DOUBLE, ... pK DOUBLE`,
    * with `combo_id` 0-based in kron (lexicographic) order.
    */
  def grid(spark: SparkSession, groups: Seq[Seq[Double]]): DataFrame = {
    require(groups.nonEmpty && groups.forall(_.nonEmpty), "every parameter needs at least one choice")
    // radix weight of parameter i = product of sizes of parameters after i
    val weights = groups.indices.map(i => groups.drop(i + 1).map(_.size.toLong).product)
    val paramDfs = groups.zipWithIndex.map { case (choices, i) =>
      val rows = choices.zipWithIndex.map { case (v, idx) => (idx.toLong, v) }
      spark.createDataFrame(rows).toDF(s"__idx_${i + 1}", s"p${i + 1}")
    }
    val crossed = paramDfs.reduce(_ crossJoin _)
    val comboId = groups.indices
      .map(i => col(s"__idx_${i + 1}") * weights(i))
      .reduce(_ + _)
    crossed
      .withColumn("combo_id", comboId)
      .select(col("combo_id") +: groups.indices.map(i => col(s"p${i + 1}")): _*)
  }

  /** `get_lmd_choice_set_num` (`preprocess.py:513-514`): total combos. */
  def comboCount(groups: Seq[Seq[Double]]): Long = groups.map(_.size.toLong).product

  /** `get_lmd_choice_by_index` (`preprocess.py:502-503`): one combo by
    * its kron-order index, computed driver-side (closed form, no scan).
    */
  def comboByIndex(groups: Seq[Seq[Double]], index: Long): Seq[Double] = {
    require(index >= 0 && index < comboCount(groups), s"combo index $index out of range")
    val weights = groups.indices.map(i => groups.drop(i + 1).map(_.size.toLong).product)
    groups.zipWithIndex.map { case (choices, i) =>
      choices(((index / weights(i)) % choices.size).toInt)
    }
  }
}
