package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection / slicing operators (SURVEY.md §2.2, P1–P2). */
object SliceOps {

  /** P1: class-range slice — keep classes in the reference's 1-based
    * inclusive range `[lo, hi]`; `(-1, _)` means all
    * (`/root/reference/DFW/preprocess.py:413-419`). Class labels are
    * 0-based, so the filter is `between(lo-1, hi-1)`. A plain filter:
    * Catalyst pushes it into the Parquet scan.
    */
  def classRange(df: DataFrame, clsCol: String, range: (Int, Int)): DataFrame =
    range match {
      case (-1, _)   => df
      case (lo, hi)  => df.filter(col(clsCol).between(lo - 1, hi - 1))
    }

  /** P2: label-row drop. The reference's `labeled` flag is a latent
    * bug — both branches of `preprocess.py:422` drop the last row
    * unconditionally. We implement the *intended* semantics (drop the
    * trailing label entry only when `labeled` is set) and document the
    * divergence (SURVEY.md §5.4).
    */
  def dropLabelEntry(features: Column, labeled: Boolean): Column =
    if (labeled) slice(features, lit(1), size(features) - 1)
    else features
}
