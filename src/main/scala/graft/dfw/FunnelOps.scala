package graft.dfw

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential funnel analysis over an event log: how many users
  * performed step 1, then step 2 AFTER step 1, then step 3 after
  * step 2, … — the conversion query every event pipeline runs.
  *
  * Shape chosen for scale: NO sessionize/window formulation (a
  * per-user ordered window would shuffle and sort the whole event log
  * per step). Instead each step k keeps one row per user still in the
  * funnel — `(user, t_k)` where `t_k` is the FIRST qualifying time —
  * and step k+1 is a broadcast join of that per-user state against the
  * scan-filtered event log followed by a min-aggregate. A k-step
  * funnel is k filtered passes over events (type predicates push to
  * the parquet scan) with only user-cardinality state ever crossing
  * the network; events themselves are never shuffled.
  */
object FunnelOps {

  /** Per-step reach of the funnel `steps` (first-occurrence, strictly
    * increasing timestamps across steps).
    *
    * @return (step INT, stage STRING, n_users LONG, conv_pct LONG) —
    *         conv_pct = integer percent of step-1 users (exact in any
    *         summation order)
    */
  def sequentialFunnel(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached = scala.collection.mutable.ListBuffer(steps.head -> cur)
    for (st <- steps.tail) {
      cur = events.filter(col(typeCol) === st)
        .join(broadcast(cur.withColumnRenamed("__t", "__prev")), userCol)
        .filter(col(tsCol) > col("__prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      reached += st -> cur
    }
    val counts = reached.toSeq.zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
    val first = counts.filter(col("step") === 1).select(col("n_users").as("__n0"))
    counts.crossJoin(broadcast(first))
      .select(col("step"), col("stage"), col("n_users"),
        // guarded: a funnel whose first step has no actors reports 0%
        // reach instead of dividing by zero (which throws under ANSI)
        expr("CASE WHEN __n0 = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (n_users * 100) div __n0 END").as("conv_pct"))
      .orderBy(col("step"))
  }

  /** Cohort retention matrix: users grouped by first-seen day, and for
    * each (cohort, day-offset) the count and integer percent of the
    * cohort active that day — the activation/churn table behind every
    * "day-N retention" readout.
    *
    * Shape: activity collapses to distinct (day, user) pairs first
    * (user-day cardinality, ≪ events), the per-user first-seen table
    * broadcasts back, and one hash aggregate per (cohort, offset)
    * finishes — no window, no self-join over events. Integer percents
    * (`div`); a cohort's own day 0 is always 100.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val act = events.select(to_date(col(tsCol)).as("day"), col(userCol).as("__u")).distinct()
    val first = act.groupBy(col("__u")).agg(min(col("day")).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_n"))
    act.join(broadcast(first), "__u")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active")) // (cohort, offset, user) unique by construction
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        expr("(n_active * 100) div cohort_n").as("retention_pct"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}
