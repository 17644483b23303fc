package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Journey/path analytics over an event stream: the top-k touch
  * sequences users actually take, and first-order Markov
  * removal-effect attribution (the data-driven alternative to
  * last-touch — Anderl et al. 2014's formulation). A journey is one
  * (user, day): its ordered channel touches, truncated at the first
  * conversion.
  *
  * Scale posture: every window here is partitioned per JOURNEY
  * (user × day) — partitions bounded by one user's events in one day,
  * never by the table; transition/path counting is a partial-agg
  * groupBy over a key space bounded by the channel vocabulary (paths:
  * vocabᶰ, still data-independent); the Markov solve runs on the
  * collected |channels|²-row transition matrix — bounded by
  * construction like the Z-order min/max row, NOT by data.
  */
object PathOps {

  val StartState = "(start)"
  val ConvState = "(conv)"
  val NullState = "(null)"

  /** Top-k length-`n` touch sequences ("view>click>purchase") by
    * journey-day, counted across the corpus. `lead` over the
    * per-journey window; global top-k is orderBy+limit —
    * TakeOrderedAndProject, a per-partition heap, never a full sort.
    *
    * @param orderCols total order within a journey (pass the event
    *                  timestamp plus a unique id as tiebreak)
    * @return k rows: `path, cnt`, ordered (cnt desc, path)
    */
  def topPaths(events: DataFrame, userCol: Column, tsCol: Column,
               channelCol: Column, orderCols: Seq[Column],
               n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"a path needs >= 2 steps, got $n")
    val w = Window.partitionBy(userCol, to_date(tsCol)).orderBy(orderCols: _*)
    val steps = (1 until n).map(i => lead(channelCol, i).over(w))
    events
      .select(concat_ws(">", (channelCol +: steps): _*).as("path"),
        steps.last.isNotNull.as("__full"))
      .where(col("__full"))
      .groupBy(col("path")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path"))
      .limit(k)
  }

  /** First-order Markov removal-effect attribution. Builds the
    * journey transition graph (start → touches → conv/null, truncated
    * at the first conversion), solves the absorbing chain's
    * conversion probability from `(start)` by `iters` fixed Jacobi
    * sweeps, then re-solves with each channel knocked out (its
    * incoming edges redirected to `(null)`, its outgoing edges
    * dropped). A channel's removal effect is the relative conversion
    * drop; attribution shares normalize the removal effects.
    *
    * Determinism: probabilities live on the integer ppm grid — each
    * sweep is exact Long arithmetic (Σ count·p // out, floor), so any
    * engine replaying the same `iters` sweeps over the same counts
    * reproduces every ppm bit. `iters` bounds the journey length the
    * solve "sees" (p(start) after K sweeps = P(convert within K
    * touches)); 40 covers any plausible session depth.
    *
    * The transition matrix collapses to ≤ (|channels|+1)² rows before
    * the driver-side solve — bounded by the channel vocabulary, never
    * by data (guarded). Everything before it is per-journey windows
    * and one partial-agg count.
    *
    * @param orderCols total order within a journey (timestamp + id)
    * @return one row per channel: `channel, p_base_ppm,
    *         p_removed_ppm, removal_ppm, attr_ppm`, ordered by channel
    */
  def markovAttribution(events: DataFrame, userCol: Column, tsCol: Column,
                        channelCol: Column, convChannel: String,
                        orderCols: Seq[Column], iters: Int = 40): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val jw = Window.partitionBy(userCol, to_date(tsCol)).orderBy(orderCols: _*)
    val jp = Window.partitionBy(col("__u"), col("__d"))
    val base = events
      .select(userCol.as("__u"), to_date(tsCol).as("__d"),
        channelCol.as("__ch"),
        row_number().over(jw).as("__pos"))
      .withColumn("__cpos",
        min(when(col("__ch") === convChannel, col("__pos"))).over(jp))
    val kw = Window.partitionBy(col("__u"), col("__d")).orderBy(col("__pos"))
    val kept = base
      .where(col("__ch") =!= convChannel &&
        (col("__cpos").isNull || col("__pos") < col("__cpos")))
      .withColumn("__rn", row_number().over(kw))
      .withColumn("__nxt", lead(col("__ch"), 1).over(kw))
    val starts = kept.where(col("__rn") === 1)
      .select(lit(StartState).as("src"), col("__ch").as("dst"))
    val steps = kept.select(col("__ch").as("src"),
      coalesce(col("__nxt"),
        when(col("__cpos").isNotNull, ConvState).otherwise(NullState)).as("dst"))
    val instantConvs = base
      .where(col("__pos") === 1 && col("__ch") === convChannel)
      .select(lit(StartState).as("src"), lit(ConvState).as("dst"))
    val counts = starts.unionByName(steps).unionByName(instantConvs)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
    // |channels|² rows by construction — the bounded-collect pattern
    val trans = counts.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(trans.length <= 10000,
      s"transition matrix has ${trans.length} rows — channel vocabulary " +
        "is not bounded; this operator is for categorical channels")
    val channels = trans.map(_._1).filter(_ != StartState).distinct.sorted.toSeq

    def solve(removed: Option[String]): Long = {
      val mod = trans.iterator
        .filter { case (s, _, _) => !removed.contains(s) }
        .map { case (s, d, c) => (s, if (removed.contains(d)) NullState else d, c) }
        .toSeq
      val bySrc = mod.groupBy(_._1)
      val out = bySrc.map { case (s, rows) => s -> rows.map(_._3).sum }
      var p = Map.empty[String, Long].withDefaultValue(0L)
      var i = 0
      while (i < iters) {
        p = bySrc.map { case (s, rows) =>
          val num = rows.iterator.map { case (_, d, c) =>
            c * (d match {
              case ConvState => 1000000L
              case NullState => 0L
              case ch => p(ch)
            })
          }.sum
          s -> num / out(s)
        }.withDefaultValue(0L)
        i += 1
      }
      p(StartState)
    }

    val pBase = solve(None)
    val rows = channels.map { ch =>
      val pRem = solve(Some(ch))
      val removal =
        if (pBase > 0) math.max(0L, pBase - pRem) * 1000000L / pBase else 0L
      (ch, pBase, pRem, removal)
    }
    val sumRe = rows.map(_._4).sum
    rows.map { case (ch, pb, pr, re) =>
      (ch, pb, pr, re, if (sumRe > 0) re * 1000000L / sumRe else 0L)
    }.toDF("channel", "p_base_ppm", "p_removed_ppm", "removal_ppm", "attr_ppm")
      .orderBy(col("channel"))
  }
}
