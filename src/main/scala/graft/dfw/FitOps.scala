package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form model fitting as ONE aggregation pass — the
  * quality-probe distillation step of a corpus pipeline: an expensive
  * teacher signal (tokenizer-derived quality, classifier scores) is
  * regressed onto cheap byte-level features, and the fitted linear
  * probe then scores the whole corpus without paying the teacher
  * again (the fastText-classifier-distillation shape at 100 TB).
  *
  * Everything here is normal-equations algebra over MOMENT SUMS:
  * {{{
  *   (X'X + λI) β = X'y        (intercept unpenalized)
  * }}}
  * solved by Cramer's rule on the 3×3 system. The one distributed
  * pass computes the ten sums (n, Σx1, Σx2, Σx1², Σx2², Σx1x2, Σy,
  * Σx1y, Σx2y, Σy²) with map-side combine; the solve itself is a
  * handful of scalar expressions on the ONE-ROW aggregate — no
  * driver-side collect, no iteration, no second scan for R².
  *
  * Exactness contract: features and target must be INTEGER-valued.
  * The moment sums accumulate in DECIMAL(38,0) — exact at any row
  * count and order-independent — and only then cast to DOUBLE, so the
  * downstream IEEE algebra is bit-identical on any engine that
  * evaluates the same expression tree (the property that lets a DuckDB
  * oracle replay the fit to the last bit; float features would make
  * the sums order-dependent).
  *
  * Scale: the fit is one shuffle of ten partially-aggregated cells per
  * partition. Scoring ([[ridgeResiduals2]]) broadcasts the one-row
  * coefficient table — the corpus side never shuffles.
  */
object FitOps {

  private def det3(a: Column, b: Column, c: Column,
                   d: Column, e: Column, f: Column,
                   g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** Moment sums + Cramer solve as a one-row DataFrame with the raw
    * DOUBLE columns (unrounded — callers round for display/oracles):
    * `n, b0, b1, b2, r2`.
    */
  private def fit2(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
                   lambda: Double, byCols: Seq[String] = Nil): DataFrame = {
    val dec = "decimal(38,0)"
    def s(c: Column, as: String) = sum(c.cast(dec)).cast("double").as(as)
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    // Products are formed in DECIMAL, not LongType: a 64-bit product
    // wraps silently once |x| ≳ 3.04e9, breaking the "exact at any row
    // count" contract (the DuckDB oracle promotes to HUGEINT, so the
    // wrap would also hash-mismatch loudly). Spark narrows
    // decimal(38,0)×decimal(38,0) back to 38 digits — ample for
    // squares of 19-digit longs.
    val x1d = x1.cast(dec); val x2d = x2.cast(dec); val yd = y.cast(dec)
    val aggs = Seq(
      count(lit(1)).cast("double").as("n"),
      s(x1, "s1"), s(x2, "s2"),
      s(x1d * x1d, "s11"), s(x2d * x2d, "s22"), s(x1d * x2d, "s12"),
      s(y, "sy"), s(x1d * yd, "s1y"), s(x2d * yd, "s2y"), s(yd * yd, "syy"))
    val m = df.groupBy(byCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val l = lit(lambda)
    val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
    val s11l = col("s11") + l; val s22l = col("s22") + l; val s12 = col("s12")
    val sy = col("sy"); val s1y = col("s1y"); val s2y = col("s2y"); val syy = col("syy")
    // Degenerate guards (nondegenerate values are untouched — the
    // guarded branch computes the identical expression): a singular
    // system (constant feature at λ=0, or n=0) yields null β instead
    // of ±Inf/NaN; constant y below yields null R².
    val den0 = det3(n, s1, s2, s1, s11l, s12, s2, s12, s22l)
    val den = when(den0 === 0.0, lit(null)).otherwise(den0)
    val b0 = det3(sy, s1, s2, s1y, s11l, s12, s2y, s12, s22l) / den
    val b1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22l) / den
    val b2 = det3(n, s1, sy, s1, s11l, s1y, s2, s12, s2y) / den
    val by = byCols.map(col)
    m.select(by ++ Seq(n.as("nn"), sy, s1y, s2y, syy, col("s11"), col("s22"), s12,
        s1, s2, b0.as("b0"), b1.as("b1"), b2.as("b2")): _*)
      .select(by ++ Seq(col("nn"), col("b0"), col("b1"), col("b2"),
        // Ridge β does not satisfy the unpenalized normal equations, so
        // SSE needs the full quadratic form β'Mβ − 2β'b + Σy² (the OLS
        // shortcut Σy² − β'b would be wrong for λ > 0). A zero total
        // sum of squares (constant y) yields null R², not ±Inf:
        (lit(1.0) - ((syy
          - lit(2.0) * (col("b0") * col("sy") + col("b1") * col("s1y") + col("b2") * col("s2y"))
          + (col("b0") * col("b0") * col("nn")
            + col("b1") * col("b1") * col("s11")
            + col("b2") * col("b2") * col("s22")
            + lit(2.0) * col("b0") * col("b1") * col("s1")
            + lit(2.0) * col("b0") * col("b2") * col("s2")
            + lit(2.0) * col("b1") * col("b2") * col("s12")))
          / {
            val sst = syy - col("sy") * col("sy") / col("nn")
            when(sst === 0.0, lit(null)).otherwise(sst)
          })).as("r2")): _*)
      .select(by ++ Seq(col("nn").cast("long").as("n"),
        col("b0"), col("b1"), col("b2"), col("r2")): _*)
  }

  /** Ridge regression of integer target `yCol` on two integer features
    * (plus an unpenalized intercept), closed form. One distributed
    * aggregation; returns one row
    * `(n, beta0, beta1, beta2, r2)` with the coefficients and
    * in-sample R² rounded to `roundTo` dp.
    */
  def ridgeFit2(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
                lambda: Double, roundTo: Int = 8): DataFrame =
    fit2(df, x1Col, x2Col, yCol, lambda)
      .select(col("n"),
        round(col("b0"), roundTo).as("beta0"),
        round(col("b1"), roundTo).as("beta1"),
        round(col("b2"), roundTo).as("beta2"),
        round(col("r2"), roundTo).as("r2"))

  /** Per-group [[ridgeFit2]]: one independent closed-form probe per
    * `byCols` key (per-source, per-language, per-domain fits) from the
    * SAME single moment pass — the groupBy replaces the global
    * aggregate, everything downstream is per-row scalar algebra, so k
    * groups cost one shuffle of k×10 cells, not k passes.
    */
  def ridgeFit2By(df: DataFrame, byCols: Seq[String],
                  x1Col: String, x2Col: String, yCol: String,
                  lambda: Double, roundTo: Int = 8): DataFrame =
    fit2(df, x1Col, x2Col, yCol, lambda, byCols)
      .select(byCols.map(col) ++ Seq(col("n"),
        round(col("b0"), roundTo).as("beta0"),
        round(col("b1"), roundTo).as("beta1"),
        round(col("b2"), roundTo).as("beta2"),
        round(col("r2"), roundTo).as("r2")): _*)

  /** Fit the probe, then score every row with it in the same plan:
    * `pred = β0 + β1·x1 + β2·x2`, `resid = y − pred`. The one-row
    * coefficient table rides a broadcast cross-join — the corpus side
    * never shuffles, so scoring costs one codegen'd scan at any scale.
    * Keeps `idCols` as the row identity; `resid`/`pred` are rounded to
    * `roundTo` dp. The UNROUNDED β feed the arithmetic (rounding them
    * first would poison every prediction).
    */
  def ridgeResiduals2(df: DataFrame, idCols: Seq[String],
                      x1Col: String, x2Col: String, yCol: String,
                      lambda: Double, roundTo: Int = 6): DataFrame = {
    val fit = fit2(df, x1Col, x2Col, yCol, lambda)
      .select(col("b0"), col("b1"), col("b2"))
    val pred = col("b0") + col("b1") * col(x1Col).cast("double") +
      col("b2") * col(x2Col).cast("double")
    df.crossJoin(broadcast(fit))
      .select(idCols.map(col) ++ Seq(
        col(x1Col), col(x2Col), col(yCol),
        round(pred, roundTo).as("pred"),
        round(col(yCol).cast("double") - pred, roundTo).as("resid")): _*)
  }
}
