package graft

import org.apache.spark.sql.functions._
import graft.dfw.FitOps

/** Closed-form ridge probe: one exact-decimal moment pass + Cramer
  * solve. Pinned against hand algebra, the OLS limit, shrinkage
  * direction, and the degenerate-input contract.
  */
class FitOpsSpec extends SparkSpec {
  import spark.implicits._

  // exactly linear data: y = 2 + 3*x1 - x2 (integers) => OLS recovers
  // the coefficients exactly and r2 = 1
  private val linear = Seq(
    (1L, 0L, 0L), (2L, 1L, 7L), (3L, 2L, 1L), (4L, 5L, 2L), (5L, 3L, 9L), (6L, 8L, 4L))
    .map { case (_, x1, x2) => (x1, x2, 2L + 3L * x1 - x2) }
    .toDF("x1", "x2", "y")

  test("lambda = 0 on exactly linear data recovers the OLS solution, r2 = 1") {
    val r = FitOps.ridgeFit2(linear, "x1", "x2", "y", lambda = 0.0).collect().head
    r.getLong(0) shouldBe 6L
    r.getDouble(1) shouldBe 2.0 +- 1e-6
    r.getDouble(2) shouldBe 3.0 +- 1e-6
    r.getDouble(3) shouldBe -1.0 +- 1e-6
    r.getDouble(4) shouldBe 1.0 +- 1e-6
  }

  test("ridge shrinks the slopes toward zero and costs in-sample r2") {
    val ols = FitOps.ridgeFit2(linear, "x1", "x2", "y", lambda = 0.0).collect().head
    val rdg = FitOps.ridgeFit2(linear, "x1", "x2", "y", lambda = 50.0).collect().head
    math.abs(rdg.getDouble(2)) should be < math.abs(ols.getDouble(2))
    math.abs(rdg.getDouble(3)) should be < math.abs(ols.getDouble(3))
    rdg.getDouble(4) should be < ols.getDouble(4)
    rdg.getDouble(4) should be > 0.5 // still mostly explains linear data
  }

  test("ridgeFit2 matches hand-computed normal equations on a tiny fixture") {
    // n=3: rows (x1,x2,y) = (1,0,1),(2,1,3),(3,1,4); lambda = 2
    val df = Seq((1L, 0L, 1L), (2L, 1L, 3L), (3L, 1L, 4L)).toDF("x1", "x2", "y")
    // moment sums: n=3 s1=6 s2=2 s11=14 s22=2 s12=5 sy=8 s1y=19 s2y=7
    // A = [[3,6,2],[6,16,5],[2,5,4]] (lambda on the slope diagonal)
    // det A = 3*(64-25) - 6*(24-10) + 2*(30-32) = 117 - 84 - 4 = 29
    // b0 = det[[8,6,2],[19,16,5],[7,5,4]]/29 = (8*39 - 6*41 + 2*(-17))/29 = 32/29
    // b1 = det[[3,8,2],[6,19,5],[2,7,4]]/29 = (3*41 - 8*14 + 2*4)/29 = 19/29
    // b2 = det[[3,6,8],[6,16,19],[2,5,7]]/29 = (3*17 - 6*4 + 8*(-2))/29 = 11/29
    val r = FitOps.ridgeFit2(df, "x1", "x2", "y", lambda = 2.0, roundTo = 8)
      .collect().head
    r.getDouble(1) shouldBe 32.0 / 29 +- 1e-8
    r.getDouble(2) shouldBe 19.0 / 29 +- 1e-8
    r.getDouble(3) shouldBe 11.0 / 29 +- 1e-8
    // r2 via the quadratic form (ridge beta, unpenalized moments):
    // syy=26, sse = 26 - 2*(b0*8+b1*19+b2*7) + (b'Mb) with
    // M=[[3,6,2],[6,14,5],[2,5,2]]
    val (b0, b1, b2) = (32.0 / 29, 19.0 / 29, 11.0 / 29)
    val btb = b0 * b0 * 3 + b1 * b1 * 14 + b2 * b2 * 2 +
      2 * b0 * b1 * 6 + 2 * b0 * b2 * 2 + 2 * b1 * b2 * 5
    val sse = 26 - 2 * (b0 * 8 + b1 * 19 + b2 * 7) + btb
    val sst = 26.0 - 8.0 * 8 / 3
    r.getDouble(4) shouldBe (1 - sse / sst) +- 1e-8
  }

  test("degenerate inputs yield nulls, not Inf/NaN: singular OLS and constant y") {
    // constant x1 AND lambda = 0 => singular normal equations
    val sing = Seq((5L, 1L, 2L), (5L, 2L, 3L), (5L, 3L, 4L)).toDF("x1", "x2", "y")
    val r1 = FitOps.ridgeFit2(sing, "x1", "x2", "y", lambda = 0.0).collect().head
    r1.isNullAt(1) shouldBe true
    r1.isNullAt(2) shouldBe true
    // constant y => zero total sum of squares => null r2 (betas exist)
    val flat = Seq((1L, 4L, 7L), (2L, 5L, 7L), (3L, 6L, 7L)).toDF("x1", "x2", "y")
    val r2r = FitOps.ridgeFit2(flat, "x1", "x2", "y", lambda = 1.0).collect().head
    r2r.isNullAt(4) shouldBe true
  }

  test("ridgeFit2By: per-group fits equal independent per-group ridgeFit2 runs") {
    val grouped = Seq(
      // group "a": y = 1 + 2*x1 + 0*x2; group "b": y = 5 + 0*x1 + 3*x2
      ("a", 1L, 9L, 3L), ("a", 2L, 1L, 5L), ("a", 3L, 4L, 7L), ("a", 5L, 2L, 11L),
      ("b", 4L, 1L, 8L), ("b", 2L, 2L, 11L), ("b", 7L, 3L, 14L), ("b", 1L, 5L, 20L))
      .toDF("g", "x1", "x2", "y")
    val by = FitOps.ridgeFit2By(grouped, Seq("g"), "x1", "x2", "y", lambda = 3.0)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    for (g <- Seq("a", "b")) {
      val solo = FitOps.ridgeFit2(grouped.filter(col("g") === g), "x1", "x2", "y", lambda = 3.0)
        .collect().head.toSeq
      by(g) shouldBe solo
    }
    by.keySet shouldBe Set("a", "b")
  }

  test("ridgeResiduals2: y = pred + resid, zero residuals on exact data, corpus not shuffled") {
    val withId = linear.withColumn("doc_id", monotonically_increasing_id())
    val scored = FitOps.ridgeResiduals2(withId, Seq("doc_id"), "x1", "x2", "y",
      lambda = 0.0, roundTo = 6)
    val rows = scored.collect()
    rows.length shouldBe 6
    rows.foreach { r =>
      r.getDouble(5) shouldBe 0.0 +- 1e-6 // resid ~ 0 on exact-linear data
      (r.getDouble(4) + r.getDouble(5)) shouldBe r.getLong(3).toDouble +- 1e-5
    }
    // the one-row fit rides a broadcast: no shuffle on the corpus side
    // beyond the fit aggregation itself
    val plan = scored.queryExecution.executedPlan.toString()
    plan should include("BroadcastNestedLoopJoin")
  }
}
