package graft

import org.apache.spark.sql.functions._

import graft.dfw.AuditOps

/** Hand-computed fixtures for the pipeline audits: k-anonymity class
  * accounting, the join profile vs the actually-run join, Welch's t
  * against a closed-form replay, and snapshot-diff status classes —
  * including the null-sentinel case a naive concat fingerprint gets
  * wrong.
  */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymity counts classes and rows under each threshold") {
    // classes: (a)=1 row, (b)=2 rows, (c)=4 rows, (d)=7 rows → 14 rows
    val df = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(7)("d")).toDF("qi")
    val got = AuditOps.kAnonymity(df, Seq(col("qi")), Seq(2, 5))
      .orderBy("k").collect()
    got.map(_.getAs[Long]("classes_at_risk")).toSeq shouldBe Seq(1L, 3L)
    got.map(_.getAs[Long]("rows_at_risk")).toSeq shouldBe Seq(1L, 7L)
    got.map(_.getAs[Long]("n_classes")).toSeq shouldBe Seq(4L, 4L)
    got.head.getAs[Double]("risk_frac") shouldBe (1.0 / 14) +- 1e-6
  }

  test("joinProfile's est_out_rows equals the join actually run") {
    val l = Seq(1, 1, 1, 2, 3, 3, 5).toDF("k")   // key 5 left-only
    val r = Seq(1, 2, 2, 3, 4).toDF("k")          // key 4 right-only
    val p = AuditOps.joinProfile(l, "k", r, "k").head()
    p.getAs[Long]("left_rows") shouldBe 7L
    p.getAs[Long]("right_rows") shouldBe 5L
    p.getAs[Long]("keys_both") shouldBe 3L
    p.getAs[Long]("keys_left_only") shouldBe 1L
    p.getAs[Long]("keys_right_only") shouldBe 1L
    p.getAs[Long]("max_left_mult") shouldBe 3L
    p.getAs[Long]("max_right_mult") shouldBe 2L
    p.getAs[Long]("est_out_rows") shouldBe l.join(r, "k").count()
  }

  test("welchTTest replays the closed-form statistic") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)          // arm 0
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0)    // arm 1
    val df = (a.map((0, _)) ++ b.map((1, _))).toDF("arm", "v")
    val row = AuditOps.welchTTest(df, col("arm"), col("v")).head()
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def varS(xs: Seq[Double]) = {
      val m = mean(xs); xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val (se0, se1) = (varS(a) / a.size, varS(b) / b.size)
    val t = (mean(b) - mean(a)) / math.sqrt(se0 + se1)
    val dfree = math.pow(se0 + se1, 2) /
      (se0 * se0 / (a.size - 1) + se1 * se1 / (b.size - 1))
    row.getAs[Long]("n0") shouldBe 4L
    row.getAs[Long]("n1") shouldBe 5L
    row.getAs[Double]("t_stat") shouldBe t +- 1e-4
    row.getAs[Double]("welch_df") shouldBe dfree +- 1e-2
  }

  test("snapshotDiff classes added/removed/changed/unchanged") {
    val old = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v")
    val neu = Seq((2L, "y"), (3L, "Z"), (4L, "w")).toDF("k", "v")
    val got = AuditOps.snapshotDiff(old, neu, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got shouldBe Map("added" -> (1L, 4L), "removed" -> (1L, 1L),
      "changed" -> (1L, 3L), "unchanged" -> (1L, 2L))
  }

  test("blockJackknifeDiff replays the hand-computed jackknife variance") {
    // 3 blocks; arm 0 values by block: (2), (4), (6); arm 1: (5), (7), (12)
    val rows = Seq((0, 0, 2L), (1, 0, 4L), (2, 0, 6L),
      (0, 1, 5L), (1, 1, 7L), (2, 1, 12L))
    val df = rows.toDF("b", "arm", "x")
    val r = AuditOps.blockJackknifeDiff(df, col("arm"), col("x"), col("b")).head()
    r.getAs[Long]("n_blocks") shouldBe 3L
    r.getAs[Double]("mean_diff") shouldBe 4.0 +- 1e-9 // 24/3 - 12/3
    // replicates: drop b0 → 19/2-10/2=4.5; drop b1 → 17/2-8/2=4.5;
    // drop b2 → 12/2-6/2=3.0; θ̄=4, var = 2/3·((.5²+.5²+1²)) = 1
    r.getAs[Double]("se_jack") shouldBe 1.0 +- 1e-5
    r.getAs[Double]("z") shouldBe 4.0 +- 1e-3
  }

  test("giniConcentration: perfect equality reads 0, near-total concentration near 1") {
    val equal = Seq.fill(20)(5L).toDF("x")
    val g1 = AuditOps.giniConcentration(equal, col("x"), numParts = 4).head()
    g1.getAs[Long]("n") shouldBe 20L
    g1.getAs[Double]("gini") shouldBe 0.0
    g1.getAs[Double]("top10_share") shouldBe 0.1 +- 1e-9 // top 2 of 20 equal units

    // one unit holds everything: gini = (n-1)/n
    val skew = (Seq.fill(9)(0L) :+ 1000L).toDF("x")
    val g2 = AuditOps.giniConcentration(skew, col("x"), numParts = 4).head()
    g2.getAs[Double]("gini") shouldBe 0.9 +- 1e-9
    g2.getAs[Double]("top10_share") shouldBe 1.0
  }

  test("giniConcentration matches the per-row rank formula on a mixed fixture") {
    val vals = Seq(1L, 1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L)
    val df = vals.toDF("x").repartition(3)
    val got = AuditOps.giniConcentration(df, col("x"), numParts = 4).head()
    val sorted = vals.sorted
    val n = sorted.size
    val s = sorted.sum.toDouble
    val c = sorted.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum.toDouble
    got.getAs[Double]("gini") shouldBe ((2 * c - (n + 1) * s) / (n * s)) +- 1e-6
    // top decile = the single largest unit (55)
    got.getAs[Double]("top10_share") shouldBe (55.0 / s) +- 1e-6
  }

  test("benfordAudit: exact digit extraction and Benford expectations") {
    // leading digits by construction: 1.00→1, 19.99→1, 25.50→2, 999.99→9,
    // 0.07→7 (cents=7); zero and negative amounts drop
    val df = Seq(1.00, 19.99, 25.50, 999.99, 0.07, 0.0, -5.0).toDF("amt")
    val got = AuditOps.benfordAudit(df, col("amt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got.keySet shouldBe Set(1L, 2L, 7L, 9L)
    got(1L)._1 shouldBe 2L
    got(1L)._2 shouldBe 400000L // 2 of 5
    got(1L)._3 shouldBe math.round(math.log10(2.0) * 1e6) // 301030
    got(9L)._3 shouldBe math.round(math.log10(10.0 / 9) * 1e6)
  }

  test("snapshotDiff: null-shifted columns are 'changed', not a fingerprint collision") {
    // (null,"x") vs ("x",null) — concat_ws without sentinels would
    // fingerprint both as "x" and report unchanged
    val old = Seq((1L, Option.empty[String], Option("x"))).toDF("k", "a", "b")
    val neu = Seq((1L, Option("x"), Option.empty[String])).toDF("k", "a", "b")
    AuditOps.snapshotDiff(old, neu, "k", Seq("a", "b"))
      .head().getString(0) shouldBe "changed"
  }

  test("cupedAdjust: pooled theta shrinks the arm gap; hand-computed exact values") {
    // pooled: n=4 sx=10 sy=26 sxy=77 sxx=30 syy=198 →
    // dxx=20 dxy=48 dyy=116, θ=2.4, ρ²=2304/2320
    val units = Seq((0, 1L, 3L), (0, 2L, 5L), (1, 3L, 8L), (1, 4L, 10L))
      .toDF("variant", "x", "y")
    val got = AuditOps.cupedAdjust(units, col("variant"), col("x"), col("y"))
      .collect()
    got.length shouldBe 2
    val v0 = got(0); val v1 = got(1)
    v0.getAs[Double]("mean_pre") shouldBe 1.5
    v0.getAs[Double]("mean_y") shouldBe 4.0
    v0.getAs[Double]("mean_y_adj") shouldBe 6.4 // 4 − 2.4·(1.5 − 2.5)
    v1.getAs[Double]("mean_y_adj") shouldBe 6.6 // 9 − 2.4·(3.5 − 2.5)
    v0.getAs[Double]("theta") shouldBe 2.4
    v0.getAs[Double]("rho2") shouldBe math.rint(2304.0 / 2320.0 * 1e6) / 1e6
    // CUPED pulled the raw gap of 5 down to 0.2
    (v1.getAs[Double]("mean_y_adj") - v0.getAs[Double]("mean_y_adj"))
      .abs should be < 0.2001
  }

  test("cupedAdjust: constant pre-period covariate degrades to a no-op (theta 0)") {
    val units = Seq((0, 2L, 3L), (0, 2L, 5L), (1, 2L, 8L)).toDF("variant", "x", "y")
    val got = AuditOps.cupedAdjust(units, col("variant"), col("x"), col("y"))
      .collect()
    got(0).getAs[Double]("theta") shouldBe 0.0
    got(0).getAs[Double]("mean_y_adj") shouldBe got(0).getAs[Double]("mean_y")
    got(1).getAs[Double]("mean_y_adj") shouldBe 8.0
  }

  test("calibrationAudit: hand-computed bins, ECE and Brier") {
    val rows = Seq((0.1, 0L), (0.15, 0L), (0.9, 1L), (0.85, 0L)).toDF("s", "y")
    val got = AuditOps.calibrationAudit(rows, col("s"), col("y"), nb = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    got.keySet shouldBe Set(1L, 8L, 9L)
    got(1L) shouldBe ((2L, 0L, 125000L, 0L, 300000L, 191250L))
    got(9L) shouldBe ((1L, 1L, 900000L, 1000000L, 300000L, 191250L))
    // bucket 8: score .85, label 0 → pure miscalibration contribution
    got(8L)._3 shouldBe 850000L
    got(8L)._4 shouldBe 0L
  }

  test("calibrationAudit: perfectly calibrated constant predictor has ECE 0") {
    // score 0.5 everywhere, half the labels positive
    val rows = Seq((0.5, 1L), (0.5, 0L), (0.5, 1L), (0.5, 0L)).toDF("s", "y")
    val got = AuditOps.calibrationAudit(rows, col("s"), col("y"), nb = 10).collect()
    got.length shouldBe 1
    got(0).getAs[Long]("ece_ppm") shouldBe 0L
    got(0).getAs[Long]("brier_ppm") shouldBe 250000L // (0.5)^2 everywhere
  }

  test("cohenKappa: hand-computed chance-corrected agreement") {
    // n=4, agree=3, po=.75; marginals a:3/b:1 vs a:2/b:2 → pe=.5 → κ=.5
    val rows = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("a", "b")).toDF("r1", "r2")
    val got = AuditOps.cohenKappa(rows, col("r1"), col("r2")).collect()(0)
    got.getAs[Long]("n") shouldBe 4L
    got.getAs[Long]("n_agree") shouldBe 3L
    got.getAs[Double]("po") shouldBe 0.75
    got.getAs[Double]("pe") shouldBe 0.5
    got.getAs[Double]("kappa") shouldBe 0.5
  }

  test("cohenKappa: a constant rater pair has pe 1 and undefined kappa") {
    val rows = Seq(("a", "a"), ("a", "a")).toDF("r1", "r2")
    val got = AuditOps.cohenKappa(rows, col("r1"), col("r2")).collect()(0)
    got.getAs[Double]("pe") shouldBe 1.0
    got.isNullAt(got.fieldIndex("kappa")) shouldBe true
  }

  test("pairwiseZTests: hand-computed z on separated arms; flag obeys zCrit") {
    // arm 0: {1,2,3} (m=2, v=1); arm 1: {11,12,13} (m=12, v=1);
    // arm 2: {2,3,4} (m=3, v=1) — z(0,1) huge, z(0,2) small
    val units = Seq((0, 1L), (0, 2L), (0, 3L), (1, 11L), (1, 12L), (1, 13L),
      (2, 2L), (2, 3L), (2, 4L)).toDF("variant", "x")
    val got = AuditOps.pairwiseZTests(units, col("variant"), col("x"), zCrit = 2.6383)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getAs[Double]("z"), r.getAs[Boolean]("significant")))).toMap
    got.keySet shouldBe Set((0, 1), (0, 2), (1, 2))
    // z = 10 / sqrt(1/3 + 1/3) = 12.2474
    got((0, 1))._1 shouldBe 12.2474
    got((0, 1))._2 shouldBe true
    got((0, 2))._1 shouldBe 1.2247 // 1 / sqrt(2/3)
    got((0, 2))._2 shouldBe false
  }

  test("corrMatrix: perfect, inverse and constant columns") {
    val rows = Seq((1L, 2L, 5L, 7L), (2L, 4L, 4L, 7L), (3L, 6L, 3L, 7L))
      .toDF("a", "b", "c", "k")
    val got = AuditOps.corrMatrix(rows, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("r"))).toMap
    got.size shouldBe 6
    got(("a", "b")) shouldBe Some(1.0)  // b = 2a
    got(("a", "c")) shouldBe Some(-1.0) // c = 6 − a
    got(("a", "k")) shouldBe None       // constant column: undefined
  }

  test("profileDiff: per-column counts, nulls, distincts and bounds across versions") {
    val old = Seq((Some(1L), Some(10.0)), (Some(2L), Some(20.0)), (Some(2L), None))
      .toDF("k", "v")
    val neu = Seq((Some(1L), Some(10.0)), (Some(3L), Some(99.0)))
      .toDF("k", "v")
    val got = AuditOps.profileDiff(old, neu, Seq("k", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("k")
    (k.getLong(1), k.getLong(2)) shouldBe ((3L, 2L))       // n_old, n_new
    (k.getLong(3), k.getLong(4)) shouldBe ((0L, 0L))       // nulls
    (k.getLong(5), k.getLong(6)) shouldBe ((2L, 2L))       // distinct
    (k.getDouble(7), k.getDouble(10)) shouldBe ((1.0, 3.0)) // min_old, max_new
    val v = got("v")
    (v.getLong(3), v.getLong(4)) shouldBe ((1L, 0L))       // the null dropped out
    (v.getDouble(9), v.getDouble(10)) shouldBe ((20.0, 99.0)) // max_old, max_new
  }

  test("poissonBootstrapMean: CI brackets the mean, se near sd/sqrt(n), deterministic") {
    val df = (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("k", "x")
    val r = AuditOps.poissonBootstrapMean(df, col("k"), col("x"), reps = 60).head()
    r.getAs[Long]("n") shouldBe 1000L
    r.getAs[Long]("reps_used") shouldBe 60L
    r.getAs[Double]("mean") shouldBe 500.5 +- 1e-9
    r.getAs[Double]("ci_lo") should be < 500.5
    r.getAs[Double]("ci_hi") should be > 500.5
    // sd = 288.8, n = 1000 → analytic se ≈ 9.13; bootstrap in that band
    r.getAs[Double]("se_boot") shouldBe 9.13 +- 4.0
    // md5-driven weights: a rerun reproduces every bit
    val again = AuditOps.poissonBootstrapMean(df, col("k"), col("x"), reps = 60).head()
    again.toSeq shouldBe r.toSeq
  }

  test("poissonBootstrapRatio: constant per-unit ratio collapses the CI to a point") {
    // every unit contributes num=1, den=2 — any weighting gives 0.5
    val df = (1 to 300).map(i => (i.toLong, 1L, 2L)).toDF("k", "num", "den")
    val r = AuditOps.poissonBootstrapRatio(df, col("k"), col("num"), col("den"),
      reps = 50).head()
    r.getAs[Double]("ratio") shouldBe 0.5
    r.getAs[Double]("ci_lo") shouldBe 0.5
    r.getAs[Double]("ci_hi") shouldBe 0.5
    r.getAs[Double]("se_boot") shouldBe 0.0
  }

  test("poissonBootstrapRatio: heterogeneous units give a bracketing CI, bit-deterministic") {
    val df = (1 to 500).map(i => (i.toLong, (i % 3).toLong, 2L)).toDF("k", "num", "den")
    val r = AuditOps.poissonBootstrapRatio(df, col("k"), col("num"), col("den"),
      reps = 60).head()
    val ratio = r.getAs[Double]("ratio") // ≈ (Σ i%3)/(2·500) ≈ 0.4995…
    r.getAs[Double]("ci_lo") should be < ratio
    r.getAs[Double]("ci_hi") should be > ratio
    val again = AuditOps.poissonBootstrapRatio(df, col("k"), col("num"),
      col("den"), reps = 60).head()
    again.toSeq shouldBe r.toSeq
  }

  test("poissonBootstrapDiff: separated arms bracket the true difference, bit-deterministic") {
    val df = (1 to 400).map(i => (i.toLong, i % 2 == 0,
      if (i % 2 == 0) 10.0 + (i % 5) else 0.0 + (i % 5))).toDF("k", "a", "x")
    val r = AuditOps.poissonBootstrapDiff(df, col("k"), col("a"), col("x"),
      reps = 60).head()
    (r.getAs[Long]("n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) shouldBe
      ((400L, 200L, 200L))
    r.getAs[Long]("reps_used") shouldBe 60L
    r.getAs[Double]("diff") shouldBe 10.0 +- 1e-9
    r.getAs[Double]("ci_lo") should be < 10.0
    r.getAs[Double]("ci_hi") should be > 10.0
    val again = AuditOps.poissonBootstrapDiff(df, col("k"), col("a"), col("x"),
      reps = 60).head()
    again.toSeq shouldBe r.toSeq
  }

  test("poissonBootstrapDiff: one empty arm still returns the single documented row") {
    // every unit is arm A → every replicate fails __swb>0 → ci is
    // empty; the contract is one row with counts populated and null
    // CI columns, not zero rows
    val df = (1 to 50).map(i => (i.toLong, true, i.toDouble)).toDF("k", "a", "x")
    val out = AuditOps.poissonBootstrapDiff(df, col("k"), col("a"), col("x"),
      reps = 40).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getAs[Long]("n"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) shouldBe
      ((50L, 50L, 0L))
    r.getAs[Long]("reps_used") shouldBe 0L
    r.getAs[Double]("mean_a") shouldBe 25.5 +- 1e-9
    for (c <- Seq("mean_b", "diff", "se_boot", "ci_lo", "ci_hi"))
      r.isNullAt(r.fieldIndex(c)) shouldBe true
  }

  test("poissonBootstrapRatio: all-zero denominator still returns the single documented row") {
    val df = (1 to 50).map(i => (i.toLong, 1L, 0L)).toDF("k", "num", "den")
    val out = AuditOps.poissonBootstrapRatio(df, col("k"), col("num"),
      col("den"), reps = 40).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("n") shouldBe 50L
    r.getAs[Long]("reps_used") shouldBe 0L
    for (c <- Seq("ratio", "se_boot", "ci_lo", "ci_hi"))
      r.isNullAt(r.fieldIndex(c)) shouldBe true
  }

  test("poissonBootstrapMean: empty input still returns the single documented row") {
    val df = Seq.empty[(Long, Double)].toDF("k", "x")
    val out = AuditOps.poissonBootstrapMean(df, col("k"), col("x"),
      reps = 40).collect()
    out.length shouldBe 1
    val r = out.head
    r.getAs[Long]("n") shouldBe 0L
    r.getAs[Long]("reps_used") shouldBe 0L
    for (c <- Seq("mean", "se_boot", "ci_lo", "ci_hi"))
      r.isNullAt(r.fieldIndex(c)) shouldBe true
  }

  test("bhAdjust: hand-computed step-up adjustments and rejections") {
    val tests = Seq(("t1", 0.01), ("t2", 0.04), ("t3", 0.03), ("t4", 0.5))
      .toDF("id", "p")
    val got = AuditOps.bhAdjust(tests, col("p"), Seq(col("id")), alpha = 0.05)
      .select("id", "p_rank", "p_adj", "reject")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    // sorted p: .01 .03 .04 .5 → padj: .04, min(.06,.0533)=.053333,
    // .053333, .5 — only the first rejects at α=.05
    got shouldBe Seq(("t1", 1L, 0.04, true), ("t3", 2L, 0.053333, false),
      ("t2", 3L, 0.053333, false), ("t4", 4L, 0.5, false))
  }

  test("bhAdjust: all-null-effect p-values survive (nothing rejected, padj capped at 1)") {
    val tests = Seq(("a", 0.9), ("b", 0.8), ("c", 0.95)).toDF("id", "p")
    val got = AuditOps.bhAdjust(tests, col("p"), Seq(col("id")), alpha = 0.05)
      .select("p_adj", "reject").as[(Double, Boolean)].collect()
    got.map(_._2).toSet shouldBe Set(false)
    // step-up: every min_{j≥i} lands on the top rank's 0.95·3/3
    got.map(_._1).toSet shouldBe Set(0.95)
  }

  test("minDetectableEffect: hand-computed MDE on a 0/2 alternating metric") {
    // n=100, mean 1, var = (100·200 − 100²)/9900 → sd 1.00504;
    // per-arm 50 → mde = 2.8016 · sd · √(2/50) ≈ 0.563145
    val df = (1 to 100).map(i => ("g", (i % 2) * 2L)).toDF("grp", "x")
    val r = AuditOps.minDetectableEffect(df, col("grp"), col("x")).head()
    r.getAs[Long]("n") shouldBe 100L
    r.getAs[Long]("n_per_arm") shouldBe 50L
    r.getAs[Double]("mean") shouldBe 1.0
    r.getAs[Double]("mde_abs") shouldBe 0.563145 +- 1e-4
    r.getAs[Long]("mde_rel_ppm") shouldBe 563145L +- 200L
  }

  test("minDetectableEffect: singleton group has no sd/mde (never NaN)") {
    val df = Seq(("g", 5L)).toDF("grp", "x")
    val r = AuditOps.minDetectableEffect(df, col("grp"), col("x")).head()
    r.isNullAt(r.fieldIndex("sd")) shouldBe true
    r.isNullAt(r.fieldIndex("mde_abs")) shouldBe true
  }

  test("sampleRatioCheck: balanced split passes, 90/10 vs 50/50 alarms") {
    val balanced = (1 to 100).map(i => i % 2 == 0).toDF("a")
    val ok = AuditOps.sampleRatioCheck(balanced, col("a"), 500000L).head()
    ok.getAs[Double]("chi2") shouldBe 0.0
    ok.getAs[Boolean]("srm") shouldBe false
    val skewed = (Seq.fill(90)(true) ++ Seq.fill(10)(false)).toDF("a")
    val bad = AuditOps.sampleRatioCheck(skewed, col("a"), 500000L).head()
    // chi2 = 40²/50 + 40²/50 = 64
    bad.getAs[Double]("chi2") shouldBe 64.0
    bad.getAs[Boolean]("srm") shouldBe true
  }

  test("msprtDiff: separated arms cross the boundary and stay crossed; null effect never does") {
    import java.sql.Timestamp
    def ev(day: Int, a: Boolean, v: Double) =
      (Timestamp.valueOf(f"2026-01-$day%02d 10:00:00"), a, v)
    // arms separated by ~10 with unit-ish noise: evidence accumulates
    val sep = (1 to 10).flatMap { d =>
      (0 until 20).map(i => ev(d, a = true, 10.0 + (i % 3))) ++
        (0 until 20).map(i => ev(d, a = false, 0.0 + (i % 3)))
    }.toDF("ts", "a", "v")
    val rSep = AuditOps.msprtDiff(sep, col("ts"), col("a"), col("v"), tau2 = 1.0)
      .collect()
    rSep.length shouldBe 10
    val flags = rSep.map(_.getAs[Boolean]("significant")).toSeq
    flags.last shouldBe true
    // monotone in evidence on this fixture: once crossed, stays crossed
    flags.dropWhile(!_).forall(identity) shouldBe true
    // theta ≈ 10 on every day
    all(rSep.map(_.getAs[Double]("theta"))) shouldBe 10.0 +- 1e-6

    // same distribution in both arms: never significant
    val nul = (1 to 10).flatMap { d =>
      (0 until 20).map(i => ev(d, a = i % 2 == 0, (i % 5).toDouble))
    }.toDF("ts", "a", "v")
    val rNul = AuditOps.msprtDiff(nul, col("ts"), col("a"), col("v"), tau2 = 1.0)
      .collect()
    rNul.map(_.getAs[Boolean]("significant")).forall(_ == false) shouldBe true

    // degenerate day-1 guard: one arm only → null verdict columns
    val oneArm = Seq(ev(1, a = true, 5.0), ev(1, a = true, 6.0)).toDF("ts", "a", "v")
    val r1 = AuditOps.msprtDiff(oneArm, col("ts"), col("a"), col("v"), tau2 = 1.0).head()
    r1.isNullAt(r1.fieldIndex("log_lr")) shouldBe true
    r1.isNullAt(r1.fieldIndex("significant")) shouldBe true
  }

  test("msprtDiff: verdict is sticky when log Λ later falls back below the boundary") {
    import java.sql.Timestamp
    def ev(day: Int, a: Boolean, v: Double) =
      (Timestamp.valueOf(f"2026-01-$day%02d 10:00:00"), a, v)
    // days 1-3: strongly separated arms — log Λ crosses ln(1/α);
    // days 4-10: a flood of null-effect rows drags the cumulative θ̂
    // toward 0, so the per-day log Λ martingale falls BACK below the
    // boundary. The always-valid decision already rejected — the flag
    // must stay true (running-max semantics), not track the dip.
    val rows = (1 to 3).flatMap { d =>
      (0 until 20).map(i => ev(d, a = true, 10.0 + (i % 3))) ++
        (0 until 20).map(i => ev(d, a = false, 0.0 + (i % 3)))
    } ++ (4 to 10).flatMap { d =>
      (0 until 2000).map(i => ev(d, a = i % 2 == 0, (i % 7).toDouble))
    }
    val r = AuditOps.msprtDiff(rows.toDF("ts", "a", "v"),
      col("ts"), col("a"), col("v"), tau2 = 1.0).collect()
    r.length shouldBe 10
    val llr = r.map(x => Option(x.getAs[java.lang.Double]("log_lr")).map(_.doubleValue))
    val flags = r.map(_.getAs[Boolean]("significant")).toSeq
    val thresh = math.log(1.0 / 0.05)
    // precondition the fixture must satisfy to test anything: crossed
    // early, per-day log Λ dips back under the boundary later
    llr(2).get should be > thresh
    llr.last.get should be < thresh
    flags(2) shouldBe true
    // sticky: every day after the first crossing stays significant
    flags.dropWhile(!_).forall(identity) shouldBe true
    flags.last shouldBe true
  }

  test("partitionSkew: max/avg on the integer grid, heaviest key ties break low") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(10)("b") ++ Seq.fill(5)("c"))
      .toDF("k")
    val r = AuditOps.partitionSkew(df, col("k")).head()
    (r.getAs[Long]("n_keys"), r.getAs[Long]("total_rows")) shouldBe ((3L, 20L))
    (r.getAs[Long]("min_rows"), r.getAs[Long]("max_rows")) shouldBe ((5L, 10L))
    r.getAs[Long]("skew_ppm") shouldBe 1500000L // 10·3·1e6/20
    r.getAs[String]("heaviest_key") shouldBe "b"
  }
}
