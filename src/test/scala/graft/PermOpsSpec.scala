package graft

import org.apache.spark.sql.functions._

import graft.dfw.PermOps

/** J1/J2: permutation gather and MATLAB index normalization. */
class PermOpsSpec extends SparkSpec {
  import spark.implicits._

  test("J1 gather reorders a class by the selected trial's permutation") {
    val samples = Seq(("c", 10L, "u"), ("c", 11L, "v"), ("c", 12L, "w"))
      .toDF("cls", "sample_id", "payload")
    // trial 0: identity; trial 1: reversed
    val perm = Seq(
      ("c", 0, 0L, 10L), ("c", 0, 1L, 11L), ("c", 0, 2L, 12L),
      ("c", 1, 0L, 12L), ("c", 1, 1L, 11L), ("c", 1, 2L, 10L))
      .toDF("cls", "trial", "pos", "sample_id")
    val got = PermOps.gather(samples, perm, Seq("cls"), "sample_id", trial = 1)
      .orderBy("pos").select("payload").as[String].collect()
    got shouldBe Array("w", "v", "u")
  }

  test("J1 gather is a bijection: every sample appears exactly once") {
    val n = 50
    val samples = (0 until n).map(i => ("c", i.toLong)).toDF("cls", "sample_id")
    val perm = (0 until n).map(i => ("c", 0, ((i * 7) % n).toLong, i.toLong))
      .toDF("cls", "trial", "pos", "sample_id")
    val got = PermOps.gather(samples, perm, Seq("cls"), "sample_id", trial = 0)
    got.count() shouldBe n
    got.select("pos").distinct().count() shouldBe n
  }

  test("J2 normalizeIndices shifts 1-based classes down, leaves 0-based alone") {
    // class "one" is 1-based (max == n == 3); class "zero" is 0-based (max == 2, n == 3)
    val df = Seq(
      ("one", 1L), ("one", 2L), ("one", 3L),
      ("zero", 0L), ("zero", 1L), ("zero", 2L)).toDF("cls", "pos_val")
    val got = PermOps.normalizeIndices(df, Seq("cls"), "pos_val")
      .groupBy("cls").agg(sort_array(collect_list("pos_val")).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    got("one") shouldBe Seq(0L, 1L, 2L)
    got("zero") shouldBe Seq(0L, 1L, 2L)
  }
}
