package graft

import graft.dfw.ExpectOps

class ExpectOpsSpec extends SparkSpec {
  import spark.implicits._

  private def asTuple(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).head

  test("expectNotNull counts nulls; pass iff zero") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("c")
    asTuple(ExpectOps.expectNotNull(df, "c")) shouldBe (("not_null(c)", 4L, 2L, 0))
    asTuple(ExpectOps.expectNotNull(Seq("x").toDF("c"), "c")) shouldBe (("not_null(c)", 1L, 0L, 1))
  }

  test("expectUnique counts rows beyond the first per key") {
    val df = Seq(1, 1, 1, 2, 3, 3).toDF("k")
    asTuple(ExpectOps.expectUnique(df, Seq("k"))) shouldBe (("unique(k)", 6L, 3L, 0))
  }

  test("expectInRange flags out-of-bounds, ignores nulls") {
    val df = Seq(Some(0.5), Some(2.0), None, Some(-1.0)).toDF("v")
    asTuple(ExpectOps.expectInRange(df, "v", 0.0, 1.0)) shouldBe
      (("in_range(v,0.0,1.0)", 4L, 2L, 0))
  }

  test("expectAccepted flags values outside the set") {
    val df = Seq("a", "b", "zz", "a").toDF("s")
    asTuple(ExpectOps.expectAccepted(df, "s", Seq("a", "b"))) shouldBe
      (("accepted(s)", 4L, 1L, 0))
  }

  test("expectRefIntegrity counts orphan child keys, null children exempt") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    asTuple(ExpectOps.expectRefIntegrity(child, "fk", parent, "pk")) shouldBe
      (("ref(fk->pk)", 3L, 1L, 0))
  }
}
