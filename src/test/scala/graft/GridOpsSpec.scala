package graft

import graft.dfw.GridOps

/** J3: the Lambda grid must enumerate combos in kron order — parameter
  * 0 slowest, last parameter fastest (`preprocess.py:489-497`).
  */
class GridOpsSpec extends SparkSpec {

  private val groups = Seq(Seq(0.1, 1.0), Seq(2.0), Seq(3.0, 4.0, 5.0))

  test("grid enumerates the cartesian product in kron order") {
    val rows = GridOps.grid(spark, groups).orderBy("combo_id").collect()
    rows.map(_.getLong(0)) shouldBe (0L until 6L).toArray
    val values = rows.map(r => Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    values shouldBe Seq(
      Seq(0.1, 2.0, 3.0), Seq(0.1, 2.0, 4.0), Seq(0.1, 2.0, 5.0),
      Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 4.0), Seq(1.0, 2.0, 5.0))
  }

  test("comboByIndex agrees with the materialized grid") {
    val rows = GridOps.grid(spark, groups).orderBy("combo_id").collect()
    rows.foreach { r =>
      GridOps.comboByIndex(groups, r.getLong(0)) shouldBe
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
  }

  test("combo count is the product of choice-list sizes (preprocess.py:513-517)") {
    for (a <- 1 to 3; b <- 1 to 3; c <- 1 to 3) {
      val gs = Seq(
        (1 to a).map(_.toDouble), (1 to b).map(_.toDouble), (1 to c).map(_.toDouble))
      GridOps.comboCount(gs) shouldBe (a.toLong * b * c)
    }
  }

  test("grid row count matches comboCount") {
    GridOps.grid(spark, Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).count() shouldBe 6
  }
}
