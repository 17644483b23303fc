package graft

import java.sql.Timestamp

import graft.dfw.AsofOps

/** As-of join semantics: most recent right payload at ts <= left ts,
  * inclusive at equal timestamps, null before any match.
  */
class AsofOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 100L, ts(0), "l0"),   // before any right row -> null
      (1L, 101L, ts(5), "l5"),   // matches right@5 (inclusive)
      (1L, 102L, ts(20), "l20"), // matches right@10 (latest <= 20)
      (2L, 103L, ts(9), "lx")    // other key: only right@1
    ).toDF("user_id", "event_id", "ts", "tag")
    val right = Seq(
      (1L, 1L, ts(5), 50.0),
      (1L, 2L, ts(10), 99.0),
      (2L, 3L, ts(1), 7.0)
    ).toDF("user_id", "event_id", "ts", "value")

    val got = AsofOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
      .select("event_id", "value_asof").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    got shouldBe Map(
      100L -> None, 101L -> Some(50.0), 102L -> Some(99.0), 103L -> Some(7.0))
  }

  test("equal right timestamps: greatest tiebreaker wins") {
    val left = Seq((1L, 10L, ts(6), "l")).toDF("user_id", "event_id", "ts", "tag")
    val right = Seq(
      (1L, 1L, ts(5), 1.0), (1L, 2L, ts(5), 2.0)) // same ts, ids 1 < 2
      .toDF("user_id", "event_id", "ts", "value")
    val got = AsofOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
      .select("value_asof").as[Double].head()
    got shouldBe 2.0
  }

  test("keeps every left row and all its columns") {
    val left = Seq((1L, 10L, ts(0), "payload")).toDF("user_id", "event_id", "ts", "tag")
    val right = Seq((9L, 1L, ts(0), 5.0)).toDF("user_id", "event_id", "ts", "value")
    val got = AsofOps.asofJoin(left, right, Seq("user_id"), "ts", "event_id", Seq("value"))
    got.count() shouldBe 1
    got.select("tag").as[String].head() shouldBe "payload"
  }

  test("pitFeatureJoin: a feature younger than the embargo is invisible; exactly embargo-old qualifies") {
    // label at minute 10; features at minutes 9 (too fresh for a
    // 60 s embargo... 10-9=60 s exactly → inclusive boundary: KEEPS)
    // and at minute 9:30 (30 s old → embargoed, invisible)
    val label = Seq((1L, 100L, ts(10), 0.0)).toDF("user_id", "event_id", "ts", "value")
    val feats = Seq(
      (1L, 1L, ts(9), 1.0),                                              // exactly 60 s old
      (1L, 2L, Timestamp.valueOf("2026-01-01 10:09:30"), 2.0))           // 30 s old
      .toDF("user_id", "event_id", "ts", "value")
    val got = AsofOps.pitFeatureJoin(label, feats, Seq("user_id"), "ts",
        "event_id", Seq("value"), embargoSeconds = 60L)
      .select("value_asof").as[Double].head()
    got shouldBe 1.0 // the fresher feature would leak; the embargo hides it
    // zero embargo degenerates to the plain as-of join (fresher wins)
    AsofOps.pitFeatureJoin(label, feats, Seq("user_id"), "ts",
        "event_id", Seq("value"), embargoSeconds = 0L)
      .select("value_asof").as[Double].head() shouldBe 2.0
  }
}
