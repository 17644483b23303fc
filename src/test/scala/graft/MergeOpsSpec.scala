package graft

import org.apache.spark.sql.functions._
import graft.dfw.MergeOps

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1, "a", 10.0),
    (2, "b", 20.0),
    (3, "c", 30.0)
  ).toDF("k", "name", "bal")

  // (k, version, op, name, bal)
  private def changes = Seq(
    (2, 100L, "update", "b2", 21.0),
    (2, 200L, "update", "b3", 22.0), // later version wins over b2
    (3, 150L, "delete", "c", 30.0),  // removes key 3
    (4, 120L, "insert", "d", 40.0),  // new key
    (5, 110L, "insert", "e", 50.0),
    (5, 130L, "delete", "e", 50.0)   // inserted then deleted -> absent
  ).toDF("k", "version", "op", "name", "bal")

  test("applyChangesLww: latest change wins, deletes drop, base survives untouched keys") {
    val out = MergeOps.applyChangesLww(base, changes, "k", "version", "op")
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    out shouldBe Array(
      (1, "a", 10.0),  // no change
      (2, "b3", 22.0), // highest version
      (4, "d", 40.0))  // insert; 3 and 5 deleted
  }

  test("applyChangesLww: a change below a later delete does not resurrect the key") {
    val ch = Seq((1, 10L, "update", "a2", 11.0), (1, 20L, "delete", "a2", 11.0))
      .toDF("k", "version", "op", "name", "bal")
    val out = MergeOps.applyChangesLww(base, ch, "k", "version", "op")
      .orderBy("k").collect().map(_.getInt(0))
    out shouldBe Array(2, 3)
  }

  test("applyChangesLww: missing payload column in the feed fails fast") {
    val ch = Seq((1, 10L, "update")).toDF("k", "version", "op")
    an[IllegalArgumentException] should be thrownBy
      MergeOps.applyChangesLww(base, ch, "k", "version", "op")
  }

  test("scdHistory: validity intervals chain per key; delete closes but emits nothing") {
    val out = MergeOps.scdHistory(changes, "k", "version", "op")
      .select("k", "name", "valid_from", "valid_to", "is_current")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4)))
    out shouldBe Array(
      (2, "b2", 100L, 200L, 0), // closed by the later update
      (2, "b3", 200L, -1L, 1),  // open interval -> current
      (4, "d", 120L, -1L, 1),
      (5, "e", 110L, 130L, 0))  // closed by the delete; delete row absent
  }

  test("applyChangesLwwVersioned: incremental merge == one-shot merge for any batch split") {
    // the semilattice law cdcApplyStream relies on — includes an
    // out-of-order update below an already-applied delete
    val feed = Seq(
      (1, 10L, "insert", "a", 1.0), (1, 40L, "update", "a2", 1.1),
      (2, 11L, "insert", "b", 2.0), (2, 35L, "delete", "b", 2.0),
      (2, 20L, "update", "late", 9.9), // below the delete: must stay dead
      (3, 12L, "insert", "c", 3.0))
    def df(rows: Seq[(Int, Long, String, String, Double)]) =
      rows.toDF("k", "version", "op", "name", "bal")
    val empty = df(Nil)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(r =>
        (r.getInt(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getString(4))).toSeq

    val oneShot = MergeOps.applyChangesLwwVersioned(empty, df(feed), "k", "version", "op")
    for (cut <- 1 until feed.length) {
      val (b1, b2) = feed.splitAt(cut)
      val stepped = MergeOps.applyChangesLwwVersioned(
        MergeOps.applyChangesLwwVersioned(empty, df(b1), "k", "version", "op"),
        df(b2), "k", "version", "op")
      canon(stepped) shouldBe canon(oneShot)
    }
    // and the read view hides the tombstone
    MergeOps.latestState(oneShot, "version", "op")
      .orderBy("k").collect().map(_.getInt(0)) shouldBe Array(1, 3)
  }

  test("applyChangesLww plan: single hash aggregate, no Window, no join") {
    val plan = MergeOps.applyChangesLww(base, changes, "k", "version", "op")
      .queryExecution.executedPlan.toString
    plan should not include "Window"
    plan should not include "Join"
    // union + max_by resolves to an aggregate with a partial phase
    plan should include("Aggregate")
  }

  test("incremental refresh: merging split partials equals recomputing from all rows") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", i % 11, rng.nextInt(1000).toLong)
    }.toDF("g", "day", "vq")
    val keys = Seq("g", "day")
    val state = MergeOps.aggPartials(rows.filter(col("day") < 8), keys,
      Seq("sum_vq" -> col("vq")))
    val delta = MergeOps.aggPartials(rows.filter(col("day") >= 8), keys,
      Seq("sum_vq" -> col("vq")))
    val merged = MergeOps.mergePartials(state, delta, keys)
      .orderBy("g", "day").collect().toSeq
    val full = MergeOps.aggPartials(rows, keys, Seq("sum_vq" -> col("vq")))
      .orderBy("g", "day").collect().toSeq
    merged shouldBe full
  }

  test("mergePartials folds repeated deltas associatively (three-way split)") {
    val rows = (1 to 90).map(i => (s"k${i % 4}", i.toLong)).toDF("g", "vq")
    val parts = (0 to 2).map(p => MergeOps.aggPartials(
      rows.filter(pmod(col("vq"), lit(3)) === p), Seq("g"),
      Seq("s" -> col("vq"))))
    val folded = parts.reduce(MergeOps.mergePartials(_, _, Seq("g")))
      .orderBy("g").collect().toSeq
    val full = MergeOps.aggPartials(rows, Seq("g"), Seq("s" -> col("vq")))
      .orderBy("g").collect().toSeq
    folded shouldBe full
  }
}
