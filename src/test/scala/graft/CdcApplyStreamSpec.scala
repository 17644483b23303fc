package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.dfw.MergeOps
import graft.streaming.StreamOps

class CdcApplyStreamSpec extends SparkSpec {
  import spark.implicits._

  // (k, version, op, name, bal)
  private val batch1 = Seq(
    (1, 10L, "insert", "a", 1.0),
    (2, 11L, "insert", "b", 2.0),
    (3, 12L, "insert", "c", 3.0))
  private val batch2 = Seq(
    (2, 20L, "update", "b2", 2.5),
    (3, 25L, "delete", "c", 3.0),
    (4, 22L, "insert", "d", 4.0))
  private val batch3 = Seq(
    (3, 15L, "update", "zombie", 9.9), // BELOW the delete's version: stays dead
    (1, 30L, "update", "a2", 1.5))

  test("cdcApplyStream: snapshot converges to the one-shot batch merge, tombstones hold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Long, String, String, Double)]
    val changes = mem.toDF().toDF("k", "version", "op", "name", "bal")
    val root = Files.createTempDirectory("cdc_snap").toString
    val ckpt = Files.createTempDirectory("cdc_ckpt").toString

    val q = StreamOps.cdcApplyStream(changes, root, "k", "version", "op", ckpt)
    try {
      for (b <- Seq(batch1, batch2, batch3)) {
        mem.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = StreamOps.readSnapshot(spark, root, "version", "op").get
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))

    // batch twin: every change in ONE replay against an empty base
    val all = (batch1 ++ batch2 ++ batch3).toDF("k", "version", "op", "name", "bal")
    val empty = Seq.empty[(Int, String, Double)].toDF("k", "name", "bal")
    val want = MergeOps.applyChangesLww(empty, all, "k", "version", "op")
      .orderBy("k").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))

    got shouldBe want
    got.map(_._1) shouldBe Array(1, 2, 4) // 3 deleted, not resurrected by v15
    got(0) shouldBe ((1, "a2", 1.5))
  }

  test("crash-safety: _LATEST points at the previous snapshot until an epoch commits") {
    val root = Files.createTempDirectory("cdc_empty").toString
    StreamOps.readVersionedSnapshot(spark, root) shouldBe None
    StreamOps.readSnapshot(spark, root, "version", "op") shouldBe None
  }

  test("epoch replay: an already-committed epoch is skipped, never read-and-overwritten") {
    // simulates foreachBatch's at-least-once window: the epoch's
    // parquet + pointer committed but the streaming commit log didn't
    // record the batch, so restart re-delivers the same epoch id
    val root = Files.createTempDirectory("cdc_replay").toString
    val b1 = Seq((1, 10L, "insert", "a", 1.0)).toDF("k", "version", "op", "name", "bal")
    StreamOps.applyCdcEpoch(spark, b1, root, "k", "version", "op", epoch = 0L)
    val committed = StreamOps.readVersionedSnapshot(spark, root).get.collect()

    // replay with DIFFERENT content must be a no-op (the guard, not luck)
    val replay = Seq((9, 99L, "insert", "z", 9.0)).toDF("k", "version", "op", "name", "bal")
    StreamOps.applyCdcEpoch(spark, replay, root, "k", "version", "op", epoch = 0L)
    StreamOps.readVersionedSnapshot(spark, root).get.collect() shouldBe committed
    StreamOps.snapshotEpochs(root) shouldBe Seq(0L)

    // the next epoch still merges normally
    val b2 = Seq((2, 20L, "insert", "b", 2.0)).toDF("k", "version", "op", "name", "bal")
    StreamOps.applyCdcEpoch(spark, b2, root, "k", "version", "op", epoch = 1L)
    StreamOps.readSnapshot(spark, root, "version", "op").get
      .orderBy("k").collect().map(_.getInt(0)) shouldBe Array(1, 2)
    // no stray tmp pointer left behind
    Files.exists(java.nio.file.Paths.get(s"$root/_LATEST.tmp")) shouldBe false
  }

  test("time travel + vacuum: epochs list, as-of reads, retention keeps the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Long, String, String, Double)]
    val changes = mem.toDF().toDF("k", "version", "op", "name", "bal")
    val root = Files.createTempDirectory("cdc_tt").toString
    val ckpt = Files.createTempDirectory("cdc_tt_ck").toString
    val q = StreamOps.cdcApplyStream(changes, root, "k", "version", "op", ckpt)
    try {
      for (b <- Seq(batch1, batch2, batch3)) { mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val epochs = StreamOps.snapshotEpochs(root)
    epochs.length shouldBe 3

    // as-of the first epoch: only batch1 applied — key 3 still alive
    val atFirst = StreamOps.readVersionedSnapshotAt(spark, root, epochs.head).get
    graft.dfw.MergeOps.latestState(atFirst, "version", "op")
      .orderBy("k").collect().map(_.getInt(0)) shouldBe Array(1, 2, 3)
    // as-of beyond the last epoch: identical to the live snapshot
    StreamOps.readVersionedSnapshotAt(spark, root, Long.MaxValue).get
      .orderBy("k").collect() shouldBe
      StreamOps.readVersionedSnapshot(spark, root).get.orderBy("k").collect()
    // as-of before any commit: nothing
    StreamOps.readVersionedSnapshotAt(spark, root, epochs.head - 1) shouldBe None

    // vacuum to 1: old epochs gone, latest intact, early as-of now empty
    val dropped = StreamOps.vacuumSnapshots(root, keep = 1)
    dropped shouldBe epochs.dropRight(1)
    StreamOps.snapshotEpochs(root) shouldBe Seq(epochs.last)
    StreamOps.readVersionedSnapshotAt(spark, root, epochs.head) shouldBe None
    StreamOps.readSnapshot(spark, root, "version", "op").get.count() shouldBe 3
  }
}
