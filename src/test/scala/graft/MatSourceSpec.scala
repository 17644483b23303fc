package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.dfw.PreProcess
import graft.sources.Tables
import graft.sources.mat.MatV5

/** S1: the graft-mat DataSource V2 over the reference's MATLAB v5
  * layout — write a fixture with [[MatV5.write]], read it back through
  * `spark.read.format("graft-mat")`, and drive the full permutation
  * gather (J1/J2) from it.
  */
class MatSourceSpec extends SparkSpec {

  // class 0: 4 samples × 3 features; class 1: 3 samples × 3 features.
  // Feature value = cls*100 + sample*10 + featureIdx, so every cell of
  // the round-trip is checkable by formula.
  private def fixture: String = {
    val dir = Files.createTempDirectory("graft-mat").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "fixture.mat").getPath
    def xCell(cls: Int, n: Int) =
      MatV5.Matrix(n, 3, Array.tabulate(n * 3)(i => (cls * 100 + (i / 3) * 10 + i % 3).toDouble))
    // stored permutations are MATLAB 1-BASED: trial rows reorder the
    // class's samples; max == class size triggers J2 normalization
    val r0 = MatV5.Matrix(2, 4, Array(3, 1, 4, 2, /* trial 1 */ 4, 3, 2, 1).map(_.toDouble))
    val r1 = MatV5.Matrix(2, 3, Array(2, 3, 1, /* trial 1 */ 1, 3, 2).map(_.toDouble))
    MatV5.write(path, Seq(
      "x" -> Right(Seq(xCell(0, 4), xCell(1, 3))),
      "r" -> Right(Seq(r0, r1))))
    path
  }

  test("round-trips variables, classes, rows and values") {
    val df = spark.read.format("graft-mat").load(fixture)
    df.count() shouldBe (4 + 3) + (2 + 2)
    val x01 = df.filter(col("var") === "x" && col("cls") === 0 && col("row_idx") === 1)
      .select("vals").head().getSeq[Double](0)
    x01 shouldBe Seq(10.0, 11.0, 12.0)
    val x12 = df.filter(col("var") === "x" && col("cls") === 1 && col("row_idx") === 2)
      .select("vals").head().getSeq[Double](0)
    x12 shouldBe Seq(120.0, 121.0, 122.0)
    val r00 = df.filter(col("var") === "r" && col("cls") === 0 && col("row_idx") === 0)
      .select("vals").head().getSeq[Double](0)
    r00 shouldBe Seq(3.0, 1.0, 4.0, 2.0)
  }

  test("vars option restricts partitions; pruning drops the vals payload from the scan") {
    val onlyX = spark.read.format("graft-mat").option("vars", "x").load(fixture)
    onlyX.select("var").distinct().collect().map(_.getString(0)) shouldBe Array("x")

    val pruned = spark.read.format("graft-mat").load(fixture).select("var", "cls", "row_idx")
    val scan = pruned.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b.scan }
    scan should not be empty
    scan.get.readSchema().fieldNames should not contain "vals"
    pruned.count() shouldBe 11
  }

  test("J1/J2 gather from .mat: ranked order follows the stored 1-based permutation") {
    val path = fixture
    val pp = PreProcess.fromMat(spark, path)
    // trial 0, class 0: stored (3,1,4,2) is 1-based -> samples (2,0,3,1)
    val got = pp.ranked(0).filter(col("cls") === 0)
      .orderBy(col("rn")).select("sample_id").collect().map(_.getLong(0))
    got shouldBe Array(2L, 0L, 3L, 1L)
    // trial 1, class 1: stored (1,3,2) -> samples (0,2,1)
    val got1 = pp.ranked(1).filter(col("cls") === 1)
      .orderBy(col("rn")).select("sample_id").collect().map(_.getLong(0))
    got1 shouldBe Array(0L, 2L, 1L)
    // features ride along the gather intact
    val f = pp.ranked(0).filter(col("cls") === 0 && col("rn") === 1)
      .select("features").head().getSeq[Double](0)
    f shouldBe Seq(20.0, 21.0, 22.0) // sample 2 of class 0
  }

  test("var/cls filters prune cells at planning time and results stay correct") {
    val path = fixture
    val all = spark.read.format("graft-mat").load(path)
    val filtered = all.filter(col("var") === "x" && col("cls") === 1)
    // pruning is visible in the scan description...
    val scan = filtered.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    scan.description() should include("pushed=[")
    scan.description() should include("EqualTo(var,x)")
    // ...and in the partition count: 1 cell instead of 4
    scan.toBatch.planInputPartitions().length shouldBe 1
    // correctness identical to the unpruned read
    filtered.select("row_idx").collect().map(_.getInt(0)).sorted shouldBe Array(0, 1, 2)
  }

  test("Sinks.writeMat round-trips through the graft-mat source (read-write interop)") {
    import spark.implicits._
    val df = Seq(
      (0, 0L, Seq(1.0, 2.0)), (0, 1L, Seq(3.0, 4.0)),
      (1, 0L, Seq(9.0, 8.0))).toDF("cls", "sample_id", "features")
    val dir = Files.createTempDirectory("graft-mat-out").toFile
    dir.deleteOnExit()
    val out = new java.io.File(dir, "export.mat").getPath
    graft.sources.Sinks.writeMat(df, out)
    val back = Tables.matSamples(spark, out)
      .select("cls", "sample_id", "features").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSet
    back shouldBe Set(
      (0, 0L, Seq(1.0, 2.0)), (0, 1L, Seq(3.0, 4.0)), (1, 0L, Seq(9.0, 8.0)))
  }

  test("maxRowsPerPartition splits cells into row ranges without changing results") {
    val path = fixture
    val whole = spark.read.format("graft-mat").load(path)
      .select("var", "cls", "row_idx", "vals").collect().map(_.toString).sorted
    val split = spark.read.format("graft-mat")
      .option("maxRowsPerPartition", "2").load(path)
    val scan = split.queryExecution.executedPlan
      .collectFirst { case b: BatchScanExec => b.scan }.get
    // cells have 4,3 rows (x) and 2,2 rows (r): ceil-div by 2 = 2+2+1+1
    scan.toBatch.planInputPartitions().length shouldBe 6
    split.select("var", "cls", "row_idx", "vals").collect()
      .map(_.toString).sorted shouldBe whole
  }

  test("reads a foreign v5 file with packed small elements and integer payloads") {
    // hand-crafted with python struct (tools history) — exercises the
    // packed small-data-element tag format scipy emits for short names
    // and tiny payloads, plus int32/int16 widening; our own writer
    // never produces these, so round-trip tests alone would miss them
    val url = getClass.getResource("/graft-mat/small_elements.mat")
    url should not be null
    val df = spark.read.format("graft-mat").load(url.getPath)
    val r = df.filter(col("var") === "r").orderBy("row_idx")
      .select("vals").collect().map(_.getSeq[Double](0))
    r shouldBe Array(Seq(11.0, 21.0, 31.0), Seq(12.0, 22.0, 32.0)) // column-major payload
    val tiny = df.filter(col("var") === "tiny").select("vals").head().getSeq[Double](0)
    tiny shouldBe Seq(-7.0)
  }

  test("matPermutations applies 1-based normalization per (class, trial)") {
    val perms = Tables.matPermutations(spark, fixture)
    perms.agg(min(col("sample_id")), max(col("sample_id"))).head() match {
      case row => (row.getLong(0), row.getLong(1)) shouldBe (0L, 3L)
    }
    // class 1, trial 0: stored (2,3,1) -> (1,2,0), in stored positions
    val c1 = perms.filter(col("cls") === 1 && col("trial") === 0)
      .orderBy(col("pos")).select("sample_id").collect().map(_.getLong(0))
    c1 shouldBe Array(1L, 2L, 0L)
  }
}
