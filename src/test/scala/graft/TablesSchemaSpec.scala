package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Schema-drift defense (VERDICT r11 item 4): the driver regenerates
  * testdata between rounds and has shifted physical types before
  * (events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS)). `Tables.load`
  * must adapt the safe variants and fail with ONE precise message
  * naming the table/column on a real contract violation.
  */
class TablesSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tables-schema").toString

  test("load adapts a ts-family column stored as typed micros (current testdata)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    df.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
    df.count() should be > 0L
  }

  test("load fails fast naming table and column on a drifted type") {
    val dir = tmp()
    // events with ts drifted to string — not in the ts family
    Seq((1L, "2024-01-01 00:00:00", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.load(spark, dir, "events"))
    e.getMessage should include("events.parquet schema drift")
    e.getMessage should include("'ts'")
    e.getMessage should include("string")
  }

  test("load fails fast on a missing contract column") {
    val dir = tmp()
    Seq((1, "EUROPE-ISH")).toDF("r_regionkey", "r_label")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val e = intercept[IllegalStateException](Tables.load(spark, dir, "region"))
    e.getMessage should include("region.parquet schema drift")
    e.getMessage should include("'r_name'")
  }

  test("load tolerates extra columns and narrower int widths") {
    val dir = tmp()
    Seq((1, "EUROPE", "extra")).toDF("r_regionkey", "r_name", "r_comment")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Tables.load(spark, dir, "region").count() shouldBe 1L
  }

  test("legacy nanos-as-long ts columns are adapted back to timestamp") {
    val dir = tmp()
    // simulate a nanos vintage: ts scanned as raw long under nanosAsLong
    val nanos = 1704067200L * 1000000000L + 123456789L
    Seq((1L, nanos, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    df.schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
    // integer division to micros: sub-micro digits truncate, rest exact
    df.select(unix_micros(col("ts"))).as[Long].head() shouldBe nanos / 1000L
  }
}
