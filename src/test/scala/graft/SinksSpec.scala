package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** S6 write-side: layout guarantees of the partitioned/sized sinks. */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(
    ("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0)).toDF("cls", "id", "v")

  test("writePartitioned creates one directory per key and round-trips") {
    val dir = Files.createTempDirectory("sink-part").toString
    Sinks.writePartitioned(data, dir, Seq("cls"))
    new java.io.File(dir).list().count(_.startsWith("cls=")) shouldBe 2
    val back = spark.read.parquet(dir)
    back.count() shouldBe 3
    // partition filter prunes directories (partition column survives)
    back.filter(col("cls") === "a").count() shouldBe 2
  }

  test("writeSized bounds the file count") {
    val dir = Files.createTempDirectory("sink-sized").toString
    Sinks.writeSized(data, dir, numFiles = 1)
    new java.io.File(dir).list().count(_.endsWith(".parquet")) shouldBe 1
    spark.read.parquet(dir).count() shouldBe 3
  }

  test("writeClustered partitions by dir key and round-trips all rows") {
    val dir = Files.createTempDirectory("sink-clustered").toString
    Sinks.writeClustered(data, dir, partitionCols = Seq("cls"), keyCols = Seq("id"))
    spark.read.parquet(dir).select(sum("v")).as[Double].head() shouldBe 6.0
  }

}
