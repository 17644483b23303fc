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

  test("writeBucketed: same-bucketed tables join with no exchange on either side") {
    val l = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
    Sinks.writeBucketed(l, "li_bucketed", buckets = 4, keyCols = Seq("l_orderkey"))
    Sinks.writeBucketed(o, "o_bucketed", buckets = 4, keyCols = Seq("o_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      plan should include("SortMergeJoin")
      plan should not include "Exchange" // bucketing satisfies the join distribution
      joined.count() shouldBe l.count()  // every lineitem matches its order
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("writeClustered partitions by dir key and round-trips all rows") {
    val dir = Files.createTempDirectory("sink-clustered").toString
    Sinks.writeClustered(data, dir, partitionCols = Seq("cls"), keyCols = Seq("id"))
    spark.read.parquet(dir).select(sum("v")).as[Double].head() shouldBe 6.0
  }

  test("writeJsonl/loadJsonl round-trip a corpus, bounded file count, gzip variant") {
    import org.apache.spark.sql.types._
    val docs = Seq((1L, "alpha beta", "en"), (2L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    for (gz <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"sink-jsonl-$gz").toString + "/out"
      Sinks.writeJsonl(docs, dir, numFiles = 2, gzip = gz)
      val back = graft.sources.Tables.loadJsonl(spark, dir, schema).cache()
      back.filter(col("_corrupt_record").isNotNull).count() shouldBe 0L
      back.select("doc_id", "text", "lang").exceptAll(docs).count() shouldBe 0L
      docs.exceptAll(back.select("doc_id", "text", "lang")).count() shouldBe 0L
      back.unpersist()
    }
  }

  test("loadJsonl quarantines malformed lines in _corrupt_record instead of failing") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl-corrupt")
    Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "good line"}
        |this is not json at all
        |{"doc_id": 3, "text": "also good"}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val got = graft.sources.Tables.loadJsonl(spark, dir.toString, schema).cache()
    got.count() shouldBe 3L
    got.filter(col("_corrupt_record").isNotNull).count() shouldBe 1L
    got.filter(col("_corrupt_record").isNull)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 3L)
    got.unpersist()
  }
}
