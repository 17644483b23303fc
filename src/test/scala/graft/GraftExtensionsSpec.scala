package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.GraftExtensions

/** The injected optimizer rule must fuse nested quantize+dot into the
  * single-pass expression without changing results.
  */
class GraftExtensionsSpec extends SparkSpec {

  private lazy val extSpark: SparkSession = {
    // getOrCreate returns the suite-shared default session (extensions
    // ignored) unless the default is cleared; the new session shares
    // the SparkContext, and the shared default is restored after.
    val shared = spark
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master(shared.sparkContext.master)
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(GraftExtensions.install)
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    s
  }

  test("long_dot(quantize_vec, quantize_vec) is rewritten to quantized_dot") {
    import extSpark.implicits._
    // a non-foldable source so the optimizer can't collapse the whole
    // expression into a LocalRelation before we inspect the plan
    val df = extSpark.range(1)
      .select(
        expr("transform(sequence(1, 2), i -> CAST(i + id AS FLOAT))").as("a"),
        expr("transform(sequence(3, 4), i -> CAST(i + id AS FLOAT))").as("b"))
      .select(VectorFunctions.longDot(
        VectorFunctions.quantizeVec(col("a")), VectorFunctions.quantizeVec(col("b"))).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    optimized should include("quantized_dot")
    optimized should not include "long_dot"
    // id=0: a=[1,2], b=[3,4]
    df.as[Long].head() shouldBe (1000L * 3000L + 2000L * 4000L)
  }

  test("custom expressions are callable from pure SQL in an extended session") {
    val row = extSpark.sql(
      """SELECT quantized_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                     array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS qd,
        |       long_dot(quantize_vec(array(CAST(1.0 AS FLOAT))),
        |                quantize_vec(array(CAST(2.0 AS FLOAT)))) AS ld,
        |       quantized_dot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)), 10) AS scaled,
        |       pq_adc_dot(array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |                  array(array(CAST(10 AS BIGINT), CAST(20 AS BIGINT)),
        |                        array(CAST(30 AS BIGINT), CAST(40 AS BIGINT)))) AS adc
        |""".stripMargin).head()
    row.getLong(0) shouldBe (1000L * 3000L + 2000L * 4000L)
    row.getLong(1) shouldBe 1000L * 2000L
    row.getLong(2) shouldBe 10L * 10L
    row.getLong(3) shouldBe 20L + 30L // tbl[0][1] + tbl[1][0]
  }

  test("hoisted quantize columns are NOT un-hoisted (pattern must nest directly)") {
    import extSpark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .withColumn("qa", VectorFunctions.quantizeVec(col("a")))
      .withColumn("qb", VectorFunctions.quantizeVec(col("b")))
    // CollapseProject may inline the aliases and re-expose the nested
    // pattern — correctness must hold either way.
    val out = df.select(VectorFunctions.longDot(col("qa"), col("qb")).as("d"))
    out.as[Long].head() shouldBe (1000L * 3000L + 2000L * 4000L)
  }
}
