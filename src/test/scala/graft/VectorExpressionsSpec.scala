package graft

import org.apache.spark.sql.functions._

import graft.functions.{QuantizedDot, VectorFunctions}

/** The codegen'd quantized dot product must agree exactly with a
  * driver-side reimplementation, and its rounding must be
  * half-away-from-zero (matching `round()` in Spark SQL and DuckDB).
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def refDot(a: Seq[Float], b: Seq[Float], scale: Double): Long =
    a.zip(b).map { case (x, y) =>
      QuantizedDot.q(x * scale) * QuantizedDot.q(y * scale)
    }.sum

  test("q() rounds half away from zero") {
    QuantizedDot.q(2.5) shouldBe 3L
    QuantizedDot.q(-2.5) shouldBe -3L
    QuantizedDot.q(2.4) shouldBe 2L
    QuantizedDot.q(-2.4) shouldBe -2L
    QuantizedDot.q(0.0) shouldBe 0L
    // the +0.5-then-truncate trap: 0.49999999999999994 must round DOWN
    QuantizedDot.q(0.49999999999999994) shouldBe 0L
  }

  test("quantizedDot (interpreted + codegen) matches the driver-side reference") {
    val vecs = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(0.5f, -0.25f, 4.0f)),
      (Seq(0.001f, -0.0005f), Seq(1.0f, 1.0f)),
      (Seq.empty[Float], Seq.empty[Float]))
    val df = vecs.toDF("a", "b")
    val got = df.select(VectorFunctions.quantizedDot(col("a"), col("b")).as("d"))
      .as[Long].collect()
    got shouldBe vecs.map { case (a, b) => refDot(a, b, 1000.0) }.toArray
  }

  test("quantizedNorm2 is the self dot product") {
    val v = Seq(Tuple1(Seq(0.6f, -0.8f))).toDF("a")
    val got = v.select(VectorFunctions.quantizedNorm2(col("a")).as("n")).as[Long].head()
    got shouldBe (600L * 600L + 800L * 800L)
  }

  test("ARRAY<DOUBLE> inputs (the canonical features type) quantize correctly") {
    // before the element-type branch these silently read doubles with
    // getFloat and returned garbage
    val v = Seq(Tuple1(Seq(0.6, -0.8))).toDF("a")
    val norm = v.select(VectorFunctions.quantizedNorm2(col("a")).as("n")).as[Long].head()
    norm shouldBe (600L * 600L + 800L * 800L)
    val q = v.select(VectorFunctions.quantizeVec(col("a")).as("q"))
      .as[Seq[Long]].head()
    q shouldBe Seq(600L, -800L)
    // mixed float x double dot
    val m = Seq((Seq(1.0f, 2.0f), Seq(0.5, -0.25))).toDF("a", "b")
    m.select(VectorFunctions.quantizedDot(col("a"), col("b")).as("d")).as[Long].head() shouldBe
      (1000L * 500L + 2000L * -250L)
  }

  test("non-numeric-array inputs fail at analysis time, not silently") {
    val v = Seq(Tuple1(Seq("x", "y"))).toDF("a")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      v.select(VectorFunctions.quantizeVec(col("a"))).collect()
  }

  test("byteClassFingerprint: one-pass histogram matches a reference fold") {
    def ref(bytes: Array[Byte]): Long = {
      val counts = new Array[Long](8)
      bytes.foreach(b => counts((b & 0xff) % 8) += 1L)
      (0 until 8).map(b => (counts(b) % 128) << (8 * b)).reduce(_ | _)
    }
    val cases = Seq(
      Array.empty[Byte],
      "aaab".getBytes("UTF-8"),                 // classes 1×3, 2×1
      Array.fill(130)(8.toByte),                // class-0 count wraps: 130 % 128 = 2
      Array(0xff.toByte, 0x80.toByte, 0x07.toByte), // negative JVM bytes → unsigned classes 7,0,7
      Array.tabulate(1000)(i => (i * 31 + 7).toByte))
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("id", "blob")
    val got = df.select(col("id"),
        graft.functions.FingerprintFunctions.byteClassFingerprint(col("blob")).as("fp"))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    got shouldBe cases.map(ref).toArray
    // bit 63 never set (counts are mod 128)
    got.foreach(fp => (fp >>> 63) shouldBe 0L)
  }

  test("byteClassFingerprint requires BINARY input") {
    val v = Seq(Tuple1("text")).toDF("a")
    an[org.apache.spark.sql.AnalysisException] should be thrownBy
      v.select(graft.functions.FingerprintFunctions.byteClassFingerprint(col("a"))).collect()
  }
}
