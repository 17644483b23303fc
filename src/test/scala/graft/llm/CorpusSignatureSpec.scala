package graft.llm

import java.nio.file.Files

import graft.SparkSpec

/** Pins VERDICT r6 item 5: the index staleness check never scans the
  * corpus. [[IndexStore.corpusSignature]] on a file-backed DataFrame
  * is pure filesystem metadata — ZERO Spark jobs — so a warm
  * IVF/PQ index load costs a listStatus, not a count() (a full scan
  * on a 100 TB non-parquet source). In-memory frames keep the count
  * fallback, and the signature moves when files are appended.
  */
class CorpusSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, Seq.tabulate(4)(j => (i * 4 + j).toFloat / 10)))
      .toDF("vec_id", "embedding")

  test("file-backed signature launches zero Spark jobs and changes on append") {
    val dir = Files.createTempDirectory("corpus-sig-spec").resolve("c").toString
    corpus(20).write.parquet(dir)
    val df = spark.read.parquet(dir) // schema inference outside the window

    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val sig = try {
      val s = IndexStore.corpusSignature(df)
      // listener events post asynchronously; bounded drain so a late
      // job event cannot sneak past the assertion
      var waited = 0
      while (jobs == 0 && waited < 1000) { Thread.sleep(50); waited += 50 }
      s
    } finally spark.sparkContext.removeSparkListener(listener)
    jobs shouldBe 0
    sig should startWith("files:")

    // append → file set changes → signature changes (drift detected)
    corpus(1).write.mode("append").parquet(dir)
    IndexStore.corpusSignature(spark.read.parquet(dir)) should not be sig
  }

  test("non-file-backed frames fall back to a row count") {
    IndexStore.corpusSignature(corpus(7)) should startWith("count:7")
  }

  test("transformed corpus over the same files gets its own signature (ADVICE r7)") {
    val dir = Files.createTempDirectory("corpus-sig-plan").resolve("c").toString
    corpus(20).write.parquet(dir)
    val bare = IndexStore.corpusSignature(spark.read.parquet(dir))
    val filtered = IndexStore.corpusSignature(
      spark.read.parquet(dir).filter($"vec_id" < 10))
    val projected = IndexStore.corpusSignature(
      spark.read.parquet(dir).select($"vec_id"))
    // a filter or projection changes the corpus-defining query even
    // though the files are identical — the index must NOT be reused
    bare should not be filtered
    bare should not be projected
    filtered should not be projected
    // deterministic: re-deriving the same query yields the same
    // signature (reuse still works for an unchanged transformed corpus)
    IndexStore.corpusSignature(
      spark.read.parquet(dir).filter($"vec_id" < 10)) shouldBe filtered
    // aliasing alone is still a bare scan — plan-free, equal to bare
    IndexStore.corpusSignature(spark.read.parquet(dir).alias("c")) shouldBe bare
  }

  test("wide plans beyond maxToStringFields still get distinct signatures") {
    // plan STRINGS truncate field lists at spark.sql.debug
    // .maxToStringFields (25) — the signature hashes full expression
    // trees instead, so two wide projections differing only past the
    // cutoff must not collide into one reusable index signature
    import org.apache.spark.sql.functions.{col, lit}
    val dir = Files.createTempDirectory("corpus-sig-wide").resolve("c").toString
    (0 until 5).map(i => (i.toLong, i.toString)).toDF("id", "v")
      .select(Seq(col("id"), col("v")) ++ (0 until 40).map(j => lit(j).as(s"c$j")): _*)
      .write.parquet(dir)
    val base = spark.read.parquet(dir)
    val wideA = base.select(col("id") +: (0 until 40).map(j => col(s"c$j")): _*)
    val wideB = base.select(col("id") +: (0 until 39).map(j => col(s"c$j")) :+ col("v"): _*)
    IndexStore.corpusSignature(wideA) should not be IndexStore.corpusSignature(wideB)
  }

  test("non-expression plan fields (join type, sample params) reach the signature (ADVICE r8)") {
    // the pre-round-9 digest hashed only node.expressions, so two
    // corpus-defining queries differing in a non-expression field —
    // inner vs left_anti join on the same condition, or two sample
    // fractions — collided into one signature and silently shared a
    // persisted index
    val base = Files.createTempDirectory("corpus-sig-args")
    val dirA = base.resolve("a").toString
    val dirB = base.resolve("b").toString
    corpus(20).write.parquet(dirA)
    corpus(5).write.parquet(dirB)
    val a = spark.read.parquet(dirA)
    val b = spark.read.parquet(dirB).select($"vec_id")
    val inner = IndexStore.corpusSignature(a.join(b, Seq("vec_id"), "inner"))
    val anti = IndexStore.corpusSignature(a.join(b, Seq("vec_id"), "left_anti"))
    val semi = IndexStore.corpusSignature(a.join(b, Seq("vec_id"), "left_semi"))
    inner should not be anti
    inner should not be semi
    anti should not be semi
    val s10 = IndexStore.corpusSignature(a.sample(0.1, seed = 42))
    val s20 = IndexStore.corpusSignature(a.sample(0.2, seed = 42))
    val s10b = IndexStore.corpusSignature(a.sample(0.1, seed = 7))
    s10 should not be s20
    s10 should not be s10b
    // determinism is preserved: re-deriving the same query re-hashes
    // to the same signature
    IndexStore.corpusSignature(a.join(b, Seq("vec_id"), "left_anti")) shouldBe anti
    IndexStore.corpusSignature(a.sample(0.1, seed = 42)) shouldBe s10
  }

  test("plan-hash term is session-independent (no rebuild-per-session)") {
    // canonicalization normalizes exprIds, so the same query text from
    // a different session (fresh analyzer state, different raw exprIds)
    // must hash identically — otherwise every new session would treat
    // a transformed corpus as drifted and rebuild its index
    val dir = Files.createTempDirectory("corpus-sig-xsession").resolve("c").toString
    corpus(20).write.parquet(dir)
    val s2 = spark.newSession()
    import org.apache.spark.sql.functions.col
    val a = IndexStore.corpusSignature(
      spark.read.parquet(dir).filter(col("vec_id") < 10).select("vec_id", "embedding"))
    val b = IndexStore.corpusSignature(
      s2.read.parquet(dir).filter(col("vec_id") < 10).select("vec_id", "embedding"))
    a shouldBe b
  }
}
