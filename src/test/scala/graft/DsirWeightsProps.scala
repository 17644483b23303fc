package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions.col

import graft.llm.{DedupOps, TextOps}

/** ScalaCheck properties for [[TextOps.dsirWeights]] against a naive
  * in-memory model that mirrors the md5 bucket hash, the Laplace
  * smoothing, and the integer micro-unit quantization exactly. Random
  * target/source splits over a tiny vocabulary produce empty target
  * slices, all-target corpora, and heavy bucket collisions (B = 8) —
  * the degenerate shapes a hand fixture misses.
  */
object DsirWeightsProps extends Properties("dsirWeights") {

  // each case runs a real Spark plan; keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxSize(40)

  private lazy val spark = SparkSpec.spark

  private val words = Seq("alpha", "beta", "gamma", "delta", "x")

  private val genCase: Gen[(List[(Long, String, Boolean)], Int)] = for {
    nDocs <- Gen.choose(2, 8)
    nBkt  <- Gen.oneOf(8, 64) // 8 forces bucket collisions
    ids   <- Gen.pick(nDocs, 0L until 20L)
    rows  <- Gen.listOfN(nDocs, for {
               n   <- Gen.choose(1, 6)
               ws  <- Gen.listOfN(n, Gen.oneOf(words))
               tgt <- Gen.oneOf(true, false)
             } yield (ws.mkString(" "), tgt))
  } yield (ids.toList.zip(rows).map { case (id, (t, g)) => (id, t, g) }, nBkt)

  /** First 15 hex chars of md5, as a long — [[DedupOps.md5TokenHash]]. */
  private def md5Bucket(tok: String, b: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val hex = d.map(x => f"$x%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % b
  }

  private def model(docs: Seq[(Long, String, Boolean)],
                    b: Int): Map[Long, (Long, Long)] = {
    val toks = docs.flatMap { case (id, t, g) =>
      t.split(" ", -1).map(w => (id, g, md5Bucket(w, b))) }
    val ct = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cs = toks.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val (tt, ts) = (ct.values.sum, cs.values.sum)
    def lam(bkt: Long): Long = {
      val t = (ct.getOrElse(bkt, 0L) + 1.0) / (tt + b)
      val s = (cs.getOrElse(bkt, 0L) + 1.0) / (ts + b)
      math.round((math.log(t) - math.log(s)) * 1000000)
    }
    toks.filterNot(_._2).groupBy(_._1).map { case (id, rows) =>
      id -> (rows.size.toLong, rows.map(r => lam(r._3)).sum)
    }
  }

  property("matches the naive md5/Laplace/quantized model") = Prop.forAll(genCase) {
    case (docs, nBkt) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "text", "tgt")
      val got = TextOps.dsirWeights(df, "doc_id", "text",
          isTarget = col("tgt"), nBuckets = nBkt,
          tokenHash = DedupOps.md5TokenHash)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val want = model(docs, nBkt)
      Prop(got == want) :| s"got=$got want=$want"
  }
}
