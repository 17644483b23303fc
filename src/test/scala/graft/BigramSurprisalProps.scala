package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.llm.TextOps

/** ScalaCheck properties for [[TextOps.bigramSurprisal]] against a
  * naive in-memory model mirroring the documented math exactly:
  * ML unigram/bigram corpus counts, λ·p(w|prev) + (1−λ)·p(w) with λ
  * as the same integer-percent division, first token unigram-only,
  * and per-token micro-unit quantization before the doc sum. Tiny
  * vocabularies make repeated bigrams, single-token docs, and
  * every-token-identical docs routine.
  */
object BigramSurprisalProps extends Properties("bigramSurprisal") {

  // each case runs a real Spark plan; keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxSize(40)

  private lazy val spark = SparkSpec.spark

  private val genCase: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(1, 6)
    ids   <- Gen.pick(nDocs, 0L until 20L)
    texts <- Gen.listOfN(nDocs, for {
               n  <- Gen.choose(1, 8)
               ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
             } yield ws.mkString(" "))
  } yield ids.toList.zip(texts)

  private def model(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val seqs = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = seqs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val utot = uni.values.sum
    val bi = seqs.flatMap(_._2.sliding(2).collect { case Seq(v, w) => (v, w) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pref = bi.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val lam = 70 / 100.0
    val lamC = 30 / 100.0
    seqs.map { case (id, ws) =>
      val qs = ws.zipWithIndex.map { case (w, i) =>
        val pu = uni(w).toDouble / utot
        val p = if (i == 0) pu
        else lam * (bi((ws(i - 1), w)).toDouble / pref(ws(i - 1))) + lamC * pu
        math.round(-math.log(p) * 1000000)
      }
      id -> (ws.size.toLong, qs.sum)
    }.toMap
  }

  property("matches the naive interpolated-LM model") = Prop.forAll(genCase) { docs =>
    import spark.implicits._
    val got = TextOps.bigramSurprisal(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = model(docs)
    Prop(got == want) :| s"got=$got want=$want"
  }
}
