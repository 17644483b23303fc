package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions.{col, xxhash64}

import graft.llm.DedupOps

/** ScalaCheck properties for [[DedupOps.removeDuplicateSpans]] against
  * a naive in-memory model (VERDICT r5 item 8). The generator draws
  * token streams from a 2–3 symbol alphabet over 3–6 documents, so
  * cross-document spans overlap adversarially by construction: nested
  * spans (a w+1 repeat contains two chained w-repeats), chains across
  * ≥3 documents, and whole-document duplicates all occur routinely —
  * the shapes the hand-written DedupOpsSpec fixtures cannot enumerate.
  *
  * The model recomputes the documented semantics directly: corpus-first
  * occurrence = lexicographic min (doc_id, pos); every OTHER occurrence
  * of a cross-doc span covers its w positions; kept = uncovered tokens
  * in position order. Any divergence (ordering of struct min, 1-based
  * positions, split-on-space edge cases, overlap union) fails here.
  */
object SpanDedupProps extends Properties("removeDuplicateSpans") {

  // each case runs 1–2 real Spark plans; keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxSize(60)

  private lazy val spark = SparkSpec.spark

  private val genCorpus: Gen[(List[(Long, String)], Int)] = for {
    w       <- Gen.choose(2, 3)
    nDocs   <- Gen.choose(3, 6)
    alphaSz <- Gen.choose(2, 3)
    alphabet = Seq("aa", "b", "ccc").take(alphaSz)
    // non-contiguous, shuffled ids: struct-min must order by value
    ids     <- Gen.pick(nDocs, 0L until 40L)
    texts   <- Gen.listOfN(nDocs, for {
                 n  <- Gen.choose(0, 12)
                 ts <- Gen.listOfN(n, Gen.oneOf(alphabet))
               } yield ts.mkString(" "))
  } yield (ids.toList.zip(texts), w)

  /** The naive model: O(corpus²) maps and sets, no Spark. */
  private def model(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, String)] = {
    // Spark's split(text, " ") keeps trailing empties (limit -1)
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val occ = for {
      (id, tk) <- toks.toSeq if tk.size >= w
      pos      <- 1 to (tk.size - w + 1)
    } yield (id, pos, tk.slice(pos - 1, pos - 1 + w).mkString(" "))
    val bySpan = occ.groupBy(_._3)
    val covered: Map[Long, Set[Int]] = bySpan.values.flatMap { os =>
      val nDocs = os.map(_._1).distinct.size
      if (nDocs < 2) Nil
      else {
        val first = os.map(o => (o._1, o._2)).min
        os.filter(o => (o._1, o._2) != first)
          .flatMap(o => (o._2 until o._2 + w).map(p => o._1 -> p))
      }
    }.groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    docs.map { case (id, _) =>
      val kept = toks(id).zipWithIndex
        .collect { case (t, i) if !covered.getOrElse(id, Set.empty)(i + 1) => t }
      id -> (kept.size.toLong, kept.mkString(" "))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Int,
                  hashKey: Boolean): Map[Long, (Long, String)] = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
    val key = if (hashKey) (c: org.apache.spark.sql.Column) => xxhash64(c)
              else identity[org.apache.spark.sql.Column] _
    DedupOps.removeDuplicateSpans(df, "doc_id", "text", w, key)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
  }

  property("matches the naive in-memory model") =
    Prop.forAll(genCorpus) { case (docs, w) =>
      val got = run(docs, w, hashKey = false)
      val want = model(docs, w)
      Prop(got == want) :| s"got=$got want=$want w=$w docs=$docs"
    }

  property("xxhash64 span key == identity span key") =
    Prop.forAll(genCorpus) { case (docs, w) =>
      val exact = run(docs, w, hashKey = false)
      val hashed = run(docs, w, hashKey = true)
      Prop(exact == hashed) :| s"exact=$exact hashed=$hashed w=$w"
    }
}
