package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.QuantizedDot
import graft.llm.SimilarityOps

/** ScalaCheck properties for [[SimilarityOps.semDedup]] against a
  * naive in-memory model. The generator draws small vector sets from a
  * coarse component grid, so duplicate pairs (including exact-tie
  * centroid similarities and identical vectors) occur routinely —
  * exactly the cases where a float-ordering shortcut would diverge
  * from the documented all-integer precedence comparator.
  *
  * The model recomputes the semantics directly: seed centroids =
  * lowest-id quantized vectors; assignment = max quantized-cosine
  * (centroid-id tiebreak, -2.0 for zero norms, mirroring
  * argTopCentroids); duplicate test and precedence both in exact
  * BigInt arithmetic; dropped iff some same-cluster duplicate-neighbor
  * precedes in (centroid-similarity asc, id asc) order.
  */
object SemDedupProps extends Properties("semDedup") {

  // each case runs a real Spark plan; keep the count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxSize(40)

  private lazy val spark = SparkSpec.spark

  private val comps = Seq(-1.0f, -0.5f, 0.0f, 0.25f, 0.5f, 1.0f)

  private val genCase: Gen[(List[(Long, Seq[Float])], Int, Long, Long)] = for {
    nVecs <- Gen.choose(4, 10)
    nCent <- Gen.choose(2, 3)
    ids   <- Gen.pick(nVecs, 0L until 30L)
    // 1-in-5 vectors are all-zero so the zero-norm guard (never a
    // duplicate, always kept) is exercised routinely, not by luck
    vecs  <- Gen.listOfN(nVecs, Gen.frequency(
               4 -> Gen.listOfN(3, Gen.oneOf(comps)).map(_.toSeq),
               1 -> Gen.const(Seq(0.0f, 0.0f, 0.0f))))
    nd    <- Gen.oneOf((9L, 10L), (9L, 20L), (1L, 2L))
  } yield (ids.toList.zip(vecs), nCent, nd._1, nd._2)

  private def q(v: Seq[Float]): Array[Long] =
    v.map(x => QuantizedDot.q(x.toDouble * 1000.0)).toArray
  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** The naive model: exact BigInt verdicts, no Spark. */
  private def model(docs: Seq[(Long, Seq[Float])], nCent: Int,
                    num: Long, den: Long): Map[Long, (Long, Boolean)] = {
    val qv = docs.map { case (id, v) => id -> q(v) }.toMap
    val n2 = qv.map { case (id, a) => id -> dot(a, a) }
    // ivfCentroids(kmeansIters = 0): seeds are the nCent lowest ids
    val cents = docs.map(_._1).sorted.take(nCent)
      .map(id => id -> qv(id))
    // argTopCentroids: score desc then centroid_id asc; zero norms -2.0
    val assign = docs.map { case (id, _) =>
      val scored = cents.map { case (cid, cq) =>
        val cn2 = dot(cq, cq)
        val s = if (n2(id) == 0 || cn2 == 0) -2.0
                else dot(qv(id), cq).toDouble / math.sqrt((n2(id) * cn2).toDouble)
        (cid, s)
      }
      id -> scored.minBy { case (cid, s) => (-s, cid) }._1
    }.toMap
    val cdot = docs.map { case (id, _) => id -> dot(qv(id), qv(assign(id))) }.toMap

    // zero-norm guard mirrors the operator: a zero-quantized vector is
    // never a duplicate of anything (cosine undefined), always kept
    def isDup(a: Long, b: Long): Boolean = {
      val d = dot(qv(a), qv(b))
      n2(a) > 0 && n2(b) > 0 &&
        d >= 0 && BigInt(d) * d * den * den >= BigInt(n2(a)) * n2(b) * num * num
    }
    // b precedes a: s_cent(b) < s_cent(a) via sign split + cross square
    def precedes(b: Long, a: Long): Boolean = {
      val (cb, ca) = (cdot(b), cdot(a))
      val wb = BigInt(cb) * cb * n2(a)
      val wa = BigInt(ca) * ca * n2(b)
      val strictly = (cb < 0 && ca >= 0) ||
        (cb >= 0 && ca >= 0 && wb < wa) || (cb < 0 && ca < 0 && wb > wa)
      strictly || ((cb < 0) == (ca < 0) && wb == wa && b < a)
    }
    docs.map { case (id, _) =>
      val dropped = docs.exists { case (other, _) =>
        other != id && assign(other) == assign(id) &&
          isDup(id, other) && precedes(other, id)
      }
      id -> (assign(id), !dropped)
    }.toMap
  }

  property("matches the naive exact-arithmetic model") = Prop.forAll(genCase) {
    case (docs, nCent, num, den) =>
      import spark.implicits._
      val df = docs.toDF("vec_id", "embedding")
      val cents = SimilarityOps.ivfCentroids(df, "vec_id", "embedding", nCent)
      val got = SimilarityOps.semDedup(df, "vec_id", "embedding", num, den, cents)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      val want = model(docs, nCent, num, den)
      Prop(got == want) :| s"got=$got want=$want"
  }
}
