package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Aggregators.CountMinAgg

/** ScalaCheck properties for the count-min buffer algebra. The
  * estimate's one-sided guarantee (never below the true count) and
  * the mergeability that licenses map-side combine must hold for ANY
  * per-key bucket assignment — so the generator assigns each key an
  * arbitrary (but per-key-consistent) index vector instead of a real
  * hash, which is exactly the adversarial case.
  */
object CountMinProps extends Properties("CountMinAgg") {

  private val D = 3
  private val W = 16 // small width → collisions in nearly every case
  private val agg = new CountMinAgg(D, W)

  /** keys with multiplicities + a per-key index-vector assignment */
  private val genCase: Gen[(List[Int], Map[Int, Seq[Long]])] = for {
    nKeys <- Gen.choose(1, 8)
    mults <- Gen.listOfN(nKeys, Gen.choose(1, 12))
    idxs  <- Gen.listOfN(nKeys, Gen.listOfN(D, Gen.chooseNum(0L, W - 1L)))
  } yield (
    mults.zipWithIndex.flatMap { case (m, k) => List.fill(m)(k) },
    idxs.zipWithIndex.map { case (v, k) => k -> v.toSeq }.toMap)

  private def fold(keys: Seq[Int], idx: Map[Int, Seq[Long]]): Array[Long] =
    keys.foldLeft(agg.zero)((b, k) => agg.reduce(b, idx(k)))

  private def estimate(buf: Array[Long], idxs: Seq[Long]): Long =
    (0 until D).map(i => buf(i * W + idxs(i).toInt)).min

  property("estimate is never below the true count (one-sided)") =
    Prop.forAll(genCase) { case (keys, idx) =>
      val buf = fold(keys, idx)
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (k, c) => estimate(buf, idx(k)) >= c }
    }

  property("every row's counters sum to N (no lost or duplicated mass)") =
    Prop.forAll(genCase) { case (keys, idx) =>
      val buf = fold(keys, idx)
      (0 until D).forall { i =>
        (0 until W).map(j => buf(i * W + j)).sum == keys.length.toLong
      }
    }

  property("merge of split partials == single-pass fold (any split point)") =
    Prop.forAll(genCase, Gen.chooseNum(0, 100)) { case ((keys, idx), cut) =>
      val i = if (keys.isEmpty) 0 else cut % (keys.length + 1)
      val (a, b) = keys.splitAt(i)
      agg.merge(fold(a, idx), fold(b, idx)).toSeq == fold(keys, idx).toSeq
    }

  property("out-of-range or wrong-arity index vectors are rejected") =
    Prop.forAll(Gen.oneOf(Seq(W.toLong, 0L, 0L), Seq(-1L, 0L, 0L), Seq(0L, 0L))) { bad =>
      Prop.throws(classOf[IllegalArgumentException]) { agg.reduce(agg.zero, bad) }
    }
}
