package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Aggregators.BitmapOrAgg

/** ScalaCheck properties for the Bloom bitmap aggregator: the buffer
  * algebra (reduce/merge) must be a commutative monoid over bit sets —
  * that is exactly what licenses Spark to combine partials map-side in
  * any grouping and order at any cluster size.
  */
object AggregatorProps extends Properties("BitmapOrAgg") {

  private val M = 512
  private val agg = new BitmapOrAgg(M)

  private val genPositions: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, M - 1L))

  private def fold(ps: Seq[Long]): Array[Long] =
    ps.foldLeft(agg.zero)((b, p) => agg.reduce(b, p))

  private def bits(bm: Array[Long]): Set[Long] =
    (0L until M).filter(p => (bm((p >> 6).toInt) >> (p & 63) & 1L) == 1L).toSet

  property("bitmap bits == the set of reduced positions") =
    Prop.forAll(genPositions) { ps => bits(fold(ps)) == ps.toSet }

  property("merge of split partials == single-pass fold (any split point)") =
    Prop.forAll(genPositions, Gen.chooseNum(0, 100)) { (ps, cut) =>
      val i = if (ps.isEmpty) 0 else cut % (ps.length + 1)
      val (a, b) = ps.splitAt(i)
      // merge mutates its left arg — fold fresh buffers
      bits(agg.merge(fold(a), fold(b))) == bits(fold(ps))
    }

  property("merge is commutative on the bit sets") =
    Prop.forAll(genPositions, genPositions) { (xs, ys) =>
      bits(agg.merge(fold(xs), fold(ys))) == bits(agg.merge(fold(ys), fold(xs)))
    }

  property("out-of-range positions are rejected, not aliased") =
    Prop.forAll(Gen.oneOf(Gen.chooseNum(Long.MinValue, -1L), Gen.chooseNum(M.toLong, Long.MaxValue))) { p =>
      Prop.throws(classOf[IllegalArgumentException]) { agg.reduce(agg.zero, p) }
    }
}
