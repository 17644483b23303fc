package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.KmvSketch

/** ScalaCheck properties for the KMV bottom-k sketch algebra
  * ([[graft.functions.KmvSketch]]). The map-side-combine license
  * (merge associativity/commutativity/idempotence), the below-k
  * exactness guarantee, and the order-insensitivity of insertion are
  * structural — they must hold for ANY input, so they are properties,
  * not examples. Estimator accuracy on saturated sketches is
  * statistical and pinned with fixed seeds (6-sigma bounds matching
  * the x2_kmv_overlap verdict columns).
  */
object KmvSketchProps extends Properties("KmvSketch") {

  private val K = 64

  private def build(hs: Seq[Long], k: Int = K): Array[Long] =
    hs.foldLeft(KmvSketch.zero(k))(KmvSketch.insert)

  private def retained(buf: Array[Long]): Seq[Long] =
    buf.slice(1, buf(0).toInt + 1).toSeq

  private val genHashes: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))

  property("below k the sketch is EXACT: retains every distinct hash") =
    Prop.forAll(Gen.listOfN(K - 1, Gen.chooseNum(Long.MinValue, Long.MaxValue))) { hs =>
      val buf = build(hs)
      retained(buf).toSet == hs.toSet &&
        KmvSketch.estimate(buf) == hs.distinct.size.toDouble
    }

  property("retained values are sorted unsigned, distinct, and are the n smallest") =
    Prop.forAll(genHashes) { hs =>
      val buf = build(hs)
      val r = retained(buf)
      val expect = hs.distinct.sortBy(h => h ^ Long.MinValue).take(K)
      r == expect
    }

  property("insertion order never matters") =
    Prop.forAll(genHashes) { hs =>
      retained(build(hs)) == retained(build(scala.util.Random.shuffle(hs)))
    }

  property("merge == build of concatenation (map-side combine is lossless)") =
    Prop.forAll(genHashes, genHashes) { (a, b) =>
      val m = KmvSketch.merge(build(a), build(b))
      retained(m) == retained(build(a ++ b))
    }

  property("merge is commutative") =
    Prop.forAll(genHashes, genHashes) { (a, b) =>
      retained(KmvSketch.merge(build(a), build(b))) ==
        retained(KmvSketch.merge(build(b), build(a)))
    }

  property("merge is associative") =
    Prop.forAll(genHashes, genHashes, genHashes) { (a, b, c) =>
      val l = KmvSketch.merge(KmvSketch.merge(build(a), build(b)), build(c))
      val r = KmvSketch.merge(build(a), KmvSketch.merge(build(b), build(c)))
      retained(l) == retained(r)
    }

  property("merge with self is idempotent") =
    Prop.forAll(genHashes) { hs =>
      retained(KmvSketch.merge(build(hs), build(hs))) == retained(build(hs))
    }

  property("pairEstimates is exact when neither sketch saturates") =
    Prop.forAll(
      Gen.listOfN(30, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
      Gen.listOfN(30, Gen.chooseNum(Long.MinValue, Long.MaxValue))) { (a, b) =>
      val (u, i) = KmvSketch.pairEstimates(build(a), build(b))
      u == (a ++ b).distinct.size.toDouble &&
        i == a.toSet.intersect(b.toSet).size.toDouble
    }

  /** Statistical accuracy on SATURATED sketches, fixed seed: the same
    * 6-sigma bounds the x2_kmv_overlap verdict columns assert
    * (see SketchOps.sourceOverlapCertified scaladoc for derivation).
    */
  property("saturated estimates land inside the 6-sigma verdict bounds (fixed seeds)") = {
    val k = 1024
    Prop.all((1 to 20).map { seed =>
      val rnd = new scala.util.Random(seed)
      val nA = 2000 + rnd.nextInt(8000)
      val nB = 2000 + rnd.nextInt(8000)
      val nShared = rnd.nextInt(math.min(nA, nB) / 2 + 1)
      def h(x: Long): Long = {
        // splitmix64 — deterministic stand-in for xxhash64
        var z = x + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      val base = seed.toLong << 40
      val shared = (0 until nShared).map(i => h(base + i))
      val onlyA = (0 until (nA - nShared)).map(i => h(base + 1000000L + i))
      val onlyB = (0 until (nB - nShared)).map(i => h(base + 2000000L + i))
      val sa = build(shared ++ onlyA, k)
      val sb = build(shared ++ onlyB, k)
      val (estU, estI) = KmvSketch.pairEstimates(sa, sb)
      val exactU = (nA + nB - nShared).toDouble
      val exactI = nShared.toDouble
      val uOk = math.abs(estU - exactU) <= exactU * 6.0 / math.sqrt(k) + 4.0
      val iOk = math.abs(estI - exactI) <=
        6.0 * math.sqrt(exactI * exactU / k) + exactI * 6.0 / math.sqrt(k) + 4.0
      Prop.propBoolean(uOk && iOk) :| s"seed=$seed estU=$estU exactU=$exactU estI=$estI exactI=$exactI"
    }: _*)
  }
}
