package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k ("KMV" / theta-family) distinct-value sketch over 64-bit
  * hashes, the mergeable-summary pattern behind Apache DataSketches'
  * theta sketch: retain the k smallest distinct hash values (unsigned
  * order); every hash below the retention threshold θ is a uniform
  * Bernoulli(θ) sample of the underlying distinct set, so
  * `|sample| / θ` estimates the distinct count and — unlike HLL —
  * the SAME retained samples support set algebra (union,
  * intersection) BETWEEN sketches built independently per group.
  *
  * Why this exists next to `approx_count_distinct`/`hll_*`: HLL
  * registers can union but cannot intersect; cross-source overlap
  * ("how much of src_a's content is also in src_b?") needs a sample-
  * carrying sketch. At 100 TB the per-source sketch is fixed-size
  * (k+1 longs ≈ 8 KiB at k=1024), builds in one map-side-combined
  * pass over the corpus, and any of the O(sources²) pairwise overlap
  * estimates is then driver-side arithmetic on two 8 KiB arrays — no
  * second scan, no pairwise shuffle. The exact pairwise-distinct
  * oracle anchor beside it in `Queries` is the quadratic path the
  * sketch replaces.
  *
  * Buffer layout (encoder-friendly, one flat `Array[Long]`):
  * slot 0 = n (retained count, 0..k); slots 1..n = the n smallest
  * DISTINCT hashes seen, sorted ascending by UNSIGNED comparison.
  * Reference behavior target: Alrash/DataFramework has no sketch
  * layer (eager NumPy, tools.py); this is a scale-path extension.
  */
object KmvSketch {

  /** Map a 64-bit hash to its uniform fraction in (0,1): top 53 bits
    * of the UNSIGNED value over 2^53 — monotone in unsigned order, so
    * order statistics and fractions never disagree.
    */
  def fraction(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  private def ltU(a: Long, b: Long): Boolean = java.lang.Long.compareUnsigned(a, b) < 0

  def zero(k: Int): Array[Long] = new Array[Long](k + 1)

  /** Insert one hash: reject fast when full and h ≥ current max
    * (probability → 1 once saturated), else binary-search insert,
    * dropping the max when at capacity. Dedup: retained values stay
    * distinct. Mutates and returns `buf`.
    */
  def insert(buf: Array[Long], h: Long): Array[Long] = {
    val k = buf.length - 1
    val n = buf(0).toInt
    if (n == k && !ltU(h, buf(n))) return buf
    // unsigned binary search over buf[1..n]
    var lo = 1
    var hi = n // insertion slot in [1, n+1)
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(buf(mid), h)
      if (c == 0) return buf // already retained
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    val pos = lo
    if (n < k) {
      System.arraycopy(buf, pos, buf, pos + 1, n - pos + 1)
      buf(pos) = h
      buf(0) = n + 1
    } else {
      // full: drop current max (slot n), shift (pos..n-1) right
      System.arraycopy(buf, pos, buf, pos + 1, n - pos)
      buf(pos) = h
    }
    buf
  }

  /** Merge two buffers (sorted-unique merge, keep the k smallest).
    * Associative and commutative — the property map-side combine and
    * multi-level rollups rely on (pinned in KmvSketchSpec).
    */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val k = a.length - 1
    val na = a(0).toInt
    val nb = b(0).toInt
    if (nb == 0) return a
    if (na == 0) { System.arraycopy(b, 0, a, 0, nb + 1); return a }
    val out = new Array[Long](k + 1)
    var i = 1
    var j = 1
    var o = 0
    while (o < k && (i <= na || j <= nb)) {
      val takeA =
        if (i > na) false
        else if (j > nb) true
        else java.lang.Long.compareUnsigned(a(i), b(j)) <= 0
      val v = if (takeA) a(i) else b(j)
      if (takeA) { if (j <= nb && b(j) == v) j += 1; i += 1 }
      else j += 1
      out(o + 1) = v
      o += 1
    }
    out(0) = o.toLong
    System.arraycopy(out, 0, a, 0, k + 1)
    a
  }

  /** Retention threshold θ: 1.0 while not full (every value retained
    * — the sketch is EXACT below k), else the fraction of the largest
    * retained hash (all strictly-smaller hashes are fully retained).
    */
  def theta(buf: Array[Long]): Double = {
    val k = buf.length - 1
    val n = buf(0).toInt
    if (n < k) 1.0 else fraction(buf(n))
  }

  /** Distinct-count estimate: n exact when not full, else (k-1)/θ —
    * the classic KMV estimator (the kth value itself is the
    * threshold, not a sample).
    */
  def estimate(buf: Array[Long]): Double = {
    val k = buf.length - 1
    val n = buf(0).toInt
    if (n < k) n.toDouble else (k - 1).toDouble / fraction(buf(n))
  }

  private def contains(buf: Array[Long], h: Long): Boolean = {
    val n = buf(0).toInt
    var lo = 1
    var hi = n
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val c = java.lang.Long.compareUnsigned(buf(mid), h)
      if (c == 0) return true
      else if (c < 0) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  /** Pairwise set estimates from two independently-built sketches:
    * (union, intersection) distinct-count estimates. θ = min of the
    * three thresholds (each side's and the merged bottom-k's); every
    * retained hash strictly below θ is a Bernoulli(θ) sample of
    * A ∪ B whose membership in EACH side is decidable (both sides
    * fully retain below their own θ), so
    * `n̂_∪ = |S|/θ`, `n̂_∩ = |S ∩ A ∩ B|/θ`. Exact for both when
    * neither sketch saturated.
    */
  def pairEstimates(a: Array[Long], b: Array[Long]): (Double, Double) = {
    val k = a.length - 1
    val na = a(0).toInt
    val nb = b(0).toInt
    val u = merge(a.clone(), b)
    if (na < k && nb < k) {
      // both exact: u holds min(k, all) of the true union; count true intersections
      val nu = u(0).toInt
      var m = 0
      var i = 1
      while (i <= nu) {
        if (contains(a, u(i)) && contains(b, u(i))) m += 1
        i += 1
      }
      if (nu < k) return (nu.toDouble, m.toDouble)
    }
    val th = math.min(theta(u), math.min(theta(a), theta(b)))
    val nu = u(0).toInt
    var s = 0
    var m = 0
    var i = 1
    while (i <= nu) {
      val h = u(i)
      if (fraction(h) < th) {
        s += 1
        if (contains(a, h) && contains(b, h)) m += 1
      }
      i += 1
    }
    (s.toDouble / th, m.toDouble / th)
  }

  /** One sketch per group in one pass: IN = xxhash64 of the item,
    * BUF/OUT = the flat sketch array. Partials are ~8 KiB at k=1024
    * and merge associatively → map-side combine does almost all the
    * work; the shuffle carries one sketch per (group × task).
    */
  class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k >= 2, s"KMV k must be >= 2, got $k")

    override def zero: Array[Long] = KmvSketch.zero(k)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvSketch.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf.take(buf(0).toInt + 1)

    override def bufferEncoder: Encoder[Array[Long]] = KmvSketch.longArray
    override def outputEncoder: Encoder[Array[Long]] = KmvSketch.longArray
  }

  /** Re-inflate a `finish`-trimmed sketch to capacity k for algebra. */
  def inflate(trimmed: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](k + 1)
    System.arraycopy(trimmed, 0, out, 0, trimmed.length)
    out
  }

  /** Second-level aggregation: merge already-built sketches (IN = a
    * `finish`-trimmed sketch array). This is what makes the sketch an
    * INDEX rather than a one-shot statistic — persisted per-source
    * sketches union with a delta batch's sketches in O(delta), and
    * coarser rollups (per-language, global) aggregate the stored
    * sketch table without touching raw documents. Merge-of-merges
    * equals build-of-everything (KmvSketchProps' concat law), so the
    * hierarchy is lossless.
    */
  class KmvMergeAgg(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    require(k >= 2, s"KMV k must be >= 2, got $k")

    override def zero: Array[Long] = KmvSketch.zero(k)
    override def reduce(buf: Array[Long], sk: Array[Long]): Array[Long] =
      KmvSketch.merge(buf, inflate(sk, k))
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = KmvSketch.merge(a, b)
    override def finish(buf: Array[Long]): Array[Long] = buf.take(buf(0).toInt + 1)

    override def bufferEncoder: Encoder[Array[Long]] = KmvSketch.longArray
    override def outputEncoder: Encoder[Array[Long]] = KmvSketch.longArray
  }

  /** Input encoder for [[KmvMergeAgg]] callers (`udaf(agg, enc)`). */
  val longArray: Encoder[Array[Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Array[Long]]()
  }

  val longEncoder: Encoder[Long] = Encoders.scalaLong
}
