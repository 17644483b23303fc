package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native per-row MinHash banding (SURVEY.md §2.8 X2 — the streaming
  * gate's probe side).
  *
  * The stateless gate computes, INSIDE each incoming row, the
  * `numHashes` MinHash signature of the row's shingle set and the
  * `bands` banded bucket hashes. Expressed as nested higher-order
  * functions (`transform(sequence(..), i -> array_min(transform(shs,
  * s -> xxhash64(i, s))))`) every one of the `numHashes × |shingles|`
  * hash evaluations pays interpreted-lambda dispatch and a per-element
  * allocation — measured as the dominant cost of the sf0.1 gate. This
  * expression runs the same arithmetic as one tight primitive loop per
  * row and stays inside whole-stage codegen (the generated code is a
  * single static call).
  *
  * Bit-compatibility is the load-bearing property: the signature must
  * equal `min(xxhash64(i, sh))` and the band hash must equal
  * `hash(slice(sig, b·r+1, r), b)` — the expressions
  * [[graft.llm.DedupOps.minHashBandedFromShingles]] builds the
  * PERSISTED index with — or gate probes stop colliding with stored
  * buckets. Both are replicated seed-for-seed (xxhash64: seed 42 →
  * hashInt(i) → hashUnsafeBytes(s); murmur3: seed 42 folded over the
  * slice elements then the band index) and spec-pinned equal to the
  * SQL-expression formulation.
  */
object MinHashUtil {

  /** Band hashes of a distinct shingle array: `bands` murmur3 ints
    * over the `numHashes`-long MinHash signature.
    */
  def bandHashes(shingles: ArrayData, numHashes: Int, bands: Int): ArrayData = {
    val r = numHashes / bands
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes
      i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(base, off, len, seeds(i))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var k = 0
      while (k < r) { h = Murmur3_x86_32.hashLong(sig(b * r + k), h); k += 1 }
      out(b) = Murmur3_x86_32.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashBandHashes(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    "bands must divide numHashes")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.bandHashes(input.asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashUtil.bandHashes($c, $numHashes, $bands);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the MinHash expressions. */
object MinHashFunctions {
  /** Banded MinHash bucket hashes (ARRAY<INT>, length `bands`) of a
    * distinct-shingle ARRAY<STRING> column.
    */
  def minHashBandHashes(shingles: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.toColumn(
      MinHashBandHashes(ColumnBridge.toExpr(shingles), numHashes, bands))
}
