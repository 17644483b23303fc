package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, ShortType}

/** Morton (Z-order) bit interleave of two dimensions.
  *
  * `zorder16(a, b)` interleaves the low 16 bits of each input into a
  * 32-bit key (bit i of `a` → bit 2i, bit i of `b` → bit 2i+1), the
  * space-filling-curve key behind multi-dimensional data CLUSTERING:
  * rows sorted by the interleaved key land in files that cover compact
  * hyper-rectangles of (a, b) space, so parquet footer min/max stats
  * prune range predicates on EITHER dimension — the layout trick
  * Delta/Iceberg `OPTIMIZE ZORDER BY` applies before 100 TB scans.
  * Spark has no built-in for it; the bit-spread is four shift-mask
  * rounds, ideal for whole-stage codegen (branch-free, allocation-free).
  */
object ZOrderInterleave {
  /** Spread the low 16 bits of x to even bit positions (0,2,…,30). */
  def spread16(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def interleave(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)
}

case class ZOrderInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder16"

  private def integral(t: DataType): Boolean =
    t == IntegerType || t == LongType || t == ShortType

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires integral inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  private def toLong(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderInterleave.interleave(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val va = ctx.freshName("za"); val vb = ctx.freshName("zb")
      def spread(v: String, in: String) =
        s"""long $v = ((long) $in) & 0xFFFFL;
           |$v = ($v | ($v << 8)) & 0x00FF00FFL;
           |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |${spread(va, a)}
         |${spread(vb, b)}
         |${ev.value} = $va | ($vb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Column-level API for layout-key expressions. */
object ZOrderFunctions {
  /** Morton interleave of the low 16 bits of two integral columns. */
  def zorder16(a: Column, b: Column): Column =
    ColumnBridge.toColumn(ZOrderInterleave(
      ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  /** The identical computation as ANSI SQL (staged CTE columns), used
    * by DuckDB oracles to replay the interleave bit-for-bit. Returns
    * SQL selecting `outName` given input expressions `a`, `b`.
    */
  def zorder16Sql(a: String, b: String, outName: String): String = {
    def stage(v: String, shift: Int, mask: Long) =
      s"(($v | ($v << $shift)) & $mask)"
    def spread(in: String): String = {
      val s0 = s"(CAST($in AS BIGINT) & 65535)"
      val s1 = stage(s0, 8, 0x00FF00FFL)
      val s2 = stage(s1, 4, 0x0F0F0F0FL)
      val s3 = stage(s2, 2, 0x33333333L)
      stage(s3, 1, 0x55555555L)
    }
    s"(${spread(a)} | (${spread(b)} << 1)) AS $outName"
  }
}
