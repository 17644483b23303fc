package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for embedding similarity (SURVEY.md §2.8 X3).
  *
  * Why a custom expression instead of `aggregate(zip_with(...))` HOFs:
  * (a) whole-stage codegen — the HOF path allocates per-row lambda
  * frames, this compiles to a tight primitive loop inside the generated
  * code, which matters when the kNN cross join evaluates millions of
  * pairs; (b) cross-engine determinism — scores quantized to integers
  * are exact in any summation order, so the DuckDB oracle reproduces
  * them bit-for-bit, which unquantized float dot products cannot
  * guarantee.
  *
  * Rounding is half-away-from-zero computed via exact fraction
  * comparison (not `+0.5` truncation, which mis-rounds
  * 0.49999999999999994), matching both Spark's and DuckDB's `round()`.
  */
case class QuantizedDot(left: Expression, right: Expression, scale: Double)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += QuantizedDot.q(x.getFloat(i) * scale) * QuantizedDot.q(y.getFloat(i) * scale)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val qFn = QuantizedDot.getClass.getName.stripSuffix("$") + ".q"
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long s = 0L;
         |for (int i = 0; i < n; i++) {
         |  s += $qFn((double)$a.getFloat(i) * $scale) * $qFn((double)$b.getFloat(i) * $scale);
         |}
         |${ev.value} = s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  /** Round half away from zero, exactly (public so codegen can call it). */
  def q(v: Double): Long = {
    val t = v.toLong
    val frac = v - t
    if (frac >= 0.5) t + 1 else if (frac <= -0.5) t - 1 else t
  }
}

/** Column-level API for the vector expressions. */
object VectorFunctions {
  def quantizedDot(a: Column, b: Column, scale: Int = 1000): Column =
    ColumnBridge.toColumn(
      QuantizedDot(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b), scale.toDouble))

  /** Squared quantized L2 norm — self dot product. */
  def quantizedNorm2(a: Column, scale: Int = 1000): Column =
    quantizedDot(a, a, scale)
}
