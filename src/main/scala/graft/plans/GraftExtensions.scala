package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{LongDot, PqAdcDot, QuantizeVec, QuantizedDot}

/** Algebraic rewrite: `long_dot(quantize_vec(x, s), quantize_vec(y, s))`
  * ≡ `quantized_dot(x, y, s)` — when the quantized arrays feed ONLY a
  * dot product, materializing them (one `long[]` allocation per array
  * per row) is pure overhead; the fused expression streams both floats
  * through one loop. The two-step form stays the right choice when the
  * arrays are reused across a pair join ([[graft.llm.SimilarityOps]]
  * hoists them deliberately), so this fires only on the directly
  * nested pattern and never un-hoists a column reference.
  */
object FuseQuantizedDot extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LongDot(QuantizeVec(x, s1), QuantizeVec(y, s2)) if s1 == s2 =>
        QuantizedDot(x, y, s1)
    }
}

/** Session extension entry point:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(GraftExtensions.install)
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {
  /** The custom expressions as SQL functions, so `spark.sql` users get
    * the same codegen'd kernels as the Scala API:
    * `quantize_vec(vec[, scale])`, `long_dot(a, b)`,
    * `quantized_dot(a, b[, scale])`.
    */
  private def fn(name: String, usage: String)(builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft.functions." + name, null, name, usage, ""),
      (args: Seq[Expression]) => builder(args))

  private val functions = Seq(
    fn("quantize_vec", "quantize_vec(vec[, scale]) - float vector to ARRAY<BIGINT>") {
      case Seq(v) => QuantizeVec(v, 1000.0)
      case Seq(v, s) => QuantizeVec(v, s.eval().toString.toDouble)
      case args => throw new IllegalArgumentException(
        s"quantize_vec expects 1 or 2 arguments, got ${args.length}")
    },
    fn("long_dot", "long_dot(a, b) - integer dot product of ARRAY<BIGINT>") {
      case Seq(a, b) => LongDot(a, b)
      case args => throw new IllegalArgumentException(
        s"long_dot expects 2 arguments, got ${args.length}")
    },
    fn("quantized_dot", "quantized_dot(a, b[, scale]) - fused quantize + integer dot") {
      case Seq(a, b) => QuantizedDot(a, b, 1000.0)
      case Seq(a, b, s) => QuantizedDot(a, b, s.eval().toString.toDouble)
      case args => throw new IllegalArgumentException(
        s"quantized_dot expects 2 or 3 arguments, got ${args.length}")
    },
    fn("pq_adc_dot", "pq_adc_dot(codes, tables) - PQ asymmetric-distance dot: sum of tables[m][codes[m]]") {
      case Seq(c, t) => PqAdcDot(c, t)
      case args => throw new IllegalArgumentException(
        s"pq_adc_dot expects 2 arguments, got ${args.length}")
    })

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FuseQuantizedDot)
    functions.foreach(ext.injectFunction)
  }
}
