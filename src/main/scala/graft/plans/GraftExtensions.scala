package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{LongDot, QuantizeVec, QuantizedDot}

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
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => FuseQuantizedDot)
}
