package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{DotProduct, NormSq}

/** Custom Catalyst optimizer rule, registered through
  * SparkSessionExtensions — the engine's analogue of an ORCA xform
  * (`/root/reference/src/backend/gporca/libgpopt/src/xforms/`): a
  * peephole algebraic rewrite the stock optimizer does not know about.
  *
  * `vec_dot(v, v)` -> `vec_norm_sq(v)`: halves the array reads in the
  * self-similarity hot path (norm computations written generically by a
  * query author still execute the specialized kernel).
  */
object RewriteSelfDotToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.semanticEquals(b) &&
          a.deterministic => NormSq(a)
    }
}

/** `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteSelfDotToNorm)
    // ORCA-xform analogues, each gated behind its own conf (see the
    // rule's scaladoc): spark.graft.eagerAgg.enabled,
    // spark.graft.pushJoinBelowUnionAll.enabled,
    // spark.graft.orExpansion.enabled, spark.graft.rangeJoin.binSize
    e.injectOptimizerRule(_ => EagerAggRule)
    e.injectOptimizerRule(_ => PushJoinBelowUnionAllRule)
    e.injectOptimizerRule(_ => OrExpansionRule)
    e.injectOptimizerRule(_ => RangeBinJoinRule)
    // Leading(...) join-order hint (pg_hint_plan analogue) — post-hoc
    // resolution so the UnresolvedHint is consumed BEFORE the stock
    // unknown-hint warn-and-drop sweep; see LeadingJoinRule
    e.injectPostHocResolutionRule(_ => LeadingJoinRule)
    // Rows(...) cardinality-correction hint — same delivery window
    e.injectPostHocResolutionRule(_ => RowsHintRule)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
         classOf[DotProduct].getName, "vec_dot"),
       (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
         DotProduct(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_norm_sq"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
         classOf[NormSq].getName, "vec_norm_sq"),
       (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
         NormSq(exprs.head)))
  }
}
