package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Distribute a join over a UNION ALL child — the ORCA xform
  * `CXformPushJoinBelowUnionAll`
  * (`/root/reference/src/backend/gporca/libgpopt/src/xforms/CXformPushJoinBelowUnionAll.cpp:60`):
  *
  * {{{
  *   Join(UnionAll(c1..cn), other)  =>  UnionAll(Join(c1, other) .. Join(cn, other))
  * }}}
  *
  * Like the reference, the rewrite fires only when exactly one join child is
  * the union. Inner joins distribute from either side; a LEFT OUTER join
  * only when the union is the preserved (left) side — with the union on the
  * null-producing side, per-branch null-extension would emit one padded row
  * per branch instead of one per unmatched left row.
  *
  * Why it matters at scale: the single big join forces one shuffle of the
  * whole union output. Distributed, each branch picks its own strategy —
  * a broadcast-able `other` turns every branch into a BroadcastHashJoin
  * whose broadcast exchange is built once and REUSED across branches
  * (Spark's ReuseExchange sees n identical subtrees), and per-branch
  * runtime filters / partition pruning apply to each leg individually.
  * On by default since r13 (RuleSweep: 0.89x on the union-join shape
  * at sf0.1, no TPC-H query matches); disable via
  * `spark.graft.pushJoinBelowUnionAll.enabled=false`. The reference
  * instead lets the xform compete in ORCA's cost model.
  *
  * Attribute discipline: `Union.output` carries the FIRST child's exprIds,
  * so branch 1 keeps the join condition verbatim and every other branch
  * rewrites union-output references to its own child's attributes
  * positionally. The rewritten tree's output exprIds therefore equal the
  * original join's, and duplicated `other` subtrees across branches are the
  * same self-union sharing Spark already handles (`df.union(df)`).
  */
object PushJoinBelowUnionAllRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.pushJoinBelowUnionAll.enabled"

  /** Branch-count bound: distributing over a very wide union multiplies
    * plan size; past this the single join is the better plan anyway. */
  private val MaxBranches = 16

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  private def eligible(u: Union, other: LogicalPlan,
                       cond: Option[Expression]): Boolean =
    u.byName == false && u.children.size >= 2 &&
      u.children.size <= MaxBranches &&
      !other.isInstanceOf[Union] &&
      cond.forall(c => !SubqueryExpression.hasSubquery(c)) &&
      // duplicating `other` into every branch re-evaluates it per branch:
      // a nondeterministic subtree (rand() filter, sample, nondet UDF)
      // would yield different rows per copy than the single join saw —
      // same guard Spark's own duplicating rules apply
      other.find(p => !p.expressions.forall(_.deterministic)).isEmpty &&
      cond.forall(_.deterministic) &&
      // the positional rebind is a Map keyed by exprId: a union output
      // that repeats an attribute (SELECT k, k UNION ALL ...) would keep
      // only the last position and rebind the condition to the wrong
      // branch column — skip rather than mis-join
      u.output.map(_.exprId).distinct.size == u.output.size

  /** Per-branch copy of the join with union-output refs re-pointed at the
    * branch child's positionally-matching attributes. */
  private def branchJoin(u: Union, branch: LogicalPlan, cond: Option[Expression],
                         mk: (LogicalPlan, Option[Expression]) => Join): Join = {
    val rebind = AttributeMap(u.output.zip(branch.output))
    mk(branch, cond.map(_.transform {
      case a: Attribute => rebind.getOrElse(a, a)
    }))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      // union on the left: inner or left-outer both distribute
      case Join(u: Union, other, jt @ (Inner | LeftOuter), cond, hint)
          if eligible(u, other, cond) =>
        Union(u.children.map(c =>
          branchJoin(u, c, cond, (b, nc) => Join(b, other, jt, nc, hint))))
      // union on the right: inner only
      case Join(other, u: Union, Inner, cond, hint)
          if eligible(u, other, cond) =>
        Union(u.children.map(c =>
          branchJoin(u, c, cond, (b, nc) => Join(other, b, Inner, nc, hint))))
    }
  }

  /** Idempotently attach to `spark` (same batch a production deployment
    * reaches via `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def install(spark: SparkSession): Unit =
    // no-op when the session's optimizer already carries the rule — the
    // r15 sessions register GraftExtensions session-wide, and a second
    // registration via extraOptimizations would run the rule in TWO
    // batches (observed: double-pushed aggregates in the q20 snapshot)
    if (!spark.sessionState.optimizer.batches.exists(_.rules.contains(PushJoinBelowUnionAllRule)) &&
        !spark.experimental.extraOptimizations.contains(PushJoinBelowUnionAllRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushJoinBelowUnionAllRule
}
