package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** OR-expansion of a disjunctive inner join — the ORCA
  * `CXformExpandNAryJoin` family's answer to predicates no single hash
  * join can serve (classic "union-all join rewrite", also Oracle's
  * OR-expansion transform):
  *
  * {{{
  *   Join(l, r, Inner, p1 OR p2)
  *   =>
  *   Union(Join(l, r, Inner, p1),
  *         Join(l, r, Inner, p2 AND NOT coalesce(p1, false)))
  * }}}
  *
  * Spark plans `a.x = b.x OR a.y = b.y` as a BroadcastNestedLoopJoin —
  * every left row against every right row, O(|l|·|r|) comparisons, the
  * single worst plan shape at 100 TB. Each expanded branch carries one
  * equality disjunct, so both become hash joins; the second branch's
  * `NOT coalesce(p1, false)` (p1 false OR null — three-valued logic
  * preserved) keeps both-true rows from emitting twice, exactly the
  * original bag semantics for rows where p1 OR p2 holds.
  *
  * Guards: inner join only; the condition is a top-level OR of
  * DETERMINISTIC disjuncts (duplicating `l`/`r` into two branches
  * re-evaluates them — same discipline as [[PushJoinBelowUnionAllRule]]);
  * each disjunct contains at least one cross-side equality (else that
  * branch would itself nested-loop and the rewrite buys nothing); no
  * subqueries. Duplicated children are the `df.union(df)` self-sharing
  * Spark already handles, and ReuseExchange collapses the doubled scans.
  * On by default since r13 (RuleSweep: 3.4x on the OR-join shape at
  * sf0.1, no TPC-H query regresses because none matches); disable via
  * `spark.graft.orExpansion.enabled=false`. The reference lets the
  * expansion compete in ORCA's cost model instead. */
object OrExpansionRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.orExpansion.enabled"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  /** Does `p` contain a top-level-AND-reachable equality with one side
    * from `l` and the other from `r`? (What makes a branch hash-join-
    * able after the split.) */
  private def hasCrossEquality(p: Expression, l: LogicalPlan,
                               r: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(p).exists {
      case EqualTo(a, b) =>
        // both sides must REFERENCE their relation: an empty reference
        // set (a literal) is a subset of every outputSet, and a
        // constant-vs-column equality cannot drive a hash join
        a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
         (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))
      case _ => false
    }
  }

  private def eligible(l: LogicalPlan, r: LogicalPlan,
                       p1: Expression, p2: Expression): Boolean =
    p1.deterministic && p2.deterministic &&
      !SubqueryExpression.hasSubquery(p1) &&
      !SubqueryExpression.hasSubquery(p2) &&
      l.find(n => !n.expressions.forall(_.deterministic)).isEmpty &&
      r.find(n => !n.expressions.forall(_.deterministic)).isEmpty &&
      hasCrossEquality(p1, l, r) && hasCrossEquality(p2, l, r)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case Join(l, r, Inner, Some(Or(p1, p2)), hint)
          if eligible(l, r, p1, p2) =>
        val dedup = And(p2, Not(Coalesce(Seq(p1, Literal(false)))))
        Union(Seq(
          Join(l, r, Inner, Some(p1), hint),
          Join(l, r, Inner, Some(dedup), hint)))
    }
  }

  /** Idempotently attach to `spark` (same batch a production deployment
    * reaches via `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def install(spark: SparkSession): Unit =
    // no-op when the session's optimizer already carries the rule — the
    // r15 sessions register GraftExtensions session-wide, and a second
    // registration via extraOptimizations would run the rule in TWO
    // batches (observed: double-pushed aggregates in the q20 snapshot)
    if (!spark.sessionState.optimizer.batches.exists(_.rules.contains(OrExpansionRule)) &&
        !spark.experimental.extraOptimizations.contains(OrExpansionRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ OrExpansionRule
}
