package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** `Leading(t1 t2 t3)` — pg_hint_plan's join-ORDER hint
  * (`/root/reference/gpcontrib/pg_hint_plan/pg_hint_plan.c:94-100`; the
  * most-used hint in practice: pin a bad join order without touching
  * planner GUCs or rewriting the query).
  *
  * Spark-first delivery: Catalyst already parses ANY `/*+ NAME(args) */`
  * comment hint into an `UnresolvedHint` node and drops unknown names
  * with a warning at the END of analysis ("Remove Unresolved Hints").
  * This rule runs in the post-hoc resolution batch — after resolution,
  * BEFORE the unknown-hint sweep — so `/*+ LEADING(c, o, l) */` is a
  * first-class comment hint with stock syntax, and when this rule
  * declines (gate off, unknown alias, disconnected order) the node falls
  * through to Spark's own warn-and-drop, exactly the adherence contract
  * HintSpec pins for unknown strategy hints.
  *
  * Semantics (reference `Leading`): flatten the hinted subtree's maximal
  * inner-join chain, then rebuild it LEFT-DEEP in the listed order,
  * re-attaching each ON-conjunct at the first join where its references
  * are available. The rewrite declines (warn, keep the optimizer's
  * order) unless the listed names cover the chain's relation aliases
  * exactly and every step is condition-connected — a disconnected order
  * would plant a cartesian product mid-chain, which the stock
  * `ReorderJoin` rule would immediately fight in its fixed-point batch.
  * Like all pg_hint_plan hints this is purely physical: the lane's
  * oracle runs the SAME text minus the hint, so the driver's hash
  * compare proves order pinning cannot change results.
  *
  * Gate: `spark.graft.hints.leading.enabled` (default true, matching
  * the stock join-strategy hints' always-on UX; pg_hint_plan's GUC
  * analogue for tests).
  */
object LeadingJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.hints.leading.enabled"
  val HintName = "LEADING"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case UnresolvedHint(name, params, child)
          if name.toUpperCase(java.util.Locale.ROOT) == HintName =>
        val order = params.map(paramName)
        if (order.exists(_.isEmpty)) {
          logWarning(s"LEADING hint ignored: unresolvable parameter list $params")
          child
        } else reorder(child, order.map(_.get)) match {
          case Some(re) => re
          case None => child // warned inside; fall back to optimizer order
        }
    }
  }

  /** A hint parameter as a relation alias: bare identifier or string. */
  private def paramName(e: Any): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      if a.nameParts.length == 1 => Some(a.nameParts.head.toLowerCase)
    case l: org.apache.spark.sql.catalyst.expressions.Literal =>
      Option(l.value).map(_.toString.toLowerCase)
    case _ => None
  }

  /** The alias a leaf answers to: the nearest SubqueryAlias (still
    * present at analysis time — EliminateSubqueryAliases runs later, in
    * the optimizer). */
  private def leafName(p: LogicalPlan): Option[String] = p match {
    case SubqueryAlias(id, _) => Some(id.name.toLowerCase)
    case _ => None
  }

  /** Flatten a maximal hint-free inner-join chain into (leaves,
    * ON-conjuncts). */
  private def flatten(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    p match {
      case Join(l, r, Inner, cond, JoinHint.NONE) =>
        val (ls, lc) = flatten(l)
        val (rs, rc) = flatten(r)
        (ls ++ rs, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case other => (Seq(other), Nil)
    }

  /** Rebuild the topmost join chain under `child` in `order`; None (with
    * a warning) when the order doesn't name the chain's aliases exactly
    * or is not condition-connected. */
  private def reorder(child: LogicalPlan,
                      order: Seq[String]): Option[LogicalPlan] = {
    var done = false
    var failed: Option[String] = None
    val result = child.transformDown {
      case j @ Join(_, _, Inner, _, JoinHint.NONE) if !done && failed.isEmpty =>
        done = true
        val (leaves, conds) = flatten(j)
        val named = leaves.map(l => leafName(l) -> l)
        if (named.exists(_._1.isEmpty)) {
          failed = Some("a join input has no alias")
          j
        } else if (named.map(_._1.get).sorted != order.sorted ||
                   order.distinct != order) {
          failed = Some(s"order [${order.mkString(", ")}] does not match " +
            s"chain aliases [${named.flatMap(_._1).mkString(", ")}]")
          j
        } else {
          val byName = named.map { case (n, l) => n.get -> l }.toMap
          var current: LogicalPlan = byName(order.head)
          var remaining = conds
          var connected = true
          order.tail.foreach { n =>
            val next = byName(n)
            val avail = AttributeSet(current.output ++ next.output)
            val (applicable, rest) =
              remaining.partition(_.references.subsetOf(avail))
            // a step with no usable conjunct is a planted cross join:
            // decline rather than fight ReorderJoin's fixed point
            if (applicable.isEmpty) connected = false
            current = Join(current, next, Inner,
              applicable.reduceOption(And), JoinHint.NONE)
            remaining = rest
          }
          if (!connected) {
            failed = Some(s"order [${order.mkString(", ")}] is not " +
              "condition-connected (would create a cartesian step)")
            j
          } else {
            // ON-conjuncts that never became applicable (references
            // outside the chain) keep their filtering power above
            remaining.foldLeft(current)((p, c) => Filter(c, p))
          }
        }
    }
    failed match {
      case Some(why) =>
        logWarning(s"LEADING hint ignored: $why")
        None
      case None if !done =>
        logWarning("LEADING hint ignored: no inner-join chain under the hint")
        None
      case None => Some(result)
    }
  }
}
