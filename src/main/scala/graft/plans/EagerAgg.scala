package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Eager aggregation: push a partial aggregate below an inner join —
  * the ORCA exploration xform `CXformEagerAgg`
  * (`/root/reference/src/backend/gporca/libgpopt/src/xforms/CXformEagerAgg.cpp:96`):
  *
  * {{{
  *   SELECT min(a1) FROM t1, t2 WHERE t1.j1 = t2.j2 GROUP BY t1.g1
  *   =>
  *   SELECT min(a1_local) FROM
  *     (SELECT min(a1) a1_local FROM t1 GROUP BY t1.g1, t1.j1) x, t2
  *   WHERE x.j1 = t2.j2 GROUP BY x.g1
  * }}}
  *
  * Correctness argument (no foreign-key restriction needed, same as the
  * reference): every row of a lower group shares the same join-key values
  * (they are grouping keys), so the whole group matches exactly the same
  * inner rows. If it matches k inner rows the partial appears k times above
  * the join — exactly the duplication the original aggregate saw row-wise —
  * so re-aggregating partials with the combine function (min→min, max→max,
  * sum→sum, count→sum, avg→sum/sum) reproduces the original result; a group
  * matching zero inner rows vanishes in both plans.
  *
  * Supported aggregates mirror the reference's `CanPushAggBelowJoin`
  * (min, max, sum, count, avg; no DISTINCT, no FILTER, single input,
  * arguments entirely from the outer child). Decimal sums/averages are
  * excluded: re-aggregating a decimal sum widens its precision, which would
  * change the output schema. Enabled BY DEFAULT since r13
  * (disable via `spark.graft.eagerAgg.enabled=false`), re-gated r14 with
  * isolated min-of-N process runs across four scales (SCALING.md): the
  * fired TPC-H shapes measure q20 0.86x at x100 and q20 0.93x / q21
  * 0.92x at x1000 — wins grow with the probe side, exactly the
  * transform's theory — with no scale showing a loss outside the
  * measured identical-plan noise envelope; the 693-case fuzz battery
  * pins semantics. The reference's traceflag `EopttraceEnableEagerAgg`
  * gates the same xform.
  *
  * At 100 TB this is the transform that turns "join 100 TB of facts, then
  * aggregate" into "aggregate each scan partition down to its group cube
  * first, then join orders-of-magnitude fewer rows" — the shuffle moves
  * partials, not raw rows.
  */
object EagerAggRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.eagerAgg.enabled"

  /** Minimum estimated rows-per-group on the outer child for a push to
    * pay for itself when column stats are available. The pushed plan
    * spends one extra hash-aggregate pass over the outer child; its win
    * is joining/shuffling `groups` rows instead of `rows`. Below ~a few
    * rows per group the compression cannot amortize the pass (measured:
    * a unique-domain push is 1.20x pure overhead, SCALING.md r15;
    * winning pushes q20/q21 compress >>10x). */
  val MinReductionKey = "spark.graft.eagerAgg.minReduction"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  /** Cost the push from ANALYZE column stats, when they exist.
    *
    * ORCA explores `CXformEagerAgg` and lets the cost model pick between
    * the pushed and un-pushed alternatives using per-column NDV from
    * ANALYZE. Spark's optimizer is heuristic (rules fire or not), so the
    * analogue is a fire-time estimate: lower group count ≈ ∏ NDV(key)
    * (the standard attribute-independence assumption, capped at the
    * child's row count), and the push fires only when
    * rows / groups ≥ [[MinReductionKey]].
    *
    * Returns None when CBO is off or any needed stat is missing — the
    * caller then falls back to the fixed-width-key type heuristic, which
    * is a zero-stats stand-in for exactly this estimate. */
  private def statsDecision(left: LogicalPlan,
                            lowerKeys: Seq[Attribute]): Option[Boolean] = {
    if (!SQLConf.get.cboEnabled) return None
    val st = left.stats
    val ndvs = lowerKeys.map(k => st.attributeStats.get(k).flatMap(_.distinctCount))
    st.rowCount match {
      case Some(rows) if ndvs.forall(_.isDefined) =>
        val groups = ndvs.flatten.product.min(rows).max(BigInt(1))
        val minReduction = BigDecimal(
          SQLConf.get.getConfString(MinReductionKey, "4.0"))
        Some(BigDecimal(rows) >= BigDecimal(groups) * minReduction)
      case _ => None
    }
  }

  /** Aggregates whose partial can be recombined losslessly above the join:
    * the reference's min/max/sum/count/avg set, minus decimal sum/avg
    * (precision widening would alter the result schema). */
  private def pushable(fn: AggregateFunction): Boolean = fn match {
    case _: Min | _: Max => true
    case Sum(child, _) => child.dataType match {
      case _: DecimalType => false
      case _: NumericType => true
      case _ => false
    }
    case Average(child, _) => child.dataType match {
      case _: DecimalType => false
      case _: NumericType => true
      case _ => false
    }
    case Count(children) => children.length == 1
    case _ => false
  }

  private def applicable(groupExprs: Seq[Expression],
                         aggExprs: Seq[NamedExpression],
                         left: LogicalPlan): Boolean = {
    val groupingOk = groupExprs.forall(_.isInstanceOf[Attribute])
    // each output is either a grouping attribute passthrough or a direct
    // Alias over a plain (no DISTINCT / FILTER) pushable aggregate whose
    // argument only reads the outer child
    val aggsOk = aggExprs.forall {
      case a: Attribute => groupExprs.exists(_.semanticEquals(a))
      case Alias(ae: AggregateExpression, _) =>
        !ae.isDistinct && ae.filter.isEmpty &&
          pushable(ae.aggregateFunction) &&
          ae.references.subsetOf(left.outputSet)
      case _ => false
    }
    val hasAgg = aggExprs.exists {
      case Alias(_: AggregateExpression, _) => true; case _ => false
    }
    groupingOk && aggsOk && hasAgg
  }

  /** The join under the aggregate, seen through the attribute-only pruning
    * Project that ColumnPruning interposes (dropping it is safe: it only
    * narrows the join output, and the rebuilt aggregate re-derives its
    * needs). */
  private object AggChildJoin {
    def unapply(p: LogicalPlan): Option[Join] = p match {
      case j @ Join(_, _, Inner, Some(_), _) => Some(j)
      case Project(pl, j @ Join(_, _, Inner, Some(_), _))
          if pl.forall(_.isInstanceOf[Attribute]) => Some(j)
      case _ => None
    }
  }

  /** True when `p` is an Aggregate, seen through the attribute-only
    * pruning Projects of ColumnPruning AND the Filters
    * InferFiltersFromConstraints interposes between the two
    * operator-optimization batches — either wrapper on an
    * already-pushed aggregate must still count as "already pushed". */
  private def aggUnderProjects(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) =>
      aggUnderProjects(child)
    case org.apache.spark.sql.catalyst.plans.logical.Filter(_, child) =>
      aggUnderProjects(child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(groupExprs, aggExprs,
                     AggChildJoin(Join(left, right, Inner, Some(cond), hint)),
                     aggHint)
          // the not-already-aggregated guard is the fixpoint: a plan this
          // rule already rewrote has the lower aggregate as the join's
          // outer child — possibly under the attribute-only Project that
          // ColumnPruning interposes, which the bare isInstanceOf check
          // missed (observed as a double push when the rule ran in two
          // optimizer batches, r15)
          if !aggUnderProjects(left) &&
             applicable(groupExprs, aggExprs, left) =>
        val groupAttrs = groupExprs.map(_.asInstanceOf[Attribute])
        // lower grouping keys: (original grouping cols ∪ join-predicate
        // cols) ∩ outer-child cols — the reference's push_down_gb_cols
        val lowerKeys: Seq[Attribute] =
          (groupAttrs.filter(left.outputSet.contains) ++
            cond.references.toSeq.filter(left.outputSet.contains)).distinct
        // an empty key set would make the lower aggregate GLOBAL — which
        // fabricates one all-null/zero row from an empty outer child and
        // could surface phantom groups above the join; skip the rewrite.
        //
        // The push decision. The reference only explores this xform
        // because ORCA COSTS both alternatives from ANALYZE stats, and
        // the win requires the lower group domain to be much smaller
        // than its input. When CBO is on and per-key NDV exists,
        // statsDecision estimates that ratio directly (∏NDV vs rows) —
        // a near-unique key of ANY type (e.g. a fixed-width xxhash64
        // digest column) is then declined by cost. Without stats
        // (Spark's default), fall back to the width heuristic: a
        // string/binary key (tokens, shingles, digests) is the
        // signature of a near-unique domain where the pushed aggregate
        // compresses nothing and just burns a hash pass — measured
        // 1.20x on the minhash shingle-intersection count at x1000
        // (min-of-5, SCALING.md r15) when the rule started firing
        // session-wide. Every measured winning push
        // (q20/q21/q_eager_agg/triangle) groups by fixed-width keys.
        val fixedWidthKeys = lowerKeys.forall(_.dataType match {
          case StringType | BinaryType => false
          case _ => true
        })
        val shouldPush = lowerKeys.nonEmpty &&
          statsDecision(left, lowerKeys).getOrElse(fixedWidthKeys)
        if (!shouldPush) agg else {

        // lower partials + the upper expression rebuilt over them; avg
        // splits into (sum, count) below and recombines sum/sum above
        val lowerAggs = Seq.newBuilder[NamedExpression]
        val upperAggs: Seq[NamedExpression] = aggExprs.map {
          case a: Attribute => a
          case al @ Alias(ae: AggregateExpression, name) =>
            def partial(fn: AggregateFunction, suffix: String): Attribute = {
              val p = Alias(AggregateExpression(fn, Complete, isDistinct = false),
                            name + suffix)()
              lowerAggs += p
              p.toAttribute
            }
            val rebuilt: Expression = ae.aggregateFunction match {
              case m: Min => AggregateExpression(Min(partial(m, "_p")),
                                                 Complete, isDistinct = false)
              case m: Max => AggregateExpression(Max(partial(m, "_p")),
                                                 Complete, isDistinct = false)
              case s: Sum => AggregateExpression(Sum(partial(s, "_p")),
                                                 Complete, isDistinct = false)
              case c: Count =>
                // count partials recombine by SUM; coalesce restores
                // count's non-nullable output type
                Coalesce(Seq(
                  AggregateExpression(Sum(partial(c, "_p")),
                                      Complete, isDistinct = false),
                  Literal(0L)))
              case Average(child, _) =>
                // accumulate the partial in DoubleType — Average's own
                // sumDataType for non-decimal input — so an integral child
                // can't overflow-wrap a LongType Sum partial (wrong avg in
                // legacy mode / ANSI error the un-rewritten plan never hits)
                val s = partial(Sum(Cast(child, DoubleType)), "_ps")
                val n = partial(Count(Seq(child)), "_pc")
                val sumS = AggregateExpression(Sum(s), Complete, isDistinct = false)
                val sumN = AggregateExpression(Sum(n), Complete, isDistinct = false)
                // all-null groups sum counts to 0: answer null like avg
                // does, instead of tripping ANSI division
                If(EqualTo(sumN, Literal(0L)),
                   Literal(null, DoubleType),
                   Divide(Cast(sumS, DoubleType), Cast(sumN, DoubleType)))
              case other =>
                throw new IllegalStateException(s"unreachable: $other")
            }
            Alias(rebuilt, name)(exprId = al.exprId, qualifier = al.qualifier,
                                 explicitMetadata = al.explicitMetadata)
        }

        val lower = Aggregate(lowerKeys, lowerKeys ++ lowerAggs.result(), left)
        Aggregate(groupExprs, upperAggs,
                  Join(lower, right, Inner, Some(cond), hint), aggHint)
        }
    }
  }

  /** Idempotently attach to `spark` (same batch a production deployment
    * reaches via `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def install(spark: SparkSession): Unit =
    // no-op when the session's optimizer already carries the rule — the
    // r15 sessions register GraftExtensions session-wide, and a second
    // registration via extraOptimizations would run the rule in TWO
    // batches (observed: double-pushed aggregates in the q20 snapshot)
    if (!spark.sessionState.optimizer.batches.exists(_.rules.contains(EagerAggRule)) &&
        !spark.experimental.extraOptimizations.contains(EagerAggRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EagerAggRule
}
