package graft.plans

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, HintInfo, Join, JoinHint, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.plans.logical.NO_BROADCAST_HASH
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Range/band-join binning — the interval-join rewrite the reference
  * serves with MergeJoin over sorted inequality quals
  * (`/root/reference/src/backend/executor/nodeMergejoin.c` and ORCA's
  * CPhysicalInnerIndexNLJoin family; same transform Databricks ships as
  * the "range join optimization" hint):
  *
  * {{{
  *   Join(P, B, Inner, point >= lo AND point < hi)   -- no equi key
  *   =>
  *   Project(P.out ++ B.out,
  *     Join(Project(P.out :+ floor(point/w) AS bin, P),
  *          Generate(explode(sequence(floor(lo/w), floor(hi/w))) AS bin, B),
  *          Inner, bin = bin AND <original condition>))
  * }}}
  *
  * Spark plans an equality-free inequality join as a
  * BroadcastNestedLoopJoin — O(|P|*|B|) comparisons, the worst 100 TB
  * plan shape. Binning manufactures an equi key: a point lands in ONE
  * width-`w` bin, an interval explodes to its ceil(width/w)+1 covering
  * bins, and the preserved original predicate discards false candidates,
  * so ANY bin width is semantics-safe (IEEE division by a shared
  * positive w is monotone: point in [lo, hi] implies floor(point/w) lies
  * in [floor(lo/w), floor(hi/w)] — no candidate is ever missed; empty or
  * null-bounded intervals explode to zero bins, matching the original
  * predicate's null/empty semantics). Floating-point bounds need one
  * extra care: a non-finite bound cannot be binned (an upper bound of
  * +Infinity floors to Long.MaxValue and would make the covering
  * `Sequence` unboundedly long, and NaN bounds — which DO match under
  * Spark's NaN-ordering semantics, e.g. point=NaN, hi=NaN with <= —
  * would floor to bin 0 and silently miss). So when any bound is
  * float/double the bounds side is split into a finite lane (binned
  * equi-join) and a non-finite lane (NaN/±Inf rows, kept on the
  * original join shape — a tiny relation in any real dataset, planned
  * as a nested loop broadcasting that remainder), unioned. A non-finite POINT needs no
  * lane of its own: NaN/±Inf points only satisfy both bounds when a
  * bound is itself non-finite (NaN point fails any finite upper bound,
  * +Inf fails any finite upper, -Inf fails any finite lower), so every
  * such match is already covered by the non-finite-bounds lane, and a
  * non-finite point on the binned lane hashes to a junk bin whose
  * candidates the preserved predicate discards. The width trades
  * duplication for selectivity exactly like the reference's btree
  * range scan granularity
  * — callers set it to the typical interval width via
  * `spark.graft.rangeJoin.binSize` (off when unset/0, the
  * conf-competition discipline of the other xform rules).
  *
  * Guards: inner join; condition is exactly one lower and one upper
  * bound on the SAME deterministic numeric point expression, point
  * references one side only and both bounds the other; no cross-side
  * equality already present (an equi key would make binning pure
  * overhead); no subqueries; deterministic children. The rewritten
  * join's 3-conjunct condition no longer matches the 2-comparison band
  * shape, so the rule is idempotent by construction.
  */
object RangeBinJoinRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.rangeJoin.binSize"

  // A malformed conf value disables the rule instead of throwing
  // NumberFormatException inside the optimizer for every query.
  private def binSize: Double =
    Try(SQLConf.get.getConfString(ConfKey, "0").toDouble).getOrElse(0.0)

  /** (point, lower, upper, pointOnLeft) for a two-comparison band. */
  private def matchBand(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    def side(e: Expression): Option[Boolean] =
      if (e.references.nonEmpty && e.references.subsetOf(l.outputSet))
        Some(true)
      else if (e.references.nonEmpty && e.references.subsetOf(r.outputSet))
        Some(false)
      else None
    // normalize one comparison to (point, bound, isLower)
    def bound(c: Expression): Option[(Expression, Expression, Boolean, Boolean)] = {
      val norm = c match {
        case GreaterThanOrEqual(a, b) => Some((a, b, true))  // a >= b
        case GreaterThan(a, b) => Some((a, b, true))
        case LessThanOrEqual(a, b) => Some((b, a, true))
        case LessThan(a, b) => Some((b, a, true))
        case _ => None
      }
      // (big, small): big >= small — point is whichever side we pick
      norm.flatMap { case (big, small, _) =>
        (side(big), side(small)) match {
          case (Some(sb), Some(ss)) if sb != ss =>
            // choose orientation later; return both candidates as
            // (point=big, bound=small, lower) or (point=small, bound=big, upper)
            Some((big, small, sb, ss))
          case _ => None
        }
      }
    }
    (cond match {
      case And(c1, c2) => Some((c1, c2))
      case _ => None
    }).flatMap { case (c1, c2) =>
      (bound(c1), bound(c2)) match {
        case (Some((big1, small1, sb1, _)), Some((big2, small2, sb2, _))) =>
          // same point expr must appear as the big side of one and the
          // small side of the other: small2 == big1 -> point = big1 has
          // lower bound small1 and upper bound big2 (or the mirror)
          if (big1.semanticEquals(small2))
            Some((big1, small1, big2, sb1))
          else if (big2.semanticEquals(small1))
            Some((big2, small2, big1, sb2))
          else None
        case _ => None
      }
    }.filter { case (point, lo, hi, pointOnLeft) =>
      val boundsSide = if (pointOnLeft) r.outputSet else l.outputSet
      point.dataType.isInstanceOf[NumericType] &&
      lo.dataType.isInstanceOf[NumericType] &&
      hi.dataType.isInstanceOf[NumericType] &&
      point.deterministic && lo.deterministic && hi.deterministic &&
      lo.references.subsetOf(boundsSide) && hi.references.subsetOf(boundsSide)
    }
  }

  private def hasCrossEquality(p: Expression, l: LogicalPlan,
                               r: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    conjuncts(p).exists {
      case EqualTo(a, b) =>
        a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
         (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet)))
      case _ => false
    }
  }

  /** The non-finite fallback lane marks its POINT side
    * NO_BROADCAST_HASH — never broadcast the big side, so the planner's
    * nested loop broadcasts the (tiny, usually empty) non-finite bounds
    * remainder instead — and the hint doubles as the idempotence
    * marker: the injected rule runs inside a fixpoint optimizer batch,
    * so the fallback join (whose condition is still the 2-comparison
    * band shape) must be recognizably ours or the rule would re-split
    * it every iteration. */
  private def isFallbackLane(hint: JoinHint): Boolean =
    Seq(hint.leftHint, hint.rightHint).flatten
      .exists(_.strategy.contains(NO_BROADCAST_HASH))

  private def eligible(l: LogicalPlan, r: LogicalPlan,
                       cond: Expression): Boolean =
    cond.deterministic && !SubqueryExpression.hasSubquery(cond) &&
      l.find(n => !n.expressions.forall(_.deterministic)).isEmpty &&
      r.find(n => !n.expressions.forall(_.deterministic)).isEmpty &&
      !hasCrossEquality(cond, l, r)

  private def binOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private def isFloating(e: Expression): Boolean =
    e.dataType == FloatType || e.dataType == DoubleType

  // null-rejecting finiteness predicates (null in → null out → row is
  // dropped from BOTH lanes, matching the inner join's null semantics);
  // non-floating bounds are finite by type (nulls fall to the covering
  // Sequence's IsNotNull guard).
  private def finite(e: Expression): Expression =
    if (!isFloating(e)) Literal.TrueLiteral
    else {
      val d = Cast(e, DoubleType) // float +-Inf casts to double +-Inf
      And(Not(IsNaN(d)),
        And(Not(EqualTo(d, Literal(Double.PositiveInfinity))),
            Not(EqualTo(d, Literal(Double.NegativeInfinity)))))
    }

  private def nonFinite(e: Expression): Expression =
    if (!isFloating(e)) Literal.FalseLiteral
    else {
      val d = Cast(e, DoubleType)
      Or(IsNaN(d),
        Or(EqualTo(d, Literal(Double.PositiveInfinity)),
           EqualTo(d, Literal(Double.NegativeInfinity))))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binSize
    if (!(w > 0)) return plan
    plan.transformDown {
      case j @ Join(l, r, Inner, Some(cond), hint)
          if !isFallbackLane(hint) && eligible(l, r, cond) =>
        matchBand(cond, l, r) match {
          case Some((point, lo, hi, pointOnLeft)) =>
            val (p, b0) = if (pointOnLeft) (l, r) else (r, l)
            // float/double bounds may be NaN/±Inf: bin only the finite
            // rows; route non-finite-bounded rows through a preserved
            // fallback join (see scaladoc).
            val needSplit = isFloating(lo) || isFloating(hi)
            val b = if (needSplit)
              Filter(And(finite(lo), finite(hi)), b0) else b0
            val pBin = Alias(binOf(point, w), "graft_bin_p")()
            val pSide = Project(p.output :+ pBin, p)
            val binB =
              AttributeReference("graft_bin_b", LongType, nullable = false)()
            val loBin = binOf(lo, w)
            val hiBin = binOf(hi, w)
            val seq = If(
              And(IsNotNull(loBin),
                And(IsNotNull(hiBin), LessThanOrEqual(loBin, hiBin))),
              // Sequence is TimeZoneAwareExpression: without a zone it
              // reports unresolved even for integral sequences
              Sequence(loBin, hiBin, Some(Literal(1L)),
                Some(SQLConf.get.sessionLocalTimeZone)),
              Literal.create(Array.empty[Long], ArrayType(LongType, false)))
            val bSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(binB), child = b)
            val (nl, nr) =
              if (pointOnLeft) (pSide, bSide) else (bSide, pSide)
            val newCond = And(EqualTo(pBin.toAttribute, binB), cond)
            val binned =
              Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
            if (!needSplit) binned
            else {
              val bRest = Filter(Or(nonFinite(lo), nonFinite(hi)), b0)
              val noBcast = Some(HintInfo(strategy = Some(NO_BROADCAST_HASH)))
              val (fl, fr) = if (pointOnLeft) (p, bRest) else (bRest, p)
              val fHint = if (pointOnLeft) JoinHint(noBcast, None)
                          else JoinHint(None, noBcast)
              val fallback = Project(j.output,
                Join(fl, fr, Inner, Some(cond), fHint))
              Union(Seq(binned, fallback))
            }
          case None => j
        }
    }
  }

  /** Idempotently attach to `spark` (production path:
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def install(spark: SparkSession): Unit =
    // no-op when the session's optimizer already carries the rule — the
    // r15 sessions register GraftExtensions session-wide, and a second
    // registration via extraOptimizations would run the rule in TWO
    // batches (observed: double-pushed aggregates in the q20 snapshot)
    if (!spark.sessionState.optimizer.batches.exists(_.rules.contains(RangeBinJoinRule)) &&
        !spark.experimental.extraOptimizations.contains(RangeBinJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeBinJoinRule
}
