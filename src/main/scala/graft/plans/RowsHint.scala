package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** `Rows(rel... spec)` — pg_hint_plan's cardinality-correction hint
  * (`/root/reference/gpcontrib/pg_hint_plan/pg_hint_plan.c:94-100`): the
  * DBA corrects a row-count misestimate for a relation or a join result,
  * and the planner's own costing then picks a different strategy. It is
  * the usual *cause*-level fix when a `Leading`/strategy hint would only
  * patch the symptom.
  *
  * Spark-first: the one planning decision cardinality actually drives in
  * Spark is broadcastability — `JoinSelection` compares a side's
  * estimated `sizeInBytes` against `spark.sql.autoBroadcastJoinThreshold`.
  * So the honest analogue resolves the corrected estimate to exactly
  * that decision at hint time: corrected rows × estimated row width
  * under the threshold ⇒ the named subtree gets a BROADCAST strategy
  * hint; over it ⇒ NO_BROADCAST_HASH (the same `HintInfo` AQE's own
  * `DynamicJoinSelection` uses to demote). Everything downstream is
  * stock Catalyst (`EliminateResolvedHint` → `JoinHint` →
  * `JoinSelection`), so adherence, propagation, and warn-on-conflict
  * behavior are Spark's own.
  *
  * Syntax (comment hint or hint-table row): `ROWS(rel, spec)` corrects
  * one relation; `ROWS(r1, r2, spec)` corrects the join result whose
  * leaf aliases are exactly {r1, r2} (the reference's join-level form —
  * the wrapped subtree's size is what the join ABOVE it consults).
  * `spec` is an integer literal (absolute rows, the reference's `#n`)
  * or a string literal `'#n'`, `'*f'`, `'+n'`, `'-n'` (set / multiply /
  * add / subtract the estimate, mirroring pg_hint_plan's four forms).
  *
  * Declines — warn and fall through to Spark's stock unknown-hint
  * warn-and-drop sweep — when:
  *  - AQE is enabled: adaptive re-planning replaces estimates with
  *    RUNTIME sizes at exactly this decision, so a manual estimate
  *    correction would be overridden anyway (the reference has no AQE;
  *    this is the documented Spark-side honesty clause);
  *  - the named aliases don't resolve to a subtree under the hint;
  *  - the spec doesn't parse, or a relative form needs a row count the
  *    stats can't provide.
  *
  * Gate: `spark.graft.hints.rows.enabled` (default true, matching the
  * stock join-strategy hints' always-on UX).
  */
object RowsHintRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.hints.rows.enabled"
  val HintName = "ROWS"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case UnresolvedHint(name, params, child)
          if name.toUpperCase(java.util.Locale.ROOT) == HintName =>
        applyHint(params, child)
    }
  }

  private def applyHint(params: Seq[Any], child: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.adaptiveExecutionEnabled) {
      logWarning("ROWS hint ignored: AQE re-plans join strategies from " +
        "runtime statistics, which would override a manual cardinality " +
        "estimate at the same decision point; disable " +
        "spark.sql.adaptive.enabled to pin the estimate")
      return child
    }
    if (params.size < 2) {
      logWarning(s"ROWS hint ignored: expected (rel..., spec), got $params")
      return child
    }
    val names = params.init.map(paramName)
    val spec = parseSpec(params.last)
    if (names.exists(_.isEmpty) || spec.isEmpty) {
      logWarning(s"ROWS hint ignored: unparseable parameter list $params " +
        "(expected relation aliases then an integer or '#n'/'*f'/'+n'/'-n')")
      return child
    }
    val target = names.flatten.toSet
    locate(child, target) match {
      case None =>
        logWarning(s"ROWS hint ignored: no subtree with leaf aliases " +
          s"[${target.mkString(", ")}] under the hint")
        child
      case Some(subtree) =>
        correctedRows(subtree, spec.get) match {
          case None =>
            logWarning("ROWS hint ignored: a relative correction " +
              s"('${params.last}') needs a base row-count estimate the " +
              "statistics cannot provide here")
            child
          case Some(rows) =>
            // the decision the corrected cardinality drives: estimated
            // bytes vs the broadcast threshold (JoinSelection's test)
            val rowWidth = 8L +
              subtree.output.map(_.dataType.defaultSize.toLong).sum
            val bytes = rows * BigInt(rowWidth)
            val threshold = SQLConf.get.autoBroadcastJoinThreshold
            val strategy =
              if (threshold >= 0 && bytes <= threshold) BROADCAST
              else NO_BROADCAST_HASH
            logInfo(s"ROWS hint: [${target.mkString(", ")}] corrected to " +
              s"$rows rows (~$bytes bytes) -> $strategy")
            var replaced = false
            child.transformDown {
              case p if !replaced && (p eq subtree) =>
                replaced = true
                ResolvedHint(p, HintInfo(strategy = Some(strategy)))
            }
        }
    }
  }

  /** A hint parameter as a relation alias (same forms as LEADING). */
  private def paramName(e: Any): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      if a.nameParts.length == 1 => Some(a.nameParts.head.toLowerCase(java.util.Locale.ROOT))
    case l: org.apache.spark.sql.catalyst.expressions.Literal
      if l.dataType == org.apache.spark.sql.types.StringType =>
      Option(l.value).map(_.toString.toLowerCase(java.util.Locale.ROOT))
    case _ => None
  }

  private sealed trait Spec
  private case class SetTo(n: BigInt) extends Spec
  private case class MultiplyBy(f: Double) extends Spec
  private case class AddDelta(n: BigInt) extends Spec

  /** The last hint parameter as a correction spec. */
  private def parseSpec(e: Any): Option[Spec] = e match {
    case l: org.apache.spark.sql.catalyst.expressions.Literal =>
      l.value match {
        case null => None
        case n: Int => Some(SetTo(BigInt(n)))
        case n: Long => Some(SetTo(BigInt(n)))
        case n: org.apache.spark.unsafe.types.UTF8String =>
          val s = n.toString.trim
          try s.headOption match {
            case Some('#') => Some(SetTo(BigInt(s.tail.trim)))
            case Some('*') => Some(MultiplyBy(s.tail.trim.toDouble))
            case Some('+') => Some(AddDelta(BigInt(s.tail.trim)))
            case Some('-') => Some(AddDelta(-BigInt(s.tail.trim)))
            case _ => Some(SetTo(BigInt(s)))
          } catch { case _: NumberFormatException => None }
        case _ => None
      }
    case _ => None
  }

  /** Collect the SubqueryAlias leaf names visible under `p` without
    * descending through a found alias (the alias IS the leaf). */
  private def leafAliases(p: LogicalPlan): Seq[String] = p match {
    case SubqueryAlias(id, _) => Seq(id.name.toLowerCase(java.util.Locale.ROOT))
    case other => other.children.flatMap(leafAliases)
  }

  /** The smallest subtree whose leaf alias set is exactly `target`:
    * a single SubqueryAlias, or the lowest Join covering the named
    * aliases and nothing else. */
  private def locate(p: LogicalPlan, target: Set[String]): Option[LogicalPlan] =
    p match {
      case s @ SubqueryAlias(id, inner) =>
        // a non-matching alias over a derived subquery still hides the
        // chain the hint names — descend
        if (target == Set(id.name.toLowerCase(java.util.Locale.ROOT))) Some(s)
        else locate(inner, target)
      case other =>
        // prefer the deepest match: a child that already covers the set
        other.children.flatMap(locate(_, target)).headOption.orElse {
          other match {
            case j: Join if leafAliases(j).toSet == target &&
                leafAliases(j).size == target.size => Some(j)
            case _ => None
          }
        }
    }

  /** Apply `spec` to the subtree's estimated row count. Absolute form
    * needs no base; relative forms derive the base from stats
    * (rowCount when CBO provides it, else sizeInBytes / row width). */
  private def correctedRows(subtree: LogicalPlan, spec: Spec): Option[BigInt] = {
    def base: Option[BigInt] = {
      val st = subtree.stats
      st.rowCount.orElse {
        val w = 8L + subtree.output.map(_.dataType.defaultSize.toLong).sum
        if (st.sizeInBytes > 0) Some(st.sizeInBytes / w max BigInt(1)) else None
      }
    }
    val corrected = spec match {
      case SetTo(n) => Some(n)
      case MultiplyBy(f) =>
        base.map(b => (BigDecimal(b) * f).setScale(0,
          scala.math.BigDecimal.RoundingMode.HALF_UP).toBigInt.max(BigInt(0)))
      case AddDelta(n) => base.map(b => (b + n).max(BigInt(0)))
    }
    corrected.map(_.max(BigInt(0)))
  }
}
