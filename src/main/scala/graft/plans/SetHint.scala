package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.internal.Logging

/** `Set(key value)` — pg_hint_plan's per-statement GUC override
  * (`/root/reference/gpcontrib/pg_hint_plan/pg_hint_plan.c:101` HINT_SET,
  * `:3199` setup_guc_enforcement inside the planner's PG_TRY: the listed
  * GUCs are applied BEFORE planning and restored when the planner
  * returns, error or not). It is the hint that tunes the *planner
  * environment* for one statement — the reference's canonical use is
  * `Set(enable_seqscan off)` or `Set(work_mem '1GB')` scoped to a single
  * query.
  *
  * Spark-first: pg_hint_plan implements Set as a planner WRAPPER (a
  * `planner_hook`), not a rewrite rule — conf mutation plus guaranteed
  * restore cannot live inside an idempotent `Rule[LogicalPlan]`. The
  * analogue here is the same wrapper shape: [[sql]] scans the statement's
  * hint comment (and anything [[HintTable]] injected) for `SET(...)`
  * entries, strips them from the text (they are consumed here, never
  * reaching Catalyst's unknown-hint sweep), applies the WHITELISTED keys
  * to the session conf, forces the full analyze/optimize/physical-plan
  * pipeline under the scoped conf (`queryExecution.executedPlan` — the
  * planning window pg_hint_plan brackets), and restores every touched
  * key in a `finally`. Execution after the wrapper returns sees the
  * original conf, exactly like the reference (GUCs are restored when
  * standard_planner returns, before the executor runs).
  *
  * AQE scope (r18, closes the r17 honesty clause): under AQE, *runtime
  * re-planning* consults the live session conf — a restore-after-planning
  * bracket would govern the initial physical plan but not AQE's later
  * re-decisions. pg_hint_plan's Set governs the WHOLE planning of the
  * statement, and Spark's runtime re-planning is planning; so when AQE
  * is on (or [[CloneScopeConf]] forces it), the statement runs on a
  * statement-scoped SESSION CLONE (`cloneSession()` — full session state:
  * conf, temp views, functions; shared SparkContext and catalog) with the
  * whitelisted keys applied to the CLONE's conf only. AQE re-decisions
  * then see the scoped values for the statement's entire life, and
  * restore on the caller's session holds by construction — it is never
  * touched. `spark.graft.hints.set.cloneScope` = auto (default: clone
  * iff AQE is on) | true | false (the r17 plan-window bracket).
  *
  * Whitelist: per-statement scope only makes sense for PLANNING knobs,
  * so only those are accepted — exact keys in [[WhitelistKeys]] plus the
  * `spark.graft.` rule-gate namespace. Anything else (executor sizing,
  * ANSI semantics, catalog state) is declined with the standard warn and
  * left untouched, mirroring the reference's GUC_NOT_IN_PARAMETERS
  * check. Gate: `spark.graft.hints.set.enabled` (default true); when
  * gated off the SET items are still CONSUMED — stripped with a warn,
  * never applied. In the reference a disabled pg_hint_plan leaves hints
  * as opaque comments; the Spark equivalent of "opaque" is stripping,
  * because Catalyst's hint grammar rejects the space-separated SET form
  * as a statement-level PARSE error rather than warn-dropping it.
  *
  * Syntax: `SET(key value)`, `SET(key, value)`, or quoted
  * `SET('key', 'value')` — pg_hint_plan's space form and the Spark
  * comma style both parse; values with spaces must be quoted.
  */
object SetHint extends Logging {

  val EnabledConf = "spark.graft.hints.set.enabled"

  /** Statement-scope mechanism under AQE: "auto" (clone a session iff
    * AQE is enabled), "true" (always clone), "false" (r17 behavior:
    * apply + plan + restore on the caller's session — AQE re-decisions
    * then see the restored conf). */
  val CloneScopeConf = "spark.graft.hints.set.cloneScope"

  /** Exact whitelisted keys: the planning knobs a per-statement scope
    * legitimately tunes (the Spark analogues of the reference's
    * enable_seqscan / work_mem planner GUC family). */
  val WhitelistKeys: Set[String] = Set(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
    "spark.sql.shuffle.partitions",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.adaptive.enabled",
    "spark.sql.cbo.enabled",
    "spark.sql.join.preferSortMergeJoin")

  /** Whitelisted prefixes: the repo's own rule gates are all
    * per-statement-safe planner toggles. */
  val WhitelistPrefixes: Seq[String] = Seq("spark.graft.")

  private def whitelisted(key: String): Boolean =
    WhitelistKeys.contains(key) || WhitelistPrefixes.exists(key.startsWith)

  /** One parsed statement: the text with SET items stripped, the
    * (key, value) pairs found, in order. */
  private[graft] final case class Scan(cleanSql: String,
                                       sets: Seq[(String, String)])

  /** Extract `SET(...)` items from every `+`-prefixed hint block comment
    * in `text`, rebuilding each comment without them (a comment left
    * with no items is dropped entirely, so the remaining text re-parses
    * cleanly). Non-SET items pass through verbatim — LEADING/ROWS/
    * strategy hints compose in the same comment. A block whose body
    * fails to tokenize is left byte-identical (and contributes no
    * sets) — fail open to Spark's own parse behavior. */
  private[graft] def scan(text: String): Scan = {
    val out = new StringBuilder
    val sets = scala.collection.mutable.ListBuffer[(String, String)]()
    var i = 0
    while (i < text.length) {
      val start = text.indexOf("/*+", i)
      if (start < 0) { out.append(text.substring(i)); i = text.length }
      else {
        val end = text.indexOf("*/", start + 3)
        if (end < 0) { out.append(text.substring(i)); i = text.length }
        else {
          out.append(text.substring(i, start))
          val body = text.substring(start + 3, end)
          tokenizeItems(body) match {
            case None => out.append(text.substring(start, end + 2))
            case Some(items) =>
              val (setItems, rest) = items.partition(
                _.name.equalsIgnoreCase("set"))
              setItems.foreach { it =>
                parseSetArgs(it.args) match {
                  case Some(kv) => sets += kv
                  case None => logWarning(
                    s"SET hint ignored: expected (key value), got " +
                      s"(${it.args.mkString(", ")})")
                }
              }
              if (rest.nonEmpty)
                out.append("/*+ ")
                  .append(rest.map(_.raw).mkString(", ")).append(" */")
          }
          i = end + 2
        }
      }
    }
    Scan(out.toString, sets.toList)
  }

  private final case class Item(name: String, args: Seq[String], raw: String)

  /** Tokenize a hint-comment body into `name(args)` items (comma or
    * space separated, quote-aware). None = unrecognized content. */
  private def tokenizeItems(body: String): Option[Seq[Item]] = {
    val items = scala.collection.mutable.ListBuffer[Item]()
    var i = 0
    def skipSep(): Unit =
      while (i < body.length &&
             (body.charAt(i).isWhitespace || body.charAt(i) == ',')) i += 1
    skipSep()
    while (i < body.length) {
      val nameStart = i
      while (i < body.length &&
             (body.charAt(i).isLetterOrDigit || body.charAt(i) == '_')) i += 1
      if (i == nameStart) return None // not an identifier where one is due
      val name = body.substring(nameStart, i)
      while (i < body.length && body.charAt(i).isWhitespace) i += 1
      if (i < body.length && body.charAt(i) == '(') {
        val argStart = i + 1
        var depth = 1
        i += 1
        while (i < body.length && depth > 0) {
          body.charAt(i) match {
            case '\'' => // quoted run ('' escape)
              i += 1
              while (i < body.length &&
                     !(body.charAt(i) == '\'' &&
                       (i + 1 >= body.length || body.charAt(i + 1) != '\''))) {
                if (body.charAt(i) == '\'') i += 1
                i += 1
              }
              i += 1
            case '(' => depth += 1; i += 1
            case ')' => depth -= 1; i += 1
            case _ => i += 1
          }
        }
        if (depth != 0) return None
        val argsRaw = body.substring(argStart, i - 1)
        items += Item(name, splitArgs(argsRaw),
          body.substring(nameStart, i).trim)
      } else {
        items += Item(name, Seq.empty, name) // bare hint (e.g. REBALANCE)
      }
      skipSep()
    }
    Some(items.toList)
  }

  /** Split an arg string on top-level commas/whitespace; a quoted arg
    * keeps its inner spaces (quotes stripped, '' unescaped). */
  private def splitArgs(s: String): Seq[String] = {
    val args = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == ','))
        i += 1
      if (i < s.length) {
        if (s.charAt(i) == '\'') {
          val sb = new StringBuilder
          i += 1
          while (i < s.length &&
                 !(s.charAt(i) == '\'' &&
                   (i + 1 >= s.length || s.charAt(i + 1) != '\''))) {
            if (s.charAt(i) == '\'') { sb.append('\''); i += 1 }
            else sb.append(s.charAt(i))
            i += 1
          }
          i += 1
          args += sb.toString
        } else {
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace &&
                 s.charAt(i) != ',') i += 1
          args += s.substring(start, i)
        }
      }
    }
    args.toList
  }

  private def parseSetArgs(args: Seq[String]): Option[(String, String)] =
    args match {
      case Seq(k, v) => Some((k, v))
      case _ => None
    }

  /** Run `queryText` with any `SET(...)` hints applied as a
    * per-statement conf scope: whitelisted keys are set before planning,
    * the FULL plan pipeline runs under the scoped conf, and every
    * touched key is restored (to its prior value, or unset back to the
    * default) in a `finally` — error or not, exactly the reference's
    * PG_TRY bracket. Declined keys warn and are left untouched. */
  def sql(spark: SparkSession, queryText: String): DataFrame = {
    val scanned = scan(queryText)
    if (scanned.sets.isEmpty) return spark.sql(scanned.cleanSql)
    if (spark.conf.get(EnabledConf, "true") != "true") {
      logWarning(s"SET hints ignored ($EnabledConf=false): " +
        scanned.sets.map(_._1).mkString(", "))
      return spark.sql(scanned.cleanSql)
    }
    val (applied, declined) = scanned.sets.partition(kv => whitelisted(kv._1))
    declined.foreach { case (k, _) =>
      logWarning(s"SET hint ignored: '$k' is not a whitelisted " +
        "per-statement planner key (allowed: " +
        s"${WhitelistKeys.mkString(", ")} and the " +
        s"${WhitelistPrefixes.mkString("/")} namespaces)")
    }
    if (applied.isEmpty) return spark.sql(scanned.cleanSql)
    val aqeOn = spark.conf.get("spark.sql.adaptive.enabled", "true") == "true"
    val useClone = spark.conf.get(CloneScopeConf, "auto") match {
      case "true" => true
      case "false" => false
      case _ => aqeOn
    }
    if (useClone) {
      // statement-scoped session clone: AQE's runtime re-planning reads
      // the conf of the session the plan was built on, so applying the
      // keys to a clone scopes them to this statement's WHOLE life —
      // initial plan and every re-decision — while the caller's session
      // is never touched (restore by construction)
      val scoped = org.apache.spark.sql.GraftSessionClone.cloneSession(spark)
      applied.foreach { case (k, v) =>
        logInfo(s"SET hint: $k = $v (statement-scoped session clone)")
        scoped.conf.set(k, v)
      }
      scoped.sql(scanned.cleanSql)
    } else {
      val saved: Seq[(String, Option[String])] =
        applied.map(_._1).distinct.map(k => k -> spark.conf.getOption(k))
      try {
        applied.foreach { case (k, v) =>
          logInfo(s"SET hint: $k = $v (statement scope)")
          spark.conf.set(k, v)
        }
        val df = spark.sql(scanned.cleanSql)
        // force the whole planning pipeline inside the scope — this is
        // the window pg_hint_plan brackets (plan now, execute later
        // under the restored conf)
        df.queryExecution.executedPlan
        df
      } finally {
        saved.foreach {
          case (k, Some(prior)) => spark.conf.set(k, prior)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }
  }
}
