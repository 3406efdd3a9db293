package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The hint TABLE — pg_hint_plan's second delivery mechanism
  * (`/root/reference/gpcontrib/pg_hint_plan/pg_hint_plan.c:1783`
  * `get_hints_from_table`): hints stored per NORMALIZED query string in
  * `hint_plan.hints(norm_query_string, application_name, hints)` and
  * applied without editing the query text — the DBA pins one bad plan
  * for a query some dashboard emits verbatim, gated by the
  * `pg_hint_plan.enable_hint_table` GUC, with an application-specific
  * row beating the `''` wildcard row.
  *
  * Spark-first: the store is a plain in-memory registry (optionally
  * loaded from any DataFrame with the same three columns — a parquet
  * table, a JDBC dim, anything; hint tables are catalog-sized, so a
  * driver-side collect is the right plan), the normalizer mirrors the
  * reference's pg_stat_statements-style fingerprint (literals masked,
  * whitespace collapsed, case-folded outside literals), and application
  * resolves from `spark.graft.hintTable.application`. [[sql]] injects
  * the stored hint as a Catalyst comment hint into the first SELECT —
  * after that, adherence is exactly [[graft.queries.Hints]]'s surface
  * (ResolveHints → JoinSelection). Gated by
  * `spark.graft.hintTable.enabled` (default false, like the GUC).
  */
object HintTable {

  val EnabledConf = "spark.graft.hintTable.enabled"
  val ApplicationConf = "spark.graft.hintTable.application"

  private[plans] final case class Entry(app: String, hints: String)

  // norm_query_string -> rows (catalog-sized; concurrent sessions share
  // the registry like they would share the hint_plan.hints table)
  private val table =
    new java.util.concurrent.ConcurrentHashMap[String, List[Entry]]()

  /** Normalized fingerprint of a query: comments stripped, string and
    * numeric literals masked to `?`, whitespace collapsed to single
    * spaces, case-folded. Two texts differing only in constants,
    * spacing, or keyword case share a fingerprint — the property the
    * reference gets from pg_stat_statements' query jumbling. */
  def normalize(sql: String): String = {
    val noComments = sql
      .replaceAll("(?s)/\\*.*?\\*/", " ")
      .replaceAll("--[^\n]*", " ")
    val sb = new StringBuilder
    var i = 0
    while (i < noComments.length) {
      val c = noComments.charAt(i)
      if (c == '\'') {
        // string literal (with '' escape): mask wholesale
        i += 1
        while (i < noComments.length &&
               !(noComments.charAt(i) == '\'' &&
                 (i + 1 >= noComments.length || noComments.charAt(i + 1) != '\''))) {
          if (noComments.charAt(i) == '\'') i += 1 // the escaped half
          i += 1
        }
        i += 1
        sb.append('?')
      } else if (c.isDigit &&
                 (sb.isEmpty || !sb.last.isLetterOrDigit && sb.last != '_')) {
        // numeric literal (not an identifier tail): mask the whole token
        while (i < noComments.length &&
               (noComments.charAt(i).isDigit || noComments.charAt(i) == '.'))
          i += 1
        sb.append('?')
      } else {
        sb.append(c.toLower)
        i += 1
      }
    }
    sb.toString.replaceAll("\\s+", " ").trim
  }

  /** Register a hint row: `queryText` is normalized here, so callers
    * pass any representative of the query family. Empty `app` is the
    * wildcard row. */
  def register(queryText: String, hints: String, app: String = ""): Unit =
    table.compute(normalize(queryText), (_, old) =>
      Entry(app, hints) :: Option(old).getOrElse(Nil).filterNot(_.app == app))

  /** Load rows from a DataFrame with columns
    * (norm_query_string, application_name, hints) — the reference's
    * table shape. The query strings are re-normalized defensively. */
  def load(df: DataFrame): Unit =
    df.select("norm_query_string", "application_name", "hints")
      .collect()
      .foreach(r => register(r.getString(0), r.getString(2), r.getString(1)))

  def clear(): Unit = table.clear()

  /** The hint string that would apply to `sql` for the session's
    * application, or None. App-specific beats wildcard (the reference's
    * `ORDER BY application_name DESC` over the two candidate rows). */
  def lookup(spark: SparkSession, sql: String): Option[String] = {
    val app = spark.conf.get(ApplicationConf, "")
    Option(table.get(normalize(sql))).flatMap { rows =>
      rows.find(e => e.app == app && app.nonEmpty)
        .orElse(rows.find(_.app == ""))
        .map(_.hints)
    }
  }

  /** End offset of the OUTERMOST `SELECT` keyword in `text`: the first
    * depth-0 occurrence outside string literals and comments. Depth
    * tracking makes `WITH c AS (SELECT ...) SELECT ...` resolve to the
    * outer statement's SELECT, and the literal scan keeps the word
    * "select" inside a quoted string from being treated as the keyword. */
  private[graft] def outerSelectEnd(text: String): Option[Int] = {
    var i = 0; var depth = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        // skip the quoted run: single-quoted literals and double-quoted
        // strings (Spark's default string delimiters) escape with a
        // BACKSLASH (and also accept the doubled delimiter); backtick
        // identifiers escape only by doubling. Honoring backslash
        // matters: a literal containing \' or \" would otherwise end
        // the scan early and a "select" later in the literal could
        // steal the outer-SELECT offset.
        val q = c
        i += 1
        while (i < text.length &&
               !(text.charAt(i) == q &&
                 (i + 1 >= text.length || text.charAt(i + 1) != q))) {
          if (q != '`' && text.charAt(i) == '\\') i += 1 // backslash escape
          else if (text.charAt(i) == q) i += 1           // the doubled half
          i += 1
        }
        i += 1
      } else if (c == '-' && i + 1 < text.length && text.charAt(i + 1) == '-') {
        while (i < text.length && text.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < text.length && text.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < text.length &&
               !(text.charAt(i) == '*' && text.charAt(i + 1) == '/')) i += 1
        i += 2
      } else if (c == '(') { depth += 1; i += 1 }
      else if (c == ')') { depth -= 1; i += 1 }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < text.length &&
               (text.charAt(i).isLetterOrDigit || text.charAt(i) == '_')) i += 1
        if (depth == 0 && text.substring(start, i).equalsIgnoreCase("select"))
          return Some(i)
      } else i += 1
    }
    None
  }

  /** Run `queryText`, injecting any registered hint for its fingerprint
    * as a comment hint into the outermost SELECT (literal- and
    * CTE-aware — see [[outerSelectEnd]]). Disabled (the default), no
    * match, or no outer SELECT → the text runs unchanged. */
  def sql(spark: SparkSession, queryText: String): DataFrame = {
    val enabled = spark.conf.get(EnabledConf, "false") == "true"
    val rewritten = if (!enabled) queryText
    else lookup(spark, queryText) match {
      case Some(h) =>
        // outermost statement block only (the reference attaches hints
        // to the whole statement; nested blocks inherit via Catalyst's
        // hint scoping)
        outerSelectEnd(queryText) match {
          case Some(end) =>
            queryText.substring(0, end) + s" /*+ $h */" +
              queryText.substring(end)
          case None => queryText
        }
      case None => queryText
    }
    // route through the Set-hint wrapper so a table row can carry
    // SET(...) alongside strategy hints (the reference applies Set hints
    // from the hint table exactly like comment ones)
    SetHint.sql(spark, rewritten)
  }
}
