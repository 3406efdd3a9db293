package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode

/** Golden-plan snapshot support — the engine's analogue of the
  * reference's ORCA minidump replays
  * (`/root/reference/src/backend/gporca/data` holds 1,248 captured
  * .mdp plans the optimizer must keep reproducing; runner
  * `gporca/server/`). A snapshot is the SimpleMode physical-plan
  * string, normalized the way the reference's regress suite normalizes
  * EXPLAIN output with gpdiff (ids, stats, and paths masked) so the
  * diff fires only on genuine plan-SHAPE drift: a join strategy flip, a
  * lost broadcast, an extra exchange, a filter no longer pushed into
  * the scan.
  *
  * Normalizations (each masks a legitimately-unstable token):
  *  - expression ids `#123` and `plan_id=7` — shift with any unrelated
  *    analysis, carry no shape information;
  *  - subquery/CTE ordinals `subquery#N`, `cte` ids via the same rule;
  *  - file locations / InMemoryFileIndex entries — absolute paths and
  *    path counts vary with fixture layout and temp dirs;
  *  - truncation ellipses after Location (SimpleMode clips long lines);
  *  - sizes/rowcounts inside `Statistics(...)` (AQE-estimated).
  */
object PlanSnapshot {

  def physicalPlan(df: DataFrame): String =
    normalize(df.queryExecution.explainString(SimpleMode))

  def normalize(plan: String): String =
    plan.linesIterator
      .map { l =>
        l.replaceAll("#\\d+", "#N")
          // JVM-run-specific identities on typed-API lambdas and
          // reference objects: Lambda$123/0x7f..@1a2b3c
          .replaceAll("Lambda\\$\\d+/0x[0-9a-fA-F]+", "Lambda\\$N")
          // identity hashes are 1-8 hex chars (a 5-char hash slipped a
          // {6,} floor and flaked m_decode_features once per ~16 runs)
          .replaceAll("@[0-9a-fA-F]+", "@N")
          .replaceAll("plan_id=\\d+", "plan_id=N")
          .replaceAll("Statistics\\([^)]*\\)", "Statistics(X)")
          .replaceAll("InMemoryFileIndex\\([^)]*\\)", "InMemoryFileIndex(X)")
          .replaceAll("\\[file:[^\\]]*\\]?", "[file:X]")
          .replaceAll("file:[^\\s,\\]\\)]+", "file:X")
          // SimpleMode clips scan lines at 100 chars mid-token; the clip
          // point moves with path length, so drop everything after the
          // location marker on scan lines
          .replaceAll("Location: .*", "Location: X")
          // ...and the clip point inside other long fields moves with raw
          // exprId digit width (truncation happens BEFORE our #N masking),
          // so mask the clipped tail token itself
          .replaceAll("\\S*\\.\\.\\.", "<clip>")
          // multi-DQA expand: which DISTINCT branch gets which gid is an
          // exprId-hash-order artifact, not plan shape
          .replaceAll("gid#N = \\d+", "gid#N = G")
          // higher-order-function lambda variables carry a GLOBAL
          // JVM-lifetime ordinal (x_1 vs x_36 depending on what planned
          // earlier in the session) — not shape
          .replaceAll("\\b([A-Za-z][A-Za-z0-9]*)_\\d+#N", "$1_M#N")
          .replaceAll("\\s+$", "")
      }
      .map(sortSetLists)
      .mkString("\n")
      .trim

  /** Aggregate grouping keys and hash-partitioning columns are SETS —
    * RewriteDistinctAggregates emits them in exprId-hash order, which
    * varies run to run. Sort the top-level comma-separated elements of
    * `keys=[...]` and `hashpartitioning(...)` so element order never
    * diffs; a genuinely added/removed key still fails. */
  private[plans] def sortSetLists(line: String): String = {
    def sortedInner(inner: String): String =
      splitTop(inner).sorted.mkString(", ")
    // Expand emits one projection array per grouping-set branch; which
    // branch lands where (and thus the positional output order of the
    // distinct columns) follows exprId-hash order. Canonicalize by
    // sorting every bracket group on the line recursively — a genuinely
    // added/removed branch or column still changes the content. The
    // bare-integer gid ordinal inside each branch is masked to G first:
    // it pins WHICH distinct branch got which gid, itself an
    // exprId-hash-order artifact, and with it unmasked the sorted
    // branch list still differs run-to-run.
    if (line.contains("Expand [")) return canonBrackets(line, maskInts = true)
    val k = "keys=\\[([^\\]]*)\\]".r
      .replaceAllIn(line, m => java.util.regex.Matcher.quoteReplacement(
        s"keys=[${sortedInner(m.group(1))}]"))
    val hp = "hashpartitioning\\(".r
    hp.findFirstMatchIn(k) match {
      case Some(m) =>
        // find the matching close paren at depth 0
        var depth = 1; var i = m.end
        while (i < k.length && depth > 0) {
          if (k.charAt(i) == '(') depth += 1
          else if (k.charAt(i) == ')') depth -= 1
          i += 1
        }
        if (depth == 0) {
          val inner = k.substring(m.end, i - 1)
          k.substring(0, m.end) + sortedInner(inner) + k.substring(i - 1)
        } else k
      case None => k
    }
  }

  /** Recursively sort the elements of every `[...]` group in `line`
    * (innermost first), leaving text outside brackets in place. With
    * `maskInts`, bare-integer elements (grouping-set gid ordinals) are
    * replaced by `G` before sorting. */
  private def canonBrackets(line: String, maskInts: Boolean = false): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '[') {
        // find matching close bracket (parens tracked so ']' inside
        // element_at(x, arr[...]) style text can't confuse the scan)
        var depth = 1; var j = i + 1
        while (j < line.length && depth > 0) {
          line.charAt(j) match {
            case '[' => depth += 1
            case ']' => depth -= 1
            case _ =>
          }
          j += 1
        }
        val inner = canonBrackets(line.substring(i + 1, j - 1), maskInts)
        val elems = splitTop(inner)
          .map(e => if (maskInts && e.matches("\\d+")) "G" else e)
        sb.append('[').append(elems.sorted.mkString(", "))
          .append(']')
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** Split on commas at bracket/paren depth 0. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start).trim
    out.filter(_.nonEmpty).toSeq
  }
}
