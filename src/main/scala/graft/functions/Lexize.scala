package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic `ts_lexize` analogue — the dictionary-chain stage the
  * reference runs every token through before it reaches a tsvector
  * (`/root/reference/src/backend/tsearch/`: `dict_simple.c` lowercasing +
  * stop list, `spell.c` + `snowball/` suffix stemming, chain dispatch in
  * `ts_parse.c` LexizeExec; regression tests `sql/tsearch.sql`). Without
  * it, `@@` semantics diverge from the reference on any real corpus —
  * "hashes"/"hashing" must match the query term 'hash'.
  *
  * This is NOT snowball: it is a deliberately small, fully deterministic
  * suffix-stripper whose rules are expressible identically in Spark
  * Columns and ANSI-ish SQL. Both engine forms are GENERATED from the one
  * rule table below ([[stem]] and [[duckStem]]), so the oracle can never
  * drift from the engine: a rule edit changes both sides by construction.
  *
  * Pipeline order matches the reference's dictionary chain: lowercase ->
  * stop-word filter -> stem (a stop word never reaches the stemmer;
  * `dict_simple.c` returns the empty lexeme for stops first).
  *
  * Scale: pure per-token map-side compute — the whole lexize stage is a
  * `transform`/`filter` chain inside whole-stage codegen, no shuffle, no
  * UDF; at 100 TB it costs one streamed pass fused into the scan.
  */
object Lexize {

  /** One suffix rule: if the (lowercased) token ends with `suffix` and is
    * at least `minLen` chars, replace the suffix's last `drop` chars with
    * `append`; `vowelGuard` additionally requires the remaining stem to
    * contain a vowel (so "string" never strips to "str"). `drop == 0`
    * with empty `append` is a protective no-op: it claims the token and
    * shields it from later rules in the group ("glass", "bus").
    * First matching rule in a group wins. */
  final case class Rule(suffix: String, drop: Int, append: String,
                        minLen: Int, vowelGuard: Boolean)

  /** Group 1 — plural reduction (snowball step 1a analogue). */
  val PluralRules: Seq[Rule] = Seq(
    Rule("ies", 3, "y", 5, false),  // queries -> query
    Rule("sses", 2, "", 0, false),  // classes -> class
    Rule("ches", 2, "", 0, false),  // batches -> batch
    Rule("shes", 2, "", 0, false),  // hashes -> hash
    Rule("xes", 2, "", 0, false),   // boxes -> box
    Rule("zes", 2, "", 0, false),   // buzzes -> buzz
    Rule("ss", 0, "", 0, false),    // glass stays
    Rule("us", 0, "", 0, false),    // bus stays
    Rule("is", 0, "", 0, false),    // analysis stays
    Rule("s", 1, "", 4, false))     // joins -> join; gas stays (len 3)

  /** Group 2 — verbal/adverbial suffixes (snowball step 1b/1c analogue),
    * applied to group 1's output. */
  val SuffixRules: Seq[Rule] = Seq(
    Rule("eed", 0, "", 0, false),        // speed/agreed stay
    Rule("ing", 3, "", 6, true),         // hashing -> hash; string stays
    Rule("ed", 2, "", 5, true),          // sorted -> sort
    Rule("ly", 2, "", 5, true))          // quickly -> quick

  /** English stop list — the high-frequency subset of the reference's
    * `english.stop` (`src/backend/snowball/stopwords/`). */
  val StopWords: Seq[String] = Seq(
    "i", "me", "my", "we", "our", "you", "your", "he", "him", "his",
    "she", "her", "it", "its", "they", "them", "their", "this", "that",
    "these", "those", "am", "is", "are", "was", "were", "be", "been",
    "being", "have", "has", "had", "do", "does", "did", "a", "an", "the",
    "and", "but", "if", "or", "because", "as", "until", "while", "of",
    "at", "by", "for", "with", "about", "into", "through", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "then", "once", "here",
    "there", "when", "where", "why", "how", "all", "any", "both", "each",
    "few", "more", "most", "other", "some", "such", "no", "nor", "not",
    "only", "own", "same", "so", "than", "too", "very", "can", "will",
    "just", "should", "now")

  // ---- Spark Column form -------------------------------------------------

  private def stemCol(c: Column, r: Rule): Column =
    if (r.drop == 0 && r.append.isEmpty) c
    else concat(c.substr(lit(1), length(c) - lit(r.drop)), lit(r.append))

  private def condCol(c: Column, r: Rule): Column = {
    var k: Column = c.endsWith(r.suffix)
    if (r.minLen > 0) k = k && length(c) >= r.minLen
    if (r.vowelGuard)
      k = k && c.substr(lit(1), length(c) - lit(r.drop)).rlike("[aeiou]")
    k
  }

  private def groupCol(c: Column, rules: Seq[Rule]): Column =
    rules.foldRight(c)((r, els) => when(condCol(c, r), stemCol(c, r)).otherwise(els))

  /** Stem one already-lowercased, non-stop token. */
  def stem(c: Column): Column = groupCol(groupCol(c, PluralRules), SuffixRules)

  /** Full lexize: word array -> lexeme array (lowercase, drop stops and
    * empties, stem). Order-preserving; duplicates kept (tf-carrying). */
  def tsvector(words: Column): Column = {
    val stops = array(StopWords.map(lit): _*)
    transform(
      filter(transform(words, w => lower(w)),
        w => length(w) > 0 && !array_contains(stops, w)),
      w => stem(w))
  }

  // ---- DuckDB SQL form (generated from the same tables) ------------------

  private def stemSql(v: String, r: Rule): String =
    if (r.drop == 0 && r.append.isEmpty) v
    else {
      val base = s"substr($v, 1, len($v) - ${r.drop})"
      if (r.append.isEmpty) base else s"$base || '${r.append}'"
    }

  private def condSql(v: String, r: Rule): String = {
    val parts = Seq(s"suffix($v, '${r.suffix}')") ++
      (if (r.minLen > 0) Seq(s"len($v) >= ${r.minLen}") else Nil) ++
      (if (r.vowelGuard)
        Seq(s"regexp_matches(substr($v, 1, len($v) - ${r.drop}), '[aeiou]')")
      else Nil)
    parts.mkString(" AND ")
  }

  private def groupSql(v: String, rules: Seq[Rule]): String =
    rules.map(r => s"WHEN ${condSql(v, r)} THEN ${stemSql(v, r)}")
      .mkString("CASE ", " ", s" ELSE $v END")

  /** DuckDB CASE applying ONE rule group to word expression `v` — apply
    * [[duckStemPlural]] then [[duckStemSuffix]] in successive
    * list_transform stages (nesting both in one expression would square
    * the text). */
  def duckStemPlural(v: String): String = groupSql(v, PluralRules)
  def duckStemSuffix(v: String): String = groupSql(v, SuffixRules)

  /** DuckDB stop-list literal: `('a','the',...)`. */
  def duckStopList: String = StopWords.map("'" + _ + "'").mkString("(", ",", ")")
}
