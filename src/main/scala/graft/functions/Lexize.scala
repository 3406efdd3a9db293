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

  /** Ispell-style exception dictionary — the irregular-forms lookup the
    * reference front-loads via `dict_ispell.c`/`spell.c` before the
    * algorithmic stemmer ever sees the token ("mice" must become
    * "mouse"; no suffix rule can do that). Chain discipline (ts_parse.c
    * LexizeExec): the FIRST dictionary that returns a lexeme wins, so a
    * hit here bypasses the suffix stemmer entirely. Every target value
    * is a fixed point of both suffix-rule groups and of the thesaurus
    * below (LexizeSpec proves this mechanically), which is what lets the
    * staged per-array passes compose without a bypass flag. */
  val IrregularForms: Seq[(String, String)] = Seq(
    "mice" -> "mouse", "geese" -> "goose", "feet" -> "foot",
    "teeth" -> "tooth", "children" -> "child", "men" -> "man",
    "women" -> "woman", "people" -> "person", "indices" -> "index",
    "matrices" -> "matrix", "vertices" -> "vertex", "leaves" -> "leaf",
    "wolves" -> "wolf", "knives" -> "knife", "oxen" -> "ox",
    "ran" -> "run", "wrote" -> "write", "took" -> "take", "went" -> "go")

  /** Thesaurus dictionary (`dict_thesaurus.c`): canonical-synonym
    * folding applied to LEXEMES (after stemming, like a thesaurus over a
    * stemmer subdictionary) — "rapidly" stems to "rapid", then folds to
    * "fast". Targets are their own fixed points (proved in LexizeSpec). */
  val Synonyms: Seq[(String, String)] = Seq(
    "rapid" -> "fast", "quick" -> "fast", "speedy" -> "fast",
    "big" -> "large", "huge" -> "large",
    "tiny" -> "small", "little" -> "small")

  /** Extended-synonym groups (`/root/reference/contrib/dict_xsyn/
    * dict_xsyn.c`; sample rule file `xsyn_sample.rules`): a group HEAD
    * expands to multiple lexemes so a document containing only the head
    * is findable by any synonym. Heads are real corpus-vocabulary words;
    * targets are out-of-vocabulary by construction so a synonym match
    * can only come from the expansion. */
  val XsynGroups: Seq[(String, Seq[String])] = Seq(
    "agg"  -> Seq("aggregate", "aggregation"),
    "scan" -> Seq("seqscan", "tablescan"),
    "dup"  -> Seq("duplicate", "redundant"),
    "sort" -> Seq("orderby"))

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

  private def mapCol(w: Column, m: Seq[(String, String)], els: Column): Column =
    m.foldRight(els) { case ((k, v), e) => when(w === k, lit(v)).otherwise(e) }

  /** Full dictionary CHAIN (LexizeExec order): lowercase -> stop filter
    * -> ispell irregular lookup (hit bypasses the stemmer) -> plural +
    * suffix rules -> thesaurus folding. Three staged array transforms so
    * no expression subtree is duplicated; the bypass needs no flag
    * because irregular targets are suffix-rule fixed points. */
  def tsvectorChain(words: Column): Column = {
    val stops = array(StopWords.map(lit): _*)
    val filtered = filter(transform(words, w => lower(w)),
      w => length(w) > 0 && !array_contains(stops, w))
    val s1 = transform(filtered,
      w => mapCol(w, IrregularForms, groupCol(w, PluralRules)))
    val s2 = transform(s1, w => groupCol(w, SuffixRules))
    transform(s2, w => mapCol(w, Synonyms, w))
  }

  private def xsynCol(w: Column, keepOrig: Boolean): Column =
    XsynGroups.foldRight(array(w)) { case ((h, syns), els) =>
      when(w === h,
        array((if (keepOrig) h +: syns else syns).map(lit): _*)).otherwise(els)
    }

  /** dict_int dictionary (`/root/reference/contrib/dict_int/dict_int.c`):
    * integer tokens are normalized — `absval` strips the sign, tokens
    * longer than `maxLen` digits are truncated to their first `maxLen`
    * digits, or REJECTED (null -> filtered) when `rejectLong` is set;
    * non-integer tokens pass through to the rest of the chain untouched.
    * The reference's defaults are maxlen=6, rejectlong=false. */
  def dictInt(w: Column, maxLen: Int, rejectLong: Boolean,
              absVal: Boolean): Column = {
    val digits = if (absVal) regexp_replace(w, "^-", "") else w
    when(w.rlike("^-?[0-9]+$"),
      when(length(digits) > maxLen,
        if (rejectLong) lit(null).cast("string")
        else digits.substr(lit(1), lit(maxLen)))
        .otherwise(digits))
      .otherwise(w)
  }

  /** DuckDB CASE mirroring [[dictInt]], generated from the same options. */
  def duckDictInt(v: String, maxLen: Int, rejectLong: Boolean,
                  absVal: Boolean): String = {
    val digits = if (absVal) s"regexp_replace($v, '^-', '')" else v
    val long =
      if (rejectLong) "NULL"
      else s"substr($digits, 1, $maxLen)"
    s"CASE WHEN regexp_matches($v, '^-?[0-9]+$$') THEN " +
      s"(CASE WHEN len($digits) > $maxLen THEN $long ELSE $digits END) " +
      s"ELSE $v END"
  }

  /** dict_xsyn expansion over a lexeme array: every group head becomes
    * its synonym set (`keepOrig` = the dictionary's keeporig option —
    * true keeps the head in the output, dict_xsyn's default; false
    * replaces it). Non-head lexemes pass through unchanged. Pure
    * map-side flatten, like every other lexize stage. */
  def xsynExpand(words: Column, keepOrig: Boolean): Column =
    flatten(transform(words, w => xsynCol(w, keepOrig)))

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

  private def mapSql(v: String, m: Seq[(String, String)], els: String): String =
    m.map { case (k, mv) => s"WHEN $v = '$k' THEN '$mv'" }
      .mkString("CASE ", " ", s" ELSE $els END")

  /** DuckDB chain stage 1: irregular lookup, else the plural rules —
    * generated from the same tables as the Column form. */
  def duckIrregularOrPlural(v: String): String =
    mapSql(v, IrregularForms, groupSql(v, PluralRules))

  /** DuckDB chain stage 3: thesaurus folding. */
  def duckSynonym(v: String): String = mapSql(v, Synonyms, v)

  /** DuckDB CASE mirroring [[xsynExpand]]'s per-lexeme expansion —
    * generated from the same [[XsynGroups]] table. */
  def duckXsyn(v: String, keepOrig: Boolean): String =
    XsynGroups.map { case (h, syns) =>
      val lst = (if (keepOrig) h +: syns else syns)
        .map("'" + _ + "'").mkString("[", ", ", "]")
      s"WHEN $v = '$h' THEN $lst"
    }.mkString("CASE ", " ", s" ELSE [$v] END")
}
