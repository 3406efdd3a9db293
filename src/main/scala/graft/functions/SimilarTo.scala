package graft.functions

import org.apache.spark.sql.Column

/** SQL-standard `SIMILAR TO` pattern dialect, translated to a Java regex.
  *
  * The SQL dialect is a hybrid: LIKE's `%` / `_` wildcards plus POSIX-style
  * `| * + ? ( ) [ ] { }` operators, always matching the ENTIRE string, with
  * `.` `^` `$` as ordinary literal characters. The overall scheme matches
  * the reference's `similar_escape` translator
  * (`/root/reference/src/backend/utils/adt/regexp.c:687-775`): anchor as
  * `^(?:...)$`, map `%` -> `.*` and `_` -> `.`, backslash-quote the
  * regex-special literals, and pass bracket expressions through untouched.
  * Two deliberate departures from `similar_escape`'s output:
  *   - an ESCAPED alphanumeric is emitted as a plain literal (SQL-spec
  *     behavior: `\d` matches only "d"), whereas the reference emits
  *     backslash+char verbatim, explicitly so POSIX class escapes like
  *     `\d` keep their regex meaning (regexp.c:757-766);
  *   - `(` stays a capturing group — the reference rewrites it to
  *     non-capturing `(?:` (harmless under rlike, which discards groups).
  *
  * (DuckDB's native SIMILAR TO is a plain RE2 full-match, NOT this
  * dialect — the oracle for [[graft.queries.TypeOps]]'s `q_similar_to`
  * therefore uses `regexp_full_match` with independently hand-derived
  * regexes rather than DuckDB's operator.)
  */
object SimilarTo {

  /** Translate a SIMILAR TO pattern to an anchored Java-regex string.
    * `escape = None` mirrors `... ESCAPE ''` (no escape character). */
  def toRegex(pattern: String, escape: Option[Char] = Some('\\')): String = {
    val sb = new StringBuilder("^(?:")
    var inClass = false     // inside a [...] bracket expression
    var classStart = false  // directly after '[' or '[^' (']' is literal)
    var afterEscape = false
    for (c <- pattern) {
      if (afterEscape) {
        // the escaped char is a literal. Quote it with a backslash unless
        // alphanumeric — '\' + letter would form a regex class like \d.
        if (c.isLetterOrDigit) sb.append(c) else sb.append('\\').append(c)
        afterEscape = false
      } else if (escape.contains(c)) {
        afterEscape = true
      } else if (inClass) {
        if (c == ']' && !classStart) { inClass = false; sb.append(']') }
        else {
          // POSIX allows a literal ']' directly after '[' or '[^'; Java
          // only accepts it backslash-quoted inside the class
          if (c == ']') sb.append("\\]") else sb.append(c)
          classStart = classStart && c == '^'
        }
      } else c match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '[' => inClass = true; classStart = true; sb.append('[')
        // literal in the SQL dialect, special in a regex: quote
        case '.' | '^' | '$' | '\\' => sb.append('\\').append(c)
        case other => sb.append(other)
      }
    }
    require(!afterEscape, s"SIMILAR TO pattern ends with escape char: $pattern")
    require(!inClass, s"SIMILAR TO pattern has unbalanced [: $pattern")
    sb.append(")$").toString
  }

  /** `c SIMILAR TO pattern` as a Column (codegen'd RLike under the hood —
    * the translated regex is anchored, so rlike's substring search is a
    * full match). */
  def similarTo(c: Column, pattern: String,
                escape: Option[Char] = Some('\\')): Column =
    c.rlike(toRegex(pattern, escape))
}
