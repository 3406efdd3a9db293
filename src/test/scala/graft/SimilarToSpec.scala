package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimilarTo.toRegex

/** SIMILAR TO dialect translator vs the reference's semantics
  * (`similar_escape`, regexp.c:687-775) — cases drawn from the PG docs'
  * examples and `src/test/regress/sql/strings.sql`. */
class SimilarToSpec extends AnyFunSuite {
  private def m(s: String, p: String, escape: Option[Char] = Some('\\')) =
    s.matches(toRegex(p, escape))

  test("entire-string anchoring (LIKE-style, not substring search)") {
    assert(m("abc", "abc"))
    assert(!m("abc", "a"))        // PG doc example: false
    assert(!m("abc", "b"))        // unanchored regex would hit
    assert(!m("foobar", "foo"))
  }

  test("% and _ wildcards") {
    assert(m("abc", "a_c"))
    assert(!m("abc", "a_b"))
    assert(m("foobar", "foo%"))
    assert(m("foobar", "%bar"))
    assert(!m("abcd", "a_"))
  }

  test("alternation, repetition, grouping, bounds") {
    assert(m("abc", "%(b|d)%"))   // PG doc example: true
    assert(!m("abc", "(b|c)%"))   // PG doc example: false
    assert(m("abc", "ab*c"))
    assert(m("ac", "ab*c"))
    assert(m("abbc", "ab+c"))
    assert(!m("ac", "ab+c"))
    assert(m("abc", "ab?c"))
    assert(m("aa", "a{2}"))
    assert(!m("aaa", "a{2}"))
    assert(m("aaa", "a{2,}"))
  }

  test("bracket expressions pass through, including ^ negation and ] literal") {
    assert(m("10 downing st", "[0-9]+ %"))
    assert(m("abc", "[a-c]+"))
    assert(!m("abz", "[a-c]+"))
    assert(m("xyz", "[^0-9]+"))
    assert(m("a]b", "a[]]b"))     // ] first in class is literal
    assert(m("%_", "[%_]%"))      // wildcards are literal inside a class
  }

  test(". ^ $ are literals in the SQL dialect") {
    assert(!m("abc", "a.c"))
    assert(m("a.c", "a.c"))
    assert(m("x^y", "x^y"))
    assert(m("x$", "x$"))
    assert(!m("x", "x$"))
  }

  test("escape character makes wildcards literal") {
    assert(m("50%", "50\\%"))
    assert(!m("50x", "50\\%"))
    assert(m("a_b", "a\\_b"))
    assert(!m("axb", "a\\_b"))
    assert(m("a\\b", "a\\\\b"))   // escaped escape char is a literal \
    // custom escape char (ESCAPE '#')
    assert(m("50%", "50#%", escape = Some('#')))
    assert(!m("50x", "50#%", escape = Some('#')))
    // no escape char (ESCAPE ''): backslash is an ordinary literal
    assert(m("a\\b", "a\\b", escape = None))
  }

  test("escaped letters stay literal letters, never regex classes") {
    assert(m("d", "\\d"))         // NOT java's digit class
    assert(!m("5", "\\d"))
  }

  test("malformed patterns are rejected") {
    assertThrows[IllegalArgumentException](toRegex("abc\\"))
    assertThrows[IllegalArgumentException](toRegex("a[bc"))
  }
}
