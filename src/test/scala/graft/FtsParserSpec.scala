package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FtsDefaultParser

/** Default text-search parser vs the reference regress: the big
  * ts_parse('default', ...) vector from
  * `src/test/regress/sql/tsearch.sql` with its complete 139-row
  * expected output (`expected/tsearch.out`) transcribed as the oracle.
  * Covers uint/float/sfloat/version, email, protocol/url/host/url_path
  * compounds, files, hyphenated-word part emission, tags (including
  * quoted attributes with embedded angle brackets), entities, and the
  * exact blank-run boundaries. */
class FtsParserSpec extends AnyFunSuite {

  import graft.queries.TsParserRegress

  private val regressInput = TsParserRegress.big
  private val expected: Seq[(Int, String)] = TsParserRegress.bigExpected

  test("the full regress ts_parse vector matches token-for-token") {
    val got = FtsDefaultParser.parse(regressInput)
    val exp = expected.toVector
    val firstDiff = got.zipAll(exp, null, null).indexWhere {
      case (a, b) => a != b
    }
    assert(firstDiff == -1,
      s"first divergence at index $firstDiff: got=${got.lift(firstDiff)} " +
        s"expected=${exp.lift(firstDiff)}\ncontext got=" +
        got.slice(math.max(0, firstDiff - 2), firstDiff + 3).mkString(" | "))
    assert(got.size == exp.size)
  }

  test("token text concatenation reproduces the input exactly (no gaps)") {
    // every character lands in exactly one token EXCEPT the re-emitted
    // compound spans (url/host/url_path triples, hword parts)
    val simple = "a plain sentence with 2 numbers 3.14 and-a-hyphen."
    val toks = FtsDefaultParser.parse(simple)
    val nonCompound = toks.filterNot(t =>
      Set(6, 18, 9, 10, 11).contains(t._1) ||
        (t._1 == 12 && t._2 == "-" && toks.exists(x => x._1 == 16)))
    assert(nonCompound.map(_._2).mkString == simple)
  }

  test("ts_debug URL examples (tsearch.out)") {
    assert(FtsDefaultParser.parse(TsParserRegress.url1) ==
      TsParserRegress.url1Expected.toVector)
    assert(FtsDefaultParser.parse(TsParserRegress.url2) ==
      TsParserRegress.url2Expected.toVector)
  }

  test("ts_debug entity example (tsearch.out)") {
    assert(FtsDefaultParser.parse(TsParserRegress.entity) ==
      TsParserRegress.entityExpected.toVector)
  }

  test("pathological multi-kilobyte dotted tokens degrade, never crash") {
    // would walk the recursive host/file chain ~stack-deep without the
    // recursion budget; must yield tokens (degraded is fine), not a
    // StackOverflowError
    val giant = ("ab." * 30000) + "cd"
    val toks = FtsDefaultParser.parse(giant)
    assert(toks.nonEmpty)
    assert(toks.map(_._2.length).sum >= giant.length)
    val giant2 = "a" * 100000 // huge plain word: iterative, exact
    assert(FtsDefaultParser.parse(giant2) == Vector(1 -> giant2))
  }

  test("SGML comments and DOCTYPE parse as single tags") {
    assert(FtsDefaultParser.parse("a<!-- x<y -->b") == Vector(
      1 -> "a", 13 -> "<!-- x<y -->", 1 -> "b"))
    // extra dashes before '>' are tolerated; "--x" stays in the body
    assert(FtsDefaultParser.parse("<!-- a --b --->z") == Vector(
      13 -> "<!-- a --b --->", 1 -> "z"))
    assert(FtsDefaultParser.parse("<!DOCTYPE html>x") == Vector(
      13 -> "<!DOCTYPE html>", 1 -> "x"))
    // unterminated comment is not a tag: "<!" becomes a blank run
    // (the '-' stops it, being a potential signed-number start)
    assert(FtsDefaultParser.parse("<!-- open").head == (12 -> "<!"))
  }

  test("version numbers and non-ascii words") {
    assert(FtsDefaultParser.parse("v 1.2.3") ==
      Vector(1 -> "v", 12 -> " ", 8 -> "1.2.3"))
    assert(FtsDefaultParser.parse("café") == Vector(2 -> "café"))
    assert(FtsDefaultParser.parse("café-bar") == Vector(
      17 -> "café-bar", 10 -> "café", 12 -> "-", 11 -> "bar"))
    assert(FtsDefaultParser.parse("ab-c1d") == Vector(
      15 -> "ab-c1d", 11 -> "ab", 12 -> "-", 9 -> "c1d"))
  }
}
