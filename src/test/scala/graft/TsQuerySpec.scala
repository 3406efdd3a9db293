package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TsQuery
import graft.functions.TsQuery._

/** Parser + compiler coverage for the tsquery dialect translator. */
class TsQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---- parser -----------------------------------------------------------

  test("precedence: | binds loosest, then &, then <->, then !") {
    assert(parse("a | b & c") ==
      Or(Lexeme("a", false), And(Lexeme("b", false), Lexeme("c", false))))
    assert(parse("a & b <-> c") ==
      And(Lexeme("a", false), Phrase(Lexeme("b", false), Lexeme("c", false), 1)))
    assert(parse("!a <-> b") ==
      Phrase(Not(Lexeme("a", false)), Lexeme("b", false), 1))
  }

  test("parens override precedence; phrases are left-associative") {
    assert(parse("(a | b) & c") ==
      And(Or(Lexeme("a", false), Lexeme("b", false)), Lexeme("c", false)))
    assert(parse("a <-> b <2> c") ==
      Phrase(Phrase(Lexeme("a", false), Lexeme("b", false), 1),
             Lexeme("c", false), 2))
  }

  test("quoted lexemes, prefix flag, distance forms") {
    // multi-word quoted lexeme desugars to an adjacency phrase (the
    // phraseto_tsquery behavior) — see the parser's departure note
    assert(parse("'hash join'") ==
      Phrase(Lexeme("hash", false), Lexeme("join", false), 1))
    assert(parse("'a b c'") == Phrase(
      Phrase(Lexeme("a", false), Lexeme("b", false), 1), Lexeme("c", false), 1))
    assert(parse("wind:*") == Lexeme("wind", true))
    assert(parse("a <7> b") == Phrase(Lexeme("a", false), Lexeme("b", false), 7))
  }

  test("syntax errors throw: unbalanced parens, dangling ops, empty, bad dist") {
    Seq("(a & b", "a &", "", "a <x> b", "a !", "& a").foreach { bad =>
      assertThrows[IllegalArgumentException](parse(bad))
    }
  }

  test("AND/NOT inside a phrase operand is rejected as unsupported") {
    val sp = spark; import sp.implicits._
    val df = Seq(Tuple1("a b c")).toDF("text")
    val words = split(col("text"), " ")
    assertThrows[IllegalArgumentException] {
      df.select(TsQuery.matches("(a & b) <-> c", words)).collect()
    }
  }

  // ---- compiler ---------------------------------------------------------

  private def matchIds(q: String, docs: Seq[(Long, String)]): Set[Long] = {
    val sp = spark; import sp.implicits._
    docs.toDF("id", "text")
      .filter(TsQuery.matches(q, split(col("text"), " ")))
      .collect().map(_.getLong(0)).toSet
  }

  private val corpus = Seq(
    1L -> "fast hash join on the table",
    2L -> "merge sort with stream input",
    3L -> "slow scan then hash then join",
    4L -> "window agg over fast scan",
    5L -> "hash windowed join")

  test("boolean combinators and prefix over a known corpus") {
    assert(matchIds("hash & join", corpus) == Set(1L, 3L, 5L))
    assert(matchIds("hash | merge", corpus) == Set(1L, 2L, 3L, 5L))
    assert(matchIds("(hash | merge) & !stream", corpus) == Set(1L, 3L, 5L))
    assert(matchIds("wind:*", corpus) == Set(4L, 5L))
    assert(matchIds("!hash & !merge", corpus) == Set(4L))
  }

  test("phrase distances: <-> adjacency, <N> exact distance, nesting") {
    assert(matchIds("hash <-> join", corpus) == Set(1L))
    assert(matchIds("'hash join'", corpus) == Set(1L)) // desugared phrase
    assert(matchIds("hash <2> join", corpus) == Set(3L, 5L))
    // (fast | slow) <-> scan: doc 3 "slow scan", doc 4 "fast scan"
    assert(matchIds("(fast | slow) <-> scan", corpus) == Set(3L, 4L))
    // left-associative chain: hash <2> join <-> ... none at distance 1 after
    assert(matchIds("fast <-> hash <-> join", corpus) == Set(1L))
  }

  test("websearch: implicit AND, quoted phrase, -negation, loosest OR") {
    assert(websearch("sad cat or fat rat") ==
      Or(And(Lexeme("sad", false), Lexeme("cat", false)),
         And(Lexeme("fat", false), Lexeme("rat", false))))
    assert(websearch("\"hash join\" -stream") ==
      And(Phrase(Lexeme("hash", false), Lexeme("join", false), 1),
          Not(Lexeme("stream", false))))
    // OR is case-insensitive; a negated quote negates the whole phrase
    assert(websearch("a OR -\"b c\"") ==
      Or(Lexeme("a", false),
         Not(Phrase(Lexeme("b", false), Lexeme("c", false), 1))))
    // stray punctuation is whitespace; empty OR branches collapse
    assert(websearch("or a!!, (b) or") == And(Lexeme("a", false), Lexeme("b", false)))
    assertThrows[IllegalArgumentException](websearch("  ...  "))
  }

  test("ts_rewrite: leaf, whole-node, and set-based AND/OR chain substitution") {
    // leaf inside a chain
    assert(rewrite("a & b", "a", "b | c") ==
      And(Or(Lexeme("b", false), Lexeme("c", false)), Lexeme("b", false)))
    // order-insensitive subset of an AND chain
    assert(rewrite("a & b & c", "c & a", "x") ==
      And(Lexeme("b", false), Lexeme("x", false)))
    // whole-node match
    assert(rewrite("a | b", "a | b", "c") == Lexeme("c", false))
    // no match leaves the query untouched
    assert(rewrite("a & b", "z", "x") == parse("a & b"))
    // nested operand match under a different operator
    assert(rewrite("(a & b) | c", "a & b", "x") ==
      Or(Lexeme("x", false), Lexeme("c", false)))
    // rewrite inside NOT and phrase operands
    assert(rewrite("!a <-> b", "a", "z") ==
      Phrase(Not(Lexeme("z", false)), Lexeme("b", false), 1))
  }

  test("matchCount counts phrase occurrences") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, "a b a b a")).toDF("id", "text")
    val n = df.select(TsQuery.matchCount("a <-> b", split(col("text"), " "))
      .as("n")).head.getInt(0)
    assert(n == 2)
  }
}
