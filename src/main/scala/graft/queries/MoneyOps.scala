package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables._

/** PG MONEY type semantics — reference `src/backend/utils/adt/cash.c`
  * (cash_in:100-300, cash_out:318-470, num_word:38-88, cash_words:945-1025)
  * and `src/test/regress/sql/money.sql`.
  *
  * The money type is an int64 of cents (C locale: frac_digits=2, '$'
  * currency, ',' thousands, '.' decimal). The lane covers the regress's
  * surface: cash_in over the accepted input shapes (canonical '$1,234.56',
  * bare digits, '(..)' accounting negatives, trailing sign, a third decimal
  * digit that HALF-UP rounds on the immediate next char only — cash_in:233,
  * '0.124999' stays 0.12 — and the ws/sign/ws/currency/ws prefix run),
  * cash_out's canonical render, +/-, money*int, money/int (C truncation
  * toward zero, NOT floor — cash.c cash_div_int8), money*float8 and
  * money/float8 (C `rint`, i.e. HALF-EVEN — the regress's own
  * 878.08/11::float8=$79.83 vs /11::bigint=$79.82 contrast), money/money
  * (float8 ratio), cashlarger/cashsmaller, and cash_words' English render
  * with its quirks preserved (the "and" only for sub-20 remainders after
  * "hundred", the double space when a 3-digit group is empty, "minus zero
  * dollars", singular dollar/cent at exactly 1).
  *
  * Every formula is built ONCE as SQL text and run verbatim by BOTH engines
  * (the q_earth_distance discipline) — Spark via chained `selectExpr`,
  * DuckDB via the same strings spliced into CTEs. Only engine-portable
  * primitives appear (translate/instr/substr/lpad/floor/abs/greatest —
  * probed identical), so the two engines cannot diverge on operator choice;
  * rint is spelled out as an explicit floor-plus-tie-parity CASE because
  * Spark names it `rint` and DuckDB `round_even`. All scalar per-row work:
  * map-side, no shuffle beyond the final ORDER BY.
  *
  * Known codegen fallback (identified r16, present since the lane landed):
  * the cash_words render instantiates the num_word CASE tree ~12 times
  * (3 groups x the unit/tens sub-CASEs), and the generated projection
  * method trips janino's limits — Spark logs an InternalCompilerException
  * and falls back off whole-stage codegen for this one plan. Deliberate
  * trade: the lane is BOUNDED at 240 rows by its own filter (the regress's
  * money surface is a fixed-vector test, not a scan operator), so the
  * fallback costs microseconds, while splitting the verbatim-shared SQL
  * text to appease codegen would break the run-identical-text-in-both-
  * engines discipline that makes the oracle exact. Not a scale surface.
  */
object MoneyOps extends QueryModule {

  private val D = "$" // literal dollar for interpolation

  // ---- shared formula text (verbatim in both engines) ----

  private val baseExprs = Seq(
    "p_partkey AS pk",
    "CAST((p_partkey * 7919) % 2000001 - 1000000 AS BIGINT) AS c",
    "CAST((p_partkey * 104729) % 900001 + 100000 AS BIGINT) AS c2",
    "CAST(p_partkey % 10 AS BIGINT) AS d3",
    "CAST(p_partkey % 6 AS INT) AS fmt")

  /** Comma-group a non-negative dollar count < 10^6 (one separator max at
    * this lane's range; cash_out groups by 3 from the radix point). */
  private def grp(d: String): String =
    s"CASE WHEN ($d) < 1000 THEN CAST($d AS STRING) " +
      s"ELSE CAST(CAST(FLOOR(($d)/1000) AS BIGINT) AS STRING) || ',' || " +
      s"lpad(CAST(($d) % 1000 AS STRING), 3, '0') END"

  private val dolA = "CAST(FLOOR(abs(c)/100) AS BIGINT)"
  private val cenA = "(abs(c) % 100)"
  private val plainA =
    s"CAST($dolA AS STRING) || '.' || lpad(CAST($cenA AS STRING), 2, '0')"
  private val groupedA =
    s"${grp(dolA)} || '.' || lpad(CAST($cenA AS STRING), 2, '0')"
  private val sgnA = "CASE WHEN c < 0 THEN '-' ELSE '' END"

  /** The six cash_in input shapes, keyed by fmt. */
  private val rawExpr =
    s"""CASE fmt
       | WHEN 0 THEN $sgnA || '$D' || $groupedA
       | WHEN 1 THEN $sgnA || $plainA
       | WHEN 2 THEN '($D' || $groupedA || ')'
       | WHEN 3 THEN '$D' || $plainA || $sgnA
       | WHEN 4 THEN $sgnA || $plainA || CAST(d3 AS STRING)
       | ELSE ' ' || CASE WHEN c < 0 THEN '- ' ELSE '+ ' END || '$D ' ||
       |   $groupedA || ' '
       | END""".stripMargin.replace("\n", " ")

  /** cash_in: strip symbols, split at the radix, take 2 fraction digits,
    * half-up on the immediate 3rd, apply sign ('(' or '-' anywhere). */
  private val strippedExpr = s"translate(raw, '$D,()+- ', '')"
  private val centsAbs =
    "CAST(CASE WHEN instr(stripped, '.') > 0 " +
      "THEN substr(stripped, 1, instr(stripped, '.') - 1) " +
      "ELSE stripped END AS BIGINT) * 100 + " +
      "CAST(substr(CASE WHEN instr(stripped, '.') > 0 " +
      "THEN substr(stripped, instr(stripped, '.') + 1) " +
      "ELSE '' END || '00', 1, 2) AS BIGINT) + " +
      "CASE WHEN substr(CASE WHEN instr(stripped, '.') > 0 " +
      "THEN substr(stripped, instr(stripped, '.') + 1) " +
      "ELSE '' END || '000', 3, 1) >= '5' THEN 1 ELSE 0 END"
  private val pvExpr =
    s"CASE WHEN instr(raw, '-') > 0 OR instr(raw, '(') > 0 " +
      s"THEN -($centsAbs) ELSE ($centsAbs) END"

  /** C rint (half-even) on a double expression, spelled portably: both
    * engines share the identical IEEE product/quotient, so the tie test is
    * deterministic. rint(-x) = -rint(x). */
  private def rint(x: String): String = {
    def reu(u: String) =
      s"CASE WHEN ($u) - FLOOR($u) > 0.5 THEN CAST(FLOOR($u) AS BIGINT) + 1 " +
        s"WHEN ($u) - FLOOR($u) < 0.5 THEN CAST(FLOOR($u) AS BIGINT) " +
        s"WHEN CAST(FLOOR($u) AS BIGINT) % 2 = 0 THEN CAST(FLOOR($u) AS BIGINT) " +
        s"ELSE CAST(FLOOR($u) AS BIGINT) + 1 END"
    s"CASE WHEN ($x) < 0 THEN -(${reu(s"abs($x)")}) ELSE (${reu(s"abs($x)")}) END"
  }

  // num_word (cash.c:38-88) for 0..999, as one searched-CASE tree.
  private val smallW = Seq("zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "ten", "eleven", "twelve", "thirteen",
    "fourteen", "fifteen", "sixteen", "seventeen", "eighteen", "nineteen",
    "twenty")
  private val tensW = Seq(2 -> "twenty", 3 -> "thirty", 4 -> "forty",
    5 -> "fifty", 6 -> "sixty", 7 -> "seventy", 8 -> "eighty", 9 -> "ninety")

  private def uw(e: String): String =
    "CASE " + smallW.zipWithIndex.map { case (w, i) =>
      s"WHEN ($e) = $i THEN '$w'"
    }.mkString(" ") + " END"

  private def tw(e: String): String =
    "CASE " + tensW.map { case (i, w) =>
      s"WHEN ($e) = $i THEN '$w'"
    }.mkString(" ") + " END"

  private def numWord(v: String): String = {
    val d100 = s"CAST(FLOOR(($v)/100) AS BIGINT)"
    val tu = s"(($v) % 100)"
    val t10 = s"CAST(FLOOR($tu/10) AS BIGINT)"
    s"CASE WHEN ($v) <= 20 THEN ${uw(v)} " +
      s"WHEN ($v) % 100 = 0 THEN ${uw(d100)} || ' hundred' " +
      s"WHEN ($v) > 99 THEN ${uw(d100)} || ' hundred' || " +
      s"CASE WHEN ($v) % 10 = 0 AND $tu > 10 THEN ' ' || ${tw(t10)} " +
      s"WHEN $tu < 20 THEN ' and ' || ${uw(tu)} " +
      s"ELSE ' ' || ${tw(t10)} || ' ' || ${uw(s"($v) % 10")} END " +
      s"ELSE CASE WHEN ($v) % 10 = 0 THEN ${tw(t10)} " +
      s"ELSE ${tw(t10)} || ' ' || ${uw(s"($v) % 10")} END END"
  }

  // cash_words (cash.c:945-1025) at this lane's range (|pv| < 10^6+2 cents
  // so the groups are m0 cents, m1 dollars%1000, m2 thousands<=10): the
  // quirky concat order — including the trailing space after 'thousand'
  // that doubles when m1 = 0 — is reproduced verbatim.
  private val wordsExpr = {
    val m0 = "(abs(pv) % 100)"
    val dol = "CAST(FLOOR(abs(pv)/100) AS BIGINT)"
    val m1 = s"($dol % 1000)"
    val m2 = s"CAST(FLOOR($dol/1000) AS BIGINT)"
    val body =
      s"CASE WHEN $m2 > 0 THEN ${numWord(m2)} || ' thousand ' ELSE '' END || " +
        s"CASE WHEN $m1 > 0 THEN ${numWord(m1)} ELSE '' END"
    val full =
      s"CASE WHEN pv < 0 THEN 'minus ' ELSE '' END || " +
        s"CASE WHEN $m2 = 0 AND $m1 = 0 THEN 'zero' ELSE $body END || " +
        s"CASE WHEN $dol = 1 THEN ' dollar and ' ELSE ' dollars and ' END || " +
        s"${numWord(m0)} || " +
        s"CASE WHEN $m0 = 1 THEN ' cent' ELSE ' cents' END"
    s"upper(substr($full, 1, 1)) || substr($full, 2)"
  }

  /** cash_out's canonical render of pv. */
  private val renderExpr = {
    val dol = "CAST(FLOOR(abs(pv)/100) AS BIGINT)"
    val cen = "(abs(pv) % 100)"
    s"CASE WHEN pv < 0 THEN '-' ELSE '' END || '$D' || ${grp(dol)} || " +
      s"'.' || lpad(CAST($cen AS STRING), 2, '0')"
  }

  private val opExprs = Seq(
    "pk", "raw", "pv",
    "pv + 12345 AS add_c",
    "pv - 99900 AS sub_c",
    "pv * 3 AS mul_i",
    // C integer division truncates toward zero (not floor)
    "CASE WHEN pv < 0 THEN -1 ELSE 1 END * " +
      "CAST(FLOOR(abs(pv) / 11) AS BIGINT) AS div_i",
    s"${rint("CAST(pv AS DOUBLE) * 0.37")} AS mul_f",
    s"${rint("CAST(pv AS DOUBLE) / 7.0")} AS div_f",
    "CAST(FLOOR((CAST(pv AS DOUBLE) / CAST(c2 AS DOUBLE)) * 1000000) " +
      "AS BIGINT) AS ratio_u",
    "GREATEST(pv, c2) AS larger",
    "LEAST(pv, c2) AS smaller",
    s"$renderExpr AS rendered",
    s"$wordsExpr AS words")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_money_ops" -> ((s, dir) => {
      t(s, dir, "part").filter("p_partkey <= 240")
        .selectExpr(baseExprs: _*)
        .selectExpr("pk", "c2", "d3", s"$rawExpr AS raw")
        .selectExpr("pk", "c2", "raw", s"$strippedExpr AS stripped")
        .selectExpr("pk", "c2", "raw", s"$pvExpr AS pv")
        .selectExpr(opExprs: _*)
        .orderBy("pk")
    }))

  val oracle: Map[String, String] = Map(
    "q_money_ops" ->
      s"""WITH s0 AS (SELECT ${baseExprs.mkString(", ")}
         |  FROM part WHERE p_partkey <= 240),
         |s1 AS (SELECT pk, c2, d3, $rawExpr AS raw FROM s0),
         |s2 AS (SELECT pk, c2, raw, $strippedExpr AS stripped FROM s1),
         |s3 AS (SELECT pk, c2, raw, $pvExpr AS pv FROM s2)
         |SELECT ${opExprs.mkString(", ")} FROM s3 ORDER BY pk""".stripMargin)
}
