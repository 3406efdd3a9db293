package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.Tables._

/** PG TIME WITH TIME ZONE (timetz) semantics — reference
  * `src/backend/utils/adt/date.c` (timetz_cmp_internal:2265-2289,
  * timetz_pl_interval, timetz_zone, tm2timetz) and
  * `src/test/regress/sql/timetz.sql`.
  *
  * A timetz is (micros-of-day, zone) where zone is seconds WEST of
  * Greenwich (display offset is the negation). The regress's essential
  * behaviors, all covered here: accepted input shapes (numeric offsets
  * with and without :MM, the fixed-offset abbreviations PDT/PST/EDT, and
  * second-less times), '24:00:00' is a LEGAL value while 25:00 / 61-minute
  * fields are per-row errors (NULL convention), comparison is PRIMARILY by
  * GMT-equivalent instant with the bare zone as tiebreak (so equal
  * instants in different zones are NOT equal), time+interval WRAPS mod 24h
  * keeping the zone, AT TIME ZONE re-expresses the same wall-protocol
  * value in a new zone, and EXTRACT exposes hour (24 for the 24:00 edge)
  * and timezone_hour (truncation toward zero, so '-09:30' gives -9).
  *
  * Formula text is built once and run VERBATIM by both engines (the
  * q_money_ops discipline): Spark via a selectExpr ladder, DuckDB via the
  * same strings in CTEs. Everything is integer arithmetic on seconds-of-
  * day — no doubles anywhere, so no rounding surface at all. Map-side
  * scalar codegen; the rank column is the one window (partition-less rank
  * over the timetz total order, proving the comparator end-to-end).
  */
object TimeTzOps extends QueryModule {

  private def pad2(x: String): String =
    s"lpad(CAST($x AS STRING), 2, '0')"

  /** Base: hh/mm/ss fields, zone key, format key; pk%11=0 forces the
    * 24:00:00 edge; pk%37=0 forces an invalid 25:61 input. */
  private val base = Seq(
    "p_partkey AS pk",
    "CASE WHEN p_partkey % 11 = 0 THEN 24 ELSE p_partkey % 24 END AS hh",
    "CASE WHEN p_partkey % 11 = 0 THEN 0 ELSE (p_partkey * 7) % 60 END AS mm",
    "CASE WHEN p_partkey % 11 = 0 THEN 0 ELSE (p_partkey * 13) % 60 END AS ss",
    // offset in minutes EAST: -420=-07(PDT) -480=-08(PST) -240=-04(EDT)
    // 0=+00 330=+05:30 780=+13 -570=-09:30
    "CASE p_partkey % 7 WHEN 0 THEN -420 WHEN 1 THEN -480 WHEN 2 THEN -240 " +
      "WHEN 3 THEN 0 WHEN 4 THEN 330 WHEN 5 THEN 780 ELSE -570 END AS offm",
    "CAST(p_partkey % 4 AS INT) AS fmt")

  /** The input text in its per-row shape. */
  private val rawExpr = {
    val hhmmss = s"${pad2("hh")} || ':' || ${pad2("mm")} || ':' || ${pad2("ss")}"
    val hhmm = s"${pad2("hh")} || ':' || ${pad2("mm")}"
    val sgn = "CASE WHEN offm < 0 THEN '-' ELSE '+' END"
    val oh = pad2("CAST(FLOOR(abs(offm)/60) AS BIGINT)")
    val om = pad2("abs(offm) % 60")
    val numOff = s"$sgn || $oh || CASE WHEN abs(offm) % 60 > 0 " +
      s"THEN ':' || $om ELSE '' END"
    val abbrev = "CASE offm WHEN -420 THEN ' PDT' WHEN -480 THEN ' PST' " +
      "WHEN -240 THEN ' EDT' ELSE NULL END"
    s"CASE WHEN pk % 37 = 0 THEN '25:61:00+00' " +
      s"WHEN fmt = 1 AND $abbrev IS NOT NULL THEN $hhmmss || $abbrev " +
      s"WHEN fmt = 2 THEN $hhmm || $numOff " +
      s"ELSE $hhmmss || $numOff END"
  }

  /** Abbreviation normalization, then the fixed-position field split.
    * After normalize the shape is HH:MM[:SS](+|-)OH[:OM]. */
  private val normExpr =
    "replace(replace(replace(raw, ' PDT', '-07:00'), ' PST', '-08:00'), " +
      "' EDT', '-04:00')"
  private val parse1 = Seq(
    "pk", "norm",
    // the sign introducing the offset is the first +/- after position 1
    "CASE WHEN instr(norm, '+') > 0 THEN instr(norm, '+') " +
      "ELSE instr(norm, '-') END AS spos",
    "CASE WHEN instr(norm, '+') > 0 THEN 1 ELSE -1 END AS osgn")
  private val parse2 = Seq(
    "pk", "osgn",
    "substr(norm, 1, spos - 1) AS tstr",
    "substr(norm, spos + 1) AS zstr")
  private val parse3 = Seq(
    "pk", "osgn",
    "CAST(substr(tstr, 1, 2) AS BIGINT) AS fh",
    "CAST(substr(tstr, 4, 2) AS BIGINT) AS fm",
    "CASE WHEN length(tstr) >= 8 THEN CAST(substr(tstr, 7, 2) AS BIGINT) " +
      "ELSE 0 END AS fs",
    "CAST(substr(zstr, 1, 2) AS BIGINT) AS zh",
    "CASE WHEN length(zstr) >= 5 THEN CAST(substr(zstr, 4, 2) AS BIGINT) " +
      "ELSE 0 END AS zm")
  private val parse4 = Seq(
    "pk",
    // tm2timetz validation: 24:00:00 exactly is legal, fields bounded
    "CASE WHEN fm <= 59 AND fs <= 59 AND " +
      "(fh < 24 OR (fh = 24 AND fm = 0 AND fs = 0)) " +
      "THEN fh * 3600 + fm * 60 + fs END AS tsec",
    "osgn * (zh * 60 + zm) AS offe")

  /** Canonical render of (tsec, offe) — offset minutes shown only when
    * nonzero, as PG does. */
  private def render(tsec: String, offe: String): String = {
    val t = s"${pad2(s"CAST(FLOOR(($tsec)/3600) AS BIGINT)")} || ':' || " +
      s"${pad2(s"CAST(FLOOR((($tsec) % 3600)/60) AS BIGINT)")} || ':' || " +
      s"${pad2(s"($tsec) % 60")}"
    val sgn = s"CASE WHEN ($offe) < 0 THEN '-' ELSE '+' END"
    val oh = pad2(s"CAST(FLOOR(abs($offe)/60) AS BIGINT)")
    val om = pad2(s"abs($offe) % 60")
    s"$t || $sgn || $oh || CASE WHEN abs($offe) % 60 > 0 " +
      s"THEN ':' || $om ELSE '' END"
  }

  private val outputs: Seq[String] = {
    val west = "(-offe * 60)" // zone seconds west, PG's internal sign
    val utc = s"(tsec + $west)"
    // the regress's reference literal '05:06:07-07'
    val refUtc = 5 * 3600 + 6 * 60 + 7 + 25200
    val wrap = (x: String) => s"((($x) % 86400) + 86400) % 86400"
    Seq(
      "pk",
      s"CASE WHEN tsec IS NOT NULL THEN ${render("tsec", "offe")} END AS t_canon",
      s"$utc AS utc_s",
      s"$utc < $refUtc OR ($utc = $refUtc AND $west < 25200) AS lt_ref",
      s"$utc > $refUtc OR ($utc = $refUtc AND $west > 25200) AS gt_ref",
      s"CASE WHEN tsec IS NOT NULL THEN " +
        s"${render(wrap("tsec + 9000"), "offe")} END AS plus_2h30",
      // AT TIME ZONE '+02:00' (120 min east): same instant, new zone
      s"CASE WHEN tsec IS NOT NULL THEN " +
        s"${render(wrap("tsec + (120 - offe) * 60"), "120")} END AS at_plus2",
      "CAST(FLOOR(tsec/3600) AS BIGINT) AS ex_hour",
      // timezone_hour truncates toward zero: '-09:30' gives -9
      "CASE WHEN tsec IS NOT NULL THEN " +
        "CASE WHEN offe < 0 THEN -CAST(FLOOR(abs(offe)/60) AS BIGINT) " +
        "ELSE CAST(FLOOR(abs(offe)/60) AS BIGINT) END END AS ex_tzh",
      s"CASE WHEN tsec IS NOT NULL THEN " +
        s"${pad2(s"CAST(FLOOR(tsec/3600) AS BIGINT)")} || ':' || " +
        s"${pad2("CAST(FLOOR((tsec % 3600)/60) AS BIGINT)")} || ':' || " +
        s"${pad2("tsec % 60")} END AS to_time",
      // the comparator end-to-end: total order by (GMT instant, zone)
      s"CASE WHEN tsec IS NOT NULL THEN " +
        s"RANK() OVER (ORDER BY CASE WHEN tsec IS NULL THEN 1 ELSE 0 END, " +
        s"$utc, $west) END AS tz_rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_timetz_ops" -> ((s, dir) => {
      t(s, dir, "part").filter("p_partkey <= 220")
        .selectExpr(base: _*)
        .selectExpr("pk", s"$rawExpr AS raw")
        .selectExpr("pk", s"$normExpr AS norm")
        .selectExpr(parse1: _*)
        .selectExpr(parse2: _*)
        .selectExpr(parse3: _*)
        .selectExpr(parse4: _*)
        .selectExpr(outputs: _*)
        .orderBy(col("pk"))
    }))

  val oracle: Map[String, String] = Map(
    "q_timetz_ops" ->
      s"""WITH s0 AS (SELECT ${base.mkString(", ")}
         |  FROM part WHERE p_partkey <= 220),
         |s1 AS (SELECT pk, $rawExpr AS raw FROM s0),
         |s2 AS (SELECT pk, $normExpr AS norm FROM s1),
         |s3 AS (SELECT ${parse1.mkString(", ")} FROM s2),
         |s4 AS (SELECT ${parse2.mkString(", ")} FROM s3),
         |s5 AS (SELECT ${parse3.mkString(", ")} FROM s4),
         |s6 AS (SELECT ${parse4.mkString(", ")} FROM s5)
         |SELECT ${outputs.mkString(", ")} FROM s6 ORDER BY pk""".stripMargin)
}
