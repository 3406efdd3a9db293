package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables._
import graft.functions.PlPgSql

/** CREATE FUNCTION … LANGUAGE plpgsql/sql, compiled Froid-style to native
  * Catalyst expressions — see [[graft.functions.PlPgSql]] for the compiler
  * (reference: `src/pl/plpgsql/src/pl_exec.c` statement interpreter,
  * `src/backend/optimizer/util/clauses.c` inline_function,
  * `src/test/regress/sql/plpgsql.sql:1437` recursion_test).
  *
  * Each lane DEFINES a function in PL/pgSQL source text, compiles it, and
  * applies it per row over lineitem, aggregating to a bounded output. The
  * oracles are INDEPENDENT hand-derivations of each function's semantics
  * (nested CASE / unrolled arithmetic / per-depth concatenation written
  * from the spec, not from the compiler output), so a compiler bug cannot
  * cancel out of the comparison. Inputs are staged to integer micros /
  * percent with the shared-text discipline (`CAST(round(x*1e6,0) AS
  * BIGINT)`), keeping every compared value exact integer/string in both
  * engines.
  *
  * Scale shape: all four lanes are pure map-side expression work over the
  * scan (one shuffle for the final small-key aggregate). The compiled body
  * is ordinary Catalyst CASE/arithmetic, so it rides whole-stage codegen —
  * the reference pays a per-row interpreter frame for the same function
  * (pl_exec.c exec_stmt), which is the part that does not survive 100 TB.
  */
object PlFuncs extends QueryModule {

  // ---- staged inputs (shared text, both engines) ----

  private val stagedSql =
    """SELECT CAST(l_quantity AS BIGINT) AS qty,
      |  CAST(round(l_extendedprice * 1000000.0, 0) AS BIGINT) AS price_m,
      |  CAST(round(l_discount * 100.0, 0) AS BIGINT) AS disc_pct,
      |  l_orderkey, CAST(l_orderkey % 5 AS BIGINT) AS m,
      |  CAST(l_suppkey % 100 AS BIGINT) AS b,
      |  CAST(month(l_shipdate) AS BIGINT) AS shipmon,
      |  l_returnflag
      |FROM lineitem""".stripMargin

  // ---- the functions (PL/pgSQL source, compiled once) ----

  /** DECLARE + early RETURN + IF/ELSIF/ELSE + conditional reassignment. */
  private val freightClass = PlPgSql.compile(
    """create function freight_class(qty bigint, price_m bigint,
      |                              disc_pct bigint) returns string as $$
      |declare
      |  adj bigint;
      |  label string;
      |begin
      |  if qty <= 0 then return 'empty'; end if;
      |  adj := price_m * (100 - disc_pct);
      |  if adj < 100000000000 * qty then
      |    label := 'light';
      |  elsif adj < 150000000000 * qty then
      |    label := 'mid';
      |  else
      |    label := 'heavy';
      |  end if;
      |  if disc_pct >= 6 and label = 'heavy' then
      |    label := label || '+disc';
      |  end if;
      |  return label;
      |end;
      |$$ language plpgsql""".stripMargin)

  /** FOR loop (unrolled) with parameter reassignment — a digit-Horner
    * digest of the order key. */
  private val keyDigest = PlPgSql.compile(
    """create function key_digest(k bigint) returns bigint as $$
      |declare
      |  h bigint := 7;
      |  d bigint;
      |begin
      |  for i in 1..6 loop
      |    d := k % 10;
      |    h := h * 31 + d * i;
      |    k := cast(floor(k / 10) as bigint);
      |  end loop;
      |  return h % 1000003;
      |end;
      |$$ language plpgsql""".stripMargin)

  /** The regress's recursion_test (plpgsql.sql:1437) verbatim in shape:
    * '…' body quoting with doubled quotes, `=` assignment, bounded
    * self-recursion (argument is `% 5`, so depth 6 covers every row). */
  private val recursionTest = PlPgSql.compile(
    """CREATE FUNCTION recursion_test(i bigint, b bigint) RETURNS string AS '
      |DECLARE rslt string;
      |BEGIN
      |    IF i <= 0 THEN
      |        rslt = CAST(b AS STRING);
      |    ELSE
      |        rslt = CAST(i AS STRING) || '','' || recursion_test(i - 1, b);
      |    END IF;
      |    RETURN rslt;
      |END;' LANGUAGE plpgsql""".stripMargin,
    maxInlineDepth = 6)

  /** Simple CASE statement + CONTINUE WHEN + IF merge in one body —
    * the statement forms added after the base compiler (exec_stmt_case,
    * exec_stmt_exit), oracle-backed rather than spec-only. */
  private val shipBucket = PlPgSql.compile(
    """create function ship_bucket(m bigint, qty bigint) returns string as $$
      |declare s string; n bigint := 0; d bigint;
      |begin
      |  case m
      |    when 12, 1, 2 then s := 'winter';
      |    when 3, 4, 5 then s := 'spring';
      |    when 6, 7, 8 then s := 'summer';
      |    else s := 'autumn';
      |  end case;
      |  for i in 1..2 loop
      |    d := qty % 10;
      |    qty := cast(floor(qty / 10) as bigint);
      |    continue when d % 2 = 0;
      |    n := n + 1;
      |  end loop;
      |  if n = 0 then
      |    s := s || '/even';
      |  else
      |    s := s || '/odd' || cast(n as string);
      |  end if;
      |  return s;
      |end;
      |$$ language plpgsql""".stripMargin)

  /** LANGUAGE sql scalar — the clauses.c:inline_function analogue. */
  private val discPriceM = PlPgSql.compile(
    """create function disc_price_m(price_m bigint, disc_pct bigint)
      |returns bigint as
      |'select cast(floor(price_m * (100 - disc_pct) / 100.0) as bigint)'
      |language sql""".stripMargin)

  /** WHILE loop (r19, exec_stmt_while): digit sum of a bigint. The
    * unroll budget is sized to the DATA, not the type: 16 guarded
    * iterations cover keys to 10^16 (every SF and replica by orders of
    * magnitude — the sf0.01 x10000 replica tops out at 9 digits), and
    * past the budget the compiled form RAISES rather than truncating.
    * Budget sizing is a real codegen constraint, not taste: at 24 the
    * unrolled expression's generated code crossed the JIT method
    * budget and Spark dropped the stage out of whole-stage codegen —
    * caught by CodegenCanarySpec, fixed by sizing to the data. */
  private val digitSum = PlPgSql.compile(
    """create function digit_sum(k bigint) returns bigint as $$
      |declare s bigint := 0;
      |begin
      |  while k > 0 loop
      |    s := s + k % 10;
      |    k := k / 10;
      |  end loop;
      |  return s;
      |end;
      |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 16)

  /** Non-literal FOR bounds (r19, exec_stmt_fori): sum of the last n
    * digits — the bound is DATA (n), evaluated once at loop entry. */
  private val tailDigits = PlPgSql.compile(
    """create function tail_digits(k bigint, n bigint) returns bigint as $$
      |declare s bigint := 0;
      |begin
      |  for i in 1..n loop
      |    s := s + k % 10;
      |    k := k / 10;
      |  end loop;
      |  return s;
      |end;
      |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 4)

  /** SETOF via RETURN NEXT / RETURN QUERY (r19, exec_stmt_return_next,
    * regress rangefuncs.sql): compiles to ONE ARRAY<STRING> expression;
    * the lane explodes it (Generator — never a UDF/tuplestore). */
  private val orderTags = PlPgSql.compile(
    """create function order_tags(q bigint, m bigint) returns setof string as $$
      |begin
      |  return next 'm' || cast(m as string);
      |  if q % 2 = 0 then
      |    return next 'even';
      |  else
      |    return query values ('odd'), ('o' || cast(q % 3 as string));
      |  end if;
      |  return;
      |end;
      |$$ language plpgsql""".stripMargin)

  /** EXCEPTION block (r19, pl_exec.c:1685): division_by_zero guarded at
    * every division in the protected region, RAISE EXCEPTION routed to
    * its handler with SQLERRM/SQLSTATE bound — all lowered to CASE. */
  private val safeRate = PlPgSql.compile(
    """create function safe_rate(num bigint, den bigint) returns string as $$
      |declare r bigint;
      |begin
      |  begin
      |    r := num / den;
      |    if r > 5 then
      |      raise exception 'rate % over limit', r;
      |    end if;
      |    return 'ok:' || cast(r as string);
      |  exception
      |    when division_by_zero then return 'dz:' || sqlstate;
      |    when raise_exception then return 'big:' || sqlerrm;
      |  end;
      |end;
      |$$ language plpgsql""".stripMargin)

  private def staged(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(stagedSql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_plpgsql_scalar" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT ${freightClass.call("qty", "price_m", "disc_pct")} AS fclass,
           |  COUNT(*) AS cnt, SUM(qty) AS sum_qty
           |FROM pl_staged GROUP BY fclass ORDER BY fclass""".stripMargin)
    }),
    "q_plpgsql_loop" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT dg % 97 AS bucket, COUNT(*) AS cnt,
           |  MIN(dg) AS min_dg, MAX(dg) AS max_dg
           |FROM (SELECT ${keyDigest.call("l_orderkey")} AS dg FROM pl_staged)
           |GROUP BY bucket ORDER BY bucket""".stripMargin)
    }),
    "q_plpgsql_recursive" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT ${recursionTest.call("m", "b")} AS res, COUNT(*) AS cnt
           |FROM pl_staged GROUP BY res ORDER BY res""".stripMargin)
    }),
    "q_plpgsql_caseloop" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT ${shipBucket.call("shipmon", "qty")} AS bucket,
           |  COUNT(*) AS cnt
           |FROM pl_staged GROUP BY bucket ORDER BY bucket""".stripMargin)
    }),
    "q_sql_fn_inline" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      // the sum is limb-split (lsum128b): disc-priced micros are bounded
      // |v| <= ~1.1e11 << 2^44, and the long sum would clip 2^63 at ~sf800.
      // The r18 artifact hash-failed this lane while the values were
      // tuple-identical — it was the battery's ONE raw-DECIMAL(38,0)
      // output column, so the compared value now ships as its exact
      // digit STRING (unambiguous canon at every SF, no 2^63 clip)
      val base = s.sql(
        s"""SELECT l_returnflag,
           |  ${discPriceM.call("price_m", "disc_pct")} AS v
           |FROM pl_staged""".stripMargin)
      base.groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("cnt"),
          lsum128b(org.apache.spark.sql.functions.col("v"))
            .cast("string").as("sum_disc_m"))
        .orderBy("l_returnflag")
    }),
    "q_plpgsql_while" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT ${digitSum.call("l_orderkey")} AS ds,
           |  ${tailDigits.call("l_orderkey", "(l_orderkey % 3) + 1")} AS ts,
           |  COUNT(*) AS cnt, MIN(l_orderkey) AS min_k
           |FROM pl_staged GROUP BY ds, ts ORDER BY ds, ts""".stripMargin)
    }),
    "q_plpgsql_setof" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT tag, COUNT(*) AS cnt
           |FROM (SELECT explode(${orderTags.call("qty", "m")}) AS tag
           |      FROM pl_staged)
           |GROUP BY tag ORDER BY tag""".stripMargin)
    }),
    "q_plpgsql_exception" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      s.sql(
        s"""SELECT ${safeRate.call("disc_pct", "m")} AS cls,
           |  COUNT(*) AS cnt, SUM(qty) AS sum_qty
           |FROM pl_staged GROUP BY cls ORDER BY cls""".stripMargin)
    }),
    "q_plpgsql_registered" -> ((s, dir) => {
      staged(s, dir).createOrReplaceTempView("pl_staged")
      // the REGISTRY path (r19): the same compiled function called BY
      // NAME through verbatim SQL — FunctionRegistry resolution, then
      // the template splices per call site (clauses.c inline_function)
      PlPgSql.register(s, freightClass)
      s.sql(
        """SELECT freight_class(qty, price_m, disc_pct) AS fclass,
          |  COUNT(*) AS cnt, SUM(qty) AS sum_qty
          |FROM pl_staged GROUP BY fclass ORDER BY fclass""".stripMargin)
    })
  )

  // Independent oracles: hand-derived semantics, DuckDB-native idioms
  // (integer division `//`), NOT the compiler's output text.

  /** Closed-form digit sum over all 19 possible bigint digits — the
    * WHILE loop's `while k > 0` semantics restated: absent digits
    * contribute 0, so the full-width sum is identical for positive k. */
  private val digitSumSql: String =
    (0 until 19)
      .map(i => s"(l_orderkey // ${BigInt(10).pow(i)}) % 10")
      .mkString(" + ")

  val oracle: Map[String, String] = Map(
    "q_plpgsql_scalar" ->
      s"""WITH pl_staged AS ($stagedSql)
         |SELECT CASE
         |    WHEN qty <= 0 THEN 'empty'
         |    WHEN disc_pct >= 6
         |      AND NOT (price_m * (100 - disc_pct) < 150000000000 * qty)
         |      THEN 'heavy+disc'
         |    WHEN price_m * (100 - disc_pct) < 100000000000 * qty
         |      THEN 'light'
         |    WHEN price_m * (100 - disc_pct) < 150000000000 * qty
         |      THEN 'mid'
         |    ELSE 'heavy' END AS fclass,
         |  COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS sum_qty
         |FROM pl_staged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_plpgsql_loop" ->
      s"""WITH pl_staged AS ($stagedSql),
         |d AS (SELECT ((((((7*31 + ((l_orderkey // 1) % 10) * 1) * 31
         |  + ((l_orderkey // 10) % 10) * 2) * 31
         |  + ((l_orderkey // 100) % 10) * 3) * 31
         |  + ((l_orderkey // 1000) % 10) * 4) * 31
         |  + ((l_orderkey // 10000) % 10) * 5) * 31
         |  + ((l_orderkey // 100000) % 10) * 6) % 1000003 AS dg
         |  FROM pl_staged)
         |SELECT dg % 97 AS bucket, COUNT(*) AS cnt,
         |  CAST(MIN(dg) AS BIGINT) AS min_dg, CAST(MAX(dg) AS BIGINT) AS max_dg
         |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_plpgsql_recursive" ->
      s"""WITH pl_staged AS ($stagedSql)
         |SELECT CASE m WHEN 0 THEN CAST(b AS STRING)
         |    WHEN 1 THEN '1,' || CAST(b AS STRING)
         |    WHEN 2 THEN '2,1,' || CAST(b AS STRING)
         |    WHEN 3 THEN '3,2,1,' || CAST(b AS STRING)
         |    ELSE '4,3,2,1,' || CAST(b AS STRING) END AS res,
         |  COUNT(*) AS cnt
         |FROM pl_staged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_plpgsql_caseloop" ->
      // independent restatement: season CASE over the month, odd-digit
      // count over qty's two digits as closed-form parity arithmetic
      s"""WITH pl_staged AS ($stagedSql),
         |b AS (SELECT
         |  CASE WHEN shipmon IN (12, 1, 2) THEN 'winter'
         |       WHEN shipmon IN (3, 4, 5) THEN 'spring'
         |       WHEN shipmon IN (6, 7, 8) THEN 'summer'
         |       ELSE 'autumn' END AS season,
         |  (qty % 10) % 2 + ((qty // 10) % 10) % 2 AS n
         |  FROM pl_staged)
         |SELECT season || CASE WHEN n = 0 THEN '/even'
         |  ELSE '/odd' || CAST(n AS STRING) END AS bucket,
         |  COUNT(*) AS cnt
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sql_fn_inline" ->
      s"""WITH pl_staged AS ($stagedSql)
         |SELECT l_returnflag, COUNT(*) AS cnt,
         |  CAST(CAST(SUM(CAST(FLOOR(price_m * (100 - disc_pct) / 100.0)
         |    AS BIGINT)) AS DECIMAL(38,0)) AS VARCHAR) AS sum_disc_m
         |FROM pl_staged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_plpgsql_while" ->
      // digit_sum restated closed-form (19 digit positions); the
      // tail_digits FOR-with-data-bound restated as guarded terms over
      // n = (k % 3) + 1 in 1..3
      s"""WITH pl_staged AS ($stagedSql),
         |d AS (SELECT
         |  $digitSumSql AS ds,
         |  (l_orderkey % 10)
         |    + CASE WHEN (l_orderkey % 3) + 1 >= 2
         |        THEN ((l_orderkey // 10) % 10) ELSE 0 END
         |    + CASE WHEN (l_orderkey % 3) + 1 >= 3
         |        THEN ((l_orderkey // 100) % 10) ELSE 0 END AS ts,
         |  l_orderkey
         |  FROM pl_staged)
         |SELECT CAST(ds AS BIGINT) AS ds, CAST(ts AS BIGINT) AS ts,
         |  COUNT(*) AS cnt, CAST(MIN(l_orderkey) AS BIGINT) AS min_k
         |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_plpgsql_setof" ->
      // each row's emitted tags restated as UNION ALL branches
      s"""WITH pl_staged AS ($stagedSql),
         |u AS (
         |  SELECT 'm' || CAST(m AS VARCHAR) AS tag FROM pl_staged
         |  UNION ALL
         |  SELECT 'even' FROM pl_staged WHERE qty % 2 = 0
         |  UNION ALL
         |  SELECT 'odd' FROM pl_staged WHERE qty % 2 <> 0
         |  UNION ALL
         |  SELECT 'o' || CAST(qty % 3 AS VARCHAR) FROM pl_staged
         |  WHERE qty % 2 <> 0)
         |SELECT tag, COUNT(*) AS cnt FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_plpgsql_exception" ->
      // the three control paths restated: den=0 -> the handler's
      // constant; quotient over the limit -> the %-formatted SQLERRM;
      // else the ok path (// is DuckDB truncating division, operands
      // nonnegative here)
      s"""WITH pl_staged AS ($stagedSql)
         |SELECT CASE
         |    WHEN m = 0 THEN 'dz:22012'
         |    WHEN disc_pct // m > 5
         |      THEN 'big:rate ' || CAST(disc_pct // m AS VARCHAR) ||
         |        ' over limit'
         |    ELSE 'ok:' || CAST(disc_pct // m AS VARCHAR) END AS cls,
         |  COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS sum_qty
         |FROM pl_staged GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_plpgsql_registered" ->
      // same independent derivation as q_plpgsql_scalar — the lane
      // under test differs only in the CALL PATH (registry vs splice)
      s"""WITH pl_staged AS ($stagedSql)
         |SELECT CASE
         |    WHEN qty <= 0 THEN 'empty'
         |    WHEN disc_pct >= 6
         |      AND NOT (price_m * (100 - disc_pct) < 150000000000 * qty)
         |      THEN 'heavy+disc'
         |    WHEN price_m * (100 - disc_pct) < 100000000000 * qty
         |      THEN 'light'
         |    WHEN price_m * (100 - disc_pct) < 150000000000 * qty
         |      THEN 'mid'
         |    ELSE 'heavy' END AS fclass,
         |  COUNT(*) AS cnt, CAST(SUM(qty) AS BIGINT) AS sum_qty
         |FROM pl_staged GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
