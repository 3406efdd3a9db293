package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PlPgSql

/** The PL/pgSQL → single-expression compiler (Froid-style; see
  * functions/PlPgSql.scala). Value semantics are pinned against
  * independent Scala reimplementations row by row; the control-flow
  * merges (early return, branch-local assignment, shadowing, unrolled
  * loops, bounded recursion) each get a targeted case; unsupported
  * statements must fail LOUDLY at compile time, never mis-compile.
  */
class PlPgSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def evalStr(sql: String): String = {
    val r = spark.sql(s"SELECT $sql AS v").collect()(0)
    if (r.isNullAt(0)) null else r.get(0).toString
  }

  // ---- value semantics vs independent Scala models ----

  private val freight = PlPgSql.compile(
    """create function fc(qty bigint, price_m bigint, disc_pct bigint)
      |returns string as $$
      |declare
      |  adj bigint;
      |  label string;
      |begin
      |  if qty <= 0 then return 'empty'; end if;
      |  adj := price_m * (100 - disc_pct);
      |  if adj < 100000000000 * qty then label := 'light';
      |  elsif adj < 150000000000 * qty then label := 'mid';
      |  else label := 'heavy';
      |  end if;
      |  if disc_pct >= 6 and label = 'heavy' then
      |    label := label || '+disc';
      |  end if;
      |  return label;
      |end;
      |$$ language plpgsql""".stripMargin)

  private def freightModel(qty: Long, priceM: Long, discPct: Long): String = {
    if (qty <= 0) return "empty"
    val adj = priceM * (100 - discPct)
    var label =
      if (adj < 100000000000L * qty) "light"
      else if (adj < 150000000000L * qty) "mid"
      else "heavy"
    if (discPct >= 6 && label == "heavy") label += "+disc"
    label
  }

  test("IF/ELSIF/early-RETURN/reassignment matches the Scala model") {
    val cases = Seq(
      (0L, 5L, 0L), (-2L, 5L, 0L),            // early return
      (10L, 900000000000L, 0L),                // light
      (10L, 1200000000000L, 0L),               // mid
      (10L, 2000000000000L, 0L),               // heavy, no disc
      (10L, 2000000000000L, 6L),               // heavy+disc
      (10L, 2000000000000L, 10L),              // heavy+disc
      (10L, 1600000000000L, 7L),               // disc pushes under mid bound
      (1L, 99999999999L, 0L), (1L, 100000000000L, 0L)) // boundary
    cases.foreach { case (q, p, d) =>
      assert(evalStr(freight.call(q.toString, p.toString, d.toString)) ==
        freightModel(q, p, d), s"case ($q,$p,$d)")
    }
  }

  private val digest = PlPgSql.compile(
    """create function kd(k bigint) returns bigint as $$
      |declare h bigint := 7; d bigint;
      |begin
      |  for i in 1..6 loop
      |    d := k % 10;
      |    h := h * 31 + d * i;
      |    k := cast(floor(k / 10) as bigint);
      |  end loop;
      |  return h % 1000003;
      |end;
      |$$ language plpgsql""".stripMargin)

  private def digestModel(k0: Long): Long = {
    var k = k0; var h = 7L
    for (i <- 1 to 6) { h = h * 31 + (k % 10) * i; k = k / 10 }
    h % 1000003
  }

  test("FOR loop unrolls with parameter reassignment (digit Horner)") {
    Seq(0L, 1L, 9L, 10L, 123456L, 999999L, 1000000L, 6001215L).foreach { k =>
      assert(evalStr(digest.call(k.toString)) == digestModel(k).toString,
        s"k=$k")
    }
  }

  test("FOR REVERSE iterates high-to-low") {
    val f = PlPgSql.compile(
      """create function rev() returns string as $$
        |declare acc string := '';
        |begin
        |  for i in reverse 3..1 loop
        |    acc := acc || cast(i as string);
        |  end loop;
        |  return acc;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call()) == "321")
  }

  private val rec = PlPgSql.compile(
    """CREATE FUNCTION recursion_test(i bigint, b bigint) RETURNS string AS '
      |DECLARE rslt string;
      |BEGIN
      |    IF i <= 0 THEN
      |        rslt = CAST(b AS STRING);
      |    ELSE
      |        rslt = CAST(i AS STRING) || '','' || recursion_test(i - 1, b);
      |    END IF;
      |    RETURN rslt;
      |END;' LANGUAGE plpgsql""".stripMargin, maxInlineDepth = 6)

  test("bounded recursion matches the regress function's output shape") {
    // the regress pins SELECT recursion_test(4,3) = '4,3,2,1,3'
    // (/root/reference/src/test/regress/expected/plpgsql.out)
    assert(evalStr(rec.call("4", "3")) == "4,3,2,1,3")
    assert(evalStr(rec.call("0", "42")) == "42")
    assert(evalStr(rec.call("5", "7")) == "5,4,3,2,1,7")
  }

  test("recursion beyond maxInlineDepth raises loudly, not silent NULL") {
    // depth 6 supports i<=5; i=9 exhausts the inlined frames — r18
    // yielded typed NULL (indistinguishable from a legitimate result);
    // now the depth-0 frame raises with the function name and budget
    val e = intercept[Throwable](evalStr(rec.call("9", "1")))
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
    assert(chain.contains("recursion depth 6 exceeded in recursion_test"),
      chain)
  }

  test("nested DECLARE blocks shadow and restore (pl_gram.y block scoping)") {
    val f = PlPgSql.compile(
      """create function sh(x bigint) returns string as $$
        |declare v string := 'outer';
        |        w string := 'un';
        |begin
        |  declare v string := 'inner';
        |  begin
        |    w := w || v;      -- sees the inner v
        |  end;
        |  return v || '/' || w;  -- v restored to outer, w write persists
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("1")) == "outer/uninner")
  }

  test("falling off the end raises like the reference (exec_stmt_block)") {
    val f = PlPgSql.compile(
      """create function noret(x bigint) returns bigint as $$
        |declare y bigint;
        |begin
        |  if x > 0 then return x; end if;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("5")) == "5")
    val e = intercept[Throwable](evalStr(f.call("-1")))
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("control reached end of function noret without RETURN"))
  }

  test("LANGUAGE sql bodies inline (clauses.c inline_function analogue)") {
    val f = PlPgSql.compile(
      """create function dp(price_m bigint, disc_pct bigint) returns bigint
        |as 'select cast(floor(price_m * (100 - disc_pct) / 100.0) as bigint)'
        |language sql""".stripMargin)
    assert(evalStr(f.call("1000000", "7")) == "930000")
  }

  test("declared-but-uninitialized variables read as typed NULL") {
    val f = PlPgSql.compile(
      """create function uz() returns bigint as $$
        |declare y bigint;
        |begin
        |  return y;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call()) == null)
  }

  // ---- the compiled text is native Catalyst, not a UDF ----

  test("compiled lanes run as builtin expressions inside codegen") {
    val df = SparkEntry.queries("q_plpgsql_scalar")(spark, SparkTestSession.sf)
    df.collect() // materialize the AQE final plan before inspecting it
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val exprs = plan.flatMap(p => p.expressions.flatMap(_.collect { case e => e }))
    assert(!exprs.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.ScalaUDF]),
      "compiled PL/pgSQL must not lower to a ScalaUDF")
    assert(!exprs.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback]),
      "compiled PL/pgSQL must stay codegen-able")
    // QueryStageExec wraps its subtree as a leaf, so find() cannot see
    // the WholeStageCodegenExec nodes inside stages — the `*(n)` render
    // marker is the stage-transparent evidence
    assert(plan.toString.contains("*("),
      s"expected a whole-stage codegen span in:\n$plan")
  }

  // ---- loud rejection of the unsupported surface ----

  private def compileError(sql: String): String =
    intercept[IllegalArgumentException](PlPgSql.compile(sql)).getMessage

  // ---- WHILE and non-literal FOR bounds (r19: exec_stmt_while/fori) ----

  test("WHILE compiles to a budgeted guarded unroll (digit sum model)") {
    val f = PlPgSql.compile(
      """create function dsum(k bigint) returns bigint as $$
        |declare s bigint := 0;
        |begin
        |  while k > 0 loop
        |    s := s + k % 10;
        |    k := k / 10;
        |  end loop;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 24)
    def model(k0: Long): Long = {
      var k = k0; var s = 0L
      while (k > 0) { s += k % 10; k /= 10 }
      s
    }
    Seq(0L, 7L, 10L, 123456L, 999999999L, 6001215L, -42L).foreach { k =>
      assert(evalStr(f.call(k.toString)) == model(k).toString, s"k=$k")
    }
  }

  test("WHILE supports EXIT/CONTINUE; NULL condition exits like FALSE") {
    val f = PlPgSql.compile(
      """create function wj(k bigint) returns bigint as $$
        |declare n bigint := 0; d bigint;
        |begin
        |  while k > 0 loop
        |    d := k % 10;
        |    k := k / 10;
        |    exit when d = 9;
        |    continue when d % 2 = 0;
        |    n := n + 1;
        |  end loop;
        |  return n;
        |end;
        |$$ language plpgsql""".stripMargin,
      // EXIT WHEN + CONTINUE WHEN fork the remaining-iterations text per
      // arm (2^budget) — branching condition-loops need SMALL budgets;
      // the emit guard catches anything bigger loudly
      maxCondLoopUnroll = 6)
    def model(k0: Long): Long = {
      var k = k0; var n = 0L
      while (k > 0) {
        val d = k % 10; k /= 10
        if (d == 9) return n
        if (d % 2 != 0) n += 1
      }
      n
    }
    Seq(0L, 135L, 2468L, 1397L, 55555L).foreach { k =>
      assert(evalStr(f.call(k.toString)) == model(k).toString, s"k=$k")
    }
    val g = PlPgSql.compile(
      """create function wn(x bigint) returns bigint as $$
        |declare y bigint;
        |begin
        |  while y > 0 loop y := y - 1; end loop;
        |  return coalesce(y, -1);
        |end;
        |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 4)
    assert(evalStr(g.call("1")) == "-1") // y NULL -> zero iterations
  }

  test("WHILE past the run-time budget raises loudly, never silently") {
    val f = PlPgSql.compile(
      """create function wb(k bigint) returns bigint as $$
        |begin
        |  while k > 0 loop k := k - 1; end loop;
        |  return k;
        |end;
        |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 5)
    assert(evalStr(f.call("4")) == "0")
    val e = intercept[Throwable](evalStr(f.call("100")))
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("maxCondLoopUnroll"))
  }

  test("non-literal FOR bounds evaluate once at entry; REVERSE works") {
    val f = PlPgSql.compile(
      """create function nb(n int) returns int as $$
        |declare s int := 0;
        |begin
        |  for i in 1..n loop s := s + i; end loop;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 12)
    assert(evalStr(f.call("5")) == "15")
    assert(evalStr(f.call("0")) == "0")  // hi < lo: zero iterations
    assert(evalStr(f.call("10")) == "55")
    // bound captured at ENTRY: the body shrinking n must not shorten
    // the loop (exec_stmt_fori evaluates bounds once)
    val g = PlPgSql.compile(
      """create function nbe(n int) returns int as $$
        |declare s int := 0;
        |begin
        |  for i in 1..n loop
        |    s := s + 1;
        |    n := 0;
        |  end loop;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 8)
    assert(evalStr(g.call("3")) == "3")
    val r = PlPgSql.compile(
      """create function nbr(n int) returns string as $$
        |declare acc string := '';
        |begin
        |  for i in reverse n..1 loop
        |    acc := acc || cast(i as string);
        |  end loop;
        |  return acc;
        |end;
        |$$ language plpgsql""".stripMargin, maxCondLoopUnroll = 6)
    assert(evalStr(r.call("3")) == "321")
    // null bound raises like exec_stmt_fori
    val e = intercept[Throwable](evalStr(f.call("CAST(NULL AS INT)")))
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("cannot be null"))
  }

  test("FROM-less SELECT INTO compiles as assignment, both PG orders") {
    val f = PlPgSql.compile(
      """create function si2(x bigint) returns bigint as $$
        |declare a bigint; b bigint;
        |begin
        |  select x * 2 + 1 into a;
        |  select into strict b a + x;
        |  return b;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("10")) == "31")
    // the assignment path keeps declared-type semantics (int division)
    val g = PlPgSql.compile(
      """create function si3(x bigint) returns bigint as $$
        |declare h bigint;
        |begin
        |  select x / 2 into h;
        |  return h;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(g.call("5")) == "2")
  }

  test("SELECT INTO / DML statements are rejected toward set-wise forms") {
    val msg = compileError(
      """create function si() returns bigint as $$
        |declare r bigint;
        |begin
        |  select into r count(*) from t;
        |  return r;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(msg.contains("set-wise"), msg)
  }

  test("OUT parameters, undeclared assignment, " +
    "reserved names and bad arity all fail loudly") {
    assert(compileError(
      "create function o(out j int) returns int as $$ begin return 1; end; " +
        "$$ language plpgsql").contains("OUT"))
    assert(compileError(
      "create function ua() returns int as $$ begin zz := 1; return zz; " +
        "end; $$ language plpgsql").contains("undeclared"))
    assert(compileError(
      """create function rn() returns int as $$
        |declare end int := 1;
        |begin return 1; end;
        |$$ language plpgsql""".stripMargin).toLowerCase.contains("reserved"))
    val f = PlPgSql.compile(
      "create function a2(x int, y int) returns int as " +
        "'select x + y' language sql")
    val m = intercept[IllegalArgumentException](f.call("1")).getMessage
    assert(m.contains("2 args"), m)
  }

  test("LANGUAGE sql with FROM is rejected (table access stays set-wise)") {
    val msg = compileError(
      "create function bad() returns int as " +
        "'select count(*) from lineitem' language sql")
    assert(msg.contains("FROM"), msg)
  }

  test("register: compiled functions are callable BY NAME from SQL") {
    PlPgSql.register(spark, freight)
    PlPgSql.register(spark, digest)
    assert(evalStr("fc(10, 12000000000, 0)") ==
      freightModel(10, 12000000000L, 0)) // per-unit $1.2k → mid
    assert(evalStr("fc(0, 5, 0)") == "empty")
    assert(evalStr("kd(123456)") == digestModel(123456L).toString)
    // over a real column, the by-name call equals the inline-text call
    Tables.t(spark, SparkTestSession.sf, "lineitem")
      .limit(2000).createOrReplaceTempView("pl_reg_li")
    val byName = spark.sql(
      """SELECT fc(CAST(l_quantity AS BIGINT),
        |  CAST(round(l_extendedprice * 1000000.0, 0) AS BIGINT),
        |  CAST(round(l_discount * 100.0, 0) AS BIGINT)) AS c, count(*) AS n
        |FROM pl_reg_li GROUP BY c ORDER BY c""".stripMargin).collect()
    val inline = spark.sql(
      s"""SELECT ${freight.call(
           "CAST(l_quantity AS BIGINT)",
           "CAST(round(l_extendedprice * 1000000.0, 0) AS BIGINT)",
           "CAST(round(l_discount * 100.0, 0) AS BIGINT)")} AS c, count(*) AS n
         |FROM pl_reg_li GROUP BY c ORDER BY c""".stripMargin).collect()
    assert(byName.map(_.toString).toSeq == inline.map(_.toString).toSeq)
    // wrong arity fails at analysis, loudly
    val e = intercept[Throwable](spark.sql("SELECT fc(1)").collect())
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("3 args"))
    // positional-only functions cannot register
    val pos = PlPgSql.compile(
      "create function p1(int) returns int as 'select $1 + 1' language sql")
    val m = intercept[IllegalArgumentException](
      PlPgSql.register(spark, pos)).getMessage
    assert(m.contains("named"), m)
  }

  // ---- CASE statements, RAISE, ASSERT (pl_exec.c exec_stmt_case/raise/assert) ----

  test("searched CASE statement: arms, ELSE, and 'case not found'") {
    val f = PlPgSql.compile(
      """create function grade(x bigint) returns string as $$
        |begin
        |  case
        |    when x >= 90 then return 'A';
        |    when x >= 80 then return 'B';
        |    else return 'C';
        |  end case;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("95")) == "A")
    assert(evalStr(f.call("85")) == "B")
    assert(evalStr(f.call("10")) == "C")

    val g = PlPgSql.compile(
      """create function g2(x bigint) returns string as $$
        |declare r string;
        |begin
        |  case when x > 0 then r := 'pos'; end case;
        |  return r;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(g.call("1")) == "pos")
    val e = intercept[Throwable](evalStr(g.call("-1")))
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("case not found"))
  }

  test("simple CASE statement with multi-value WHEN lists") {
    val f = PlPgSql.compile(
      """create function season(m bigint) returns string as $$
        |declare s string;
        |begin
        |  case m
        |    when 12, 1, 2 then s := 'winter';
        |    when 3, 4, 5 then s := 'spring';
        |    when 6, 7, 8 then s := 'summer';
        |    else s := 'autumn';
        |  end case;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("1")) == "winter")
    assert(evalStr(f.call("4")) == "spring")
    assert(evalStr(f.call("7")) == "summer")
    assert(evalStr(f.call("10")) == "autumn")
  }

  test("RAISE EXCEPTION %-formats args like exec_stmt_raise; lower levels drop") {
    // the regress's own shape: raise exception 'Room % does not exist', roomno
    val f = PlPgSql.compile(
      """create function chk(roomno bigint) returns bigint as $$
        |begin
        |  if roomno < 0 then
        |    raise exception 'Room % does not exist (pct: 100%%)', roomno;
        |  end if;
        |  raise notice 'checked %', roomno;
        |  return roomno;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("7")) == "7")
    val e = intercept[Throwable](evalStr(f.call("-3")))
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
    assert(chain.contains("Room -3 does not exist (pct: 100%)"), chain)

    // null parameter renders <NULL> (exec_stmt_raise)
    val g = PlPgSql.compile(
      """create function nn(x bigint) returns bigint as $$
        |declare y bigint;
        |begin
        |  raise exception 'got %', y;
        |end;
        |$$ language plpgsql""".stripMargin)
    val e2 = intercept[Throwable](evalStr(g.call("1")))
    assert(Iterator.iterate(e2)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ").contains("got <NULL>"))

    // placeholder/arg count mismatch fails at COMPILE time
    val m = intercept[IllegalArgumentException](PlPgSql.compile(
      "create function bad(x int) returns int as $$ begin " +
        "raise exception 'a % b %', x; end; $$ language plpgsql")).getMessage
    assert(m.contains("placeholders"), m)
  }

  test("ASSERT raises on violation, passes through otherwise") {
    val f = PlPgSql.compile(
      """create function inv(x bigint) returns bigint as $$
        |begin
        |  assert x <> 0, 'x must be nonzero';
        |  return cast(floor(1000 / x) as bigint);
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("8")) == "125")
    val e = intercept[Throwable](evalStr(f.call("0")))
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("x must be nonzero"))
  }

  test("EXIT/CONTINUE [WHEN] jump within unrolled loops (exec_stmt_exit)") {
    val first = PlPgSql.compile(
      """create function firstbig(k bigint) returns bigint as $$
        |declare pos bigint := 0; d bigint;
        |begin
        |  for i in 1..6 loop
        |    d := k % 10;
        |    exit when d >= 5;
        |    k := cast(floor(k / 10) as bigint);
        |    pos := i;
        |  end loop;
        |  return pos;
        |end;
        |$$ language plpgsql""".stripMargin)
    def firstModel(k0: Long): Long = {
      var k = k0; var pos = 0L; var i = 1
      while (i <= 6) {
        val d = k % 10
        if (d >= 5) return pos
        k = k / 10; pos = i; i += 1
      }
      pos
    }
    Seq(0L, 5L, 51L, 15L, 123456L, 444444L, 999999L, 111111L).foreach { k =>
      assert(evalStr(first.call(k.toString)) == firstModel(k).toString,
        s"k=$k")
    }

    val odd = PlPgSql.compile(
      """create function oddsum(k bigint) returns bigint as $$
        |declare s bigint := 0; d bigint;
        |begin
        |  for i in 1..6 loop
        |    d := k % 10;
        |    k := cast(floor(k / 10) as bigint);
        |    continue when d % 2 = 0;
        |    s := s + d;
        |  end loop;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin)
    def oddModel(k0: Long): Long = {
      var k = k0; var s = 0L
      for (_ <- 1 to 6) { val d = k % 10; k = k / 10; if (d % 2 != 0) s += d }
      s
    }
    Seq(0L, 7L, 24680L, 13579L, 987654L).foreach { k =>
      assert(evalStr(odd.call(k.toString)) == oddModel(k).toString, s"k=$k")
    }
  }

  test("EXIT from a nested block pops the block's shadowing first") {
    val f = PlPgSql.compile(
      """create function exsh() returns string as $$
        |declare v string := 'outer'; r string := '';
        |begin
        |  for i in 1..3 loop
        |    declare v string := 'inner';
        |    begin
        |      exit when i = 2;
        |      r := r || v;
        |    end;
        |    r := r || v;
        |  end loop;
        |  return r || '/' || v;
        |end;
        |$$ language plpgsql""".stripMargin)
    // i=1 appends inner+outer, i=2 exits from inside the block; the
    // final v must be the OUTER one even though the jump crossed the
    // block boundary
    assert(evalStr(f.call()) == "innerouter/outer")
  }

  test("EXIT outside a loop and loop labels are rejected") {
    assert(compileError(
      "create function e1() returns int as $$ begin exit; return 1; end; " +
        "$$ language plpgsql").contains("outside a loop"))
    assert(compileError(
      """create function e2() returns int as $$
        |begin
        |  for i in 1..2 loop
        |    exit outer_loop;
        |  end loop;
        |  return 1;
        |end;
        |$$ language plpgsql""".stripMargin).contains("label"))
  }

  // ---- review-found classes: declared-type coercion, budgets, slicing ----

  test("assignment and RETURN coerce through the declared type: " +
    "integer division truncates like the reference") {
    val f = PlPgSql.compile(
      """create function halve(x bigint) returns bigint as $$
        |declare d bigint;
        |begin
        |  d := x / 2;
        |  return d;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("5")) == "2")    // PG: bigint/bigint truncates
    assert(evalStr(f.call("-5")) == "-2")  // toward zero, both engines
    val g = PlPgSql.compile(
      "create function h2(x bigint) returns bigint as $$ begin " +
        "return x / 4; end; $$ language plpgsql")
    assert(evalStr(g.call("11")) == "2")
  }

  test("FOR ranges above the unroll budget fail loudly at compile time") {
    val msg = compileError(
      """create function big() returns bigint as $$
        |declare s bigint := 0;
        |begin
        |  for i in 1..100000 loop s := s + i; end loop;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(msg.contains("unroll") && msg.contains("set-wise"), msg)
    // a custom budget admits what a tighter one rejects
    val f = PlPgSql.compile(
      """create function okbig() returns bigint as $$
        |declare s bigint := 0;
        |begin
        |  for i in 1..250 loop s := s + 1; end loop;
        |  return s;
        |end;
        |$$ language plpgsql""".stripMargin, maxLoopUnroll = 300)
    assert(evalStr(f.call()) == "250")
    val tight = intercept[IllegalArgumentException](PlPgSql.compile(
      "create function tb() returns bigint as $$ begin " +
        "for i in 1..250 loop null; end loop; return 1; end; " +
        "$$ language plpgsql", maxLoopUnroll = 100)).getMessage
    assert(tight.contains("unroll"), tight)
  }

  test("a CASE expression inside an IF condition parses (depth-aware slicing)") {
    val f = PlPgSql.compile(
      """create function ce(x bigint) returns string as $$
        |begin
        |  if case when x > 0 then 1 else 0 end = 1 then
        |    return 'pos';
        |  end if;
        |  return 'nonpos';
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("3")) == "pos")
    assert(evalStr(f.call("-3")) == "nonpos")
  }

  test("LANGUAGE sql: EXTRACT-style inner FROM is scalar syntax, not table access") {
    val f = PlPgSql.compile(
      "create function yr(d date) returns int as " +
        "'select extract(year from d)' language sql")
    assert(evalStr(f.call("DATE '2020-05-04'")) == "2020")
  }

  test("scientific-notation literals lex as one number") {
    val f = PlPgSql.compile(
      """create function sci(x bigint) returns bigint as $$
        |declare y double := 1.5e3;
        |begin
        |  y := y + x;
        |  return cast(y as bigint);
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("25")) == "1525")
  }

  test("RAISE format-count validation applies to dropped levels too") {
    val msg = compileError(
      "create function rn2(x int) returns int as $$ begin " +
        "raise notice 'a % b %', x; return x; end; $$ language plpgsql")
    assert(msg.contains("placeholders"), msg)
  }

  // ---- r19: PG integer `/` in every position; fractional→int rounds ----

  test("integer '/' truncates in compound expressions and conditions " +
    "(int4div/int8div, not just at the assignment cast)") {
    // the r18 advisory counterexamples: d := x / 2 * 2 and IF x / 2 = 2
    val f = PlPgSql.compile(
      """create function dd(x bigint) returns bigint as $$
        |declare d bigint;
        |begin
        |  d := x / 2 * 2;
        |  return d;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("5")) == "4")    // PG: (5/2)*2 = 4
    assert(evalStr(f.call("-5")) == "-4")
    assert(evalStr(f.call("8")) == "8")
    val g = PlPgSql.compile(
      """create function ic(x bigint) returns string as $$
        |begin
        |  if x / 2 = 2 then return 'two'; end if;
        |  return 'other';
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(g.call("5")) == "two")  // PG: 5/2 = 2
    assert(evalStr(g.call("4")) == "two")
    assert(evalStr(g.call("6")) == "other")
    // fractional operands keep fractional division
    val h = PlPgSql.compile(
      """create function fd(x bigint) returns double as $$
        |declare y double;
        |begin
        |  y := x / 2.0;
        |  return y;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(h.call("5")) == "2.5")
  }

  test("fractional values assigned to integer variables round half away " +
    "from zero like PG's numeric->int cast") {
    val f = PlPgSql.compile(
      """create function rr(x double) returns bigint as $$
        |declare i bigint;
        |begin
        |  i := x;
        |  return i;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("2.6")) == "3")   // r18 truncated to 2
    assert(evalStr(f.call("2.4")) == "2")
    assert(evalStr(f.call("2.5")) == "3")
    assert(evalStr(f.call("-2.5")) == "-3") // away from zero
    assert(evalStr(f.call("-2.6")) == "-3")
  }

  // ---- r19: SETOF via RETURN NEXT / RETURN QUERY (rangefuncs.sql) ----

  test("SETOF: RETURN NEXT accumulates; explode() yields the rows") {
    val f = PlPgSql.compile(
      """create function flags(q bigint) returns setof string as $$
        |begin
        |  return next 'm' || cast(q % 3 as string);
        |  if q % 2 = 0 then
        |    return next 'even';
        |  end if;
        |  return query values ('a'), (cast(q % 5 as string));
        |  return;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(f.isSetof)
    def model(q: Long): Seq[String] = {
      val b = Seq.newBuilder[String]
      b += s"m${q % 3}"
      if (q % 2 == 0) b += "even"
      b += "a"
      b += s"${q % 5}"
      b.result()
    }
    Seq(0L, 1L, 6L, 7L, 12L).foreach { q =>
      val rows = spark.sql(
        s"SELECT explode(${f.call(q.toString)}) AS v").collect()
        .map(_.getString(0)).toSeq
      assert(rows == model(q), s"q=$q")
    }
    // the lowering is a Generator, not a UDF
    val df = spark.sql(s"SELECT explode(${f.call("7")}) AS v")
    assert(df.queryExecution.executedPlan.toString.contains("Generate"),
      df.queryExecution.executedPlan.toString)
  }

  test("SETOF: RETURN NEXT after RETURN is unreachable; bare RETURN ends " +
    "the set; fall-off-end is legal") {
    val f = PlPgSql.compile(
      """create function upto(n bigint) returns setof bigint as $$
        |begin
        |  return next 1;
        |  if n < 2 then return; end if;
        |  return next 2;
        |end;
        |$$ language plpgsql""".stripMargin)
    def rows(n: Long): Seq[Long] =
      spark.sql(s"SELECT explode(${f.call(n.toString)}) AS v").collect()
        .map(_.getLong(0)).toSeq
    assert(rows(1) == Seq(1L))
    assert(rows(5) == Seq(1L, 2L))
  }

  test("SETOF misuse fails loudly: RETURN value in SETOF, RETURN NEXT in " +
    "scalar, FROM in RETURN QUERY, multi-column VALUES") {
    assert(compileError(
      "create function s1() returns setof int as $$ begin return 1; end; " +
        "$$ language plpgsql").contains("RETURN NEXT"))
    // scalar function: `return next 1` parses as a returned expression
    // slice ('next' could be a variable name) — it is not valid SQL, so
    // it fails loudly at evaluation, never silently
    val s2 = PlPgSql.compile(
      "create function s2() returns int as $$ begin return next 1; end; " +
        "$$ language plpgsql")
    assert(intercept[Throwable](evalStr(s2.call())) != null)
    assert(compileError(
      "create function s3() returns setof int as $$ begin " +
        "return query select x from t; end; $$ language plpgsql")
      .contains("FROM"))
    assert(compileError(
      "create function s4() returns setof int as $$ begin " +
        "return query values (1, 2); end; $$ language plpgsql")
      .contains("single-column"))
    assert(compileError(
      "create function s5(x int) returns setof int as " +
        "'select x' language sql").contains("SETOF"))
  }

  // ---- r19: EXCEPTION blocks (pl_exec.c:1685, plpgsql.sql:1972) ----

  test("EXCEPTION: division_by_zero is caught; variables keep error-time " +
    "values; control resumes after the block") {
    val f = PlPgSql.compile(
      """create function sdiv(a bigint, b bigint) returns string as $$
        |declare r bigint; tag string := 'pre';
        |begin
        |  begin
        |    tag := 'in';
        |    r := a / b;
        |    tag := 'post';
        |  exception
        |    when division_by_zero then
        |      return 'caught/' || tag;
        |  end;
        |  return 'ok:' || cast(r as string) || '/' || tag;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("7", "2")) == "ok:3/post")
    // at the failing statement tag was already 'in' (error-time values)
    assert(evalStr(f.call("7", "0")) == "caught/in")
  }

  test("EXCEPTION: RAISE EXCEPTION is caught by raise_exception and " +
    "OTHERS; SQLERRM/SQLSTATE are bound; unmatched propagates") {
    val f = PlPgSql.compile(
      """create function rx(x bigint) returns string as $$
        |begin
        |  begin
        |    if x < 0 then raise exception 'neg %', x; end if;
        |    return 'pos';
        |  exception
        |    when raise_exception then
        |      return sqlstate || ':' || sqlerrm;
        |  end;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("1")) == "pos")
    assert(evalStr(f.call("-4")) == "P0001:neg -4")
    // OTHERS catches raise_exception but NOT assert_failure
    val g = PlPgSql.compile(
      """create function oa(x bigint) returns string as $$
        |begin
        |  begin
        |    assert x <> 0, 'zero!';
        |    if x < 0 then raise exception 'neg'; end if;
        |    return 'pos';
        |  exception
        |    when others then return 'other:' || sqlerrm;
        |  end;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(g.call("2")) == "pos")
    assert(evalStr(g.call("-2")) == "other:neg")
    val e = intercept[Throwable](evalStr(g.call("0")))
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ").contains("zero!"))
  }

  test("EXCEPTION: handler order wins, nested blocks re-catch, bare " +
    "RAISE re-throws outward") {
    val f = PlPgSql.compile(
      """create function nest(x bigint) returns string as $$
        |begin
        |  begin
        |    begin
        |      if x = 1 then raise exception 'inner'; end if;
        |      if x = 2 then return cast(10 / (x - 2) as string); end if;
        |      return 'clean';
        |    exception
        |      when division_by_zero then return 'div0';
        |      when raise_exception then raise;
        |    end;
        |  exception
        |    when others then return 'outer:' || sqlerrm;
        |  end;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(f.call("0")) == "clean")
    assert(evalStr(f.call("1")) == "outer:inner") // re-thrown, outer catches
    assert(evalStr(f.call("2")) == "div0")
    // bare RAISE outside a handler is rejected at compile time
    assert(compileError(
      "create function br() returns int as $$ begin raise; end; " +
        "$$ language plpgsql").contains("exception handler"))
    // case_not_found from an ELSE-less CASE statement is catchable
    val c = PlPgSql.compile(
      """create function cnf(x bigint) returns string as $$
        |begin
        |  begin
        |    case when x > 0 then return 'pos'; end case;
        |  exception
        |    when case_not_found then return 'nomatch';
        |  end;
        |end;
        |$$ language plpgsql""".stripMargin)
    assert(evalStr(c.call("3")) == "pos")
    assert(evalStr(c.call("-3")) == "nomatch")
    // unknown condition names are rejected loudly
    assert(compileError(
      "create function uc() returns int as $$ begin begin return 1; " +
        "exception when unique_violation then return 2; end; end; " +
        "$$ language plpgsql").contains("statically-enumerable"))
  }

  // ---- r19: compile-size budget and register() determinism guard ----

  test("pathological branch-in-loop nesting hits the emit budget loudly " +
    "instead of hanging") {
    val body = (1 to 40).map(_ =>
      "if a > 0 then a := a - 1; end if;").mkString(" ")
    val msg = intercept[IllegalArgumentException](PlPgSql.compile(
      s"""create function boom(a bigint) returns bigint as $$$$
         |begin
         |  for i in 1..40 loop
         |    $body
         |  end loop;
         |  return a;
         |end;
         |$$$$ language plpgsql""".stripMargin,
      maxEmitChars = 200000)).getMessage
    assert(msg.contains("maxEmitChars"), msg)
  }

  test("register() rejects non-deterministic args for multiply-referenced " +
    "parameters (PG evaluates arguments once)") {
    val f = PlPgSql.compile(
      """create function twice(v bigint) returns bigint as $$
        |begin
        |  return v + v;
        |end;
        |$$ language plpgsql""".stripMargin)
    PlPgSql.register(spark, f)
    assert(evalStr("twice(21)") == "42")
    val e = intercept[Throwable](
      spark.sql("SELECT twice(CAST(rand() * 10 AS BIGINT))").collect())
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
      .contains("non-deterministic"))
    // single-reference params accept non-deterministic args
    val g = PlPgSql.compile(
      """create function once(v bigint) returns bigint as $$
        |begin
        |  return v % 10;
        |end;
        |$$ language plpgsql""".stripMargin)
    PlPgSql.register(spark, g)
    assert(spark.sql("SELECT once(CAST(rand() * 10 AS BIGINT)) AS v")
      .collect()(0).getLong(0) < 10)
  }
}
