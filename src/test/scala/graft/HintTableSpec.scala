package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.plans.HintTable
import graft.queries.Hints

/** Hint-TABLE behavior (pg_hint_plan.c get_hints_from_table + the
  * enable_hint_table GUC): hints keyed by normalized query fingerprint
  * apply without editing the query; app-specific rows beat the
  * wildcard; the gate defaults OFF. */
class HintTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark.newSession()
  private val sf = SparkTestSession.sf

  private def plan(df: DataFrame): String =
    graft.plans.PlanSnapshot.physicalPlan(df)

  private def views(): Unit =
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => graft.Tables.t(spark, sf, n).createOrReplaceTempView(n))

  private val q3 = Hints.joinStrategySql(hinted = false)

  test("normalize masks literals/whitespace/case into one fingerprint") {
    val a = HintTable.normalize(
      "SELECT * FROM t WHERE x = 'BUILDING'  AND y < 42")
    val b = HintTable.normalize(
      "select * from t where x = 'machinery' and Y < 7")
    assert(a == b)
    assert(a == "select * from t where x = ? and y < ?")
    // escaped quote inside a literal stays inside the mask
    assert(HintTable.normalize("SELECT 'it''s' AS v") ==
      HintTable.normalize("SELECT 'other' AS v"))
    // identifiers with digits are NOT masked
    assert(HintTable.normalize("SELECT c1 FROM t2") == "select c1 from t2")
    // different shapes stay distinct
    assert(HintTable.normalize("SELECT a FROM t") !=
      HintTable.normalize("SELECT b FROM t"))
  }

  test("registered hint applies by fingerprint without editing the query") {
    views()
    HintTable.clear()
    try {
      spark.conf.set(HintTable.EnabledConf, "true")
      HintTable.register(q3, "MERGE(orders), SHUFFLE_HASH(customer)")
      val hinted = plan(HintTable.sql(spark, q3))
      assert(hinted.contains("SortMergeJoin") &&
        hinted.contains("ShuffledHashJoin"))
      // a DIFFERENT literal in the query hits the same fingerprint row
      val variant = q3.replace("'BUILDING'", "'MACHINERY'")
      val vplan = plan(HintTable.sql(spark, variant))
      assert(vplan.contains("SortMergeJoin"))
      // results unchanged by the hint (physical-only)
      assert(HintTable.sql(spark, q3).collect().toSeq ==
        spark.sql(q3).collect().toSeq)
    } finally {
      spark.conf.unset(HintTable.EnabledConf); HintTable.clear()
    }
  }

  test("the gate defaults OFF and an unmatched shape passes through") {
    views()
    HintTable.clear()
    try {
      HintTable.register(q3, "MERGE(orders)")
      // enabled conf unset -> disabled -> unhinted plan
      val off = plan(HintTable.sql(spark, q3))
      assert(!off.contains("SortMergeJoin"))
      spark.conf.set(HintTable.EnabledConf, "true")
      // enabled but a different query shape -> no row -> unhinted
      val other = plan(HintTable.sql(spark,
        "SELECT count(*) AS n FROM customer"))
      assert(other == plan(spark.sql("SELECT count(*) AS n FROM customer")))
    } finally {
      spark.conf.unset(HintTable.EnabledConf); HintTable.clear()
    }
  }

  test("application-specific row beats the wildcard row") {
    views()
    HintTable.clear()
    try {
      spark.conf.set(HintTable.EnabledConf, "true")
      HintTable.register(q3, "MERGE(orders)")                    // wildcard
      HintTable.register(q3, "SHUFFLE_HASH(orders)", app = "etl")
      // no application set -> wildcard row
      assert(plan(HintTable.sql(spark, q3)).contains("SortMergeJoin"))
      // the etl application -> its own row wins
      spark.conf.set(HintTable.ApplicationConf, "etl")
      val p = plan(HintTable.sql(spark, q3))
      assert(p.contains("ShuffledHashJoin") && !p.contains("SortMergeJoin"))
      // an application with no specific row falls back to wildcard
      spark.conf.set(HintTable.ApplicationConf, "adhoc")
      assert(plan(HintTable.sql(spark, q3)).contains("SortMergeJoin"))
    } finally {
      spark.conf.unset(HintTable.EnabledConf)
      spark.conf.unset(HintTable.ApplicationConf)
      HintTable.clear()
    }
  }

  test("injection targets the OUTERMOST select, never literals or CTEs") {
    // the word select inside a string literal is not a keyword
    assert(HintTable.outerSelectEnd("SELECT 'select' AS v") == Some(6))
    val cte = "WITH c AS (SELECT o_custkey AS k FROM orders) " +
      "SELECT count(*) AS n FROM c"
    // the outer statement's SELECT, not the CTE body's
    assert(HintTable.outerSelectEnd(cte) == Some(cte.indexOf("SELECT count") + 6))
    // a leading comment containing select is skipped
    assert(HintTable.outerSelectEnd("/* select */ SELECT 1 AS x") == Some(19))
    // literal-only / non-select text -> None (pass-through)
    assert(HintTable.outerSelectEnd("INSERT INTO t VALUES (1)").isEmpty)
    // double-quoted strings (Spark's default string delimiter) and
    // backtick identifiers are skipped like single-quoted literals
    assert(HintTable.outerSelectEnd("""SELECT "select" AS v""") == Some(6))
    val bt = "SELECT `select col` FROM t"
    assert(HintTable.outerSelectEnd(bt) == Some(6))
    // a depth-0 quoted 'select' BEFORE the keyword must not steal it
    // (a backtick CTE name here would have misplaced the injected hint)
    val dq = "WITH `select` AS (SELECT 1 AS x) " +
      "SELECT count(*) AS n FROM `select`"
    assert(HintTable.outerSelectEnd(dq) == Some(dq.indexOf("SELECT count") + 6))
    // doubled-delimiter escapes inside each quote kind stay inside
    assert(HintTable.outerSelectEnd("SELECT \"se\"\"lect\" AS v") == Some(6))
    assert(HintTable.outerSelectEnd("SELECT `se``lect` FROM t") == Some(6))
    // BACKSLASH escapes (Spark's actual string escape): a \' or \" must
    // not end the quoted run early — a 'select' later in the literal
    // would otherwise steal the outer-SELECT offset
    assert(HintTable.outerSelectEnd("SELECT 'a\\' select b' AS v") == Some(6))
    assert(HintTable.outerSelectEnd("SELECT \"a\\\" select b\" AS v") == Some(6))
    // backticks do NOT backslash-escape: \ is an ordinary identifier char
    val btBs = "WITH `a\\` AS (SELECT 1 AS x) SELECT count(*) AS n FROM `a\\`"
    assert(HintTable.outerSelectEnd(btBs) == Some(btBs.indexOf("SELECT count") + 6))
    // end-to-end: the hint lands on the outer block of a CTE query
    views()
    HintTable.clear()
    try {
      spark.conf.set(HintTable.EnabledConf, "true")
      val q = "WITH big AS (SELECT * FROM orders) " +
        "SELECT count(*) AS n FROM big JOIN customer ON o_custkey = c_custkey"
      HintTable.register(q, "MERGE(customer)")
      val p = plan(HintTable.sql(spark, q))
      assert(p.contains("SortMergeJoin"))
      assert(HintTable.sql(spark, q).collect().toSeq ==
        spark.sql(q).collect().toSeq)
    } finally {
      spark.conf.unset(HintTable.EnabledConf); HintTable.clear()
    }
  }

  test("rows load from a DataFrame with the reference's table shape") {
    views()
    HintTable.clear()
    try {
      spark.conf.set(HintTable.EnabledConf, "true")
      import spark.implicits._
      HintTable.load(Seq(
        (HintTable.normalize(q3), "", "MERGE(orders)"))
        .toDF("norm_query_string", "application_name", "hints"))
      assert(plan(HintTable.sql(spark, q3)).contains("SortMergeJoin"))
    } finally {
      spark.conf.unset(HintTable.EnabledConf); HintTable.clear()
    }
  }

  test("ROWS cardinality override delivers through the hint table") {
    // the Rows(...)-analogue's production delivery: a DBA pins the
    // correction per query FINGERPRINT, no query edit. AQE-off child
    // session (RowsHintRule's documented configuration).
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // threshold between the pruned estimates (customer ~3KB, orders ~12KB): only
    // customer can broadcast, so suppressing it is visible in the plan
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "8000")
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => graft.Tables.t(s, sf, n).createOrReplaceTempView(n))
    val q = Hints.rowsSql(hinted = false)
    HintTable.clear()
    try {
      s.conf.set(HintTable.EnabledConf, "true")
      val before = plan(HintTable.sql(s, q))
      assert(before.contains("BroadcastHashJoin"),
        s"premise: customer auto-broadcasts unhinted:\n$before")
      HintTable.register(q, "ROWS(customer, '*100000')")
      val after = plan(HintTable.sql(s, q))
      assert(!after.contains("BroadcastHashJoin"),
        s"table-delivered ROWS must flip the strategy:\n$after")
      // physical-only: same rows either way
      assert(HintTable.sql(s, q).collect().toSeq == s.sql(q).collect().toSeq)
    } finally {
      s.conf.unset(HintTable.EnabledConf); HintTable.clear()
    }
  }

  test("SET conf scope delivers through the hint table and restores") {
    // pg_hint_plan applies table-delivered Set hints exactly like
    // comment ones (per-statement GUC scope); here the registered row
    // kills auto-broadcast for one fingerprint, and the conf is back
    // before the next statement plans
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => graft.Tables.t(s, sf, n).createOrReplaceTempView(n))
    val q = Hints.setSql(hinted = false)
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val before = s.conf.get(thr)
    HintTable.clear()
    try {
      s.conf.set(HintTable.EnabledConf, "true")
      val unpinned = plan(HintTable.sql(s, q))
      assert(unpinned.contains("BroadcastHashJoin"), unpinned)
      HintTable.register(q, "SET(spark.sql.autoBroadcastJoinThreshold '-1')")
      val pinned = plan(HintTable.sql(s, q))
      assert(!pinned.contains("BroadcastHashJoin"),
        s"table-delivered SET must kill the broadcast:\n$pinned")
      assert(s.conf.get(thr) == before,
        "the scope must restore after the table-hinted statement")
      assert(HintTable.sql(s, q).collect().toSeq == s.sql(q).collect().toSeq)
    } finally {
      s.conf.unset(HintTable.EnabledConf); HintTable.clear()
    }
  }
}
