package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.queries.Hints

/** Hint-adherence proofs for the pg_hint_plan analogue
  * ([[graft.queries.Hints]]): each hint flips exactly the physical
  * strategy it names, an unknown hint is a no-op, and dropping a hint
  * restores the unhinted plan byte-for-byte — the adherence contract
  * the reference plugin enforces via its own planner hooks
  * (`/root/reference/gpcontrib/pg_hint_plan/pg_hint_plan.c`).
  */
class HintSpec extends AnyFunSuite {
  // fresh child session: sibling suites legitimately set session knobs
  // (PQ store dir, thresholds) that would perturb these very plans
  private lazy val spark = SparkTestSession.spark.newSession()
  private val sf = SparkTestSession.sf

  // normalized (ids/paths masked) so equality compares plan SHAPE only
  private def plan(df: DataFrame): String =
    graft.plans.PlanSnapshot.physicalPlan(df)

  private def sql(q: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => graft.Tables.t(spark, sf, n).createOrReplaceTempView(n))
    spark.sql(q)
  }

  test("MERGE + SHUFFLE_HASH hints flip both joins off broadcast") {
    val hinted = plan(sql(Hints.joinStrategySql(hinted = true)))
    val unhinted = plan(sql(Hints.joinStrategySql(hinted = false)))
    // hinted: sort-merge on orders, shuffled-hash on customer
    assert(hinted.contains("SortMergeJoin"), "MERGE(orders) not honored")
    assert(hinted.contains("ShuffledHashJoin"),
      "SHUFFLE_HASH(customer) not honored")
    // unhinted at sf0.001: both sides are broadcast-eligible and cost
    // picks broadcast-hash — the hints demonstrably changed strategy
    assert(unhinted.contains("BroadcastHashJoin"))
    assert(!unhinted.contains("SortMergeJoin"))
    assert(!unhinted.contains("ShuffledHashJoin"))
  }

  test("BROADCAST hint overrides a disabled auto-broadcast threshold") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val hinted = plan(sql(Hints.broadcastParallelSql(hinted = true)))
      val unhinted = plan(sql(Hints.broadcastParallelSql(hinted = false)))
      assert(hinted.contains("BroadcastHashJoin"),
        "BROADCAST(nation) must win over autoBroadcastJoinThreshold=-1")
      assert(!unhinted.contains("BroadcastHashJoin"),
        "with the threshold off and no hint, no broadcast should appear")
    } finally spark.conf.set(key, prev)
  }

  test("REPARTITION(8, col) hint shapes the exchange it names") {
    val hinted = plan(sql(Hints.broadcastParallelSql(hinted = true)))
    assert(hinted.contains("REPARTITION_BY_NUM"),
      "REPARTITION(8, s_nationkey) must materialize as a user-requested exchange")
  }

  test("unknown hint is ignored: plan identical to unhinted") {
    // the reference plugin warns-and-ignores unparsable hints
    // (pg_hint_plan.c hint_parse error path); Spark's ResolveHints does
    // the same for unrecognized names — the plan must be UNCHANGED
    val bogus = plan(sql(Hints.joinStrategySql(hinted = false)
      .replaceFirst("SELECT ", "SELECT /*+ TOTALLY_BOGUS_HINT(orders) */ ")))
    val unhinted = plan(sql(Hints.joinStrategySql(hinted = false)))
    assert(bogus == unhinted)
  }

  test("dropping the hint restores the original plan exactly") {
    val before = plan(sql(Hints.joinStrategySql(hinted = false)))
    plan(sql(Hints.joinStrategySql(hinted = true))) // hinted run between
    val after = plan(sql(Hints.joinStrategySql(hinted = false)))
    assert(before == after,
      "hint must be per-query: no residue once dropped")
  }

  test("DataFrame .hint(...) API matches the SQL comment form") {
    import org.apache.spark.sql.functions._
    val cust = graft.Tables.t(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = graft.Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
    val df = ord.join(cust.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey"))
    assert(plan(df).contains("ShuffledHashJoin"))
    val merged = ord.join(cust.hint("merge"),
      col("o_custkey") === col("c_custkey"))
    assert(plan(merged).contains("SortMergeJoin"))
  }

  // position of a table's pruned FileScan in the rendered plan — the
  // left-deep build order reads top-down, so scan order IS join order
  private def scanPos(p: String, marker: String): Int = {
    val i = p.indexOf(s"FileScan parquet [$marker")
    assert(i >= 0, s"no scan with leading column $marker in:\n$p")
    i
  }

  test("LEADING hint pins the join order (customer first, not authored lineitem)") {
    val hinted = plan(sql(Hints.leadingSql(hinted = true)))
    val unhinted = plan(sql(Hints.leadingSql(hinted = false)))
    // unhinted keeps the authored order: lineitem drives the chain
    assert(scanPos(unhinted, "l_orderkey") < scanPos(unhinted, "c_custkey"))
    // hinted: LEADING(customer, orders, lineitem) — dim-first left-deep
    assert(scanPos(hinted, "c_custkey") < scanPos(hinted, "o_orderkey"))
    assert(scanPos(hinted, "o_orderkey") < scanPos(hinted, "l_orderkey"))
    assert(hinted != unhinted, "hint must visibly change the join tree")
    // purely physical: identical results
    assert(sql(Hints.leadingSql(hinted = true)).collect().toSeq ==
      sql(Hints.leadingSql(hinted = false)).collect().toSeq)
  }

  test("LEADING declines a non-connected order (would plant a cross join)") {
    // customer x lineitem has no direct ON conjunct: the rule must warn
    // and keep the optimizer's order, like the unknown-hint contract
    val declined = plan(sql(Hints.leadingSql(hinted = false).replaceFirst(
      "SELECT ", "SELECT /*+ LEADING(customer, lineitem, orders) */ ")))
    assert(declined == plan(sql(Hints.leadingSql(hinted = false))))
  }

  test("LEADING declines an alias list that doesn't match the chain") {
    val declined = plan(sql(Hints.leadingSql(hinted = false).replaceFirst(
      "SELECT ", "SELECT /*+ LEADING(nosuch, orders, lineitem) */ ")))
    assert(declined == plan(sql(Hints.leadingSql(hinted = false))))
    // an incomplete list (missing customer) is also declined
    val partial = plan(sql(Hints.leadingSql(hinted = false).replaceFirst(
      "SELECT ", "SELECT /*+ LEADING(orders, lineitem) */ ")))
    assert(partial == plan(sql(Hints.leadingSql(hinted = false))))
  }

  test("LEADING gate off -> hint is inert") {
    val key = graft.plans.LeadingJoinRule.ConfKey
    try {
      spark.conf.set(key, "false")
      val off = plan(sql(Hints.leadingSql(hinted = true)))
      assert(off == plan(sql(Hints.leadingSql(hinted = false))))
    } finally spark.conf.unset(key)
  }

  test("hints are purely physical: hinted and unhinted results match") {
    val a = sql(Hints.joinStrategySql(hinted = true)).collect().toSeq
    val b = sql(Hints.joinStrategySql(hinted = false)).collect().toSeq
    assert(a == b)
    val c = sql(Hints.broadcastParallelSql(hinted = true)).collect().toSeq
    val d = sql(Hints.broadcastParallelSql(hinted = false)).collect().toSeq
    assert(c == d)
  }

  // ---- ROWS(...) cardinality correction (plans/RowsHint.scala, r16) -----

  // AQE-off child session: the configuration the hint is documented for
  // (RowsHintRule declines under AQE — see the decline test below)
  private lazy val noAqe = {
    val s = SparkTestSession.spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }
  private def sqlNoAqe(q: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => graft.Tables.t(noAqe, sf, n).createOrReplaceTempView(n))
    noAqe.sql(q)
  }

  test("ROWS corrects an estimate UP and the join falls off broadcast") {
    // threshold between the PRUNED estimates (customer ~3KB, orders ~12KB —
    // column pruning scales file-size stats by the projected width ratio)
    // so ONLY customer is broadcast-eligible — suppressing it cannot be
    // answered by broadcasting the other side
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = noAqe.conf.get(thr)
    try {
      noAqe.conf.set(thr, "8000")
      val unhinted = plan(sqlNoAqe(Hints.rowsSql(hinted = false)))
      val hinted = plan(sqlNoAqe(Hints.rowsSql(hinted = true)))
      assert(unhinted.contains("BroadcastHashJoin"),
        s"test premise: unhinted must broadcast customer:\n$unhinted")
      // *100000 correction pushes it over the threshold: no broadcast
      assert(!hinted.contains("BroadcastHashJoin"),
        s"ROWS correction up must suppress the broadcast:\n$hinted")
      // purely physical: identical results
      assert(sqlNoAqe(Hints.rowsSql(hinted = true)).collect().toSeq ==
        sqlNoAqe(Hints.rowsSql(hinted = false)).collect().toSeq)
    } finally noAqe.conf.set(thr, old)
  }

  test("ROWS corrects an estimate DOWN and the side broadcasts") {
    // suppress auto-broadcast so only the hint can cause one, then
    // correct the absolute estimate down to 'tiny' (the reference's #n)
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = noAqe.conf.get(thr)
    try {
      noAqe.conf.set(thr, "1024")
      val unhinted = plan(sqlNoAqe(Hints.rowsSql(hinted = false)))
      assert(!unhinted.contains("BroadcastHashJoin"), unhinted)
      val hinted = plan(sqlNoAqe(Hints.rowsSql(hinted = false).replaceFirst(
        "SELECT ", "SELECT /*+ ROWS(customer, 3) */ ")))
      assert(hinted.contains("BroadcastHashJoin"),
        s"ROWS #3 under a 1KB threshold must broadcast customer:\n$hinted")
    } finally noAqe.conf.set(thr, old)
  }

  test("ROWS declines under AQE (runtime stats supersede the estimate)") {
    // the shared suite session has AQE on: the hint must warn and drop,
    // leaving the plan identical to unhinted
    val declined = plan(sql(Hints.rowsSql(hinted = true)))
    assert(declined == plan(sql(Hints.rowsSql(hinted = false))))
  }

  test("ROWS declines an unknown alias and a malformed spec") {
    val base = plan(sqlNoAqe(Hints.rowsSql(hinted = false)))
    val badAlias = plan(sqlNoAqe(Hints.rowsSql(hinted = false).replaceFirst(
      "SELECT ", "SELECT /*+ ROWS(nosuch, 3) */ ")))
    assert(badAlias == base, "unknown alias must fall through")
    val badSpec = plan(sqlNoAqe(Hints.rowsSql(hinted = false).replaceFirst(
      "SELECT ", "SELECT /*+ ROWS(customer, 'pi') */ ")))
    assert(badSpec == base, "unparseable spec must fall through")
  }

  test("ROWS join-level form corrects the join result's estimate") {
    // ROWS(orders customer #5): the corrected JOIN subtree becomes the
    // broadcast side of the join above it
    val q =
      """SELECT c_mktsegment, COUNT(*) AS n
        |FROM lineitem
        |JOIN (SELECT o_orderkey, c_mktsegment
        |      FROM orders JOIN customer ON o_custkey = c_custkey) oc
        |  ON l_orderkey = oc.o_orderkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = noAqe.conf.get(thr)
    try {
      noAqe.conf.set(thr, "1024")
      val base = plan(sqlNoAqe(q))
      assert(!base.contains("BroadcastHashJoin"), base)
      val hinted = plan(sqlNoAqe(q.replaceFirst(
        "SELECT c_mktsegment", "SELECT /*+ ROWS(orders, customer, 2) */ c_mktsegment")))
      assert(hinted.contains("BroadcastHashJoin"),
        s"join-level ROWS must broadcast the corrected subtree:\n$hinted")
      assert(sqlNoAqe(q).collect().toSeq == sqlNoAqe(q.replaceFirst(
        "SELECT c_mktsegment",
        "SELECT /*+ ROWS(orders, customer, 2) */ c_mktsegment")).collect().toSeq)
    } finally noAqe.conf.set(thr, old)
  }

  test("LEADING and ROWS compose in one hint comment") {
    // the reference stacks hints freely in one comment block; both
    // custom rules consume their own node in the same post-hoc batch
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val old = noAqe.conf.get(thr)
    try {
      noAqe.conf.set(thr, "8000")
      val q = Hints.leadingSql(hinted = false).replaceFirst(
        "SELECT ",
        "SELECT /*+ LEADING(customer, orders, lineitem), " +
          "ROWS(customer, '*100000') */ ")
      val p = plan(sqlNoAqe(q))
      // LEADING held: customer scan first (dim-first left-deep)
      assert(scanPos(p, "c_custkey") < scanPos(p, "o_orderkey"), p)
      assert(scanPos(p, "o_orderkey") < scanPos(p, "l_orderkey"), p)
      // ROWS held: the corrected customer side is not broadcast
      assert(!p.contains("BroadcastExchange") ||
        !p.substring(0, scanPos(p, "c_custkey"))
          .contains("BroadcastExchange"),
        s"corrected customer must not be the broadcast side:\n$p")
      // physical-only: identical results
      assert(sqlNoAqe(q).collect().toSeq ==
        sqlNoAqe(Hints.leadingSql(hinted = false)).collect().toSeq)
    } finally noAqe.conf.set(thr, old)
  }

  test("ROWS gate off -> hint is inert") {
    val key = graft.plans.RowsHintRule.ConfKey
    try {
      noAqe.conf.set(key, "false")
      val off = plan(sqlNoAqe(Hints.rowsSql(hinted = true)))
      assert(off == plan(sqlNoAqe(Hints.rowsSql(hinted = false))))
    } finally noAqe.conf.unset(key)
  }

  // ---- SET(...) — the per-statement conf scope (plans/SetHint.scala) ----

  import graft.plans.SetHint

  private def setSqlNoAqe(q: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => graft.Tables.t(noAqe, sf, n).createOrReplaceTempView(n))
    SetHint.sql(noAqe, q)
  }

  test("SET flips the broadcast threshold for exactly one statement") {
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val before = noAqe.conf.get(thr)
    // premise: under the session default the customer side broadcasts
    val unhinted = plan(sqlNoAqe(Hints.setSql(hinted = false)))
    assert(unhinted.contains("BroadcastHashJoin"), unhinted)
    // SET -1 inside the statement: planned WITHOUT broadcast...
    val hinted = plan(setSqlNoAqe(Hints.setSql(hinted = true)))
    assert(!hinted.contains("BroadcastHashJoin"),
      s"SET(autoBroadcastJoinThreshold -1) must suppress the broadcast:\n$hinted")
    // ...and a scoped shuffle-partitions value (3 — distinct from the
    // test session's default 8) shapes the exchanges it planned
    val partsBefore = noAqe.conf.get("spark.sql.shuffle.partitions")
    val raw = setSqlNoAqe(Hints.setSql(hinted = true).replace(
        "SET(spark.sql.shuffle.partitions '8')",
        "SET(spark.sql.shuffle.partitions '3')"))
      .queryExecution.executedPlan.toString
    assert(raw.contains(", 3)"),
      s"SET(shuffle.partitions 3) must shape the scoped exchanges:\n$raw")
    // RESTORE: the conf is back, and the NEXT statement broadcasts again
    assert(noAqe.conf.get(thr) == before,
      "the scope must restore the threshold after planning")
    assert(noAqe.conf.get("spark.sql.shuffle.partitions") == partsBefore)
    val after = plan(sqlNoAqe(Hints.setSql(hinted = false)))
    assert(after.contains("BroadcastHashJoin"),
      "a statement AFTER the scope must plan under the original conf")
  }

  test("SET composes with LEADING and ROWS in one comment") {
    // the lane text carries SET + SET + LEADING + ROWS; LEADING must
    // still reorder (customer scanned before orders) while both SETs
    // apply — proof the stripper leaves sibling hints intact
    val hinted = setSqlNoAqe(Hints.setSql(hinted = true))
    val shape = plan(hinted)
    // the SETs applied (threshold -1 => sort-merge, never broadcast)...
    assert(!shape.contains("BroadcastHashJoin"), shape)
    assert(shape.contains("SortMergeJoin"), shape)
    // ...and LEADING survived the strip: customer is the LEFT side of
    // the join (the authored order is orders JOIN customer)
    val joined = hinted.queryExecution.optimizedPlan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.get
    assert(joined.left.output.exists(_.name == "c_custkey"),
      s"LEADING(customer, orders) must put customer on the left:\n$joined")
    // purely physical: identical results with and without every hint
    assert(setSqlNoAqe(Hints.setSql(hinted = true)).collect().toSeq ==
      sqlNoAqe(Hints.setSql(hinted = false)).collect().toSeq)
  }

  test("SET declines a non-whitelisted key and leaves the conf untouched") {
    val before = noAqe.conf.get("spark.sql.ansi.enabled", "true")
    val df = setSqlNoAqe(Hints.setSql(hinted = false).replaceFirst(
      "SELECT ", "SELECT /*+ SET(spark.sql.ansi.enabled 'false') */ "))
    df.collect() // runs fine, hint consumed
    assert(noAqe.conf.get("spark.sql.ansi.enabled", "true") == before,
      "a declined key must never be applied")
  }

  test("SET restores the conf when planning FAILS (finally bracket)") {
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val before = noAqe.conf.get(thr)
    intercept[Exception] {
      setSqlNoAqe(
        """SELECT /*+ SET(spark.sql.autoBroadcastJoinThreshold '-1') */
          |no_such_column FROM customer""".stripMargin)
    }
    assert(noAqe.conf.get(thr) == before,
      "the scope must restore even when analysis throws")
  }

  test("SET gate off -> items consumed but never applied") {
    try {
      noAqe.conf.set(SetHint.EnabledConf, "false")
      val thr = "spark.sql.autoBroadcastJoinThreshold"
      val before = noAqe.conf.get(thr)
      val q = Hints.setSql(hinted = false).replaceFirst(
        "SELECT ", "SELECT /*+ SET(spark.sql.autoBroadcastJoinThreshold '-1') */ ")
      val off = plan(setSqlNoAqe(q))
      assert(off.contains("BroadcastHashJoin"),
        "gated off, the SET must not apply")
      assert(noAqe.conf.get(thr) == before)
    } finally noAqe.conf.unset(SetHint.EnabledConf)
  }

  test("SET governs AQE runtime re-decisions via the statement-scoped clone") {
    // r17's honesty clause closed (r18 brief #7): with AQE ON, SetHint
    // runs the statement on a session CLONE carrying the scoped conf, so
    // a Set(...) threshold governs not just the initial plan but AQE's
    // runtime RE-decisions — here the SMJ->BHJ conversion, which only
    // the adaptive threshold (consulted at re-planning time, against
    // materialized shuffle stats) can produce when the static threshold
    // is -1. Restore on the caller's session is by construction; both
    // asserted below.
    val sp = spark // the shared session: AQE on (SparkTestSession)
    Seq("orders", "customer")
      .foreach(n => graft.Tables.t(sp, sf, n).createOrReplaceTempView(n))
    val static = "spark.sql.autoBroadcastJoinThreshold"
    val adaptive = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val savedStatic = sp.conf.get(static)
    val savedAdaptive = sp.conf.getOption(adaptive)
    def finalPlan(df: DataFrame): String = {
      df.collect() // materialize so AQE finishes re-planning
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
    }
    try {
      sp.conf.set(static, "-1") // initial plan: sort-merge, never broadcast
      assert(sp.conf.get("spark.sql.adaptive.enabled") == "true")
      val body = """SELECT o_orderkey, c_name FROM orders
                   |JOIN customer ON o_custkey = c_custkey""".stripMargin
      // unhinted: the adaptive threshold falls back to the static -1, so
      // AQE leaves the sort-merge join in place
      assert(!finalPlan(sp.sql(body)).contains("BroadcastHashJoin"))
      // hinted: same session, same static -1 — the ONLY delta is the
      // adaptive threshold on the statement-scoped clone, so the
      // broadcast in the final plan is an AQE re-decision under the hint
      val hinted = SetHint.sql(sp,
        s"SELECT /*+ SET($adaptive '10m') */ " + body.stripPrefix("SELECT "))
      assert(finalPlan(hinted).contains("BroadcastHashJoin"),
        "the scoped adaptive threshold must govern the AQE re-decision")
      // the caller's session was never touched
      assert(sp.conf.getOption(adaptive) == savedAdaptive,
        "statement scope must not leak into the caller's session")
      assert(sp.conf.get(static) == "-1")
      // and a statement AFTER the scope still sees the caller's conf
      assert(!finalPlan(sp.sql(body)).contains("BroadcastHashJoin"))
    } finally {
      sp.conf.set(static, savedStatic)
      savedAdaptive.fold(sp.conf.unset(adaptive))(v => sp.conf.set(adaptive, v))
    }
  }

  test("SET scanner: strips only SET items, leaves siblings, fails open") {
    val s1 = SetHint.scan(
      "SELECT /*+ SET(a.b 'x'), BROADCAST(t) SET(c.d, 42) */ 1")
    assert(s1.sets == Seq("a.b" -> "x", "c.d" -> "42"))
    assert(s1.cleanSql == "SELECT /*+ BROADCAST(t) */ 1")
    // a comment reduced to nothing is dropped entirely
    val s2 = SetHint.scan("SELECT /*+ SET(k v) */ 1")
    assert(s2.cleanSql == "SELECT  1" && s2.sets == Seq("k" -> "v"))
    // quoted value keeps inner spaces and '' unescapes
    val s3 = SetHint.scan("SELECT /*+ SET(k 'a b''c') */ 1")
    assert(s3.sets == Seq("k" -> "a b'c"))
    // unbalanced body: left byte-identical, no sets extracted
    val bad = "SELECT /*+ SET(k 'v) oops */ 1"
    val s4 = SetHint.scan(bad)
    assert(s4.cleanSql == bad && s4.sets.isEmpty)
    // non-hint comments and plain text untouched
    val s5 = SetHint.scan("SELECT /* SET(k v) */ 1")
    assert(s5.cleanSql == "SELECT /* SET(k v) */ 1" && s5.sets.isEmpty)
  }
}
