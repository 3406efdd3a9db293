package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Union}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{EagerAggRule, OrExpansionRule, PushJoinBelowUnionAllRule}

/** The ORCA-xform analogues (EagerAggRule, PushJoinBelowUnionAllRule,
  * OrExpansionRule):
  * each must (a) transform the plan it claims to transform, (b) leave
  * results bit-identical to the untransformed plan, and (c) respect its
  * applicability guards. Rule-on plans run in a child session so the
  * shared test session stays pristine. */
class XformRulesSpec extends AnyFunSuite {
  private val sf = SparkTestSession.sf

  private def withRules[A](confs: (String, String)*)(f: org.apache.spark.sql.SparkSession => A): A = {
    val s = SparkTestSession.spark.newSession()
    EagerAggRule.install(s)
    PushJoinBelowUnionAllRule.install(s)
    OrExpansionRule.install(s)
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    f(s)
  }

  private def aggsInPlan(p: LogicalPlan): Seq[Aggregate] =
    p.collect { case a: Aggregate => a }

  private def joinsInPlan(p: LogicalPlan): Seq[Join] =
    p.collect { case j: Join => j }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // ---- eager aggregation ------------------------------------------------

  private def eagerShape(s: org.apache.spark.sql.SparkSession): DataFrame = {
    val li = Tables.t(s, sf, "lineitem")
    val ord = Tables.t(s, sf, "orders")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(ord("o_orderpriority"))
      .agg(min(li("l_shipdate")).as("min_ship"),
           max(li("l_shipdate")).as("max_ship"),
           sum(li("l_quantity").cast("long")).as("sum_qty"),
           count(lit(1)).as("n_rows"),
           avg(li("l_quantity").cast("long")).as("avg_qty"))
  }

  test("eager agg pushes a partial aggregate below the join") {
    withRules(EagerAggRule.ConfKey -> "true") { s =>
      val df = eagerShape(s)
      val plan = df.queryExecution.optimizedPlan
      val aggs = aggsInPlan(plan)
      assert(aggs.size == 2, s"expected upper+lower aggregates:\n$plan")
      // the lower aggregate is the join's outer (left) child
      val pushed = joinsInPlan(plan).exists(_.left.exists {
        case a: Aggregate => a.groupingExpressions.nonEmpty
        case _ => false
      })
      assert(pushed, s"no aggregate below the join:\n$plan")
    }
  }

  test("eager agg preserves results exactly (min/max/sum/count/avg)") {
    val off = withRules(EagerAggRule.ConfKey -> "false") { s =>
      sortedRows(eagerShape(s).withColumn("avg_qty", round(col("avg_qty"), 6)))
    }
    val on = withRules(EagerAggRule.ConfKey -> "true") { s =>
      sortedRows(eagerShape(s).withColumn("avg_qty", round(col("avg_qty"), 6)))
    }
    assert(on == off)
  }

  test("eager agg preserves a global (no grouping) aggregate") {
    def shape(s: org.apache.spark.sql.SparkSession): DataFrame = {
      val li = Tables.t(s, sf, "lineitem")
      val ord = Tables.t(s, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(sum(li("l_quantity").cast("long")).as("sum_qty"),
             count(lit(1)).as("n"))
    }
    val off = withRules(EagerAggRule.ConfKey -> "false")(s => sortedRows(shape(s)))
    val on = withRules(EagerAggRule.ConfKey -> "true") { s =>
      val df = shape(s)
      assert(aggsInPlan(df.queryExecution.optimizedPlan).size == 2,
        "global agg should still push a keyed lower aggregate")
      sortedRows(df)
    }
    assert(on == off)
  }

  test("eager agg guards: DISTINCT and inner-side aggregate args do not fire") {
    withRules(EagerAggRule.ConfKey -> "true") { s =>
      val li = Tables.t(s, sf, "lineitem")
      val ord = Tables.t(s, sf, "orders")
      val distinctAgg = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(ord("o_orderpriority"))
        .agg(countDistinct(li("l_partkey")).as("d"))
      assert(aggsInPlan(distinctAgg.queryExecution.optimizedPlan)
        .count(_.child.isInstanceOf[Join]) <= 1,
        "DISTINCT aggregate must not be pushed")
      val innerArg = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(li("l_returnflag"))
        .agg(sum(ord("o_totalprice")).as("s"))
      val aggs = aggsInPlan(innerArg.queryExecution.optimizedPlan)
      assert(aggs.size == 1,
        "aggregate over the inner child's column must not be pushed")
    }
  }

  test("eager agg guards: decimal sums are not pushed (re-aggregation would widen precision)") {
    withRules(EagerAggRule.ConfKey -> "true") { s =>
      val li = Tables.t(s, sf, "lineitem")
      val ord = Tables.t(s, sf, "orders")
      val dec = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(ord("o_orderpriority"))
        .agg(sum(li("l_quantity").cast("decimal(12,2)")).as("s"))
      assert(aggsInPlan(dec.queryExecution.optimizedPlan).size == 1,
        "decimal sum must not be pushed: sum(decimal(p,s)) widens to " +
          "decimal(p+10,s) and re-aggregating would change the result type")
    }
  }

  test("eager agg accumulates an integral avg partial in DoubleType (Average's own sumDataType)") {
    withRules(EagerAggRule.ConfKey -> "true") { s =>
      val plan = eagerShape(s).queryExecution.optimizedPlan
      // the lower aggregate is the one with no aggregate beneath it
      val lowerAgg = aggsInPlan(plan).find(a => aggsInPlan(a.child).isEmpty).get
      val avgPartial = lowerAgg.aggregateExpressions.collectFirst {
        case al: org.apache.spark.sql.catalyst.expressions.Alias
            if al.name.endsWith("_ps") => al
      }
      assert(avgPartial.isDefined, s"no avg sum-partial in lower agg:\n$plan")
      assert(avgPartial.get.dataType == org.apache.spark.sql.types.DoubleType,
        "a LongType partial could overflow-wrap where vanilla Average " +
          s"(double accumulator) would not: ${avgPartial.get.dataType}")
    }
  }

  // ---- cost-based decision from ANALYZE stats (r16) ----------------------
  // ORCA costs CXformEagerAgg from column NDV; with CBO on and ANALYZE
  // stats present, the rule estimates the lower group reduction
  // (rows / ∏NDV(keys)) and declines pushes that cannot compress —
  // including fixed-width near-unique keys the type heuristic would pass.

  private def costTables(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.catalog.tableExists("eagercost_facts")) {
      val li = Tables.t(s, sf, "lineitem")
      li.select(
          xxhash64(col("l_orderkey"), col("l_linenumber")).as("digest"),
          pmod(col("l_orderkey"), lit(10)).as("k"),
          col("l_returnflag").as("flag"),
          col("l_quantity").cast("long").as("v"))
        .write.mode("overwrite").saveAsTable("eagercost_facts")
      val f = s.table("eagercost_facts")
      f.select(col("digest"), pmod(col("digest"), lit(5)).as("grp"))
        .limit(500).distinct()
        .write.mode("overwrite").saveAsTable("eagercost_dim_digest")
      f.select(col("k"), (col("k") * 2).as("grp")).distinct()
        .write.mode("overwrite").saveAsTable("eagercost_dim_k")
      f.select(col("flag"), lit(1).as("grp")).distinct()
        .write.mode("overwrite").saveAsTable("eagercost_dim_flag")
      s.sql("ANALYZE TABLE eagercost_facts COMPUTE STATISTICS FOR ALL COLUMNS")
      // un-analyzed clone: the no-stats fallback path
      f.write.mode("overwrite").saveAsTable("eagercost_facts_nostats")
    }

  private def costShape(s: org.apache.spark.sql.SparkSession,
                        factTable: String, key: String,
                        dimTable: String): DataFrame = {
    val f = s.table(factTable)
    val d = s.table(dimTable)
    f.join(d, f(key) === d(key)).groupBy(d("grp"))
      .agg(min(f("v")).as("mv"), sum(f("v")).as("sv"))
  }

  test("eager agg declines a near-unique fixed-width key BY COST when stats exist") {
    withRules("spark.sql.cbo.enabled" -> "true") { s =>
      costTables(s)
      // digest is a 64-bit xxhash64 column: fixed-width (the type
      // heuristic would push) but NDV≈rows, so the push compresses
      // nothing — stats must decline it
      val byCost = costShape(s, "eagercost_facts", "digest", "eagercost_dim_digest")
      assert(aggsInPlan(byCost.queryExecution.optimizedPlan).size == 1,
        s"near-unique digest key must be declined by cost:\n${byCost.queryExecution.optimizedPlan}")
    }
    // ...and the same shape WITHOUT stats falls back to the width
    // heuristic, which pushes (documents exactly what the cost decision
    // buys over the r15 heuristic)
    withRules("spark.sql.cbo.enabled" -> "true") { s =>
      costTables(s)
      val fallback = costShape(s, "eagercost_facts_nostats", "digest", "eagercost_dim_digest")
      assert(aggsInPlan(fallback.queryExecution.optimizedPlan).size == 2,
        "no stats -> fixed-width heuristic pushes")
    }
  }

  test("eager agg stats decision overrides the heuristic in BOTH directions") {
    withRules("spark.sql.cbo.enabled" -> "true") { s =>
      costTables(s)
      // low-NDV fixed-width key (10 values over ~6k rows): pushes by cost
      val win = costShape(s, "eagercost_facts", "k", "eagercost_dim_k")
      assert(aggsInPlan(win.queryExecution.optimizedPlan).size == 2,
        s"600x-reduction key must push:\n${win.queryExecution.optimizedPlan}")
      // low-NDV STRING key (3 return flags): the width heuristic would
      // skip it, but stats prove the compression — pushes by cost
      val str = costShape(s, "eagercost_facts", "flag", "eagercost_dim_flag")
      assert(aggsInPlan(str.queryExecution.optimizedPlan).size == 2,
        s"low-NDV string key must push when stats prove it:\n${str.queryExecution.optimizedPlan}")
      // threshold is live: demanding more reduction than the key offers
      // flips the low-NDV decision off
      s.conf.set(EagerAggRule.MinReductionKey, "100000.0")
      try assert(aggsInPlan(costShape(s, "eagercost_facts", "k", "eagercost_dim_k")
        .queryExecution.optimizedPlan).size == 1,
        "minReduction above the key's reduction must decline")
      finally s.conf.unset(EagerAggRule.MinReductionKey)
    }
    // CBO off (the default): string key skipped by the heuristic as before
    withRules() { s =>
      costTables(s)
      val str = costShape(s, "eagercost_facts", "flag", "eagercost_dim_flag")
      assert(aggsInPlan(str.queryExecution.optimizedPlan).size == 1,
        "without stats the string-key heuristic still declines")
    }
  }

  test("eager agg cost path preserves results exactly") {
    val off = withRules(EagerAggRule.ConfKey -> "false") { s =>
      costTables(s)
      sortedRows(costShape(s, "eagercost_facts", "k", "eagercost_dim_k"))
    }
    val on = withRules("spark.sql.cbo.enabled" -> "true") { s =>
      costTables(s)
      val df = costShape(s, "eagercost_facts", "k", "eagercost_dim_k")
      assert(aggsInPlan(df.queryExecution.optimizedPlan).size == 2)
      sortedRows(df)
    }
    assert(on == off)
  }

  test("eager agg kill-switch disables the rewrite (default is ON since r13)") {
    withRules(EagerAggRule.ConfKey -> "false") { s =>
      assert(aggsInPlan(eagerShape(s).queryExecution.optimizedPlan).size == 1)
    }
    // and the r13 measured default: installed with no conf set -> fires
    withRules() { s =>
      assert(aggsInPlan(eagerShape(s).queryExecution.optimizedPlan).size > 1)
    }
  }

  // ---- push join below union all ---------------------------------------

  private def unionShape(s: org.apache.spark.sql.SparkSession): DataFrame = {
    val c = Tables.t(s, sf, "customer")
    val u = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), lit("b").as("src"))
      .unionAll(c.filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_custkey"), lit("m").as("src")))
    val ord = Tables.t(s, sf, "orders")
    u.join(ord, u("c_custkey") === ord("o_custkey"))
      .select(col("src"), col("o_orderkey"), col("o_totalprice"))
  }

  test("join over UNION ALL distributes into per-branch joins") {
    withRules(PushJoinBelowUnionAllRule.ConfKey -> "true") { s =>
      val df = unionShape(s)
      val plan = df.queryExecution.optimizedPlan
      assert(joinsInPlan(plan).size == 2, s"expected one join per branch:\n$plan")
      val unionOnTopOfJoins = plan.collect {
        case u: Union if u.children.forall(c => joinsInPlan(c).nonEmpty) => u
      }
      assert(unionOnTopOfJoins.nonEmpty, s"joins must sit under the union:\n$plan")
    }
  }

  test("a column selected twice into the union still distributes correctly") {
    // the analyzer aliases a repeated output column to a fresh exprId,
    // so the positional rebind stays unambiguous and distribution is
    // legal; the rule's duplicate-exprId guard covers only plans built
    // OUTSIDE the analyzer (other rules), which can't arise from the
    // DataFrame API. Prove the distributed result equals the rule-off
    // result for this shape.
    def shape(s: org.apache.spark.sql.SparkSession): DataFrame = {
      val c = Tables.t(s, sf, "customer")
      val u = c.select(col("c_custkey"), col("c_custkey"))
        .unionAll(c.select(col("c_custkey"), col("c_custkey")))
      val ord = Tables.t(s, sf, "orders").select(col("o_custkey"))
      u.join(ord, u(u.columns.head) === ord("o_custkey"))
    }
    val on = withRules(PushJoinBelowUnionAllRule.ConfKey -> "true") { s =>
      val df = shape(s)
      assert(joinsInPlan(df.queryExecution.optimizedPlan).size == 2)
      sortedRows(df)
    }
    val off = withRules(PushJoinBelowUnionAllRule.ConfKey -> "false")(
      s => sortedRows(shape(s)))
    assert(on == off)
  }

  test("join over UNION ALL preserves results") {
    val off = withRules(PushJoinBelowUnionAllRule.ConfKey -> "false")(
      s => sortedRows(unionShape(s)))
    val on = withRules(PushJoinBelowUnionAllRule.ConfKey -> "true")(
      s => sortedRows(unionShape(s)))
    assert(on == off)
  }

  test("a nondeterministic non-union side must not distribute") {
    // duplicating `other` into each branch would re-draw rand() per copy —
    // the distributed plan could keep different order rows per branch
    withRules(PushJoinBelowUnionAllRule.ConfKey -> "true") { s =>
      val c = Tables.t(s, sf, "customer")
      val u = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .unionAll(c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey")))
      val ord = Tables.t(s, sf, "orders")
        .filter(rand(7) < 0.5).select(col("o_custkey"))
      val j = u.join(ord, u("c_custkey") === ord("o_custkey"))
      assert(joinsInPlan(j.queryExecution.optimizedPlan).size == 1,
        "nondeterministic other side must keep the single join")
    }
  }

  // ---- OR-expansion ----------------------------------------------------

  private def orShape(s: org.apache.spark.sql.SparkSession): DataFrame = {
    val c = Tables.t(s, sf, "customer")
    val o = Tables.t(s, sf, "orders").filter(col("o_orderkey") <= 500)
    o.join(c, o("o_custkey") === c("c_custkey") ||
              pmod(o("o_orderkey"), lit(100)) + 1 === c("c_custkey"))
      .select(o("o_orderkey"), c("c_custkey"), c("c_mktsegment"))
  }

  test("OR-expansion turns the disjunctive nested loop into a union of hash joins") {
    withRules(OrExpansionRule.ConfKey -> "true") { s =>
      val df = orShape(s)
      val logical = df.queryExecution.optimizedPlan
      assert(joinsInPlan(logical).size == 2, s"expected 2 joins:\n$logical")
      assert(logical.collect { case u: Union => u }.nonEmpty, s"$logical")
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin"),
        s"OR join must not nested-loop after expansion:\n$physical")
    }
    withRules(OrExpansionRule.ConfKey -> "false") { s =>
      val physical = orShape(s).queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastNestedLoopJoin"),
        s"baseline should nested-loop (else the rewrite proves nothing):\n$physical")
    }
  }

  test("OR-expansion preserves bag semantics, including both-disjuncts-true rows") {
    val off = withRules(OrExpansionRule.ConfKey -> "false")(
      s => sortedRows(orShape(s)))
    val on = withRules(OrExpansionRule.ConfKey -> "true")(
      s => sortedRows(orShape(s)))
    assert(on == off)
    // the shape genuinely has rows where BOTH disjuncts hold (o_custkey
    // == o_orderkey%100+1): without the NOT-coalesce dedup they would
    // double — prove the guard is load-bearing
    val both = withRules() { s =>
      val c = Tables.t(s, sf, "customer")
      val o = Tables.t(s, sf, "orders").filter(col("o_orderkey") <= 500)
      o.join(c, o("o_custkey") === c("c_custkey") &&
                pmod(o("o_orderkey"), lit(100)) + 1 === c("c_custkey")).count()
    }
    assert(both > 0, "fixture must contain both-true rows")
  }

  test("OR-expansion guards: a disjunct without a cross-side equality does not fire") {
    withRules(OrExpansionRule.ConfKey -> "true") { s =>
      val c = Tables.t(s, sf, "customer")
      val o = Tables.t(s, sf, "orders").filter(col("o_orderkey") <= 200)
      // second disjunct is a pure range predicate: a branch carrying it
      // would nested-loop anyway, so the rewrite must not fire
      val j = o.join(c, o("o_custkey") === c("c_custkey") ||
                        o("o_totalprice") > c("c_acctbal"))
      assert(joinsInPlan(j.queryExecution.optimizedPlan).size == 1)
      // a literal equality is not cross-side either: empty reference
      // sets are subsets of every outputSet, so this once slipped the
      // guard — and its branch cannot hash-join
      val j2 = o.join(c, o("o_custkey") === c("c_custkey") ||
                         o("o_orderpriority") === lit("1-URGENT"))
      assert(joinsInPlan(j2.queryExecution.optimizedPlan).size == 1,
        "a constant-vs-column disjunct must not expand")
    }
  }

  test("left outer join distributes only when the union is the preserved side") {
    withRules(PushJoinBelowUnionAllRule.ConfKey -> "true") { s =>
      val c = Tables.t(s, sf, "customer")
      val u = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .unionAll(c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey")))
      val ord = Tables.t(s, sf, "orders").select(col("o_custkey"), col("o_orderkey"))

      // union preserved (left of LEFT OUTER): distributes
      val keep = u.join(ord, u("c_custkey") === ord("o_custkey"), "left")
      assert(joinsInPlan(keep.queryExecution.optimizedPlan).size == 2,
        "left-outer with union on the preserved side must distribute")

      // union on the null-producing side: must NOT distribute (would pad
      // one null row per branch instead of one per unmatched left row)
      val pad = ord.join(u, ord("o_custkey") === u("c_custkey"), "left")
      assert(joinsInPlan(pad.queryExecution.optimizedPlan).size == 1,
        "left-outer with union on the null side must not distribute")

      // and the non-distributed side stays value-correct
      val rows = pad.groupBy().agg(count(lit(1)).as("n"),
        count(u("c_custkey")).as("matched")).collect()(0)
      assert(rows.getLong(0) >= rows.getLong(1))
    }
  }

  // ---- RangeBinJoinRule ------------------------------------------------

  /** Band join with derived (non-literal) bounds: parts against their
    * brand's average-price band. No equi key -> stock Spark nested-loops. */
  private def bandShape(s: org.apache.spark.sql.SparkSession): DataFrame = {
    val p = Tables.t(s, sf, "part")
    val bands = p.groupBy(col("p_brand"))
      .agg(Tables.davg(col("p_retailprice")).as("mid"))
      .select(col("p_brand"), (col("mid") - 25.0).as("lo"),
        (col("mid") + 25.0).as("hi"))
    p.select(col("p_partkey"), col("p_retailprice"))
      .join(bands, col("p_retailprice") >= col("lo") &&
        col("p_retailprice") < col("hi"))
  }

  private def withRangeRule[A](w: String)(
      f: org.apache.spark.sql.SparkSession => A): A = {
    val s = SparkTestSession.spark.newSession()
    graft.plans.RangeBinJoinRule.install(s)
    s.conf.set(graft.plans.RangeBinJoinRule.ConfKey, w)
    f(s)
  }

  test("range-bin join turns the inequality nested loop into an equi join") {
    withRangeRule("25.0") { s =>
      val physical = bandShape(s).queryExecution.executedPlan.toString
      // the bulk lane is an equi join on the manufactured bin key
      assert(physical.contains("graft_bin"), physical)
      assert(physical.contains("SortMergeJoin") ||
        physical.contains("ShuffledHashJoin") ||
        physical.contains("BroadcastHashJoin"), physical)
      // double bounds -> a non-finite fallback lane exists, and any
      // nested loop in it broadcasts the filtered remainder, never the
      // point side (NO_BROADCAST_HASH on the point side)
      assert(physical.contains("isnan"), physical)
    }
    val off = SparkTestSession.spark.newSession()
    assert(bandShape(off).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "without the rule the band join must nested-loop (test premise)")
  }

  test("range-bin join: non-finite float bounds/points keep exact semantics") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def shape(s: org.apache.spark.sql.SparkSession): DataFrame = {
      val pts = s.createDataFrame(
        java.util.Arrays.asList(
          Row(1, 10.0), Row(2, 250.0), Row(3, Double.NaN),
          Row(4, Double.PositiveInfinity), Row(5, Double.NegativeInfinity),
          Row(6, null)),
        StructType(Seq(StructField("id", IntegerType, false),
          StructField("x", DoubleType, true))))
      val bands = s.createDataFrame(
        java.util.Arrays.asList(
          Row("finite", 0.0, 100.0),
          Row("open_hi", 200.0, Double.PositiveInfinity), // pre-fix: Sequence blow-up
          Row("open_lo", Double.NegativeInfinity, 50.0),
          Row("nan_hi", 0.0, Double.NaN), // NaN matches NaN point under Spark ordering
          Row("null_hi", 0.0, null)),
        StructType(Seq(StructField("b", StringType, false),
          StructField("lo", DoubleType, true),
          StructField("hi", DoubleType, true))))
      pts.join(bands, col("x") >= col("lo") && col("x") <= col("hi"))
    }
    val expected = sortedRows(shape(SparkTestSession.spark.newSession()))
    assert(expected.nonEmpty)
    // NaN point must land in the NaN-bounded band (Spark: NaN <= NaN)
    assert(expected.exists(r => r.toString.contains("nan_hi")))
    assert(expected.exists(r => r.toString.contains("open_hi")))
    for (w <- Seq("5.0", "50.0")) {
      val got = withRangeRule(w)(s => sortedRows(shape(s)))
      assert(got == expected, s"width $w changed results on non-finite data")
    }
  }

  test("range-bin join: malformed binSize conf disables the rule, not planning") {
    withRangeRule("not-a-number") { s =>
      // must neither throw in the optimizer nor change results
      assert(bandShape(s).count() > 0)
    }
  }

  test("range-bin join preserves results exactly") {
    val expected = sortedRows(bandShape(SparkTestSession.spark.newSession()))
    for (w <- Seq("5.0", "25.0", "500.0")) { // any width is semantics-safe
      val got = withRangeRule(w)(s => sortedRows(bandShape(s)))
      assert(got == expected, s"width $w changed results")
    }
    assert(expected.nonEmpty)
  }

  test("range-bin join guards: equi-keyed and outer joins do not fire") {
    withRangeRule("25.0") { s =>
      val p = Tables.t(s, sf, "part")
      val bands = p.groupBy(col("p_brand"))
        .agg(Tables.davg(col("p_retailprice")).as("mid"))
      // cross-side equality present: binning would be pure overhead
      val equi = p.join(bands,
        p("p_brand") === bands("p_brand") &&
          p("p_retailprice") >= bands("mid"))
      assert(joinsInPlan(equi.queryExecution.optimizedPlan)
        .forall(_.condition.forall(!_.toString.contains("graft_bin"))),
        "equi-keyed join must not be binned")
      // no conf -> off
      val s2 = SparkTestSession.spark.newSession()
      graft.plans.RangeBinJoinRule.install(s2)
      assert(bandShape(s2).queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }
}
