package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.plans.{EagerAggRule, OrExpansionRule, PushJoinBelowUnionAllRule, RangeBinJoinRule}

/** Optimizer-xform demonstrations: the three ORCA exploration transforms
  * the engine re-expresses as Catalyst rules (SURVEY §7.3 "optional /
  * perf-only" items):
  *
  *   - eager aggregation below a join
  *     (`/root/reference/src/backend/gporca/libgpopt/src/xforms/CXformEagerAgg.cpp`)
  *   - join distribution over UNION ALL
  *     (`.../CXformPushJoinBelowUnionAll.cpp`)
  *   - OR-expansion of a disjunctive join into a union of hash joins
  *     (the CXformExpandNAryJoin family's union-all rewrite niche)
  *
  * Each query runs in a CHILD session (`newSession()`: same SparkContext,
  * isolated SQLConf + experimental methods) so enabling the opt-in rule
  * never leaks into sibling queries' plans. The oracle checks the rewrite
  * preserved semantics; `XformRulesSpec` asserts the plans actually
  * transformed.
  */
object Xforms extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregate over join -> partial aggregate pushed below the join.
    // Aggregation args all come from lineitem (the outer child); the
    // grouping column comes from orders; the lower aggregate groups
    // lineitem by l_orderkey (the join key), shrinking the join's probe
    // side ~4x before any shuffle. All aggregates are exact under
    // regrouping: timestamps (min/max), BIGINT sum/count, and an avg that
    // the rule decomposes into exact integer sum/count.
    "q_eager_agg" -> ((s0, dir) => {
      val s = s0.newSession()
      EagerAggRule.install(s)
      s.conf.set(EagerAggRule.ConfKey, "true")
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(ord("o_orderpriority"))
        .agg(
          min(li("l_shipdate")).as("min_ship"),
          max(li("l_shipdate")).as("max_ship"),
          sum(li("l_quantity").cast("long")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          avg(li("l_quantity").cast("long")).as("avg_raw"))
        .select(col("o_orderpriority"), col("min_ship"), col("max_ship"),
                col("sum_qty"), col("n_rows"),
                round(col("avg_raw"), 4).as("avg_qty"))
        .orderBy("o_orderpriority")
    }),

    // Disjunctive join -> UNION ALL of two hash joins (OR-expansion).
    // Without the rule Spark plans the OR condition as a
    // BroadcastNestedLoopJoin — every order against every customer; with
    // it each branch hash-joins on its own equality and the second
    // branch's NOT-coalesce dedup keeps both-true rows single. Business
    // shape: an order matches a customer by ownership OR by a referral
    // key; count matched orders per segment.
    "q_or_join" -> ((s0, dir) => {
      val s = s0.newSession()
      OrExpansionRule.install(s)
      s.conf.set(OrExpansionRule.ConfKey, "true")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      o.join(c, o("o_custkey") === c("c_custkey") ||
                pmod(o("o_orderkey"), lit(500)) + 1 === c("c_custkey"))
        .groupBy(c("c_mktsegment"))
        .agg(count(lit(1)).as("n_matches"),
             countDistinct(o("o_orderkey")).as("n_orders"))
        .orderBy(col("c_mktsegment"))
    }),

    // Join over UNION ALL -> per-branch joins under one UNION ALL. The
    // orders side broadcasts into each branch (one shared broadcast
    // exchange), so neither customer slice is shuffled.
    "q_join_below_union" -> ((s0, dir) => {
      val s = s0.newSession()
      PushJoinBelowUnionAllRule.install(s)
      s.conf.set(PushJoinBelowUnionAllRule.ConfKey, "true")
      val c = t(s, dir, "customer")
      val u = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), lit("b").as("src"))
        .unionAll(
          c.filter(col("c_mktsegment") === "MACHINERY")
            .select(col("c_custkey"), lit("m").as("src")))
      val ord = t(s, dir, "orders")
      u.join(ord, u("c_custkey") === ord("o_custkey"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("src")
    }),

    // Equality-free band join -> bin equi join (RangeBinJoinRule): parts
    // against their brand's DERIVED average-price band (non-literal
    // bounds, so nothing broadcasts a precomputed band list); without
    // the rule Spark nested-loops this, with it the manufactured
    // floor(x/w) key hash-joins and the preserved original predicate
    // discards false bin candidates. XformRulesSpec proves the plan
    // transform + any-width safety; this oracle proves semantics.
    "q_range_bin_join" -> ((s0, dir) => {
      val s = s0.newSession()
      RangeBinJoinRule.install(s)
      s.conf.set(RangeBinJoinRule.ConfKey, "25.0")
      val p = t(s, dir, "part")
      val bands = p.groupBy(col("p_brand"))
        .agg(davg(col("p_retailprice")).as("mid"))
        .select(col("p_brand"), (col("mid") - 25.0).as("lo"),
          (col("mid") + 25.0).as("hi"))
      p.select(col("p_partkey"), col("p_retailprice"))
        .join(bands, col("p_retailprice") >= col("lo") &&
          col("p_retailprice") < col("hi"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_in_band"),
             dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_eager_agg" ->
      """SELECT o_orderpriority,
        |       min(l_shipdate) AS min_ship,
        |       max(l_shipdate) AS max_ship,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       count(*) AS n_rows,
        |       round(avg(CAST(l_quantity AS BIGINT)), 4) AS avg_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_or_join" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_matches,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN customer
        |  ON o_custkey = c_custkey OR o_orderkey % 500 + 1 = c_custkey
        |WHERE o_orderkey <= 2000
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_below_union" ->
      s"""WITH u AS (
         |  SELECT c_custkey, 'b' AS src FROM customer
         |  WHERE c_mktsegment = 'BUILDING'
         |  UNION ALL
         |  SELECT c_custkey, 'm' AS src FROM customer
         |  WHERE c_mktsegment = 'MACHINERY')
         |SELECT src, count(*) AS n_orders,
         |       ${sqlDsum("o_totalprice")} AS sum_price
         |FROM u JOIN orders ON c_custkey = o_custkey
         |GROUP BY src
         |ORDER BY src""".stripMargin,

    "q_range_bin_join" ->
      s"""WITH bands AS (
         |  SELECT p_brand, ${sqlDavg("p_retailprice")} AS mid
         |  FROM part GROUP BY p_brand),
         |b2 AS (SELECT p_brand, mid - 25.0 AS lo, mid + 25.0 AS hi
         |  FROM bands)
         |SELECT b2.p_brand, COUNT(*) AS n_in_band,
         |  ${sqlDsum("p.p_retailprice")} AS sum_price
         |FROM part p JOIN b2
         |  ON p.p_retailprice >= b2.lo AND p.p_retailprice < b2.hi
         |GROUP BY b2.p_brand ORDER BY b2.p_brand""".stripMargin
  )
}
