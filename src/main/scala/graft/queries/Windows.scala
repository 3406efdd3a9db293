package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window-function family.
  *
  * Reference executor: WindowAgg (`/root/reference/src/backend/executor/nodeWindowAgg.c:2394`)
  * with ROWS/RANGE/GROUPS frames + EXCLUDE clauses
  * (`src/include/nodes/parsenodes.h:553-578` FRAMEOPTION_*), ranking fns
  * (`src/backend/utils/adt/windowfuncs.c:82-449`), and the time-series
  * `interpolate` family (`src/backend/utils/adt/interpolate.c:36`).
  *
  * Spark covers ROWS/RANGE natively; GROUPS frames and EXCLUDE clauses do
  * not exist in Spark, so they are *emulated* here (dense_rank keyed
  * aggregation join for GROUPS; frame-sum minus current row for EXCLUDE) —
  * the SURVEY §7 "hard parts".
  */
object Windows extends QueryModule {

  /** Parameterized GROUPS-frame emulation (Spark has no GROUPS mode;
    * reference `nodeWindowAgg.c:1406-1646` does): sum of `o_totalprice`
    * day-groups within `GROUPS nPrec PRECEDING AND nFoll FOLLOWING` of the
    * current row's peer group. Peer groups aggregate FIRST (one shuffle),
    * dense_rank indexes them, and a rank-band join assembles frames —
    * cost is O(groups x band width), independent of rows per group. */
  private def groupsFrameSum(orders: DataFrame, nPrec: Int, nFoll: Int): DataFrame = {
    val grp = orders
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
              col("o_totalprice"))
      .groupBy(col("o_custkey"), col("d"))
      .agg(sum(col("o_totalprice").cast(Dec)).as("day_total"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
    val ranked = grp.withColumn("dr", dense_rank().over(w))
    val a = ranked.select(col("o_custkey"), col("d"), col("dr"))
    val b = ranked.select(col("o_custkey").as("ck2"), col("dr").as("dr2"),
                          col("day_total"))
    a.join(b, col("o_custkey") === col("ck2") &&
              col("dr2") >= col("dr") - nPrec && col("dr2") <= col("dr") + nFoll)
      .groupBy(col("o_custkey"), col("d"))
      .agg(sum(col("day_total")).cast("double").as("groups_sum"))
      .orderBy(col("o_custkey"), col("d"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ranking family over a deterministic order (ties broken by custkey).
    // The remaining ranking trio — ntile / percent_rank / cume_dist
    // (windowfuncs.c): bucket assignment and the two rational ranks over
    // a TOTAL order (o_orderkey breaks price ties), percent_rank and
    // cume_dist rounded after the same k/n divisions both engines run.
    "q_window_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_orderkey") <= 1000)
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .filter(col("rn") <= 5)
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // Running aggregates (ROWS UNBOUNDED PRECEDING), decimal-stabilized so
    // the prefix sums match the oracle exactly.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          sum(col("o_totalprice").cast(Dec)).over(w).cast("double").as("running_total"),
          count(lit(1)).over(w).as("running_n"),
          max(col("o_totalprice")).over(w).as("running_max"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    }),

    // Sliding ROWS frame (moving window) + RANGE frame on a numeric key.
    "q_window_frames" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val mov = byDate.rowsBetween(-2, 0)
      val fut = byDate.rowsBetween(0, Window.unboundedFollowing)
      // double-valued RANGE offsets have no Scala-API overload; the SQL
      // frame syntax covers them (same executor path).
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice").cast(Dec)).over(mov).cast("double") /
                count(lit(1)).over(mov), 4).as("moving_avg3"),
          min(col("o_totalprice")).over(fut).as("min_from_here"),
          expr("""count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                  RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)""")
            .as("n_within_10k"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // lag/lead with offsets & defaults, first/last/nth over full frame.
    "q_window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lag(col("o_totalprice"), 2, -1.0).over(w).as("prev2_price"),
          lead(col("o_totalprice"), 1, 0.0).over(w).as("next_price"),
          first(col("o_orderkey")).over(full).as("first_order"),
          last(col("o_orderkey")).over(full).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Any aggregate as a window function over the whole partition.
    "q_window_partition_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          count(lit(1)).over(Window.partitionBy(col("l_orderkey"))).as("n_lines"),
          sum(col("l_quantity").cast(Dec))
            .over(Window.partitionBy(col("l_orderkey"))).cast("double").as("order_qty"),
          round(col("l_quantity") /
            sum(col("l_quantity").cast(Dec))
              .over(Window.partitionBy(col("l_orderkey"))).cast("double"), 6)
            .as("qty_share"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Top-k per group (DISTINCT ON's big brother; reference gets this via
    // WindowAgg + filter).
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rn"))
    }),

    // Same result through the custom TopKPerGroup physical operator
    // (bounded per-group heaps + map-side partial stage; see
    // graft.plans.TopKPerGroup) instead of window sort+filter.
    "q_topk_per_group_native" -> ((s, dir) => {
      graft.plans.TopKPerGroup(
          t(s, dir, "customer")
            .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal")),
          groupCols = Seq("c_nationkey"),
          order = Seq(("c_acctbal", true), ("c_custkey", false)),
          k = 3)
        .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
    }),

    // DISTINCT ON (c_nationkey) ... ORDER BY c_acctbal DESC — PostgreSQL's
    // DISTINCT ON via row_number = 1.
    "q_distinct_on" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_nationkey"), col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_nationkey"))
    }),

    // GROUPS frame emulation (Spark lacks GROUPS; reference nodeWindowAgg
    // supports it): sum over peer-groups within 1 dense_rank of current.
    // Emulated by aggregating per peer group and joining groups at rank
    // distance <= 1. DuckDB 1.0 lacks GROUPS too, so the oracle emulates
    // identically at the SQL level.
    "q_window_groups_frame" -> ((s, dir) => {
      val li = t(s, dir, "orders").filter(col("o_custkey") <= 30)
        .select(col("o_custkey"),
                col("o_orderdate").cast("date").as("d"), col("o_totalprice"))
      val grp = li.groupBy(col("o_custkey"), col("d"))
        .agg(sum(col("o_totalprice").cast(Dec)).as("day_total"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      val ranked = grp.withColumn("dr", dense_rank().over(w))
      val a = ranked.select(col("o_custkey"), col("d"), col("dr"))
      val b = ranked.select(col("o_custkey").as("ck2"), col("dr").as("dr2"),
                            col("day_total"))
      a.join(b, col("o_custkey") === col("ck2") &&
               abs(col("dr") - col("dr2")) <= 1)
        .groupBy(col("o_custkey"), col("d"))
        .agg(sum(col("day_total")).cast("double").as("groups_sum"))
        .orderBy(col("o_custkey"), col("d"))
    }),

    // RANGE frame with a calendar-interval offset (nodeWindowAgg.c RANGE
    // with offset on a timestamp ordering): trailing-7-day running totals.
    // Only the SQL frame syntax can express interval offsets; DuckDB runs
    // the same RANGE INTERVAL clause natively.
    "q_window_range_interval" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_custkey") <= 50)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"),
          expr("""CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
                 |  PARTITION BY o_custkey ORDER BY o_orderdate
                 |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
                 |AS DOUBLE)""".stripMargin).as("total_7d"),
          expr("""COUNT(*) OVER (
                 |  PARTITION BY o_custkey ORDER BY o_orderdate
                 |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)"""
            .stripMargin).as("n_7d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Generalized GROUPS frame (nodeWindowAgg.c:1406): GROUPS 2 PRECEDING
    // AND 1 FOLLOWING via the parameterized band-join builder — peer
    // groups pre-aggregate once, dense_rank keys the band join, so frame
    // evaluation is an equi-join on the partition key plus a rank-range
    // predicate (no per-row window re-scan).
    "q_window_groups_frame_n" -> ((s, dir) =>
      groupsFrameSum(t(s, dir, "orders").filter(col("o_custkey") <= 30),
        nPrec = 2, nFoll = 1)),

    // EXCLUDE GROUP emulation over a full-partition frame: total minus the
    // current row's whole peer group; empty frame (partition == one peer
    // group) yields NULL. DuckDB runs the REAL `EXCLUDE GROUP` clause — a
    // true semantics check of the emulation.
    "q_window_exclude_group" -> ((s, dir) => {
      val part = Window.partitionBy(col("c_nationkey"))
      val peers = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_mktsegment"),
          when(count(lit(1)).over(part) > count(lit(1)).over(peers),
            (sum(col("c_acctbal").cast(Dec)).over(part) -
             sum(col("c_acctbal").cast(Dec)).over(peers)).cast("double"))
            .as("others_sum"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    // EXCLUDE TIES: drop the peers but KEEP the current row
    // (frame - peer_group + current); never an empty frame.
    "q_window_exclude_ties" -> ((s, dir) => {
      val part = Window.partitionBy(col("c_nationkey"))
      val peers = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_mktsegment"),
          (sum(col("c_acctbal").cast(Dec)).over(part) -
           sum(col("c_acctbal").cast(Dec)).over(peers) +
           col("c_acctbal").cast(Dec)).cast("double").as("no_ties_sum"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    // EXCLUDE CURRENT ROW emulation: full-partition sum minus this row.
    // DuckDB supports EXCLUDE natively, so the oracle uses the real clause
    // — a true semantics check of the emulation.
    "q_window_exclude_current" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
      // single-row partitions: EXCLUDE CURRENT ROW leaves an empty frame
      // whose SUM is NULL — mirror that.
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          when(count(lit(1)).over(w) > 1,
            (sum(col("c_acctbal").cast(Dec)).over(w) -
             col("c_acctbal").cast(Dec)).cast("double")).as("others_total"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    // Gap fill: forward-fill (last non-null) — interpolate.c's locf shape.
    // IGNORE NULLS navigation functions (windowfuncs.c lead/lag/
    // first_value/nth_value with the SQL:2011 null-treatment clause —
    // the reference parses IGNORE NULLS via gram.y opt_null_treatment):
    // sparse purchase values navigated per user with nulls skipped, vs
    // DuckDB's NATIVE `IGNORE NULLS` forms. Values carried as integer
    // micros so the compare is exact.
    "q_window_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("user_id") <= 30)
        .withColumn("v_u", when(col("event_type") === "purchase",
          round(col("value") * 1000000.0, 0).cast("long")))
        .select(col("user_id"), col("event_id"),
          lag(col("v_u"), 1, null, ignoreNulls = true).over(w).as("prev_purchase"),
          lead(col("v_u"), 1, null, ignoreNulls = true).over(w).as("next_purchase"),
          first(col("v_u"), ignoreNulls = true).over(wRun).as("first_so_far"),
          nth_value(col("v_u"), 2, ignoreNulls = true).over(wFull)
            .as("second_purchase"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    "q_window_fill_forward" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .filter(col("user_id") <= 20)
        .select(col("user_id"), col("event_id"),
          last(when(col("event_type") === "purchase", col("value")), ignoreNulls = true)
            .over(w).as("last_purchase_value"))
        .orderBy(col("user_id"), col("event_id"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_window_ntile" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 6) AS cdist
        |FROM orders WHERE o_orderkey <= 1000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_window_rank" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile,
        |    ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |    ROUND(cume_dist() OVER w, 6) AS cdist
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS DOUBLE) AS running_total,
        |  COUNT(*) OVER w AS running_n,
        |  MAX(o_totalprice) OVER w AS running_max
        |FROM orders WHERE o_custkey <= 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER mov AS DOUBLE)
        |        / (COUNT(*) OVER mov), 4) AS moving_avg3,
        |  MIN(o_totalprice) OVER fut AS min_from_here,
        |  COUNT(*) OVER rng AS n_within_10k
        |FROM orders WHERE o_custkey <= 100
        |WINDOW
        |  mov AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |  fut AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
        |  rng AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |          RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lag(o_totalprice, 2, -1.0) OVER w AS prev2_price,
        |  lead(o_totalprice, 1, 0.0) OVER w AS next_price,
        |  first_value(o_orderkey) OVER f AS first_order,
        |  last_value(o_orderkey) OVER f AS last_order,
        |  nth_value(o_orderkey, 2) OVER f AS second_order
        |FROM orders WHERE o_custkey <= 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_partition_agg" ->
      """SELECT l_orderkey, l_linenumber,
        |  COUNT(*) OVER p AS n_lines,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER p AS DOUBLE) AS order_qty,
        |  ROUND(l_quantity / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER p AS DOUBLE), 6) AS qty_share
        |FROM lineitem WHERE l_orderkey <= 1000
        |WINDOW p AS (PARTITION BY l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_topk_per_group" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,

    "q_topk_per_group_native" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin,

    "q_distinct_on" ->
      """SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
        |  SELECT *, row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,

    "q_window_groups_frame" ->
      """WITH grp AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS day_total
        |  FROM orders WHERE o_custkey <= 30 GROUP BY o_custkey, o_orderdate),
        |ranked AS (
        |  SELECT *, dense_rank() OVER (PARTITION BY o_custkey ORDER BY d) AS dr
        |  FROM grp)
        |SELECT a.o_custkey, a.d,
        |  CAST(SUM(b.day_total) AS DOUBLE) AS groups_sum
        |FROM ranked a JOIN ranked b
        |  ON a.o_custkey = b.o_custkey AND abs(a.dr - b.dr) <= 1
        |GROUP BY a.o_custkey, a.d ORDER BY a.o_custkey, a.d""".stripMargin,

    "q_window_range_interval" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |  AS DOUBLE) AS total_7d,
        |  COUNT(*) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS n_7d
        |FROM orders WHERE o_custkey <= 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_groups_frame_n" ->
      """WITH grp AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS day_total
        |  FROM orders WHERE o_custkey <= 30 GROUP BY o_custkey, o_orderdate),
        |ranked AS (
        |  SELECT *, dense_rank() OVER (PARTITION BY o_custkey ORDER BY d) AS dr
        |  FROM grp)
        |SELECT a.o_custkey, a.d,
        |  CAST(SUM(b.day_total) AS DOUBLE) AS groups_sum
        |FROM ranked a JOIN ranked b
        |  ON a.o_custkey = b.o_custkey
        | AND b.dr >= a.dr - 2 AND b.dr <= a.dr + 1
        |GROUP BY a.o_custkey, a.d ORDER BY a.o_custkey, a.d""".stripMargin,

    "q_window_exclude_group" ->
      """SELECT c_nationkey, c_custkey, c_mktsegment,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY c_nationkey ORDER BY c_mktsegment
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS DOUBLE) AS others_sum
        |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q_window_exclude_ties" ->
      """SELECT c_nationkey, c_custkey, c_mktsegment,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY c_nationkey ORDER BY c_mktsegment
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE TIES) AS DOUBLE) AS no_ties_sum
        |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q_window_exclude_current" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) OVER (
        |    PARTITION BY c_nationkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE CURRENT ROW) AS DOUBLE) AS others_total
        |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q_window_fill_forward" ->
      """SELECT user_id, event_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
        |FROM events WHERE user_id <= 20
        |ORDER BY user_id, event_id""".stripMargin,

    "q_window_ignore_nulls" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 1000000.0, 0) AS BIGINT) END AS v_u
        |  FROM events WHERE user_id <= 30)
        |SELECT user_id, event_id,
        |  lag(v_u IGNORE NULLS) OVER w AS prev_purchase,
        |  lead(v_u IGNORE NULLS) OVER w AS next_purchase,
        |  first_value(v_u IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_so_far,
        |  nth_value(v_u, 2 IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS second_purchase
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin
  )
}
