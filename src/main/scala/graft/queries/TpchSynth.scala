package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** The eight TPC-H shapes the reduced fixture schema blocked —
  * Q2/Q9/Q11/Q16/Q20 (need `partsupp`) and Q4/Q12/Q21 (need
  * `l_commitdate`/`l_receiptdate`/`l_shipmode`) — unlocked by a
  * synthesized lane: the missing table and columns are derived
  * DETERMINISTICALLY from the existing parquet with identical integer
  * arithmetic in both engines, so the DuckDB oracle stays an exact
  * hash-match gate.
  *
  * The reference's canonical workload runs all 22 query shapes
  * (`/root/reference/src/test/regress/sql/tpch500GB.sql:14-22`); these
  * eight carry its hardest planner patterns — Q2's correlated min,
  * Q21's EXISTS/NOT-EXISTS double correlation, Q20's nested correlated
  * aggregate, Q11's global-total HAVING — which is exactly the class
  * ORCA's xform library exists for (`gporca/libgpopt/xforms/`).
  *
  * Synthesis rules (documented deviations from dbgen):
  *  - `partsupp` = DISTINCT (l_partkey, l_suppkey) of lineitem. dbgen
  *    emits part x 4 suppliers and draws lineitem's supplier from those
  *    four; the fixture drew l_suppkey independently, so deriving from
  *    lineitem is the only rule that preserves dbgen's referential
  *    guarantee (every lineitem pair exists in partsupp) — without it
  *    Q9's partsupp join would be near-empty. availqty/supplycost are
  *    hash-free modular arithmetic over the two keys: exact in 64-bit
  *    integers in both engines, supplycost lands on an exact 2-decimal
  *    grid so the micros discipline (Tables.scala) applies unchanged.
  *  - `l_commitdate`/`l_receiptdate` = date(l_shipdate) + key-derived
  *    day offsets (commit in [-30,+30], receipt in [1,30] — giving the
  *    ~74% commit<receipt / ~49% ship<commit selectivity the date-pair
  *    queries need); `l_shipmode` = 4-way case over the line keys.
  *  - Missing text columns substitute: Q2 drops p_mfgr/s_address for
  *    p_brand/p_type; Q16's "Customer Complaints" supplier exclusion
  *    becomes s_acctbal < 0 (same NOT-IN anti-join shape); Q20 uses
  *    50x (not 0.5x) the shipped quantity as the availability bar so
  *    the correlated threshold actually selects.
  *
  * Scale notes: the synthesis itself is one narrow two-int-column
  * DISTINCT (partsupp) and pure map-side arithmetic (dates) — at 100 TB
  * a real deployment reads a materialized partsupp instead and every
  * plan below is unchanged. Join strategy per query is annotated inline;
  * dimension sides are broadcast, fact-fact joins shuffle on their keys.
  */
object TpchSynth extends QueryModule {

  /** Synthesized partsupp — see object scaladoc for the derivation. */
  private def partsupp(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        ((col("ps_partkey") * 37 + col("ps_suppkey") * 11) % 9999 + 1)
          .cast("int"))
      .withColumn("ps_supplycost",
        ((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 99900 + 100)
          .cast("double") / 100.0)

  /** lineitem + synthesized commit/receipt dates and shipmode. */
  private def lineitemX(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("l_commitdate",
        date_add(to_date(col("l_shipdate")),
          ((col("l_orderkey") * 7 + col("l_linenumber") * 3) % 61 - 30)
            .cast("int")))
      .withColumn("l_receiptdate",
        date_add(to_date(col("l_shipdate")),
          ((col("l_orderkey") * 5 + col("l_linenumber")) % 30 + 1)
            .cast("int")))
      .withColumn("l_shipmode",
        element_at(
          array(lit("MAIL"), lit("SHIP"), lit("RAIL"), lit("TRUCK")),
          ((col("l_orderkey") * 3 + col("l_linenumber")) % 4).cast("int") + 1))

  /** Oracle CTE mirrors of the two synth rules (same arithmetic). */
  private val psSql =
    """partsupp AS (
      |  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    (l_partkey * 37 + l_suppkey * 11) % 9999 + 1 AS ps_availqty,
      |    CAST((l_partkey * 31 + l_suppkey * 17) % 99900 + 100 AS DOUBLE)
      |      / 100.0 AS ps_supplycost
      |  FROM lineitem)""".stripMargin

  private val lxSql =
    """lineitem_x AS (
      |  SELECT l.*,
      |    CAST(l_shipdate AS DATE)
      |      + CAST((l_orderkey * 7 + l_linenumber * 3) % 61 - 30 AS INTEGER)
      |      AS l_commitdate,
      |    CAST(l_shipdate AS DATE)
      |      + CAST((l_orderkey * 5 + l_linenumber) % 30 + 1 AS INTEGER)
      |      AS l_receiptdate,
      |    CASE (l_orderkey * 3 + l_linenumber) % 4
      |      WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'RAIL'
      |      ELSE 'TRUCK' END AS l_shipmode
      |  FROM lineitem l)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q2 minimum-cost supplier. Reference plan: correlated min subquery
    // that ORCA decorrelates (CXformGbAgg...); here the decorrelation is
    // explicit and cheaper — one window-min over ps_partkey replaces the
    // self-join, and every dimension (region->nation->supplier, filtered
    // part) broadcasts, so the only shuffle is the window's partkey
    // exchange.
    "q2_min_cost_supp" -> ((s, dir) => {
      val euroNation = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val euroSupp = t(s, dir, "supplier")
        .join(broadcast(euroNation),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
          col("n_name"))
      val targetParts = t(s, dir, "part")
        .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE")
        .select(col("p_partkey"), col("p_brand"), col("p_type"))
      // per-partkey min is invariant under the part filter, so filtering
      // first is the same answer with far less window input
      val ps = partsupp(s, dir)
        .join(broadcast(euroSupp), col("ps_suppkey") === col("s_suppkey"))
        .join(broadcast(targetParts), col("ps_partkey") === col("p_partkey"))
      val w = Window.partitionBy(col("ps_partkey"))
      ps.withColumn("min_cost", min(col("ps_supplycost")).over(w))
        .filter(col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_brand"), col("p_type"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q4 order-priority checking: EXISTS -> left-semi on the order key;
    // the one shuffle is the semi join (both sides keyed on orderkey).
    "q4_order_priority" -> ((s, dir) => {
      val late = lineitemX(s, dir)
        .filter(col("l_commitdate") < col("l_receiptdate"))
        .select(col("l_orderkey"))
      t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q9 product-type profit. partsupp x lineitem is the one fact-fact
    // join (shuffle on the compound key); part filter and the
    // supplier/nation snowflake broadcast. Profit uses the micros
    // discipline: supplycost is on a 2-decimal grid, so rev - cost*qty
    // has <= 6 true decimals.
    "q9_product_profit" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("%red%")).select(col("p_partkey"))
      val amountMicros = round(
        (col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("ps_supplycost") * col("l_quantity")) * 1000000.0, 0)
        .cast("long")
      t(s, dir, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .join(partsupp(s, dir),
          col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        // lsum128: a (nation, year) profit group is ~1/175 of the global
        // revenue-scale sum — ~5x headroom at sf1000, negative at the
        // 100 TB design point (r17 overflow sweep)
        .agg((lsum128(amountMicros).cast("double") / 1000000.0)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11 important stock: nation-scoped partsupp value per part vs a
    // global-total threshold. The total is a one-row agg broadcast back
    // (the reference plans the same shape as a Motion-gathered scalar).
    "q11_important_stock" -> ((s, dir) => {
      val n7supp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val scoped = partsupp(s, dir)
        .join(broadcast(n7supp), col("ps_suppkey") === col("s_suppkey"))
        .select(col("ps_partkey"),
          // per-row micros fit a long (~1e13 max), but the SUMS must be
          // staged wider: at the x10000 gate (~sf100) the global total
          // passes 9.2e18 and an ANSI long sum overflows — DuckDB never
          // sees this because its SUM(BIGINT) auto-promotes to HUGEINT.
          // The r16 fix staged the accumulator in decimal(38,0); the r17
          // sweep moved the class to the shared limb helper (lsum128 —
          // same 128-bit safety, per-row work stays in long codegen)
          round(col("ps_supplycost") * col("ps_availqty") * 1000000.0, 0)
            .cast("long").as("v"))
      val total = scoped.agg(lsum128(col("v")).as("tv"))
      scoped.groupBy(col("ps_partkey")).agg(lsum128(col("v")).as("sv"))
        .crossJoin(broadcast(total))
        .filter(col("sv").cast("double") > col("tv").cast("double") * 0.001)
        .select(col("ps_partkey"),
          (col("sv").cast("double") / 1000000.0).as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    }),

    // Q12 shipmode vs priority: selective filters stay on the lineitem
    // side of the orderkey shuffle join; counts are conditional COUNTs
    // (long in both engines).
    "q12_shipmode_priority" -> ((s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lineitemX(s, dir)
        .filter(col("l_shipmode").isin("MAIL", "SHIP") &&
          col("l_commitdate") < col("l_receiptdate") &&
          to_date(col("l_shipdate")) < col("l_commitdate") &&
          col("l_receiptdate") >= lit("1996-01-01").cast("date") &&
          col("l_receiptdate") < lit("1997-01-01").cast("date"))
        .join(t(s, dir, "orders"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_shipmode"))
        .agg(count(when(hi, 1)).as("high_line_count"),
          count(when(!hi, 1)).as("low_line_count"))
        .orderBy(col("l_shipmode"))
    }),

    // Q16 parts/supplier relationship: NOT IN -> left-anti (suppkey is
    // never null so the null-aware variant degenerates to plain anti);
    // count(DISTINCT ps_suppkey) per (brand,type,size).
    "q16_supplier_cnt" -> ((s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#15" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      val bad = t(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      partsupp(s, dir)
        .join(broadcast(parts), col("ps_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(100)
    }),

    // Q20 potential part promotion: the correlated quantity-threshold
    // subquery becomes a grouped shipped-qty fact joined back to
    // partsupp on the compound key; suppliers then semi-filter. Integer
    // quantities keep the 50x threshold compare exact in both engines.
    "q20_promotion_supp" -> ((s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").like("red%")).select(col("p_partkey"))
      val qty = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val goodSupp = partsupp(s, dir)
        .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"))
        .join(qty, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") > lit(50) * col("qty"))
        .select(col("ps_suppkey")).distinct()
      t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .join(goodSupp, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_name"))
    }),

    // Q21 suppliers who kept orders waiting — the reference's hardest
    // correlation (EXISTS + NOT EXISTS over the same fact). Both
    // correlations reduce to per-order distinct-supplier counts:
    //   EXISTS l2 (other supplier on the order)      <=> nsupp >= 2
    //   NOT EXISTS l3 (other LATE supplier)          <=> nlate == 1
    // (l1 itself is late, so "only one late supplier" == "only l1").
    // Three orderkey-keyed semi joins, supplier/nation broadcast.
    "q21_suppliers_waiting" -> ((s, dir) => {
      val late = lineitemX(s, dir)
        .filter(col("l_receiptdate") > col("l_commitdate"))
      val multiSupp = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"))
        .filter(col("nsupp") >= 2).select(col("l_orderkey").as("ok2"))
      val soleLate = late.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("nlate"))
        .filter(col("nlate") === 1).select(col("l_orderkey").as("ok3"))
      val fOrders = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val n1supp = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
          .filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      late.join(broadcast(n1supp), col("l_suppkey") === col("s_suppkey"))
        .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(multiSupp, col("l_orderkey") === col("ok2"), "left_semi")
        .join(soleLate, col("l_orderkey") === col("ok3"), "left_semi")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    })
  )

  val oracle: Map[String, String] = Map(
    "q2_min_cost_supp" ->
      s"""WITH $psSql
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, p_type
         |FROM part, partsupp, supplier, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_supplycost = (
         |    SELECT min(ps2.ps_supplycost)
         |    FROM partsupp ps2, supplier s2, nation n2, region r2
         |    WHERE p_partkey = ps2.ps_partkey
         |      AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey
         |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    "q4_order_priority" ->
      s"""WITH $lxSql
         |SELECT o_orderpriority, count(*) AS order_count
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |  AND EXISTS (SELECT 1 FROM lineitem_x
         |    WHERE l_orderkey = o_orderkey
         |      AND l_commitdate < l_receiptdate)
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q9_product_profit" ->
      s"""WITH $psSql
         |SELECT n_name AS nation,
         |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         |  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)
         |      - ps_supplycost * l_quantity) * 1000000.0, 0) AS BIGINT))
         |    AS DOUBLE) / 1000000.0 AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY n_name, o_year
         |ORDER BY nation, o_year DESC""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $psSql,
         |scoped AS (
         |  SELECT ps_partkey,
         |    CAST(round(ps_supplycost * ps_availqty * 1000000.0, 0)
         |      AS BIGINT) AS v
         |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7')
         |SELECT ps_partkey, CAST(SUM(v) AS DOUBLE) / 1000000.0 AS value
         |FROM scoped GROUP BY ps_partkey
         |HAVING CAST(SUM(v) AS DOUBLE)
         |  > (SELECT CAST(SUM(v) AS DOUBLE) * 0.001 FROM scoped)
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q12_shipmode_priority" ->
      s"""WITH $lxSql
         |SELECT l_shipmode,
         |  COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 END) AS high_line_count,
         |  COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
         |    THEN 1 END) AS low_line_count
         |FROM orders JOIN lineitem_x ON o_orderkey = l_orderkey
         |WHERE l_shipmode IN ('MAIL', 'SHIP')
         |  AND l_commitdate < l_receiptdate
         |  AND CAST(l_shipdate AS DATE) < l_commitdate
         |  AND l_receiptdate >= DATE '1996-01-01'
         |  AND l_receiptdate < DATE '1997-01-01'
         |GROUP BY l_shipmode ORDER BY l_shipmode""".stripMargin,

    "q16_supplier_cnt" ->
      s"""WITH $psSql
         |SELECT p_brand, p_type, p_size,
         |  count(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
         |  AND ps_suppkey NOT IN
         |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
         |LIMIT 100""".stripMargin,

    "q20_promotion_supp" ->
      s"""WITH $psSql
         |SELECT s_suppkey, s_name
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name = 'NATION_3'
         |  AND s_suppkey IN (
         |    SELECT ps_suppkey FROM partsupp
         |    WHERE ps_partkey IN
         |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
         |      AND ps_availqty > 50 * (
         |        SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
         |        FROM lineitem
         |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |          AND l_shipdate >= TIMESTAMP '1996-01-01'
         |          AND l_shipdate < TIMESTAMP '1997-01-01'))
         |ORDER BY s_name""".stripMargin,

    "q21_suppliers_waiting" ->
      s"""WITH $lxSql
         |SELECT s_name, count(*) AS numwait
         |FROM supplier
         |JOIN lineitem_x l1 ON s_suppkey = l1.l_suppkey
         |JOIN orders ON o_orderkey = l1.l_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE o_orderstatus = 'F'
         |  AND l1.l_receiptdate > l1.l_commitdate
         |  AND EXISTS (SELECT 1 FROM lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (SELECT 1 FROM lineitem_x l3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND l3.l_receiptdate > l3.l_commitdate)
         |  AND n_name = 'NATION_1'
         |GROUP BY s_name
         |ORDER BY numwait DESC, s_name
         |LIMIT 100""".stripMargin
  )
}
