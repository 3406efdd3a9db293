package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Join family: all three algorithms, every join type.
  *
  * Reference executor: HashJoin (`/root/reference/src/backend/executor/nodeHashjoin.c:182`),
  * MergeJoin (`nodeMergejoin.c:636`), NestLoop (`nodeNestloop.c:69`), with
  * semi/anti/null-aware-NOT-IN variants (`src/include/nodes/nodes.h` JoinType,
  * ORCA `CXformLeftAntiSemiJoinNotIn2HashJoinNotIn.cpp`) and MPP-aware side
  * placement (`src/backend/cdb/cdbpath.c` cdbpath_motion_for_join).
  *
  * Spark-first: we declare `df.join(...)` and let Catalyst/AQE pick
  * broadcast vs shuffled-hash vs sort-merge (the cdbpath analogue); explicit
  * `broadcast()` marks replicated-table dims, join hints pin the algorithm
  * where the reference's planner would.
  */
object Joins extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape: 3-way join, small side broadcast-able, agg + top-k.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .withColumn("o_orderdate", col("o_orderdate").cast("date"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way snowflake join. Join ORDER is the scale story
    // (cdbpath.c motion-for-join picks the restricted side first): the
    // region filter kills ~40% of nations, so nation⋈region(filtered) is
    // broadcast onto supplier and customer FIRST — the fact-side joins
    // then shuffle only region-pruned rows instead of the full tables.
    "q5_region_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_regionkey") <= 2)
      val nation = t(s, dir, "nation")
      val natReg = nation.join(broadcast(region),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      // supplier pruned to surviving nations, carrying n_name forward;
      // small enough to broadcast into the lineitem scan, which prunes
      // the fact table before its first shuffle.
      val supp = t(s, dir, "supplier")
        .join(broadcast(natReg), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = t(s, dir, "customer")
        .join(broadcast(natReg.select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      t(s, dir, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
                    col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
             count(lit(1)).as("n"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // LEFT OUTER: every order, with (possibly zero) count of big lineitems.
    "q_join_left_outer" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      ord.join(big, col("o_orderkey") === col("l_orderkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
             count(col("l_orderkey")).as("n_matched"),
             sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_unmatched"))
        .orderBy(col("o_orderstatus"))
    }),

    // RIGHT OUTER (mirror of left; reference swaps outer side in planner).
    "q_join_right_outer" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      val ord = t(s, dir, "orders")
      big.join(ord, col("o_orderkey") === col("l_orderkey"), "right")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
             count(col("l_orderkey")).as("n_matched"))
        .orderBy(col("o_orderstatus"))
    }),

    // FULL OUTER join of two aggregates with disjoint key coverage.
    "q_join_full_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("c_nationkey") === col("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // SEMI join (EXISTS): customers having at least one urgent order.
    "q_join_semi" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // ANTI join (NOT EXISTS): customers with no urgent order.
    "q_join_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    }),

    // refint referential-integrity audit (contrib/spi/refint.c enforces
    // FK constraints trigger-side; at warehouse scale the idiom is the
    // batch ORPHAN SCAN instead — find fact keys with no dimension row).
    // The dimension is deliberately holed (custkeys divisible by 7
    // removed) so the audit has real findings: per orphaned key, its
    // order count and value at stake; bounded top-20 by exposure.
    "q_refint_orphans" -> ((s, dir) => {
      val dim = t(s, dir, "customer").filter(col("c_custkey") % 7 =!= 0)
      t(s, dir, "orders")
        .join(dim, col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("value_at_stake"))
        .orderBy(col("value_at_stake").desc, col("o_custkey"))
        .limit(20)
    }),

    // Null-aware anti join: NOT IN over a *nullable* inner (GP's
    // LeftAntiSemiJoinNotIn; Spark plans a null-aware anti join). The
    // CASE never actually yields NULL so the result is non-empty, but the
    // nullable type forces the null-aware plan.
    "q_join_notin_nullaware" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q_na_cust")
      t(s, dir, "nation").filter(col("n_regionkey") === 0)
        .select(when(col("n_name") === "NO_SUCH_NATION", lit(null))
          .otherwise(col("n_nationkey")).as("k"))
        .createOrReplaceTempView("q_na_inner")
      s.sql("""SELECT c_mktsegment, COUNT(*) AS n FROM q_na_cust
               WHERE c_nationkey NOT IN (SELECT k FROM q_na_inner)
               GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // Quantified comparison subqueries (> ALL / > ANY — the reference's
    // SubLink/SubPlan machinery, nodeSubplan.c; ORCA's
    // CXformSubqueryQuantified). Spark SQL has no ALL/ANY comparison
    // quantifiers, so they decompose into the classic aggregate rewrite:
    // x > ALL(S) == x > max(S) (vacuously TRUE on empty S),
    // x > ANY(S) == x > min(S) (FALSE on empty S) — valid because the
    // inner is filtered non-NULL, exactly the precondition the
    // reference's rewrite checks. Oracle = DuckDB's NATIVE quantifiers.
    "q_any_all_subquery" -> ((s, dir) => {
      val supBal = t(s, dir, "supplier").filter(col("s_acctbal").isNotNull)
        .groupBy(col("s_nationkey"))
        .agg(max(col("s_acctbal")).as("mx"), min(col("s_acctbal")).as("mn"))
      t(s, dir, "customer").filter(col("c_custkey") <= 500)
        // inject NULL outers (every 10th key) so the hash check actually
        // exercises the NULL-against-non-empty path below — the raw
        // column has no NULLs; same CASE in the oracle SQL
        .withColumn("bal", when(col("c_custkey") % 10 === 3, lit(null))
          .otherwise(col("c_acctbal")))
        .join(supBal, col("c_nationkey") === col("s_nationkey"), "left")
        .select(col("c_custkey"),
          // empty S (left-join NULL mx): > ALL vacuously true, > ANY false
          // — EVEN for a NULL outer (vacuous truth doesn't look at x).
          // Guard ONLY that case — a NULL outer against non-empty S must
          // stay NULL (SQL quantified comparison), which the bare
          // comparison gives. Precondition: inner filtered non-NULL above
          // (required by the max/min rewrite). The injected NULL outers
          // make the hash check cover both NULL paths.
          when(col("mx").isNull, lit(true))
            .otherwise(col("bal") > col("mx")).as("gt_all_supp"),
          when(col("mn").isNull, lit(false))
            .otherwise(col("bal") > col("mn")).as("gt_any_supp"))
        .orderBy(col("c_custkey"))
    }),

    // NOT IN with actual NULLs in the inner: x NOT IN (S) is never true
    // when S contains NULL, so zero rows survive. Surfaced as a COUNT so
    // the output is non-empty and checkable. The DataFrame-API anti join
    // is NOT null-aware, so this goes through SQL (Catalyst plans the
    // null-aware anti join the reference gets from
    // CXformLeftAntiSemiJoinNotIn2HashJoinNotIn).
    "q_notin_null_semantics" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("q_nn_cust")
      t(s, dir, "nation")
        .select(when(col("n_nationkey") === 0, lit(null))
          .otherwise(col("n_nationkey")).as("k"))
        .createOrReplaceTempView("q_nn_inner")
      s.sql("""SELECT COUNT(*) AS n FROM q_nn_cust
               WHERE c_nationkey NOT IN (SELECT k FROM q_nn_inner)""")
    }),

    // CROSS join (NestLoop): small x small with a computed pair label.
    "q_join_cross" -> ((s, dir) => {
      val r = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      r.crossJoin(n)
        .select(concat_ws("|", col("r_name"), col("n_name")).as("pair"),
                (col("r_regionkey") * 100 + col("n_nationkey")).as("code"))
        .orderBy(col("code"))
    }),

    // Theta/range join (reference: MergeJoin/NestLoop with <,> quals):
    // price-band histogram via a broadcast banded nested-loop join.
    "q_join_theta_band" -> ((s, dir) => {
      val bands = s.range(0, 10)
        .select(col("id").as("band"),
                (lit(900) + col("id") * 10).cast("double").as("lo"),
                (lit(900) + (col("id") + 1) * 10).cast("double").as("hi"))
      val part = t(s, dir, "part")
      part.join(broadcast(bands),
          col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("band"))
    }),

    // Sort-merge join pinned via hint (reference MergeJoin).
    "q_join_merge_algo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders").hint("merge")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    // Shuffled-hash join pinned via hint (reference HashJoin w/ spill).
    "q_join_hash_algo" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").hint("shuffle_hash")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), davg(col("l_quantity")).as("avg_qty"))
        .orderBy(col("p_brand"))
    }),

    // Self join: pairs of lineitems of the same order (ln1 < ln2).
    "q_join_self" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber").as("ln1"))
      val b = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber").as("ln2"))
      a.join(b, Seq("l_orderkey"))
        .filter(col("ln1") < col("ln2"))
        .groupBy()
        .agg(count(lit(1)).as("n_pairs"), countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // LATERAL (correlated subquery in FROM; reference: nodeNestloop
    // parameterized inner / ORCA Apply xforms). Catalyst decorrelates.
    "q_join_lateral" -> ((s, dir) => {
      t(s, dir, "nation").createOrReplaceTempView("q_lat_nation")
      t(s, dir, "customer").createOrReplaceTempView("q_lat_cust")
      s.sql("""
        SELECT n.n_name, top.c_name, top.c_acctbal
        FROM q_lat_nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM q_lat_cust c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) top
        ORDER BY n.n_name, top.c_acctbal DESC, top.c_name""")
    }),

    // Scalar subquery in a predicate (stabilized average) — expressed as a
    // genuine one-row aggregate joined in as a broadcast, so Catalyst
    // plans ONE job (no eager driver .head action splitting the work).
    "q_scalar_subquery" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val avgBal = cust.agg(
        round(sum(col("c_acctbal").cast(Dec)).cast("double") / count(lit(1)), 4)
          .as("avg_bal"))
      cust.join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("c_nationkey"))
    })
  )

  private val rev = "l_extendedprice*(1-l_discount)"

  val oracle: Map[String, String] = Map(
    "q_any_all_subquery" ->
      """WITH c AS (SELECT c_custkey, c_nationkey,
        |    CASE WHEN c_custkey % 10 = 3 THEN NULL ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey <= 500)
        |SELECT c_custkey,
        |  bal > ALL (SELECT s_acctbal FROM supplier
        |    WHERE s_nationkey = c_nationkey AND s_acctbal IS NOT NULL)
        |    AS gt_all_supp,
        |  bal > ANY (SELECT s_acctbal FROM supplier
        |    WHERE s_nationkey = c_nationkey AND s_acctbal IS NOT NULL)
        |    AS gt_any_supp
        |FROM c ORDER BY c_custkey""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |  o_orderpriority, ${sqlDsum(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name, ${sqlDsum(rev)} AS revenue, COUNT(*) AS n
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_regionkey <= 2
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_join_left_outer" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows,
        |  COUNT(l_orderkey) AS n_matched,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM orders LEFT JOIN (
        |  SELECT * FROM lineitem WHERE l_quantity >= 48) l
        |ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_right_outer" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows, COUNT(l_orderkey) AS n_matched
        |FROM (SELECT * FROM lineitem WHERE l_quantity >= 48) l
        |RIGHT JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_join_full_outer" ->
      """SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
        |      WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
        |      WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
        |ON c.c_nationkey = s.s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_anti" ->
      """SELECT c_nationkey, COUNT(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_refint_orphans" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS value_at_stake
         |FROM orders
         |WHERE NOT EXISTS (SELECT 1 FROM customer
         |  WHERE c_custkey = o_custkey AND c_custkey % 7 <> 0)
         |GROUP BY o_custkey
         |ORDER BY value_at_stake DESC, o_custkey LIMIT 20""".stripMargin,

    "q_join_notin_nullaware" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
        |WHERE c_nationkey NOT IN (
        |  SELECT CASE WHEN n_name = 'NO_SUCH_NATION' THEN NULL
        |              ELSE n_nationkey END FROM nation WHERE n_regionkey = 0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_notin_null_semantics" ->
      """SELECT COUNT(*) AS n FROM customer
        |WHERE c_nationkey NOT IN (
        |  SELECT CASE WHEN n_nationkey = 0 THEN NULL ELSE n_nationkey END
        |  FROM nation)""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name || '|' || n_name AS pair,
        |  CAST(r_regionkey * 100 + n_nationkey AS BIGINT) AS code
        |FROM region CROSS JOIN nation ORDER BY code""".stripMargin,

    "q_join_theta_band" ->
      s"""SELECT t.band, COUNT(*) AS n, ${sqlDsum("p_retailprice")} AS sum_price
         |FROM part JOIN (
         |  SELECT range AS band, 900 + range*10.0 AS lo, 900 + (range+1)*10.0 AS hi
         |  FROM range(0, 10)) t
         |ON p_retailprice >= t.lo AND p_retailprice < t.hi
         |GROUP BY t.band ORDER BY t.band""".stripMargin,

    "q_join_merge_algo" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_hash_algo" ->
      s"""SELECT p_brand, COUNT(*) AS n, ${sqlDavg("l_quantity")} AS avg_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_self" ->
      """SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT a.l_orderkey) AS n_orders
        |FROM lineitem a JOIN lineitem b
        |ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber""".stripMargin,

    "q_join_lateral" ->
      """SELECT n.n_name, top.c_name, top.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
        |ORDER BY n.n_name, top.c_acctbal DESC, top.c_name""".stripMargin,

    "q_scalar_subquery" ->
      s"""SELECT c_nationkey, COUNT(*) AS n, ${sqlDsum("c_acctbal")} AS sum_bal
         |FROM customer
         |WHERE c_acctbal > (
         |  SELECT ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), 4)
         |  FROM customer)
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
