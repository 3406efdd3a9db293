package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SQL-facade parity: these queries are a single SQL string executed
  * VERBATIM by both Spark SQL and the DuckDB oracle — the strongest
  * statement of the reference's SQL surface (`exec_simple_query`,
  * `/root/reference/src/backend/tcop/postgres.c:1669`) mapping onto
  * `spark.sql(...)`: one dialect-neutral text, two engines, one answer.
  */
object SqlParity extends QueryModule {

  /** shared verbatim texts (dialect-neutral ANSI subset) */
  private val sharedSql: Map[String, String] = Map(
    "q_sql_verbatim_join_agg" ->
      """SELECT n_name,
        |  o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
        |    / 1000000.0 AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name, o_orderpriority
        |HAVING COUNT(*) >= 5
        |ORDER BY n_name, o_orderpriority""".stripMargin,

    "q_sql_verbatim_window" ->
      """SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    rank() OVER (PARTITION BY c_nationkey
        |                 ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) ranked
        |WHERE rnk <= 2
        |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,

    // Correlated scalar subqueries in the SELECT list (ORCA's
    // Apply-to-join decorrelation, CSubqueryHandler): Catalyst rewrites
    // both into left-outer aggregated joins; correlated COUNT(*) must
    // yield 0 (not NULL) for empty groups — the classic COUNT-bug case.
    "q_sql_verbatim_correlated" ->
      """SELECT n_name,
        |  (SELECT COUNT(*) FROM customer c
        |   WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) AS n_rich,
        |  (SELECT MAX(s_acctbal) FROM supplier s
        |   WHERE s.s_nationkey = n.n_nationkey) AS max_supp_bal
        |FROM nation n
        |ORDER BY n_name""".stripMargin,

    // EXISTS / NOT EXISTS + IN subqueries in one verbatim text (semi/anti
    // join planning from the SQL facade).
    "q_sql_verbatim_exists" ->
      """SELECT c_mktsegment,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CASE WHEN EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  CAST(SUM(CASE WHEN c.c_nationkey IN (
        |    SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_region0
        |FROM customer c
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    // Modern GROUP BY ALL / ORDER BY ALL shorthand, one verbatim text.
    "q_sql_verbatim_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,

    // Chained CTEs + window over an aggregate, one verbatim text.
    "q_sql_verbatim_cte_window" ->
      """WITH daily AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    COUNT(*) AS n_orders
        |  FROM orders GROUP BY o_custkey, o_orderdate),
        |ranked AS (
        |  SELECT o_custkey, d, n_orders,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY n_orders DESC, d) AS rn
        |  FROM daily)
        |SELECT o_custkey, d, n_orders FROM ranked
        |WHERE rn = 1 AND o_custkey <= 200
        |ORDER BY o_custkey""".stripMargin,

    "q_sql_verbatim_setop" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 8000
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier WHERE s_acctbal > 8000
        |) u
        |GROUP BY k
        |ORDER BY k""".stripMargin
  )

  /** MDQA hard case (qp_olap_mdqa.sql): multiple DISTINCT aggregates
    * under grouping sets — Expand x DQA planning combined. */
  private val mdqaSpark: (SparkSession, String) => DataFrame = (s, dir) => {
    t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
           countDistinct(col("l_partkey")).as("nd_part"),
           countDistinct(col("l_suppkey")).as("nd_supp"),
           count(lit(1)).as("n"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)
  }

  /** Explicit NULLS FIRST/LAST ordering parity. */
  private val nullOrderSpark: (SparkSession, String) => DataFrame = (s, dir) => {
    t(s, dir, "customer").filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("bal"))
      .orderBy(col("bal").desc_nulls_last, col("c_custkey"))
      .limit(50)
  }

  /** Named-window (WINDOW clause) verbatim text — parse.c windowClause /
    * transformWindowDefinitions; one definition, several consumers. */
  private val namedWindowSql =
    """SELECT user_id, event_id,
      |  rank() OVER w AS rnk,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  COUNT(*) OVER w AS n_so_far
      |FROM events
      |WHERE user_id <= 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** Extended-query / prepared-statement path (§3.3 — postgres.c
    * `exec_parse_message`/`exec_bind_message`: parse once, bind
    * parameters at execute). Spark's parameterized `spark.sql(text,
    * args)` is the same contract; the text below runs with named markers
    * bound plan-side, while the oracle inlines the identical literals. */
  private val preparedSqlText =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(round(c_acctbal * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
      |    / 1000000.0 AS total_bal
      |FROM customer
      |WHERE c_acctbal > :minbal AND c_mktsegment <> :seg
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    sharedSql.map { case (name, sql) =>
      name -> ((s: SparkSession, dir: String) => {
        Seq("orders", "customer", "nation", "supplier", "lineitem")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(sql)
      })
    } ++ Map(
      "q_mdqa_grouping_sets" -> mdqaSpark,
      "q_null_ordering" -> nullOrderSpark,
      "q_sql_prepared" -> ((s: SparkSession, dir: String) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql(preparedSqlText,
          Map("minbal" -> 2000.0, "seg" -> "BUILDING"))
      }),
      "q_sql_named_window" -> ((s: SparkSession, dir: String) => {
        t(s, dir, "events").createOrReplaceTempView("events")
        s.sql(namedWindowSql)
      }))

  val oracle: Map[String, String] = sharedSql ++ Map(
    "q_mdqa_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus) AS gid,
        |  COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_null_ordering" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
        |FROM customer WHERE c_custkey <= 200
        |ORDER BY bal DESC NULLS LAST, c_custkey
        |LIMIT 50""".stripMargin,

    // the prepared text with the bind values inlined as literals
    "q_sql_prepared" ->
      preparedSqlText
        .replace(":minbal", "2000.0")
        .replace(":seg", "'BUILDING'"),

    "q_sql_named_window" -> namedWindowSql
  )
}
