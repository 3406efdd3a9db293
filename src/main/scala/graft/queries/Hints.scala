package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables._

/** Per-query optimizer hints — the pg_hint_plan analogue.
  *
  * The reference ships comment-embedded plan hints
  * (`/root/reference/gpcontrib/pg_hint_plan/pg_hint_plan.c:94-100`:
  * `HashJoin(a b)`, `MergeJoin(a b)`, `NestLoop(a b)`, the `No*`
  * negative forms, `Leading(...)` join order, `Rows(...)` cardinality
  * correction, `Parallel(t N)`) so a user can pin one bad join without
  * touching planner GUCs globally.
  *
  * Spark-first mapping — Catalyst has the same comment-hint UX built in
  * (a `+`-prefixed block comment in the SELECT list, resolved by
  * `ResolveHints` and consumed by `JoinSelection`), so no custom rule
  * is needed; the correspondence is:
  *
  *   - HashJoin(t ...)  → `SHUFFLE_HASH(t)` (or `BROADCAST(t)` when the
  *     build side fits — the reference's HashJoin with a replicated
  *     inner is exactly a broadcast-hash join);
  *   - MergeJoin(t ...) → `MERGE(t)` / `SHUFFLE_MERGE(t)`;
  *   - NestLoop(t ...)  → `SHUFFLE_REPLICATE_NL(t)`;
  *   - Parallel(t N)    → `REPARTITION(n[, cols])` / `REBALANCE` —
  *     distribution hints standing in for DISTRIBUTED BY;
  *   - No-forms → no direct Spark hint; the negative forms are
  *     expressed by hinting the strategy you DO want (a hint on any
  *     join side wins over cost);
  *   - Leading(...)     → `plans/LeadingJoin.scala` (custom post-hoc
  *     resolution rule rebuilding the chain left-deep, r15);
  *   - Rows(...)        → `plans/RowsHint.scala` (r16): the corrected
  *     estimate resolves to the broadcast/no-broadcast decision it
  *     drives; under AQE the rule declines, since runtime re-planning
  *     supersedes manual cardinality correction.
  *
  * Hints are purely physical: both lanes here carry an oracle that runs
  * the SAME text minus hints, so the driver's hash compare proves hint
  * application cannot change results. HintSpec pins the physical side:
  * each hint flips the join strategy it names, an unknown hint is
  * ignored (plan identical to unhinted), dropping the hint restores the
  * original plan byte-for-byte, and `BROADCAST` overrides a disabled
  * auto-broadcast threshold. PlanSnapshotSpec pins the hinted shapes.
  */
object Hints extends QueryModule {

  /** TPC-H Q3 shape with both non-default join strategies forced:
    * MERGE on the orders side (sort-merge where cost would pick hash)
    * and SHUFFLE_HASH on the customer side (shuffled-hash where the
    * small side would auto-broadcast). */
  private val joinStrategyBody =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  o_orderpriority,
      |  CAST(SUM(CAST(round((l_extendedprice*(1-l_discount)) * 1000000.0, 0)
      |    AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  private[graft] def joinStrategySql(hinted: Boolean): String =
    if (hinted)
      joinStrategyBody.replaceFirst("SELECT ",
        "SELECT /*+ MERGE(orders), SHUFFLE_HASH(customer) */ ")
    else joinStrategyBody

  /** Distribution + replication hints on a supplier-per-nation rollup:
    * REPARTITION(8, s_nationkey) pre-shapes the fact side (the
    * Parallel/DISTRIBUTED BY analogue) and BROADCAST(nation) pins the
    * replicated dim. */
  private val broadcastParallelBody =
    """SELECT n_name, COUNT(*) AS n_supp,
      |  CAST(SUM(CAST(round(s_acctbal * 1000000.0, 0) AS BIGINT))
      |    AS DOUBLE) / 1000000.0 AS total_bal
      |FROM (SELECT __REPART__ s_suppkey, s_nationkey, s_acctbal
      |      FROM supplier WHERE s_acctbal > 0) s
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  private[graft] def broadcastParallelSql(hinted: Boolean): String = {
    val base = broadcastParallelBody.replace("__REPART__",
      if (hinted) "/*+ REPARTITION(8, s_nationkey) */ " else "")
    if (hinted) base.replaceFirst("SELECT n_name",
      "SELECT /*+ BROADCAST(nation) */ n_name")
    else base
  }

  /** `Leading(...)` join-order pinning (`pg_hint_plan.c:94` — the most
    * common hint in the field; `plans/LeadingJoin.scala` is the rule).
    * The authored FROM order is lineitem → orders → customer; the hint
    * forces the dim-first order customer → orders → lineitem, so the
    * pinned snapshot's scan order is itself the adherence proof. */
  private val leadingBody =
    """SELECT c_mktsegment, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(round((l_extendedprice*(1-l_discount)) * 1000000.0, 0)
      |    AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private[graft] def leadingSql(hinted: Boolean): String =
    if (hinted)
      leadingBody.replaceFirst("SELECT ",
        "SELECT /*+ LEADING(customer, orders, lineitem) */ ")
    else leadingBody

  /** `Rows(...)` cardinality correction (`pg_hint_plan.c:94` — the
    * *cause*-level fix behind most bad join orders;
    * `plans/RowsHint.scala` is the rule). The classic underestimate
    * scenario: customer LOOKS broadcast-small by file-size estimate, the
    * DBA knows the post-scan reality is huge, `ROWS(customer, '*100000')`
    * corrects the estimate up and the join falls off broadcast. The
    * rule resolves the corrected estimate at the decision cardinality
    * actually drives in Spark (sizeInBytes vs autoBroadcastJoinThreshold)
    * and declines under AQE, whose runtime stats would supersede the
    * manual estimate — so this lane runs on an AQE-off child session,
    * the configuration the hint is documented for. */
  private val rowsBody =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 1000000.0, 0)
      |    AS BIGINT)) AS DOUBLE) / 1000000.0 AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderdate < TIMESTAMP '1998-06-01'
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private[graft] def rowsSql(hinted: Boolean): String =
    if (hinted)
      rowsBody.replaceFirst("SELECT ",
        "SELECT /*+ ROWS(customer, '*100000') */ ")
    else rowsBody

  /** `Set(key value)` per-statement conf scope (`pg_hint_plan.c:101`
    * HINT_SET; `plans/SetHint.scala` is the wrapper). The statement
    * plans under a killed auto-broadcast threshold and 8 shuffle
    * partitions, with LEADING and ROWS composed in the SAME comment —
    * all three delivery surfaces in one statement. The conf is restored
    * when the wrapper returns (HintSpec proves the next statement plans
    * under the original threshold). */
  private val setBody =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(round(o_totalprice * 1000000.0, 0)
      |    AS BIGINT)) AS DOUBLE) / 1000000.0 AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderdate < TIMESTAMP '1998-06-01'
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  private[graft] def setSql(hinted: Boolean): String =
    if (hinted)
      setBody.replaceFirst("SELECT ",
        "SELECT /*+ SET(spark.sql.autoBroadcastJoinThreshold '-1') " +
          "SET(spark.sql.shuffle.partitions '8') " +
          "LEADING(customer, orders) ROWS(customer, '*100000') */ ")
    else setBody

  private def withViews(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    s.sql(sql)
  }

  private def withViewsSet(s: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
    graft.plans.SetHint.sql(s, sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hint_join_strategy" -> ((s, dir) =>
      withViews(s, dir)(joinStrategySql(hinted = true))),
    "q_hint_broadcast_parallel" -> ((s, dir) =>
      withViews(s, dir)(broadcastParallelSql(hinted = true))),
    "q_hint_leading" -> ((s, dir) =>
      withViews(s, dir)(leadingSql(hinted = true))),
    "q_hint_rows" -> ((s, dir) => {
      // AQE-off child session: the documented configuration for manual
      // cardinality correction (RowsHintRule declines under AQE, whose
      // runtime stats supersede the estimate at the same decision)
      val s2 = s.newSession()
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      // newSession resets runtime confs to context defaults; carry the
      // caller's metadata render width so plan snapshots of this lane
      // clip (or not) exactly like every other lane's
      s2.conf.set("spark.sql.maxMetadataStringLength",
        s.conf.get("spark.sql.maxMetadataStringLength"))
      withViews(s2, dir)(rowsSql(hinted = true))
    }),
    "q_hint_set" -> ((s, dir) => {
      // AQE-off child session: the composed ROWS hint declines under
      // AQE (same configuration note as q_hint_rows), and the SET scope
      // itself is a PLANNING bracket — AQE's runtime re-decisions read
      // the live (restored) conf by design, so the pinned-plan surface
      // is the AQE-off one
      val s2 = s.newSession()
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      s2.conf.set("spark.sql.maxMetadataStringLength",
        s.conf.get("spark.sql.maxMetadataStringLength"))
      withViewsSet(s2, dir)(setSql(hinted = true))
    })
  )

  // the oracle runs the hint-free text: identical results by contract
  val oracle: Map[String, String] = Map(
    "q_hint_join_strategy" -> joinStrategySql(hinted = false),
    "q_hint_broadcast_parallel" -> broadcastParallelSql(hinted = false),
    "q_hint_leading" -> leadingSql(hinted = false),
    "q_hint_rows" -> rowsSql(hinted = false),
    "q_hint_set" -> setSql(hinted = false)
  )
}
