package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Grouped aggregation family.
  *
  * Reference executor: `Agg` node (`/root/reference/src/backend/executor/nodeAgg.c:2310`,
  * PLAIN/SORTED/HASHED/MIXED strategies) with GP's two-/three-stage parallel
  * plans (`src/backend/cdb/cdbgroupingpaths.c:265`) and multi-DQA TupleSplit
  * (`src/backend/executor/nodeTupleSplit.c:184`). Spark plans the same shapes
  * natively: partial+final HashAggregateExec around the shuffle, ExpandExec
  * for multiple DISTINCT aggregates — we only declare the logical query.
  */
object CoreAgg extends QueryModule {

  /** HLL estimator constant alpha_m * m^2 for m=256 (Flajolet et al.);
    * one Scala double, embedded verbatim in both the plan and the oracle
    * SQL (Double.toString round-trips bit-exactly through DuckDB's
    * parser — the hyperplane-literal pattern). */
  private val hllAlphaM2: Double = 0.7213 / (1 + 1.079 / 256) * 256 * 256

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan -> pushed filter -> partial/final hash agg ->
    // shuffle on the 2 grouping cols -> sort. The flagship slice of §3.
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multiple DISTINCT-qualified aggregates in one grouped agg (GP 3-stage
    // DQA / TupleSplit plan; Spark: ExpandExec + two-shuffle plan).
    "q_agg_multi_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_orderkey"), col("l_linenumber")).as("nd_line"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // GROUP BY GROUPING SETS with grouping_id (nodeAgg rollup chains).
    "q_grouping_sets" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
             count(lit(1)).as("n"),
             dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .rollup(col("o_orderstatus"), col("o_year"))
        .agg(grouping_id().as("gid"),
             count(lit(1)).as("n"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_year").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
        .cube(col("o_orderstatus"), col("o_year"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first, col("o_year").asc_nulls_first)
    }),

    // Statistical aggregates (pg_aggregate.dat families: stddev/var/corr/
    // covar/regr_*). Inherently float -> rounded to absorb accumulation
    // order differences.
    "q_agg_stats" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 3).as("sd_qty"),
          round(var_samp(col("l_quantity")), 3).as("var_qty"),
          round(stddev_pop(col("l_discount")), 6).as("sdp_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qd"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 3).as("slope_pq"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 3).as("icpt_pq"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pq"))
        .orderBy(col("l_returnflag"))
    }),

    // The rest of the regr_* linear-regression family (pg_aggregate.dat
    // regr_r2/avgx/avgy/sxx/syy/sxy — float8_regr_* in
    // `src/backend/utils/adt/float.c`). Same rounding discipline as
    // q_agg_stats: r2 is 0..1 (round 6), moments are large sums with
    // ~1e-9 relative error (round 3).
    // Deterministic mergeable quantile sketch — the hash-checkable
    // sibling of approx_percentile (whose engine-internal digest bits
    // can't cross engines), same discipline as q_hll_deterministic. A
    // fixed 128-bin equi-width histogram over a declared domain is a
    // bounded-state mergeable aggregate: partials are (bin, count) pairs
    // (map-side combined), estimates interpolate within the covering bin.
    // Every rank/interpolation arithmetic step is mirrored op-for-op in
    // the oracle. 100 TB shape: state = 128 longs per group regardless
    // of row count, one narrow shuffle.
    "q_quantile_sketch" -> ((s, dir) => {
      val bins = 128; val hi = 110000.0
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag")).orderBy(col("bin"))
      val hist = t(s, dir, "lineitem")
        .withColumn("bin", least(floor(col("l_extendedprice") / hi * bins),
          lit(bins - 1)).cast("int"))
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        .withColumn("n", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("l_returnflag"))))
      val sp = s; import sp.implicits._
      val qs = Seq(0.5, 0.95, 0.99).toDF("q")
      hist.join(qs)
        .filter(col("cum") >= col("q") * col("n") &&
          (col("cum") - col("c")) < col("q") * col("n"))
        .select(col("l_returnflag"), col("q"), col("n"),
          round((col("bin") * lit(hi / bins)) +
            (col("q") * col("n") - (col("cum") - col("c"))) / col("c") *
              lit(hi / bins), 4).as("est"))
        .orderBy(col("l_returnflag"), col("q"))
    }),

    "q_regr_family" -> ((s, dir) => {
      val y = col("l_extendedprice"); val x = col("l_quantity")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(regr_r2(y, x), 6).as("r2"),
          round(regr_avgx(y, x), 4).as("avgx"),
          round(regr_avgy(y, x), 4).as("avgy"),
          round(regr_sxx(y, x), 3).as("sxx"),
          round(regr_syy(y, x), 0).as("syy"),
          round(regr_sxy(y, x), 2).as("sxy"))
        .orderBy(col("l_returnflag"))
    }),

    // Winsorized mean — robust statistics (the MADlib/stats trimmed-
    // estimator niche): values clamped to the group's exact p05/p95
    // (percentile_disc via the ceil(p*n)-th sorted element, the same
    // construction q_agg_filter_disc pins), then the micros-exact mean
    // of the clamped values. Two-pass shape: the percentile pass reduces
    // each group to two scalars that broadcast back onto the rows.
    "q_winsorized_mean" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val pcts = li.groupBy(col("l_returnflag"))
        .agg(
          expr("""element_at(array_sort(collect_list(l_extendedprice)),
                 |  cast(ceil(0.05 * count(1)) as int))""".stripMargin)
            .as("p05"),
          expr("""element_at(array_sort(collect_list(l_extendedprice)),
                 |  cast(ceil(0.95 * count(1)) as int))""".stripMargin)
            .as("p95"))
      li.join(broadcast(pcts), "l_returnflag")
        .withColumn("wv",
          least(greatest(col("l_extendedprice"), col("p05")), col("p95")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          max(col("p05")).as("p05"), max(col("p95")).as("p95"),
          expr("""CAST(SUM(CAST(round(wv * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
                 |  / count(1) / 1000000.0""".stripMargin).as("wmean_raw"))
        .select(col("l_returnflag"), col("n"), col("p05"), col("p95"),
          round(col("wmean_raw"), 4).as("winsorized_mean"))
        .orderBy(col("l_returnflag"))
    }),

    // Ordered-set aggregates (orderedsetaggs.c: percentile_cont/disc, mode)
    // + GP's median alias (pg_proc.dat:11586). Exact interpolated
    // percentile via Spark's `percentile`, deterministic mode via max_by
    // over (count, value) pairs.
    "q_ordered_set_agg" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val mode = li.groupBy(col("l_returnflag"), col("l_quantity")).count()
        .groupBy(col("l_returnflag"))
        .agg(max_by(col("l_quantity"), struct(col("count"), col("l_quantity"))).as("mode_qty"))
      li.groupBy(col("l_returnflag"))
        .agg(
          // one sort-based pass for all three exact percentiles
          percentile(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.95))).as("pcts"),
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"))
        .select(col("l_returnflag"),
          round(element_at(col("pcts"), 2), 4).as("median_price"),
          round(element_at(col("pcts"), 1), 4).as("p25_price"),
          round(element_at(col("pcts"), 3), 4).as("p95_price"),
          col("min_price"), col("max_price"))
        .join(mode, Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    }),

    // string_agg / array_agg family (array_userfuncs.c, gp_legacy_string_agg)
    // rendered order-deterministic: sort the collected list.
    "q_agg_strings" -> ((s, dir) => {
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"),
          min(col("n_name")).as("first_nation"),
          max(col("n_name")).as("last_nation"))
        .orderBy(col("n_regionkey"))
    }),

    // bool_and/bool_or + min_by/max_by (arg_min/arg_max in the oracle).
    "q_agg_minmax_by" -> ((s, dir) => {
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("richest"),
          min_by(col("c_name"), struct(col("c_acctbal"), lit(-1) * col("c_custkey"))).as("poorest"),
          bool_and(col("c_acctbal") > -1000).as("all_above"),
          bool_or(col("c_acctbal") > 9000).as("any_rich"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // HAVING = post-aggregation filter (reference plans it as a qual on Agg).
    "q_agg_having" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("n") >= 3)
        .orderBy(col("l_partkey"))
    }),

    // Skew-resistant salted aggregation (the reference costs skew in
    // cdbpath; `qp_skew.sql` tests it): low-cardinality keys (3 flags over
    // the whole table) first aggregate on (key, salt) — spreading each hot
    // key over 16 reducers — then combine per key. The micros-long sums
    // make the two-stage result bit-equal to the oracle's single-stage one.
    "q_salted_agg" -> ((s, dir) => {
      // lsum128 at the salted stage: a (flag, salt) cell is 1/48 of the
      // table — ~29x headroom at the 100 TB point as a long sum (r17
      // sweep). qm is then decimal(38,0), so the combine stage's plain
      // sum is already 128-bit-exact.
      val partial = t(s, dir, "lineitem")
        .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(lsum128(round(col("l_quantity") * 1000000.0, 0).cast("long"))
          .as("qm"), count(lit(1)).as("n"))
      partial.groupBy(col("l_returnflag"))
        .agg((sum(col("qm")).cast("double") / 1000000.0).as("sum_qty"),
             sum(col("n")).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Distribution-skew audit (gp_toolkit's gp_skew_* views: the
    // reference ships skew-coefficient reports per table because a hot
    // distribution key is THE Greenplum operational failure mode; same
    // story on a 1000-executor shuffle): group-size distribution for a
    // candidate key — key count, min/max/percentile sizes, and the skew
    // ratio max/avg in half-up micros (1e6 = perfectly even). The sizes
    // relation is key-bounded; everything after the first aggregate is
    // tiny. The heaviest key is reported with a deterministic tie-break.
    "q_skew_audit" -> ((s, dir) => {
      val sizes = t(s, dir, "events")
        .groupBy(col("user_id")).agg(count(lit(1)).as("sz"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      sizes
        .withColumn("mx", max(col("sz")).over(wAll))
        .agg(count(lit(1)).as("n_keys"),
             sum(col("sz")).as("n_rows"),
             min(col("sz")).as("min_sz"),
             max(col("sz")).as("max_sz"),
             min(when(col("sz") === col("mx"), col("user_id"))).as("max_key"))
        .select(col("n_keys"), col("n_rows"), col("min_sz"), col("max_sz"),
          col("max_key"),
          expr("CAST((2 * (1000000 * CAST(max_sz AS DECIMAL(38,0)) * n_keys)" +
               " + n_rows) div (2 * n_rows) AS BIGINT)").as("skew_u"))
    }),

    // approx distinct sketch (gp_hyperloglog.c analogue). No oracle: DuckDB's
    // approx_count_distinct uses a different sketch; driver records
    // rows-only. Exactness checked separately by q_agg_multi_distinct.
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
             approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Deterministic, ORACLE-CHECKED HyperLogLog (contrast with
    // q_approx_distinct, whose engine-internal HLL++ register bits are
    // legitimately rows-only): 60-bit md5-derived hashes (engine-
    // independent, like the simhash signatures), 256 registers,
    // rho = leading-zero rank capped at 18 so every 2^-rho is EXACT in
    // DECIMAL(38,18) = 5^rho/10^rho — the register sum is order-
    // independent and bit-identical across engines; the only float ops
    // (the alpha*m^2/sum estimate, the linear-counting correction) run
    // in one fixed order on both sides. Registers merge across event
    // types with max() — the sketch-union property — and the merged
    // 'ALL' estimate is hash-checked alongside the per-type ones.
    // Flajolet et al.'s published estimator; the cap costs nothing at
    // any realistic cardinality (rho > 18 needs ~2^18 values PER BUCKET).
    "q_hll_deterministic" -> ((s, dir) => {
      val m = 256
      val alphaM2 = hllAlphaM2
      val ev = t(s, dir, "events").select(col("event_type"), col("user_id"))
      val hashed = ev.select(col("event_type"),
          conv(substring(md5(col("user_id").cast("string").cast("binary")),
            1, 15), 16, 10).cast("long").as("h"))
        .select(col("event_type"), expr("h & 255").as("bucket"),
          expr("least(53 - length(bin(shiftright(h, 8))), 18)").as("rho"))
      val reg = hashed.groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("mreg"))
      val regAll = hashed.groupBy(col("bucket")).agg(max(col("rho")).as("mreg"))
        .withColumn("event_type", lit("ALL"))
      val types = ev.select(col("event_type")).distinct()
        .unionAll(s.range(1).select(lit("ALL").as("event_type")))
      // empty registers count as rho=0 (term 1.0): materialize the full
      // type x 256 grid — constant-size, broadcast-friendly
      val grid = types.crossJoin(
        s.range(m).select(col("id").cast("int").as("bucket")))
      val full = grid
        .join(reg.unionByName(regAll), Seq("event_type", "bucket"), "left")
        .withColumn("mreg", coalesce(col("mreg"), lit(0)))
      val est = full.groupBy(col("event_type"))
        .agg(expr("cast(sum(cast(pow(2.0, -mreg) as decimal(38,18))) as double)")
               .as("sump"),
             sum(when(col("mreg") === 0, 1).otherwise(0)).as("v"))
        .withColumn("e_raw", lit(alphaM2) / col("sump"))
        .withColumn("n_est", round(
          when(col("e_raw") <= 2.5 * m && col("v") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
            .otherwise(col("e_raw")), 3))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .unionByName(ev.agg(countDistinct(col("user_id")).as("n_exact"))
          .withColumn("event_type", lit("ALL")))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n_est"), col("n_exact"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_hll_deterministic" ->
      s"""WITH ev AS (SELECT event_type, user_id FROM events),
         |h AS (SELECT event_type,
         |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
         |      AS BIGINT) AS h
         |  FROM ev),
         |b AS (SELECT event_type, h & 255 AS bucket,
         |    least(53 - length(bin(h >> 8)), 18) AS rho FROM h),
         |reg AS (SELECT event_type, bucket, MAX(rho) AS mreg
         |    FROM b GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'ALL', bucket, MAX(rho) FROM b GROUP BY 2),
         |types AS (SELECT DISTINCT event_type FROM ev UNION ALL SELECT 'ALL'),
         |grid AS (SELECT t.event_type, g.g AS bucket
         |  FROM types t, (SELECT unnest(range(0, 256)) AS g) g),
         |f AS (SELECT g.event_type, COALESCE(r.mreg, 0) AS mreg
         |  FROM grid g LEFT JOIN reg r
         |    ON g.event_type = r.event_type AND g.bucket = r.bucket),
         |est AS (SELECT event_type,
         |    CAST(SUM(CAST(power(2.0, -mreg) AS DECIMAL(38,18))) AS DOUBLE)
         |      AS sump,
         |    SUM(CASE WHEN mreg = 0 THEN 1 ELSE 0 END) AS v
         |  FROM f GROUP BY 1),
         |ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
         |    FROM ev GROUP BY 1
         |  UNION ALL SELECT 'ALL', COUNT(DISTINCT user_id) FROM ev)
         |SELECT e.event_type,
         |  ROUND(CASE WHEN $hllAlphaM2 / sump <= 640.0 AND v > 0
         |    THEN 256.0 * ln(256.0 / v) ELSE $hllAlphaM2 / sump END, 3)
         |    AS n_est,
         |  x.n_exact
         |FROM est e JOIN ex x ON e.event_type = x.event_type
         |ORDER BY e.event_type""".stripMargin,

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
         |  ${sqlDsum("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_extendedprice")} AS avg_price,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_multi_distinct" ->
      s"""SELECT l_returnflag,
         |  COUNT(DISTINCT l_partkey) AS nd_part,
         |  COUNT(DISTINCT l_suppkey) AS nd_supp,
         |  COUNT(DISTINCT (l_orderkey, l_linenumber)) AS nd_line,
         |  COUNT(*) AS n,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  GROUPING(l_returnflag, l_linestatus) AS gid,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
         |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_rollup" ->
      s"""SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS o_year,
         |  GROUPING(o_orderstatus, year(o_orderdate)) AS gid,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP (o_orderstatus, year(o_orderdate))
         |ORDER BY gid, o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS o_year,
        |  GROUPING(o_orderstatus, year(o_orderdate)) AS gid, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, year(o_orderdate))
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_year NULLS FIRST""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  ROUND(stddev_samp(l_quantity), 3) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 3) AS var_qty,
        |  ROUND(stddev_pop(l_discount), 6) AS sdp_disc,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qd,
        |  ROUND(regr_slope(l_extendedprice, l_quantity), 3) AS slope_pq,
        |  ROUND(regr_intercept(l_extendedprice, l_quantity), 3) AS icpt_pq,
        |  regr_count(l_extendedprice, l_quantity) AS n_pq
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_quantile_sketch" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    CAST(least(floor(l_extendedprice / 110000.0 * 128), 127) AS INT)
        |      AS bin,
        |    COUNT(*) AS c
        |  FROM lineitem GROUP BY l_returnflag, bin),
        |cum AS (
        |  SELECT l_returnflag, bin, c,
        |    CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY bin)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM h),
        |qs AS (SELECT unnest([0.5, 0.95, 0.99]) AS q)
        |SELECT l_returnflag, q, n,
        |  ROUND((bin * (110000.0 / 128)) +
        |    (q * n - (cum - c)) / c * (110000.0 / 128), 4) AS est
        |FROM cum, qs
        |WHERE cum >= q * n AND (cum - c) < q * n
        |ORDER BY l_returnflag, q""".stripMargin,

    "q_regr_family" ->
      """SELECT l_returnflag,
        |  ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |  ROUND(regr_avgx(l_extendedprice, l_quantity), 4) AS avgx,
        |  ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS avgy,
        |  ROUND(regr_sxx(l_extendedprice, l_quantity), 3) AS sxx,
        |  ROUND(regr_syy(l_extendedprice, l_quantity), 0) AS syy,
        |  ROUND(regr_sxy(l_extendedprice, l_quantity), 2) AS sxy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // same exact-percentile construction (ceil(p*n)-th sorted element),
    // same micros mean over the clamped values
    "q_winsorized_mean" ->
      """WITH p AS (SELECT l_returnflag,
        |    (list_sort(list(l_extendedprice)))
        |      [CAST(ceil(0.05 * COUNT(*)) AS INT)] AS p05,
        |    (list_sort(list(l_extendedprice)))
        |      [CAST(ceil(0.95 * COUNT(*)) AS INT)] AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT li.l_returnflag, COUNT(*) AS n,
        |  MAX(p.p05) AS p05, MAX(p.p95) AS p95,
        |  ROUND(CAST(SUM(CAST(round(
        |      least(greatest(li.l_extendedprice, p.p05), p.p95)
        |      * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
        |    / COUNT(*) / 1000000.0, 4) AS winsorized_mean
        |FROM lineitem li JOIN p ON li.l_returnflag = p.l_returnflag
        |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin,

    "q_ordered_set_agg" ->
      """SELECT l_returnflag,
        |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS median_price,
        |  ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25_price,
        |  ROUND(percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p95_price,
        |  MIN(l_extendedprice) AS min_price,
        |  MAX(l_extendedprice) AS max_price,
        |  (SELECT m.l_quantity FROM (
        |     SELECT l2.l_quantity, COUNT(*) c FROM lineitem l2
        |     WHERE l2.l_returnflag = l1.l_returnflag GROUP BY l2.l_quantity
        |     ORDER BY c DESC, l2.l_quantity DESC LIMIT 1) m) AS mode_qty
        |FROM lineitem l1 GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_strings" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  COUNT(*) AS n, MIN(n_name) AS first_nation, MAX(n_name) AS last_nation
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,

    "q_agg_minmax_by" ->
      """WITH r AS (SELECT c_mktsegment, c_name,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey DESC) rmax,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey DESC) rmin
        |  FROM customer),
        | a AS (SELECT c_mktsegment, bool_and(c_acctbal > -1000) AS all_above,
        |    bool_or(c_acctbal > 9000) AS any_rich, COUNT(*) AS n
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT a.c_mktsegment, mx.c_name AS richest, mn.c_name AS poorest,
        |  a.all_above, a.any_rich, a.n
        |FROM a
        |JOIN r mx ON mx.c_mktsegment = a.c_mktsegment AND mx.rmax = 1
        |JOIN r mn ON mn.c_mktsegment = a.c_mktsegment AND mn.rmin = 1
        |ORDER BY a.c_mktsegment""".stripMargin,

    "q_salted_agg" ->
      s"""SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_skew_audit" ->
      """WITH sizes AS (SELECT user_id, COUNT(*) AS sz
        |  FROM events GROUP BY user_id),
        |mx AS (SELECT MAX(sz) AS mx FROM sizes),
        |a AS (SELECT COUNT(*) AS n_keys, CAST(SUM(sz) AS BIGINT) AS n_rows,
        |    MIN(sz) AS min_sz, MAX(sz) AS max_sz,
        |    MIN(CASE WHEN sz = mx.mx THEN user_id END) AS max_key
        |  FROM sizes, mx GROUP BY mx.mx)
        |SELECT n_keys, n_rows, min_sz, max_sz, max_key,
        |  CAST((2 * (1000000 * CAST(max_sz AS HUGEINT) * n_keys) + n_rows)
        |    // (2 * CAST(n_rows AS HUGEINT)) AS BIGINT) AS skew_u
        |FROM a""".stripMargin,

    "q_agg_having" ->
      s"""SELECT l_partkey, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 3
         |ORDER BY l_partkey""".stripMargin
  )
}
