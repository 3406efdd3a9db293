package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Set operations, sort/limit/top-k/distinct, VALUES, series generation,
  * CTEs (incl. recursive fixpoint) — SURVEY §2.6/§2.7.
  *
  * Reference: Append (`/root/reference/src/backend/executor/nodeAppend.c:260`),
  * MergeAppend (`nodeMergeAppend.c:239`), SetOp (`nodeSetOp.c:190`),
  * RecursiveUnion (`nodeRecursiveunion.c:75`), Limit incl. WITH TIES
  * (`nodeLimit.c:44`), Unique (`nodeUnique.c:48`), top-k bounded-heap sort
  * (`utils/sort/tuplesort.c`), ValuesScan (`nodeValuesscan.c:201`),
  * FunctionScan/generate_series (`nodeFunctionscan.c:347`).
  *
  * Spark: unionAll/intersect(All)/except(All) are native; WITH RECURSIVE has
  * no Spark operator so the fixpoint runs as a driver-side loop over
  * DataFrames (each iteration a new plan; localCheckpoint would bound plan
  * growth at depth — depths here are small).
  */
object SetOpsMisc extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_nationkey").as("k"), lit("cust").as("side"))
      val su = t(s, dir, "supplier")
        .select(col("s_nationkey").as("k"), lit("supp").as("side"))
      c.unionAll(su).groupBy(col("k"), col("side"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k"), col("side"))
    }),

    "q_union_distinct" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .select(col("c_nationkey").as("k"))
      val b = t(s, dir, "supplier").filter(col("s_acctbal") > 9900)
        .select(col("s_nationkey").as("k"))
      a.union(b).distinct().orderBy(col("k"))
    }),

    "q_intersect" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_acctbal") > 2000)
        .select(col("c_nationkey").as("k"))
      val b = t(s, dir, "supplier").filter(col("s_acctbal") > 2000)
        .select(col("s_nationkey").as("k"))
      a.intersect(b).orderBy(col("k"))
    }),

    "q_intersect_all" -> ((s, dir) => {
      // INTERSECT ALL keeps min(multiplicity) copies — aggregate to check.
      val a = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_suppkey").as("k"))
      val b = t(s, dir, "lineitem").filter(col("l_discount") >= 0.08)
        .select(col("l_suppkey").as("k"))
      a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    "q_except" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_nationkey").as("k"))
      val b = t(s, dir, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("k"))
      a.except(b).orderBy(col("k"))
    }),

    "q_except_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
        .select(col("l_suppkey").as("k"))
      val b = t(s, dir, "lineitem").filter(col("l_quantity") >= 48)
        .select(col("l_suppkey").as("k"))
      a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    // MergeAppend: ordered UNION ALL of two pre-sorted branches.
    "q_merge_append" -> ((s, dir) => {
      val a = t(s, dir, "customer").filter(col("c_nationkey") <= 2)
        .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
      val b = t(s, dir, "supplier").filter(col("s_nationkey") <= 2)
        .select((col("s_suppkey") + 1000000).as("key"), col("s_acctbal").as("bal"))
      a.unionAll(b).orderBy(col("bal").desc, col("key")).limit(50)
    }),

    // Global top-k: orderBy + limit -> TakeOrderedAndProjectExec (the
    // reference's bounded-heap tuplesort).
    "q_topk_global" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
                col("o_orderdate").cast("date").as("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    // LIMIT WITH TIES (nodeLimit.c LIMIT_OPTION_TIES). rank() <= k over an
    // unpartitioned window would funnel the whole table into ONE task; at
    // scale the equivalent formulation is: k-th value via bounded top-k
    // (TakeOrderedAndProject — a per-partition heap + driver merge of k
    // rows), then filter rows >= that threshold. rank <= k  <=>
    // l_quantity >= 20th-largest quantity. Two scans, zero global sorts,
    // and the one-row threshold joins in as a broadcast.
    "q_limit_with_ties" -> ((s, dir) => {
      val base = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val kth = base.orderBy(col("l_quantity").desc).limit(20)
        .agg(min(col("l_quantity")).as("thr"))
      base.join(broadcast(kth), col("l_quantity") >= col("thr"))
        .drop("thr")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_distinct_pairs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // OFFSET + LIMIT pagination (deterministic order).
    "q_offset_limit" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .offset(100).limit(10)
    }),

    // VALUES scan joined against a table.
    "q_values_scan" -> ((s, dir) => {
      val vals = s.createDataFrame(Seq((0, "zero"), (1, "one"), (2, "two"), (3, "three")))
        .toDF("rk", "label")
      t(s, dir, "region").join(vals, col("r_regionkey") === col("rk"))
        .select(col("r_regionkey"), col("r_name"), col("label"))
        .orderBy(col("r_regionkey"))
    }),

    // generate_series equivalents: numeric range + date series explode.
    "q_generate_series" -> ((s, dir) => {
      s.range(1, 13)
        .select(col("id").cast("int").as("m"))
        .withColumn("month_start",
          make_date(lit(1997), col("m"), lit(1)))
        .withColumn("days_in_month",
          datediff(last_day(col("month_start")), col("month_start")) + 1)
        .orderBy(col("m"))
    }),

    // ROWS FROM (f1(), f2()) — PostgreSQL zips multiple set-returning
    // functions positionally, padding the shorter with NULLs
    // (`/root/reference/src/backend/executor/nodeFunctionscan.c:84`
    // SFRM_Materialize multi-function case; tests `sql/rangefuncs.sql`).
    // Spark-first: arrays_zip IS that positional zip-with-null-padding;
    // posexplode supplies WITH ORDINALITY.
    "q_rows_from" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") <= 30)
        .select(col("o_orderkey"),
          posexplode(arrays_zip(
            // series of different lengths per row: 1..(k%4+1) and squares 1..(k%3+1)
            expr("sequence(1, CAST(o_orderkey % 4 + 1 AS INT))"),
            expr("transform(sequence(1, CAST(o_orderkey % 3 + 1 AS INT)), x -> x * x)")))
            .as(Seq("ord0", "z")))
        .select(col("o_orderkey"), (col("ord0") + 1).cast("int").as("ordinality"),
          col("z.0").cast("long").as("n"), col("z.1").cast("long").as("sq"))
        .orderBy(col("o_orderkey"), col("ordinality"))
    }),

    "q_date_series_explode" -> ((s, dir) => {
      // FunctionScan: per-row set-returning function (ProjectSet).
      t(s, dir, "region")
        .select(col("r_regionkey"),
          explode(sequence(
            to_date(lit("1997-01-01")),
            to_date(lit("1997-03-01")),
            expr("interval 1 month"))).as("d"))
        .orderBy(col("r_regionkey"), col("d"))
    }),

    // Shared CTE (ShareInputScan/planshare.c): one subtree consumed twice.
    "q_cte_shared" -> ((s, dir) => {
      val perNation = t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(davg(col("c_acctbal")).as("avg_bal"), count(lit(1)).as("n"))
      val total = perNation.agg(
        round(sum(col("avg_bal").cast(Dec)).cast("double") /
          count(lit(1)), 4).as("grand_avg"))
      perNation.crossJoin(broadcast(total))
        .filter(col("avg_bal") > col("grand_avg"))
        .select(col("c_nationkey"), col("avg_bal"), col("n"))
        .orderBy(col("c_nationkey"))
    }),

    // WITH RECURSIVE (nodeRecursiveunion.c): reachability over a synthetic
    // graph derived from nation — driver-side fixpoint loop; each level
    // anti-joins the visited set, unions, repeats until empty.
    "q_recursive_cte" -> ((s, dir) => {
      val edges = t(s, dir, "nation")
        .select(col("n_nationkey").as("src"),
                ((col("n_nationkey") * 7 + 3) % 25).as("dst"))
      var frontier = s.range(1).select(lit(0).cast("int").as("node"), lit(0).as("lvl"))
      var visited = frontier
      var iter = 0
      while (iter < 30 && !frontier.isEmpty) {
        val next = frontier.join(edges, col("node") === col("src"))
          .select(col("dst").cast("int").as("node"), (col("lvl") + 1).as("lvl"))
          .join(visited.select(col("node").as("seen")),
                col("node") === col("seen"), "left_anti")
          .groupBy(col("node")).agg(min(col("lvl")).as("lvl"))
        frontier = next.localCheckpoint()
        visited = visited.unionAll(frontier).localCheckpoint()
        iter += 1
      }
      visited.groupBy(col("node")).agg(min(col("lvl")).as("lvl"))
        .orderBy(col("node"))
    }),

    // contrib/tablefunc connectby() (`/root/reference/contrib/tablefunc/
    // tablefunc.c` build_tuplestore_recursively; regress
    // `contrib/tablefunc/expected/tablefunc.out:284-293`): hierarchical
    // expansion from a start key — root at level 0 with NULL parent and
    // branch = its own key, children extend the '~'-delimited branch
    // path. Hierarchy derived from part (keyid 2..80, parent = keyid div
    // 3, root 1 — acyclic by construction); driver-side BFS fixpoint
    // exactly like q_recursive_cte, one equi-join per level carrying
    // (parent, level, branch). Ordered by branch = the depth-first
    // presentation, deterministic in both engines.
    "q_connectby" -> ((s, dir) => {
      val edges = t(s, dir, "part")
        .filter(col("p_partkey").between(2, 80))
        .select(col("p_partkey").cast("int").as("k"),
                expr("CAST(p_partkey div 3 AS INT)").as("pk"))
      var frontier = s.range(1)
        .select(lit(1).as("keyid"), lit(null).cast("int").as("parent_keyid"),
                lit(0).as("level"), lit("1").as("branch"))
      var acc = frontier
      var iter = 0
      while (iter < 10 && !frontier.isEmpty) {
        val next = frontier
          .select(col("keyid").as("fk"), col("level"), col("branch"))
          .join(edges, col("fk") === col("pk"))
          .select(col("k").as("keyid"), col("fk").as("parent_keyid"),
                  (col("level") + 1).as("level"),
                  concat(col("branch"), lit("~"), col("k")).as("branch"))
        frontier = next.localCheckpoint()
        acc = acc.unionAll(frontier).localCheckpoint()
        iter += 1
      }
      acc.orderBy(col("branch"))
    }),

    // TABLESAMPLE (nodeSamplescan.c) — engine-specific RNG, so rows-only:
    // assert the sampled aggregate is present, no oracle.
    "q_sample_bernoulli" -> ((s, dir) => {
      t(s, dir, "lineitem").sample(withReplacement = false, 0.1, seed = 42)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // TABLESAMPLE SYSTEM_ROWS(n) (contrib/tsm_system_rows): EXACTLY n
    // rows regardless of table size — the contract rate-based sampling
    // cannot give. Deterministic form: the n smallest rows by the md5 of
    // the row key (the d_sample_mix hash-decision idiom as an ORDERING),
    // so the sample is reproducible across engines and parallelism and
    // plans as a bounded TakeOrderedAndProject — no global sort
    // materializes, no RNG. Summarized so the exact-n contract is
    // hash-checked alongside the content.
    "q_sample_system_rows" -> ((s, dir) => {
      val h = md5(concat(col("l_orderkey"), lit("-"), col("l_linenumber")))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity") * 1000000.0, 0).cast("long").as("q_u"),
          h.as("h"))
        .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"))
        .limit(100)
        .agg(count(lit(1)).as("n"),
             sum(col("q_u")).as("sum_q_u"),
             min(col("h")).as("h_min"),
             max(col("h")).as("h_max"),
             sum(col("l_orderkey")).as("key_sum"))
    }),

    // TidScan (`/root/reference/src/backend/executor/nodeTidscan.c:440`):
    // Postgres fetches tuples by physical address, ctid = (block, offset).
    // Parquet's physical tuple address is (file, row position), and Spark
    // exposes exactly that pair through the hidden `_metadata` struct
    // (`file_path`, `row_index`) — so WHERE ctid IN (...) maps to a scan
    // whose predicate is a per-file row_index IN-list. Scale shape:
    // `_metadata.file_path` equality is a METADATA filter — Catalyst
    // prunes non-matching files out of the FileIndex listing before any
    // I/O (at 100 TB a 10-tid fetch touches only the named files), and
    // row_index selects physical rows inside them without reading a key
    // column. Phase 1 harvests the tids of the 10 highest-value orders
    // (bounded TakeOrdered, 10-row collect — the same bounded-driver-state
    // idiom as the pfx lists); phase 2 re-fetches those rows BY TID ONLY
    // and outputs their business columns, which is what the oracle
    // hash-checks — a fetch that resolved tids to the wrong physical rows
    // would surface the wrong orders.
    "q_tid_scan" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val tids = orders
        .select(col("_metadata.file_path").as("fp"),
                col("_metadata.row_index").as("ri"),
                col("o_orderkey"), col("o_totalprice"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(10)
        .select(col("fp"), col("ri")).collect()
      val fetchPred = tids.groupBy(_.getString(0)).toSeq.sortBy(_._1)
        .map { case (fp, rows) =>
          col("_metadata.file_path") === fp &&
            col("_metadata.row_index").isin(rows.map(r => Long.box(r.getLong(1))): _*)
        }.reduce(_ || _)
      orders.filter(fetchPred)
        .select(col("o_orderkey"), col("o_custkey"),
                col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_orderkey"))
    }),

    // PIVOT (reference pivot.c / groupBy().pivot()).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .withColumnRenamed("F", "n_f").withColumnRenamed("O", "n_o")
        .orderBy(col("l_returnflag"))
    }),

    // contrib/tablefunc crosstab(source_sql, category_sql)
    // (`/root/reference/contrib/tablefunc/tablefunc.c:50-145`
    // get_crosstab_tuplestore): one output row per row_name, one column
    // per category from an EXPLICIT category list, each cell carrying
    // the FIRST value for that (row, category) in input order — not an
    // aggregate, which is what separates crosstab from PIVOT (q_pivot).
    // "First in input order" = min_by over the o_orderkey the reference
    // query would ORDER BY; absent categories stay NULL and n_cats
    // counts the filled cells (the reference's sparse-row behavior).
    "q_crosstab" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("row_name"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(min_by(col("o_totalprice"), col("o_orderkey")))
        .withColumnRenamed("F", "cat_f")
        .withColumnRenamed("O", "cat_o")
        .withColumnRenamed("P", "cat_p")
        .withColumn("n_cats",
          (col("cat_f").isNotNull.cast("int") +
           col("cat_o").isNotNull.cast("int") +
           col("cat_p").isNotNull.cast("int")))
        .orderBy(col("row_name"))
    }),

    // Unpivot / stack (reference: unnest of row values).
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(dsum(col("p_retailprice")).as("sum_price"),
             count(lit(1)).cast("double").as("n_parts"))
        .unpivot(Array(col("p_brand")),
                 Array(col("sum_price"), col("n_parts")),
                 "metric", "val")
        .orderBy(col("p_brand"), col("metric"))
    }),

    // generate_subscripts SRF (`/root/reference/src/backend/utils/adt/
    // arrayfuncs.c` generate_subscripts; sql/arrays.sql): subscripts of
    // per-order quantity arrays, forward and REVERSE (the reverse flag),
    // zipped with the element — posexplode is Spark's subscript
    // generator, checked against DuckDB's NATIVE generate_subscripts.
    "q_generate_subscripts" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") <= 100)
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_list(struct(col("l_linenumber"),
          col("l_quantity").cast("int").as("l_quantity")))).as("sq"))
        .select(col("l_orderkey"),
          expr("transform(sq, x -> x.l_quantity)").as("arr"))
        .select(col("l_orderkey"), size(col("arr")).as("n"),
          posexplode(col("arr")).as(Seq("pos0", "val")))
        .select(col("l_orderkey"),
          (col("pos0") + 1).as("subscript"),
          (col("n") - col("pos0")).as("rsubscript"),
          col("val"))
        .orderBy(col("l_orderkey"), col("subscript"))
    }),

    // normal_rand SRF (contrib/tablefunc/tablefunc.c normal_rand): the
    // reference draws from the backend PRNG; this engine's deterministic
    // discipline replaces the RNG with md5-derived uniforms and the
    // Irwin-Hall construction — z = (sum of 12 uniform[0,1] draws) - 6,
    // a classical N(0,1) approximation that stays EXACT in integer
    // micros (no Box-Muller ln/cos, whose last-ulp divergence across
    // engines would break the hash compare). value = mean + stddev*z,
    // staged in micros with truncating div mirrored on both engines.
    // Reproducible across engines, partitionings, and reruns — the same
    // md5-keyed determinism policy as d_sample_mix.
    "q_normal_rand" -> ((s, dir) => {
      def u(j: Int) = // uniform micros in [0, 1e6] from md5(i_j)
        expr("CAST(conv(substring(md5(concat(CAST(i AS STRING), '_', " +
          s"'$j')), 1, 6), 16, 10) AS BIGINT) % 1000001")
      s.range(1, 501).select(col("id").as("i"))
        .withColumn("z_u", (1 to 12).map(u).reduce(_ + _) - lit(6000000L))
        .withColumn("value",
          (lit(100000000L) + expr("(15000000 * z_u) div 1000000"))
            .cast("double") / 1000000.0)
        .select(col("i"), col("z_u"), col("value"))
        .orderBy(col("i"))
    }),

    // Logical-decoding change stream (contrib/test_decoding; replication/
    // logical/decode.c): two per-customer order snapshots over shifted
    // date windows diffed into the op-tagged I/U/D stream with
    // before/after images — unchanged keys omitted per the change-only
    // contract. [[graft.sources.Cdc]] holds the diff/replay pair; CdcSpec
    // proves replay(old, diff) == new. One full-outer key join; the
    // stream size tracks the change volume, not the table.
    "q_cdc_diff" -> ((s, dir) => {
      def snap(lo: String, hi: String): DataFrame =
        t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
                  col("o_orderdate") < lit(hi).cast("timestamp"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
               dsum(col("o_totalprice")).as("total"))
      graft.sources.Cdc.diff(
          snap("1995-01-01", "1998-01-01"),
          snap("1996-01-01", "1999-01-01"), Seq("o_custkey"))
        .orderBy(col("o_custkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT k, side, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS k, 'cust' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS k, 'supp' AS side FROM supplier)
        |GROUP BY k, side ORDER BY k, side""".stripMargin,

    "q_union_distinct" ->
      """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9900
        |UNION
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9900
        |ORDER BY k""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 2000
        |INTERSECT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 2000
        |ORDER BY k""".stripMargin,

    "q_intersect_all" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 45
        |  INTERSECT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.08)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
        |ORDER BY k""".stripMargin,

    "q_except_all" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 45
        |  EXCEPT ALL
        |  SELECT l_suppkey FROM lineitem WHERE l_quantity >= 48)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_merge_append" ->
      """SELECT key, bal FROM (
        |  SELECT c_custkey AS key, c_acctbal AS bal FROM customer WHERE c_nationkey <= 2
        |  UNION ALL
        |  SELECT s_suppkey + 1000000, s_acctbal FROM supplier WHERE s_nationkey <= 2)
        |ORDER BY bal DESC, key LIMIT 50""".stripMargin,

    "q_topk_global" ->
      """SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q_limit_with_ties" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    rank() OVER (ORDER BY l_quantity DESC) AS rnk
        |  FROM lineitem)
        |WHERE rnk <= 20 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_offset_limit" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey OFFSET 100 LIMIT 10""".stripMargin,

    "q_values_scan" ->
      """SELECT r_regionkey, r_name, label
        |FROM region JOIN (VALUES (0,'zero'),(1,'one'),(2,'two'),(3,'three')) v(rk, label)
        |ON r_regionkey = rk ORDER BY r_regionkey""".stripMargin,

    "q_generate_series" ->
      """SELECT CAST(m AS INT) AS m,
        |  CAST(make_date(1997, m, 1) AS DATE) AS month_start,
        |  CAST(date_diff('day', make_date(1997, m, 1),
        |       last_day(make_date(1997, m, 1))) + 1 AS INT) AS days_in_month
        |FROM (SELECT unnest(range(1, 13)) AS m) ORDER BY m""".stripMargin,

    "q_rows_from" ->
      """WITH d AS (SELECT o_orderkey,
        |    range(1, CAST(o_orderkey % 4 + 1 AS INT) + 1) AS l1,
        |    [x * x for x in range(1, CAST(o_orderkey % 3 + 1 AS INT) + 1)]
        |      AS l2
        |  FROM orders WHERE o_orderkey <= 30),
        |z AS (SELECT o_orderkey,
        |    unnest(list_zip(l1, l2)) AS p,
        |    unnest(range(1, greatest(len(l1), len(l2)) + 1)) AS o
        |  FROM d)
        |SELECT o_orderkey, CAST(o AS INT) AS ordinality,
        |  CAST(p[1] AS BIGINT) AS n, CAST(p[2] AS BIGINT) AS sq
        |FROM z ORDER BY o_orderkey, ordinality""".stripMargin,

    "q_date_series_explode" ->
      """SELECT r_regionkey, CAST(d AS DATE) AS d
        |FROM region, (SELECT unnest(generate_series(
        |  DATE '1997-01-01', DATE '1997-03-01', INTERVAL 1 MONTH)) AS d)
        |ORDER BY r_regionkey, d""".stripMargin,

    "q_cte_shared" ->
      """WITH per_nation AS (
        |  SELECT c_nationkey,
        |    ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), 4) AS avg_bal,
        |    COUNT(*) AS n
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, avg_bal, n FROM per_nation
        |WHERE avg_bal > (
        |  SELECT ROUND(CAST(SUM(CAST(avg_bal AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), 4)
        |  FROM per_nation)
        |ORDER BY c_nationkey""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE reach(node, lvl) AS (
        |  SELECT 0, 0
        |  UNION ALL
        |  SELECT e.dst, r.lvl + 1
        |  FROM reach r JOIN (
        |    SELECT n_nationkey AS src, (n_nationkey * 7 + 3) % 25 AS dst
        |    FROM nation) e
        |  ON r.node = e.src
        |  WHERE r.lvl < 30)
        |SELECT CAST(node AS INT) AS node, CAST(MIN(lvl) AS INT) AS lvl
        |FROM reach GROUP BY node ORDER BY node""".stripMargin,

    "q_connectby" ->
      """WITH RECURSIVE tree(keyid, parent_keyid, level, branch) AS (
        |  SELECT 1, CAST(NULL AS INT), 0, '1'
        |  UNION ALL
        |  SELECT e.k, t.keyid, t.level + 1,
        |         t.branch || '~' || CAST(e.k AS VARCHAR)
        |  FROM tree t JOIN (
        |    SELECT CAST(p_partkey AS INT) AS k,
        |           CAST(p_partkey // 3 AS INT) AS pk
        |    FROM part WHERE p_partkey BETWEEN 2 AND 80) e
        |  ON t.keyid = e.pk)
        |SELECT CAST(keyid AS INT) AS keyid,
        |  CAST(parent_keyid AS INT) AS parent_keyid,
        |  CAST(level AS INT) AS level, branch
        |FROM tree ORDER BY branch""".stripMargin,

    "q_sample_system_rows" ->
      """WITH s AS (SELECT l_orderkey, l_linenumber,
        |    CAST(round(l_quantity * 1000000.0, 0) AS BIGINT) AS q_u,
        |    md5(CAST(l_orderkey AS VARCHAR) || '-'
        |        || CAST(l_linenumber AS VARCHAR)) AS h
        |  FROM lineitem
        |  ORDER BY h, l_orderkey, l_linenumber LIMIT 100)
        |SELECT COUNT(*) AS n, CAST(SUM(q_u) AS BIGINT) AS sum_q_u,
        |  MIN(h) AS h_min, MAX(h) AS h_max,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
        |FROM s""".stripMargin,

    // tid-fetch round trip: the oracle states WHICH rows the tids must
    // resolve to (top-10 by price, orderkey tie-break); the Spark side
    // reaches them through the physical (file_path, row_index) address
    "q_tid_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // first-value-per-cell crosstab: arg_min = "first in the source
    // query's ORDER BY o_orderkey"; no float summation, so cells
    // compare exactly
    "q_crosstab" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS row_name,
        |    arg_min(o_totalprice, o_orderkey)
        |      FILTER (WHERE o_orderstatus = 'F') AS cat_f,
        |    arg_min(o_totalprice, o_orderkey)
        |      FILTER (WHERE o_orderstatus = 'O') AS cat_o,
        |    arg_min(o_totalprice, o_orderkey)
        |      FILTER (WHERE o_orderstatus = 'P') AS cat_p
        |  FROM orders GROUP BY 1)
        |SELECT row_name, cat_f, cat_o, cat_p,
        |  CAST((cat_f IS NOT NULL) AS INT) + CAST((cat_o IS NOT NULL) AS INT)
        |    + CAST((cat_p IS NOT NULL) AS INT) AS n_cats
        |FROM c ORDER BY row_name""".stripMargin,

    "q_unpivot" ->
      """WITH agg AS (
        |  SELECT p_brand,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
        |    CAST(COUNT(*) AS DOUBLE) AS n_parts
        |  FROM part GROUP BY p_brand)
        |SELECT p_brand, metric, val FROM (
        |  SELECT p_brand, 'sum_price' AS metric, sum_price AS val FROM agg
        |  UNION ALL
        |  SELECT p_brand, 'n_parts', n_parts FROM agg)
        |ORDER BY p_brand, metric""".stripMargin,

    // DuckDB's NATIVE generate_subscripts is the oracle's generator
    "q_generate_subscripts" ->
      """WITH a AS (
        |  SELECT l_orderkey,
        |    -- l_linenumber DUPLICATES within orders in this fixture:
        |    -- tie-break on the value, mirroring the struct sort
        |    list(CAST(l_quantity AS INT)
        |      ORDER BY l_linenumber, CAST(l_quantity AS INT)) AS arr
        |  FROM lineitem WHERE l_orderkey <= 100 GROUP BY l_orderkey),
        |g AS (SELECT l_orderkey, arr,
        |    generate_subscripts(arr, 1) AS s FROM a)
        |SELECT l_orderkey,
        |  CAST(s AS INT) AS subscript,
        |  CAST(len(arr) - s + 1 AS INT) AS rsubscript,
        |  arr[s] AS val
        |FROM g ORDER BY l_orderkey, subscript""".stripMargin,

    "q_normal_rand" -> {
      val terms = (1 to 12).map(j =>
        s"(CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '_' || '$j'), 1, 6) " +
          s"AS BIGINT) % 1000001)").mkString(" + ")
      s"""WITH g AS (SELECT unnest(range(1, 501)) AS i),
         |u AS (SELECT i, $terms - 6000000 AS z_u FROM g)
         |SELECT i, z_u,
         |  CAST(100000000 + (15000000 * z_u) // 1000000 AS DOUBLE)
         |    / 1000000.0 AS value
         |FROM u ORDER BY i""".stripMargin
    },

    "q_cdc_diff" ->
      s"""WITH v1 AS (
         |  SELECT o_custkey, COUNT(*) AS n_orders,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
         |    AND o_orderdate < TIMESTAMP '1998-01-01'
         |  GROUP BY o_custkey),
         |v2 AS (
         |  SELECT o_custkey, COUNT(*) AS n_orders,
         |    ${sqlDsum("o_totalprice")} AS total
         |  FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         |    AND o_orderdate < TIMESTAMP '1999-01-01'
         |  GROUP BY o_custkey),
         |j AS (
         |  SELECT COALESCE(v1.o_custkey, v2.o_custkey) AS o_custkey,
         |    CASE WHEN v1.o_custkey IS NULL THEN 'I'
         |         WHEN v2.o_custkey IS NULL THEN 'D'
         |         WHEN v1.n_orders IS DISTINCT FROM v2.n_orders
         |           OR v1.total IS DISTINCT FROM v2.total THEN 'U' END AS op,
         |    v1.n_orders AS old_n_orders, v2.n_orders AS new_n_orders,
         |    v1.total AS old_total, v2.total AS new_total
         |  FROM v1 FULL OUTER JOIN v2 ON v1.o_custkey = v2.o_custkey)
         |SELECT o_custkey, op, old_n_orders, new_n_orders, old_total,
         |  new_total
         |FROM j WHERE op IS NOT NULL ORDER BY o_custkey""".stripMargin
  )
}
