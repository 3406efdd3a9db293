package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Aggregators

/** Advanced surface: user-defined aggregates (CREATE AGGREGATE parity),
  * typed UDTFs (GP TableFunction / SCATTER BY), linear interpolation
  * gap-fill (`/root/reference/src/backend/utils/adt/interpolate.c:36`),
  * interval arithmetic incl. the GP interval-division idiom
  * (`src/test/regress/sql/timeseries.sql`), the GP `complex` type
  * (`src/backend/utils/adt/complex_type.c`), HLL sketches as first-class
  * mergeable values (`src/backend/utils/hyperloglog/gp_hyperloglog.c`),
  * hypothetical-set aggregates (`orderedsetaggs.c:557`), and AssertOp
  * runtime checks (`src/backend/executor/nodeAssertOp.c:70`).
  */
object Advanced extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Custom Aggregator: exact interpolated median (matches DuckDB's
    // median / percentile_cont 0.5 bit-for-bit after rounding).
    "q_udaf_median" -> ((s, dir) => {
      val med = udaf(Aggregators.ExactMedian)
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(round(med(col("c_acctbal")), 4).as("median_bal"),
             count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // Custom Aggregator: decimal-exact weighted average.
    "q_udaf_weighted_avg" -> ((s, dir) => {
      val wavg = udaf(Aggregators.WeightedAvg)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(wavg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Triggers + transition tables (commands/trigger.c; AFTER STATEMENT
    // bodies scan the captured change set via NamedTuplestoreScan,
    // nodeNamedtuplestorescan.c:23). Four DML statements against a
    // TriggeredTable: two INSERTs (BEFORE ROW suppression + rewrite fused
    // into the write plan; per-statement NEW TABLE capture → two distinct
    // audit rows), one UPDATE (OLD+NEW transition tables; the audit reads
    // the delta across them; a BEFORE UPDATE trigger re-derives vip), one
    // DELETE (OLD TABLE audit). Output = the audit trail the AFTER
    // STATEMENT triggers produced by running Spark aggregates OVER the
    // transition DataFrames, plus the final table state — the oracle
    // restates the whole flow declaratively, so a wrong suppression,
    // rewrite, capture scope, or delta hash-mismatches. Integer micros
    // throughout (exact across write/read).
    "q_trigger_transition" -> ((s, dir) => {
      import graft.sources.Triggers._
      val sp = s; import sp.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("trg").toString
      val path = s"$tmp/orders_t.parquet"
      val audit = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Long)]
      var stmt = 0
      def agg1(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)), coalesce(sum(col("price_u")), lit(0L)))
          .collect().head  // 1-row statement summary, bounded
        (r.getLong(0), r.getLong(1))
      }
      val tab = new TriggeredTable(s, path,
        beforeRow = Seq(
          BeforeRow("t0_reject_small", Set("INSERT"),
            suppress = Some(col("price_u") < 20000000000L)),
          BeforeRow("t1_vip", Set("INSERT"),
            set = Map("vip" -> (col("price_u") >= 300000000000L))),
          BeforeRow("t2_revip", Set("UPDATE"),
            set = Map("vip" -> (col("price_u") >= 300000000000L)))),
        afterStatement = Seq(
          AfterStatement("t9_audit", Set("INSERT", "UPDATE", "DELETE"),
            (event, oldTab, newTab) => {
              stmt += 1
              val (n, v) = (event, oldTab, newTab) match {
                case ("INSERT", _, Some(nt)) => agg1(nt)
                case ("UPDATE", Some(ot), Some(nt)) =>
                  val (nn, nv) = agg1(nt); val (_, ov) = agg1(ot)
                  (nn, nv - ov)            // statement-level net change
                case ("DELETE", Some(ot), _) => agg1(ot)
                case other => sys.error(s"transition matrix violated: $other")
              }
              audit += ((stmt, event, n, v))
            })))
      val base = t(s, dir, "orders").filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          split(col("o_orderpriority"), "-").getItem(1).as("prio"),
          round(col("o_totalprice") * 1000000.0, 0).cast("long").as("price_u"))
      tab.insert(base.filter(col("c") % 2 === 0))
      tab.insert(base.filter(col("c") % 2 === 1))
      tab.update(Map("price_u" -> (col("price_u") + 1000000L)),
                 col("prio") === "URGENT")
      tab.delete(col("price_u") >= 450000000000L)
      val fin = s.read.parquet(path)
      val Array(finN, finV) = fin
        .agg(count(lit(1)), sum(col("price_u"))).collect().head
        .toSeq.map(_.asInstanceOf[Long]).toArray
      val nVip = fin.filter(col("vip")).count()
      (audit.toSeq ++ Seq((5, "TABLE", finN, finV), (6, "TABLE_VIP", nVip, 0L)))
        .toDF("stmt", "event", "n", "v").orderBy(col("stmt"))
    }),

    // Typed UDTF over grouped input (GP TableFunction with SCATTER BY,
    // `nodeTableFunction.c:235` + `gram.y:16492`): groupByKey = the
    // scatter, flatMapGroups = the table function emitting 0..n rows.
    "q_udtf_scatter" -> ((s, dir) => {
      val sp = s; import sp.implicits._
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
        .as[(Int, String, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (nation: Int, rows: Iterator[(Int, String, Double)]) =>
          // emit one row per segment seen in the nation, with stats —
          // SINGLE STREAMING PASS over the group iterator: state is one
          // (count, sum) per segment (O(#segments), not O(rows)), so an
          // arbitrarily large scatter group never materializes.
          val acc = scala.collection.mutable.TreeMap.empty[String, (Long, BigDecimal)]
          rows.foreach { case (_, seg, bal) =>
            val (n, s0) = acc.getOrElse(seg, (0L, BigDecimal(0)))
            acc(seg) = (n + 1,
              s0 + BigDecimal(bal).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          }
          acc.iterator.map { case (seg, (n, sum)) =>
            (nation, seg, n.toInt,
             sum.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
        }
        .toDF("c_nationkey", "c_mktsegment", "n", "sum_bal")
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    // Linear interpolation gap-fill (interpolate.c): daily purchase value
    // per user on a calendar spine; missing days linearly interpolated
    // between the nearest known neighbors.
    "q_interpolate_linear" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .filter(col("user_id") <= 5 && col("event_type") === "purchase")
      val daily = ev.groupBy(col("user_id").as("u"),
          col("ts").cast("date").as("d"))
        .agg(dsum(col("value")).as("v"))
      val days = s.sql(
        """SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30',
          |  interval 1 day)) AS day""".stripMargin)
      val users = ev.select(col("user_id")).distinct()
      val spine = users.crossJoin(days)
        .join(daily, col("user_id") === col("u") && col("day") === col("d"), "left")
        .select(col("user_id"), col("day"), col("v"))
      val past = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val future = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(past))
        .withColumn("pd", last(when(col("v").isNotNull, col("day")),
          ignoreNulls = true).over(past))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(future))
        .withColumn("nd", first(when(col("v").isNotNull, col("day")),
          ignoreNulls = true).over(future))
        .select(col("user_id"), col("day"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") +
              (col("nv") - col("pv")) *
              datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double")), 6)
            .as("value_filled"),
          col("v").isNotNull.as("observed"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Interval arithmetic: date +/- intervals, scaled intervals, and the
    // GP timeseries interval-division idiom (delay / week).
    "q_interval_math" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"),
          (col("o_orderdate").cast("date") + expr("INTERVAL 45 DAY"))
            .cast("date").as("plus45d"),
          (col("o_orderdate").cast("date") - expr("INTERVAL 2 MONTH"))
            .cast("date").as("minus2m"),
          add_months(col("o_orderdate").cast("date"),
            (col("o_orderkey") % 4).cast("int")).as("scaled_months"),
          round(datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("double") / 7.0, 6)
            .as("weeks_to_2002"),
          (datediff(lit("2002-01-01").cast("date"),
            col("o_orderdate").cast("date")) % 7).as("rem_days"))
        .orderBy(col("o_orderkey"))
    }),

    // GP complex type (complex_type.c): struct(re, im) + arithmetic ops,
    // flattened to scalar outputs for comparison.
    "q_complex_ops" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          col("n_nationkey").cast("double").as("re1"),
          (col("n_regionkey") + 1).cast("double").as("im1"))
        .withColumn("re2", lit(3.0)).withColumn("im2", lit(-4.0))
        .select(col("n_nationkey"),
          (col("re1") + col("re2")).as("add_re"),
          (col("im1") + col("im2")).as("add_im"),
          (col("re1") * col("re2") - col("im1") * col("im2")).as("mul_re"),
          (col("re1") * col("im2") + col("im1") * col("re2")).as("mul_im"),
          round(sqrt(col("re1") * col("re1") + col("im1") * col("im1")), 6)
            .as("abs1"),
          col("im1").unary_-.as("conj_im"),
          round(atan2(col("im1"), col("re1")), 6).as("arg1"))
        .orderBy(col("n_nationkey"))
    }),

    // Hypothetical-set aggregate rank(v) WITHIN GROUP (orderedsetaggs.c):
    // the rank the value WOULD take = 1 + count of smaller values.
    "q_hypothetical_rank" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      cust.groupBy(col("c_mktsegment"))
        .agg((sum(when(col("c_acctbal") < 5000.0, 1).otherwise(0)) + 1)
               .as("hyp_rank_5000"),
             (sum(when(col("c_acctbal") <= 5000.0, 1).otherwise(0)) + 1)
               .as("hyp_dense_ub"),
             count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // Parameterized hypothetical-set aggregates (orderedsetaggs.c:557):
    // rank/dense_rank/percent_rank/cume_dist(v1, v2) WITHIN GROUP
    // (ORDER BY k1, k2) over an arbitrary MULTI-key ordering, via the
    // count-trick builder: rank = 1 + #rows lexicographically before the
    // hypothetical row; dense_rank counts DISTINCT key prefixes;
    // percent_rank = before/N; cume_dist = (beforeOrEqual+1)/(N+1).
    // One aggregation pass, no window, no sort.
    "q_hypothetical_set2" -> ((s, dir) => {
      val keys: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] =
        Seq(col("c_acctbal") -> lit(5000.0), col("c_custkey") -> lit(1000L))
      // lexicographic "strictly before" / "before or equal" predicates
      def lexBefore(ks: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)],
                    orEqual: Boolean): org.apache.spark.sql.Column =
        ks match {
          case Seq((a, v)) => if (orEqual) a <= v else a < v
          case (a, v) +: rest =>
            (a < v) || (a === v && lexBefore(rest, orEqual))
        }
      val strictly = lexBefore(keys, orEqual = false)
      val upTo = lexBefore(keys, orEqual = true)
      t(s, dir, "customer").groupBy(col("c_mktsegment"))
        .agg((sum(when(strictly, 1).otherwise(0)) + 1).as("hyp_rank"),
             (countDistinct(when(strictly,
                struct(keys.map(_._1): _*))) + 1).as("hyp_drank"),
             round(sum(when(strictly, 1).otherwise(0)).cast("double") /
                   count(lit(1)), 6).as("hyp_prank"),
             round((sum(when(upTo, 1).otherwise(0)) + 1).cast("double") /
                   (count(lit(1)) + 1), 6).as("hyp_cume"),
             count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // HLL sketch as a first-class mergeable value (gp_hyperloglog):
    // per-nation sketches merged up to a region estimate. Sketch bits are
    // engine-specific -> rows-only check; the test suite asserts the
    // estimate lands within the sketch's error bound of the exact count.
    "q_hll_sketch_merge" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      val perNation = cust.join(broadcast(nation),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(hll_sketch_agg(col("c_custkey")).as("sk"))
      perNation.groupBy(col("n_regionkey"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_customers"),
             count(lit(1)).as("n_nations"))
        .orderBy(col("n_regionkey"))
    }),

    // AssertOp (nodeAssertOp.c): runtime row-level invariant; violations
    // raise, valid rows pass through. Asserts the orders/customer FK here.
    // raise_error inside when() keeps the check fully codegen'd (no typed
    // Dataset.map deserialization in the hot path). The aggregate counts
    // the GUARDED column itself so column pruning cannot drop the check
    // (count(lit(1)) would let Catalyst delete the whole CASE); on valid
    // data the guarded value is never null, so the count is identical.
    "q_assert_op" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"), "left")
        .select(when(col("c_custkey").isNull,
            raise_error(concat(lit("assert violated: order "),
              col("o_orderkey"), lit(" has no customer"))))
          .otherwise(col("o_orderkey")).as("o_orderkey"))
        .agg(count(col("o_orderkey")).as("n_orders_with_customer"))
    }),

    // In-database ML: closed-form 2-feature linear regression fit per
    // group (the MADlib-on-Greenplum niche the reference serves via
    // gpcontrib — `madlib.linregr_train` reduces to exactly these normal
    // equations). One aggregation pass accumulates the 9 exact moment
    // sums (products scaled 1e4 -> BIGINT, order-independent), then
    // Cramer's rule solves [a, b1, b2] in double with the op order
    // mirrored token-for-token in the oracle — bit-deterministic, no
    // iterative solver. 100 TB shape: one partial+final agg, 9 longs of
    // state per group, solve is per-group O(1).
    // SKYLINE (Pareto frontier) — the classic "interesting points"
    // operator relational engines lack natively (Börzsönyi et al.'s
    // SKYLINE OF): per return flag, the (price, quantity) pairs no other
    // row dominates (<= on both, < on one), minimizing both. The 2-D
    // O(n log n) shape: collapse to per-price minima, then one ordered
    // window pass keeps a price's minimum iff it beats the running
    // minimum of all strictly-cheaper prices — no self-join, no
    // quadratic dominance test; one grouped pass plus one window pass.
    "q_skyline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val perPrice = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(min(col("l_quantity")).as("minq"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      perPrice
        .withColumn("prior", min(col("minq")).over(w))
        .filter(col("prior").isNull || col("minq") < col("prior"))
        .select(col("l_returnflag"), col("l_extendedprice").as("price"),
                col("minq").as("qty"))
        .orderBy(col("l_returnflag"), col("price"))
    }),

    // Benford first-digit audit — the classic data-quality / fraud
    // screen: the first significant digit of order totals against
    // Benford's log10(1+1/d) expectation. Digits come from integer
    // CENTS rendered as strings (identical in both engines — no double
    // formatting in play); observed fractions are half-up micros; the
    // Benford constants are Scala-computed double literals embedded in
    // both plan and oracle (the hyperplane-literal pattern), rounded to
    // micros once.
    "q_benford_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val benfordU: Map[Int, Long] = (1 to 9).map(d =>
        d -> math.rint(math.log10(1.0 + 1.0 / d) * 1e6).toLong).toMap
      val bCol = (1 to 9).foldLeft(lit(0L)) { (acc, d) =>
        when(col("digit") === d.toString, lit(benfordU(d))).otherwise(acc)
      }
      val wn = Window.partitionBy()
      t(s, dir, "orders")
        .select(substring(round(col("o_totalprice") * 100.0, 0)
          .cast("long").cast("string"), 1, 1).as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .withColumn("ntot", sum(col("n")).over(wn))
        .select(col("digit"), col("n"),
          expr("(2000000 * n + ntot) div (2 * ntot)").as("obs_u"),
          bCol.as("benford_u"))
        .withColumn("dev_u", abs(col("obs_u") - col("benford_u")))
        .orderBy(col("digit"))
    }),

    // Decision-stump split search — the per-node primitive of decision-
    // tree training (MADlib's tree module): for every (feature,
    // threshold) candidate, class counts per side and the Gini-weighted
    // impurity, all ratios of counts kept exact in half-up integer
    // micros. Binary target = label < 5; features = the first 4
    // embedding dims x a 5-point threshold grid. Shape: candidates
    // explode map-side (20 per row), counts shuffle ONCE on
    // (dim, threshold) with map-side partials — the classic
    // histogram-based split search.
    "q_decision_stump" -> ((s, dir) => {
      val thresholds = Seq(-0.2, -0.1, 0.0, 0.1, 0.2)
      val e = t(s, dir, "embeddings")
        .select((col("label") < 5).cast("int").as("clsA"),
          posexplode(slice(col("embedding").cast("array<double>"), 1, 4))
            .as(Seq("dim", "x")))
      val cand = e.select(col("dim"), col("clsA"), col("x"),
        explode(array(thresholds.map(lit(_)): _*)).as("thr"))
      val counts = cand.groupBy(col("dim"), col("thr"))
        .agg(
          sum(when(col("x") <= col("thr") && col("clsA") === 1, 1L)
            .otherwise(0L)).as("la"),
          sum(when(col("x") <= col("thr") && col("clsA") === 0, 1L)
            .otherwise(0L)).as("lb"),
          sum(when(col("x") > col("thr") && col("clsA") === 1, 1L)
            .otherwise(0L)).as("ra"),
          sum(when(col("x") > col("thr") && col("clsA") === 0, 1L)
            .otherwise(0L)).as("rb"))
      def gini(a: String, b: String): Column = {
        val ns = col(a) + col(b)
        when(ns === 0, 0L).otherwise(
          lit(1000000L) - expr(
            s"(2 * 1000000 * ($a * $a + $b * $b) + ($a + $b) * ($a + $b))" +
            s" div (2 * ($a + $b) * ($a + $b))"))
      }
      counts
        .withColumn("gl", gini("la", "lb"))
        .withColumn("gr", gini("ra", "rb"))
        .select(col("dim"),
          round(col("thr") * 1000000.0, 0).cast("long").as("thr_u"),
          (col("la") + col("lb")).as("n_left"),
          expr("(2 * ((la + lb) * gl + (ra + rb) * gr)" +
               " + (la + lb + ra + rb))" +
               " div (2 * (la + lb + ra + rb))").as("gini_u"))
        .orderBy(col("dim"), col("thr_u"))
    }),

    // Chi-squared independence test (MADlib's stats module; the
    // reference ecosystem's hypothesis-testing niche): lang x
    // length-bucket contingency table, expected counts e = r*c/n and
    // per-cell (o-e)^2/e terms — all ratios of counts, kept exact with
    // half-up integer micros via the algebraic form
    // (o*n - r*c)^2 / (n*r*c), so both engines emit identical cells and
    // an identical statistic. One grouped pass builds the table; the
    // marginals are window sums over the 10-row table itself. The micros
    // arithmetic runs in 128-bit integers (Spark DECIMAL(38,0) / DuckDB
    // HUGEINT) because the numerator carries (o*n - r*c)^2 <= n^4/16:
    // 64-bit wraps silently past ~50k rows, 128-bit is exact to n ~ 5e8
    // documents per contingency table (past that, the statistic belongs
    // in float anyway).
    "q_chi2_independence" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cells = t(s, dir, "documents")
        .withColumn("bucket",
          when(length(col("text")) > 400, "long").otherwise("short"))
        .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("o"))
      val wr = Window.partitionBy(col("lang"))
      val wc = Window.partitionBy(col("bucket"))
      val wn = Window.partitionBy()
      cells
        .withColumn("r", sum(col("o")).over(wr))
        .withColumn("c", sum(col("o")).over(wc))
        .withColumn("n", sum(col("o")).over(wn))
        .withColumn("wn", col("n").cast("decimal(38,0)"))
        .withColumn("wd",
          (col("o").cast("decimal(38,0)") * col("n") -
           col("r").cast("decimal(38,0)") * col("c")))
        .withColumn("wrc",
          col("n").cast("decimal(38,0)") * col("r") * col("c"))
        .select(col("lang"), col("bucket"), col("o"),
          expr("CAST((2000000 * CAST(r AS DECIMAL(38,0)) * c + n)" +
               " div (2 * wn) AS BIGINT)").as("e_u"),
          expr("CAST((2000000 * wd * wd + wrc)" +
               " div (2 * wrc) AS BIGINT)").as("term_u"))
        .withColumn("chi2_u", sum(col("term_u")).over(wn))
        .orderBy(col("lang"), col("bucket"))
    }),

    // In-database graph analytics: PAGERANK (MADlib's graph module is
    // the reference-ecosystem analogue, alongside the k-means niche the
    // ANN queries mirror). Synthetic deterministic 3-regular graph over
    // the documents (dst = (doc*31 + k*17) mod N, k=1..3); 3 power
    // iterations with damping 0.85, every division in half-up integer
    // MICROS so both engines produce bit-identical ranks. Scale shape:
    // ranks NEVER leave the executors — each iteration is one
    // edges-ranks equi-join plus one dst-keyed shuffle with map-side
    // partial sums (the Pregel/GraphX contract without the framework);
    // driver state is the node count, one long.
    "q_pagerank" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = rowCount(s, dir, "documents")
      val pr0 = (2L * 1000000L + n) / (2L * n)
      val base = (2L * 150000L + n) / (2L * n)
      val edges = docs.select(col("doc_id").as("src"), explode(array(
        (1 to 3).map(k => (col("doc_id") * 31 + k * 17) % n): _*)).as("dst"))
      var ranks = docs.select(col("doc_id"), lit(pr0).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = edges.join(ranks, col("src") === col("doc_id"))
          .select(col("dst"), expr("(2 * pr + 3) div 6").as("share"))
          .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
        ranks = docs.join(contrib, docs("doc_id") === contrib("dst"), "left")
          .select(docs("doc_id"),
            (lit(base) +
             expr("(2 * 85 * coalesce(inflow, 0) + 100) div 200")).as("pr"))
      }
      ranks.select(col("doc_id"), col("pr").as("pr_u"))
        .orderBy(col("pr_u").desc, col("doc_id"))
        .limit(20)
    }),

    // Single-source shortest paths / BFS over the same deterministic
    // 3-regular graph q_pagerank walks (MADlib graph_sssp niche): four
    // frontier-expansion rounds from doc 0, min-hop per reached node,
    // reported as the reachability histogram per distance. Scale shape:
    // each round is one edges-frontier equi-join plus one dst-keyed
    // min-aggregation — distances never leave the executors, rounds are
    // O(diameter) (the same Pregel contract as the CC labeler); the
    // oracle is an independently-written bounded recursive CTE, so the
    // compare also pins the iterative-join == transitive-closure
    // equivalence.
    "q_shortest_hops" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = rowCount(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("src"), explode(array(
        (1 to 3).map(k => (col("doc_id") * 31 + k * 17) % n): _*)).as("dst"))
      var dist = docs.filter(col("doc_id") === 0)
        .select(col("doc_id"), lit(0).as("d"))
      for (i <- 1 to 4) {
        val next = dist.join(edges, dist("doc_id") === edges("src"))
          .select(col("dst").as("doc_id"), lit(i).as("d"))
        dist = dist.union(next).groupBy(col("doc_id")).agg(min(col("d")).as("d"))
      }
      dist.groupBy(col("d"))
        .agg(count(lit(1)).as("n_docs"),
             min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("d"))
    }),

    // WEIGHTED single-source shortest paths (MADlib graph_sssp proper —
    // q_shortest_hops is its unit-weight case): deterministic integer
    // edge weights on the same 3-regular graph, 4 Bellman-Ford rounds
    // (relax-all + dst-keyed min), so a longer-hop cheaper path beats a
    // shorter-hop expensive one within the horizon. Same Pregel shape:
    // one frontier equi-join + one min aggregation per round, costs all
    // integer. The oracle enumerates bounded walks in a recursive CTE
    // and takes MIN(cost) — pinning iterative relaxation == bounded
    // walk closure.
    "q_shortest_cost" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = rowCount(s, dir, "documents")
      val edges = docs.select(col("doc_id").as("src"), explode(array(
          (1 to 3).map(k => (col("doc_id") * 31 + k * 17) % n): _*)).as("dst"))
        .withColumn("w", (col("src") * 7 + col("dst") * 13) % 100 + 1)
      var dist = docs.filter(col("doc_id") === 0)
        .select(col("doc_id"), lit(0L).as("cost"))
      for (_ <- 1 to 4) {
        val next = dist.join(edges, dist("doc_id") === edges("src"))
          .select(col("dst").as("doc_id"),
            (col("cost") + col("w")).as("cost"))
        dist = dist.union(next).groupBy(col("doc_id"))
          .agg(min(col("cost")).as("cost"))
      }
      dist.filter(col("doc_id") < 100).orderBy(col("doc_id"))
    }),

    // Triangle count + global clustering coefficient over the same
    // deterministic 3-regular graph (MADlib graph-measures niche,
    // completing the pagerank / SSSP / CC family). Canonical a<b
    // undirected edges; the ordered wedge join (a<b<c) counts each
    // triangle exactly once. Scale shape: the standard ordered-
    // orientation count — two edge-endpoint equi-joins whose
    // intermediate is the wedge set anchored at the LOWEST id (bounded
    // by per-node degree, never the adjacency cross product), plus one
    // narrow degree groupBy for the wedge denominator. Coefficient
    // 3T/W as half-up integer micros.
    "q_triangle_count" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = rowCount(s, dir, "documents")
      // The canonical edge list feeds FIVE consumers (e1/e2/e3 of the
      // wedge join, the degree groupBy, the edge count). Unmaterialized,
      // the planner replants the whole scan+explode+distinct subtree per
      // consumer (r20 before-plan: five `Scan parquet documents` leaves)
      // and AQE's exchange reuse only recovered three of them at runtime
      // (LaneProfile x10: two 32-task subtree stages, 4.3 + 3.1 s
      // executor-CPU). One checkpoint barrier (the Dedup.matNarrow
      // device: narrow (a, b) longs only) computes it once — guide §2.4,
      // same rationale as the minhash/simhash narrow fan-out points.
      val und = Dedup.matNarrow(
        docs.select(col("doc_id").as("src"), explode(array(
            (1 to 3).map(k => (col("doc_id") * 31 + k * 17) % n): _*)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
                greatest(col("src"), col("dst")).as("b"))
        .distinct())
      val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
      val wedges = deg.agg(sum(expr("d * (d - 1) div 2")).as("w"))
      val tri = und.as("e1")
        .join(und.as("e2"), col("e1.b") === col("e2.a"))
        .join(und.as("e3"),
          col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
        .agg(count(lit(1)).as("t"))
      tri.crossJoin(wedges).crossJoin(und.agg(count(lit(1)).as("n_edges")))
        .select(col("n_edges"), col("w").as("n_wedges"),
          col("t").as("triangles"),
          expr("(2 * 3000000 * t + w) div (2 * w)").as("clustering_u"))
    }),

    "q_linreg_fit" -> ((s, dir) => {
      // lsum128: the x1*y moment sums ~1.3e10 units/row over a per-flag
      // group — a long sum passes 2^63 near sf700, well inside the
      // design range (r17 overflow sweep)
      def s4(c: Column) =
        (lsum128(round(c * 10000.0, 0).cast("long")).cast("double") / 10000.0)
      val x1 = col("l_quantity"); val x2 = col("l_discount")
      val y = col("l_extendedprice")
      val m = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          s4(x1).as("sx1"), s4(x2).as("sx2"), s4(y).as("sy"),
          s4(x1 * x1).as("s11"), s4(x1 * x2).as("s12"),
          s4(x2 * x2).as("s22"), s4(x1 * y).as("s1y"), s4(x2 * y).as("s2y"))
      val det = expr(
        "n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2) " +
          "+ sx2 * (sx1 * s12 - s11 * sx2)")
      m.select(col("l_returnflag"), col("n").cast("long").as("n"),
          round(expr(
            "(sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y) " +
              "+ sx2 * (s1y * s12 - s11 * s2y))") / det, 4).as("intercept"),
          round(expr(
            "(n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2) " +
              "+ sx2 * (sx1 * s2y - s1y * sx2))") / det, 4).as("b_quantity"),
          round(expr(
            "(n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2) " +
              "+ sy * (sx1 * s12 - s11 * sx2))") / det, 4).as("b_discount"))
        .orderBy(col("l_returnflag"))
    })
  )

  /** One unrolled PageRank iteration over the same integer-micros
    * recurrence (share = pr/3 half-up, damped inflow + base). */
  private def prIterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT d.doc_id,
       |    (2 * 150000 + nn.n) // (2 * nn.n) +
       |    (2 * 85 * coalesce(x.inf, 0) + 100) // 200 AS pr
       |  FROM docs d CROSS JOIN nn LEFT JOIN (
       |    SELECT e.dst AS ddst, CAST(SUM((2 * r.pr + 3) // 6) AS BIGINT) AS inf
       |    FROM edges e JOIN $prev r ON e.src = r.doc_id
       |    GROUP BY e.dst) x ON d.doc_id = x.ddst)""".stripMargin

  /** The same Benford micros literals, rendered for the oracle CASE. */
  private def benfordCaseSql: String =
    (1 to 9).map(d => s"WHEN digit = '$d' THEN " +
        math.rint(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
      .mkString("CASE ", " ", " ELSE 0 END")

  val oracle: Map[String, String] = Map(
    "q_skyline" ->
      """WITH pp AS (SELECT l_returnflag, l_extendedprice AS price,
        |    MIN(l_quantity) AS minq
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, price, minq,
        |    MIN(minq) OVER (PARTITION BY l_returnflag ORDER BY price
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior
        |  FROM pp)
        |SELECT l_returnflag, price, minq AS qty
        |FROM r WHERE prior IS NULL OR minq < prior
        |ORDER BY l_returnflag, price""".stripMargin,

    "q_benford_audit" ->
      s"""WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice * 100.0, 0)
         |      AS BIGINT) AS VARCHAR), 1, 1) AS digit
         |  FROM orders),
         |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
         |m AS (SELECT digit, n,
         |    CAST(SUM(n) OVER () AS BIGINT) AS ntot FROM g)
         |SELECT digit, n,
         |  (2000000 * n + ntot) // (2 * ntot) AS obs_u,
         |  $benfordCaseSql AS benford_u,
         |  abs((2000000 * n + ntot) // (2 * ntot) - ($benfordCaseSql))
         |    AS dev_u
         |FROM m ORDER BY digit""".stripMargin,

    "q_decision_stump" ->
      """WITH e AS (SELECT CAST(label < 5 AS INT) AS clsA,
        |    CAST(i.i AS INT) AS dim, CAST(embedding[i.i + 1] AS DOUBLE) AS x
        |  FROM embeddings, (SELECT unnest(range(0, 4)) AS i) i),
        |cand AS (SELECT dim, clsA, x, t.thr
        |  FROM e, (SELECT unnest([-0.2, -0.1, 0.0, 0.1, 0.2]) AS thr) t),
        |counts AS (SELECT dim, thr,
        |    CAST(SUM(CASE WHEN x <= thr AND clsA = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS la,
        |    CAST(SUM(CASE WHEN x <= thr AND clsA = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS lb,
        |    CAST(SUM(CASE WHEN x > thr AND clsA = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ra,
        |    CAST(SUM(CASE WHEN x > thr AND clsA = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS rb
        |  FROM cand GROUP BY dim, thr),
        |g AS (SELECT dim, thr, la, lb, ra, rb,
        |    CASE WHEN la + lb = 0 THEN 0 ELSE 1000000 -
        |      (2 * 1000000 * (la * la + lb * lb) + (la + lb) * (la + lb))
        |        // (2 * (la + lb) * (la + lb)) END AS gl,
        |    CASE WHEN ra + rb = 0 THEN 0 ELSE 1000000 -
        |      (2 * 1000000 * (ra * ra + rb * rb) + (ra + rb) * (ra + rb))
        |        // (2 * (ra + rb) * (ra + rb)) END AS gr
        |  FROM counts)
        |SELECT dim, CAST(round(thr * 1000000.0, 0) AS BIGINT) AS thr_u,
        |  la + lb AS n_left,
        |  (2 * ((la + lb) * gl + (ra + rb) * gr) + (la + lb + ra + rb))
        |    // (2 * (la + lb + ra + rb)) AS gini_u
        |FROM g ORDER BY dim, thr_u""".stripMargin,

    "q_chi2_independence" ->
      """WITH cells AS (SELECT lang,
        |    CASE WHEN length(text) > 400 THEN 'long' ELSE 'short' END
        |      AS bucket,
        |    COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT lang, bucket, o,
        |    CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS r,
        |    CAST(SUM(o) OVER (PARTITION BY bucket) AS BIGINT) AS c,
        |    CAST(SUM(o) OVER () AS BIGINT) AS n
        |  FROM cells),
        |t AS (SELECT lang, bucket, o,
        |    CAST((2000000 * CAST(r AS HUGEINT) * c + n)
        |      // (2 * CAST(n AS HUGEINT)) AS BIGINT) AS e_u,
        |    CAST((2000000 * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |               * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
        |          + CAST(n AS HUGEINT) * r * c)
        |      // (2 * CAST(n AS HUGEINT) * r * c) AS BIGINT) AS term_u
        |  FROM m)
        |SELECT lang, bucket, o, e_u, term_u,
        |  CAST(SUM(term_u) OVER () AS BIGINT) AS chi2_u
        |FROM t ORDER BY lang, bucket""".stripMargin,

    "q_pagerank" ->
      s"""WITH docs AS (SELECT doc_id FROM documents),
         |nn AS (SELECT COUNT(*) AS n FROM docs),
         |edges AS (SELECT doc_id AS src,
         |    (doc_id * 31 + k.k * 17) % nn.n AS dst
         |  FROM docs CROSS JOIN nn,
         |       (SELECT unnest(range(1, 4)) AS k) k),
         |r0 AS (SELECT doc_id, (2 * 1000000 + nn.n) // (2 * nn.n) AS pr
         |  FROM docs CROSS JOIN nn),
         |${prIterSql("r0", "r1")},
         |${prIterSql("r1", "r2")},
         |${prIterSql("r2", "r3")}
         |SELECT doc_id, CAST(pr AS BIGINT) AS pr_u FROM r3
         |ORDER BY pr_u DESC, doc_id LIMIT 20""".stripMargin,

    // bounded-walk enumeration + MIN(cost): the closure form of the
    // Spark side's iterative relaxation
    "q_shortest_cost" ->
      """WITH RECURSIVE nn AS (SELECT COUNT(*) AS n FROM documents),
        |edges AS (
        |  SELECT doc_id AS src, (doc_id * 31 + k.k * 17) % nn.n AS dst
        |  FROM documents CROSS JOIN nn,
        |       (SELECT unnest(range(1, 4)) AS k) k),
        |e2 AS (SELECT src, dst, (src * 7 + dst * 13) % 100 + 1 AS w
        |  FROM edges),
        |walk(doc_id, cost, depth) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT e.dst, w.cost + e.w, w.depth + 1
        |  FROM walk w JOIN e2 e ON e.src = w.doc_id WHERE w.depth < 4)
        |SELECT doc_id, CAST(MIN(cost) AS BIGINT) AS cost
        |FROM walk WHERE doc_id < 100
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // independent transitive-closure derivation: path-enumerating
    // recursive CTE bounded at 4 hops, then MIN(d) per node — vs the
    // Spark side's iterative frontier joins
    "q_shortest_hops" ->
      """WITH RECURSIVE nn AS (SELECT COUNT(*) AS n FROM documents),
        |edges AS (SELECT doc_id AS src, (doc_id * 31 + k.k * 17) % nn.n AS dst
        |  FROM documents CROSS JOIN nn,
        |       (SELECT unnest(range(1, 4)) AS k) k),
        |bfs(doc_id, d) AS (
        |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS d
        |  UNION ALL
        |  SELECT e.dst, bfs.d + 1 FROM bfs JOIN edges e ON bfs.doc_id = e.src
        |  WHERE bfs.d < 4),
        |md AS (SELECT doc_id, MIN(d) AS d FROM bfs GROUP BY doc_id)
        |SELECT d, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc,
        |  MAX(doc_id) AS max_doc
        |FROM md GROUP BY d ORDER BY d""".stripMargin,

    "q_triangle_count" ->
      """WITH nn AS (SELECT COUNT(*) AS n FROM documents),
        |raw AS (SELECT doc_id AS src, (doc_id * 31 + k.k * 17) % nn.n AS dst
        |  FROM documents CROSS JOIN nn,
        |       (SELECT unnest(range(1, 4)) AS k) k),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |  FROM raw WHERE src <> dst),
        |deg AS (SELECT v, COUNT(*) AS d FROM (
        |    SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
        |  GROUP BY v),
        |wdg AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w FROM deg),
        |tri AS (SELECT COUNT(*) AS t FROM und e1
        |  JOIN und e2 ON e1.b = e2.a
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |ne AS (SELECT COUNT(*) AS n_edges FROM und)
        |SELECT ne.n_edges, wdg.w AS n_wedges, tri.t AS triangles,
        |  (2 * 3000000 * tri.t + wdg.w) // (2 * wdg.w) AS clustering_u
        |FROM ne, wdg, tri""".stripMargin,
    "q_udaf_median" ->
      """SELECT c_mktsegment,
        |  ROUND(median(c_acctbal), 4) AS median_bal, COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        |  ROUND(
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)) * CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE), 4) AS wavg_price,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // declarative restatement of the triggered DML flow: suppression =
    // WHERE NOT, BEFORE ROW rewrites = projected CASEs, per-statement
    // transition audits = aggregates over each statement's change set
    "q_trigger_transition" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_custkey AS c,
        |    split_part(o_orderpriority, '-', 2) AS prio,
        |    CAST(round(o_totalprice * 1000000.0, 0) AS BIGINT) AS price_u
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |ins AS (
        |  SELECT k, c, prio, price_u, price_u >= 300000000000 AS vip
        |  FROM base WHERE NOT (price_u < 20000000000)),
        |upd AS (
        |  SELECT k, c, prio,
        |    CASE WHEN prio = 'URGENT' THEN price_u + 1000000
        |         ELSE price_u END AS price_u,
        |    CASE WHEN prio = 'URGENT' THEN price_u + 1000000 >= 300000000000
        |         ELSE vip END AS vip
        |  FROM ins),
        |fin AS (SELECT * FROM upd WHERE NOT (price_u >= 450000000000)),
        |audit AS (
        |  SELECT 1 AS stmt, 'INSERT' AS event, COUNT(*) AS n,
        |    SUM(price_u) AS v FROM ins WHERE c % 2 = 0
        |  UNION ALL SELECT 2, 'INSERT', COUNT(*), SUM(price_u)
        |    FROM ins WHERE c % 2 = 1
        |  UNION ALL SELECT 3, 'UPDATE', COUNT(*), 1000000 * COUNT(*)
        |    FROM ins WHERE prio = 'URGENT'
        |  UNION ALL SELECT 4, 'DELETE', COUNT(*), SUM(price_u)
        |    FROM upd WHERE price_u >= 450000000000
        |  UNION ALL SELECT 5, 'TABLE', COUNT(*), SUM(price_u) FROM fin
        |  UNION ALL SELECT 6, 'TABLE_VIP',
        |    SUM(CASE WHEN vip THEN 1 ELSE 0 END), 0 FROM fin)
        |SELECT stmt, event, CAST(n AS BIGINT) AS n, CAST(v AS BIGINT) AS v
        |FROM audit ORDER BY stmt""".stripMargin,

    "q_udtf_scatter" ->
      """SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS INT) AS n,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_bal
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_interpolate_linear" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS v
        |  FROM events WHERE user_id <= 5 AND event_type = 'purchase'
        |  GROUP BY user_id, CAST(ts AS DATE)),
        |days AS (SELECT CAST(unnest(generate_series(
        |  DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day),
        |users AS (SELECT DISTINCT user_id FROM events
        |  WHERE user_id <= 5 AND event_type = 'purchase'),
        |spine AS (
        |  SELECT u.user_id, days.day, ev.v
        |  FROM users u CROSS JOIN days
        |  LEFT JOIN ev ON ev.user_id = u.user_id AND ev.d = days.day),
        |filled AS (
        |  SELECT user_id, day, v,
        |    last_value(v IGNORE NULLS) OVER past AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER past AS pd,
        |    first_value(v IGNORE NULLS) OVER future AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER future AS nd
        |  FROM spine
        |  WINDOW past AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  future AS (PARTITION BY user_id ORDER BY day
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  ROUND(CASE
        |    WHEN v IS NOT NULL THEN v
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv)
        |      * CAST(date_diff('day', pd, day) AS DOUBLE)
        |      / CAST(date_diff('day', pd, nd) AS DOUBLE) END, 6) AS value_filled,
        |  v IS NOT NULL AS observed
        |FROM filled ORDER BY user_id, day""".stripMargin,

    "q_interval_math" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus45d,
        |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH AS DATE) AS minus2m,
        |  CAST(CAST(o_orderdate AS DATE)
        |    + to_months(CAST(o_orderkey % 4 AS INT)) AS DATE) AS scaled_months,
        |  ROUND(CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS DOUBLE) / 7.0, 6) AS weeks_to_2002,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') % 7 AS INT) AS rem_days
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,

    "q_complex_ops" ->
      """SELECT n_nationkey,
        |  CAST(n_nationkey AS DOUBLE) + 3.0 AS add_re,
        |  CAST(n_regionkey + 1 AS DOUBLE) + (-4.0) AS add_im,
        |  CAST(n_nationkey AS DOUBLE) * 3.0 - CAST(n_regionkey + 1 AS DOUBLE) * (-4.0) AS mul_re,
        |  CAST(n_nationkey AS DOUBLE) * (-4.0) + CAST(n_regionkey + 1 AS DOUBLE) * 3.0 AS mul_im,
        |  ROUND(sqrt(CAST(n_nationkey AS DOUBLE) * n_nationkey
        |    + CAST(n_regionkey + 1 AS DOUBLE) * (n_regionkey + 1)), 6) AS abs1,
        |  -CAST(n_regionkey + 1 AS DOUBLE) AS conj_im,
        |  ROUND(atan2(CAST(n_regionkey + 1 AS DOUBLE), CAST(n_nationkey AS DOUBLE)), 6) AS arg1
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_hypothetical_rank" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN c_acctbal < 5000.0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS hyp_rank_5000,
        |  CAST(SUM(CASE WHEN c_acctbal <= 5000.0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS hyp_dense_ub,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // DuckDB 1.0 has no hypothetical-set aggregates either — the oracle
    // computes the same specification through its own aggregation engine
    // (an independent implementation, which is what the gate checks).
    "q_hypothetical_set2" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(CASE WHEN c_acctbal < 5000.0
        |      OR (c_acctbal = 5000.0 AND c_custkey < 1000)
        |    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS hyp_rank,
        |  COUNT(DISTINCT CASE WHEN c_acctbal < 5000.0
        |      OR (c_acctbal = 5000.0 AND c_custkey < 1000)
        |    THEN (c_acctbal, c_custkey) END) + 1 AS hyp_drank,
        |  ROUND(CAST(SUM(CASE WHEN c_acctbal < 5000.0
        |      OR (c_acctbal = 5000.0 AND c_custkey < 1000)
        |    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS hyp_prank,
        |  ROUND(CAST(SUM(CASE WHEN c_acctbal < 5000.0
        |      OR (c_acctbal = 5000.0 AND c_custkey <= 1000)
        |    THEN 1 ELSE 0 END) + 1 AS DOUBLE) / (COUNT(*) + 1), 6) AS hyp_cume,
        |  COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_assert_op" ->
      """SELECT COUNT(*) AS n_orders_with_customer
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    "q_linreg_fit" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(round(l_quantity * 10000.0, 0) AS BIGINT))
        |      AS DOUBLE) / 10000.0 AS sx1,
        |    CAST(SUM(CAST(round(l_discount * 10000.0, 0) AS BIGINT))
        |      AS DOUBLE) / 10000.0 AS sx2,
        |    CAST(SUM(CAST(round(l_extendedprice * 10000.0, 0) AS BIGINT))
        |      AS DOUBLE) / 10000.0 AS sy,
        |    CAST(SUM(CAST(round(l_quantity * l_quantity * 10000.0, 0)
        |      AS BIGINT)) AS DOUBLE) / 10000.0 AS s11,
        |    CAST(SUM(CAST(round(l_quantity * l_discount * 10000.0, 0)
        |      AS BIGINT)) AS DOUBLE) / 10000.0 AS s12,
        |    CAST(SUM(CAST(round(l_discount * l_discount * 10000.0, 0)
        |      AS BIGINT)) AS DOUBLE) / 10000.0 AS s22,
        |    CAST(SUM(CAST(round(l_quantity * l_extendedprice * 10000.0, 0)
        |      AS BIGINT)) AS DOUBLE) / 10000.0 AS s1y,
        |    CAST(SUM(CAST(round(l_discount * l_extendedprice * 10000.0, 0)
        |      AS BIGINT)) AS DOUBLE) / 10000.0 AS s2y
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  ROUND((sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y)
        |      + sx2 * (s1y * s12 - s11 * s2y)) /
        |    (n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)
        |      + sx2 * (sx1 * s12 - s11 * sx2)), 4) AS intercept,
        |  ROUND((n * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2)
        |      + sx2 * (sx1 * s2y - s1y * sx2)) /
        |    (n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)
        |      + sx2 * (sx1 * s12 - s11 * sx2)), 4) AS b_quantity,
        |  ROUND((n * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2)
        |      + sy * (sx1 * s12 - s11 * sx2)) /
        |    (n * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)
        |      + sx2 * (sx1 * s12 - s11 * sx2)), 4) AS b_discount
        |FROM m ORDER BY l_returnflag""".stripMargin
  )
}
