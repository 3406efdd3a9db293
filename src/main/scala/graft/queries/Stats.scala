package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Hypothesis-testing and iterative-ML surface — the MADlib stats/regress
  * modules of the reference ecosystem (MADlib-on-GP is the reference's
  * in-database analytics story; `q_chi2_independence` opened the niche,
  * these rows complete the classical-test family: Mann-Whitney U,
  * Kolmogorov-Smirnov, one-way ANOVA, Welch's t, and a gradient-descent
  * logistic-regression fit).
  *
  * Numeric discipline (repo-wide contract, Tables.scala scaladoc): every
  * statistic is exact integer micros — 128-bit (Spark DECIMAL(38,0) /
  * DuckDB HUGEINT) wherever squares of sums appear — with explicit
  * half-up rounding at each mirrored staging point, so both engines emit
  * bit-identical values. Signed integer division is safe to mirror
  * directly: Spark's `div` and DuckDB's integer `//` BOTH truncate
  * toward zero (verified: -7 // 2 = -3 in DuckDB for INT/BIGINT/HUGEINT;
  * `//` floors only for floats), so [[hup]]'s rounding is half-up toward
  * +inf for positive numerators and the same truncated convention on
  * both sides for negative ones (only the logistic gradients are signed,
  * and their driver-side fold replicates truncation explicitly).
  *
  * Scale shapes: the rank/ECDF tests first aggregate to a DISTINCT-VALUE
  * spine (2-decimal money-like doubles: <= ~49k distinct micros points
  * regardless of row count), so the only ordered window runs over that
  * bounded spine, never the raw rows; ANOVA/Welch are two-pass (means,
  * then deviations) with the k-row means broadcast back; the logistic
  * fit is MADlib's driver-loop shape — per iteration ONE whole-relation
  * aggregate (map-side partials) collapsing to two numbers of driver
  * state, the PageRank/IVF precedent.
  */
object Stats extends QueryModule {

  /** SQL fragment: truncating division, identical in Spark (`div`) and
    * DuckDB (integer `//`) for every sign combination. */
  private def sfdiv(a: String, b: String): String =
    s"((($a) div ($b)))"

  /** SQL fragment: round-half-up(a/b) = (2a+b) div (2b), b>0 (exact
    * half-up for a>=0; the same mirrored truncation either side of zero). */
  private def hup(a: String, b: String): String =
    sfdiv(s"2 * ($a) + ($b)", s"2 * ($b)")

  /** Two-sample scaffold: 'view' is sample 1, 'purchase' sample 2;
    * x_u = value in exact integer micros. */
  private def twoSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(round(col("value") * 1000000.0, 0).cast("long").as("x_u"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("g1"))

  /** Distinct-value spine with per-value and cumulative counts — the
    * bounded structure every rank/ECDF statistic reads.
    *
    * The cumulative sums are TWO-LEVEL: values hash into B range buckets
    * (width_bucket over the broadcast min/max), each bucket cumsums
    * independently under `Window.partitionBy(bkt)`, and the per-bucket
    * offsets come from a B×B triangular self-join — so there is NO
    * single-partition Exchange anywhere (asserted in PlanSpec), and the
    * spine stays parallel even if someone points these statistics at a
    * continuous column with millions of distinct values instead of the
    * documented ≤49k-point money domain. Answers are bit-identical to
    * the global-window formulation. */
  private def spine(two: DataFrame): DataFrame = {
    val B = 32
    val agg = two.groupBy(col("x_u"))
      .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("c1"))
    val bounds = agg.agg(min(col("x_u")).as("lo"), max(col("x_u")).as("hi"))
    // range bucket in [1, B]; decimal keeps (x-lo)*B exact at any scale
    val bucketed = agg.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        when(col("hi") === col("lo"), lit(1)).otherwise(
          least(lit(B),
            ((col("x_u") - col("lo")).cast("decimal(38,0)") * B /
             (col("hi") - col("lo") + 1).cast("decimal(38,0)")).cast("int") + 1)))
      .drop("lo", "hi")
    val w = Window.partitionBy(col("bkt")).orderBy(col("x_u"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("cum_l", sum(col("cnt")).over(w))
      .withColumn("cc1_l", sum(col("c1")).over(w))
    val btot = bucketed.groupBy(col("bkt"))
      .agg(sum(col("cnt")).as("t_cnt"), sum(col("c1")).as("t_c1"))
    val offs = btot.as("a")
      .join(btot.as("b"), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.t_cnt")), lit(0L)).as("off_cnt"),
           coalesce(sum(col("b.t_c1")), lit(0L)).as("off_c1"))
    local.join(broadcast(offs), "bkt")
      .select(col("x_u"), col("cnt"), col("c1"),
        (col("cum_l") + col("off_cnt")).as("cum"),
        (col("cc1_l") + col("off_c1")).as("cc1"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Mann-Whitney U (MADlib mann_whitney test; the rank-sum test).
    // Ranks are kept DOUBLED so tie midranks stay integral: a tie group
    // of size c starting at min-rank r has doubled midrank 2r + c - 1
    // = 2*cum - cnt + 1. R1_2x sums doubled ranks over sample 1 in
    // 128-bit; 2*U1 = R1_2x - n1(n1+1); U1 + U2 = n1*n2 (doubled: 2x).
    "q_mannwhitney_u" -> ((s, dir) => {
      spine(twoSample(s, dir))
        .withColumn("dm", lit(2) * col("cum") - col("cnt") + 1)
        .agg(sum(col("c1")).as("n1"),
             sum(col("cnt") - col("c1")).as("n2"),
             sum(col("c1").cast("decimal(38,0)") * col("dm")).as("r1w"))
        .withColumn("u1w", col("r1w") - col("n1").cast("decimal(38,0)") * (col("n1") + 1))
        .select(col("n1"), col("n2"),
          col("r1w").cast("long").as("r1_2x"),
          col("u1w").cast("long").as("u1_2x"),
          (lit(2) * col("n1") * col("n2") - col("u1w")).cast("long").as("u2_2x"),
          least(col("u1w"), lit(2) * col("n1") * col("n2") - col("u1w"))
            .cast("long").as("u_min_2x"))
    }),

    // Two-sample Kolmogorov-Smirnov (MADlib ks_test): D = max |F1 - F2|
    // kept EXACT by cross-multiplying both ECDFs onto the common
    // denominator n1*n2: d_scaled = max |cc1*n2 - cc2*n1| over the
    // spine, reported with the half-up micros quotient and the smallest
    // value attaining the maximum. No floats anywhere; the argmax window
    // runs over the same bounded spine as the cumulants.
    "q_ks_test" -> ((s, dir) => {
      // localCheckpoint: the spine is value-domain-bounded (<= ~49k rows),
      // and three consumers follow (totals, global max, final filter) —
      // materializing it once replaces three full event-scan lineages
      // (the q_recursive_cte pattern)
      val sp = spine(twoSample(s, dir)).withColumn("cc2", col("cum") - col("cc1"))
        .localCheckpoint()
      val tot = sp.agg(max(col("cc1")).as("n1"), max(col("cc2")).as("n2"))
      val diffed = sp.crossJoin(broadcast(tot))
        .withColumn("diff",
          abs(col("cc1").cast("decimal(38,0)") * col("n2") -
              col("cc2").cast("decimal(38,0)") * col("n1")))
      // global argmax WITHOUT a single-partition window: the max is a
      // parallel aggregate, broadcast back as a one-row frame
      val mx = diffed.agg(max(col("diff")).as("dmax"))
      diffed.crossJoin(broadcast(mx))
        .filter(col("diff") === col("dmax"))
        .groupBy(col("n1"), col("n2"))
        .agg(max(col("dmax")).cast("long").as("d_scaled"),
             min(col("x_u")).as("x_at_max"))
        .withColumn("nn", col("n1").cast("decimal(38,0)") * col("n2"))
        .select(col("n1"), col("n2"), col("d_scaled"), col("x_at_max"),
          expr(s"CAST(${hup("1000000 * CAST(d_scaled AS DECIMAL(38,0))", "nn")} AS BIGINT)")
            .as("d_u"))
    }),

    // One-way ANOVA F (MADlib one_way_anova) across all five event
    // types. Two passes: per-group n/sum -> half-up micro means, then
    // the k-row means BROADCAST back for exact 128-bit squared
    // deviations. SS columns are reported in whole squared units
    // (half-up of micros^2 / 1e12) so outputs fit BIGINT at any scale;
    // F in half-up micros. Group rows carry the (constant) F so the
    // output reads as the full ANOVA table.
    "q_anova_f" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 1000000.0, 0).cast("long").as("x_u"))
      val g = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_g"), sum(col("x_u").cast("decimal(38,0)")).as("s_g"))
        .withColumn("mean_g_u", expr(hup("s_g", "CAST(n_g AS DECIMAL(38,0))")))
      val tot = g.agg(sum(col("n_g")).as("n_tot"), sum(col("s_g")).as("s_tot"),
                      count(lit(1)).as("k"))
        .withColumn("mean_u", expr(hup("s_tot", "CAST(n_tot AS DECIMAL(38,0))")))
      val devs = ev
        .join(broadcast(g.select(col("event_type"), col("mean_g_u"))), "event_type")
        .withColumn("dev", col("x_u").cast("decimal(38,0)") - col("mean_g_u"))
        .groupBy(col("event_type"))
        .agg(sum(col("dev") * col("dev")).as("ssw_g"))
      val wAll = Window.partitionBy(lit(1))
      g.join(devs, "event_type").crossJoin(broadcast(tot))
        .withColumn("md", col("mean_g_u").cast("decimal(38,0)") - col("mean_u"))
        .withColumn("ssb_g", col("n_g").cast("decimal(38,0)") * col("md") * col("md"))
        .withColumn("ssb", sum(col("ssb_g")).over(wAll))
        .withColumn("ssw", sum(col("ssw_g")).over(wAll))
        .withColumn("fn", lit(1000000).cast("decimal(38,0)") * col("ssb") *
          (col("n_tot") - col("k")))
        .withColumn("fd", col("ssw") * (col("k") - 1))
        .select(col("event_type"), col("n_g"),
          col("mean_g_u").cast("long").as("mean_g_u"),
          expr(s"CAST(${hup("ssw_g", "CAST(1000000000000 AS DECIMAL(38,0))")} AS BIGINT)")
            .as("ssw_g_sq"),
          expr(s"CAST(${hup("ssb", "CAST(1000000000000 AS DECIMAL(38,0))")} AS BIGINT)")
            .as("ssb_sq"),
          expr(s"CAST(${hup("fn", "fd")} AS BIGINT)").as("f_u"))
        .orderBy(col("event_type"))
    }),

    // Welch's t (MADlib t_test_unpooled), reported as t^2 — a pure
    // RATIONAL of the data (no square root): staged half-up micros for
    // the sample variances s_i^2 = SSD_i/(n_i-1), the variance-of-mean
    // sum v = s1^2/n1 + s2^2/n2, then t^2 = (m1-m2)^2 / v. Every stage
    // is mirrored, so the statistic is bit-identical in both engines.
    "q_welch_t2" -> ((s, dir) => {
      val two = twoSample(s, dir)
        .withColumn("grp", when(col("g1") === 1, "view").otherwise("purchase"))
      val g = two.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("x_u").cast("decimal(38,0)")).as("sx"))
        .withColumn("m_u", expr(hup("sx", "CAST(n AS DECIMAL(38,0))")))
      val ssd = two.join(broadcast(g.select(col("grp"), col("m_u"))), "grp")
        .withColumn("dev", col("x_u").cast("decimal(38,0)") - col("m_u"))
        .groupBy(col("grp")).agg(sum(col("dev") * col("dev")).as("ssd"))
      g.join(ssd, "grp")
        .withColumn("s2_u", expr(hup("ssd", "CAST(n - 1 AS DECIMAL(38,0))")))
        .withColumn("vn_u", expr(hup("s2_u", "n")))
        .groupBy()
        .agg(max(when(col("grp") === "view", col("n"))).as("n1"),
             max(when(col("grp") === "purchase", col("n"))).as("n2"),
             max(when(col("grp") === "view", col("m_u"))).as("m1_u"),
             max(when(col("grp") === "purchase", col("m_u"))).as("m2_u"),
             sum(col("vn_u")).as("varsum_u"))
        .withColumn("dm",
          col("m1_u").cast("decimal(38,0)") - col("m2_u"))
        .withColumn("t2n", lit(1000000).cast("decimal(38,0)") * col("dm") * col("dm"))
        .select(col("n1"), col("n2"),
          col("m1_u").cast("long").as("m1_u"),
          col("m2_u").cast("long").as("m2_u"),
          col("varsum_u").cast("long").as("varsum_u"),
          expr(s"CAST(${hup("t2n", "CAST(varsum_u AS DECIMAL(38,0))")} AS BIGINT)")
            .as("t2_u"))
    }),

    // Median-absolute-deviation outlier gate (MADlib's robust-statistics
    // niche; the data-quality screen that survives heavy tails where
    // mean/stddev gates do not): per event type, median and MAD are kept
    // EXACT by doubling — median2 = x[k1] + x[k2] of the sorted multiset
    // (k1 = (n+1) div 2, k2 = n div 2 + 1, so odd n doubles the middle
    // element) and mad4 doubles again over the doubled deviations; the
    // 3-sigma-equivalent gate |x - med| > 3 MAD becomes the integer test
    // 2*dev2 > 3*mad4. Positional extraction reads the VALUE at a sorted
    // position, so tie order inside row_number cannot affect the result.
    // Two in-partition (type-keyed) rank passes; no global sort.
    "q_mad_outliers" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 1000000.0, 0).cast("long").as("x_u"))
      val nPer = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val w1 = Window.partitionBy(col("event_type")).orderBy(col("x_u"))
      val med2 = ev.withColumn("rk", row_number().over(w1))
        .join(broadcast(nPer), "event_type")
        .groupBy(col("event_type"), col("n"))
        .agg((sum(when(col("rk") === expr("(n + 1) div 2"), col("x_u"))) +
              sum(when(col("rk") === expr("n div 2 + 1"), col("x_u"))))
          .as("med2"))
      val dev = ev.join(broadcast(med2), "event_type")
        .withColumn("dev2", abs(lit(2) * col("x_u") - col("med2")))
      val w2 = Window.partitionBy(col("event_type")).orderBy(col("dev2"))
      val mad4 = dev.withColumn("rk", row_number().over(w2))
        .groupBy(col("event_type"), col("n"), col("med2"))
        .agg((sum(when(col("rk") === expr("(n + 1) div 2"), col("dev2"))) +
              sum(when(col("rk") === expr("n div 2 + 1"), col("dev2"))))
          .as("mad4"))
      dev.join(broadcast(mad4), Seq("event_type", "n", "med2"))
        .groupBy(col("event_type"), col("n"), col("med2"), col("mad4"))
        .agg(sum(when(lit(2) * col("dev2") > lit(3) * col("mad4"), 1L)
          .otherwise(0L)).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    // 2-D PCA (MADlib pca_train niche, closed form): features x = value
    // (micros), y = hour-of-day (micros). Covariance entries are staged
    // EXACTLY — two-pass means-then-deviations with 128-bit products,
    // half-up micros^2 over n-1 — and only the eigen step runs in
    // doubles: the 2x2 symmetric closed form needs one sqrt, and IEEE
    // sqrt (unlike ln/exp) is CORRECTLY ROUNDED in both engines, so the
    // mirrored expression is bit-deterministic before the final ROUND.
    // Shape: one global aggregate, 1-row stats broadcast back, second
    // aggregate; nothing ordered, nothing driver-side.
    "q_pca_2d" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(round(col("value") * 1000000.0, 0).cast("long").as("x_u"),
          (hour(col("ts")).cast("long") * 1000000L).as("y_u"))
      val m = ev.agg(count(lit(1)).as("n"),
        sum(col("x_u").cast("decimal(38,0)")).as("sx"),
        sum(col("y_u").cast("decimal(38,0)")).as("sy"))
        .select(col("n"), expr(hup("sx", "CAST(n AS DECIMAL(38,0))")).as("mx_u"),
          expr(hup("sy", "CAST(n AS DECIMAL(38,0))")).as("my_u"))
      val c = ev.crossJoin(broadcast(m))
        .withColumn("dx", col("x_u") - col("mx_u"))
        .withColumn("dy", col("y_u") - col("my_u"))
        .groupBy(col("n"), col("mx_u"), col("my_u"))
        .agg(sum((col("dx") * col("dx")).cast("decimal(38,0)")).as("sxx"),
             sum((col("dx") * col("dy")).cast("decimal(38,0)")).as("sxy"),
             sum((col("dy") * col("dy")).cast("decimal(38,0)")).as("syy"))
        .select(col("n"), col("mx_u"), col("my_u"),
          expr(s"CAST(${hup("sxx", "CAST(n - 1 AS DECIMAL(38,0))")} AS BIGINT)").as("cxx_u"),
          expr(s"CAST(${hup("sxy", "CAST(n - 1 AS DECIMAL(38,0))")} AS BIGINT)").as("cxy_u"),
          expr(s"CAST(${hup("syy", "CAST(n - 1 AS DECIMAL(38,0))")} AS BIGINT)").as("cyy_u"))
      c.select(col("n"), col("mx_u"), col("my_u"),
          col("cxx_u"), col("cxy_u"), col("cyy_u"),
          expr("""ROUND((CAST(cxx_u AS DOUBLE) / 1000000000000.0
                 + CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0
                 + sqrt(((CAST(cxx_u AS DOUBLE) / 1000000000000.0
                   - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
                   * ((CAST(cxx_u AS DOUBLE) / 1000000000000.0
                   - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
                   + (CAST(cxy_u AS DOUBLE) / 1000000000000.0)
                   * (CAST(cxy_u AS DOUBLE) / 1000000000000.0)), 6)""")
            .as("lam1"),
          expr("""ROUND((CAST(cxx_u AS DOUBLE) / 1000000000000.0
                 + CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0
                 - sqrt(((CAST(cxx_u AS DOUBLE) / 1000000000000.0
                   - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
                   * ((CAST(cxx_u AS DOUBLE) / 1000000000000.0
                   - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
                   + (CAST(cxy_u AS DOUBLE) / 1000000000000.0)
                   * (CAST(cxy_u AS DOUBLE) / 1000000000000.0)), 6)""")
            .as("lam2"))
    }),

    // Logistic regression by gradient descent (MADlib logregr_train, the
    // flagship of its regress module): y = (event_type = 'purchase'),
    // x = value/500 so x is in [0,1]; three unrolled iterations at
    // learning rate 4 from w = (0,0). The sigmoid is the EXACT-RATIONAL
    // surrogate sigma(z) = 1/2 + z/(2(1+|z|)) ("fast sigmoid"), so the
    // whole fit — like the linreg/IVF/PQ rows — is integer-exact and the
    // oracle unrolls the identical recurrence; a transcendental exp()
    // would put engine libm ulp differences inside an ITERATED fixpoint,
    // where they amplify instead of rounding away. Scale shape: each
    // iteration is ONE aggregate over the relation (map-side partials)
    // returning two numbers to the driver; weights re-enter the next
    // pass as literals (the PageRank/Lloyd precedent), and the relation
    // is persisted across the four passes.
    "q_logreg_gd" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(expr("CAST(round(value * 1000000.0, 0) AS BIGINT) div 500").as("x2_u"),
          when(col("event_type") === "purchase", 1000000L).otherwise(0L).as("y_u"))
        .persist()
      // z and the sigma residual as mirrored SQL fragments over
      // (x2_u, y_u, z_u); weights enter as interpolated literals
      def zF(w0: BigInt, w1: BigInt): String =
        s"($w0 + ${sfdiv(s"2 * ($w1) * x2_u + 1000000", "2 * 1000000")})"
      val resF: String =
        s"(y_u - (500000 + ${sfdiv("2 * (z_u) * 500000 + (1000000 + abs(z_u))",
                                   "2 * (1000000 + abs(z_u))")}))"
      // round-half-up(a/b) via the same TRUNCATING division both SQL
      // engines use (BigInt / truncates toward zero, like div and //)
      def h(a: BigInt, b: BigInt): BigInt = (2 * a + b) / (2 * b)
      var w0 = BigInt(0); var w1 = BigInt(0)
      for (_ <- 1 to 3) {
        val r = ev.withColumn("z_u", expr(zF(w0, w1)))
          .withColumn("res_u", expr(resF))
          .agg(sum(col("res_u").cast("decimal(38,0)")).as("sr"),
               sum((col("res_u") * col("x2_u")).cast("decimal(38,0)")).as("srx"),
               count(lit(1)).as("n")).first()
        val sr = BigInt(r.getDecimal(0).toBigInteger)
        val srx = BigInt(r.getDecimal(1).toBigInteger)
        val n = BigInt(r.getLong(2))
        w0 += 4 * h(sr, n)
        w1 += 4 * h(srx, n * 1000000)
      }
      val out = ev
        .withColumn("p_u", when(expr(zF(w0, w1)) > 0, 1000000L).otherwise(0L))
        .agg(count(lit(1)).as("n"),
             sum(when(col("p_u") === col("y_u"), 1L).otherwise(0L)).as("n_correct"),
             sum(when(col("p_u") === 1000000L, 1L).otherwise(0L)).as("n_pred_pos"))
        .select(lit(w0.toLong).as("w0_u"), lit(w1.toLong).as("w1_u"),
          col("n"), col("n_correct"), col("n_pred_pos"))
      ev.unpersist()
      out
    })
  )

  /** Shared two-sample + spine CTEs for the oracle (DuckDB windows over
    * the same distinct-value spine the Spark side builds). */
  private val sp2 =
    """WITH two AS (SELECT CAST(round(value * 1000000.0, 0) AS BIGINT) AS x_u,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g1
      |  FROM events WHERE event_type IN ('view', 'purchase')),
      |spine AS (SELECT x_u, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1,
      |    CAST(SUM(COUNT(*)) OVER (ORDER BY x_u) AS BIGINT) AS cum,
      |    CAST(SUM(SUM(g1)) OVER (ORDER BY x_u) AS BIGINT) AS cc1
      |  FROM two GROUP BY x_u)""".stripMargin

  /** One sigma/residual/gradient aggregation pass of the logreg oracle,
    * reading weights from CTE `prev` and emitting CTE `next` — the same
    * recurrence the Spark driver loop runs, as SQL text. */
  private def logregPass(prev: String, agg: String, next: String): String =
    s""",
       |$agg AS (SELECT
       |    SUM(y_u - (500000 + (2 * z_u * 500000 + (1000000 + ABS(z_u)))
       |      // (2 * (1000000 + ABS(z_u))))) AS sr,
       |    SUM((y_u - (500000 + (2 * z_u * 500000 + (1000000 + ABS(z_u)))
       |      // (2 * (1000000 + ABS(z_u))))) * x2_u) AS srx,
       |    COUNT(*) AS n
       |  FROM (SELECT y_u, x2_u,
       |      w0 + (2 * w1 * x2_u + 1000000) // (2 * 1000000) AS z_u
       |    FROM ev, $prev) _),
       |$next AS (SELECT w0 + 4 * ((2 * sr + n) // (2 * n)) AS w0,
       |    w1 + 4 * ((2 * srx + n * 1000000) // (2 * n * 1000000)) AS w1
       |  FROM $prev, $agg)""".stripMargin

  val oracle: Map[String, String] = Map(

    "q_mannwhitney_u" -> (sp2 +
      """,
        |dm AS (SELECT *, 2 * cum - cnt + 1 AS dm FROM spine),
        |a AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(cnt - c1) AS BIGINT) AS n2,
        |    SUM(CAST(c1 AS HUGEINT) * dm) AS r1w
        |  FROM dm),
        |u AS (SELECT *, r1w - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1w FROM a)
        |SELECT n1, n2, CAST(r1w AS BIGINT) AS r1_2x,
        |  CAST(u1w AS BIGINT) AS u1_2x,
        |  CAST(2 * CAST(n1 AS HUGEINT) * n2 - u1w AS BIGINT) AS u2_2x,
        |  CAST(LEAST(u1w, 2 * CAST(n1 AS HUGEINT) * n2 - u1w) AS BIGINT)
        |    AS u_min_2x
        |FROM u""".stripMargin),

    "q_ks_test" -> (sp2 +
      """,
        |sp AS (SELECT *, cum - cc1 AS cc2 FROM spine),
        |tot AS (SELECT MAX(cc1) AS n1, MAX(cc2) AS n2 FROM sp),
        |d AS (SELECT sp.x_u, tot.n1, tot.n2,
        |    abs(CAST(cc1 AS HUGEINT) * n2 - CAST(cc2 AS HUGEINT) * n1) AS diff
        |  FROM sp, tot),
        |mx AS (SELECT n1, n2, CAST(MAX(diff) AS BIGINT) AS d_scaled
        |  FROM d GROUP BY n1, n2)
        |SELECT mx.n1, mx.n2, mx.d_scaled,
        |  (SELECT MIN(x_u) FROM d WHERE d.diff = mx.d_scaled) AS x_at_max,
        |  CAST((2 * 1000000 * CAST(mx.d_scaled AS HUGEINT)
        |        + CAST(mx.n1 AS HUGEINT) * mx.n2)
        |    // (2 * CAST(mx.n1 AS HUGEINT) * mx.n2) AS BIGINT) AS d_u
        |FROM mx""".stripMargin),

    "q_anova_f" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS x_u FROM events),
        |g AS (SELECT event_type, COUNT(*) AS n_g,
        |    SUM(CAST(x_u AS HUGEINT)) AS s_g FROM ev GROUP BY event_type),
        |gm AS (SELECT *,
        |    (2 * s_g + n_g) // (2 * CAST(n_g AS HUGEINT)) AS mean_g_u FROM g),
        |tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot, COUNT(*) AS k,
        |    (2 * SUM(s_g) + SUM(n_g)) // (2 * CAST(SUM(n_g) AS HUGEINT)) AS mean_u
        |  FROM g),
        |devs AS (SELECT ev.event_type,
        |    SUM((CAST(x_u AS HUGEINT) - mean_g_u)
        |      * (CAST(x_u AS HUGEINT) - mean_g_u)) AS ssw_g
        |  FROM ev JOIN gm ON ev.event_type = gm.event_type
        |  GROUP BY ev.event_type),
        |r AS (SELECT gm.event_type, gm.n_g, gm.mean_g_u, devs.ssw_g,
        |    CAST(gm.n_g AS HUGEINT) * (gm.mean_g_u - tot.mean_u)
        |      * (gm.mean_g_u - tot.mean_u) AS ssb_g,
        |    tot.n_tot, tot.k
        |  FROM gm JOIN devs ON gm.event_type = devs.event_type, tot),
        |w AS (SELECT *, SUM(ssb_g) OVER () AS ssb, SUM(ssw_g) OVER () AS ssw
        |  FROM r)
        |SELECT event_type, n_g, CAST(mean_g_u AS BIGINT) AS mean_g_u,
        |  CAST((2 * ssw_g + 1000000000000)
        |    // (2 * CAST(1000000000000 AS HUGEINT)) AS BIGINT) AS ssw_g_sq,
        |  CAST((2 * ssb + 1000000000000)
        |    // (2 * CAST(1000000000000 AS HUGEINT)) AS BIGINT) AS ssb_sq,
        |  CAST((2 * 1000000 * ssb * (n_tot - k) + ssw * (k - 1))
        |    // (2 * ssw * (k - 1)) AS BIGINT) AS f_u
        |FROM w ORDER BY event_type""".stripMargin,

    "q_welch_t2" ->
      """WITH two AS (SELECT event_type AS grp,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS x_u
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |g AS (SELECT grp, COUNT(*) AS n, SUM(CAST(x_u AS HUGEINT)) AS sx
        |  FROM two GROUP BY grp),
        |gm AS (SELECT *, (2 * sx + n) // (2 * CAST(n AS HUGEINT)) AS m_u FROM g),
        |ssd AS (SELECT two.grp,
        |    SUM((CAST(x_u AS HUGEINT) - m_u) * (CAST(x_u AS HUGEINT) - m_u)) AS ssd
        |  FROM two JOIN gm ON two.grp = gm.grp GROUP BY two.grp),
        |j AS (SELECT gm.grp, gm.n, gm.m_u, ssd.ssd,
        |    (2 * ssd.ssd + (gm.n - 1)) // (2 * CAST(gm.n - 1 AS HUGEINT)) AS s2_u
        |  FROM gm JOIN ssd ON gm.grp = ssd.grp),
        |j2 AS (SELECT *, (2 * s2_u + n) // (2 * CAST(n AS HUGEINT)) AS vn_u FROM j),
        |p AS (SELECT
        |    MAX(CASE WHEN grp = 'view' THEN n END) AS n1,
        |    MAX(CASE WHEN grp = 'purchase' THEN n END) AS n2,
        |    MAX(CASE WHEN grp = 'view' THEN m_u END) AS m1_u,
        |    MAX(CASE WHEN grp = 'purchase' THEN m_u END) AS m2_u,
        |    SUM(vn_u) AS varsum_u
        |  FROM j2)
        |SELECT n1, n2, CAST(m1_u AS BIGINT) AS m1_u,
        |  CAST(m2_u AS BIGINT) AS m2_u, CAST(varsum_u AS BIGINT) AS varsum_u,
        |  CAST((2 * 1000000 * (m1_u - m2_u) * (m1_u - m2_u) + varsum_u)
        |    // (2 * CAST(varsum_u AS HUGEINT)) AS BIGINT) AS t2_u
        |FROM p""".stripMargin,

    "q_mad_outliers" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS x_u FROM events),
        |np AS (SELECT event_type, COUNT(*) AS n FROM ev GROUP BY event_type),
        |r1 AS (SELECT ev.event_type, np.n, x_u,
        |    row_number() OVER (PARTITION BY ev.event_type ORDER BY x_u) AS rk
        |  FROM ev JOIN np ON ev.event_type = np.event_type),
        |med AS (SELECT event_type, n,
        |    SUM(CASE WHEN rk = (n + 1) // 2 THEN x_u END)
        |      + SUM(CASE WHEN rk = n // 2 + 1 THEN x_u END) AS med2
        |  FROM r1 GROUP BY event_type, n),
        |dev AS (SELECT ev.event_type, med.n, med.med2,
        |    abs(2 * x_u - med2) AS dev2
        |  FROM ev JOIN med ON ev.event_type = med.event_type),
        |r2 AS (SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev2) AS rk
        |  FROM dev),
        |mad AS (SELECT event_type, n, med2,
        |    SUM(CASE WHEN rk = (n + 1) // 2 THEN dev2 END)
        |      + SUM(CASE WHEN rk = n // 2 + 1 THEN dev2 END) AS mad4
        |  FROM r2 GROUP BY event_type, n, med2)
        |SELECT dev.event_type, dev.n, CAST(dev.med2 AS BIGINT) AS med2,
        |  CAST(mad.mad4 AS BIGINT) AS mad4,
        |  CAST(SUM(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev JOIN mad ON dev.event_type = mad.event_type
        |GROUP BY dev.event_type, dev.n, dev.med2, mad.mad4
        |ORDER BY dev.event_type""".stripMargin,

    "q_pca_2d" ->
      """WITH ev AS (SELECT
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS x_u,
        |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) * 1000000 AS y_u
        |  FROM events),
        |m AS (SELECT COUNT(*) AS n,
        |    (2 * SUM(CAST(x_u AS HUGEINT)) + COUNT(*))
        |      // (2 * CAST(COUNT(*) AS HUGEINT)) AS mx_u,
        |    (2 * SUM(CAST(y_u AS HUGEINT)) + COUNT(*))
        |      // (2 * CAST(COUNT(*) AS HUGEINT)) AS my_u
        |  FROM ev),
        |d AS (SELECT n, mx_u, my_u, x_u - mx_u AS dx, y_u - my_u AS dy
        |  FROM ev, m),
        |c AS (SELECT n, CAST(mx_u AS BIGINT) AS mx_u,
        |    CAST(my_u AS BIGINT) AS my_u,
        |    CAST((2 * SUM(dx * dx) + (n - 1)) // (2 * CAST(n - 1 AS HUGEINT))
        |      AS BIGINT) AS cxx_u,
        |    CAST((2 * SUM(dx * dy) + (n - 1)) // (2 * CAST(n - 1 AS HUGEINT))
        |      AS BIGINT) AS cxy_u,
        |    CAST((2 * SUM(dy * dy) + (n - 1)) // (2 * CAST(n - 1 AS HUGEINT))
        |      AS BIGINT) AS cyy_u
        |  FROM d GROUP BY n, mx_u, my_u)
        |SELECT n, mx_u, my_u, cxx_u, cxy_u, cyy_u,
        |  ROUND((CAST(cxx_u AS DOUBLE) / 1000000000000.0
        |    + CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0
        |    + sqrt(((CAST(cxx_u AS DOUBLE) / 1000000000000.0
        |      - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
        |      * ((CAST(cxx_u AS DOUBLE) / 1000000000000.0
        |      - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
        |      + (CAST(cxy_u AS DOUBLE) / 1000000000000.0)
        |      * (CAST(cxy_u AS DOUBLE) / 1000000000000.0)), 6) AS lam1,
        |  ROUND((CAST(cxx_u AS DOUBLE) / 1000000000000.0
        |    + CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0
        |    - sqrt(((CAST(cxx_u AS DOUBLE) / 1000000000000.0
        |      - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
        |      * ((CAST(cxx_u AS DOUBLE) / 1000000000000.0
        |      - CAST(cyy_u AS DOUBLE) / 1000000000000.0) / 2.0)
        |      + (CAST(cxy_u AS DOUBLE) / 1000000000000.0)
        |      * (CAST(cxy_u AS DOUBLE) / 1000000000000.0)), 6) AS lam2
        |FROM c""".stripMargin,

    "q_logreg_gd" ->
      ("""WITH ev AS (SELECT
         |    CAST(round(value * 1000000.0, 0) AS BIGINT) // 500 AS x2_u,
         |    CASE WHEN event_type = 'purchase' THEN 1000000 ELSE 0 END AS y_u
         |  FROM events),
         |w0_ AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1)"""
        .stripMargin
        + logregPass("w0_", "a1", "w1_")
        + logregPass("w1_", "a2", "w2_")
        + logregPass("w2_", "a3", "w3_")
        + """,
          |pred AS (SELECT y_u,
          |    CASE WHEN w0 + (2 * w1 * x2_u + 1000000) // (2 * 1000000) > 0
          |      THEN 1000000 ELSE 0 END AS p_u
          |  FROM ev, w3_)
          |SELECT (SELECT CAST(w0 AS BIGINT) FROM w3_) AS w0_u,
          |  (SELECT CAST(w1 AS BIGINT) FROM w3_) AS w1_u,
          |  COUNT(*) AS n,
          |  CAST(SUM(CASE WHEN p_u = y_u THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_correct,
          |  CAST(SUM(CASE WHEN p_u = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_pred_pos
          |FROM pred""".stripMargin)
  )
}
