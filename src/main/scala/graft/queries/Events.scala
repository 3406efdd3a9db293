package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Time-series / event-stream queries over the `events` table.
  *
  * The reference has no streaming subsystem (SURVEY §2.10): its continuous
  * ingest is external tables + micro-batch loads
  * (`/root/reference/src/backend/access/external/url_execute.c`). These
  * queries give the equivalent batch semantics; `graft.streaming` runs the
  * same tumbling aggregation through Structured Streaming and the spec
  * asserts stream/batch parity.
  */
object Events extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling window via Spark's window() (struct start/end).
    "q_events_tumbling" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("hour_start"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    }),

    // Sliding window: each event counted in every overlapping 2h window
    // sliding by 1h.
    "q_events_sliding" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("w.start").as("win_start"), col("n"), col("sum_value"))
        .orderBy(col("win_start"))
    }),

    // Sessionization: per-user sessions split at >30min inactivity gaps
    // (lag + cumulative session counter), then per-session stats.
    "q_events_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
               unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             (unix_timestamp(max(col("ts"))) -
              unix_timestamp(min(col("ts")))).as("duration_s"),
             dsum(col("value")).as("session_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
             max(col("n_events")).as("max_session_events"),
             max(col("duration_s")).as("max_duration_s"))
        .orderBy(col("user_id"))
    }),

    // As-of style: value of the most recent prior purchase, carried
    // forward onto every later event of the same user.
    "q_events_asof_value" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "events")
        .filter(col("user_id") <= 30)
        .select(col("user_id"), col("event_id"), col("event_type"),
          last(when(col("event_type") === "purchase", col("value")),
               ignoreNulls = true).over(w).as("prior_purchase"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Native session windows (Structured Streaming's session_window works
    // in batch too): 30-min-gap sessions per user. The oracle derives the
    // same sessions with the lag+cumsum construction — two independent
    // definitions, one answer.
    "q_events_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
             max(col("n_events")).as("max_session_events"),
             dsum(col("session_value")).as("total_value"))
        .orderBy(col("user_id"))
    }),

    // DYNAMIC-gap session windows (session_window with an expression
    // gap — Spark's native form of the reference's adaptive
    // sessionization idiom): each event extends its session by a gap
    // that depends on the event itself (views cool off in 30 seconds,
    // clicks in 90, everything else holds the session 2 hours), sessions
    // merging while an event starts before the running max of member
    // ends. The oracle
    // reproduces exactly that interval-union semantics with the
    // gaps-and-islands window pattern (running MAX(ts+gap) over
    // preceding, island on ts >= max). Bounds compared as epoch MICROS
    // integers; session values micros-exact.
    "q_events_session_dynamic" -> ((s, dir) => {
      // gap spread calibrated so the fixture EXERCISES interval-union
      // merging: at sf0.01, 38 events merge only because an EARLIER
      // 2-hour window is still open while the immediately-preceding
      // short window has lapsed — a lag-based (previous-event-only)
      // sessionizer, or an oracle written with lag(end) instead of the
      // running MAX, diverges on every one of them
      val gap = when(col("event_type") === "view", lit("30 seconds"))
        .when(col("event_type") === "click", lit("90 seconds"))
        .otherwise(lit("2 hours"))
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("start_us"))
    }),

    // hstore-style MAP AGGREGATION (contrib/hstore + the hstore_agg
    // idiom): per user, the event-type histogram materialized AS A MAP
    // column (map_from_entries over sorted per-type counts) rendered
    // canonically, plus a point lookup into the aggregated map — the
    // "one row per entity, k/v attributes inside" modeling hstore
    // serves. One user-keyed shuffle with map-side count partials.
    "q_props_map_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type").as("k"), col("n").as("v"))))).as("m"))
        .select(col("user_id"),
          to_json(col("m")).as("hist_json"),
          element_at(col("m"), "purchase").as("n_purchase"),
          size(col("m")).as("n_types"))
        .orderBy(col("user_id"))
    }),

    // SCD Type 2 dimension history — the warehouse-modeling classic the
    // reference serves with UPDATE ... SET valid_to patterns
    // (tablecmds/DML; Kimball's slowly-changing dimension): each user's
    // purchase stream becomes versioned dimension rows with
    // [valid_from, valid_to) ranges via lead(), the open row flagged
    // current. One user-keyed shuffle + in-partition sort; epoch-micros
    // bounds so the compare is integer-exact.
    "q_scd2_history" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          round(col("value") * 1000000.0, 0).cast("long").as("value_u"),
          unix_micros(col("ts")).as("valid_from"))
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("valid_from"), col("event_id"))))
        .withColumn("is_current", col("valid_to").isNull)
        .withColumn("version", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))))
        .select(col("user_id"), col("version"), col("event_id"),
          col("value_u"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .orderBy(col("user_id"), col("version"))
    }),

    // Exponential smoothing (EWMA, alpha = 0.2) per user — the
    // time-series forecasting primitive (MADlib forecasting niche; no
    // window function expresses the recurrence without pow()):
    // e_t = 0.2 x_t + 0.8 e_{t-1}, every step a half-up integer-micros
    // division so the sequential fold is bit-identical in both engines.
    // Shape: one user-keyed shuffle collecting the ordered value list,
    // then a per-group in-memory fold — the sessionize contract (group
    // history must fit an executor; true at any SF for per-user data).
    // Per-user autocorrelation at lags 1..3 (the timeseries diagnostics
    // next to interpolate/EWMA in the reference's GP timeseries idiom;
    // MADlib's correlation niche): r_k = sum(d_t * d_{t+k}) / sum(d_t^2)
    // over mean-deviations d — a pure RATIONAL of the data, staged in
    // half-up micros with 128-bit products, so both engines emit
    // identical values (negative numerators mirror because both engines'
    // integer division truncates). One user-keyed shuffle: means join
    // back broadcast, lags are in-partition window leads, sums are
    // map-side partials.
    "q_autocorr" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 1000000.0, 0).cast("long").as("x_u"))
      val m = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("x_u").cast("decimal(38,0)")).as("sx"))
        .select(col("user_id"), col("n"),
          expr("(2 * sx + n) div (2 * CAST(n AS DECIMAL(38,0)))").as("m_u"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val d = ev.join(broadcast(m), "user_id")
        .withColumn("d0", col("x_u") - col("m_u"))
        .withColumn("d1", lead(col("d0"), 1).over(w))
        .withColumn("d2", lead(col("d0"), 2).over(w))
        .withColumn("d3", lead(col("d0"), 3).over(w))
      d.groupBy(col("user_id"), col("n"))
        .agg(sum((col("d0") * col("d0")).cast("decimal(38,0)")).as("den"),
             sum((col("d0") * col("d1")).cast("decimal(38,0)")).as("n1"),
             sum((col("d0") * col("d2")).cast("decimal(38,0)")).as("n2"),
             sum((col("d0") * col("d3")).cast("decimal(38,0)")).as("n3"))
        .select(col("user_id"), col("n"),
          expr("CAST((2 * (1000000 * n1) + den) div (2 * den) AS BIGINT)").as("acf1_u"),
          expr("CAST((2 * (1000000 * n2) + den) div (2 * den) AS BIGINT)").as("acf2_u"),
          expr("CAST((2 * (1000000 * n3) + den) div (2 * den) AS BIGINT)").as("acf3_u"))
        .orderBy(col("user_id"))
    }),

    "q_events_ewma" -> ((s, dir) => {
      val vU = round(col("value") * 1000000.0, 0).cast("long")
      val g = t(s, dir, "events")
        .select(col("user_id"), struct(col("ts"), col("event_id"),
          vU.as("v")).as("p"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .withColumn("vs", transform(col("ps"), p => p.getField("v")))
      g.select(col("user_id"),
          size(col("vs")).as("n_events"),
          aggregate(slice(col("vs"), lit(2), size(col("vs")) - 1),
            element_at(col("vs"), 1),
            (acc, x) => {
              // half-up micros: (2*(0.2x + 0.8acc) + 1) / 2 in micro
              // units. Column./ on longs is DOUBLE division, so integer
              // div is built as (n - n mod d) / d — the numerator is
              // exactly divisible and far below 2^53, making the double
              // division exact.
              val n = lit(2L) * (lit(200000L) * x + lit(800000L) * acc) +
                lit(1000000L)
              ((n - pmod(n, lit(2000000L))) / lit(2000000L)).cast("long")
            }).as("ewma_u"),
          array_max(col("vs")).as("max_v_u"))
        .orderBy(col("user_id"))
    }),

    // NATIVE as-of join — the custom AsofJoinExec physical operator
    // (plans/AsofJoin.scala: logical node + strategy + two-pointer
    // in-partition merge exec) planned through Catalyst with declared
    // distribution/ordering requirements, vs DuckDB's NATIVE ASOF LEFT
    // JOIN. Same semantics as the union-trick q_asof_tolerance — the
    // two formulations share an oracle, so the driver proves
    // emulation == native operator == DuckDB native, three-way.
    "q_asof_native" -> ((s, dir) => {
      val errors = t(s, dir, "events")
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("e_us"))
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("p_us"),
          col("value").as("p_value"))
      val gapUs = col("e_us") - col("p_us")
      graft.plans.AsofJoin(errors, purchases,
          Seq(("user_id", "p_user")), "e_us", "p_us")
        .select(col("user_id"), col("event_id"),
          when(gapUs <= 3600000000L, col("p_value")).as("asof_value_1h"),
          when(gapUs <= 3600000000L, (gapUs / 1000000L).cast("long")).as("gap_s"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Holt double exponential smoothing (level + trend; the forecasting
    // step past q_events_ewma's single-state recurrence — the GP
    // timeseries-idiom niche): alpha=0.2, beta=0.3, state (l, t) folded
    // over each user's ordered values as a 2-element array accumulator,
    // every division in mirrored TRUNCATING integer micros (both
    // engines' integer division truncates; the trend term goes negative,
    // so floor-style rounding would diverge). l' appears twice in the
    // recurrence and is inlined twice IDENTICALLY on both sides. The
    // one-step-ahead forecast is l + t. Same shape as EWMA: one
    // user-keyed shuffle, O(1) fold state.
    "q_holt_linear" -> ((s, dir) => {
      val vU = round(col("value") * 1000000.0, 0).cast("long")
      // truncating half-up-magnitude div: (2a + den) trunc-div (2 den);
      // Column./ on the exactly-divisible numerator is exact (< 2^53)
      def tdivH(a: Column, den: Long): Column = {
        val n = lit(2L) * a + lit(den)
        ((n - n % lit(2 * den)) / lit(2 * den)).cast("long")
      }
      def lNext(l: Column, t: Column, x: Column): Column =
        tdivH(lit(2L) * x + lit(8L) * (l + t), 10L)
      def tNext(l: Column, t: Column, x: Column): Column =
        tdivH(lit(3L) * (lNext(l, t, x) - l) + lit(7L) * t, 10L)
      val g = t(s, dir, "events")
        .select(col("user_id"), struct(col("ts"), col("event_id"),
          vU.as("v")).as("p"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .withColumn("vs", transform(col("ps"), p => p.getField("v")))
      g.select(col("user_id"), size(col("vs")).as("n_events"),
          aggregate(slice(col("vs"), lit(2), size(col("vs")) - 1),
            array(element_at(col("vs"), 1), lit(0L)),
            (acc, x) => {
              val l = element_at(acc, 1); val tr = element_at(acc, 2)
              array(lNext(l, tr, x), tNext(l, tr, x))
            }).as("st"))
        .select(col("user_id"), col("n_events"),
          element_at(col("st"), 1).as("level_u"),
          element_at(col("st"), 2).as("trend_u"),
          (element_at(col("st"), 1) + element_at(col("st"), 2)).as("forecast_u"))
        .orderBy(col("user_id"))
    }),

    // Two-table AS-OF join via the union trick (scale path: one shuffle
    // on user_id + one in-partition sort — never a range-join explosion).
    // For each 'error' event: value of the latest 'purchase' at-or-before
    // it. At equal ts the purchase sorts first (tag 0 < 1).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
                lit(0).as("tag"), col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"),
                lit(1).as("tag"), lit(null).cast("double").as("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionAll(errors)
        .withColumn("asof_value",
          last(when(col("tag") === 0, col("value")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("event_id"), col("asof_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // As-of join WITH TOLERANCE (pandas merge_asof tolerance; QuestDB
    // ASOF): the matched purchase must lie within 1 hour of the error,
    // else NULL. Same union trick — one shuffle on user_id, no range
    // join — checked against DuckDB's NATIVE ASOF LEFT JOIN.
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
                lit(0).as("tag"), col("value"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id"),
                lit(1).as("tag"), lit(null).cast("double").as("value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Carry (ts, value) of the matched purchase in ONE struct so both
      // fields always come from the SAME row — two independent
      // last(..., ignoreNulls) windows would diverge from native ASOF when
      // the latest purchase carries a NULL value (asof_ts would track the
      // latest row while asof_value fell back to an earlier one).
      val gapUs = unix_micros(col("ts")) -
        unix_micros(col("asof_row").getField("ts"))
      purchases.unionAll(errors)
        .withColumn("asof_row",
          last(when(col("tag") === 0, struct(col("ts"), col("value"))),
            ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("event_id"),
          when(gapUs <= 3600000000L, col("asof_row").getField("value"))
            .as("asof_value_1h"),
          when(gapUs <= 3600000000L,
            (gapUs / 1000000L).cast("long")).as("gap_s"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Aggregate FILTER clause as a WINDOW function (PG allows FILTER on
    // aggregates over windows; Spark doesn't — emulated with when(),
    // checked against DuckDB's NATIVE FILTER ... OVER).
    "q_window_filter_agg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").filter(col("user_id") <= 30)
        .select(col("user_id"), col("event_id"),
          count(when(col("event_type") === "click", 1)).over(w)
            .as("clicks_so_far"),
          sum(when(col("event_type") === "purchase", col("value")).cast(Dec))
            .over(w).cast("double").as("purchases_so_far"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Event funnel: users who did signup -> purchase in order.
    "q_events_funnel" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val firstSignup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      firstSignup.join(purchases,
          col("user_id") === col("p_user") && col("p_ts") > col("signup_ts"),
          "left")
        .groupBy(col("user_id"))
        .agg(count(col("p_ts")).as("purchases_after_signup"))
        .orderBy(col("user_id"))
    }),

    // Multi-touch LINEAR attribution (the marketing-analytics staple
    // the as-of join's single-nearest-touch is the degenerate case of):
    // each purchase's revenue splits EXACTLY across its clicks of the
    // preceding 24h — integer micros, base = rev div n per click, the
    // most recent click absorbs the remainder (rev - base*(n-1)), so
    // per-purchase attribution sums are conserved to the micro by
    // construction and the whole computation is order-free. Purchases
    // with no qualifying click are counted as orphans (unattributable
    // revenue). One user-keyed equi join + per-purchase windows.
    "q_events_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"),
          round(col("value") * 1000000.0, 0).cast("long").as("rev_u"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val pairs = purchases.join(clicks, Seq("user_id"))
        .filter(col("c_ts") < col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
      val wAll = Window.partitionBy(col("p_id"))
      val wOrd = wAll.orderBy(col("c_ts").desc, col("c_id"))
      val attr = pairs
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("attr_u", when(col("rk") === 1,
          col("rev_u") - expr("(rev_u div n) * (n - 1)"))
          .otherwise(expr("rev_u div n")))
      val agg = attr.groupBy(col("user_id"))
        .agg(countDistinct(col("p_id")).as("n_attr"),
             sum(col("attr_u")).as("attr_u"))
      val orphans = purchases
        .join(pairs.select(col("p_id")).distinct(), Seq("p_id"), "left_anti")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_orphan"), sum(col("rev_u")).as("orphan_u"))
      agg.join(orphans, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("n_attr"), lit(0L)).as("n_attr"),
          coalesce(col("attr_u"), lit(0L)).as("attr_u"),
          coalesce(col("n_orphan"), lit(0L)).as("n_orphan"),
          coalesce(col("orphan_u"), lit(0L)).as("orphan_u"))
        .orderBy(col("user_id"))
    }),

    // TIME-DECAY attribution — the weighted companion to the linear
    // split above, kept transcendental-free: a click's weight halves
    // every 6 hours of age (w = 1e6 >> (age_h div 6), exact integers —
    // no exp()), shares are floor((rev * w) / sum_w) with the most
    // recent click absorbing rev - sum(floors), so conservation holds
    // to the micro exactly like the linear lane. Same join shape.
    "q_events_attribution_decay" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          col("ts").as("p_ts"),
          round(col("value") * 1000000.0, 0).cast("long").as("rev_u"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
      val pairs = purchases.join(clicks, Seq("user_id"))
        .filter(col("c_ts") < col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
        .withColumn("age_h", expr(
          "(unix_micros(p_ts) - unix_micros(c_ts)) div 3600000000"))
        .withColumn("w", expr(
          "1000000 div shiftleft(1, cast(age_h div 6 AS INT))"))
      val wAll = Window.partitionBy(col("p_id"))
      val wOrd = wAll.orderBy(col("c_ts").desc, col("c_id"))
      pairs
        .withColumn("sw", sum(col("w")).over(wAll))
        .withColumn("f", expr("(rev_u * w) div sw"))
        .withColumn("fsum", sum(col("f")).over(wAll))
        .withColumn("rk", row_number().over(wOrd))
        .withColumn("attr_u", col("f") +
          when(col("rk") === 1, col("rev_u") - col("fsum")).otherwise(lit(0L)))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("p_id")).as("n_attr"),
             sum(col("attr_u")).as("attr_u"))
        .orderBy(col("user_id"))
    }),

    // Top event PATHS (the path-analysis staple next to the funnel
    // above): each user's full event sequence (ordered by (ts,
    // event_id) — unique, so the order is total), sliding 3-step
    // windows over it, global top-10 paths by occurrences with distinct
    // users alongside. Sequences build with one user-keyed shuffle
    // (collect_list + array_sort); the 3-gram explode is map-side and
    // the path-keyed count is vocabulary-bounded (#event_types^3).
    "q_events_paths" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("evs"))
        .select(col("user_id"),
          expr("transform(evs, x -> x.event_type)").as("seq"))
        .select(col("user_id"), explode(expr(
          "CASE WHEN size(seq) >= 3 THEN transform(sequence(1, size(seq) - 2), " +
            "i -> concat_ws('>', slice(seq, i, 3))) " +
            "ELSE CAST(array() AS ARRAY<STRING>) END")).as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"),
             countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n").desc, col("path")).limit(10)
    }),

    // Cohort retention (the warehouse-analytics staple): users bucketed
    // by first-activity week, distinct-user counts per weeks-since-cohort
    // offset. Both engines truncate weeks to Monday; offsets are exact
    // multiples of 7 days, so the integer division is lossless.
    "q_events_retention" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val cohort = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      val active = ev.select(col("user_id").as("u"),
          date_trunc("week", col("ts")).cast("date").as("week")).distinct()
      cohort.join(active, col("user_id") === col("u"))
        .withColumn("week_offset",
          expr("datediff(week, cohort_week) div 7").cast("int"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // Daily activity with zero-filled gaps: calendar spine cross user set,
    // left join actuals (reference interpolate.c gap-fill shape, step 1).
    "q_events_gapfill_zero" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("user_id") <= 10)
      val days = s.sql(
        """SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30',
          |  interval 1 day)) AS day""".stripMargin)
      val users = ev.select(col("user_id")).distinct()
      val actual = ev.groupBy(col("user_id").as("u"),
          col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      users.crossJoin(days)
        .join(actual, col("user_id") === col("u") && col("day") === col("d"), "left")
        .select(col("user_id"), col("day"),
                coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy(col("user_id"), col("day"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_events_tumbling" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_retention" ->
      """WITH c AS (SELECT user_id,
        |    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS week FROM events)
        |SELECT cohort_week,
        |  CAST((week - cohort_week) // 7 AS INT) AS week_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM c JOIN a ON c.user_id = a.user_id
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q_events_sliding" ->
      s"""WITH offs AS (SELECT unnest([0, 1]) AS o)
         |SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS win_start,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events, offs GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_sessionize" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR CAST(floor(epoch(ts)) AS BIGINT)
         |            - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM marked),
         |per_session AS (
         |  SELECT user_id, session_id, COUNT(*) AS n_events,
         |    CAST(floor(epoch(MAX(ts))) AS BIGINT)
         |      - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_s
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, COUNT(*) AS n_sessions,
         |  MAX(n_events) AS max_session_events,
         |  MAX(duration_s) AS max_duration_s
         |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_asof_value" ->
      """SELECT user_id, event_id, event_type,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchase
        |FROM events WHERE user_id <= 30
        |ORDER BY user_id, event_id""".stripMargin,

    // session_window sessions break when gap > 30min STRICTLY (next event
    // at exactly start+30min still merges); the lag construction mirrors
    // that with a µs-precision comparison.
    "q_events_session_window" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         |      THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, value,
         |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM marked),
         |per_session AS (
         |  SELECT user_id, session_id, COUNT(*) AS n_events,
         |    ${sqlDsum("value")} AS session_value
         |  FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, COUNT(*) AS n_sessions,
         |  MAX(n_events) AS max_session_events,
         |  ${sqlDsum("session_value")} AS total_value
         |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_props_map_agg" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type),
        |m AS (SELECT user_id,
        |    map(list(event_type ORDER BY event_type),
        |        list(n ORDER BY event_type)) AS m
        |  FROM c GROUP BY user_id)
        |SELECT user_id, to_json(m) AS hist_json,
        |  CAST(m['purchase'][1] AS BIGINT) AS n_purchase,
        |  CAST(cardinality(m) AS INT) AS n_types
        |FROM m ORDER BY user_id""".stripMargin,

    "q_scd2_history" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS INT) AS version,
        |  event_id,
        |  CAST(round(value * 1000000.0, 0) AS BIGINT) AS value_u,
        |  epoch_us(ts) AS valid_from,
        |  lead(epoch_us(ts)) OVER w AS valid_to,
        |  lead(epoch_us(ts)) OVER w IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY user_id, version""".stripMargin,

    "q_autocorr" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS x_u FROM events),
        |m AS (SELECT user_id, COUNT(*) AS n,
        |    (2 * SUM(CAST(x_u AS HUGEINT)) + COUNT(*))
        |      // (2 * CAST(COUNT(*) AS HUGEINT)) AS m_u
        |  FROM ev GROUP BY user_id),
        |d AS (SELECT ev.user_id, m.n, x_u - m_u AS d0,
        |    lead(x_u - m_u, 1) OVER w AS d1,
        |    lead(x_u - m_u, 2) OVER w AS d2,
        |    lead(x_u - m_u, 3) OVER w AS d3
        |  FROM ev JOIN m ON ev.user_id = m.user_id
        |  WINDOW w AS (PARTITION BY ev.user_id ORDER BY ts, event_id)),
        |a AS (SELECT user_id, n,
        |    SUM(d0 * d0) AS den, SUM(d0 * d1) AS n1,
        |    SUM(d0 * d2) AS n2, SUM(d0 * d3) AS n3
        |  FROM d GROUP BY user_id, n)
        |SELECT user_id, n,
        |  CAST((2 * (1000000 * n1) + den) // (2 * den) AS BIGINT) AS acf1_u,
        |  CAST((2 * (1000000 * n2) + den) // (2 * den) AS BIGINT) AS acf2_u,
        |  CAST((2 * (1000000 * n3) + den) // (2 * den) AS BIGINT) AS acf3_u
        |FROM a ORDER BY user_id""".stripMargin,

    "q_events_ewma" ->
      """WITH g AS (SELECT user_id,
        |    list(CAST(round(value * 1000000.0, 0) AS BIGINT)
        |         ORDER BY ts, event_id) AS vs
        |  FROM events GROUP BY user_id)
        |SELECT user_id,
        |  CAST(len(vs) AS INT) AS n_events,
        |  list_reduce(list_prepend(vs[1], vs[2:]),
        |    (acc, x) -> (2 * (200000 * x + 800000 * acc) + 1000000)
        |                // 2000000) AS ewma_u,
        |  list_max(vs) AS max_v_u
        |FROM g ORDER BY user_id""".stripMargin,

    "q_asof_native" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id,
        |  CASE WHEN date_diff('microsecond', p.ts, e.ts) <= 3600000000
        |    THEN p.value END AS asof_value_1h,
        |  CASE WHEN date_diff('microsecond', p.ts, e.ts) <= 3600000000
        |    THEN date_diff('microsecond', p.ts, e.ts) // 1000000 END AS gap_s
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |ORDER BY e.user_id, e.event_id""".stripMargin,

    "q_holt_linear" ->
      """WITH g AS (SELECT user_id,
        |    list(CAST(round(value * 1000000.0, 0) AS BIGINT)
        |         ORDER BY ts, event_id) AS vs
        |  FROM events GROUP BY user_id),
        |f AS (SELECT user_id, CAST(len(vs) AS INT) AS n_events,
        |    list_reduce(
        |      list_prepend([vs[1], CAST(0 AS BIGINT)],
        |                   [[x, CAST(0 AS BIGINT)] for x in vs[2:]]),
        |      (acc, p) -> [
        |        (2 * (2 * p[1] + 8 * (acc[1] + acc[2])) + 10) // 20,
        |        (2 * (3 * (((2 * (2 * p[1] + 8 * (acc[1] + acc[2])) + 10) // 20)
        |                   - acc[1])
        |           + 7 * acc[2]) + 10) // 20
        |      ]) AS st
        |  FROM g)
        |SELECT user_id, n_events, st[1] AS level_u, st[2] AS trend_u,
        |  st[1] + st[2] AS forecast_u
        |FROM f ORDER BY user_id""".stripMargin,

    "q_events_session_dynamic" ->
      s"""WITH r AS (SELECT user_id, event_id, value, epoch_us(ts) AS us,
         |    CASE WHEN event_type = 'view' THEN 30000000
         |         WHEN event_type = 'click' THEN 90000000
         |         ELSE CAST(7200 AS BIGINT) * 1000000 END AS gap_us
         |  FROM events),
         |p AS (SELECT user_id, event_id, value, us, us + gap_us AS end_us,
         |    MAX(us + gap_us) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
         |  FROM r),
         |i AS (SELECT user_id, value, us, end_us,
         |    SUM(CASE WHEN prev_max IS NULL OR us >= prev_max THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY us, event_id
         |        ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM p)
         |SELECT user_id, MIN(us) AS start_us, MAX(end_us) AS end_us,
         |  COUNT(*) AS n_events, ${sqlDsum("value")} AS session_value
         |FROM i GROUP BY user_id, sid
         |ORDER BY user_id, start_us""".stripMargin,

    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS tag, value FROM events
        |  WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS tag, NULL AS value FROM events
        |  WHERE event_type = 'error')
        |SELECT user_id, event_id,
        |  last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, tag, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
        |FROM u QUALIFY tag = 1
        |ORDER BY user_id, event_id""".stripMargin,

    // NATIVE ASOF LEFT JOIN in the oracle — the union-trick emulation must
    // reproduce DuckDB's dedicated operator exactly, tolerance applied on
    // the microsecond gap.
    "q_asof_tolerance" ->
      """WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE event_type = 'error')
        |SELECT e.user_id, e.event_id,
        |  CASE WHEN date_diff('microsecond', p.ts, e.ts) <= 3600000000
        |    THEN p.value END AS asof_value_1h,
        |  CASE WHEN date_diff('microsecond', p.ts, e.ts) <= 3600000000
        |    THEN date_diff('microsecond', p.ts, e.ts) // 1000000 END AS gap_s
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |ORDER BY e.user_id, e.event_id""".stripMargin,

    "q_window_filter_agg" ->
      """SELECT user_id, event_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') OVER w AS clicks_so_far,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6)))
        |    FILTER (WHERE event_type = 'purchase') OVER w AS DOUBLE)
        |    AS purchases_so_far
        |FROM events WHERE user_id <= 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q_events_funnel" ->
      """WITH fs AS (
        |  SELECT user_id, MIN(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT fs.user_id, COUNT(p.ts) AS purchases_after_signup
        |FROM fs LEFT JOIN (
        |  SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
        |ON fs.user_id = p.user_id AND p.ts > fs.signup_ts
        |GROUP BY fs.user_id ORDER BY fs.user_id""".stripMargin,

    "q_events_attribution_decay" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS rev_u
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS c_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.user_id, p.p_id, p.rev_u, c.c_id, c.c_ts,
        |    1000000 // (1 << CAST(
        |      ((epoch_us(p.p_ts) - epoch_us(c.c_ts)) // 3600000000) // 6
        |      AS INT)) AS w
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_ts < p.p_ts
        |    AND c.c_ts >= p.p_ts - INTERVAL 24 HOUR),
        |x AS (
        |  SELECT user_id, p_id, rev_u, c_id, c_ts, w,
        |    CAST(SUM(w) OVER (PARTITION BY p_id) AS BIGINT) AS sw,
        |    ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY c_ts DESC, c_id) AS rk
        |  FROM pairs),
        |y AS (
        |  SELECT user_id, p_id, rev_u, rk,
        |    (rev_u * w) // sw AS f,
        |    CAST(SUM((rev_u * w) // sw) OVER (PARTITION BY p_id)
        |      AS BIGINT) AS fsum
        |  FROM x),
        |a AS (
        |  SELECT user_id, p_id,
        |    f + CASE WHEN rk = 1 THEN rev_u - fsum ELSE 0 END AS attr_u
        |  FROM y)
        |SELECT user_id, COUNT(DISTINCT p_id) AS n_attr,
        |  CAST(SUM(attr_u) AS BIGINT) AS attr_u
        |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_attribution" ->
      """WITH p AS (
        |  SELECT user_id, event_id AS p_id, ts AS p_ts,
        |    CAST(round(value * 1000000.0, 0) AS BIGINT) AS rev_u
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, event_id AS c_id, ts AS c_ts
        |  FROM events WHERE event_type = 'click'),
        |pairs AS (
        |  SELECT p.user_id, p.p_id, p.rev_u, c.c_id, c.c_ts
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_ts < p.p_ts
        |    AND c.c_ts >= p.p_ts - INTERVAL 24 HOUR),
        |x AS (
        |  SELECT user_id, p_id, rev_u,
        |    COUNT(*) OVER (PARTITION BY p_id) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY p_id
        |      ORDER BY c_ts DESC, c_id) AS rk
        |  FROM pairs),
        |a AS (
        |  SELECT user_id, p_id,
        |    CASE WHEN rk = 1 THEN rev_u - (rev_u // n) * (n - 1)
        |         ELSE rev_u // n END AS attr_u
        |  FROM x),
        |agg AS (
        |  SELECT user_id, COUNT(DISTINCT p_id) AS n_attr,
        |    CAST(SUM(attr_u) AS BIGINT) AS attr_u
        |  FROM a GROUP BY user_id),
        |orph AS (
        |  SELECT user_id, COUNT(*) AS n_orphan,
        |    CAST(SUM(rev_u) AS BIGINT) AS orphan_u
        |  FROM p WHERE p_id NOT IN (SELECT p_id FROM pairs)
        |  GROUP BY user_id)
        |SELECT COALESCE(agg.user_id, orph.user_id) AS user_id,
        |  COALESCE(n_attr, 0) AS n_attr,
        |  COALESCE(attr_u, 0) AS attr_u,
        |  COALESCE(n_orphan, 0) AS n_orphan,
        |  COALESCE(orphan_u, 0) AS orphan_u
        |FROM agg FULL OUTER JOIN orph ON agg.user_id = orph.user_id
        |ORDER BY user_id""".stripMargin,

    "q_events_paths" ->
      """WITH s AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT user_id,
        |    unnest([array_to_string(seq[i : i + 2], '>')
        |            for i in range(1, len(seq) - 1)]) AS path
        |  FROM s WHERE len(seq) >= 3)
        |SELECT path, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM g GROUP BY path
        |ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "q_events_gapfill_zero" ->
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(
        |    DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS DATE) AS day),
        |users AS (SELECT DISTINCT user_id FROM events WHERE user_id <= 10),
        |actual AS (
        |  SELECT user_id AS u, CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events WHERE user_id <= 10 GROUP BY 1, 2)
        |SELECT user_id, day, COALESCE(n, 0) AS n_events
        |FROM users CROSS JOIN days
        |LEFT JOIN actual ON user_id = u AND day = d
        |ORDER BY user_id, day""".stripMargin
  )
}
