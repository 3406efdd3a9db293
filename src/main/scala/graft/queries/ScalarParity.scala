package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Round-2 per-function parity batch — the scalar families VERDICT r1
  * ranked as the biggest remaining surface gap:
  *
  *  - `to_char` numeric/datetime template engine
  *    (`/root/reference/src/backend/utils/adt/formatting.c:5995`) via the
  *    custom codegen expressions in [[graft.functions.ToChar]];
  *  - regex family (`src/backend/utils/adt/regexp.c:1503`):
  *    extract-all, global replace, count, class escapes, word boundaries;
  *  - string edge semantics (`varlena.c:5978`): split_part negative
  *    index, overlay, translate, left/right, trim-with-charset;
  *  - jsonpath / jsonb analogues (`jsonfuncs.c:5323`,
  *    `jsonpath_exec.c:2347`, grammar `jsonpath_gram.y`, tests
  *    `src/test/regress/sql/jsonb_jsonpath.sql`): nested/array path
  *    extraction, `jsonb_each` / `json_array_elements` via from_json +
  *    explode, key listing, containment, and the SQL/JSON path FILTER
  *    language subset (lax mode): `$.items[*] ? (@.x > n)` predicates
  *    (incl. conjunction, `exists(@.k)`, `$var` variables, and
  *    root-context `$.n` references), the `last` subscript, and the
  *    `.size()` / `.type()` item methods — filters compile to Catalyst
  *    higher-order `filter`/`transform` over a `from_json` struct array
  *    (codegen-friendly, fully distributed), `.type()` to Spark 4
  *    VariantType introspection (`schema_of_variant`).
  *
  * All plan-side built-ins or plan-time-compiled custom expressions — no
  * UDFs, whole-stage codegen intact throughout.
  */
object ScalarParity extends QueryModule {

  /** The same JSON document built character-identically in both engines
    * (the test tables carry only flat JSON, so nested/array paths are
    * exercised on a constructed doc). */
  private def jCol: Column = concat(
    lit("{\"id\": "), col("c_custkey"),
    lit(", \"seg\": \""), col("c_mktsegment"),
    lit("\", \"tags\": [\"t"), pmod(col("c_custkey"), lit(3)),
    lit("\", \"t"), pmod(col("c_custkey"), lit(5)),
    lit("\"], \"meta\": {\"nation\": "), col("c_nationkey"),
    lit(", \"vip\": "), (col("c_acctbal") > 5000).cast("string"), lit("}}"))

  private val jSql: String =
    """'{"id": ' || c_custkey || ', "seg": "' || c_mktsegment ||
      |'", "tags": ["t' || (c_custkey % 3) || '", "t' || (c_custkey % 5) ||
      |'"], "meta": {"nation": ' || c_nationkey ||
      |', "vip": ' || CAST(c_acctbal > 5000 AS VARCHAR) || '}}'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // to_char template engine: numeric 9/0/,/./FM/MI/PR + date tokens.
    "q_to_char_patterns" -> ((s, dir) => {
      graft.functions.ToChar.register(s)
      t(s, dir, "orders").filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          expr("to_char_num(o_totalprice, '999,999.00')").as("p_grouped"),
          expr("to_char_num(o_totalprice, 'FM999,999.00')").as("p_fm"),
          expr("to_char_num(o_totalprice, '0000000.00')").as("p_zero"),
          expr("to_char_num(-o_totalprice, '999,999.99MI')").as("p_mi"),
          expr("to_char_num(o_totalprice - 151000.0, '999,999.00PR')").as("p_pr"),
          expr("to_char_num(o_orderkey, 'FM9,999,999')").as("p_int"),
          expr("to_char_dt(o_orderdate, 'YYYY-MM-DD')").as("d_iso"),
          expr("to_char_dt(o_orderdate, 'DD Mon YYYY')").as("d_mon"),
          expr("to_char_dt(o_orderdate, 'Day')").as("d_day"),
          expr("to_char_dt(o_orderdate, 'Q-DDD')").as("d_qddd"))
        .orderBy(col("o_orderkey"))
    }),

    // to_char time-of-day tokens over real (non-midnight) timestamps.
    "q_to_char_time" -> ((s, dir) => {
      graft.functions.ToChar.register(s)
      t(s, dir, "events").filter(col("event_id") <= 500)
        .select(col("event_id"),
          expr("to_char_dt(ts, 'HH24:MI:SS')").as("t_hms"),
          expr("to_char_dt(ts, 'HH12 AM')").as("t_12"),
          expr("to_char_dt(ts, 'YYYY-MM-DD HH24:MI')").as("t_full"),
          expr("to_char_dt(ts, 'Dy DDD')").as("t_dy"))
        .orderBy(col("event_id"))
    }),

    // Regex family: extract-all, anchored groups, global replace, count,
    // alternation, \b word boundaries (Java regex here, RE2 in DuckDB —
    // the subset used is semantically identical).
    "q_regex_funcs" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          array_join(expr("regexp_extract_all(p_name, '[a-z]+', 0)"), ",")
            .as("words"),
          size(expr("regexp_extract_all(p_name, '[a-z]+', 0)")).as("n_words"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_brand"), "[0-9]+", "N").as("brand_norm"),
          expr("regexp_count(p_brand, '[0-9]')").cast("long").as("n_digits"),
          col("p_type").rlike("^(ECONOMY|SMALL)").as("is_cheap_small"),
          regexp_replace(col("p_name"), "\\bring\\b", "RING").as("ring_up"))
        .orderBy(col("p_partkey"))
    }),

    // String edge semantics: negative split_part, overlay, translate,
    // left/right, repeat, initcap, charset trim, starts/ends_with.
    "q_string_funcs3" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") <= 200)
        .select(col("c_custkey"),
          expr("split_part(c_name, '#', -1)").as("sp_last"),
          expr("split_part(c_name, '#', 1)").as("sp_first"),
          overlay(col("c_name"), lit("XXX"), lit(10), lit(3)).as("ovl"),
          translate(col("c_name"), "0123456789", "abcdefghij").as("tr"),
          concat(expr("left(c_name, 8)"), lit("|"),
                 expr("right(c_name, 3)")).as("lr"),
          repeat(col("c_mktsegment"), 2).as("rep"),
          initcap(lower(col("c_mktsegment"))).as("ini"),
          instr(col("c_name"), "#").cast("long").as("pos"),
          ascii(col("c_mktsegment")).cast("long").as("asc"),
          chr(lit(65) + pmod(col("c_custkey"), lit(26))).as("chr_"),
          expr("trim(BOTH 'Cuser#01' FROM c_name)").as("btr"),
          col("c_name").startsWith("Customer").as("sw"),
          col("c_name").endsWith("1").as("ew"))
        .orderBy(col("c_custkey"))
    }),

    // FILTER (WHERE ...) aggregates (PG aggref->aggfilter), exact
    // percentile_disc (first value with cume_dist >= p, = the
    // ceil(p*n)-th sorted element), bit aggregates, and ordered DISTINCT
    // array/string aggregation.
    "q_agg_filter_disc" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("count(1) FILTER (WHERE l_quantity > 30)").as("n_big"),
          expr(s"${graft.Tables.sqlDsum("l_extendedprice")}")
            .as("sum_all"), // exact micros sum, shared convention
          expr("""CAST(SUM(CAST(round(l_extendedprice * 1000000.0, 0) AS BIGINT))
                 |  FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 1000000.0"""
            .stripMargin).as("sum_discounted"),
          expr("""element_at(array_sort(collect_list(l_quantity)),
                 |  cast(ceil(0.5 * count(1)) as int))""".stripMargin)
            .as("p50_disc"),
          expr("""element_at(array_sort(collect_list(l_quantity)),
                 |  cast(ceil(0.9 * count(1)) as int))""".stripMargin)
            .as("p90_disc"),
          expr("bit_and(cast(l_linenumber as int))").as("bits_and"),
          expr("bit_or(cast(l_linenumber as int))").as("bits_or"),
          expr("bit_xor(cast(l_linenumber as int))").as("bits_xor"),
          array_join(array_sort(collect_set(col("l_linestatus"))), ",")
            .as("statuses"))
        .orderBy(col("l_returnflag"))
    }),

    // EXTRACT field parity beyond year/month/day: ISO day-of-week,
    // ISO week + ISO year (the year of the week's Thursday), century,
    // decade — emulated arithmetically, checked against DuckDB's NATIVE
    // isodow/week/isoyear/century/decade.
    // AT TIME ZONE both directions (timestamp.c timestamp_zone /
    // timestamptz_zone): naive-local -> UTC instant and UTC instant ->
    // zone wall time, plus derived UTC offsets across a DST boundary
    // (the +182d column lands the January events in July: Berlin CET+1
    // becomes CEST+2, New York -5 stays on the winter side). Oracle =
    // DuckDB's NATIVE ICU timezone() with the session in UTC.
    "q_at_time_zone" -> ((s, dir) => {
      val summer = col("ts") + expr("INTERVAL 182 DAYS")
      val nyUtc = to_utc_timestamp(col("ts"), "America/New_York")
      val berlinW = from_utc_timestamp(col("ts"), "Europe/Berlin")
      val berlinS = from_utc_timestamp(summer, "Europe/Berlin")
      t(s, dir, "events").filter(col("event_id") <= 300)
        .select(col("event_id"), col("ts"),
          nyUtc.as("ny_to_utc"),
          from_utc_timestamp(col("ts"), "Asia/Tokyo").as("tokyo_wall"),
          berlinW.as("berlin_winter"),
          berlinS.as("berlin_summer"),
          ((unix_timestamp(nyUtc) - unix_timestamp(col("ts"))) / 3600)
            .cast("int").as("ny_offset_h"),
          ((unix_timestamp(berlinW) - unix_timestamp(col("ts"))) / 3600)
            .cast("int").as("berlin_winter_offset_h"),
          ((unix_timestamp(berlinS) - unix_timestamp(summer)) / 3600)
            .cast("int").as("berlin_summer_offset_h"))
        .orderBy(col("event_id"))
    }),

    "q_extract_parts" -> ((s, dir) => {
      val d = col("o_orderdate").cast("date")
      val isodow = pmod(dayofweek(d) + 5, lit(7)) + 1
      t(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"), d.as("d"),
          isodow.as("isodow"),
          weekofyear(d).as("iso_week"),
          year(date_add(d, lit(4) - isodow)).as("isoyear"),
          (floor((year(d) - 1) / 100) + 1).cast("int").as("century"),
          floor(year(d) / 10).cast("int").as("decade"))
        .orderBy(col("o_orderkey"))
    }),

    // age() calendar decomposition (timestamp.c:6194) + justify_days /
    // justify_hours arithmetic, over per-user event time spans. The PG
    // algorithm borrows days from the EARLIER timestamp's month; a single
    // borrow always suffices (that month has >= day1 days), and months
    // borrow at most one year. Oracle = DuckDB's NATIVE age().
    "q_age_justify" -> ((s, dir) => {
      val p = t(s, dir, "events").filter(col("user_id") <= 100)
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t1"), max(col("ts")).as("t2"))
      val us = 86400000000L
      val tod1 = pmod(unix_micros(col("t1")), lit(us))
      val tod2 = pmod(unix_micros(col("t2")), lit(us))
      val sRaw = tod2 - tod1
      val sBor = (sRaw < 0).cast("int")
      val sFin = sRaw + sBor * us
      val dRaw = dayofmonth(col("t2")) - dayofmonth(col("t1")) - sBor
      val dBor = (dRaw < 0).cast("int")
      val dFin = dRaw + dBor * dayofmonth(last_day(col("t1")))
      val mRaw = month(col("t2")) - month(col("t1")) - dBor
      val mBor = (mRaw < 0).cast("int")
      p.select(col("user_id"),
          (year(col("t2")) - year(col("t1")) - mBor).as("years"),
          (mRaw + mBor * 12).as("months"),
          dFin.as("days"),
          (sFin / 3600000000L).cast("int").as("hours"),
          (pmod(sFin, lit(3600000000L)) / 60000000L).cast("int").as("minutes"),
          // justify_hours / justify_days on the flat hour span
          // (Column./ is double division — truncate back to whole hours)
          ((unix_micros(col("t2")) - unix_micros(col("t1"))) / 3600000000L)
            .cast("long").as("th"))
        .withColumn("jh_days", (col("th") / 24).cast("long"))
        .withColumn("jh_hours", pmod(col("th"), lit(24L)))
        .withColumn("jd_months", (col("th") / 24 / 30).cast("long"))
        .withColumn("jd_days", pmod((col("th") / 24).cast("long"), lit(30L)))
        // justify_interval (timestamp.c interval_justify_interval): the
        // full month/day/time normalization INCLUDING the sign-borrow
        // cascades, over a mixed-sign synthetic interval per user
        // (months -2..2, days -3..3, hours -25..24) so every borrow
        // branch fires across the 101 rows. Spark's `div`/`%` on longs
        // are C-style truncating, matching TMODULO.
        .withColumn("mon_in", (pmod(col("user_id"), lit(5)) - 2).cast("long"))
        .withColumn("day_in", (pmod(col("user_id"), lit(7)) - 3).cast("long"))
        .withColumn("us_in",
          (pmod(col("user_id"), lit(50)) - 25) * lit(3600000000L))
        .withColumn("t1j", expr("us_in % 86400000000"))
        .withColumn("day1", expr("day_in + (us_in div 86400000000)"))
        .withColumn("mon1", expr("mon_in + (day1 div 30)"))
        .withColumn("day2", expr("day1 % 30"))
        .withColumn("mon2", expr(
          """CASE WHEN mon1 > 0 AND (day2 < 0 OR (day2 = 0 AND t1j < 0))
            |  THEN mon1 - 1
            |WHEN mon1 < 0 AND (day2 > 0 OR (day2 = 0 AND t1j > 0))
            |  THEN mon1 + 1 ELSE mon1 END""".stripMargin))
        .withColumn("day3", expr(
          """CASE WHEN mon1 > 0 AND (day2 < 0 OR (day2 = 0 AND t1j < 0))
            |  THEN day2 + 30
            |WHEN mon1 < 0 AND (day2 > 0 OR (day2 = 0 AND t1j > 0))
            |  THEN day2 - 30 ELSE day2 END""".stripMargin))
        .withColumn("ji_months", col("mon2"))
        .withColumn("ji_days", expr(
          "CASE WHEN day3 > 0 AND t1j < 0 THEN day3 - 1 " +
            "WHEN day3 < 0 AND t1j > 0 THEN day3 + 1 ELSE day3 END"))
        .withColumn("ji_hours", expr(
          "(CASE WHEN day3 > 0 AND t1j < 0 THEN t1j + 86400000000 " +
            "WHEN day3 < 0 AND t1j > 0 THEN t1j - 86400000000 " +
            "ELSE t1j END) div 3600000000"))
        .drop("th", "mon_in", "day_in", "us_in", "t1j", "day1", "mon1",
          "day2", "mon2", "day3")
        .orderBy(col("user_id"))
    }),

    // orafce Oracle-compat date functions
    // (`/root/reference/gpcontrib/orafce/datefce.c`; regress
    // sql/orafce.sql dates section): the distinctive edge semantics —
    // add_months SNAPS to end-of-month when the input is the last day
    // of its month (2008-02-29 + 1 = 2008-03-31, where plain clamping
    // gives 03-29), months_between's same-day/both-last-days integer
    // rule with the /31 fraction otherwise (Spark's builtin implements
    // exactly Oracle's rule), next_day strictly-after weekday seek,
    // last_day, trunc(date, fmt) for MM/Q/YEAR/IW, and round(date)
    // rounding up from day 16 (month) / July (year). Oracle derives
    // everything from its own date arithmetic.
    "q_orafce_dates" -> ((s, dir) => {
      val d = col("o_orderdate").cast("date")
      val n = (pmod(col("o_orderkey"), lit(25)) - 12).cast("int")
      val isLast = dayofmonth(d) === dayofmonth(last_day(d))
      val dowName = element_at(
        array(lit("Sun"), lit("Mon"), lit("Tue"), lit("Wed"), lit("Thu"),
          lit("Fri"), lit("Sat")),
        (pmod(col("o_orderkey"), lit(7)) + 1).cast("int"))
      val d2 = date_sub(d, pmod(col("o_orderkey"), lit(100)).cast("int"))
      t(s, dir, "orders").filter(col("o_orderkey") <= 400)
        .select(col("o_orderkey"), d.as("d"),
          when(isLast, last_day(add_months(d, n)))
            .otherwise(add_months(d, n)).as("am"),
          last_day(d).as("lastd"),
          next_day(d, dowName).as("nextd"),
          round(months_between(d, d2, roundOff = false), 6).as("mb"),
          trunc(d, "MM").as("tr_mm"),
          trunc(d, "quarter").as("tr_q"),
          trunc(d, "year").as("tr_yy"),
          trunc(d, "week").as("tr_iw"),
          when(dayofmonth(d) >= 16, trunc(add_months(d, 1), "MM"))
            .otherwise(trunc(d, "MM")).as("rnd_mm"),
          when(month(d) >= 7, trunc(add_months(d, 12), "year"))
            .otherwise(trunc(d, "year")).as("rnd_yy"))
        .orderBy(col("o_orderkey"))
    }),

    // orafce instr(str, sub[, start[, nth]]) — Oracle's 4-arg position
    // search including NEGATIVE start (search backward from position
    // len+start+1) (`/root/reference/gpcontrib/orafce/others.c` plvstr
    // instr; regress expected/orafce.out:1032-1056 pins every vector
    // here). Computed as a pure higher-order-function composition:
    // occurrence positions via filter(sequence(...)), then forward or
    // reversed nth pick; 0 when absent, matching Oracle.
    "q_orafce_instr" -> ((s, dir) => {
      import s.implicits._
      Seq( // (vec_id, s, sub, start, nth) — regress vectors then edges
        (1, "Tech on the net", "e", 1, 1),   // = 2
        (2, "Tech on the net", "e", 1, 2),   // = 11
        (3, "Tech on the net", "e", 1, 3),   // = 14
        (4, "Tech on the net", "e", -3, 2),  // = 2 (backward)
        (5, "Tech on the net", "e", -1, 1),  // = 14
        (6, "Tech on the net", "net", 1, 1), // = 13
        (7, "Tech on the net", "z", 1, 1),   // = 0
        (8, "Tech on the net", "e", 12, 1),  // = 14
        (9, "aaaa", "aa", 1, 2),             // overlapping = 2
        (10, "Tech on the net", "e", 0, 1))  // start 0 -> 0
        .toDF("vec_id", "s", "sub", "st", "nth")
        .withColumn("pos", expr(
          "filter(sequence(1, greatest(length(s) - length(sub) + 1, 0)), " +
            "i -> substring(s, i, length(sub)) = sub)"))
        .select(col("vec_id"),
          expr("""CASE WHEN st = 0 THEN 0
                 |WHEN st > 0 THEN
                 |  coalesce(try_element_at(filter(pos, p -> p >= st), nth), 0)
                 |ELSE
                 |  coalesce(try_element_at(
                 |    reverse(filter(pos, p -> p <= length(s) + st + 1)),
                 |    nth), 0) END""".stripMargin).cast("int").as("inst"))
        .orderBy(col("vec_id"))
    }),

    // to_number / to_date: the parsing half of formatting.c. Strings are
    // RENDERED by the to_char engine, then parsed back — the round-trip
    // must reproduce the source value exactly in both engines.
    "q_to_number_roundtrip" -> ((s, dir) => {
      graft.functions.ToChar.register(s)
      val monFmt = graft.functions.ToCharFormat.toSparkDatetime("DD Mon YYYY")
      t(s, dir, "orders").filter(col("o_orderkey") <= 300)
        .withColumn("s_num", expr("to_char_num(o_totalprice, '999,999.00')"))
        .withColumn("s_mi", expr("to_char_num(-o_totalprice, '999,999.99MI')"))
        .withColumn("s_date", expr("to_char_dt(o_orderdate, 'YYYY-MM-DD')"))
        .withColumn("s_mon", expr("to_char_dt(o_orderdate, 'DD Mon YYYY')"))
        .select(col("o_orderkey"),
          regexp_replace(col("s_num"), "[ ,]", "").cast("double").as("n_back"),
          (regexp_replace(col("s_num"), "[ ,]", "").cast("double")
            === col("o_totalprice")).as("n_exact"),
          (when(col("s_mi").endsWith("-"),
              -regexp_replace(expr("substring(s_mi, 1, length(s_mi)-1)"),
                "[ ,]", "").cast("double"))
            .otherwise(regexp_replace(col("s_mi"), "[ ,-]", "").cast("double")))
            .as("mi_back"),
          to_date(col("s_date"), "yyyy-MM-dd").as("d_back"),
          to_date(col("s_mon"), monFmt).as("mon_back"),
          (to_date(col("s_mon"), monFmt)
            === col("o_orderdate").cast("date")).as("d_exact"))
        .orderBy(col("o_orderkey"))
    }),

    // jsonpath scalars: nested object path, array-index path, boolean
    // extraction, struct-typed parse, key listing, containment.
    "q_json_funcs2" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") <= 200)
        .withColumn("j", jCol)
        .select(col("c_custkey"),
          get_json_object(col("j"), "$.meta.nation").cast("int").as("nat"),
          get_json_object(col("j"), "$.tags[1]").as("tag1"),
          (get_json_object(col("j"), "$.meta.vip") === "true").as("vip"),
          from_json(col("j"), org.apache.spark.sql.types.StructType.fromDDL(
              "seg STRING, meta STRUCT<nation: INT>"))
            .getField("seg").as("seg2"),
          array_join(expr("json_object_keys(get_json_object(j, '$.meta'))"), ",")
            .as("meta_keys"),
          array_contains(
            expr("from_json(get_json_object(j, '$.tags'), 'array<string>')"),
            "t1").as("has_t1"))
        .orderBy(col("c_custkey"))
    }),

    // SQL/JSON path filter language (lax mode), the shapes of
    // `jsonb_jsonpath.sql`: each output column is one jsonpath evaluated
    // over a constructed document whose arrays/types vary per row.
    //   filt_x    lax $.items[*] ? (@.x > 3).x      (filter + member)
    //   has_big_a $ @? '$.items[*] ? (@.x > 3 && @.t == "a")'
    //   n_items   $.items.size()
    //   last_x    $.items[last].x
    //   n_opt     $.items[*] ? (exists (@.opt))     (count)
    //   var_lt    $ @? '$ ? (@.n < $value)'         ($value bound per row)
    //   n_eq_root $.items[*] ? (@.x == $.n + 1)     (root-context ref)
    //   w_type    $.w.type()                        (polymorphic field)
    // Lax-mode filters are higher-order filter/transform over a typed
    // from_json array — per-row, codegen'd, no shuffle; .type() reads the
    // real JSON type through VariantType (get_json_object would strip
    // string quoting and lose number-vs-string).
    "q_jsonpath_filter" -> ((s, dir) => {
      val okey = col("o_orderkey")
      def m(k: Int): Column = pmod(okey, lit(k))
      val wJson = when(m(6) === 0, m(97).cast("string"))
        .when(m(6) === 1, concat(lit("\"s"), m(4), lit("\"")))
        .when(m(6) === 2, concat(lit("["), m(3), lit(", 5]")))
        .when(m(6) === 3, concat(lit("{\"y\": "), m(3), lit("}")))
        .when(m(6) === 4, (m(8) === 4).cast("string"))
        .otherwise(lit("null"))
      val jp = concat(
        lit("{\"items\": [{\"x\": "), m(7), lit(", \"t\": \"a\"}, {\"x\": "),
        pmod(okey * 3, lit(8)), lit(", \"t\": \"b\"}, {\"x\": "),
        pmod(okey * 5, lit(9)), lit(", \"t\": \"c\""),
        when(m(2) === 0, lit(", \"opt\": 1")).otherwise(lit("")),
        lit("}], \"n\": "), m(5), lit(", \"w\": "), wJson, lit("}"))
      val wv = "variant_get(parse_json(j), '$.w')"
      t(s, dir, "orders").filter(okey <= 300)
        .withColumn("j", jp)
        .withColumn("items", from_json(get_json_object(col("j"), "$.items"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType.fromDDL(
              "x INT, t STRING, opt INT"))))
        .withColumn("n", get_json_object(col("j"), "$.n").cast("int"))
        .select(okey,
          concat_ws(",", expr(
            "transform(filter(items, i -> i.x > 3), i -> cast(i.x as string))"))
            .as("filt_x"),
          expr("exists(items, i -> i.x > 3 AND i.t = 'a')").as("has_big_a"),
          size(col("items")).as("n_items"),
          expr("element_at(items, -1).x").as("last_x"),
          expr("size(filter(items, i -> i.opt is not null))").as("n_opt"),
          (col("n") < m(4) + lit(2)).as("var_lt"),
          expr("size(filter(items, i -> i.x = n + 1))").as("n_eq_root"),
          expr(s"""CASE WHEN is_variant_null($wv) THEN 'null'
            | WHEN schema_of_variant($wv) IN
            |   ('BIGINT','INT','SMALLINT','TINYINT','DOUBLE','DECIMAL(38,0)')
            |   THEN 'number'
            | WHEN schema_of_variant($wv) = 'STRING' THEN 'string'
            | WHEN schema_of_variant($wv) = 'BOOLEAN' THEN 'boolean'
            | WHEN schema_of_variant($wv) LIKE 'ARRAY%' THEN 'array'
            | ELSE 'object' END""".stripMargin).as("w_type"))
        .orderBy(okey)
    }),

    // SQL/JSON path strict vs lax modes (jsonpath_exec.c
    // executeItemOptUnwrapTarget; reference tests jsonb_jsonpath.sql:20-60,
    // 357-410, 1330-1343): LAX auto-wraps non-arrays for subscripting and
    // .size() (scalar -> [scalar], so $[0] returns the scalar and .size()
    // is 1 — even for JSON null) and suppresses structural errors (member
    // access on a non-object -> empty result); STRICT raises them. Error
    // outcomes are modeled as *_ok booleans ("would the strict path
    // succeed") and empty results as SQL NULL — checking the semantics,
    // not the error text. The same six-way w construction as
    // q_jsonpath_filter puts every JSON kind through every path.
    "q_jsonpath_modes" -> ((s, dir) => {
      val okey = col("o_orderkey")
      def m(k: Int): Column = pmod(okey, lit(k))
      val wJson = when(m(6) === 0, m(97).cast("string"))
        .when(m(6) === 1, concat(lit("\"s"), m(4), lit("\"")))
        .when(m(6) === 2, concat(lit("["), m(3), lit(", 5]")))
        .when(m(6) === 3, concat(lit("{\"y\": "), m(3), lit("}")))
        .when(m(6) === 4, (m(8) === 4).cast("string"))
        .otherwise(lit("null"))
      val wv = "variant_get(parse_json(j), '$.w')"
      t(s, dir, "orders").filter(okey <= 300)
        .withColumn("j", concat(lit("{\"w\": "), wJson, lit("}")))
        .withColumn("wkind", expr(s"""CASE WHEN is_variant_null($wv) THEN 'null'
          | WHEN schema_of_variant($wv) IN
          |   ('BIGINT','INT','SMALLINT','TINYINT','DOUBLE','DECIMAL(38,0)')
          |   THEN 'number'
          | WHEN schema_of_variant($wv) = 'STRING' THEN 'string'
          | WHEN schema_of_variant($wv) = 'BOOLEAN' THEN 'boolean'
          | WHEN schema_of_variant($wv) LIKE 'ARRAY%' THEN 'array'
          | ELSE 'object' END""".stripMargin))
        .select(okey, col("wkind"),
          expr("CASE WHEN wkind = 'array' " +
            "THEN CAST(variant_get(parse_json(j), '$.w[0]') AS INT) " +
            "WHEN wkind = 'number' " +
            "THEN CAST(variant_get(parse_json(j), '$.w') AS INT) END")
            .as("lax_w0_num"),
          (col("wkind") === "array").as("strict_w0_ok"),
          expr("CAST(variant_get(parse_json(j), '$.w.y') AS INT)")
            .as("lax_wy_num"),
          (col("wkind") === "object").as("strict_wy_ok"),
          coalesce(size(expr(
            "from_json(get_json_object(j, '$.w'), 'array<int>')")), lit(1))
            .as("lax_wsize"),
          (col("wkind") === "array").as("strict_wsize_ok"))
        .orderBy(okey)
    }),

    // SQL/JSON path arithmetic, `last` subscripts, and datetime() — the
    // remaining jsonpath_exec.c surface past the r6 filter subset
    // (executeBinaryArithmExpr / executeUnaryArithmExpr at
    // jsonpath_exec.c:1556,1612; `last` via executeItemOptUnwrapTarget's
    // jpiLast; .datetime() at :1816; reference tests jsonb_jsonpath.sql
    // arithmetic + datetime sections). Shapes covered, one column each:
    //   arith_filt  lax $.items[*] ? (@.x % 2 == 0).x   (arith in filter)
    //   arith_path  $.n * 2 + 1                         (arith result path)
    //   last_x      $.items[last].x
    //   last_m1_x   $.items[last - 1].x                 (arith in subscript)
    //   neg_n       -$.n                                (unary minus)
    //   dt          $.ts.datetime()                     (string -> timestamp)
    //   dt_lt       $.ts.datetime() < "...".datetime()  (datetime compare)
    //   f_floor/f_ceil/f_abs  $.f.floor()/.ceiling()/.abs()
    // Same per-row document construction discipline as q_jsonpath_filter;
    // every numeric output is cast BIGINT on both sides so the driver's
    // dtype-sensitive hash can't diverge on int width.
    "q_jsonpath_arith" -> ((s, dir) => {
      val okey = col("o_orderkey")
      def m(k: Int): Column = pmod(okey, lit(k))
      val jp = concat(
        lit("{\"items\": [{\"x\": "), m(7), lit("}, {\"x\": "),
        pmod(okey * 3, lit(8)), lit("}, {\"x\": "), pmod(okey * 5, lit(9)),
        lit("}], \"n\": "), m(5),
        lit(", \"f\": "), ((m(9) - lit(4)).cast("double") + lit(0.5)).cast("string"),
        lit(", \"ts\": \"2024-01-"), lpad((m(28) + 1).cast("string"), 2, "0"),
        lit("T"), lpad(m(24).cast("string"), 2, "0"), lit(":30:00\"}"))
      t(s, dir, "orders").filter(okey <= 300)
        .withColumn("j", jp)
        .withColumn("items", from_json(get_json_object(col("j"), "$.items"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StructType.fromDDL("x INT"))))
        .withColumn("n", get_json_object(col("j"), "$.n").cast("int"))
        .withColumn("f", get_json_object(col("j"), "$.f").cast("double"))
        .withColumn("dt0", to_timestamp(get_json_object(col("j"), "$.ts"),
          "yyyy-MM-dd'T'HH:mm:ss"))
        .select(okey,
          concat_ws(",", expr(
            "transform(filter(items, i -> i.x % 2 = 0), i -> cast(i.x as string))"))
            .as("arith_filt"),
          (col("n") * 2 + 1).cast("long").as("arith_path"),
          expr("element_at(items, -1).x").cast("long").as("last_x"),
          expr("element_at(items, -2).x").cast("long").as("last_m1_x"),
          (-col("n")).cast("long").as("neg_n"),
          col("dt0").as("dt"),
          (col("dt0") < lit("2024-01-15 00:00:00").cast("timestamp")).as("dt_lt"),
          floor(col("f")).cast("long").as("f_floor"),
          ceil(col("f")).cast("long").as("f_ceil"),
          abs(col("f")).as("f_abs"))
        .orderBy(okey)
    }),

    // jsonpath string predicates + keyvalue(): `? (@ like_regex "...")`,
    // `? (@ starts with "...")`, `.keyvalue()`, and an exists() filter —
    // the remaining SQL/JSON path language constructs
    // (`/root/reference/src/backend/utils/adt/jsonpath_exec.c`:
    // executeLikeRegex / jpiStartsWith / JsonPathKeyValue; tests
    // `sql/jsonb_jsonpath.sql`). Same discipline as the other jsonpath
    // queries: the document is built per-row from columns, Spark PARSES
    // it back and applies the path semantics, the oracle derives the
    // expected values from the same source columns — a construction/
    // extraction round-trip proof.
    "q_jsonpath_strpred" -> ((s, dir) => {
      val okey = col("o_orderkey")
      def m(k: Int): Column = pmod(okey, lit(k))
      val jp = concat(
        lit("{\"tags\": [\"a"), m(10), lit("\", \"ab"), m(3),
        lit("\", \"pre_"), m(4), lit("\", \"beta\"], \"obj\": {\"k"),
        m(2), lit("\": "), m(11), lit(", \"m\": "), m(13), lit("}}"))
      t(s, dir, "orders").filter(okey <= 300)
        .withColumn("j", jp)
        .withColumn("tags", from_json(get_json_object(col("j"), "$.tags"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
        .withColumn("obj", from_json(get_json_object(col("j"), "$.obj"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)))
        .select(okey,
          // $.tags[*] ? (@ like_regex "^a[0-9]+$")
          concat_ws(",", expr("filter(tags, t -> t rlike '^a[0-9]+$')"))
            .as("like_regex_hits"),
          // $.tags[*] ? (@ starts with "pre")
          concat_ws(",", expr("filter(tags, t -> startswith(t, 'pre'))"))
            .as("starts_with_hits"),
          // $.obj.keyvalue() — entries as sorted (key, value) pairs
          to_json(expr("array_sort(map_entries(obj))")).as("kv_json"),
          // exists($.obj.m ? (@ > 6))
          expr("element_at(obj, 'm') > 6").as("m_gt6"))
        .orderBy(okey)
    }),

    // jsonb mutation family — jsonb_set / jsonb_insert / #- delete-path
    // (`/root/reference/src/backend/utils/adt/jsonfuncs.c:4446+` setPath;
    // behavior shapes lifted from `src/test/regress/sql/jsonb.sql:
    // 1100-1150`), via [[graft.functions.JsonbMut]]: the document is
    // built per row, serialized, PARSED BACK through from_json (the ETL
    // patch reality — the input is a JSON string, not columns), edited
    // structurally, and re-rendered with to_json. Eight mutation shapes:
    // object-key replace, array set at negative index, out-of-range set
    // (create-if-missing appends), nested create-missing key, insert
    // before/after an index, array-element delete, nested-key delete.
    // The oracle constructs each expected document directly from the
    // same source columns — a mutate/render round-trip proof. All edits
    // are per-row codegen'd expressions; no shuffle.
    "q_jsonb_mutate" -> ((s, dir) => {
      import graft.functions.JsonbMut._
      val okey = col("o_orderkey")
      def m(k: Int): Column = pmod(okey, lit(k))
      val baseJson = to_json(struct(
        m(10).as("a"),
        array(m(7), pmod(okey * 3, lit(8)), pmod(okey * 5, lit(9))).as("b"),
        struct(m(100).as("k"), m(13).as("mm")).as("c")))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "a BIGINT, b ARRAY<BIGINT>, c STRUCT<k: BIGINT, mm: BIGINT>")
      t(s, dir, "orders").filter(okey <= 200)
        .withColumn("doc", from_json(baseJson, schema))
        .select(okey,
          // jsonb_set(doc, '{a}', a + 100)
          to_json(objectSet(col("doc"), "a", col("doc.a") + 100))
            .as("j_set_key"),
          // jsonb_set(doc, '{b,-1}', 99) — negative index replace
          to_json(col("doc").withField("b",
            arraySet(col("doc.b"), -1, lit(99L)))).as("j_set_arr_neg"),
          // jsonb_set(doc, '{b,33}', 7) — out of range appends
          to_json(col("doc").withField("b",
            arraySet(col("doc.b"), 33, lit(7L)))).as("j_set_arr_oob"),
          // jsonb_set(doc, '{c,e}', 5) — create-if-missing nested key
          to_json(objectSet(col("doc"), "c.e", lit(5L)))
            .as("j_set_new_key"),
          // jsonb_insert(doc, '{b,1}', 42) — insert before index 1
          to_json(col("doc").withField("b",
            arrayInsert(col("doc.b"), 1, lit(42L)))).as("j_ins_before"),
          // jsonb_insert(doc, '{b,1}', 43, true) — insert after index 1
          to_json(col("doc").withField("b",
            arrayInsert(col("doc.b"), 1, lit(43L), after = true)))
            .as("j_ins_after"),
          // doc #- '{b,0}' — array element delete
          to_json(col("doc").withField("b",
            arrayDelete(col("doc.b"), 0))).as("j_del_arr"),
          // doc #- '{c,mm}' — nested key delete
          to_json(objectDelete(col("doc"), "c.mm")).as("j_del_key"))
        .orderBy(okey)
    }),

    // jsonb operators over DYNAMIC documents — `||` concatenation (right
    // operand wins on key collision, jsonb_concat in jsonfuncs.c),
    // jsonb_strip_nulls, and `- 'key'` deletion — on MapType documents
    // (schema-free keys, unlike q_jsonb_mutate's typed structs): parse
    // with from_json(map<string,string>), edit with map_contains_key /
    // map_filter / map_from_entries, re-render with to_json. Key order
    // is deterministic by construction (left keys then unseen right
    // keys, pg-independent but identical in the oracle). Per-row
    // codegen'd map expressions; no shuffle.
    "q_jsonb_concat" -> ((s, dir) => {
      val okey = col("o_orderkey")
      def m(k: Int): Column = pmod(okey, lit(k))
      val j1 = concat(lit("{\"a\": \""), m(7), lit("\", \"b\": \""), m(5),
        lit("\""),
        when(m(3) === 0, lit(", \"c\": null"))
          .otherwise(concat(lit(", \"c\": \""), m(11), lit("\""))), lit("}"))
      val j2 = concat(lit("{\"b\": \"x"), m(4), lit("\", \"c\": \"z"), m(9),
        lit("\"}"))
      t(s, dir, "orders").filter(okey <= 200)
        .withColumn("m1", from_json(j1, org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
        .withColumn("m2", from_json(j2, org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
        .withColumn("ks",
          array_union(map_keys(col("m1")), map_keys(col("m2"))))
        .withColumn("strip",
          map_filter(col("m1"), (_, v) => v.isNotNull))
        .select(okey,
          // m1 || m2: union of keys, right value wins on collision
          to_json(map_from_entries(transform(col("ks"), k => struct(k,
            when(map_contains_key(col("m2"), k), element_at(col("m2"), k))
              .otherwise(element_at(col("m1"), k)))))).as("j_concat"),
          // jsonb_strip_nulls(m1)
          to_json(col("strip")).as("j_strip"),
          // jsonb_strip_nulls(m1) - 'b'
          to_json(map_filter(col("strip"), (k, _) => k =!= "b"))
            .as("j_del_key"))
        .orderBy(okey)
    }),

    // jsonb_each / json_array_elements analogues: one row per array
    // element (posexplode) and per object entry (map explode).
    "q_json_each" -> ((s, dir) => {
      val base = t(s, dir, "customer").filter(col("c_custkey") <= 50)
        .withColumn("j", jCol)
      val tags = base.select(col("c_custkey"), lit("tag").as("kind"),
          posexplode(expr("from_json(get_json_object(j, '$.tags'), 'array<string>')"))
            .as(Seq("k0", "v")))
        .select(col("c_custkey"), col("kind"),
                col("k0").cast("string").as("k"), col("v"))
      val metas = base.select(col("c_custkey"), lit("meta").as("kind"),
          explode(expr("from_json(get_json_object(j, '$.meta'), 'map<string,string>')"))
            .as(Seq("k", "v")))
      tags.unionByName(metas)
        .orderBy(col("c_custkey"), col("kind"), col("k"))
    })
  )

  /** DuckDB grouped 2-decimal rendering of a non-negative double (fmt
    * refuses thousand separators on floats, so group the integer part). */
  private def g2(x: String): String =
    s"format('{:,}', CAST(split_part(printf('%.2f', $x), '.', 1) AS BIGINT))" +
      s" || '.' || split_part(printf('%.2f', $x), '.', 2)"

  val oracle: Map[String, String] = Map(
    // each expected document rebuilt directly from the source columns in
    // the same key order the Spark plan renders (replace-in-place keeps
    // position; create-if-missing appends)
    "q_jsonb_mutate" ->
      """WITH b AS (SELECT o_orderkey,
        |    o_orderkey % 10 AS a,
        |    [o_orderkey % 7, o_orderkey * 3 % 8, o_orderkey * 5 % 9] AS arr,
        |    o_orderkey % 100 AS k, o_orderkey % 13 AS mm
        |  FROM orders WHERE o_orderkey <= 200)
        |SELECT o_orderkey,
        |  to_json({'a': a + 100, 'b': arr, 'c': {'k': k, 'mm': mm}})
        |    AS j_set_key,
        |  to_json({'a': a, 'b': [arr[1], arr[2], CAST(99 AS BIGINT)],
        |           'c': {'k': k, 'mm': mm}}) AS j_set_arr_neg,
        |  to_json({'a': a, 'b': list_append(arr, CAST(7 AS BIGINT)),
        |           'c': {'k': k, 'mm': mm}}) AS j_set_arr_oob,
        |  to_json({'a': a, 'b': arr, 'c': {'k': k, 'mm': mm,
        |           'e': CAST(5 AS BIGINT)}}) AS j_set_new_key,
        |  to_json({'a': a, 'b': [arr[1], CAST(42 AS BIGINT), arr[2], arr[3]],
        |           'c': {'k': k, 'mm': mm}}) AS j_ins_before,
        |  to_json({'a': a, 'b': [arr[1], arr[2], CAST(43 AS BIGINT), arr[3]],
        |           'c': {'k': k, 'mm': mm}}) AS j_ins_after,
        |  to_json({'a': a, 'b': [arr[2], arr[3]], 'c': {'k': k, 'mm': mm}})
        |    AS j_del_arr,
        |  to_json({'a': a, 'b': arr, 'c': {'k': k}}) AS j_del_key
        |FROM b ORDER BY o_orderkey""".stripMargin,

    // expected documents assembled key-by-key in the same order the
    // Spark plan renders (left keys then unseen right keys)
    "q_jsonb_concat" ->
      """WITH b AS (SELECT o_orderkey,
        |    CAST(o_orderkey % 7 AS VARCHAR) AS a,
        |    CAST(o_orderkey % 5 AS VARCHAR) AS bb,
        |    CAST(o_orderkey % 11 AS VARCHAR) AS c,
        |    'x' || (o_orderkey % 4) AS xb,
        |    'z' || (o_orderkey % 9) AS zc,
        |    o_orderkey % 3 = 0 AS cnull
        |  FROM orders WHERE o_orderkey <= 200)
        |SELECT o_orderkey,
        |  to_json(map(['a', 'b', 'c'], [a, xb, zc])) AS j_concat,
        |  to_json(CASE WHEN cnull THEN map(['a', 'b'], [a, bb])
        |          ELSE map(['a', 'b', 'c'], [a, bb, c]) END) AS j_strip,
        |  to_json(CASE WHEN cnull THEN map(['a'], [a])
        |          ELSE map(['a', 'c'], [a, c]) END) AS j_del_key
        |FROM b ORDER BY o_orderkey""".stripMargin,

    // same document construction char-for-char; filters/methods through
    // DuckDB's json_transform (typed struct list) + list lambdas +
    // json_type, mapped to the same canonical jsonpath type names
    "q_jsonpath_filter" ->
      """WITH b AS (SELECT o_orderkey,
        |    '{"items": [{"x": ' || (o_orderkey % 7) || ', "t": "a"}, {"x": ' ||
        |    (o_orderkey * 3 % 8) || ', "t": "b"}, {"x": ' || (o_orderkey * 5 % 9) ||
        |    ', "t": "c"' ||
        |    CASE WHEN o_orderkey % 2 = 0 THEN ', "opt": 1' ELSE '' END ||
        |    '}], "n": ' || (o_orderkey % 5) || ', "w": ' ||
        |    CASE WHEN o_orderkey % 6 = 0 THEN CAST(o_orderkey % 97 AS VARCHAR)
        |         WHEN o_orderkey % 6 = 1 THEN '"s' || (o_orderkey % 4) || '"'
        |         WHEN o_orderkey % 6 = 2 THEN '[' || (o_orderkey % 3) || ', 5]'
        |         WHEN o_orderkey % 6 = 3 THEN '{"y": ' || (o_orderkey % 3) || '}'
        |         WHEN o_orderkey % 6 = 4 THEN CAST(o_orderkey % 8 = 4 AS VARCHAR)
        |         ELSE 'null' END || '}' AS j
        |  FROM orders WHERE o_orderkey <= 300),
        |p AS (SELECT o_orderkey, j,
        |    json_transform(j, '{"items": [{"x": "INTEGER", "t": "VARCHAR",
        |      "opt": "INTEGER"}], "n": "INTEGER"}') AS d
        |  FROM b)
        |SELECT o_orderkey,
        |  COALESCE(array_to_string(list_transform(
        |    list_filter(d.items, i -> i.x > 3),
        |    i -> CAST(i.x AS VARCHAR)), ','), '') AS filt_x,
        |  len(list_filter(d.items, i -> i.x > 3 AND i.t = 'a')) > 0 AS has_big_a,
        |  CAST(len(d.items) AS INT) AS n_items,
        |  d.items[len(d.items)].x AS last_x,
        |  CAST(len(list_filter(d.items, i -> i.opt IS NOT NULL)) AS INT) AS n_opt,
        |  d.n < (o_orderkey % 4) + 2 AS var_lt,
        |  CAST(len(list_filter(d.items, i -> i.x = d.n + 1)) AS INT) AS n_eq_root,
        |  CASE json_type(j, '$.w')
        |    WHEN 'UBIGINT' THEN 'number' WHEN 'BIGINT' THEN 'number'
        |    WHEN 'DOUBLE' THEN 'number' WHEN 'VARCHAR' THEN 'string'
        |    WHEN 'BOOLEAN' THEN 'boolean' WHEN 'ARRAY' THEN 'array'
        |    WHEN 'OBJECT' THEN 'object' WHEN 'NULL' THEN 'null' END AS w_type
        |FROM p ORDER BY o_orderkey""".stripMargin,

    "q_jsonpath_modes" ->
      """WITH b AS (SELECT o_orderkey,
        |    '{"w": ' ||
        |    CASE WHEN o_orderkey % 6 = 0 THEN CAST(o_orderkey % 97 AS VARCHAR)
        |         WHEN o_orderkey % 6 = 1 THEN '"s' || (o_orderkey % 4) || '"'
        |         WHEN o_orderkey % 6 = 2 THEN '[' || (o_orderkey % 3) || ', 5]'
        |         WHEN o_orderkey % 6 = 3 THEN '{"y": ' || (o_orderkey % 3) || '}'
        |         WHEN o_orderkey % 6 = 4 THEN CAST(o_orderkey % 8 = 4 AS VARCHAR)
        |         ELSE 'null' END || '}' AS j
        |  FROM orders WHERE o_orderkey <= 300),
        |k AS (SELECT o_orderkey, j,
        |    CASE json_type(j, '$.w')
        |      WHEN 'UBIGINT' THEN 'number' WHEN 'BIGINT' THEN 'number'
        |      WHEN 'DOUBLE' THEN 'number' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'BOOLEAN' THEN 'boolean' WHEN 'ARRAY' THEN 'array'
        |      WHEN 'OBJECT' THEN 'object' WHEN 'NULL' THEN 'null' END AS wkind
        |  FROM b)
        |SELECT o_orderkey, wkind,
        |  CASE WHEN wkind = 'array' THEN CAST(json_extract(j, '$.w[0]') AS INT)
        |       WHEN wkind = 'number' THEN CAST(json_extract(j, '$.w') AS INT)
        |  END AS lax_w0_num,
        |  wkind = 'array' AS strict_w0_ok,
        |  CAST(json_extract(j, '$.w.y') AS INT) AS lax_wy_num,
        |  wkind = 'object' AS strict_wy_ok,
        |  CAST(CASE WHEN wkind = 'array' THEN json_array_length(j, '$.w')
        |       ELSE 1 END AS INT) AS lax_wsize,
        |  wkind = 'array' AS strict_wsize_ok
        |FROM k ORDER BY o_orderkey""".stripMargin,

    "q_jsonpath_arith" ->
      """WITH d AS (SELECT o_orderkey,
        |    o_orderkey % 7 AS x1, o_orderkey * 3 % 8 AS x2,
        |    o_orderkey * 5 % 9 AS x3,
        |    o_orderkey % 5 AS n,
        |    CAST(o_orderkey % 9 - 4 AS DOUBLE) + 0.5 AS f,
        |    '2024-01-' || lpad(CAST(o_orderkey % 28 + 1 AS VARCHAR), 2, '0')
        |      || 'T' || lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0')
        |      || ':30:00' AS ts
        |  FROM orders WHERE o_orderkey <= 300)
        |SELECT o_orderkey,
        |  COALESCE(array_to_string(
        |    [CAST(x AS VARCHAR) for x in [x1, x2, x3] if x % 2 = 0], ','), '')
        |    AS arith_filt,
        |  CAST(n * 2 + 1 AS BIGINT) AS arith_path,
        |  CAST(x3 AS BIGINT) AS last_x,
        |  CAST(x2 AS BIGINT) AS last_m1_x,
        |  CAST(-n AS BIGINT) AS neg_n,
        |  strptime(ts, '%Y-%m-%dT%H:%M:%S') AS dt,
        |  strptime(ts, '%Y-%m-%dT%H:%M:%S') < TIMESTAMP '2024-01-15 00:00:00'
        |    AS dt_lt,
        |  CAST(floor(f) AS BIGINT) AS f_floor,
        |  CAST(ceil(f) AS BIGINT) AS f_ceil,
        |  abs(f) AS f_abs
        |FROM d ORDER BY o_orderkey""".stripMargin,

    "q_jsonpath_strpred" ->
      """WITH d AS (SELECT o_orderkey,
        |    ['a' || CAST(o_orderkey % 10 AS VARCHAR),
        |     'ab' || CAST(o_orderkey % 3 AS VARCHAR),
        |     'pre_' || CAST(o_orderkey % 4 AS VARCHAR),
        |     'beta'] AS tags
        |  FROM orders WHERE o_orderkey <= 300)
        |SELECT o_orderkey,
        |  array_to_string(list_filter(tags,
        |    t -> regexp_matches(t, '^a[0-9]+$')), ',') AS like_regex_hits,
        |  array_to_string(list_filter(tags,
        |    t -> starts_with(t, 'pre')), ',') AS starts_with_hits,
        |  CAST(to_json([
        |    {'key': 'k' || CAST(o_orderkey % 2 AS VARCHAR),
        |     'value': CAST(o_orderkey % 11 AS INT)},
        |    {'key': 'm', 'value': CAST(o_orderkey % 13 AS INT)}])
        |    AS VARCHAR) AS kv_json,
        |  (o_orderkey % 13) > 6 AS m_gt6
        |FROM d ORDER BY o_orderkey""".stripMargin,

    "q_to_char_patterns" ->
      s"""SELECT o_orderkey,
         |  lpad(${g2("o_totalprice")}, 11, ' ') AS p_grouped,
         |  ${g2("o_totalprice")} AS p_fm,
         |  ' ' || printf('%010.2f', o_totalprice) AS p_zero,
         |  lpad(${g2("o_totalprice")}, 10, ' ') || '-' AS p_mi,
         |  CASE WHEN o_totalprice - 151000.0 < 0
         |    THEN '<' || lpad(${g2("151000.0 - o_totalprice")}, 10, ' ') || '>'
         |    ELSE ' ' || lpad(${g2("o_totalprice - 151000.0")}, 10, ' ') || ' '
         |  END AS p_pr,
         |  format('{:,}', o_orderkey) AS p_int,
         |  strftime(o_orderdate, '%Y-%m-%d') AS d_iso,
         |  strftime(o_orderdate, '%d %b %Y') AS d_mon,
         |  rpad(strftime(o_orderdate, '%A'), 9, ' ') AS d_day,
         |  CAST(quarter(o_orderdate) AS VARCHAR) || '-' ||
         |    strftime(o_orderdate, '%j') AS d_qddd
         |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,

    "q_to_char_time" ->
      """SELECT event_id,
        |  strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S') AS t_hms,
        |  strftime(CAST(ts AS TIMESTAMP), '%I %p') AS t_12,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M') AS t_full,
        |  strftime(CAST(ts AS TIMESTAMP), '%a %j') AS t_dy
        |FROM events WHERE event_id <= 500 ORDER BY event_id""".stripMargin,

    "q_regex_funcs" ->
      """SELECT p_partkey,
        |  array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
        |  CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INT) AS n_words,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_replace(p_brand, '[0-9]+', 'N', 'g') AS brand_norm,
        |  CAST(len(regexp_extract_all(p_brand, '[0-9]')) AS BIGINT) AS n_digits,
        |  regexp_matches(p_type, '^(ECONOMY|SMALL)') AS is_cheap_small,
        |  regexp_replace(p_name, '\bring\b', 'RING', 'g') AS ring_up
        |FROM part WHERE p_partkey <= 300 ORDER BY p_partkey""".stripMargin,

    "q_string_funcs3" ->
      """SELECT c_custkey,
        |  split_part(c_name, '#', -1) AS sp_last,
        |  split_part(c_name, '#', 1) AS sp_first,
        |  substr(c_name, 1, 9) || 'XXX' || substr(c_name, 13) AS ovl,
        |  translate(c_name, '0123456789', 'abcdefghij') AS tr,
        |  left(c_name, 8) || '|' || right(c_name, 3) AS lr,
        |  repeat(c_mktsegment, 2) AS rep,
        |  upper(substr(lower(c_mktsegment), 1, 1)) ||
        |    substr(lower(c_mktsegment), 2) AS ini,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS pos,
        |  CAST(ascii(c_mktsegment) AS BIGINT) AS asc,
        |  chr(65 + CAST(c_custkey % 26 AS INT)) AS chr_,
        |  trim(c_name, 'Cuser#01') AS btr,
        |  starts_with(c_name, 'Customer') AS sw,
        |  ends_with(c_name, '1') AS ew
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,

    "q_agg_filter_disc" ->
      s"""SELECT l_returnflag,
         |  CAST(COUNT(*) FILTER (WHERE l_quantity > 30) AS BIGINT) AS n_big,
         |  ${sqlDsum("l_extendedprice")} AS sum_all,
         |  CAST(SUM(CAST(round(l_extendedprice * 1000000.0, 0) AS BIGINT))
         |    FILTER (WHERE l_discount > 0.05) AS DOUBLE) / 1000000.0
         |    AS sum_discounted,
         |  list_sort(list(l_quantity))[CAST(ceil(0.5 * COUNT(*)) AS INT)]
         |    AS p50_disc,
         |  list_sort(list(l_quantity))[CAST(ceil(0.9 * COUNT(*)) AS INT)]
         |    AS p90_disc,
         |  CAST(bit_and(CAST(l_linenumber AS INT)) AS INT) AS bits_and,
         |  CAST(bit_or(CAST(l_linenumber AS INT)) AS INT) AS bits_or,
         |  CAST(bit_xor(CAST(l_linenumber AS INT)) AS INT) AS bits_xor,
         |  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
         |    AS statuses
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_at_time_zone" ->
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_id <= 300),
        |c AS (SELECT event_id, ts,
        |    CAST(timezone('America/New_York', ts) AS TIMESTAMP) AS ny_to_utc,
        |    timezone('Asia/Tokyo', CAST(ts AS TIMESTAMPTZ)) AS tokyo_wall,
        |    timezone('Europe/Berlin', CAST(ts AS TIMESTAMPTZ)) AS berlin_winter,
        |    timezone('Europe/Berlin',
        |      CAST(ts + INTERVAL 182 DAY AS TIMESTAMPTZ)) AS berlin_summer,
        |    ts + INTERVAL 182 DAY AS ts_summer
        |  FROM e)
        |SELECT event_id, ts, ny_to_utc, tokyo_wall, berlin_winter, berlin_summer,
        |  CAST((CAST(floor(epoch(ny_to_utc)) AS BIGINT)
        |    - CAST(floor(epoch(ts)) AS BIGINT)) // 3600 AS INT) AS ny_offset_h,
        |  CAST((CAST(floor(epoch(berlin_winter)) AS BIGINT)
        |    - CAST(floor(epoch(ts)) AS BIGINT)) // 3600 AS INT)
        |    AS berlin_winter_offset_h,
        |  CAST((CAST(floor(epoch(berlin_summer)) AS BIGINT)
        |    - CAST(floor(epoch(ts_summer)) AS BIGINT)) // 3600 AS INT)
        |    AS berlin_summer_offset_h
        |FROM c ORDER BY event_id""".stripMargin,

    "q_extract_parts" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |  CAST(isodow(o_orderdate) AS INT) AS isodow,
        |  CAST(week(o_orderdate) AS INT) AS iso_week,
        |  CAST(isoyear(o_orderdate) AS INT) AS isoyear,
        |  CAST(century(o_orderdate) AS INT) AS century,
        |  CAST(decade(o_orderdate) AS INT) AS decade
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "q_age_justify" ->
      """WITH p AS (
        |  SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS t1,
        |         CAST(max(ts) AS TIMESTAMP) AS t2
        |  FROM events WHERE user_id <= 100 GROUP BY user_id),
        |j AS (SELECT *,
        |    date_diff('microsecond', t1, t2) // 3600000000 AS th,
        |    (user_id % 5) - 2 AS mon_in,
        |    (user_id % 7) - 3 AS day_in,
        |    ((user_id % 50) - 25) * 3600000000 AS us_in FROM p),
        |j2 AS (SELECT *, us_in % 86400000000 AS t1j,
        |    day_in + (us_in - us_in % 86400000000) // 86400000000 AS day1
        |  FROM j),
        |j3 AS (SELECT *, mon_in + (day1 - day1 % 30) // 30 AS mon1,
        |    day1 % 30 AS day2 FROM j2),
        |j4 AS (SELECT *,
        |    CASE WHEN mon1 > 0 AND (day2 < 0 OR (day2 = 0 AND t1j < 0))
        |        THEN mon1 - 1
        |      WHEN mon1 < 0 AND (day2 > 0 OR (day2 = 0 AND t1j > 0))
        |        THEN mon1 + 1 ELSE mon1 END AS mon2,
        |    CASE WHEN mon1 > 0 AND (day2 < 0 OR (day2 = 0 AND t1j < 0))
        |        THEN day2 + 30
        |      WHEN mon1 < 0 AND (day2 > 0 OR (day2 = 0 AND t1j > 0))
        |        THEN day2 - 30 ELSE day2 END AS day3 FROM j3),
        |j5 AS (SELECT *,
        |    CASE WHEN day3 > 0 AND t1j < 0 THEN day3 - 1
        |      WHEN day3 < 0 AND t1j > 0 THEN day3 + 1 ELSE day3 END AS day4,
        |    CASE WHEN day3 > 0 AND t1j < 0 THEN t1j + 86400000000
        |      WHEN day3 < 0 AND t1j > 0 THEN t1j - 86400000000
        |      ELSE t1j END AS time2 FROM j4)
        |SELECT user_id,
        |  CAST(date_part('year', age(t2, t1)) AS INT) AS years,
        |  CAST(date_part('month', age(t2, t1)) AS INT) AS months,
        |  CAST(date_part('day', age(t2, t1)) AS INT) AS days,
        |  CAST(date_part('hour', age(t2, t1)) AS INT) AS hours,
        |  CAST(date_part('minute', age(t2, t1)) AS INT) AS minutes,
        |  th // 24 AS jh_days, th % 24 AS jh_hours,
        |  th // 24 // 30 AS jd_months, (th // 24) % 30 AS jd_days,
        |  mon2 AS ji_months, day4 AS ji_days,
        |  (time2 - time2 % 3600000000) // 3600000000 AS ji_hours
        |FROM j5 ORDER BY user_id""".stripMargin,

    "q_orafce_dates" ->
      """WITH b AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST((o_orderkey % 25) - 12 AS INT) AS n,
        |    CAST(o_orderkey % 7 AS INT) AS t,
        |    CAST(o_orderdate AS DATE) - CAST(o_orderkey % 100 AS INT) AS d2
        |  FROM orders WHERE o_orderkey <= 400)
        |SELECT o_orderkey, d,
        |  CASE WHEN d = last_day(d)
        |    THEN last_day(CAST(d + to_months(n) AS DATE))
        |    ELSE CAST(d + to_months(n) AS DATE) END AS am,
        |  last_day(d) AS lastd,
        |  d + CAST(((t - dayofweek(d) + 6) % 7 + 7) % 7 + 1 AS INT) AS nextd,
        |  round((year(d) - year(d2)) * 12 + (month(d) - month(d2)) +
        |    CASE WHEN day(d) = day(d2)
        |        OR (d = last_day(d) AND d2 = last_day(d2)) THEN 0
        |      ELSE (day(d) - day(d2)) / 31.0 END, 6) AS mb,
        |  CAST(date_trunc('month', d) AS DATE) AS tr_mm,
        |  CAST(date_trunc('quarter', d) AS DATE) AS tr_q,
        |  CAST(date_trunc('year', d) AS DATE) AS tr_yy,
        |  CAST(date_trunc('week', d) AS DATE) AS tr_iw,
        |  CASE WHEN day(d) >= 16
        |    THEN CAST(date_trunc('month', d + to_months(1)) AS DATE)
        |    ELSE CAST(date_trunc('month', d) AS DATE) END AS rnd_mm,
        |  CASE WHEN month(d) >= 7
        |    THEN CAST(date_trunc('year', d + to_months(12)) AS DATE)
        |    ELSE CAST(date_trunc('year', d) AS DATE) END AS rnd_yy
        |FROM b ORDER BY o_orderkey""".stripMargin,

    // known-answer oracle: every value is the reference regress's own
    // expected output (expected/orafce.out) or follows directly from
    // ora_instr's scan (overlapping occurrences counted; negative start
    // caps the 1-based position at min(len+start+1, len-len_pat+1))
    "q_orafce_instr" ->
      """SELECT * FROM (VALUES
        |  (1, 2), (2, 11), (3, 14), (4, 2), (5, 14),
        |  (6, 13), (7, 0), (8, 14), (9, 2), (10, 0)
        |) AS t(vec_id, inst) ORDER BY vec_id""".stripMargin,

    "q_to_number_roundtrip" ->
      s"""WITH r AS (
         |  SELECT o_orderkey, o_totalprice, o_orderdate,
         |    lpad(${g2("o_totalprice")}, 11, ' ') AS s_num,
         |    lpad(${g2("o_totalprice")}, 10, ' ') || '-' AS s_mi,
         |    strftime(o_orderdate, '%Y-%m-%d') AS s_date,
         |    strftime(o_orderdate, '%d %b %Y') AS s_mon
         |  FROM orders WHERE o_orderkey <= 300)
         |SELECT o_orderkey,
         |  CAST(replace(trim(s_num), ',', '') AS DOUBLE) AS n_back,
         |  CAST(replace(trim(s_num), ',', '') AS DOUBLE) = o_totalprice AS n_exact,
         |  CASE WHEN s_mi LIKE '%-'
         |    THEN -CAST(replace(trim(substr(s_mi, 1, length(s_mi) - 1)), ',', '') AS DOUBLE)
         |    ELSE CAST(replace(replace(trim(s_mi), ',', ''), '-', '') AS DOUBLE)
         |  END AS mi_back,
         |  CAST(strptime(s_date, '%Y-%m-%d') AS DATE) AS d_back,
         |  CAST(strptime(s_mon, '%d %b %Y') AS DATE) AS mon_back,
         |  CAST(strptime(s_mon, '%d %b %Y') AS DATE)
         |    = CAST(o_orderdate AS DATE) AS d_exact
         |FROM r ORDER BY o_orderkey""".stripMargin,

    "q_json_funcs2" ->
      s"""WITH base AS (
         |  SELECT c_custkey, $jSql AS j
         |  FROM customer WHERE c_custkey <= 200)
         |SELECT c_custkey,
         |  CAST(json_extract(j, '$$.meta.nation') AS INT) AS nat,
         |  json_extract_string(j, '$$.tags[1]') AS tag1,
         |  json_extract_string(j, '$$.meta.vip') = 'true' AS vip,
         |  json_extract_string(j, '$$.seg') AS seg2,
         |  array_to_string(json_keys(j, '$$.meta'), ',') AS meta_keys,
         |  json_extract_string(j, '$$.tags[0]') = 't1' OR
         |    json_extract_string(j, '$$.tags[1]') = 't1' AS has_t1
         |FROM base ORDER BY c_custkey""".stripMargin,

    "q_json_each" ->
      s"""WITH base AS (
         |  SELECT c_custkey, $jSql AS j
         |  FROM customer WHERE c_custkey <= 50),
         |tags AS (
         |  SELECT c_custkey, 'tag' AS kind, CAST(i.i AS VARCHAR) AS k,
         |    json_extract_string(j, '$$.tags[' || i.i || ']') AS v
         |  FROM base, (SELECT unnest(range(0, 2)) AS i) i),
         |metas AS (
         |  SELECT c_custkey, 'meta' AS kind, k.k AS k,
         |    json_extract_string(j, '$$.meta.' || k.k) AS v
         |  FROM base, (SELECT unnest(['nation', 'vip']) AS k) k)
         |SELECT * FROM tags UNION ALL SELECT * FROM metas
         |ORDER BY c_custkey, kind, k""".stripMargin
  )
}
