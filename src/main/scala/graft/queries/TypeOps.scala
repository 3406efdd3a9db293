package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** PG type-operator families beyond the scalar-function core —
  * re-expressed as plan-side arithmetic (every one of these is a plain
  * codegen'd expression; no UDFs, no custom types on the wire):
  *
  *  - `date_bin` / arbitrary-width time bucketing
  *    (`/root/reference/src/backend/utils/adt/timestamp.c` date_bin;
  *    oracle = DuckDB's NATIVE time_bucket with origin);
  *  - range types (`utils/adt/rangetypes.c`): half-open [lo, hi) ranges
  *    as (lo, hi) pairs — overlap, containment, intersection, adjacency
  *    in canonical form;
  *  - inet/cidr (`utils/adt/network.c`): IPv4 as uint32 arithmetic —
  *    dotted rendering, /24 network, broadcast, same-subnet joins;
  *  - LIKE variants (`utils/adt/like.c`): ILIKE and ESCAPE.
  */
object TypeOps extends QueryModule {

  /** 2024-01-01 00:30:00 UTC in epoch micros (bin origin). */
  private val originUs = 1704069000000000L
  private val binUs = 90L * 60 * 1000000 // 90 minutes

  private def ipNum: Column =
    (lit(10L * (1L << 24)) +
      pmod(col("c_custkey"), lit(256)) * (1 << 16) +
      col("c_nationkey") * 256 +
      pmod(col("c_custkey") * 7, lit(251))).cast("long")

  private val ipNumSql =
    """(CAST(10 * 16777216 AS BIGINT) + (c_custkey % 256) * 65536
      | + c_nationkey * 256 + (c_custkey * 7 % 251))""".stripMargin

  private def dotted(ip: Column): Column = concat_ws(".",
    (shiftright(ip, 24) % 256).cast("int"), (shiftright(ip, 16) % 256).cast("int"),
    (shiftright(ip, 8) % 256).cast("int"), (ip % 256).cast("int"))

  private def dottedSql(ip: String): String =
    s"CAST(($ip >> 24) & 255 AS VARCHAR) || '.' || CAST(($ip >> 16) & 255 AS VARCHAR)" +
      s" || '.' || CAST(($ip >> 8) & 255 AS VARCHAR) || '.' || CAST($ip & 255 AS VARCHAR)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // date_bin: floor events into 90-minute buckets anchored at an
    // arbitrary origin (NOT a calendar unit — date_trunc can't express
    // it). pmod keeps the delta floor-correct on either side of the
    // origin; oracle is DuckDB's native time_bucket(width, ts, origin).
    "q_date_bin" -> ((s, dir) => {
      val delta = unix_micros(col("ts")) - originUs
      val bin = timestamp_micros(lit(originUs) + (delta - pmod(delta, lit(binUs))))
      t(s, dir, "events")
        .withColumn("bin_start", bin)
        .groupBy(col("bin_start"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .orderBy(col("bin_start"))
    }),

    // Half-open [lo, hi) int ranges in canonical form: overlap,
    // point containment, intersection (empty -> NULL pair), adjacency.
    "q_range_ops" -> ((s, dir) => {
      val lo1 = pmod(col("o_orderkey"), lit(100)).cast("int")
      val hi1 = lo1 + 10
      val lo2 = pmod(col("o_custkey"), lit(100)).cast("int")
      val hi2 = lo2 + 15
      val overlaps = lo1 < hi2 && lo2 < hi1
      t(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          lo1.as("lo1"), hi1.as("hi1"), lo2.as("lo2"), hi2.as("hi2"),
          overlaps.as("overlaps"),
          (lo1 <= lit(42) && lit(42) < hi1).as("contains_42"),
          when(overlaps, greatest(lo1, lo2)).as("ix_lo"),
          when(overlaps, least(hi1, hi2)).as("ix_hi"),
          (hi1 === lo2 || hi2 === lo1).as("adjacent"),
          (least(lo1, lo2)).as("span_lo"), (greatest(hi1, hi2)).as("span_hi"))
        .orderBy(col("o_orderkey"))
    }),

    // contrib/seg float segments (`/root/reference/contrib/seg/seg.c`,
    // regress `contrib/seg/sql/seg.sql`): CLOSED intervals built with
    // the +/- uncertainty form (value ± delta), vs the half-open range
    // family above — endpoints are inclusive, so touching segments
    // OVERLAP here, a degenerate point segment is legal, and seg's
    // directional operator set (<< strictly-left, >> strictly-right,
    // &< over-left, &> over-right) has no range-type counterpart.
    // seg1 = retail price ± 2%, seg2 = the part's brand-average price
    // ± 5% (broadcast agg join). All endpoint math stays in exact
    // integer micros (price 2dp x 2dp factors), so every comparison is
    // integer-exact; the rendered seg text is the '..' display form.
    "q_seg_ops" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val brandAvg = p.groupBy(col("p_brand"))
        .agg(davg(col("p_retailprice")).as("b_avg"))
      val a_lo = round(col("p_retailprice") * 980000.0, 0).cast("long")
      val a_hi = round(col("p_retailprice") * 1020000.0, 0).cast("long")
      val b_lo = round(col("b_avg") * 950000.0, 0).cast("long")
      val b_hi = round(col("b_avg") * 1050000.0, 0).cast("long")
      p.filter(col("p_partkey") <= 400)
        .join(broadcast(brandAvg), Seq("p_brand"))
        .select(col("p_partkey"),
          (a_lo.cast("double") / 1000000.0).as("a_lo"),
          (a_hi.cast("double") / 1000000.0).as("a_hi"),
          (b_lo.cast("double") / 1000000.0).as("b_lo"),
          (b_hi.cast("double") / 1000000.0).as("b_hi"),
          (a_lo <= b_hi && b_lo <= a_hi).as("overlaps"),
          (a_hi < b_lo).as("strictly_left"),
          (a_lo > b_hi).as("strictly_right"),
          (a_hi <= b_hi).as("over_left"),
          (a_lo >= b_lo).as("over_right"),
          (a_lo <= b_lo && a_hi >= b_hi).as("contains_b"),
          when(a_lo <= b_hi && b_lo <= a_hi,
            greatest(a_lo, b_lo).cast("double") / 1000000.0).as("ix_lo"),
          when(a_lo <= b_hi && b_lo <= a_hi,
            least(a_hi, b_hi).cast("double") / 1000000.0).as("ix_hi"),
          concat(format_string("%.6f", a_lo.cast("double") / 1000000.0),
            lit(" .. "),
            format_string("%.6f", a_hi.cast("double") / 1000000.0))
            .as("seg_text"))
        .orderBy(col("p_partkey"))
    }),

    // Multirange types + range_agg (`/root/reference/src/backend/utils/
    // adt/multirangetypes.c`; range_agg in `rangetypes_*`): each event
    // contributes a 5-minute activity interval [minute, minute+5); per
    // user the intervals aggregate into the CANONICAL multirange —
    // overlapping and touching ranges merged, exactly pg's discrete-
    // range canonicalization ([1,3) + [3,5) = [1,5)). Merging runs as
    // the distributed gaps-and-islands shape (running-max window +
    // island sum) rather than a per-row fold: at 100 TB the ranges of
    // one key arrive as ROWS, and
    // a window over (user, lo) is the shuffle-minimal canonicalization —
    // one partition-by-user exchange, no driver state. Emitted: the
    // multirange rendered as JSON (its canonical form), range count,
    // covered length, span, and the has-gap predicate.
    "q_multirange_agg" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val r = t(s, dir, "events")
        .select(col("user_id"),
          (unix_timestamp(col("ts")) / 60).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 5)
      val w = Window.partitionBy(col("user_id")).orderBy(col("lo"), col("hi"))
      val prevMax = max(col("hi"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      val isles = r
        .withColumn("new_isle",
          when(prevMax.isNull || col("lo") > prevMax, 1).otherwise(0))
        .withColumn("isle", sum(col("new_isle"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("isle"))
        .agg(min(col("lo")).as("mlo"), max(col("hi")).as("mhi"))
      isles.groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("mlo").as("lo"),
               col("mhi").as("hi")))).as("mr"),
             sum(col("mhi") - col("mlo")).as("covered_min"),
             min(col("mlo")).as("first_lo"), max(col("mhi")).as("last_hi"))
        .select(col("user_id"),
          size(col("mr")).as("n_ranges"),
          col("covered_min"), col("first_lo"), col("last_hi"),
          (col("covered_min") < col("last_hi") - col("first_lo"))
            .as("has_gap"),
          to_json(slice(col("mr"), 1, 4)).as("mr_head"))
        .orderBy(col("user_id"))
    }),

    // Fuzzy string matching — contrib/pg_trgm (trigram extraction +
    // similarity(), the `%` operator at the default 0.3 limit) and
    // contrib/fuzzystrmatch levenshtein()
    // (`/root/reference/contrib/pg_trgm/trgm_op.c` generate_trgm:
    // lowercase, split on non-alnum, pad "  w ", char 3-grams, distinct;
    // `/root/reference/contrib/fuzzystrmatch/levenshtein.c`), plus a
    // contrib/citext-style case-insensitive equality. similarity is the
    // rational |A∩B|/|A∪B| kept in exact half-up micros. All per-row
    // array/codegen expressions — no shuffle.
    "q_trgm_fuzzy" -> ((s, dir) => {
      def trgmSet(s0: Column): Column = {
        val words = filter(split(lower(s0), "[^a-z0-9]+"), w => length(w) > 0)
        array_distinct(flatten(transform(words, w => {
          val p = concat(lit("  "), w, lit(" "))
          transform(sequence(lit(1), length(p) - lit(2)),
            i => p.substr(i, lit(3)))
        })))
      }
      val probe = "Customer#000000100"
      val own = trgmSet(col("c_name"))
      val ref = trgmSet(lit(probe))
      val inter = size(array_intersect(own, ref))
      val uni = size(array_union(own, ref))
      t(s, dir, "customer").filter(col("c_custkey") <= 200)
        .withColumn("inter", inter.cast("long"))
        .withColumn("uni", uni.cast("long"))
        .select(col("c_custkey"),
          levenshtein(col("c_name"), lit(probe)).as("lev"),
          size(own).as("n_trgm"),
          expr("(2000000 * inter + uni) div (2 * uni)").as("sim_u"),
          (expr("(2000000 * inter + uni) div (2 * uni)") >= 300000L)
            .as("is_match"), // pg_trgm default similarity limit 0.3
          (lower(col("c_name")) === lower(lit("CUSTOMER#000000100")))
            .as("ci_eq"))
        .orderBy(col("c_custkey"))
    }),

    // pg_trgm's KNN face (trgm_op.c similarity_dist; the `<->` distance
    // operator a GiST index serves for `ORDER BY name <-> query`
    // nearest-neighbor): distance = 1 - similarity kept exact as
    // 1e6 - sim_u, top-10 nearest names to the probe via bounded top-k
    // (TakeOrderedAndProject — at scale the index analogue is the LSH
    // banding the Dedup family uses; this is the exact-ranking lane).
    // show_trgm's rendering (the sorted trigram list) rides along, so
    // the hash compare pins the exact trigram SETS, not just counts.
    "q_trgm_dist" -> ((s, dir) => {
      def trgmSet(s0: Column): Column = {
        val words = filter(split(lower(s0), "[^a-z0-9]+"), w => length(w) > 0)
        array_distinct(flatten(transform(words, w => {
          val p = concat(lit("  "), w, lit(" "))
          transform(sequence(lit(1), length(p) - lit(2)),
            i => p.substr(i, lit(3)))
        })))
      }
      val probe = "Customer#000000042"
      val own = trgmSet(col("c_name"))
      val ref = trgmSet(lit(probe))
      t(s, dir, "customer").filter(col("c_custkey") <= 500)
        .withColumn("inter", size(array_intersect(own, ref)).cast("long"))
        .withColumn("uni", size(array_union(own, ref)).cast("long"))
        .withColumn("sim_u", expr("(2000000 * inter + uni) div (2 * uni)"))
        .select(col("c_custkey"),
          (lit(1000000L) - col("sim_u")).as("dist_u"),
          array_join(array_sort(own), " ").as("show_trgm"))
        .orderBy(col("dist_u"), col("c_custkey")).limit(10)
    }),

    // Collation-aware comparison/grouping/ordering (the reference's
    // per-column collations, `/root/reference/src/backend/utils/adt/
    // varlena.c` varstr_cmp + pg_collation catalog; citext is the
    // degenerate case): Spark 4's native collation machinery —
    // `collate(s, 'UTF8_LCASE')` makes equality, GROUP BY, ORDER BY and
    // predicates case-insensitive WITHOUT rewriting values through
    // lower() (the collation travels in the type, exactly like a PG
    // column collation). Mixed-case variants are derived
    // deterministically from the key; groups/aggregates are reported
    // via case-stable representatives so the oracle (which recomputes
    // with lower()) hash-matches.
    "q_collation" -> ((s, dir) => {
      val base = t(s, dir, "customer").filter(col("c_custkey") <= 300)
        .withColumn("seg_mixed",
          when(col("c_custkey") % 3 === 0, lower(col("c_mktsegment")))
            .when(col("c_custkey") % 3 === 1, initcap(lower(col("c_mktsegment"))))
            .otherwise(col("c_mktsegment")))
      base
        .withColumn("seg_ci", expr("collate(seg_mixed, 'UTF8_LCASE')"))
        .groupBy(col("seg_ci"))
        .agg(count(lit(1)).as("n"),
             min(col("seg_mixed")).as("first_variant"),
             countDistinct(col("seg_mixed")).as("n_case_variants"),
             sum(when(expr("seg_ci = collate('building', 'UTF8_LCASE')"), 1L)
                   .otherwise(0L)).as("n_eq_building"))
        .select(upper(col("seg_ci")).as("seg"), col("n"),
                col("first_variant"), col("n_case_variants"),
                col("n_eq_building"))
        .orderBy(col("seg"))
    }),

    // contrib/fuzzystrmatch soundex() + difference()
    // (`/root/reference/contrib/fuzzystrmatch/fuzzystrmatch.c:725-771,
    // 773-798`): PG's SIMPLE soundex variant — first letter kept, then
    // the code of every alpha char is appended when it differs from the
    // PREVIOUS CHARACTER's code and is non-zero (h/w and vowels code to
    // '0', so they separate but never emit; Ashcraft -> A226, NOT the
    // h/w-transparent A261 of the "standard" algorithm). Implemented as
    // the exact algorithm in pure codegen expressions (translate + one
    // higher-order pass over positions) rather than Spark's builtin
    // soundex, which implements the other variant. difference() counts
    // positionally equal soundex chars (0-4). Oracle = known-answer
    // vectors from an independent port of the C, covering the PG regress
    // names (Anne/Ann, leading blanks, apostrophes, h/w clusters).
    "q_fuzzy_soundex" -> ((s, dir) => {
      import s.implicits._
      val tbl = "01230120022455012623010202"
      def sdx(src: Column): Column = {
        val u = upper(regexp_replace(src, "^[^A-Za-z]+", ""))
        val cs = translate(u, ('A' to 'Z').mkString, tbl)
        // digits at positions 2..len whose code differs from the previous
        // CHARACTER's code and is non-zero; first 3 survive (the C stops
        // at 4 total), zero-padded
        val digits = array_join(
          filter(
            transform(sequence(lit(2), greatest(length(u), lit(2))),
              i => when(i <= length(u) &&
                        u.substr(i, lit(1)).rlike("[A-Z]") &&
                        cs.substr(i, lit(1)) =!= cs.substr(i - 1, lit(1)) &&
                        cs.substr(i, lit(1)) =!= "0",
                        cs.substr(i, lit(1))).otherwise(lit(""))),
            x => x =!= ""), "")
        when(length(u) === 0, lit(""))
          .otherwise(rpad(concat(u.substr(lit(1), lit(1)),
                                 substring(digits, 1, 3)), 4, "0"))
      }
      def diff(a: Column, b: Column): Column =
        size(filter(sequence(lit(1), lit(4)),
          i => a.substr(i, lit(1)) === b.substr(i, lit(1))))
      Seq((1, "Robert"), (2, "Rupert"), (3, "Ashcraft"), (4, "Ashcroft"),
          (5, "Tymczak"), (6, "Pfister"), (7, "Washington"), (8, "Lee"),
          (9, "Gutierrez"), (10, "Jackson"), (11, "Anne"), (12, "Ann"),
          (13, "  Smith"), (14, "O'Brien"))
        .toDF("name_id", "name")
        .select(col("name_id"),
          sdx(col("name")).as("sdx"),
          diff(sdx(col("name")), sdx(lit("Robert"))).as("diff_robert"))
        .orderBy(col("name_id"))
    }),

    // contrib/fuzzystrmatch levenshtein_less_equal + levenshtein with
    // costs (`/root/reference/contrib/fuzzystrmatch/fuzzystrmatch.c:146-249`
    // → varstr_levenshtein[_less_equal]). Two lanes in one relation:
    //  - real data (adjacent part names): Spark's BUILTIN banded
    //    `levenshtein(a, b, k)` (codegen, O(k·min(m,n)) like the
    //    reference's less_equal early-exit band); its -1-over-threshold
    //    is remapped to k+1 — the value PG's regress pins
    //    (('extensive','exhaustive',2) → 3);
    //  - known-answer vectors for the WEIGHTED form (ins/del/sub
    //    costs), evaluated by a nested higher-order-`aggregate`
    //    Wagner-Fischer DP — the full recurrence as one expression
    //    tree, no UDF. Per-row cost columns; expected values from an
    //    independent Python DP (regress anchor: GUMBO→GAMBOL with
    //    ins=2,del=1,sub=1 → 3). The real lane runs the SAME DP at
    //    unit costs, so DP ≡ builtin is also proven on fixture data.
    "q_fuzzy_levenshtein" -> ((s, dir) => {
      import s.implicits._
      def emptyInts = array().cast("array<int>")
      // dp row i over target prefixes; state = array<int> of n+1 cells
      def wlev(a: Column, b: Column, iC: Column, dC: Column,
               sC: Column): Column = {
        val n = length(b)
        val outer = when(length(a) > 0, sequence(lit(1), length(a)))
          .otherwise(emptyInts)
        val inner = when(n > 0, sequence(lit(1), n)).otherwise(emptyInts)
        aggregate(
          outer,
          transform(sequence(lit(0), n), j => j * iC),
          (prev, i) => aggregate(
            inner,
            array(i * dC),
            (row, j) => concat(row, array(least(
              element_at(prev, j + 1) + dC,
              element_at(row, j) + iC,
              element_at(prev, j) +
                when(a.substr(i, lit(1)) === b.substr(j, lit(1)), lit(0))
                  .otherwise(sC))))),
          row => element_at(row, n + 1))
      }
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val real = p.as("a").filter(col("p_partkey") <= 120)
        .join(p.as("b"), col("b.p_partkey") === col("a.p_partkey") + 1)
        .select(col("a.p_partkey").cast("int").as("pair_id"),
          col("a.p_name").as("src"), col("b.p_name").as("tgt"),
          lit(1).as("ins_c"), lit(1).as("del_c"), lit(1).as("sub_c"))
      val vecs = Seq(
        (1001, "GUMBO", "GAMBOL", 2, 1, 1), (1002, "GUMBO", "GAMBOL", 1, 1, 1),
        (1003, "extensive", "exhaustive", 1, 1, 1),
        (1004, "kitten", "sitting", 1, 1, 1), (1005, "kitten", "sitting", 3, 2, 5),
        (1006, "Saturday", "Sunday", 1, 1, 1), (1007, "Saturday", "Sunday", 2, 3, 4),
        (1008, "levenshtein", "frankenstein", 1, 1, 1),
        (1009, "levenshtein", "frankenstein", 5, 2, 3),
        (1010, "", "abc", 4, 7, 2), (1011, "abc", "", 4, 7, 2),
        (1012, "flaw", "lawn", 1, 1, 2))
        .toDF("pair_id", "src", "tgt", "ins_c", "del_c", "sub_c")
      val lv3 = levenshtein(col("src"), col("tgt"), 3)
      real.unionByName(vecs)
        .select(col("pair_id"), col("src"), col("tgt"),
          col("ins_c"), col("del_c"), col("sub_c"),
          levenshtein(col("src"), col("tgt")).as("lev"),
          when(lv3 < 0, lit(4)).otherwise(lv3).as("lev_le3"),
          wlev(col("src"), col("tgt"), col("ins_c"), col("del_c"),
               col("sub_c")).as("lev_w"))
        .orderBy(col("pair_id"))
    }),

    // contrib/fuzzystrmatch metaphone()
    // (`/root/reference/contrib/fuzzystrmatch/fuzzystrmatch.c:344-700`):
    // the [[graft.functions.MetaphoneKernel]] codegen kernel at two
    // output lengths, over vectors covering every rule branch (digraphs,
    // GH/GN silencing, SCHW, CIA/TIA/SIO, initial-letter specials,
    // duplicate drop, non-alpha skip). Oracle = known-answer values from
    // an independent Python port of the C, anchored on the reference's
    // own regress vector metaphone('GUMBO',4)='KM'.
    "q_fuzzy_metaphone" -> ((s, dir) => {
      import s.implicits._
      graft.functions.MetaphoneFns.register(s)
      Seq((1, "GUMBO"), (2, "Thompson"), (3, "Thomas"), (4, "school"),
          (5, "Christ"), (6, "Schwartz"), (7, "knight"), (8, "gnome"),
          (9, "gnat"), (10, "light"), (11, "laughter"), (12, "rough"),
          (13, "through"), (14, "science"), (15, "scene"),
          (16, "discipline"), (17, "special"), (18, "ambition"),
          (19, "nation"), (20, "judge"), (21, "pledge"), (22, "magic"),
          (23, "wright"), (24, "whale"), (25, "where"), (26, "xylophone"),
          (27, "axiom"), (28, "box"), (29, "quick"), (30, "phone"),
          (31, "vision"), (32, "session"), (33, "asia"), (34, "pizza"),
          (35, "jazz"), (36, "czar"), (37, "ache"), (38, "aeon"),
          (39, "Anne"), (40, "ocean"), (41, "resigned"), (42, "signature"),
          (43, "bomb"), (44, "lamb"), (45, "psychology"),
          (46, "aggressive"), (47, "WAter"), (48, "  42nd-street"),
          (49, "McCarthy"), (50, "O'Brien"))
        .toDF("word_id", "word")
        .select(col("word_id"), col("word"),
          expr("metaphone(word, 4)").as("mp4"),
          expr("metaphone(word, 10)").as("mp10"))
        .orderBy(col("word_id"))
    }),

    // IPv4-as-uint32 inet family: dotted text, /24 network + broadcast,
    // subnet membership, and a same-subnet self-join aggregated per /24.
    "q_inet_ops" -> ((s, dir) => {
      val ip = ipNum
      val net = ip - pmod(ip, lit(256)) // /24 network address
      t(s, dir, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey"),
          dotted(ip).as("ip"),
          dotted(net).as("network24"),
          dotted(net + 255).as("broadcast24"),
          (net === lit(10L * (1L << 24) + 5L * (1 << 16) + 3L * 256))
            .as("in_10_5_3_0"),
          pmod(ip, lit(256)).cast("int").as("host_part"))
        .orderBy(col("c_custkey"))
    }),

    // Same-/24 peer counts: the inet equi-join (network address is the
    // join key — subnet matching is a hash join, never a range scan).
    "q_inet_subnet_join" -> ((s, dir) => {
      val base = t(s, dir, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"), ipNum.as("ip"))
        .withColumn("net", col("ip") - pmod(col("ip"), lit(256)))
      base.groupBy(col("net"))
        .agg(count(lit(1)).as("n_hosts"),
             countDistinct(col("ip")).as("n_distinct_ips"))
        .select(dotted(col("net")).as("network24"),
                col("n_hosts"), col("n_distinct_ips"),
                (col("n_hosts") > 1).as("has_peers"))
        .orderBy(col("n_hosts").desc, col("network24"))
        .limit(50)
    }),

    // Null-safe comparison (IS [NOT] DISTINCT FROM — PG's null-aware
    // equality, pervasive in upsert/dedup predicates). Spark's <=> is the
    // same operator; NULLs injected from a CASE so every combination
    // (val=val, val=NULL, NULL=NULL) occurs.
    "q_null_safe_cmp" -> ((s, dir) => {
      val a = when(col("c_acctbal") < 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal"))
      val b = when(pmod(col("c_custkey"), lit(3)) === 0, lit(null).cast("double"))
        .otherwise(col("c_acctbal"))
      t(s, dir, "customer").filter(col("c_custkey") <= 300)
        .select(col("c_custkey"),
          a.as("a"), b.as("b"),
          (a <=> b).as("nsafe_eq"),
          (!(a <=> b)).as("is_distinct"),
          (a <=> lit(null)).as("a_is_null"),
          (coalesce(a, lit(-1.0)) === coalesce(b, lit(-1.0))).as("coalesce_eq"))
        .orderBy(col("c_custkey"))
    }),

    // ILIKE + LIKE ... ESCAPE (like.c): case-insensitive match and
    // escaped literal % / _ wildcards.
    "q_ilike_escape" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") <= 200)
        .withColumn("tagged", concat(lit("100%_"), col("c_mktsegment")))
        .select(col("c_custkey"),
          expr("c_name ILIKE 'customer#%'").as("ilike_hit"),
          expr("c_mktsegment ILIKE '%ing%'").as("ilike_mid"),
          expr("tagged LIKE '100\\\\%\\\\_%' ESCAPE '\\\\'").as("esc_hit"),
          expr("tagged LIKE '100%' ESCAPE '\\\\'").as("esc_prefix"),
          (!col("c_name").like("%Z%")).as("not_like"))
        .orderBy(col("c_custkey"))
    }),

    // LIKE ANY / LIKE ALL quantified pattern lists — the GP extension
    // (`/root/reference/src/backend/parser/gram.y` a_expr LIKE ANY/ALL
    // productions; PG scalar-array-op path `scalararrayop`): Spark SQL
    // carries the same syntax natively; the oracle expands the quantifier
    // into the OR/AND normal form, which pins the semantics rather than
    // the parser.
    "q_like_quantified" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") <= 400)
        .select(col("p_partkey"), col("p_name"),
          expr("p_name LIKE ANY ('%widget%', '%bolt%')").as("any_hit"),
          expr("p_name LIKE ALL ('%e%', '%l%')").as("all_hit"),
          expr("p_name NOT LIKE ANY ('%blue%', '%cold%')").as("not_any"),
          expr("p_name NOT LIKE ALL ('%blue%', '%cold%')").as("not_all"))
        .orderBy(col("p_partkey"))
    }),

    // SQL-standard SIMILAR TO dialect (similar_escape, regexp.c:687-775):
    // LIKE wildcards + POSIX operators, whole-string match, `.` literal.
    // Translated plan-side by SimilarTo.toRegex into an anchored rlike
    // (codegen'd); the oracle uses regexp_full_match with HAND-derived
    // regexes (DuckDB's own SIMILAR TO is a raw-regex full match, not the
    // SQL dialect), so the translator is cross-checked by an independent
    // derivation, not itself.
    "q_similar_to" -> ((s, dir) => {
      import graft.functions.SimilarTo.similarTo
      t(s, dir, "part").filter(col("p_partkey") <= 500)
        .withColumn("tagged", concat(lit("100%_"), col("p_type")))
        .select(col("p_partkey"),
          similarTo(col("p_name"), "%ring").as("sim_suffix"),
          similarTo(col("p_type"), "(ECONOMY|STANDARD)%").as("sim_alt_prefix"),
          similarTo(col("p_name"), "%(red|blue|green)%").as("sim_mid_alt"),
          similarTo(col("p_brand"), "Brand#_").as("sim_underscore"),
          similarTo(col("p_name"), "(red|blue|hot) (widget|bolt|gear)").as("sim_enum"),
          similarTo(col("p_name"), "[a-z ]+").as("sim_class_plus"),
          similarTo(col("p_brand"), "Brand#[0-9]{2}").as("sim_bound"),
          similarTo(col("p_type"), "SM?ALL").as("sim_opt"),
          similarTo(col("tagged"), "100\\%\\_%").as("sim_escaped"),
          similarTo(col("p_name"), "%.%").as("sim_literal_dot"))
        .orderBy(col("p_partkey"))
    }),

    // contrib/ltree hierarchical label paths (`/root/reference/contrib/
    // ltree/ltree_op.c` @>/nlevel/subltree, `lquery` matching in
    // `lquery_op.c`): each customer is a leaf
    // 'root.r<region>.n<nation>.c<custkey>'; the query shows
    //  - nlevel / subltree as split/slice expressions,
    //  - the ANCESTOR operator (prefix @> leaf) executed as an EQUI-join
    //    on the extracted ancestor-level subpath — the gist-ltree-index
    //    shape (one shuffle, no theta-join); the oracle runs the naive
    //    `leaf LIKE prefix || '.%'` definition, so the hash compare
    //    PROVES the decomposition equivalent,
    //  - two lquery patterns compiled to anchored regexes (shared
    //    verbatim with the oracle): 'root.*.n5.*' (any depth between)
    //    and 'root.r1|r2.*' (level alternation).
    // ltree lca() (`/root/reference/contrib/ltree/ltree_op.c` lca —
    // longest common ancestor of label paths): per customer pair (a
    // customer's hierarchy leaf vs its successor's), the longest common
    // prefix of the label arrays. Prefix equality is monotone in the
    // prefix length, so lca depth = COUNT of i with a[1..i] == b[1..i]
    // — a per-row array fold both engines express identically; lca ''
    // (no common root) renders NULL like the reference's lca on
    // disjoint trees (cannot happen here: all paths share 'root', also
    // asserted by min_depth >= 1).
    "q_ltree_lca" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val leaves = t(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          concat(lit("root.r"), col("n_regionkey"),
            lit(".n"), col("c_nationkey"),
            lit(".c"), col("c_custkey")).as("leaf"))
        .filter(col("c_custkey") <= 200)
      val b = leaves.select((col("c_custkey") - 1).as("c_custkey"),
        col("leaf").as("leaf_b"))
      leaves.join(b, "c_custkey")
        .withColumn("pa", split(col("leaf"), "\\."))
        .withColumn("pb", split(col("leaf_b"), "\\."))
        .withColumn("depth", expr(
          "size(filter(sequence(1, least(size(pa), size(pb))), " +
            "i -> slice(pa, 1, i) = slice(pb, 1, i)))"))
        .select(col("c_custkey"),
          array_join(slice(col("pa"), lit(1), col("depth").cast("int")), ".")
            .as("lca"),
          col("depth").cast("int").as("lca_depth"))
        .orderBy(col("c_custkey"))
    }),

    "q_ltree_paths" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey"))
      val leaves = t(s, dir, "customer")
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(concat(lit("root.r"), col("n_regionkey"),
          lit(".n"), col("c_nationkey"),
          lit(".c"), col("c_custkey")).as("leaf"))
      val lq1 = "^root(\\.[^.]+)*\\.n5(\\.[^.]+)*$"
      val lq2 = "^root\\.(r1|r2)(\\.[^.]+)*$"
      leaves
        .withColumn("parts", split(col("leaf"), "\\."))
        .withColumn("prefix", array_join(slice(col("parts"), 1, 3), "."))
        .groupBy(col("prefix"))
        .agg(count(lit(1)).as("n_desc"),
             sum(when(col("leaf").rlike(lq1), 1L).otherwise(0L)).as("n_lq_n5"),
             sum(when(col("leaf").rlike(lq2), 1L).otherwise(0L)).as("n_lq_r12"),
             min(col("leaf")).as("min_leaf"),
             max(size(col("parts"))).cast("int").as("leaf_nlevel"))
        .withColumn("prefix_nlevel", size(split(col("prefix"), "\\.")).cast("int"))
        .withColumn("subpath_1_2",
          array_join(slice(split(col("prefix"), "\\."), 2, 1), "."))
        .orderBy(col("prefix"))
    }),

    // contrib/intarray operator set (`/root/reference/contrib/intarray/
    // _int_op.c` sort/uniq/icount/idx, `_int_bool.c` &&/@>, `_intbig`):
    // per-order quantity arrays with sort, uniq (distinct-on-sorted),
    // icount, idx (1-based position, 0 when absent — pg convention,
    // Spark's native array_position semantics; the oracle coalesces
    // DuckDB's NULL to match), overlap/containment against probe sets,
    // append (+) and remove-all (-). Arrays are rendered as joined
    // strings (nested outputs are driver-unhashable — the lint's rule).
    "q_intarray_ops" -> ((s, dir) => {
      val arr = sort_array(collect_list(col("l_quantity").cast("int")))
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 500)
        .groupBy(col("l_orderkey"))
        .agg(arr.as("a"))
        .select(col("l_orderkey"),
          array_join(col("a"), ",").as("sorted"),
          array_join(array_distinct(col("a")), ",").as("uniq"),
          size(col("a")).as("icount"),
          array_position(col("a"), 10).cast("int").as("idx_10"),
          arrays_overlap(col("a"), array(lit(1), lit(5), lit(10))).as("ovl_1_5_10"),
          expr("forall(array(5, 10), x -> array_contains(a, x))").as("has_5_10"),
          array_join(concat(col("a"), array(lit(99))), ",").as("plus_99"),
          array_join(array_remove(col("a"), 10), ",").as("minus_10"))
        .orderBy(col("l_orderkey"))
    }),

    // pg_trgm word_similarity / strict_word_similarity (the `<%` and
    // `<<%` operator family, `/root/reference/contrib/pg_trgm/
    // trgm_op.c:1166,1182` via calc_word_similarity + `:477`
    // iterate_word_similarity): the greatest set-similarity between the
    // query's trigram set and any CONTIGUOUS extent of the text's
    // ordered trigram sequence — word-boundary-aligned extents for the
    // strict form (TRGM_BOUND_LEFT/RIGHT), any trigram extent for the
    // plain form. Trigrams are pg_trgm's exactly: lowercase, split on
    // non-alnum, each word padded "  w " and slid (trgm.h LPADDING=2 /
    // RPADDING=1 / IGNORECASE / KEEPONLYALNUM), similarity =
    // |A∩B| / |A∪B| (DIVUNION) kept in exact half-up integer micros.
    //
    // The O(T^2)-extent search is PRUNED losslessly before it runs:
    // the maximum is always attained at an extent whose edge trigrams
    // (edge words, for strict) hit the query set — trimming a
    // non-matching edge drops only non-shared distinct trigrams, which
    // can only shrink the union and raise the ratio. Extent endpoints
    // therefore range over the (few) matching positions only, the same
    // shortcut the reference's iterate loop takes via its found[]
    // bitmap. Everything is per-row codegen HOFs — no shuffle, no UDF;
    // at 100 TB this is a map-side scan like the other scalar lanes.
    "q_trgm_word_sim" -> ((s, dir) => {
      val probe = "table value part"
      // per-word trigram LISTS (order + duplicates preserved: the
      // extent search is positional; dedup happens per-extent)
      def wordTrgms(src: String): String =
        s"transform(filter(split(lower($src), '[^a-z0-9]+'), " +
          "w -> length(w) > 0), " +
          "w -> transform(sequence(1, length(w) + 1), " +
          "i -> substring(concat('  ', w, ' '), i, 3)))"
      // extent similarity in half-up micros over distinct trigrams
      def sml(src: String): String = {
        val d = s"array_distinct($src)"
        val c = s"cast(size(array_intersect($d, q)) as bigint)"
        val u2 = s"cast(size($d) as bigint)"
        s"((2000000 * $c + (u1 + $u2 - $c)) div (2 * (u1 + $u2 - $c)))"
      }
      t(s, dir, "documents")
        .withColumn("wt", expr(wordTrgms("substring(text, 1, 48)")))
        .withColumn("tq", expr("flatten(wt)"))
        .withColumn("q", expr(
          s"array_distinct(flatten(${wordTrgms(s"'$probe'")}))"))
        .withColumn("u1", expr("cast(size(q) as bigint)"))
        .withColumn("fi", expr(
          "filter(sequence(1, size(tq)), i -> array_contains(q, element_at(tq, i)))"))
        .withColumn("fw", expr(
          "filter(sequence(1, size(wt)), a -> size(array_intersect(element_at(wt, a), q)) > 0)"))
        .withColumn("wsim_u", expr(
          "coalesce(array_max(flatten(transform(fi, i -> " +
            "transform(filter(fi, j -> j >= i), j -> " +
            sml("slice(tq, i, j - i + 1)") + ")))), cast(0 as bigint))"))
        .withColumn("swsim_u", expr(
          "coalesce(array_max(flatten(transform(fw, a -> " +
            "transform(filter(fw, b -> b >= a), b -> " +
            sml("flatten(slice(wt, a, b - a + 1))") + ")))), cast(0 as bigint))"))
        .select(col("doc_id"), col("wsim_u"), col("swsim_u"))
        .orderBy(col("doc_id"))
    }),

    // pg_trgm similarity JOIN — the GIN-index-accelerated `%` operator
    // (`/root/reference/contrib/pg_trgm/trgm_op.c:1208` similarity_op,
    // `trgm_gin.c:71` gin_extract_query_trgm + gin_trgm_consistent's
    // count filter) as a posting-list join. The index analogue is the
    // PREFIX FILTER (Chaudhuri et al., ICDE'06; Bayardo et al., WWW'07
    // AllPairs): trigrams get a canonical rarity order (global
    // frequency asc, trigram asc), each set INDEXES only its first
    // |S| - ceil(t*|S|) + 1 rarest trigrams, and probes with its full
    // set. Lossless for Jaccard >= t: a pair whose intersection misses
    // the indexed prefix of either side fits its whole overlap into
    // that side's last ceil(t*|S|) - 1 trigrams, contradicting
    // overlap >= t*|S|. A length filter (min >= t*max) prunes before
    // the verify. Hot trigrams sort LAST and thus rarely enter any
    // prefix, so no posting list explodes — the property that makes
    // this the 100 TB shape (the naive trigram equi-join is quadratic
    // in the hottest posting). Verification recomputes the exact
    // rational in half-up micros over the full sets.
    //
    // The DuckDB oracle brute-forces ALL pairs with no filter, so the
    // hash gate PROVES the prefix filter lossless on this corpus
    // rather than assuming the theorem.
    "q_trgm_join" -> ((s, dir) => {
      def trgSet(src: String): String =
        s"array_distinct(flatten(transform(filter(split(lower($src), " +
          "'[^a-z0-9]+'), w -> length(w) > 0), " +
          "w -> transform(sequence(1, length(w) + 1), " +
          "i -> substring(concat('  ', w, ' '), i, 3)))))"
      val names = t(s, dir, "documents")
        .select(expr("concat_ws(' ', slice(split(text, ' '), 1, 4))").as("name"))
        .distinct()
      val tg = names
        .withColumn("tg", expr(trgSet("name")))
        .withColumn("sz", expr("cast(size(tg) as bigint)"))
      val full = tg.select(col("name"), col("sz"), explode(col("tg")).as("tok"))
      val freq = full.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      // canonical (rarity, trigram) order; prefix = all but the last
      // ceil(0.45*sz) - 1 tokens (threshold t = 0.45 in exact 45/100)
      val pref = full.join(freq, "tok")
        .groupBy(col("name"), col("sz"))
        .agg(sort_array(collect_list(struct(col("tf"), col("tok")))).as("toks"))
        .withColumn("ptoks", expr(
          "transform(slice(toks, 1, cast(sz - ((45 * sz + 99) div 100) + 1 as int)), x -> x.tok)"))
        .select(col("name").as("pname"), col("sz").as("psz"),
          explode(col("ptoks")).as("tok"))
      val cand = pref
        .join(full.select(col("name").as("fname"), col("sz").as("fsz"),
          col("tok")), "tok")
        .filter(col("pname") =!= col("fname"))
        .filter(expr("100 * least(psz, fsz) >= 45 * greatest(psz, fsz)"))
        .select(least(col("pname"), col("fname")).as("name_a"),
          greatest(col("pname"), col("fname")).as("name_b"))
        .distinct()
      cand
        .join(tg.select(col("name").as("name_a"), col("tg").as("ta"),
          col("sz").as("sa")), "name_a")
        .join(tg.select(col("name").as("name_b"), col("tg").as("tb"),
          col("sz").as("sb")), "name_b")
        .withColumn("inter", expr("cast(size(array_intersect(ta, tb)) as bigint)"))
        .withColumn("uni", col("sa") + col("sb") - col("inter"))
        .withColumn("sim_u", expr("(2000000 * inter + uni) div (2 * uni)"))
        .filter(col("sim_u") >= 450000L)
        .select(col("name_a"), col("name_b"), col("sim_u"))
        .orderBy(col("name_a"), col("name_b"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_date_bin" ->
      s"""SELECT time_bucket(INTERVAL '90 minutes', CAST(ts AS TIMESTAMP),
         |    TIMESTAMP '2024-01-01 00:30:00') AS bin_start,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY bin_start ORDER BY bin_start""".stripMargin,

    // the oracle recomputes the case-insensitive semantics with lower();
    // the Spark side exercises the real collation machinery
    "q_collation" ->
      """WITH b AS (SELECT c_custkey,
        |    CASE WHEN c_custkey % 3 = 0 THEN lower(c_mktsegment)
        |         WHEN c_custkey % 3 = 1 THEN
        |           upper(substr(lower(c_mktsegment), 1, 1))
        |             || substr(lower(c_mktsegment), 2)
        |         ELSE c_mktsegment END AS seg_mixed
        |  FROM customer WHERE c_custkey <= 300)
        |SELECT upper(lower(seg_mixed)) AS seg,
        |  COUNT(*) AS n,
        |  MIN(seg_mixed) AS first_variant,
        |  CAST(COUNT(DISTINCT seg_mixed) AS BIGINT) AS n_case_variants,
        |  CAST(SUM(CASE WHEN lower(seg_mixed) = 'building' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_eq_building
        |FROM b GROUP BY lower(seg_mixed) ORDER BY seg""".stripMargin,

    // known-answer vectors from an independent port of PG's _soundex C
    // (simple variant; difference vs 'Robert' = R163)
    "q_fuzzy_soundex" ->
      """SELECT * FROM (VALUES
        |  (1, 'R163', 4), (2, 'R163', 4), (3, 'A226', 0), (4, 'A226', 0),
        |  (5, 'T522', 0), (6, 'P236', 0), (7, 'W252', 0), (8, 'L000', 0),
        |  (9, 'G362', 1), (10, 'J250', 0), (11, 'A500', 0), (12, 'A500', 0),
        |  (13, 'S530', 0), (14, 'O165', 2)
        |) AS t(name_id, sdx, diff_robert)
        |ORDER BY name_id""".stripMargin,

    // real lane: DuckDB's native levenshtein (+ least(d, k+1) for the
    // less_equal contract); weighted lane: expected values from an
    // independent Python Wagner-Fischer DP (unit-cost rows fall back to
    // native levenshtein via coalesce)
    "q_fuzzy_levenshtein" ->
      """WITH pairs AS (
        |  SELECT CAST(p1.p_partkey AS INT) AS pair_id, p1.p_name AS src,
        |         p2.p_name AS tgt, 1 AS ins_c, 1 AS del_c, 1 AS sub_c,
        |         CAST(NULL AS INT) AS exp_w
        |  FROM part p1 JOIN part p2 ON p2.p_partkey = p1.p_partkey + 1
        |  WHERE p1.p_partkey <= 120
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (1001, 'GUMBO', 'GAMBOL', 2, 1, 1, 3),
        |    (1002, 'GUMBO', 'GAMBOL', 1, 1, 1, 2),
        |    (1003, 'extensive', 'exhaustive', 1, 1, 1, 4),
        |    (1004, 'kitten', 'sitting', 1, 1, 1, 3),
        |    (1005, 'kitten', 'sitting', 3, 2, 5, 13),
        |    (1006, 'Saturday', 'Sunday', 1, 1, 1, 3),
        |    (1007, 'Saturday', 'Sunday', 2, 3, 4, 10),
        |    (1008, 'levenshtein', 'frankenstein', 1, 1, 1, 6),
        |    (1009, 'levenshtein', 'frankenstein', 5, 2, 3, 21),
        |    (1010, '', 'abc', 4, 7, 2, 12),
        |    (1011, 'abc', '', 4, 7, 2, 21),
        |    (1012, 'flaw', 'lawn', 1, 1, 2, 2)
        |  ) v(pair_id, src, tgt, ins_c, del_c, sub_c, exp_w))
        |SELECT pair_id, src, tgt, ins_c, del_c, sub_c,
        |  CAST(levenshtein(src, tgt) AS INT) AS lev,
        |  CAST(least(levenshtein(src, tgt), 4) AS INT) AS lev_le3,
        |  CAST(coalesce(exp_w, levenshtein(src, tgt)) AS INT) AS lev_w
        |FROM pairs ORDER BY pair_id""".stripMargin,

    // known-answer vectors from an independent Python port of the
    // reference's _metaphone (anchor: regress metaphone('GUMBO',4)='KM')
    "q_fuzzy_metaphone" ->
      """SELECT * FROM (VALUES
        |  (1, 'GUMBO', 'KM', 'KM'), (2, 'Thompson', '0MPS', '0MPSN'),
        |  (3, 'Thomas', '0MS', '0MS'), (4, 'school', 'SKL', 'SKL'),
        |  (5, 'Christ', 'KRST', 'KRST'), (6, 'Schwartz', 'XWRT', 'XWRTS'),
        |  (7, 'knight', 'NFT', 'NFT'), (8, 'gnome', 'NM', 'NM'),
        |  (9, 'gnat', 'NT', 'NT'), (10, 'light', 'LFT', 'LFT'),
        |  (11, 'laughter', 'LFTR', 'LFTR'), (12, 'rough', 'RF', 'RF'),
        |  (13, 'through', '0R', '0R'), (14, 'science', 'SNS', 'SNS'),
        |  (15, 'scene', 'SN', 'SN'), (16, 'discipline', 'TSPL', 'TSPLN'),
        |  (17, 'special', 'SPXL', 'SPXL'), (18, 'ambition', 'AMXN', 'AMXN'),
        |  (19, 'nation', 'NXN', 'NXN'), (20, 'judge', 'JJ', 'JJ'),
        |  (21, 'pledge', 'PLJ', 'PLJ'), (22, 'magic', 'MJK', 'MJK'),
        |  (23, 'wright', 'RFT', 'RFT'), (24, 'whale', 'HL', 'HL'),
        |  (25, 'where', 'HR', 'HR'), (26, 'xylophone', 'SLFN', 'SLFN'),
        |  (27, 'axiom', 'AKSM', 'AKSM'), (28, 'box', 'BKS', 'BKS'),
        |  (29, 'quick', 'KK', 'KK'), (30, 'phone', 'FN', 'FN'),
        |  (31, 'vision', 'FXN', 'FXN'), (32, 'session', 'SSN', 'SSN'),
        |  (33, 'asia', 'AX', 'AX'), (34, 'pizza', 'PS', 'PS'),
        |  (35, 'jazz', 'JS', 'JS'), (36, 'czar', 'KSR', 'KSR'),
        |  (37, 'ache', 'AX', 'AX'), (38, 'aeon', 'EN', 'EN'),
        |  (39, 'Anne', 'AN', 'AN'), (40, 'ocean', 'OSN', 'OSN'),
        |  (41, 'resigned', 'RSNT', 'RSNT'),
        |  (42, 'signature', 'SKNT', 'SKNTR'), (43, 'bomb', 'BM', 'BM'),
        |  (44, 'lamb', 'LM', 'LM'), (45, 'psychology', 'PSXL', 'PSXLJ'),
        |  (46, 'aggressive', 'AKRS', 'AKRSF'), (47, 'WAter', 'WTR', 'WTR'),
        |  (48, '  42nd-street', 'NTST', 'NTSTRT'),
        |  (49, 'McCarthy', 'MKKR', 'MKKR0'), (50, 'O''Brien', 'OBRN', 'OBRN')
        |) AS t(word_id, word, mp4, mp10)
        |ORDER BY word_id""".stripMargin,

    // the same pg_trgm trigram construction (pad "  w ", distinct char
    // 3-grams per non-alnum-split word) with the same micros rational
    "q_trgm_dist" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey <= 500),
        |t AS (SELECT c_custkey,
        |    list_distinct(flatten(list_transform(
        |      list_filter(string_split_regex(lower(c_name), '[^a-z0-9]+'),
        |                  w -> len(w) > 0),
        |      w -> [substr('  ' || w || ' ', i, 3)
        |            for i in range(1, len(w) + 2)]))) AS own,
        |    list_distinct(flatten(list_transform(
        |      list_filter(string_split_regex(lower('Customer#000000042'),
        |                                     '[^a-z0-9]+'),
        |                  w -> len(w) > 0),
        |      w -> [substr('  ' || w || ' ', i, 3)
        |            for i in range(1, len(w) + 2)]))) AS ref
        |  FROM c),
        |m AS (SELECT c_custkey, own,
        |    CAST(len(list_intersect(own, ref)) AS BIGINT) AS inter,
        |    CAST(len(list_distinct(list_concat(own, ref))) AS BIGINT) AS uni
        |  FROM t)
        |SELECT c_custkey,
        |  1000000 - (2000000 * inter + uni) // (2 * uni) AS dist_u,
        |  array_to_string(list_sort(own), ' ') AS show_trgm
        |FROM m ORDER BY dist_u, c_custkey LIMIT 10""".stripMargin,

    "q_trgm_fuzzy" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer
        |  WHERE c_custkey <= 200),
        |t AS (SELECT c_custkey, c_name,
        |    list_distinct(flatten(list_transform(
        |      list_filter(string_split_regex(lower(c_name), '[^a-z0-9]+'),
        |                  w -> len(w) > 0),
        |      w -> [substr('  ' || w || ' ', i, 3)
        |            for i in range(1, len(w) + 2)]))) AS own,
        |    list_distinct(flatten(list_transform(
        |      list_filter(string_split_regex(lower('Customer#000000100'),
        |                                     '[^a-z0-9]+'),
        |                  w -> len(w) > 0),
        |      w -> [substr('  ' || w || ' ', i, 3)
        |            for i in range(1, len(w) + 2)]))) AS ref
        |  FROM c),
        |m AS (SELECT c_custkey, c_name, own,
        |    CAST(len(list_intersect(own, ref)) AS BIGINT) AS inter,
        |    CAST(len(list_distinct(list_concat(own, ref))) AS BIGINT) AS uni
        |  FROM t)
        |SELECT c_custkey,
        |  CAST(levenshtein(c_name, 'Customer#000000100') AS INT) AS lev,
        |  CAST(len(own) AS INT) AS n_trgm,
        |  (2000000 * inter + uni) // (2 * uni) AS sim_u,
        |  (2000000 * inter + uni) // (2 * uni) >= 300000 AS is_match,
        |  lower(c_name) = lower('CUSTOMER#000000100') AS ci_eq
        |FROM m ORDER BY c_custkey""".stripMargin,

    // identical gaps-and-islands canonicalization over the same integer
    // minutes; epoch() keeps fractional seconds, so floor first
    "q_multirange_agg" ->
      """WITH r AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 60 AS lo,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 60 + 5 AS hi
        |  FROM events),
        |p AS (SELECT user_id, lo, hi,
        |    MAX(hi) OVER (PARTITION BY user_id ORDER BY lo, hi
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM r),
        |i AS (SELECT user_id, lo, hi,
        |    SUM(CASE WHEN prev_max IS NULL OR lo > prev_max THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY lo, hi
        |        ROWS UNBOUNDED PRECEDING) AS isle
        |  FROM p),
        |g AS (SELECT user_id, isle, MIN(lo) AS mlo, MAX(hi) AS mhi
        |  FROM i GROUP BY user_id, isle),
        |m AS (SELECT user_id,
        |    list({'lo': mlo, 'hi': mhi} ORDER BY mlo, mhi) AS mr,
        |    CAST(SUM(mhi - mlo) AS BIGINT) AS covered_min,
        |    MIN(mlo) AS first_lo, MAX(mhi) AS last_hi
        |  FROM g GROUP BY user_id)
        |SELECT user_id, CAST(len(mr) AS INT) AS n_ranges,
        |  covered_min, first_lo, last_hi,
        |  covered_min < last_hi - first_lo AS has_gap,
        |  to_json(mr[1:4]) AS mr_head
        |FROM m ORDER BY user_id""".stripMargin,

    "q_seg_ops" ->
      s"""WITH ba AS (SELECT p_brand, ${sqlDavg("p_retailprice")} AS b_avg
         |  FROM part GROUP BY p_brand),
         |j AS (SELECT p.p_partkey,
         |    CAST(round(p.p_retailprice * 980000.0, 0) AS BIGINT) AS alo,
         |    CAST(round(p.p_retailprice * 1020000.0, 0) AS BIGINT) AS ahi,
         |    CAST(round(ba.b_avg * 950000.0, 0) AS BIGINT) AS blo,
         |    CAST(round(ba.b_avg * 1050000.0, 0) AS BIGINT) AS bhi
         |  FROM part p JOIN ba USING (p_brand) WHERE p.p_partkey <= 400)
         |SELECT p_partkey,
         |  CAST(alo AS DOUBLE) / 1000000.0 AS a_lo,
         |  CAST(ahi AS DOUBLE) / 1000000.0 AS a_hi,
         |  CAST(blo AS DOUBLE) / 1000000.0 AS b_lo,
         |  CAST(bhi AS DOUBLE) / 1000000.0 AS b_hi,
         |  alo <= bhi AND blo <= ahi AS overlaps,
         |  ahi < blo AS strictly_left,
         |  alo > bhi AS strictly_right,
         |  ahi <= bhi AS over_left,
         |  alo >= blo AS over_right,
         |  alo <= blo AND ahi >= bhi AS contains_b,
         |  CASE WHEN alo <= bhi AND blo <= ahi
         |    THEN CAST(greatest(alo, blo) AS DOUBLE) / 1000000.0 END AS ix_lo,
         |  CASE WHEN alo <= bhi AND blo <= ahi
         |    THEN CAST(least(ahi, bhi) AS DOUBLE) / 1000000.0 END AS ix_hi,
         |  printf('%.6f', CAST(alo AS DOUBLE) / 1000000.0) || ' .. ' ||
         |    printf('%.6f', CAST(ahi AS DOUBLE) / 1000000.0) AS seg_text
         |FROM j ORDER BY p_partkey""".stripMargin,

    "q_range_ops" ->
      """SELECT o_orderkey,
        |  CAST(o_orderkey % 100 AS INT) AS lo1,
        |  CAST(o_orderkey % 100 + 10 AS INT) AS hi1,
        |  CAST(o_custkey % 100 AS INT) AS lo2,
        |  CAST(o_custkey % 100 + 15 AS INT) AS hi2,
        |  o_orderkey % 100 < o_custkey % 100 + 15
        |    AND o_custkey % 100 < o_orderkey % 100 + 10 AS overlaps,
        |  o_orderkey % 100 <= 42 AND 42 < o_orderkey % 100 + 10 AS contains_42,
        |  CASE WHEN o_orderkey % 100 < o_custkey % 100 + 15
        |        AND o_custkey % 100 < o_orderkey % 100 + 10
        |    THEN CAST(greatest(o_orderkey % 100, o_custkey % 100) AS INT) END AS ix_lo,
        |  CASE WHEN o_orderkey % 100 < o_custkey % 100 + 15
        |        AND o_custkey % 100 < o_orderkey % 100 + 10
        |    THEN CAST(least(o_orderkey % 100 + 10, o_custkey % 100 + 15) AS INT) END AS ix_hi,
        |  o_orderkey % 100 + 10 = o_custkey % 100
        |    OR o_custkey % 100 + 15 = o_orderkey % 100 AS adjacent,
        |  CAST(least(o_orderkey % 100, o_custkey % 100) AS INT) AS span_lo,
        |  CAST(greatest(o_orderkey % 100 + 10, o_custkey % 100 + 15) AS INT) AS span_hi
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "q_inet_ops" ->
      s"""WITH b AS (SELECT c_custkey, $ipNumSql AS ip FROM customer
         |  WHERE c_custkey <= 300),
         |n AS (SELECT c_custkey, ip, ip - (ip % 256) AS net FROM b)
         |SELECT c_custkey,
         |  ${dottedSql("ip")} AS ip,
         |  ${dottedSql("net")} AS network24,
         |  ${dottedSql("(net + 255)")} AS broadcast24,
         |  net = CAST(10 * 16777216 + 5 * 65536 + 3 * 256 AS BIGINT)
         |    AS in_10_5_3_0,
         |  CAST(ip % 256 AS INT) AS host_part
         |FROM n ORDER BY c_custkey""".stripMargin,

    "q_inet_subnet_join" ->
      s"""WITH b AS (SELECT c_custkey, $ipNumSql AS ip FROM customer
         |  WHERE c_custkey <= 500),
         |n AS (SELECT ip, ip - (ip % 256) AS net FROM b),
         |g AS (SELECT net, COUNT(*) AS n_hosts,
         |    COUNT(DISTINCT ip) AS n_distinct_ips
         |  FROM n GROUP BY net)
         |SELECT ${dottedSql("net")} AS network24, n_hosts, n_distinct_ips,
         |  n_hosts > 1 AS has_peers
         |FROM g ORDER BY n_hosts DESC, network24 LIMIT 50""".stripMargin,

    "q_null_safe_cmp" ->
      """WITH v AS (SELECT c_custkey,
        |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS a,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_acctbal END AS b
        |  FROM customer WHERE c_custkey <= 300)
        |SELECT c_custkey, a, b,
        |  a IS NOT DISTINCT FROM b AS nsafe_eq,
        |  a IS DISTINCT FROM b AS is_distinct,
        |  a IS NOT DISTINCT FROM NULL AS a_is_null,
        |  coalesce(a, -1.0) = coalesce(b, -1.0) AS coalesce_eq
        |FROM v ORDER BY c_custkey""".stripMargin,

    "q_ilike_escape" ->
      """SELECT c_custkey,
        |  c_name ILIKE 'customer#%' AS ilike_hit,
        |  c_mktsegment ILIKE '%ing%' AS ilike_mid,
        |  ('100%_' || c_mktsegment) LIKE '100\%\_%' ESCAPE '\' AS esc_hit,
        |  ('100%_' || c_mktsegment) LIKE '100%' ESCAPE '\' AS esc_prefix,
        |  NOT (c_name LIKE '%Z%') AS not_like
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,

    "q_like_quantified" ->
      """SELECT p_partkey, p_name,
        |  (p_name LIKE '%widget%' OR p_name LIKE '%bolt%') AS any_hit,
        |  (p_name LIKE '%e%' AND p_name LIKE '%l%') AS all_hit,
        |  (p_name NOT LIKE '%blue%' OR p_name NOT LIKE '%cold%') AS not_any,
        |  (p_name NOT LIKE '%blue%' AND p_name NOT LIKE '%cold%') AS not_all
        |FROM part WHERE p_partkey <= 400 ORDER BY p_partkey""".stripMargin,

    // regexes hand-derived from the SQL-dialect patterns (NOT produced by
    // the Scala translator) — see the query comment
    "q_similar_to" ->
      """SELECT p_partkey,
        |  regexp_full_match(p_name, '.*ring') AS sim_suffix,
        |  regexp_full_match(p_type, '(ECONOMY|STANDARD).*') AS sim_alt_prefix,
        |  regexp_full_match(p_name, '.*(red|blue|green).*') AS sim_mid_alt,
        |  regexp_full_match(p_brand, 'Brand#.') AS sim_underscore,
        |  regexp_full_match(p_name, '(red|blue|hot) (widget|bolt|gear)') AS sim_enum,
        |  regexp_full_match(p_name, '[a-z ]+') AS sim_class_plus,
        |  regexp_full_match(p_brand, 'Brand#[0-9]{2}') AS sim_bound,
        |  regexp_full_match(p_type, 'SM?ALL') AS sim_opt,
        |  regexp_full_match('100%_' || p_type, '100%_.*') AS sim_escaped,
        |  regexp_full_match(p_name, '.*\..*') AS sim_literal_dot
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin,

    "q_ltree_lca" ->
      """WITH leaves AS (
        |  SELECT c_custkey,
        |    'root.r' || n_regionkey || '.n' || c_nationkey ||
        |      '.c' || c_custkey AS leaf
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_custkey <= 200),
        |p AS (
        |  SELECT a.c_custkey,
        |    string_split(a.leaf, '.') AS pa, string_split(b.leaf, '.') AS pb
        |  FROM leaves a JOIN leaves b ON b.c_custkey = a.c_custkey + 1),
        |d AS (
        |  SELECT c_custkey, pa,
        |    len(list_filter(range(1, least(len(pa), len(pb)) + 1),
        |      i -> pa[1 : i] = pb[1 : i])) AS depth
        |  FROM p)
        |SELECT c_custkey, array_to_string(pa[1 : depth], '.') AS lca,
        |  CAST(depth AS INT) AS lca_depth
        |FROM d ORDER BY c_custkey""".stripMargin,

    // the NAIVE ancestor definition (leaf LIKE prefix || '.%') — the
    // Spark side runs the extracted-subpath equi-join instead, so the
    // hash compare proves the index-shaped decomposition equivalent
    "q_ltree_paths" ->
      """WITH leaves AS (SELECT 'root.r' || n_regionkey || '.n' || c_nationkey
        |    || '.c' || c_custkey AS leaf
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |prefixes AS (SELECT DISTINCT
        |    array_to_string(string_split(leaf, '.')[1:3], '.') AS prefix
        |  FROM leaves),
        |j AS (SELECT p.prefix, l.leaf,
        |    len(string_split(l.leaf, '.')) AS nlev
        |  FROM prefixes p JOIN leaves l ON l.leaf LIKE p.prefix || '.%')
        |SELECT prefix, COUNT(*) AS n_desc,
        |  CAST(SUM(CASE WHEN regexp_matches(leaf,
        |    '^root(\.[^.]+)*\.n5(\.[^.]+)*$') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lq_n5,
        |  CAST(SUM(CASE WHEN regexp_matches(leaf,
        |    '^root\.(r1|r2)(\.[^.]+)*$') THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lq_r12,
        |  MIN(leaf) AS min_leaf,
        |  CAST(MAX(nlev) AS INT) AS leaf_nlevel,
        |  CAST(len(string_split(prefix, '.')) AS INT) AS prefix_nlevel,
        |  string_split(prefix, '.')[2] AS subpath_1_2
        |FROM j GROUP BY prefix ORDER BY prefix""".stripMargin,

    "q_intarray_ops" ->
      """WITH g AS (SELECT l_orderkey,
        |    list_sort(list(CAST(l_quantity AS INT))) AS a
        |  FROM lineitem WHERE l_orderkey <= 500 GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  array_to_string(a, ',') AS sorted,
        |  array_to_string(list_sort(list_distinct(a)), ',') AS uniq,
        |  CAST(len(a) AS INT) AS icount,
        |  CAST(COALESCE(list_position(a, 10), 0) AS INT) AS idx_10,
        |  list_has_any(a, [1, 5, 10]) AS ovl_1_5_10,
        |  list_has_all(a, [5, 10]) AS has_5_10,
        |  array_to_string(list_append(a, 99), ',') AS plus_99,
        |  COALESCE(array_to_string(list_filter(a, x -> x <> 10), ','), '')
        |    AS minus_10
        |FROM g ORDER BY l_orderkey""".stripMargin,

    // same pruned extent search (the pruning is lossless, so this IS
    // word_similarity); DuckDB comprehensions mirror the Spark HOFs
    "q_trgm_word_sim" -> {
      def sml(src: String): String = {
        val d = s"list_distinct($src)"
        val c = s"CAST(len(list_intersect($d, q)) AS BIGINT)"
        val u2 = s"CAST(len($d) AS BIGINT)"
        s"(2000000 * $c + (u1 + $u2 - $c)) // (2 * (u1 + $u2 - $c))"
      }
      s"""WITH probe AS (
         |  SELECT list_distinct(flatten(list_transform(
         |    list_filter(string_split_regex(lower('table value part'),
         |                                   '[^a-z0-9]+'),
         |                w -> len(w) > 0),
         |    w -> [substr('  ' || w || ' ', i, 3)
         |          for i in range(1, len(w) + 2)]))) AS qt),
         |w AS (SELECT doc_id,
         |    list_transform(
         |      list_filter(string_split_regex(lower(substr(text, 1, 48)),
         |                                     '[^a-z0-9]+'),
         |                  w -> len(w) > 0),
         |      w -> [substr('  ' || w || ' ', i, 3)
         |            for i in range(1, len(w) + 2)]) AS wt
         |  FROM documents),
         |f AS (SELECT doc_id, wt, flatten(wt) AS t,
         |    (SELECT qt FROM probe) AS q,
         |    CAST(len((SELECT qt FROM probe)) AS BIGINT) AS u1
         |  FROM w),
         |fp AS (SELECT doc_id, wt, t, q, u1,
         |    [i for i in range(1, len(t) + 1) if list_contains(q, t[i])] AS fi,
         |    [a for a in range(1, len(wt) + 1)
         |       if len(list_intersect(list_distinct(wt[a]), q)) > 0] AS fw
         |  FROM f)
         |SELECT doc_id,
         |  coalesce(list_max(flatten([[${sml("t[i:j]")}
         |    for j in fi if j >= i] for i in fi])), 0) AS wsim_u,
         |  coalesce(list_max(flatten([[${sml("flatten(wt[a:b])")}
         |    for b in fw if b >= a] for a in fw])), 0) AS swsim_u
         |FROM fp ORDER BY doc_id""".stripMargin
    },

    // brute-force ALL-pairs with no candidate filter: hash equality
    // proves the Spark side's prefix filter lossless on this corpus
    "q_trgm_join" ->
      """WITH s AS (SELECT DISTINCT
        |    array_to_string((string_split(text, ' '))[1:4], ' ') AS name
        |  FROM documents),
        |t AS (SELECT name, list_distinct(flatten(list_transform(
        |    list_filter(string_split_regex(lower(name), '[^a-z0-9]+'),
        |                w -> len(w) > 0),
        |    w -> [substr('  ' || w || ' ', i, 3)
        |          for i in range(1, len(w) + 2)]))) AS tg
        |  FROM s),
        |p AS (SELECT a.name AS name_a, b.name AS name_b,
        |    CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) AS inter,
        |    CAST(len(a.tg) AS BIGINT) + CAST(len(b.tg) AS BIGINT)
        |      - CAST(len(list_intersect(a.tg, b.tg)) AS BIGINT) AS uni
        |  FROM t a JOIN t b ON a.name < b.name)
        |SELECT name_a, name_b,
        |  (2000000 * inter + uni) // (2 * uni) AS sim_u
        |FROM p WHERE (2000000 * inter + uni) // (2 * uni) >= 450000
        |ORDER BY name_a, name_b""".stripMargin
  )
}
