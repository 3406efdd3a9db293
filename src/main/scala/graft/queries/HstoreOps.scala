package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.HstoreFns

/** contrib/hstore — the key→value type PG warehouses use for ragged
  * properties columns (`/root/reference/contrib/hstore/hstore_op.c`,
  * ~1,100 LoC of operators; regress `contrib/hstore/sql/hstore.sql`).
  *
  * Spark mapping: an hstore IS a `map<string,string>` — the text format
  * needs kernels ([[graft.functions.HstoreParse]] /
  * [[graft.functions.HstoreRender]], hstore_io.c), but every operator is
  * a stock codegen'd map / higher-order-function composition, so the
  * whole operator set stays inside whole-stage codegen with zero UDFs
  * and zero shuffles beyond the scan:
  *
  *  - `->` (single key)            → `try_element_at`
  *  - `->` (key array)             → `transform(keys, try_element_at)`
  *  - `?` / `?|` / `?&`            → `map_contains_key` / `exists` / `forall`
  *  - `@>` containment             → `forall(map_entries(needle), key+value match)`
  *  - `||` merge (right wins)      → `map_concat(map_filter(l, k∉r), r)`
  *  - `delete` / `-` (key, array, hstore) → `map_filter`
  *  - `akeys` / `avals`            → `map_keys` / `map_values` (parse
  *    emits canonical (keylen, bytes) order, so these match hstore's
  *    storage order for free)
  *  - `slice`                      → `map_filter(k ∈ keys)`
  *  - `each`                       → `explode` of the map
  *  - `defined(h, k)`              → value non-null lookup
  *  - `hstore(k, v)`               → `map(k, v)`
  *
  * Scale shape: pure per-row expressions over the scan — no joins, no
  * aggregation; on 100 TB this is a map-only stage bounded by scan
  * throughput, exactly like the reference's hstore operators inside a
  * seqscan projection.
  */
object HstoreOps extends QueryModule {

  private def hParse(c: Column): Column = call_function("hstore_parse", c)
  private def hRender(c: Column): Column = call_function("hstore_render", c)

  /** `h -> k` (hstoreFetchval): null for missing keys, never an error. */
  private def hGet(h: Column, k: Column): Column = try_element_at(h, k)

  /** `l || r` (hstore_concat): right operand wins on key collisions;
    * disjoint-filter + concat keeps Spark's EXCEPTION dedup policy
    * unreachable. */
  private def hMerge(l: Column, r: Column): Column =
    map_concat(map_filter(l, (k, _) => !map_contains_key(r, k)), r)

  /** `h @> needle` (hs_contains): every needle key present with the
    * same value, nulls comparing equal. */
  private def hContains(h: Column, needle: Column): Column =
    forall(map_entries(needle),
      e => map_contains_key(h, e("key")) &&
        (hGet(h, e("key")) <=> e("value")))

  /** `h - hstore` (hstore_delete_hstore): drop pairs matching key AND
    * value in the needle. */
  private def hDeleteHstore(h: Column, needle: Column): Column =
    map_filter(h, (k, v) =>
      !(map_contains_key(needle, k) && (try_element_at(needle, k) <=> v)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The full operator sweep over a constructed props hstore per part:
    // text parsing exercises unquoted words, a quoted key, a quoted
    // value with spaces, loose whitespace, and the bare NULL keyword.
    "q_hstore_ops" -> ((s, dir) => {
      HstoreFns.register(s)
      val htext = concat(
        lit("brand=>"), col("p_brand"),
        lit(", \"type\"=>\""), col("p_type"), lit("\""),
        lit(" , size => "), col("p_size").cast("string"),
        lit(", note=>NULL"))
      val base = t(s, dir, "part").filter(col("p_partkey") <= 200)
        .withColumn("h", hParse(htext))
      val h = col("h")
      val sizeStr = col("p_size").cast("string")
      base.select(
        col("p_partkey").as("k"),
        hGet(h, lit("brand")).as("v_brand"),
        hGet(h, lit("zzz")).as("v_missing"),
        hGet(h, lit("note")).isNotNull.as("note_defined"), // defined()
        // array-valued outputs render as json text (driver hash
        // contract: nested columns are unhashable on the oracle side)
        to_json(transform(array(lit("size"), lit("brand"), lit("zzz")),
          k => hGet(h, k))).as("vals_multi"), // -> text[]
        map_contains_key(h, lit("type")).as("has_type"), // ?
        exists(array(lit("zzz"), lit("size")),
          k => map_contains_key(h, k)).as("has_any"), // ?|
        forall(array(lit("brand"), lit("size")),
          k => map_contains_key(h, k)).as("has_all"), // ?&
        hContains(h, map(lit("brand"), col("p_brand"))).as("contains_own"),
        hContains(h, map(lit("brand"), lit("nope"))).as("contains_other"),
        hContains(h, map(lit("note"), lit(null).cast("string")))
          .as("contains_nullval"),
        hRender(hMerge(h,
          map(lit("size"), lit("99"), lit("extra"), lit("e")))).as("merged"),
        hRender(map_filter(h, (k, _) => k =!= lit("type"))).as("minus_key"),
        hRender(map_filter(h, (k, _) =>
          !array_contains(array(lit("brand"), lit("zzz")), k))).as("minus_arr"),
        hRender(hDeleteHstore(h, map(lit("size"), sizeStr)))
          .as("minus_h_match"),
        hRender(hDeleteHstore(h, map(lit("size"), lit("-1"))))
          .as("minus_h_miss"),
        to_json(map_keys(h)).as("hkeys"),   // akeys: canonical order by parse
        to_json(map_values(h)).as("hvals"), // avals
        hRender(map_filter(h, (k, _) => array_contains(
          array(lit("brand"), lit("size"), lit("zzz")), k))).as("sliced"),
        hRender(h).as("roundtrip"),
        call_function("hstore_to_json", h).as("json_plain"),
        call_function("hstore_to_json_loose", h).as("json_loose"),
        // hstore_to_array (%% operator): alternating k,v in canonical
        // order; hstore_to_matrix: [[k,v],...] — json-rendered per the
        // driver's no-nested-columns contract. skeys/svals SRFs are the
        // exploded forms of hkeys/hvals above.
        to_json(flatten(transform(map_entries(h),
          e => array(e("key"), e("value"))))).as("to_array"),
        to_json(transform(map_entries(h),
          e => array(e("key"), e("value")))).as("to_matrix"),
        // populate_record (#=) typed-field extraction: text values
        // coerced to the record's column types
        hGet(h, lit("size")).cast("int").as("rec_size"),
        hGet(h, lit("brand")).as("rec_brand"))
        .orderBy(col("k"))
    }),

    // each(h): the SRF flattening one hstore into (key, value) rows.
    "q_hstore_each" -> ((s, dir) => {
      HstoreFns.register(s)
      val htext = concat(
        lit("brand=>"), col("p_brand"),
        lit(",\"type\"=>\""), col("p_type"), lit("\""),
        lit(",size=>"), col("p_size").cast("string"),
        lit(",note=>NULL"))
      t(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey").as("k"),
          explode(hParse(htext)).as(Seq("hkey", "hval")))
        .orderBy(col("k"), col("hkey"))
    }))

  val oracle: Map[String, String] = Map(
    // The oracle derives every output independently from the base
    // columns (it knows the construction), with the canonical
    // (keylen, key-bytes) order worked out by hand: note(4) < size(4)
    // < type(4) < brand(5) < extra(5).
    "q_hstore_ops" ->
      """SELECT p_partkey AS k,
        |  p_brand AS v_brand,
        |  CAST(NULL AS VARCHAR) AS v_missing,
        |  false AS note_defined,
        |  CAST(to_json([CAST(p_size AS VARCHAR), p_brand, NULL])
        |    AS VARCHAR) AS vals_multi,
        |  '{"note": null, "size": "' || CAST(p_size AS VARCHAR) ||
        |    '", "type": "' || p_type || '", "brand": "' || p_brand ||
        |    '"}' AS json_plain,
        |  '{"note": null, "size": ' || CAST(p_size AS VARCHAR) ||
        |    ', "type": "' || p_type || '", "brand": "' || p_brand ||
        |    '"}' AS json_loose,
        |  true AS has_type, true AS has_any, true AS has_all,
        |  true AS contains_own, false AS contains_other,
        |  true AS contains_nullval,
        |  '"note"=>NULL, "size"=>"99", "type"=>"' || p_type ||
        |    '", "brand"=>"' || p_brand || '", "extra"=>"e"' AS merged,
        |  '"note"=>NULL, "size"=>"' || CAST(p_size AS VARCHAR) ||
        |    '", "brand"=>"' || p_brand || '"' AS minus_key,
        |  '"note"=>NULL, "size"=>"' || CAST(p_size AS VARCHAR) ||
        |    '", "type"=>"' || p_type || '"' AS minus_arr,
        |  '"note"=>NULL, "type"=>"' || p_type ||
        |    '", "brand"=>"' || p_brand || '"' AS minus_h_match,
        |  '"note"=>NULL, "size"=>"' || CAST(p_size AS VARCHAR) ||
        |    '", "type"=>"' || p_type ||
        |    '", "brand"=>"' || p_brand || '"' AS minus_h_miss,
        |  CAST(to_json(['note','size','type','brand']) AS VARCHAR) AS hkeys,
        |  CAST(to_json([NULL, CAST(p_size AS VARCHAR), p_type, p_brand])
        |    AS VARCHAR) AS hvals,
        |  '"size"=>"' || CAST(p_size AS VARCHAR) ||
        |    '", "brand"=>"' || p_brand || '"' AS sliced,
        |  '"note"=>NULL, "size"=>"' || CAST(p_size AS VARCHAR) ||
        |    '", "type"=>"' || p_type ||
        |    '", "brand"=>"' || p_brand || '"' AS roundtrip,
        |  CAST(to_json(['note', NULL, 'size', CAST(p_size AS VARCHAR),
        |    'type', p_type, 'brand', p_brand]) AS VARCHAR) AS to_array,
        |  CAST(to_json([['note', NULL], ['size', CAST(p_size AS VARCHAR)],
        |    ['type', p_type], ['brand', p_brand]]) AS VARCHAR) AS to_matrix,
        |  p_size AS rec_size, p_brand AS rec_brand
        |FROM part WHERE p_partkey <= 200 ORDER BY k""".stripMargin,

    "q_hstore_each" ->
      """SELECT k, hkey, hval FROM (
        |  SELECT p_partkey AS k, 'brand' AS hkey, p_brand AS hval
        |    FROM part WHERE p_partkey <= 200
        |  UNION ALL SELECT p_partkey, 'note', NULL
        |    FROM part WHERE p_partkey <= 200
        |  UNION ALL SELECT p_partkey, 'size', CAST(p_size AS VARCHAR)
        |    FROM part WHERE p_partkey <= 200
        |  UNION ALL SELECT p_partkey, 'type', p_type
        |    FROM part WHERE p_partkey <= 200
        |) ORDER BY k, hkey""".stripMargin)
}
