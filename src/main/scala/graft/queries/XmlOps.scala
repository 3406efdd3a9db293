package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** XML surface — the reference's xml type + producers + XPath + XMLTABLE
  * (`/root/reference/src/backend/utils/adt/xml.c`, tests
  * `src/test/regress/sql/xml.sql`; SURVEY §1.2 had marked this out of
  * scope — closed here because a migrating user's XMLTABLE/xpath queries
  * are real reference surface).
  *
  * Shape of the parity proof (DuckDB has no XML functions): both engines
  * CONSTRUCT the same XML string from the same relational rows
  * (xmlelement/xmlforest/xmlagg ≙ deterministic concat + ordered
  * string_agg); then only Spark parses it back (xpath_*, from_xml), and
  * the oracle derives the expected values relationally. Any divergence in
  * construction, parsing, or XPath evaluation hash-fails the round trip:
  * parse(construct(rows)) must equal rows.
  *
  * Scale note: construction/parsing is pure map-side; the only shuffle is
  * the per-order xmlagg (one narrow groupBy on the join key). xpath_* are
  * Hive-compat non-codegen expressions — fine for this parity surface,
  * not a 100 TB hot path (from_xml + struct access is the fast lane).
  */
object XmlOps extends QueryModule {

  /** Per-order XML doc `<order id=..><status>..</status><cust>..</cust>
    * <items><item ln=..><qty>..</qty><rf>..</rf></item>...</items></order>`
    * for o_orderkey < 100 — items in l_linenumber order (xmlagg ORDER BY). */
  private def docs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        concat(lit("<item ln=\""), col("l_linenumber"), lit("\"><qty>"),
          col("l_quantity").cast("long"), lit("</qty><rf>"),
          col("l_returnflag"), lit("</rf></item>")).as("frag"))
    // l_linenumber is NOT unique per order in the test corpus, so the
    // xmlagg ordering ties-breaks on the fragment string itself — a total
    // deterministic document order both engines can reproduce
    val items = li.groupBy(col("l_orderkey"))
      .agg(concat_ws("", expr(
        "transform(sort_array(collect_list(struct(l_linenumber, frag))), " +
          "p -> p.frag)")).as("items"))
    t(s, dir, "orders").filter(col("o_orderkey") < 100)
      .join(items, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"),
        concat(lit("<order id=\""), col("o_orderkey"), lit("\"><status>"),
          col("o_orderstatus"), lit("</status><cust>"), col("o_custkey"),
          lit("</cust><items>"), coalesce(col("items"), lit("")),
          lit("</items></order>")).as("doc"))
  }

  /** from_xml schema for [[docs]] ("_"-prefixed fields are attributes). */
  private val orderSchema = StructType(Seq(
    StructField("_id", LongType),
    StructField("status", StringType),
    StructField("cust", LongType),
    StructField("items", StructType(Seq(
      StructField("item", ArrayType(StructType(Seq(
        StructField("_ln", IntegerType),
        StructField("qty", LongType),
        StructField("rf", StringType))))))))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // xmlelement / xmlforest / xmlagg: emit the document itself — the
    // oracle builds the identical string, so producer parity is exact.
    "q_xml_construct" -> ((s, dir) => {
      docs(s, dir).orderBy(col("o_orderkey"))
    }),

    // XPath scalar surface: value extraction, count()/sum() over node
    // sets, positional + attribute paths, and an xmlexists-style
    // predicate — all against relationally-derived expected values.
    "q_xpath_scalars" -> ((s, dir) => {
      docs(s, dir).select(col("o_orderkey"),
          xpath_string(col("doc"), lit("/order/status")).as("status"),
          xpath_long(col("doc"), lit("/order/cust")).as("cust"),
          xpath_number(col("doc"), lit("count(/order/items/item)"))
            .cast("long").as("n_items"),
          xpath_number(col("doc"), lit("sum(/order/items/item/qty)"))
            .cast("long").as("total_qty"),
          xpath_long(col("doc"), lit("/order/items/item[1]/qty"))
            .as("first_qty"),
          xpath_int(col("doc"), lit("/order/items/item[1]/@ln"))
            .as("first_ln"),
          xpath_boolean(col("doc"), lit("/order/items/item[rf=\"R\"]"))
            .as("has_return"))
        .orderBy(col("o_orderkey"))
    }),

    // XMLTABLE: '/order/items/item' PASSING doc COLUMNS ln int PATH '@ln',
    // qty bigint, rf text, _id FOR ORDINALITY — from_xml into the typed
    // nested schema, then posexplode = the row expression.
    "q_xmltable" -> ((s, dir) => {
      docs(s, dir)
        .select(col("o_orderkey"),
          from_xml(col("doc"), orderSchema).as("x"))
        .select(col("o_orderkey"), col("x.status").as("status"),
          posexplode(col("x.items.item")).as(Seq("pos", "it")))
        .select(col("o_orderkey"), col("status"),
          (col("pos") + 1).cast("int").as("ordinality"),
          col("it._ln").as("ln"), col("it.qty").as("qty"),
          col("it.rf").as("rf"))
        .orderBy(col("o_orderkey"), col("ordinality"))
    })
  )

  private val docsSql =
    """li AS (SELECT l_orderkey, l_linenumber,
      |    '<item ln="' || l_linenumber || '"><qty>' ||
      |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '</qty><rf>' ||
      |    l_returnflag || '</rf></item>' AS frag
      |  FROM lineitem WHERE l_orderkey < 100),
      |agg AS (SELECT l_orderkey,
      |    string_agg(frag, '' ORDER BY l_linenumber, frag) AS items
      |  FROM li GROUP BY l_orderkey),
      |d AS (SELECT o_orderkey,
      |    '<order id="' || o_orderkey || '"><status>' || o_orderstatus ||
      |    '</status><cust>' || o_custkey || '</cust><items>' ||
      |    coalesce(items, '') || '</items></order>' AS doc,
      |    o_orderstatus, o_custkey
      |  FROM orders LEFT JOIN agg ON o_orderkey = l_orderkey
      |  WHERE o_orderkey < 100)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_xml_construct" ->
      s"""WITH $docsSql
         |SELECT o_orderkey, doc FROM d ORDER BY o_orderkey""".stripMargin,

    // "first item" = DOCUMENT order (ln, frag) — the same total order the
    // xmlagg construction uses — not "linenumber 1", which may not exist.
    // Hive xpath_long/xpath_int return 0 (not NULL) when the path matches
    // nothing, so itemless orders coalesce to 0 here too.
    "q_xpath_scalars" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty, l_returnflag,
        |    '<item ln="' || l_linenumber || '"><qty>' ||
        |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '</qty><rf>' ||
        |    l_returnflag || '</rf></item>' AS frag
        |  FROM lineitem WHERE l_orderkey < 100),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, frag) AS rn FROM li),
        |agg AS (
        |  SELECT l_orderkey,
        |    COUNT(*) AS n_items,
        |    SUM(qty) AS total_qty,
        |    MIN(CASE WHEN rn = 1 THEN qty END) AS first_qty,
        |    MIN(CASE WHEN rn = 1 THEN l_linenumber END) AS first_ln,
        |    bool_or(l_returnflag = 'R') AS has_return
        |  FROM ranked GROUP BY l_orderkey)
        |SELECT o_orderkey, o_orderstatus AS status, o_custkey AS cust,
        |  coalesce(n_items, 0) AS n_items,
        |  CAST(coalesce(total_qty, 0) AS BIGINT) AS total_qty,
        |  CAST(coalesce(first_qty, 0) AS BIGINT) AS first_qty,
        |  CAST(coalesce(first_ln, 0) AS INT) AS first_ln,
        |  coalesce(has_return, false) AS has_return
        |FROM orders LEFT JOIN agg ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,

    "q_xmltable" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty, l_returnflag,
        |    '<item ln="' || l_linenumber || '"><qty>' ||
        |    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) || '</qty><rf>' ||
        |    l_returnflag || '</rf></item>' AS frag
        |  FROM lineitem WHERE l_orderkey < 100)
        |SELECT o_orderkey, o_orderstatus AS status,
        |  CAST(row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY l_linenumber, frag) AS INT) AS ordinality,
        |  l_linenumber AS ln, qty, l_returnflag AS rf
        |FROM orders JOIN li ON o_orderkey = l_orderkey
        |WHERE o_orderkey < 100 ORDER BY o_orderkey, ordinality""".stripMargin
  )
}
