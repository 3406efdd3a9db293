package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Federation (FDW) + fixed-width formatter specs — the last two §2.1
  * source categories. The "remote" database is embedded Derby (in Spark's
  * classpath already), exercising exactly the JDBCRelation code path a
  * networked PostgreSQL URL would.
  */
class FederationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private def tmp(suffix: String): String =
    Files.createTempDirectory(s"graft_$suffix").toString

  private lazy val url = {
    val u = s"jdbc:derby:memory:graftfdw;create=true"
    // materialize the DB once
    graft.sources.Federation.execute(u, "CREATE SCHEMA graft")
    u
  }

  test("foreign scan round-trips rows and pushes filters into the remote query") {
    val nation = Tables.t(spark, sf, "nation")
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
              col("n_name"), col("n_regionkey").cast("int").as("n_regionkey"))
    graft.sources.Federation.publish(nation, url, "graft.nation_fdw")

    val remote = graft.sources.Federation.foreignTable(spark, url, "graft.nation_fdw")
    // row parity with the local read
    assert(remote.count() == nation.count())

    val filtered = remote.filter(col("n_regionkey") === 2).select("n_nationkey", "n_name")
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate must appear in the JDBC scan's pushed filters — the
    // deparse.c contract: the remote side evaluates the WHERE clause
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"), plan)
    // and the projection must prune to the selected columns remotely
    assert(plan.contains("ReadSchema") || plan.contains("n_name"), plan)
    val expected = nation.filter(col("n_regionkey") === 2).count()
    assert(filtered.count() == expected && expected > 0)
  }

  test("partitioned foreign scan splits the remote table into parallel range queries") {
    val cust = Tables.t(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"),
              col("c_name"), col("c_acctbal"))
    graft.sources.Federation.publish(cust, url, "graft.customer_fdw")
    val maxKey = cust.agg(max("c_custkey")).head().getLong(0)

    val remote = graft.sources.Federation.foreignTablePartitioned(
      spark, url, "graft.customer_fdw", "c_custkey", 1L, maxKey + 1, numPartitions = 4)
    assert(remote.rdd.getNumPartitions == 4)
    assert(remote.count() == cust.count())
    // no row lost or duplicated across the range split
    assert(remote.select(countDistinct("c_custkey")).head().getLong(0) == cust.count())
  }

  test("dblink-style remote execute + foreign scan sees remote-side mutations") {
    graft.sources.Federation.execute(url,
      "CREATE TABLE graft.kv (k INT PRIMARY KEY, v VARCHAR(20))")
    graft.sources.Federation.execute(url, "INSERT INTO graft.kv VALUES (1, 'one'), (2, 'two')")
    val r1 = graft.sources.Federation.foreignTable(spark, url, "graft.kv")
    assert(r1.count() == 2)
    graft.sources.Federation.execute(url, "INSERT INTO graft.kv VALUES (3, 'three')")
    val r2 = graft.sources.Federation.foreignTable(spark, url, "graft.kv")
    assert(r2.count() == 3)
    assert(r2.filter(col("k") === 3).select("v").head().getString(0) == "three")
  }

  test("DSv2 JDBC catalog pushes aggregates into the remote query") {
    val cust = Tables.t(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("c_custkey"),
              col("c_nationkey").cast("int").as("c_nationkey"))
    graft.sources.Federation.publish(cust, url, "graft.cust_agg_fdw")
    // the V2 catalog path is what enables aggregate pushdown (the
    // DataFrame-reader V1 path stops at filters); postgres_fdw grew the
    // same capability in its aggregate_pushdown deparse support
    spark.conf.set("spark.sql.catalog.graftjdbc",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.graftjdbc.url", url)
    spark.conf.set("spark.sql.catalog.graftjdbc.pushDownAggregate", "true")
    try {
      // Derby folds unquoted identifiers to UPPER; the V2 catalog passes
      // identifiers through verbatim, so quote them uppercase
      val agg = spark.sql(
        "SELECT c_nationkey, count(*) AS n, max(c_custkey) AS mx " +
        "FROM graftjdbc.`GRAFT`.`CUST_AGG_FDW` GROUP BY c_nationkey")
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregates"), plan)
      val expected = cust.groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), max("c_custkey").as("mx"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val got = agg.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected)
    } finally {
      spark.conf.unset("spark.sql.catalog.graftjdbc")
      spark.conf.unset("spark.sql.catalog.graftjdbc.url")
      spark.conf.unset("spark.sql.catalog.graftjdbc.pushDownAggregate")
    }
  }

  test("fixed-width read: slicing, trailing-blank trim, NULL marker, typed casts") {
    val dir = tmp("fw")
    // layout: id(4) name(8) qty(6) — reference fixedwidth_in semantics
    Files.writeString(java.nio.file.Path.of(dir, "data.txt"),
      "1   alpha   10    " + "\n" +
      "22  beta    200   " + "\n" +
      "333 gamma-x 3000  " + "\n" +
      "4   NULL    40    " + "\n")
    val fields = Seq(("id", 4, "INT"), ("name", 8, "STRING"), ("qty", 6, "INT"))
    val (good, bad) = graft.sources.Ingest.readFixedWidth(
      spark, s"$dir/data.txt", fields, rejectLimit = 0, nullValue = "NULL")
    assert(bad.count() == 0)
    val rows = good.orderBy("id").collect()  // ids sort 1, 4, 22, 333
    assert(rows.length == 4)
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "alpha" && rows(0).getInt(2) == 10)
    assert(rows(3).getString(1) == "gamma-x" && rows(3).getInt(2) == 3000)
    // the NULL marker reads as SQL NULL, not the string
    assert(rows(1).isNullAt(1))
  }

  test("fixed-width read preserves leading blanks in string fields") {
    val dir = tmp("fwlead")
    // name field (8 wide) holds '  ind   ' — leading blanks are DATA in
    // right-aligned layouts; only trailing blanks are formatter padding
    Files.writeString(java.nio.file.Path.of(dir, "data.txt"),
      "7     ind   77    " + "\n")
    val (good, bad) = graft.sources.Ingest.readFixedWidth(
      spark, s"$dir/data.txt", Seq(("id", 4, "INT"), ("name", 8, "STRING"), ("qty", 6, "INT")),
      rejectLimit = 0, nullValue = "NULL")
    assert(bad.count() == 0)
    val r = good.head()
    assert(r.getInt(0) == 7 && r.getInt(2) == 77)
    assert(r.getString(1) == "  ind", s"got '${r.getString(1)}'")
  }

  test("fixed-width read: malformed lines land in the reject table under the limit") {
    val dir = tmp("fwrej")
    Files.writeString(java.nio.file.Path.of(dir, "data.txt"),
      "1   alpha   10    " + "\n" +
      "bad line too short" + "!!\n" +        // wrong total width
      "xx  delta   50    " + "\n" +          // id not an int
      "5   epsilon 99    " + "\n")
    val fields = Seq(("id", 4, "INT"), ("name", 8, "STRING"), ("qty", 6, "INT"))
    val (good, bad) = graft.sources.Ingest.readFixedWidth(
      spark, s"$dir/data.txt", fields, rejectLimit = 2, nullValue = "NULL")
    assert(good.count() == 2)
    assert(bad.count() == 2)
    assertThrows[IllegalStateException] {
      graft.sources.Ingest.readFixedWidth(
        spark, s"$dir/data.txt", fields, rejectLimit = 1, nullValue = "NULL")
    }
  }

  test("custom DSv2 fixed-width connector: reads, prunes columns, distributes per file") {
    val dir = tmp("fwv2")
    Files.writeString(java.nio.file.Path.of(dir, "a.txt"),
      "1   alpha   10    " + "\n" + "22  beta    200   " + "\n")
    Files.writeString(java.nio.file.Path.of(dir, "b.txt"),
      "333 gamma-x 3000  " + "\n")
    val df = spark.read.format("graft.sources.v2.FixedWidthSource")
      .schema("id INT, name STRING, qty INT")
      .option("widths", "4,8,6")
      .load(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1, "alpha", 10), (22, "beta", 200), (333, "gamma-x", 3000)))
    // one input partition per file — the per-segment protocol read
    assert(df.rdd.getNumPartitions == 2)
    // column pruning reaches the custom scan: a single-column projection
    // plans a BatchScan whose output (and reader slices) carry ONLY qty
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val pruned = df.select("qty")
    val scan = pruned.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b }.get
    assert(scan.output.map(_.name) == Seq("qty"), scan.output)
    assert(scan.scan.description().contains("required=qty"), scan.scan.description())
    assert(pruned.collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 200, 3000))
    // PERMISSIVE degraded cell: unparseable int reads as NULL via the
    // connector (the reject-table contract stays with Ingest.readFixedWidth)
    Files.writeString(java.nio.file.Path.of(dir, "c.txt"),
      "xx  delta   50    " + "\n")
    val withBad = spark.read.format("graft.sources.v2.FixedWidthSource")
      .schema("id INT, name STRING, qty INT")
      .option("widths", "4,8,6")
      .load(dir)
    assert(withBad.filter(col("id").isNull).count() == 1)
  }

  test("fixed-width write/read round-trip; overflow value fails the load") {
    val dir = tmp("fwrt")
    import spark.implicits._
    val df = Seq((1, "alpha", 10), (22, "beta", 200), (333, null: String, 3000))
      .toDF("id", "name", "qty")
    val n = graft.sources.Ingest.writeFixedWidth(
      spark, df, s"$dir/out", Seq(("id", 4), ("name", 8), ("qty", 6)), nullValue = "NULL")
    assert(n == 3)
    val (back, bad) = graft.sources.Ingest.readFixedWidth(
      spark, s"$dir/out", Seq(("id", 4, "INT"), ("name", 8, "STRING"), ("qty", 6, "INT")),
      rejectLimit = 0, nullValue = "NULL")
    assert(bad.count() == 0)
    val got = back.orderBy("id").collect().map(r =>
      (r.getInt(0), if (r.isNullAt(1)) null else r.getString(1), r.getInt(2)))
    assert(got.toSeq == Seq((1, "alpha", 10), (22, "beta", 200), (333, null, 3000)))
    // a value wider than its declared field is a formatter error
    val wide = Seq((1, "name-way-too-long-for-field", 1)).toDF("id", "name", "qty")
    assertThrows[Exception] {
      graft.sources.Ingest.writeFixedWidth(
        spark, wide, s"$dir/bad", Seq(("id", 4), ("name", 8), ("qty", 6)))
    }
  }
}
