package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Matviews

/** Materialized-view lifecycle (matview.c / ExecRefreshMatView parity):
  * stored definition re-executed on refresh, old snapshot retained for
  * in-flight readers, crash mid-refresh invisible, staleness marker. */
class MatviewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def tmp(s: String): String =
    Files.createTempDirectory(s"graft_$s").toString

  private def writeBase(dir: String, upTo: Int): Unit = {
    import spark.implicits._
    (1 to upTo).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "cat")
      .write.mode("overwrite").parquet(dir)
  }

  test("create / read / refresh lifecycle with retained pre-refresh snapshot") {
    val base = tmp("mvbase"); val mv = tmp("mv") + "/mv1"
    writeBase(base, 10)
    // path-based table in the stored definition: resolved at each
    // execution, like the reference's catalog lookup at refresh time
    val defn =
      s"SELECT cat, COUNT(*) AS n, SUM(id) AS sum_id FROM parquet.`$base` " +
        "GROUP BY cat"
    val created = Matviews.create(spark, mv, defn)
    assert(created.count() == 2)
    assert(Matviews.definition(spark, mv) == defn)
    assert(Matviews.read(spark, mv)
      .filter(col("cat") === "even").head.getLong(1) == 5)
    assert(!Matviews.isStale(spark, mv, Seq(base)))

    // take a snapshot reader BEFORE refreshing, then change the base
    val preRefresh = Matviews.read(spark, mv)
    Thread.sleep(1100) // mtime granularity can be a full second
    writeBase(base, 20)
    assert(Matviews.isStale(spark, mv, Seq(base)),
      "base rewrite must flip the staleness marker")

    val refreshed = Matviews.refresh(spark, mv)
    assert(refreshed.filter(col("cat") === "even").head.getLong(1) == 10,
      "refresh must re-execute the stored definition against new base data")
    assert(!Matviews.isStale(spark, mv, Seq(base)))
    // MVCC property: the pre-refresh snapshot's files survive one cycle
    assert(preRefresh.filter(col("cat") === "even").head.getLong(1) == 5,
      "pre-refresh snapshot must stay readable after refresh")

    // a second refresh prunes the oldest version but keeps serving
    Matviews.refresh(spark, mv)
    assert(Matviews.read(spark, mv).count() == 2)
    val vdirs = new java.io.File(mv).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(vdirs == Set("v2", "v3"), s"expected bounded retention, got $vdirs")
  }

  test("a crashed (marker-less) refresh attempt stays invisible") {
    val base = tmp("mvbase2"); val mv = tmp("mv2") + "/mv"
    writeBase(base, 6)
    Matviews.create(spark, mv,
      s"SELECT COUNT(*) AS n FROM parquet.`$base`")
    // simulate a refresh that died after writing data but before commit:
    // a version dir with data files and NO _SUCCESS marker
    val crashed = new java.io.File(s"$mv/v7"); crashed.mkdirs()
    Files.write(java.nio.file.Path.of(s"$mv/v7/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(Matviews.read(spark, mv).head.getLong(0) == 6,
      "reader must keep serving the last committed version")
    // the next successful refresh skips past the crashed dir's number
    Matviews.refresh(spark, mv)
    assert(Matviews.read(spark, mv).head.getLong(0) == 6)
    assert(new java.io.File(s"$mv/v8/_SUCCESS").exists(),
      "refresh must allocate a version beyond any crashed attempt")
  }

  test("create refuses to overwrite an existing view") {
    val base = tmp("mvbase3"); val mv = tmp("mv3") + "/mv"
    writeBase(base, 3)
    val defn = s"SELECT * FROM parquet.`$base`"
    Matviews.create(spark, mv, defn)
    assertThrows[IllegalArgumentException](Matviews.create(spark, mv, defn))
  }

  // ---- incremental (delta) aggregate maintenance ----

  private def appendBatch(dir: String, ids: Range): Unit = {
    import spark.implicits._
    ids.map(i => (i.toLong, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "cat")
      .write.mode("append").parquet(dir)
  }

  private val incAggs = Seq(
    Matviews.IncAgg("count", "*", "n"), Matviews.IncAgg("sum", "id", "sum_id"),
    Matviews.IncAgg("min", "id", "min_id"), Matviews.IncAgg("max", "id", "max_id"))

  private def fullAgg(base: String) =
    spark.read.parquet(base).groupBy("cat")
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
           min(col("id")).as("min_id"), max(col("id")).as("max_id"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("incremental refresh merges the delta and equals the full aggregate") {
    val base = tmp("mvincb"); val mv = tmp("mvinc") + "/mv"
    appendBatch(base, 1 to 10)
    val v1 = Matviews.createIncremental(spark, mv, base, Seq("cat"), incAggs)
    assert(asMap(v1.select("cat", "n", "sum_id", "min_id", "max_id")) ==
      asMap(fullAgg(base)))

    appendBatch(base, 11 to 25)
    val v2 = Matviews.refreshIncremental(spark, mv)
    assert(asMap(v2.select("cat", "n", "sum_id", "min_id", "max_id")) ==
      asMap(fullAgg(base)),
      "merged state must equal a from-scratch aggregate of the whole base")

    // no new files -> no-op refresh, same version keeps serving
    val before = new java.io.File(mv).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    Matviews.refreshIncremental(spark, mv)
    val after = new java.io.File(mv).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(before == after, "a delta-less refresh must not write a version")
  }

  test("incremental refresh never re-reads already-ingested base files") {
    val base = tmp("mvincb2"); val mv = tmp("mvinc2") + "/mv"
    appendBatch(base, 1 to 8)
    Matviews.createIncremental(spark, mv, base, Seq("cat"), incAggs)
    val expected = asMap(fullAgg(base)) // snapshot BEFORE mutating the base
    // delete every ingested data file: a refresh that touched history
    // would now fail (or change results); delta-only maintenance does
    // neither
    new java.io.File(base).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_")  &&
                   !f.getName.startsWith("."))
      .foreach(f => assert(f.delete()))
    appendBatch(base, 9 to 12)
    val refreshed = Matviews.refreshIncremental(spark, mv)
    val grown = asMap(refreshed.select("cat", "n", "sum_id", "min_id", "max_id"))
    assert(grown("even")._1 == 4 + 2 && grown("odd")._1 == 4 + 2)
    assert(grown("even")._2 == expected("even")._2 + 10 + 12)
    assert(grown("even")._4 == 12, "max must absorb the delta")
    assert(grown("even")._3 == expected("even")._3, "min survives from state")
  }

  test("a version without its file list falls back to a full rebuild") {
    val base = tmp("mvincb3"); val mv = tmp("mvinc3") + "/mv"
    appendBatch(base, 1 to 6)
    Matviews.createIncremental(spark, mv, base, Seq("cat"), incAggs)
    // simulate the crash window: commit marker present, file list lost
    val v = new java.io.File(mv).listFiles().filter(_.isDirectory)
      .map(_.getName.drop(1).toInt).max
    assert(new java.io.File(s"$mv/v$v/_graft_files").delete())
    appendBatch(base, 7 to 9)
    val rebuilt = Matviews.refreshIncremental(spark, mv)
    assert(asMap(rebuilt.select("cat", "n", "sum_id", "min_id", "max_id")) ==
      asMap(fullAgg(base)),
      "an ineligible parent must trigger a correct full rebuild, " +
        "never double-counting")
  }

  test("time travel: retained versions stay readable, as-of picks by commit time") {
    val sp = spark; import sp.implicits._
    val mv = java.nio.file.Files.createTempDirectory("tt").toString + "/t"
    def snap(n: Int) = Seq.tabulate(n)(i => (i.toLong, s"v$n")).toDF("k", "tag")
    for (n <- Seq(1, 2, 3)) {
      Matviews.writeSnapshot(spark, mv, snap(n), keepVersions = 4)
      Thread.sleep(20) // distinct commit mtimes for the as-of boundary
    }
    val vs = Matviews.listVersions(spark, mv)
    assert(vs.map(_._1) == Seq(1, 2, 3))
    assert(vs.map(_._2) == vs.map(_._2).sorted)
    // every retained version readable and distinct
    for ((v, _) <- vs)
      assert(Matviews.readVersion(spark, mv, v).count() == v)
    // as-of between v2's and v3's commits reads v2; as-of now reads v3
    val midTs = (vs(1)._2 + vs(2)._2) / 2
    assert(Matviews.readAsOf(spark, mv, midTs)
      .select("tag").distinct().collect()(0).getString(0) == "v2")
    assert(Matviews.readAsOf(spark, mv, vs(2)._2)
      .select("tag").distinct().collect()(0).getString(0) == "v3")
    // before the first commit: no eligible version
    intercept[IllegalArgumentException] {
      Matviews.readAsOf(spark, mv, vs(0)._2 - 1000)
    }
    // default retention still prunes to 2: a 4th default write drops v1/v2
    Matviews.writeSnapshot(spark, mv, snap(4))
    assert(Matviews.listVersions(spark, mv).map(_._1) == Seq(3, 4))
    intercept[IllegalArgumentException] {
      Matviews.readVersion(spark, mv, 1)
    }
  }
}
