package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Matviews

/** Concurrent-writer isolation for the matview snapshot protocol — the
  * analogue of the reference's isolation2 matview specs
  * (`/root/reference/src/test/isolation2/`): ExecRefreshMatView holds a
  * relation lock so overlapping refreshes serialize; here overlapping
  * writers must (a) never write the same version directory (atomic
  * claim), (b) each commit an internally-pure snapshot, and (c) leave
  * readers a consistent committed version at every instant. All races
  * run through a start barrier so both writers enter the protocol
  * together (same-JVM threads — the claim monitor's in-process leg;
  * the `.claim_vN` exclusive-create covers the cross-driver leg).
  */
class MatviewRaceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/mv"

  /** Run the thunks concurrently from a common start barrier;
    * re-throws the first failure. */
  private def race(thunks: Seq[() => Unit]): Unit = {
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(thunks.size)
    val futs = thunks.map { th =>
      pool.submit(new Runnable {
        def run(): Unit = { start.await(); th() }
      })
    }
    start.countDown()
    try futs.foreach(_.get(180, TimeUnit.SECONDS))
    finally pool.shutdown()
  }

  test("racing writeSnapshot writers claim distinct versions; every commit is pure") {
    val path = tmp("mv_race_snap")
    val rounds = 4
    for (round <- 1 to rounds) {
      race(Seq("a", "b").map { side => () =>
        val tag = s"$side$round"
        val df = spark.range(50)
          .select(col("id").cast("int").as("k"), lit(tag).as("tag"))
        Matviews.writeSnapshot(spark, path, df, keepVersions = 100)
      })
    }
    val committed = Matviews.listVersions(spark, path).map(_._1)
    // one version per writer per round: no writer lost its write to a
    // same-number collision, none tore another's directory
    assert(committed.size == 2 * rounds,
      s"expected ${2 * rounds} committed versions, got $committed")
    committed.foreach { v =>
      val rows = Matviews.readVersion(spark, path, v)
        .select("tag").collect().map(_.getString(0))
      assert(rows.length == 50, s"v$v torn: ${rows.length} rows")
      assert(rows.distinct.length == 1,
        s"v$v mixes writers: ${rows.distinct.toSeq}")
    }
  }

  test("racing refreshIncremental writers never double-count a delta") {
    val base = java.nio.file.Files.createTempDirectory("mv_race_base").toString
    def appendBase(tag: Int): Unit =
      spark.range(100)
        .select((col("id") % 5).as("g"), (col("id") + tag * 1000).as("x"))
        .write.mode("append").parquet(base)
    appendBase(0)
    val path = tmp("mv_race_inc")
    Matviews.createIncremental(spark, path, base,
      Seq("g"), Seq(Matviews.IncAgg("count", "", "n"),
        Matviews.IncAgg("sum", "x", "sx")))
    // new delta arrives; two maintenance jobs fire simultaneously
    appendBase(1)
    race(Seq.fill(2)(() => { Matviews.refreshIncremental(spark, path); () }))
    // the state must equal the full-rebuild oracle: the shared delta was
    // ingested into each writer's OWN version (both parented on v1),
    // never twice into one
    val got = Matviews.read(spark, path)
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
    // and a later sequential refresh is a clean no-op on the winner
    Matviews.refreshIncremental(spark, path)
    val again = Matviews.read(spark, path)
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == want.toSeq)
  }

  test("full-rebuild writeSnapshot racing refreshIncremental converges, readers never see a mix") {
    val base = java.nio.file.Files.createTempDirectory("mv_race_mix").toString
    spark.range(60).select((col("id") % 3).as("g"), col("id").as("x"))
      .write.mode("append").parquet(base)
    val path = tmp("mv_race_mixmv")
    Matviews.createIncremental(spark, path, base,
      Seq("g"), Seq(Matviews.IncAgg("count", "", "n"),
        Matviews.IncAgg("sum", "x", "sx")))
    spark.range(60, 120).select((col("id") % 3).as("g"), col("id").as("x"))
      .write.mode("append").parquet(base)
    val oracle = () => spark.read.parquet(base).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    // writer 1: incremental maintenance; writer 2: a full rebuild
    // committed via writeSnapshot (the REFRESH-by-recompute path);
    // reader: hammers read() asserting every observed state is a
    // complete committed snapshot (3 groups, internally consistent n)
    @volatile var readerFailure: Option[Throwable] = None
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val rows = Matviews.read(spark, path).collect()
          assert(rows.length == 3, s"torn read: ${rows.length} groups")
          val total = rows.map(_.getLong(1)).sum
          assert(total == 60 || total == 120,
            s"mixed snapshot: total count $total")
        }
      } catch { case t: Throwable => readerFailure = Some(t) }
    })
    reader.start()
    race(Seq(
      () => { Matviews.refreshIncremental(spark, path); () },
      () => Matviews.writeSnapshot(spark, path, oracle(), keepVersions = 100)))
    stop.set(true)
    reader.join(60000)
    readerFailure.foreach(throw _)
    // both writers committed; current state equals the oracle
    val got = Matviews.read(spark, path)
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = oracle().orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("retention sweep never reaps an in-flight (marker-less) version") {
    // The exact shape that tore a live write in the full-battery run:
    // writer A claims v1 and is still writing (claim marker + marker-less
    // directory on disk — constructed here directly, since the protocol
    // is purely file-based) while later claimants commit and sweep with
    // an aggressive retention. The sweep must leave v1 alone: marker-less
    // is indistinguishable from in-flight.
    val path = tmp("mv_sweep_inflight")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/v1/_temporary/0"))
    fs.create(new org.apache.hadoop.fs.Path(path, ".claim_v1"), false).close()

    def df(tag: String) = spark.range(10)
      .select(col("id").as("k"), lit(tag).as("tag"))
    Matviews.writeSnapshot(spark, path, df("b"), keepVersions = 1) // claims v2
    Matviews.writeSnapshot(spark, path, df("c"), keepVersions = 1) // claims v3, sweeps v2
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/v1/_temporary")),
      "in-flight v1 was reaped by the retention sweep")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, ".claim_v1")),
      "in-flight v1's claim marker was reaped")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/v2")),
      "superseded committed v2 should have been swept")

    // A's write completes: its directory is intact, the commit is clean
    df("a").write.mode("overwrite").parquet(s"$path/v1")
    assert(Matviews.readVersion(spark, path, 1)
      .select("tag").distinct().collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(Matviews.listVersions(spark, path).map(_._1).sorted == Seq(1, 3))
  }

  test("vacuumCrashed reaps stale marker-less versions, nothing else") {
    val path = tmp("mv_vacuum")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Matviews.writeSnapshot(spark, path,
      spark.range(5).select(col("id").as("k")), keepVersions = 100) // v1 committed
    // crashed leftover: claim + partial directory
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/v2/_temporary/0"))
    fs.create(new org.apache.hadoop.fs.Path(path, ".claim_v2"), false).close()
    // bare claim, writer never started writing
    fs.create(new org.apache.hadoop.fs.Path(path, ".claim_v3"), false).close()

    // inside the horizon: nothing is reaped (could still be in flight)
    assert(Matviews.vacuumCrashed(spark, path, olderThanMs = 3600 * 1000L).isEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/v2")))

    Thread.sleep(20)
    // past the horizon: the crashed directory goes, with its claim;
    // the committed v1 and the bare v3 claim stay
    assert(Matviews.vacuumCrashed(spark, path, olderThanMs = 10L) == Seq(2))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/v2")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, ".claim_v2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, ".claim_v3")))
    assert(Matviews.listVersions(spark, path).map(_._1) == Seq(1))
    // next claim still advances past every number ever claimed
    Matviews.writeSnapshot(spark, path,
      spark.range(5).select(col("id").as("k")), keepVersions = 100)
    assert(Matviews.listVersions(spark, path).map(_._1).sorted == Seq(1, 4))
  }
}
