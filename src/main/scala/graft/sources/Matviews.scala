package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Materialized-view lifecycle (CREATE / REFRESH / SELECT / staleness).
  *
  * Reference: `/root/reference/src/backend/commands/matview.c`
  * (`ExecRefreshMatView`): the stored view definition is re-executed into
  * a transient heap, which then swaps in as the relation's new contents —
  * concurrent readers keep scanning the pre-refresh heap (MVCC), and a
  * crash mid-refresh leaves the old contents current. Tests:
  * `/root/reference/src/test/regress/sql/matview.sql`.
  *
  * Spark-first mapping — versioned Parquet directories instead of heap
  * swaps, commit protocol instead of WAL:
  *
  * {{{
  *   <path>/_graft_mv.json   stored definition (SQL text), immutable
  *   <path>/v1/, v2/, ...    one Parquet snapshot per refresh
  * }}}
  *
  *  - The CURRENT version is the highest `vN` containing Spark's own
  *    `_SUCCESS` commit marker. A refresh that crashes mid-write leaves a
  *    marker-less directory that readers never see — the old version
  *    stays current with no recovery step (the transient-heap property).
  *  - REFRESH re-executes the STORED definition (like the reference; the
  *    definition is not re-supplied by the caller), writes `v(N+1)`, then
  *    prunes versions older than `vN` — the immediately-previous snapshot
  *    survives one more cycle so in-flight readers of `vN` finish their
  *    scan (bounded MVCC: 2 versions on disk).
  *  - Staleness: a view is stale iff any base-table file was modified
  *    after the current version committed (driver-side metadata listing
  *    only — no data read).
  *
  * The definition SQL runs against the session's registered views/tables,
  * matching the reference's catalog lookup at refresh time.
  */
object Matviews {

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaPath(path: String) = new Path(path, "_graft_mv.json")

  private def versions(fs: FileSystem, path: String): Seq[Int] =
    if (!fs.exists(new Path(path))) Seq.empty
    else fs.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(_.getPath.getName.drop(1).toInt).sorted

  /** Highest version with a _SUCCESS commit marker — the current
    * contents. None for a never-successfully-populated view. */
  private def currentVersion(fs: FileSystem, path: String): Option[Int] =
    versions(fs, path).filter(v =>
      fs.exists(new Path(s"$path/v$v/_SUCCESS"))).lastOption

  // ---- concurrent-writer protocol ---------------------------------------
  // At 100 TB refreshes overlap (the reference serializes them with a
  // relation-level ExclusiveLock in ExecRefreshMatView; its isolation2
  // suite is the test layer for exactly this). Without coordination two
  // writers computing next = max+1 would pick the SAME version and
  // Overwrite-write the same directory — a torn version. Version numbers
  // are therefore CLAIMED before any data is written: in-process a
  // per-view monitor serializes claims (two refresh jobs on one driver),
  // and cross-driver the `.claim_vN` marker file is created with
  // overwrite=false — atomic-exclusive on HDFS, a conditional put on
  // object stores. A claimed-but-crashed attempt leaves a claim marker
  // and possibly a marker-less directory: both only advance the next
  // version number; neither is ever readable. Claim markers are swept
  // with the versions they named.

  private val claimLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def claimedVersions(fs: FileSystem, path: String): Seq[Int] =
    if (!fs.exists(new Path(path))) Seq.empty
    else fs.listStatus(new Path(path)).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("\\.claim_v\\d+"))
      .map(_.stripPrefix(".claim_v").toInt)

  /** Atomically claim the next version number for `path`. */
  private def claimVersion(fs: FileSystem, path: String): Int = {
    val lock = claimLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      var n = (versions(fs, path) ++ claimedVersions(fs, path))
        .maxOption.getOrElse(0) + 1
      var won = false
      while (!won) {
        try {
          fs.mkdirs(new Path(path))
          val out = fs.create(new Path(path, s".claim_v$n"), false)
          out.close(); won = true
        } catch {
          // Only a lost race advances the number; a persistent failure
          // (permissions, quota, FS outage) must surface, not spin.
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => n += 1
          case e: java.io.IOException =>
            if (fs.exists(new Path(path, s".claim_v$n"))) n += 1 else throw e
        }
      }
      n
    }
  }

  /** Delete a superseded version directory and its claim marker. */
  private def dropVersion(fs: FileSystem, path: String, v: Int): Unit = {
    fs.delete(new Path(s"$path/v$v"), true)
    fs.delete(new Path(path, s".claim_v$v"), false)
  }

  /** CREATE MATERIALIZED VIEW: store the definition, populate v1. */
  def create(spark: SparkSession, path: String, definitionSql: String): DataFrame = {
    val fs = fsOf(spark, path)
    require(!fs.exists(metaPath(path)), s"matview already exists at $path")
    fs.mkdirs(new Path(path))
    val out = fs.create(metaPath(path), false)
    try out.write(definitionSql.getBytes("UTF-8")) finally out.close()
    writeVersion(spark, path, 1)
    read(spark, path)
  }

  /** The stored definition (what REFRESH will re-execute). */
  def definition(spark: SparkSession, path: String): String = {
    val fs = fsOf(spark, path)
    val in = fs.open(metaPath(path))
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def writeVersion(spark: SparkSession, path: String, v: Int): Unit =
    spark.sql(definition(spark, path))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/v$v")

  /** REFRESH MATERIALIZED VIEW: re-run the stored definition into the next
    * version dir, then prune all versions older than the one being
    * superseded. Readers of the pre-refresh snapshot are undisturbed. */
  def refresh(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    val cur = currentVersion(fs, path).getOrElse(
      throw new IllegalStateException(s"no populated matview at $path"))
    // claimed atomically, so a crashed attempt's number is never re-used
    // for a fresh write while a reader might list it, and a CONCURRENT
    // refresh can never write the same directory
    val next = claimVersion(fs, path)
    writeVersion(spark, path, next)
    committedVersions(fs, path).filter(_ < cur)
      .foreach(v => dropVersion(fs, path, v))
    read(spark, path)
  }

  /** Commit `df` as the next snapshot version WITHOUT a stored
    * definition — for callers that maintain the contents incrementally
    * (streaming delta refresh) and own the compute. Same crash-safe
    * protocol: a marker-less write is invisible, the previous current
    * version survives one more cycle for in-flight readers. */
  def writeSnapshot(spark: SparkSession, path: String, df: DataFrame): Unit =
    writeSnapshot(spark, path, df, keepVersions = 2)

  /** As [[writeSnapshot]], retaining the last `keepVersions` committed
    * versions instead of the default 2 — the retention knob that turns
    * the MVCC protocol into TIME TRAVEL (`contrib/spi/timetravel.c`
    * keeps superseded row versions for as-of queries; here superseded
    * SNAPSHOT versions stay readable via [[readVersion]]/[[readAsOf]]).
    *
    * The retention sweep drops only COMMITTED (marker-bearing) versions.
    * A marker-less directory below the cutoff is indistinguishable from
    * a concurrent writer mid-write: a racing writer that claimed vN and
    * is still writing while a later claimant commits first would have
    * its directory torn out from under its tasks (caught live by
    * MatviewRaceSpec — both of the victim job's attempt dirs vanished
    * at the winner's sweep). Crashed leftovers are reaped by the
    * explicit [[vacuumCrashed]] instead, behind an age horizon. */
  def writeSnapshot(spark: SparkSession, path: String, df: DataFrame,
                    keepVersions: Int): Unit = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val fs = fsOf(spark, path)
    fs.mkdirs(new Path(path))
    val next = claimVersion(fs, path)
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/v$next")
    val committed = committedVersions(fs, path)
    committed.sorted.takeRight(keepVersions).headOption.foreach(cutoff =>
      committed.filter(_ < cutoff)
        .foreach(v => dropVersion(fs, path, v)))
  }

  private def committedVersions(fs: FileSystem, path: String): Seq[Int] =
    versions(fs, path)
      .filter(v => fs.exists(new Path(s"$path/v$v/_SUCCESS")))

  /** VACUUM for crashed snapshot writes (the vacuumlo/autovacuum analogue
    * of this file's MVCC protocol): delete marker-less version
    * directories — claims whose writer died before commit — together
    * with their claim markers, but ONLY when nothing under the directory
    * has been touched for `olderThanMs`. The horizon is this protocol's
    * xmin: like PG's VACUUM, which may not remove tuples a live
    * transaction can still see, this may not remove a directory a live
    * writer can still be writing — callers pick a horizon longer than
    * their longest plausible write (the default 24h dwarfs any sane
    * snapshot job). Retention sweeps in [[writeSnapshot]] /
    * [[refreshIncremental]] deliberately never touch marker-less
    * directories, whatever their age; this explicit call is the only
    * reaper. Bare claim markers with no directory are left alone — the
    * writer may not have started its write yet, and an unused number
    * costs one empty file. Returns the reaped version numbers. */
  def vacuumCrashed(spark: SparkSession, path: String,
                    olderThanMs: Long = 24L * 3600 * 1000): Seq[Int] = {
    val fs = fsOf(spark, path)
    val horizon = System.currentTimeMillis() - olderThanMs
    def newestMtime(p: Path): Long = {
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) st.getModificationTime
      else (st.getModificationTime +:
        fs.listStatus(p).toSeq.map(c => newestMtime(c.getPath))).max
    }
    val stale = versions(fs, path).filter { v =>
      val dir = new Path(s"$path/v$v")
      // a concurrent retention sweep (or second vacuum) may delete the
      // directory between the listing and the stat — and a live writer
      // renames attempt dirs under it; a vanished entry is simply not
      // ours to vacuum this round
      try !fs.exists(new Path(dir, "_SUCCESS")) && newestMtime(dir) < horizon
      catch { case _: java.io.FileNotFoundException => false }
    }
    stale.foreach(v => dropVersion(fs, path, v))
    stale
  }

  /** Committed (marker-bearing) versions with their commit times,
    * oldest first — the time-travel catalog. */
  def listVersions(spark: SparkSession, path: String): Seq[(Int, Long)] = {
    val fs = fsOf(spark, path)
    versions(fs, path)
      .filter(v => fs.exists(new Path(s"$path/v$v/_SUCCESS")))
      .map(v => v -> fs.getFileStatus(new Path(s"$path/v$v/_SUCCESS"))
        .getModificationTime)
  }

  /** SELECT from a specific retained version. */
  def readVersion(spark: SparkSession, path: String, version: Int): DataFrame = {
    val fs = fsOf(spark, path)
    require(fs.exists(new Path(s"$path/v$version/_SUCCESS")),
      s"version $version of $path is not committed or was pruned")
    spark.read.parquet(s"$path/v$version")
  }

  /** AS OF read: the newest version committed at or before `tsMillis`
    * (spi/timetravel's as-of query over snapshot versions). */
  def readAsOf(spark: SparkSession, path: String, tsMillis: Long): DataFrame = {
    val eligible = listVersions(spark, path).filter(_._2 <= tsMillis)
    require(eligible.nonEmpty,
      s"no version of $path committed at or before $tsMillis")
    readVersion(spark, path, eligible.map(_._1).max)
  }

  /** Whether the view has any committed snapshot yet. */
  def exists(spark: SparkSession, path: String): Boolean =
    currentVersion(fsOf(spark, path), path).isDefined

  /** SELECT from the view's current committed snapshot. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    val v = currentVersion(fs, path).getOrElse(
      throw new IllegalStateException(s"no populated matview at $path"))
    spark.read.parquet(s"$path/v$v")
  }

  /** Commit time of the current snapshot (its _SUCCESS marker's mtime). */
  def refreshedAtMillis(spark: SparkSession, path: String): Long = {
    val fs = fsOf(spark, path)
    val v = currentVersion(fs, path).getOrElse(
      throw new IllegalStateException(s"no populated matview at $path"))
    fs.getFileStatus(new Path(s"$path/v$v/_SUCCESS")).getModificationTime
  }

  // ---- incremental (delta) aggregate maintenance ------------------------
  // Beyond the reference (matview.c refresh is always a full re-execute;
  // `REFRESH ... CONCURRENTLY` diffs OUTPUT rows, still recomputing the
  // whole query): for the append-only bases a 100 TB ingest actually
  // produces, an aggregate view maintains itself from the DELTA alone —
  // aggregate only the base files not yet ingested, then merge partials
  // into the stored state (count/sum via sum, min/max via min/max: the
  // distributive-aggregate algebra; avg = derived sum/count). Refresh
  // cost is O(|view| + |delta files|), never O(|base|): the base is
  // re-listed (metadata only) but historical data files are NEVER
  // re-read — the spec proves it by deleting an already-ingested base
  // file and refreshing anyway.
  //
  // Protocol: the stored snapshot IS the keyed aggregate state (group
  // cols + one column per aggregate — final values for these
  // distributive fns, so `read` needs no finalization). Each version
  // additionally records the exact base-file set it covers in
  // `vN/_graft_files`, written only after Spark's own `_SUCCESS` commit:
  // a crash between the two leaves a readable snapshot that is simply
  // not eligible as an incremental parent, and the next refresh falls
  // back to a full rebuild — never to double-counting.

  /** One maintained aggregate: `fn` in count|sum|min|max (`col` ignored
    * for count), stored/exposed as column `as`. */
  final case class IncAgg(fn: String, col: String, as: String) {
    require(Set("count", "sum", "min", "max")(fn), s"unsupported fn: $fn")
  }

  private def incMetaPath(path: String) = new Path(path, "_graft_mv_inc.txt")

  private def filesListPath(path: String, v: Int) =
    new Path(s"$path/v$v/_graft_files")

  private def listBaseFiles(fs: FileSystem, base: String): Seq[String] = {
    val it = fs.listFiles(new Path(base), true)
    val b = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith("."))
        b += f.getPath.toUri.toString
    }
    b.result().sorted
  }

  /** CREATE: store base/groups/aggs, then build v1 (= the delta from an
    * empty ingested set). */
  def createIncremental(spark: SparkSession, path: String, base: String,
                        groupCols: Seq[String], aggs: Seq[IncAgg]): DataFrame = {
    val fs = fsOf(spark, path)
    require(!fs.exists(incMetaPath(path)),
      s"incremental matview already exists at $path")
    require(aggs.nonEmpty && groupCols.nonEmpty, "need group cols and aggs")
    fs.mkdirs(new Path(path))
    val meta = (s"base=$base" +: s"groups=${groupCols.mkString(",")}" +:
      aggs.map(a => s"agg=${a.fn}:${a.col}:${a.as}")).mkString("\n")
    val out = fs.create(incMetaPath(path), false)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    refreshIncremental(spark, path)
  }

  private def readIncMeta(spark: SparkSession, path: String)
      : (String, Seq[String], Seq[IncAgg]) = {
    val fs = fsOf(spark, path)
    val in = fs.open(incMetaPath(path))
    val lines = (try new String(in.readAllBytes(), "UTF-8") finally in.close())
      .split("\n").toSeq
    def of(k: String) = lines.filter(_.startsWith(s"$k=")).map(_.drop(k.length + 1))
    (of("base").head, of("groups").head.split(",").toSeq,
      of("agg").map { a =>
        val Array(fn, c, as) = a.split(":", 3); IncAgg(fn, c, as)
      })
  }

  /** The delta partial-aggregate of a concrete file list, in state form. */
  private def partialState(spark: SparkSession, files: Seq[String],
                           groups: Seq[String], aggs: Seq[IncAgg]): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(files: _*)
    val cols = aggs.map {
      case IncAgg("count", _, as) => count(lit(1)).as(as)
      case IncAgg("sum", c, as)   => sum(col(c)).as(as)
      case IncAgg("min", c, as)   => min(col(c)).as(as)
      case IncAgg("max", c, as)   => max(col(c)).as(as)
    }
    df.groupBy(groups.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** Merge stored state with a delta partial on the group keys: counts
    * and sums re-sum, min/max re-min/max — one shuffle over
    * O(|view| + |delta groups|) rows. */
  private def mergeState(state: DataFrame, delta: DataFrame,
                         groups: Seq[String], aggs: Seq[IncAgg]): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = aggs.map {
      case IncAgg("count", _, as) => sum(col(as)).as(as)
      case IncAgg("sum", _, as)   => sum(col(as)).as(as)
      case IncAgg("min", _, as)   => min(col(as)).as(as)
      case IncAgg("max", _, as)   => max(col(as)).as(as)
    }
    state.unionByName(delta)
      .groupBy(groups.map(col): _*).agg(cols.head, cols.tail: _*)
  }

  /** REFRESH from the delta alone. The incremental parent is the newest
    * version carrying BOTH the commit marker and its file list; absent
    * one (first build, or a crash between marker and list), the refresh
    * degrades to a full rebuild of the same state shape. No new base
    * files and a valid parent -> no-op. */
  def refreshIncremental(spark: SparkSession, path: String): DataFrame = {
    val fs = fsOf(spark, path)
    val (base, groups, aggs) = readIncMeta(spark, path)
    val all = listBaseFiles(fsOf(spark, base), base)
    val parent = currentVersion(fs, path)
      .filter(v => fs.exists(filesListPath(path, v)))
    val done: Set[String] = parent.map { v =>
      val in = fs.open(filesListPath(path, v))
      (try new String(in.readAllBytes(), "UTF-8") finally in.close())
        .split("\n").filter(_.nonEmpty).toSet
    }.getOrElse(Set.empty)
    val fresh = all.filterNot(done)
    if (fresh.isEmpty && parent.isDefined) return read(spark, path)
    require(fresh.nonEmpty, s"base $base has no data files to build from")
    val delta = partialState(spark, fresh, groups, aggs)
    val next = claimVersion(fs, path)
    val merged = parent match {
      case Some(v) =>
        mergeState(spark.read.parquet(s"$path/v$v"), delta, groups, aggs)
      case None => delta
    }
    merged.write.mode(SaveMode.Overwrite).parquet(s"$path/v$next")
    val out = fs.create(filesListPath(path, next), false)
    try out.write((done ++ fresh).toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    parent.foreach(c => committedVersions(fs, path).filter(_ < c)
      .foreach(v => dropVersion(fs, path, v)))
    read(spark, path)
  }

  /** Staleness marker: true iff any file under a base path is newer than
    * the current snapshot's commit. Metadata-only (a recursive listing of
    * the base dirs — bounded by file count, no data read). */
  def isStale(spark: SparkSession, path: String, basePaths: Seq[String]): Boolean = {
    val asOf = refreshedAtMillis(spark, path)
    basePaths.exists { base =>
      val fs = fsOf(spark, base)
      val it = fs.listFiles(new Path(base), true)
      var newer = false
      while (!newer && it.hasNext) newer = it.next().getModificationTime > asOf
      newer
    }
  }
}
