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
    // next = max existing + 1, so a crashed (marker-less) attempt's dir is
    // never re-used for a fresh write while a reader might list it
    val next = versions(fs, path).max + 1
    writeVersion(spark, path, next)
    versions(fs, path).filter(_ < cur)
      .foreach(v => fs.delete(new Path(s"$path/v$v"), true))
    read(spark, path)
  }

  /** Commit `df` as the next snapshot version WITHOUT a stored
    * definition — for callers that maintain the contents incrementally
    * (streaming delta refresh) and own the compute. Same crash-safe
    * protocol: a marker-less write is invisible, the previous current
    * version survives one more cycle for in-flight readers. */
  def writeSnapshot(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val fs = fsOf(spark, path)
    fs.mkdirs(new Path(path))
    val cur = currentVersion(fs, path)
    val next = versions(fs, path).maxOption.getOrElse(0) + 1
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/v$next")
    cur.foreach(c => versions(fs, path).filter(_ < c)
      .foreach(v => fs.delete(new Path(s"$path/v$v"), true)))
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
