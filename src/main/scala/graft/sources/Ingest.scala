package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest / DML layer — SURVEY §2.1 sinks and error-tolerant sources.
  *
  * Reference: external tables with single-row error handling and
  * `SEGMENT REJECT LIMIT` (`/root/reference/src/backend/cdb/cdbsreh.c:50-162`),
  * COPY in/out (`src/backend/commands/copy.c`), ModifyTable
  * (`src/backend/executor/nodeModifyTable.c:2381`), SplitUpdate for
  * distribution-key updates (`nodeSplitUpdate.c:169`).
  *
  * Spark-first mappings: PERMISSIVE CSV read with `_corrupt_record`
  * capture = single-row error tables; partitioned Parquet write = the
  * distribution/partition policy; UPDATE/DELETE = read-filter-rewrite
  * (immutable storage, the AO-table compaction model).
  */
object Ingest {

  /** Error-tolerant CSV read (cdbsreh parity): good rows + a reject
    * "error table", plus a reject-limit check. */
  def readCsvPermissive(spark: SparkSession, path: String,
                        ddl: String, rejectLimit: Int): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(ddl + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("header", "false")
      .csv(path)
      .cache()
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val nBad = bad.count()
    if (nBad > rejectLimit)
      throw new IllegalStateException(
        s"segment reject limit reached: $nBad > $rejectLimit")
    (good, bad)
  }

  /** CTAS into a partitioned Parquet table (multi-level partitioning
    * analogue; partition pruning comes from the directory layout). */
  def ctasPartitioned(spark: SparkSession, df: DataFrame, path: String,
                      partitionCols: String*): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)
    spark.read.parquet(path)
  }

  /** UPDATE ... WHERE as read-modify-rewrite: rows matching `where` get
    * `set` applied; everything lands in a new table version. Whole-table
    * rewrite — the fallback for UNPARTITIONED tables; partitioned tables
    * take [[updateWherePartitioned]] (O(touched partitions), the
    * SplitUpdate parity path). */
  def updateWhere(spark: SparkSession, source: DataFrame, path: String,
                  where: Column, set: Map[String, Column]): DataFrame = {
    val updated = set.foldLeft(source) { case (df, (name, value)) =>
      df.withColumn(name, when(where, value).otherwise(col(name)))
    }
    updated.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** DELETE ... WHERE as filter-rewrite (unpartitioned fallback; see
    * [[deleteWherePartitioned]]). */
  def deleteWhere(spark: SparkSession, source: DataFrame, path: String,
                  where: Column): DataFrame = {
    source.filter(!where || where.isNull).write
      .mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** Run `body` with a SQL conf set, restoring the previous value after —
    * never leaves session-global state behind. */
  private def withConf[T](spark: SparkSession, key: String, value: String)
                         (body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Partition-scoped UPDATE (SplitUpdate parity,
    * `/root/reference/src/backend/executor/nodeSplitUpdate.c:169` routes
    * only affected rows): the table at `path` is partitioned on `partCol`;
    * only partitions that CONTAIN a matching row are rewritten, via
    * dynamic partition overwrite. I/O cost is O(touched partitions) —
    * untouched partition files are never read for the rewrite nor
    * replaced. The touched-partition set is derived plan-side (semi-join),
    * never collected to the driver. */
  def updateWherePartitioned(spark: SparkSession, path: String, partCol: String,
                             where: Column, set: Map[String, Column]): DataFrame = {
    val table = spark.read.parquet(path)
    val touched = table.filter(where).select(col(partCol)).distinct()
    val affected = table.join(touched, Seq(partCol), "left_semi")
    val updated = set.foldLeft(affected) { case (df, (name, value)) =>
      df.withColumn(name, when(where, value).otherwise(col(name)))
    }
    // materialize the rewritten partitions before overwriting the path we
    // read them from (bounded: touched partitions only). A catalog-table
    // INSERT OVERWRITE has no such read-write cycle; this harness is
    // path-based.
    updated.persist()
    try {
      updated.count()
      withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
        updated.write.mode(SaveMode.Overwrite)
          .partitionBy(partCol).parquet(path)
      }
    } finally updated.unpersist()
    spark.read.parquet(path)
  }

  /** Partition-scoped DELETE: rewrite only partitions holding matching
    * rows; untouched partitions keep their files byte-for-byte. */
  def deleteWherePartitioned(spark: SparkSession, path: String, partCol: String,
                             where: Column): DataFrame = {
    val table = spark.read.parquet(path)
    val touched = table.filter(where).select(col(partCol)).distinct()
    val kept = table.join(touched, Seq(partCol), "left_semi")
      .filter(!where || where.isNull)
    kept.persist()
    try {
      kept.count()
      // dynamic overwrite replaces only partitions PRESENT in the output —
      // a partition whose every row matched would silently survive. Those
      // fully-emptied partition values (bounded by the partition count, a
      // metadata-sized set) get their directories removed explicitly.
      val emptied = touched
        .join(kept.select(col(partCol)).distinct(), Seq(partCol), "left_anti")
        .collect().map(_.get(0))
      withConf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic") {
        kept.write.mode(SaveMode.Overwrite)
          .partitionBy(partCol).parquet(path)
      }
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      emptied.foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(path, s"$partCol=$v"), true)
      }
    } finally kept.unpersist()
    spark.read.parquet(path)
  }

  /** MERGE INTO / upsert (PG15 MERGE, `nodeModifyTable.c` merge actions;
    * the reference routes matched rows to UPDATE and unmatched source
    * rows to INSERT). Spark-first: one left join decides matched-ness per
    * target row (updateCols take the SOURCE value when matched), one
    * anti join yields the inserts — a single shuffle on the key each,
    * no driver-side row handling. Source and target must share a schema. */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
                keys: Seq[String], updateCols: Seq[String]): DataFrame = {
    val target = spark.read.parquet(path)
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"merge schema mismatch: ${target.columns.toSeq} vs ${source.columns.toSeq}")
    val src = source.columns.foldLeft(source)(
      (df, c) => df.withColumnRenamed(c, s"__s_$c"))
    val cond = keys.map(k => col(k) === col(s"__s_$k")).reduce(_ && _)
    val matched = col(s"__s_${keys.head}").isNotNull
    val updated = target.join(src, cond, "left").select(
      target.columns.map { c =>
        if (updateCols.contains(c))
          when(matched, col(s"__s_$c")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
    val inserts = source.join(
      target.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val out = updated.unionByName(inserts)
    // materialize before overwriting the path the plan reads from
    // (path-based harness; a catalog INSERT OVERWRITE has no cycle)
    out.persist()
    try {
      out.count()
      out.write.mode(SaveMode.Overwrite).parquet(path)
    } finally out.unpersist()
    spark.read.parquet(path)
  }

  /** COPY TO (csv unload) and back. */
  def copyOutIn(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)
    spark.read.option("header", "true")
      .schema(df.schema).csv(path)
  }
}
