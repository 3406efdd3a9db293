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
    * `set` applied; everything lands in a new table version. */
  def updateWhere(spark: SparkSession, source: DataFrame, path: String,
                  where: Column, set: Map[String, Column]): DataFrame = {
    val updated = set.foldLeft(source) { case (df, (name, value)) =>
      df.withColumn(name, when(where, value).otherwise(col(name)))
    }
    updated.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  /** DELETE ... WHERE as filter-rewrite. */
  def deleteWhere(spark: SparkSession, source: DataFrame, path: String,
                  where: Column): DataFrame = {
    source.filter(!where || where.isNull).write
      .mode(SaveMode.Overwrite).parquet(path)
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
