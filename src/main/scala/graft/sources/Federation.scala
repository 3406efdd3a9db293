package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Federated reads — the FDW source category
  * (`/root/reference/contrib/postgres_fdw/postgres_fdw.c`, with the
  * remote-SQL deparser in `contrib/postgres_fdw/deparse.c`, and
  * `contrib/dblink/dblink.c` for ad-hoc remote queries).
  *
  * Spark-first mapping: `spark.read.jdbc` IS the foreign scan. The
  * JDBC source deparses Catalyst filters into the remote WHERE clause
  * (postgres_fdw's `appendWhereClause` role), prunes columns into the
  * remote SELECT list, and — the piece a single-connection FDW lacks —
  * splits the remote table into `numPartitions` range-bounded queries
  * executed concurrently, one connection per executor task. At 100 TB
  * the federated side is a dimension/metadata store, never the fact
  * table, so the scale story is: push filters remotely, read the
  * filtered slice in parallel, then broadcast it into the local join.
  *
  * Tests run against embedded Derby (in Spark's own classpath) — the
  * "remote" database lives in-JVM, but the code path (JDBCRelation,
  * pushdown, partitioned scan) is exactly what a networked PostgreSQL /
  * MySQL URL would exercise.
  */
object Federation {

  /** dblink-style one-shot remote DDL/DML (autocommitted, connection
    * closed before returning). */
  def execute(url: String, sql: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try { val st = conn.createStatement(); try st.execute(sql) finally st.close() }
    finally conn.close()
  }

  /** Publish a DataFrame as a remote JDBC table (the fixture side of a
    * federation test; also the COPY-to-foreign-table write path). */
  def publish(df: DataFrame, url: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, new Properties)

  /** Foreign scan: single remote cursor (postgres_fdw's model — one
    * connection streams the remote result). Filters/projection applied on
    * the returned frame still push into the remote query via the JDBC
    * relation's filter deparser. */
  def foreignTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new Properties)

  /** Parallel foreign scan: the remote table split into `numPartitions`
    * non-overlapping ranges of `partitionColumn`, one remote query per
    * partition — the multi-gang motion the reference reserves for
    * gpfdist-style sources, applied to JDBC. */
  def foreignTablePartitioned(spark: SparkSession, url: String, table: String,
                              partitionColumn: String, lower: Long, upper: Long,
                              numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions,
      new Properties)
}
