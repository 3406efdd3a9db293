package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loading + numeric-stability helpers shared by every query.
  *
  * The reference (WarehousePG) models tables as catalog relations with a
  * distribution policy (`/root/reference/src/include/catalog/gp_distribution_policy.h:85-90`);
  * here a table is simply a Parquet directory and the "distribution" is
  * whatever partitioning Catalyst derives — `repartition`/`broadcast` at use
  * sites play the role of DISTRIBUTED BY / replicated tables.
  */
object Tables {
  /** Load one test table. Column pruning + predicate pushdown reach the
    * Parquet scan automatically because we never materialize.
    *
    * `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
    * outright; read it as nanos-since-epoch and rebuild a microsecond
    * timestamp (matches DuckDB's behavior on any µs-granularity operation).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  // ---- oracle-stable numeric conventions -------------------------------
  // The driver hash-compares our parquet output against DuckDB. Double
  // summation is order-dependent, so any SUM(double) computed by a parallel
  // engine can differ in the last ulp from a sequential oracle. We make
  // every aggregate bit-deterministic:
  //   * sums of money-like doubles go through DECIMAL(28,6) (exact,
  //     order-independent; the source values carry <= 6 true decimal digits
  //     — price(2dp) * discount(2dp) * tax(2dp) — so the double->decimal
  //     cast recovers the exact rational value in both engines);
  //   * the final value is CAST back to DOUBLE (bit-identical in both
  //     engines while the scaled sum stays below 2^53, true at sf<=0.01
  //     where the hash-compare runs);
  //   * anything inherently float (avg, stddev, corr, cosine) is ROUNDed to
  //     a fixed scale far coarser than the accumulated error.

  val Dec: DecimalType = DecimalType(28, 6)

  /** Exact order-independent sum of a money-like double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Deterministic mean of a money-like double column, as double(4dp). */
  def davg(c: Column): Column =
    round(sum(c.cast(Dec)).cast(DoubleType) / count(lit(1)), 4)

  /** SQL fragment mirroring [[dsum]] for the DuckDB oracle. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"

  /** SQL fragment mirroring [[davg]] for the DuckDB oracle. */
  def sqlDavg(e: String): String =
    s"ROUND(CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*), 4)"
}
