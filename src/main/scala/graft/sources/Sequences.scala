package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-id / sequence surface — the reference's sequence generator
  * (`/root/reference/src/backend/commands/sequence.c`; GP caches a block
  * of sequence values per segment so segments never coordinate per row).
  *
  * Spark-first mapping of the same idea:
  *  - [[withUniqueId]]: `monotonically_increasing_id` — unique and
  *    monotone within each partition, no coordination at all (the
  *    CACHE-per-segment behavior; ids have gaps between partitions);
  *  - [[withGaplessId]]: gapless 1..N — one tiny per-partition count
  *    aggregation (metadata-sized: #partitions rows) computes each
  *    partition's offset, then rows number themselves inside their
  *    partition. Two narrow passes, no global sort, no single-task
  *    funnel — the distributed equivalent of `nextval` without CACHE.
  */
object Sequences {

  /** Segment-local unique ids (gaps allowed, like a CACHEd sequence). */
  def withUniqueId(df: DataFrame, name: String): DataFrame =
    df.withColumn(name, monotonically_increasing_id())

  /** Gapless 1..N ids. `order` fixes the within-partition order (any
    * deterministic column set); partition offsets come from a
    * #partitions-row aggregate — bounded driver data by construction. */
  def withGaplessId(df: DataFrame, name: String, order: Seq[Column]): DataFrame = {
    val withPid = df.withColumn("__pid", spark_partition_id())
    val offsets = withPid.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    // offsets is #partitions rows — broadcast it; rows rank inside their
    // own partition only (no cross-partition shuffle of the data).
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    withPid.join(broadcast(offsets), "__pid")
      .withColumn(name, col("__offset") + row_number().over(w))
      .drop("__pid", "__offset")
  }
}
