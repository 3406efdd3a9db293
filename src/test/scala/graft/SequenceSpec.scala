package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence / row-id surface (reference `commands/sequence.c`):
  * uniqueness, gaplessness, and uuid shape. */
class SequenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("monotonically_increasing_id is unique and partition-monotone") {
    val df = graft.sources.Sequences.withUniqueId(
      Tables.t(spark, sf, "customer").repartition(8), "rid")
    val n = df.count()
    assert(df.select(col("rid")).distinct().count() == n)
    // monotone within each partition (the CACHE-per-segment contract)
    val viol = df.withColumn("pid", spark_partition_id())
      .withColumn("prev", lag(col("rid"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("pid")).orderBy(col("rid"))))
      .filter(col("prev").isNotNull && col("prev") >= col("rid")).count()
    assert(viol == 0)
  }

  test("withGaplessId yields exactly 1..N regardless of partitioning") {
    for (parts <- Seq(1, 5, 32)) {
      val df = graft.sources.Sequences.withGaplessId(
        Tables.t(spark, sf, "supplier").repartition(parts),
        "seq", Seq(col("s_suppkey")))
      val n = df.count()
      val stats = df.agg(min(col("seq")), max(col("seq")),
        countDistinct(col("seq"))).head
      assert(stats.getLong(0) == 1L, s"min at $parts parts")
      assert(stats.getLong(1) == n, s"max at $parts parts")
      assert(stats.getLong(2) == n, s"distinct at $parts parts")
    }
  }

  test("uuid() values are well-formed v4 and distinct") {
    val df = Tables.t(spark, sf, "nation").withColumn("u", expr("uuid()"))
    val rows = df.select(col("u")).collect().map(_.getString(0))
    assert(rows.distinct.length == rows.length)
    val v4 = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    rows.foreach(u => assert(v4.matches(u), u))
  }
}
