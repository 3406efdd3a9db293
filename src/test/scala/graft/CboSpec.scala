package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization: ANALYZE-gathered statistics flow into the
  * optimized plan (the reference's ANALYZE + ORCA cost model,
  * `/root/reference/src/backend/commands/analyze.c`). */
class CboSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("ANALYZE TABLE statistics are visible to the optimizer") {
    Tables.t(spark, sf, "nation").write.mode("overwrite")
      .saveAsTable("nation_stats")
    spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR ALL COLUMNS")
    // row/column stats surface in plan Statistics only with CBO enabled
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("nation_stats").queryExecution
        .optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), stats)
      assert(stats.attributeStats.nonEmpty, "expected column-level stats")
      val key = stats.attributeStats.find(_._1.name == "n_nationkey").map(_._2)
      assert(key.flatMap(_.distinctCount).contains(BigInt(25)), key)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("CBO prefers broadcasting the statistically-smaller side") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      Tables.t(spark, sf, "customer").write.mode("overwrite")
        .saveAsTable("customer_stats")
      spark.sql("ANALYZE TABLE customer_stats COMPUTE STATISTICS")
      val joined = spark.table("customer_stats")
        .join(spark.table("nation_stats"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
