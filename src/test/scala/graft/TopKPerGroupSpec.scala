package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom physical operator: correctness vs the window plan + plan shape
  * (partial stage before the shuffle, final after). */
class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("native top-k per group equals the window row_number plan") {
    val native = SparkEntry.queries("q_topk_per_group_native")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val window = SparkEntry.queries("q_topk_per_group")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(native == window)
  }

  test("plan has partial top-k before the exchange and final after") {
    val df = graft.plans.TopKPerGroup(
      Tables.t(spark, sf, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal")),
      Seq("c_nationkey"), Seq(("c_acctbal", true), ("c_custkey", false)), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerGroup"), plan)
    assert(plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Exchange hashpartitioning(c_nationkey"), plan)
    // partial must sit below the exchange: shuffle moves at most
    // k * groups * partitions rows, not the full table
    val lines = plan.linesIterator.toSeq
    val exchangeIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val partialIdx = lines.indexWhere(_.contains("PartialTopKPerGroup"))
    assert(partialIdx > exchangeIdx, plan)
  }

  test("global top-k (no group columns) plans AllTuples and matches orderBy+limit") {
    val base = Tables.t(spark, sf, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val native = graft.plans.TopKPerGroup(base, Seq.empty,
        Seq(("c_acctbal", true), ("c_custkey", false)), k = 5)
      .collect().map(_.getLong(0)).toSet
    val expected = base.orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(5).collect().map(_.getLong(0)).toSet
    assert(native == expected)
  }

  test("ties and k larger than group size behave") {
    val sp = spark; import sp.implicits._
    val df = Seq((1, 10.0, 1L), (1, 10.0, 2L), (1, 5.0, 3L), (2, 1.0, 4L))
      .toDF("g", "v", "id")
    val got = graft.plans.TopKPerGroup(df, Seq("g"),
      Seq(("v", true), ("id", false)), 2)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    // group 1: two v=10 rows win (ties broken by id asc); group 2: all
    assert(got == Set((1, 1L), (1, 2L), (2, 4L)))
  }
}
