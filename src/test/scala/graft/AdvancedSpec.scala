package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("HLL sketch estimates land within 5% of exact distinct counts") {
    val approx = SparkEntry.queries("q_hll_sketch_merge")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1).toDouble)).toMap
    val exact = Tables.t(spark, sf, "customer")
      .join(Tables.t(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey").agg(countDistinct("c_custkey").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    exact.foreach { case (region, n) =>
      val est = approx(region)
      assert(math.abs(est - n) <= math.max(1.0, 0.05 * n),
        s"region $region: estimate $est vs exact $n")
    }
  }

  test("AssertOp raises on violated invariants") {
    val sp = spark; import sp.implicits._
    val bad = Seq((1L, false), (2L, true)).toDF("id", "missing")
      .as[(Long, Boolean)]
      .map { case (id, missing) =>
        if (missing) throw new IllegalStateException(s"assert violated: $id")
        id
      }
    val e = intercept[org.apache.spark.SparkException] { bad.collect() }
    assert(e.getMessage.contains("assert violated") ||
           Option(e.getCause).exists(_.getMessage.contains("assert violated")))
  }

  test("exact median Aggregator interpolates even-sized groups") {
    val sp = spark; import sp.implicits._
    val med = udaf(graft.functions.Aggregators.ExactMedian)
    val got = Seq(1.0, 2.0, 10.0, 100.0).toDF("x")
      .agg(med(col("x"))).head.getDouble(0)
    assert(got == 6.0) // (2 + 10) / 2
  }

  test("multimodal decode stub matches payload byte math") {
    val row = SparkEntry.queries("m_decode_features")(spark, sf)
      .filter(col("doc_id") === 0).head
    val text = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === 0).head.getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    assert(row.getAs[Int]("n_bytes") == bytes.length)
    assert(row.getAs[Long]("byte_sum") == bytes.map(_ & 0xff).map(_.toLong).sum)
    assert(row.getAs[Int]("byte_max") == bytes.map(_ & 0xff).max)
  }
}
