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

  test("q_assert_op raises through the real query path on a violated FK") {
    val sp = spark; import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("assertop").toString
    // order 101 references customer 999, which does not exist
    Seq((100L, 1L), (101L, 999L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq(Tuple1(1L)).toDF("c_custkey")
      .write.parquet(s"$dir/customer.parquet")
    val e = intercept[Throwable] {
      SparkEntry.queries("q_assert_op")(spark, dir).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(chain.contains("assert violated: order 101"), chain)
  }

  test("q_assert_op passes valid data through (count survives pruning)") {
    val got = SparkEntry.queries("q_assert_op")(spark, sf).head.getLong(0)
    val expected = Tables.t(spark, sf, "orders").count()
    assert(got == expected)
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
