package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §7.3 "hard/risky": the reference's `numeric` is unbounded
  * (`/root/reference/src/backend/utils/adt/numeric.c`); Spark caps at
  * DecimalType(38). These tests pin the documented behavior at the cap:
  * exactness inside 38 digits, explicit overflow error under ANSI mode
  * (never silent corruption), and the micros-sum convention's own bound. */
class DecimalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("decimal arithmetic is exact through precision 38, scale yields at the cap") {
    // (38,18)+(38,18) needs precision 39; Spark keeps 38 by reducing the
    // result scale to 17 — value stays exact, trailing precision is shed.
    // This is the documented divergence from the reference's unbounded
    // numeric: magnitude wins over scale at the cap.
    val r = spark.sql(
      """SELECT CAST('99999999999999999999.999999999999999999' AS DECIMAL(38,18))
        |     + CAST('0.000000000000000001' AS DECIMAL(38,18)) AS v""".stripMargin)
      .head.getDecimal(0)
    assert(r.toPlainString == "100000000000000000000.00000000000000000")
  }

  test("overflow beyond 38 digits raises under ANSI, never truncates") {
    val e = intercept[Exception] {
      spark.sql(
        """SELECT CAST('9e37' AS DECIMAL(38,0)) * CAST('9e37' AS DECIMAL(38,0)) AS v"""
      ).collect()
    }
    assert(e.getMessage.toLowerCase.contains("overflow") ||
           e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE"), e.getMessage)
  }

  test("micros-long sum convention stays exact at the gate scale") {
    // worst case at sf0.01: ~60k rows x 1e5 price = 6e9 absolute sum;
    // scaled by 1e6 = 6e15 < 2^53 (9.007e15): long->double stays exact
    val sp = spark; import sp.implicits._
    val n = 60000
    val df = (1 to n).map(_ => 104997.88).toDF("x")
    val got = Tables.dsum(org.apache.spark.sql.functions.col("x"))
    val v = df.agg(got).head.getDouble(0)
    assert(v == 104997.88 * n || math.abs(v - 104997.88 * n) < 1e-6)
    assert(BigDecimal(v) == BigDecimal("104997.88") * n)
  }
}
