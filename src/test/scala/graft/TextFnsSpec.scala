package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** rolling_fp codegen kernel == the HOF reference chain, corpus-wide. */
class TextFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val hofExpr =
    """aggregate(split(text, ' '), 0L,
      |  (acc, word) -> (acc * 131 +
      |    aggregate(split(word, ''), 0L,
      |      (a, c) -> (a * 31 + ascii(c)) % 1000000007)
      |  ) % 1000000007)""".stripMargin

  test("rolling_fp equals the HOF chain on every corpus document") {
    graft.functions.TextFns.register(spark)
    val d = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        expr(hofExpr).as("hof"),
        call_function("rolling_fp", col("text")).as("native"))
    assert(d.filter(col("hof") =!= col("native")).count() == 0)
    assert(d.count() > 0)
  }

  test("rolling_fp handles boundary shapes exactly like split-based HOF") {
    graft.functions.TextFns.register(spark)
    val sp = spark; import sp.implicits._
    val cases = Seq("", " ", "a", "a ", " a", "a  b", "hello world",
      "x y z", "  ", "tab\tinside word")
    val d = cases.toDF("text")
      .select(col("text"), expr(hofExpr).as("hof"),
        call_function("rolling_fp", col("text")).as("native"))
    val bad = d.filter(col("hof") =!= col("native")).collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("rolling_fp participates in whole-stage codegen") {
    graft.functions.TextFns.register(spark)
    val p = Tables.t(spark, sf, "documents")
      .select(call_function("rolling_fp", col("text")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen span in toString form;
    // a CodegenFallback expression would print an unstarred Project
    assert(p.contains("*(1) Project [rolling_fp"), p)
  }
}
