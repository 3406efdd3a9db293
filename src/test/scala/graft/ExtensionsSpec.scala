package graft

import org.scalatest.funsuite.AnyFunSuite

/** The custom optimizer rule works end-to-end. In a fresh deployment the
  * rule arrives via `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (see GraftExtensions); here it is attached to the shared test session
  * through `experimental.extraOptimizations`, which feeds the same
  * optimizer batch. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    graft.functions.VectorFns.register(s)
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations :+ graft.plans.RewriteSelfDotToNorm
    s
  }

  test("vec_dot(v, v) is rewritten to vec_norm_sq by the optimizer rule") {
    val df = spark.sql(
      "SELECT vec_dot(array(3d, id + 1d), array(3d, id + 1d)) AS n " +
      "FROM range(1)")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_norm_sq"), optimized)
    assert(!optimized.contains("vec_dot("), optimized)
    assert(df.head.getDouble(0) == 10.0) // 9 + 1
  }

  test("distinct arguments are NOT rewritten") {
    val df = spark.sql(
      "SELECT vec_dot(array(id + 0d, 2d), array(3d, 4d)) AS d FROM range(1)")
    assert(df.head.getDouble(0) == 8.0)
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
  }
}
