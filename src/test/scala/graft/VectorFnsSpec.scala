package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("vec_dot and vec_norm_sq compute exact sequential sums") {
    graft.functions.VectorFns.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d,
        |       vec_norm_sq(array(3d, 4d)) AS n,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1d)) AS nl
        |""".stripMargin).head
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 25.0)
    assert(row.isNullAt(2))
  }

  test("vec_dot participates in whole-stage codegen") {
    graft.functions.VectorFns.register(spark)
    val df = spark.range(10)
      .selectExpr("vec_dot(array(cast(id as double)), array(2d)) AS d")
    // '*(n)' marks operators inside a WholeStageCodegen stage; a
    // CodegenFallback expression would force a plain Project.
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.agg(sum("d")).head.getDouble(0) == 90.0)
  }

  test("SignSig compares structurally, not by plane-array reference") {
    import graft.functions.SignSig
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val child = BoundReference(0, ArrayType(DoubleType), nullable = true)
    def planes() = Array(1.0, -2.0, 3.0, 0.5) // fresh array each call
    val a = SignSig(child, planes(), dim = 2)
    val b = SignSig(child, planes(), dim = 2)
    // two semantically identical signatures must canonicalize together
    // (subexpression elimination / exchange reuse depend on this)
    assert(a == b && a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    val other = SignSig(child, Array(9.0, -2.0, 3.0, 0.5), dim = 2)
    assert(a != other)
    assert(a != SignSig(Literal.create(Seq(1.0), ArrayType(DoubleType)),
      planes(), dim = 2))
  }
}
