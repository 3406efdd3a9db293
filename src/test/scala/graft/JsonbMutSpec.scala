package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JsonbMut._

/** Edge semantics of the jsonb mutation combinators, matched against the
  * reference's jsonb.sql behaviors (setPath* in jsonfuncs.c): negative
  * indices from the end, create-if-missing prepend/append on
  * out-of-range, no-create returning the input unchanged, delete
  * ignoring out-of-range, insert clamping to the bounds. */
class JsonbMutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def arr(op: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Long] = {
    val df = spark.range(1).select(array(lit(10L), lit(20L), lit(30L)).as("b"))
    df.select(op(col("b")).as("r")).collect()(0).getSeq[Long](0)
  }

  test("arraySet replaces in range, negative counts from the end") {
    assert(arr(b => arraySet(b, 1, lit(99L))) == Seq(10L, 99L, 30L))
    assert(arr(b => arraySet(b, -1, lit(99L))) == Seq(10L, 20L, 99L))
    assert(arr(b => arraySet(b, -3, lit(99L))) == Seq(99L, 20L, 30L))
  }

  test("arraySet out of range: create appends/prepends, no-create is a no-op") {
    assert(arr(b => arraySet(b, 33, lit(7L))) == Seq(10L, 20L, 30L, 7L))
    assert(arr(b => arraySet(b, -33, lit(7L))) == Seq(7L, 10L, 20L, 30L))
    assert(arr(b => arraySet(b, 33, lit(7L), createMissing = false)) ==
      Seq(10L, 20L, 30L))
    assert(arr(b => arraySet(b, -33, lit(7L), createMissing = false)) ==
      Seq(10L, 20L, 30L))
  }

  test("arrayInsert before/after, negative index, bound clamping") {
    assert(arr(b => arrayInsert(b, 1, lit(42L))) == Seq(10L, 42L, 20L, 30L))
    assert(arr(b => arrayInsert(b, 1, lit(42L), after = true)) ==
      Seq(10L, 20L, 42L, 30L))
    assert(arr(b => arrayInsert(b, -1, lit(42L))) == Seq(10L, 20L, 42L, 30L))
    assert(arr(b => arrayInsert(b, 0, lit(42L))) == Seq(42L, 10L, 20L, 30L))
    assert(arr(b => arrayInsert(b, 99, lit(42L))) == Seq(10L, 20L, 30L, 42L))
    assert(arr(b => arrayInsert(b, -99, lit(42L))) == Seq(42L, 10L, 20L, 30L))
  }

  test("arrayDelete in range and out-of-range no-op") {
    assert(arr(b => arrayDelete(b, 0)) == Seq(20L, 30L))
    assert(arr(b => arrayDelete(b, -1)) == Seq(10L, 20L))
    assert(arr(b => arrayDelete(b, 7)) == Seq(10L, 20L, 30L))
    assert(arr(b => arrayDelete(b, -7)) == Seq(10L, 20L, 30L))
  }

  test("objectSet replaces in place, creates missing at the end; objectDelete removes nested") {
    val df = spark.range(1).select(struct(lit(1L).as("a"),
      struct(lit(2L).as("k"), lit(3L).as("mm")).as("c")).as("doc"))
    val out = df.select(
      to_json(objectSet(col("doc"), "a", lit(9L))).as("set_a"),
      to_json(objectSet(col("doc"), "c.e", lit(5L))).as("new_e"),
      to_json(objectDelete(col("doc"), "c.mm")).as("del_mm")).collect()(0)
    assert(out.getString(0) == """{"a":9,"c":{"k":2,"mm":3}}""")
    assert(out.getString(1) == """{"a":1,"c":{"k":2,"mm":3,"e":5}}""")
    assert(out.getString(2) == """{"a":1,"c":{"k":2}}""")
  }
}
