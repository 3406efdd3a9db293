package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native AsofJoinExec operator (plans/AsofJoin.scala): plan shape,
  * equivalence with the union-trick emulation, and edge semantics the
  * oracle data may not exercise. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("plans as AsofJoin with one exchange + sort per side") {
    val df = SparkEntry.queries("q_asof_native")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2,
      "both sides must hash-exchange on the key\n" + p)
    assert(!p.contains("Window"),
      "the native operator must not fall back to the window emulation\n" + p)
  }

  test("native operator equals the union-trick emulation row for row") {
    val native = SparkEntry.queries("q_asof_native")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val emulated = SparkEntry.queries("q_asof_tolerance")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(native == emulated)
  }

  test("unmatched left rows null-extend; equal timestamps take the last right row") {
    val sp = spark
    import sp.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 60L, 6.0), (1L, 60L, 7.0), (1L, 99L, 9.0),
        (3L, 1L, 0.0))
      .toDF("rk", "rt", "v")
    val out = graft.plans.AsofJoin(left, right, Seq(("k", "rk")), "t", "rt")
      .select(col("tag"), col("v"))
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(out("a").contains(9.0), "latest at-or-before t=100 is rt=99")
    assert(out("b").isEmpty, "no right row at-or-before t=50 for k=1")
    assert(out("c").isEmpty, "key 2 has no right rows at all")
    val tie = graft.plans.AsofJoin(
        Seq((1L, 60L, "x")).toDF("k", "t", "tag"), right,
        Seq(("k", "rk")), "t", "rt")
      .select(col("v")).collect().map(_.getDouble(0))
    assert(tie.toSeq == Seq(7.0),
      "equal right timestamps resolve to the LAST row in sort order")
  }
}
