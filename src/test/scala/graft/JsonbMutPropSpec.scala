package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.JsonbMut._

/** Property harness for the jsonb array combinators: every (array, index)
  * pair must agree with a plain-Scala reference model of the reference's
  * setPathArray semantics — negative indices from the end, create-if-
  * missing prepend/append out of range, insert clamping, delete no-op
  * out of range. One Spark job evaluates a whole generated batch. */
class JsonbMutPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // plain-Scala models of jsonb.sql's documented behavior
  private def modelSet(a: Vector[Long], idx: Int, v: Long,
                       create: Boolean): Vector[Long] = {
    val eff = if (idx < 0) a.length + idx else idx
    if (eff >= 0 && eff < a.length) a.updated(eff, v)
    else if (!create) a
    else if (idx < 0) v +: a
    else a :+ v
  }
  private def modelInsert(a: Vector[Long], idx: Int, v: Long,
                          after: Boolean): Vector[Long] = {
    val base = if (idx < 0) a.length + idx else idx
    val eff = math.max(0, math.min(a.length, if (after) base + 1 else base))
    (a.take(eff) :+ v) ++ a.drop(eff)
  }
  private def modelDelete(a: Vector[Long], idx: Int): Vector[Long] = {
    val eff = if (idx < 0) a.length + idx else idx
    if (eff >= 0 && eff < a.length) a.patch(eff, Nil, 1) else a
  }

  private val cases: Gen[(Vector[Long], Int)] = for {
    n <- Gen.choose(0, 6)
    a <- Gen.listOfN(n, Gen.choose(-50L, 50L)).map(_.toVector)
    i <- Gen.choose(-9, 9)
  } yield (a, i)

  test("arraySet/arrayInsert/arrayDelete agree with the setPathArray model") {
    val batch = Gen.listOfN(300, cases)
      .apply(Gen.Parameters.default, Seed(42L)).get.zipWithIndex
    val sp = spark; import sp.implicits._
    val df = batch.map { case ((a, i), id) => (id.toLong, a.toArray, i) }
      .toDF("id", "arr", "idx")
    // idx is data, but the combinators take a static Int — group rows by
    // their idx value and apply the matching static combinator per group
    val byIdx = batch.groupBy(_._1._2)
    byIdx.foreach { case (idx, rows) =>
      val ids = rows.map(_._2.toLong)
      val sub = df.filter(col("id").isin(ids: _*))
      val out = sub.select(col("id"),
          arraySet(col("arr"), idx, lit(999L)).as("set_c"),
          arraySet(col("arr"), idx, lit(999L), createMissing = false).as("set_n"),
          arrayInsert(col("arr"), idx, lit(999L)).as("ins_b"),
          arrayInsert(col("arr"), idx, lit(999L), after = true).as("ins_a"),
          arrayDelete(col("arr"), idx).as("del"))
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3),
           r.getSeq[Long](4), r.getSeq[Long](5))).toMap
      rows.foreach { case ((a, i), id) =>
        val (sc, sn, ib, ia, dl) = out(id.toLong)
        assert(sc == modelSet(a, i, 999L, create = true), s"set create a=$a i=$i")
        assert(sn == modelSet(a, i, 999L, create = false), s"set nocreate a=$a i=$i")
        assert(ib == modelInsert(a, i, 999L, after = false), s"ins before a=$a i=$i")
        assert(ia == modelInsert(a, i, 999L, after = true), s"ins after a=$a i=$i")
        assert(dl == modelDelete(a, i), s"delete a=$a i=$i")
      }
    }
  }
}
