package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.functions.SparseFns

/** Generative invariants for the svec family: for random vectors (dense,
  * sparse, all-zero, negative-zero, duplicate-heavy) and random epsilons,
  * the two-pointer svec_dot must equal the dense dot over the thresholded
  * vectors BIT-exactly, and plus must equal dense addition after a
  * roundtrip. Deterministic seed: failures reproduce. */
class SparsePropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 24
  private val genVec: Gen[Array[Double]] =
    Gen.listOfN(dim, Gen.frequency(
      4 -> Gen.chooseNum(-2.0, 2.0),
      2 -> Gen.const(0.0),
      1 -> Gen.const(-0.0),
      1 -> Gen.oneOf(0.15, -0.15, 0.1500000001, 1e-300)))
      .map(_.toArray)

  test("svec_dot equals the thresholded dense dot on random vectors, bit for bit") {
    val sp = spark; import sp.implicits._
    SparseFns.register(spark)
    graft.functions.VectorFns.register(spark)
    val vecs = Gen.listOfN(60, genVec)
      .apply(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted"))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .withColumn("sv", SparseFns.sparsify("v", 0.15))
      .withColumn("tv", expr("transform(v, x -> IF(abs(x) > 0.15, x, 0d))"))
    val a = df.select(col("id").as("ia"), col("sv").as("sa"), col("tv").as("ta"))
    val b = df.select(col("id").as("ib"), col("sv").as("sb"), col("tv").as("tb"))
    val bad = a.join(b) // all 3600 pairs
      .select(
        expr("svec_dot(sa.idx, sa.vals, sb.idx, sb.vals)").as("sparse"),
        expr("vec_dot(ta, tb)").as("dense"))
      // bit compare via IEEE equality plus a NaN guard (never expected)
      .filter(col("sparse") =!= col("dense") ||
        isnan(col("sparse")) || isnan(col("dense")))
      .count()
    assert(bad == 0, "sparse dot must be bit-identical on every random pair")
  }

  test("plus -> toDense equals dense addition on random vectors") {
    val sp = spark; import sp.implicits._
    val vecs = Gen.listOfN(40, genVec)
      .apply(Gen.Parameters.default, Seed(11L))
      .getOrElse(fail("generator exhausted"))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .withColumn("sv", SparseFns.sparsify("v", 0.15))
      .withColumn("tv", expr("transform(v, x -> IF(abs(x) > 0.15, x, 0d))"))
    val a = df.select(col("id").as("ia"), col("sv").as("sa"), col("tv").as("ta"))
    val b = df.select(col("id").as("ib"), col("sv").as("sb"), col("tv").as("tb"))
    val bad = a.join(b)
      .withColumn("sum_sv", SparseFns.plus("sa", "sb"))
      .withColumn("got", SparseFns.toDense("sum_sv"))
      .withColumn("want", expr("zip_with(ta, tb, (x, y) -> x + y)"))
      // the canonical encoding drops exact zeros, so compare through a
      // zero-normalizing lens (x + -x is +0.0 in IEEE; stored-nothing
      // reads back as +0.0 too — but -0.0 sums must not diverge)
      .filter(expr("exists(zip_with(got, want, (g, w) -> " +
        "NOT (g = w OR (g = 0d AND w = 0d))), p -> p)"))
      .count()
    assert(bad == 0, "sparse plus must match dense addition on every pair")
  }
}
