package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SparseFns

/** The svec encoding must be lossless and its kernels must equal the dense
  * formulas bit for bit: sparsify∘toDense is identity on thresholded
  * vectors, the two-pointer svec_dot equals vec_dot over the thresholded
  * dense vectors (interleaved exact zeros change no IEEE sum), and
  * elementwise plus matches dense addition including annihilation. */
class SparseFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf
  private val Eps = 0.15

  /** embeddings plus hand-built edge vectors: all-below-threshold (empty
    * svec), single spike, exact negations for annihilation. */
  private def vectors: DataFrame = {
    val sp = spark; import sp.implicits._
    val extra = Seq(
      (90001L, Array.fill(8)(0.01)),                       // empty svec
      (90002L, Array(0.0, 0.0, 5.0, 0.0, 0.0, 0.0, 0.0, 0.0)), // one spike
      (90003L, Array(1.0, -2.0, 0.0, 3.0, 0.0, -4.0, 0.0, 0.5)),
      (90004L, Array(-1.0, 2.0, 0.0, -3.0, 0.0, 4.0, 0.0, -0.5)) // -(90003)
    ).toDF("vec_id", "v")
    Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .unionByName(extra)
  }

  private def sv(df: DataFrame): DataFrame =
    df.withColumn("sv", SparseFns.sparsify("v", Eps))

  test("sparsify -> toDense roundtrips the thresholded vector exactly") {
    val bad = sv(vectors)
      .withColumn("tv", expr(s"transform(v, x -> IF(abs(x) > $Eps, x, 0d))"))
      .withColumn("rt", SparseFns.toDense("sv"))
      .filter(col("rt") =!= col("tv"))
      .count()
    assert(bad == 0, "roundtrip must be exact on every vector")
  }

  test("svec idx is strictly ascending with no zero values stored") {
    val bad = sv(vectors)
      .filter(
        // CASE guard: sequence(1, size-1) on a 0/1-element array would
        // count DOWN and index out of bounds
        expr("CASE WHEN size(sv.idx) >= 2 THEN exists(" +
          "sequence(1, size(sv.idx) - 1), i -> sv.idx[i] <= sv.idx[i - 1]) " +
          "ELSE false END") ||
        expr("exists(sv.vals, y -> y = 0d)") ||
        size(col("sv.idx")) =!= size(col("sv.vals")))
      .count()
    assert(bad == 0)
  }

  test("svec_dot equals the dense dot over thresholded vectors, bit for bit") {
    SparseFns.register(spark)
    graft.functions.VectorFns.register(spark)
    val e = sv(vectors)
      .withColumn("tv", expr(s"transform(v, x -> IF(abs(x) > $Eps, x, 0d))"))
    val a = e.select(col("vec_id").as("ida"), col("sv").as("sa"), col("tv").as("ta"))
    val b = e.select(col("vec_id").as("idb"), col("sv").as("sb"), col("tv").as("tb"))
    // a bounded cross sample: 20 x all pairs exercises empty, spike, and
    // negation rows against real embeddings
    val bad = a.filter(col("ida") % 29 === 0).join(b)
      .select(
        expr("svec_dot(sa.idx, sa.vals, sb.idx, sb.vals)").as("sparse"),
        expr("vec_dot(ta, tb)").as("dense"))
      .filter(col("sparse") =!= col("dense"))
      .count()
    assert(bad == 0, "sparse dot must be bit-identical to dense dot")
  }

  test("plus matches dense elementwise addition and annihilates negations") {
    val e = sv(vectors).filter(col("vec_id").isin(90002L, 90003L, 90004L))
    val a = e.select(col("vec_id").as("ida"), col("sv").as("sa"), col("v").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("sv").as("sb"), col("v").as("vb"))
    val pairs = a.join(b)
      .withColumn("sum_sv", SparseFns.plus("sa", "sb"))
      .withColumn("sum_dense", SparseFns.toDense("sum_sv"))
      .withColumn("expect", expr(
        s"zip_with(transform(va, x -> IF(abs(x) > $Eps, x, 0d)), " +
        s"transform(vb, x -> IF(abs(x) > $Eps, x, 0d)), (x, y) -> x + y)"))
    assert(pairs.filter(col("sum_dense") =!= col("expect")).count() == 0)
    // exact negations cancel to the EMPTY svec, not stored zeros
    val annihilated = pairs
      .filter(col("ida") === 90003L && col("idb") === 90004L)
      .select(size(col("sum_sv.idx"))).head().getInt(0)
    assert(annihilated == 0, "a + (-a) must store nothing")
  }

  test("norms and nnz match hand-computed values on the spike vector") {
    val row = sv(vectors).filter(col("vec_id") === 90003L)
      .select(SparseFns.nnz("sv").as("nnz"),
        SparseFns.l1norm("sv").as("l1"),
        SparseFns.l2norm("sv").as("l2"))
      .head()
    assert(row.getInt(0) == 5)                       // 1,-2,3,-4,0.5
    assert(row.getDouble(1) == 10.5)
    assert(math.abs(row.getDouble(2) - math.sqrt(1 + 4 + 9 + 16 + 0.25)) < 1e-12)
  }
}
