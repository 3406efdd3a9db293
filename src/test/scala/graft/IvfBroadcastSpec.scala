package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** The two IVF cell-assignment lanes — literal codebook kernel vs
  * broadcast centroid relation — must be bit-equal (same distances in
  * the same accumulation order, same lowest-cell tie rule), and the
  * broadcast lane's plan must stay O(1) in K (the whole point: at
  * K ~ 1e5 the flattened literal reaches 100s of MB of plan/task
  * state; the relation rides as a broadcast variable instead). */
class IvfBroadcastSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def embeddings: DataFrame =
    Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Deterministic pseudo-centroids — spread, not fitted (lane parity
    * must hold for ANY centroid set, and skipping the Lloyd keeps the
    * spec fast). */
  private def pseudoCentroids(k: Int): Array[Array[Double]] =
    Array.tabulate(k)(i => Array.tabulate(64)(j =>
      math.rint(math.sin(i * 131 + j * 7 + 1) * 1e6) / 1e6))

  private def assignments(e: DataFrame, cs: Array[Array[Double]],
                          thresh: String): Map[Long, Int] = {
    spark.conf.set(Similarity.BroadcastKConf, thresh)
    try Similarity.ivfAssign(e, cs).select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    finally spark.conf.unset(Similarity.BroadcastKConf)
  }

  test("literal and broadcast lanes agree bit-for-bit (K=8 and K=40)") {
    val e = embeddings
    for (k <- Seq(8, 40)) {
      val cs = pseudoCentroids(k)
      val lit = assignments(e, cs, thresh = "1000000") // force literal
      val bc = assignments(e, cs, thresh = "0")        // force broadcast
      assert(lit.nonEmpty && lit.size == bc.size)
      val diff = lit.collect {
        case (id, c) if bc(id) != c => (id, c, bc(id))
      }
      assert(diff.isEmpty, s"K=$k diverging assignments: ${diff.take(5)}")
      // every centroid index must be reachable in principle: sanity
      assert(lit.values.toSet.size > 1, "degenerate assignment")
    }
  }

  test("broadcast-lane plan size is O(1) in K; literal lane grows") {
    val e = embeddings.limit(10)
    def planLen(cs: Array[Array[Double]], thresh: String): Int = {
      spark.conf.set(Similarity.BroadcastKConf, thresh)
      try Similarity.ivfAssign(e, cs)
        .queryExecution.optimizedPlan.toString.length
      finally spark.conf.unset(Similarity.BroadcastKConf)
    }
    val bc8 = planLen(pseudoCentroids(8), "0")
    val bc128 = planLen(pseudoCentroids(128), "0")
    val lit8 = planLen(pseudoCentroids(8), "1000000")
    val lit128 = planLen(pseudoCentroids(128), "1000000")
    assert(bc128 <= bc8 * 2,
      s"broadcast plan grew with K: $bc8 -> $bc128")
    assert(lit128 > lit8 * 4,
      s"test premise: literal plan must embed the codebook ($lit8 -> $lit128)")
    assert(bc128 < lit128 / 4,
      s"broadcast plan ($bc128) should be far smaller than literal ($lit128)")
  }

  test("a malformed threshold conf falls back to the literal lane, not an error") {
    val e = embeddings.limit(5)
    spark.conf.set(Similarity.BroadcastKConf, "not-a-number")
    try assert(Similarity.ivfAssign(e, pseudoCentroids(8)).count() == 5)
    finally spark.conf.unset(Similarity.BroadcastKConf)
  }
}
