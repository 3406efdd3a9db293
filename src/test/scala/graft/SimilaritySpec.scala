package graft

import org.scalatest.funsuite.AnyFunSuite

/** ANN quality: the approximate paths must actually find neighbors. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def topkSet(name: String, k: Int): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).take(k).toSet }

  test("IVF top-3 recalls a meaningful share of exact top-3") {
    val exact = topkSet("s_ann_bruteforce_topk", 3)
    val ivf = topkSet("s_ann_ivf_topk", 3)
    assert(ivf.nonEmpty)
    val recalls = exact.keys.toSeq.map { q =>
      val hit = ivf.getOrElse(q, Set.empty).intersect(exact(q)).size
      hit.toDouble / exact(q).size
    }
    val mean = recalls.sum / recalls.size
    // 2-of-8 cells probed on weakly-clustered random data: recall well
    // above the ~25% a random cell assignment would give
    assert(mean >= 0.3, s"mean IVF recall $mean too low")
  }

  test("LSH bucketed top-k agrees with brute force on shared candidates") {
    val exact = topkSet("s_ann_bruteforce_topk", 5)
    val lsh = SparkEntry.queries("s_ann_lsh_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // every LSH neighbor's cosine must be <= the exact best cosine;
    // sanity that scores are consistent across paths
    val exactBest = SparkEntry.queries("s_ann_bruteforce_topk")(spark, sf)
      .collect().filter(_.getInt(1) == 1)
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    lsh.foreach { case (q, _, cos) =>
      assert(cos <= exactBest(q) + 1e-9, s"query $q: lsh cos $cos > best")
    }
    assert(exact.nonEmpty && lsh.nonEmpty)
  }
}
