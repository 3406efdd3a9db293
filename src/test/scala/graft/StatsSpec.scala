package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-9 stats/sketch families beyond the
  * run-and-count coverage of QueriesSpec: each test asserts an algebraic
  * IDENTITY or contract of the statistic that would break under an
  * implementation error even if the oracle were (wrongly) mirrored the
  * same way — the identities are implementation-independent. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def one(name: String) =
    SparkEntry.queries(name)(spark, sf).collect().head

  test("Mann-Whitney: U1 + U2 = n1*n2 (doubled) and R1 bounds") {
    val r = one("q_mannwhitney_u")
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val (u1, u2) = (r.getAs[Long]("u1_2x"), r.getAs[Long]("u2_2x"))
    assert(u1 + u2 == 2 * n1 * n2, "U1 + U2 must equal n1*n2 exactly")
    assert(u1 >= 0 && u2 >= 0)
    val r1 = r.getAs[Long]("r1_2x")
    assert(r1 >= n1 * (n1 + 1) && r1 <= n1 * (n1 + 1) + 2 * n1 * n2,
      "rank sum outside its attainable range")
  }

  test("KS: D is a valid scaled sup-distance") {
    val r = one("q_ks_test")
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val d = r.getAs[Long]("d_scaled")
    assert(d >= 0 && d <= n1 * n2)
    val dU = r.getAs[Long]("d_u")
    assert(dU >= 0 && dU <= 1000000L, "D in [0,1] micros")
  }

  test("ANOVA: one shared F, non-negative sums of squares") {
    val rows = SparkEntry.queries("q_anova_f")(spark, sf).collect()
    assert(rows.length >= 2)
    assert(rows.map(_.getAs[Long]("f_u")).distinct.length == 1,
      "F is a property of the whole table, constant across group rows")
    assert(rows.forall(_.getAs[Long]("ssw_g_sq") >= 0))
    assert(rows.forall(_.getAs[Long]("ssb_sq") >= 0))
  }

  test("Welch: t^2 non-negative, variance sum positive") {
    val r = one("q_welch_t2")
    assert(r.getAs[Long]("t2_u") >= 0)
    assert(r.getAs[Long]("varsum_u") > 0)
  }

  test("logreg: prediction counts are consistent") {
    val r = one("q_logreg_gd")
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("n_correct") <= n)
    assert(r.getAs[Long]("n_pred_pos") <= n)
    // the fit must do no worse than coin-flipping on this 80/20 split
    assert(r.getAs[Long]("n_correct") * 2 >= n)
  }

  test("PCA: eigenvalues preserve the covariance trace") {
    val r = one("q_pca_2d")
    val tr = (r.getAs[Long]("cxx_u") + r.getAs[Long]("cyy_u")) / 1e12
    val (l1, l2) = (r.getAs[Double]("lam1"), r.getAs[Double]("lam2"))
    assert(l1 >= l2, "lam1 is the major eigenvalue")
    assert(math.abs(l1 + l2 - tr) < 1e-3,
      s"trace not preserved: $l1 + $l2 vs $tr")
  }

  test("MAD: gate counts bounded, MAD non-negative") {
    val rows = SparkEntry.queries("q_mad_outliers")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("mad4") >= 0)
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n"),
        "a majority can never be >3 MAD from the median")
    }
  }

  test("bloom: hits decompose into members plus false positives") {
    val r = one("d_bloom_membership")
    assert(r.getAs[Long]("n_hit") ==
      r.getAs[Long]("n_member") + r.getAs[Long]("n_false_pos"),
      "no false negatives: every member hits, extras are exactly the FPs")
    assert(r.getAs[Long]("n_bits_set") <= 2048)
  }

  test("count-min: estimates never undercount") {
    val rows = SparkEntry.queries("d_countmin_heavy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("over_n") >= 0,
      s"CM underestimated ${r.getAs[String]("w")}"))
  }

  test("Holt: forecast is level plus trend") {
    val rows = SparkEntry.queries("q_holt_linear")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("forecast_u") ==
        r.getAs[Long]("level_u") + r.getAs[Long]("trend_u"))
    }
  }
}
