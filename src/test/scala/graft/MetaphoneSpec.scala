package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MetaphoneKernel

/** Kernel-level parity for the metaphone port: the regress anchor, the
  * rule-branch vectors (same table as q_fuzzy_metaphone's oracle), edge
  * shapes the C's NUL-terminated scan implies, and interpreted-eval ==
  * codegen-eval through a real plan. */
class MetaphoneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("regress anchor and rule-branch vectors") {
    // (word, mp4, mp10) — from the independent Python port of
    // /root/reference/contrib/fuzzystrmatch/fuzzystrmatch.c:344-700
    val vectors = Seq(
      ("GUMBO", "KM", "KM"),                    // the reference's regress row
      ("Thompson", "0MPS", "0MPSN"),            // TH -> '0'
      ("school", "SKL", "SKL"),                 // SCH -> K, H after C silent
      ("Christ", "KRST", "KRST"),               // CHR -> K
      ("Schwartz", "XWRT", "XWRTS"),            // SCHW -> SH, skips 2
      ("knight", "NFT", "NFT"),                 // initial KN -> N; GH -> F
      ("through", "0R", "0R"),                  // H-lookback silences GH
      ("science", "SNS", "SNS"),                // SC[IEY]: C dropped
      ("special", "SPXL", "SPXL"),              // CIA -> SH
      ("ambition", "AMXN", "AMXN"),             // TIO -> SH
      ("judge", "JJ", "JJ"),                    // DGE -> J
      ("wright", "RFT", "RFT"),                 // initial WR -> R
      ("whale", "HL", "HL"),                    // initial WH -> H
      ("xylophone", "SLFN", "SLFN"),            // initial X -> S
      ("axiom", "AKSM", "AKSM"),                // mid X -> KS
      ("vision", "FXN", "FXN"),                 // SIO -> SH
      ("session", "SSN", "SSN"),                // duplicate S dropped
      ("pizza", "PS", "PS"),                    // duplicate Z dropped
      ("McCarthy", "MKKR", "MKKR0"),            // CC duplicate KEPT
      ("resigned", "RSNT", "RSNT"),             // -GNED: G dropped
      ("signature", "SKNT", "SKNTR"),           // mid GN: G -> K
      ("bomb", "BM", "BM"),                     // MB: B dropped
      ("aeon", "EN", "EN"),                     // initial AE -> E
      ("WAter", "WTR", "WTR"),                  // initial W+vowel eats vowel
      ("  42nd-street", "NTST", "NTSTRT"),      // leading non-alpha skipped
      ("O'Brien", "OBRN", "OBRN"))              // mid non-alpha skipped
    vectors.foreach { case (w, m4, m10) =>
      assert(MetaphoneKernel.compute(w, 4) === m4, s"mp4($w)")
      assert(MetaphoneKernel.compute(w, 10) === m10, s"mp10($w)")
    }
  }

  test("edge shapes: empty, non-alpha-only, truncation, X at the cap") {
    assert(MetaphoneKernel.compute("", 4) === "")
    assert(MetaphoneKernel.compute("  12-34!", 4) === "")
    // max truncates mid-word; X's second phoneme respects the cap
    assert(MetaphoneKernel.compute("Thompson", 2) === "0M")
    assert(MetaphoneKernel.compute("box", 2) === "BK") // no room for S
    assert(MetaphoneKernel.compute("box", 3) === "BKS")
    // lowercase == uppercase
    assert(MetaphoneKernel.compute("schwartz", 6) ===
           MetaphoneKernel.compute("SCHWARTZ", 6))
  }

  test("codegen path equals interpreted eval on fixture part names") {
    graft.functions.MetaphoneFns.register(spark)
    val names = Tables.t(spark, SparkTestSession.sf, "part")
      .select(col("p_name")).limit(500)
    val viaPlan = names.select(expr("metaphone(p_name, 6)").as("m"))
      .collect().map(_.getString(0))
    val viaKernel = names.collect()
      .map(r => MetaphoneKernel.compute(r.getString(0), 6))
    assert(viaPlan.toSeq === viaKernel.toSeq)
    assert(viaPlan.exists(_.nonEmpty))
  }
}
