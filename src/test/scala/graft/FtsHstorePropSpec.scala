package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed

import graft.functions.{FtsDefaultParser, HstoreKernel}

/** Property-based laws for the round-12 kernels — invariants that must
  * hold for EVERY input, not just the pinned regress vectors. */
object FtsHstorePropSpec extends Properties("FtsHstoreProps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200).withInitialSeed(Seed(121212L))

  // ---- ts_parse: lossless tokenization -----------------------------
  // Every character of the input lands in exactly one PRIMARY token;
  // compound re-emissions (host/url_path after a url, hword parts and
  // their '-' separator blanks after a hyphenated word) are
  // the only repeated spans.
  private def primaryConcat(toks: Vector[(Int, String)]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < toks.length) {
      val (id, tok) = toks(i)
      sb.append(tok)
      i += 1
      id match {
        case 5 => // url -> skip its host + url_path re-emissions
          while (i < toks.length &&
                 (toks(i)._1 == 6 || toks(i)._1 == 18)) i += 1
        case 15 | 16 | 17 => // hword -> skip part (dash part)* exactly;
          // a trailing real '-' blank after the parts must NOT be eaten
          if (i < toks.length && Set(9, 10, 11)(toks(i)._1)) {
            i += 1
            while (i + 1 < toks.length &&
                   toks(i)._1 == 12 && toks(i)._2 == "-" &&
                   Set(9, 10, 11)(toks(i + 1)._1)) i += 2
          }
        case _ =>
      }
    }
    sb.toString
  }

  private val fragment: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("word", "qwe", "Data", "ewr1", "café", "a"),
    3 -> Gen.oneOf(" ", "  ", "\n", "\t", ", ", ". ", " - ", "' "),
    2 -> Gen.oneOf("345", "-7", "4.2", "1.2.3", "+4.0e-10", "0.5,"),
    2 -> Gen.oneOf("www.com", "a.werc.ewr/?x=1", "http://h.org/p",
      "u@ex.org", "1aew.werc.ewr:8100/?a=b", "qwe@efd.r"),
    2 -> Gen.oneOf("gist.h", "/usr/local/f", "rewt/ewr", "./x", "x-y",
      "ab-c1d", "readline-4.2"),
    1 -> Gen.oneOf("<b>", "</span>", "<a href=\"q<w>\">", "&nm1;",
      "&#245;", "<we ", "<> ", "=&%"))

  private val doc: Gen[String] =
    Gen.listOf(fragment).map(_.mkString).map(_.take(400))

  property("tokenization is lossless: primary tokens concat to the input") =
    Prop.forAll(doc) { s =>
      val toks = FtsDefaultParser.parse(s)
      val back = primaryConcat(toks)
      (back == s) :| s"input=${s.take(120)}\nback =${back.take(120)}\n" +
        s"tokens=${toks.take(30)}"
    }

  property("every token is non-empty and tokids are in range") =
    Prop.forAll(doc) { s =>
      FtsDefaultParser.parse(s).forall { case (id, tok) =>
        id >= 1 && id <= 23 && tok.nonEmpty
      }
    }

  // ---- hstore: roundtrip laws --------------------------------------
  private val hKey: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty),
    1 -> Gen.oneOf("a key", "k\"q", "k\\v", "=,", "NULL", " sp "))
  private val hVal: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(8)),
    1 -> Gen.oneOf("has space", "qu\"ote", "back\\slash", "NULL",
      "null", "=>", ","),
    1 -> Gen.const(null))

  private val hMap: Gen[Seq[(String, String)]] =
    Gen.listOf(Gen.zip(hKey, hVal)).map(_.take(8))

  property("parse(render(m)) == canonicalize(m) for any map") =
    Prop.forAll(hMap) { m =>
      val rendered = HstoreKernel.render(m)
      val back = HstoreKernel.parse(rendered)
      (back != null && back == HstoreKernel.canonicalize(m)) :|
        s"rendered=$rendered\nback=$back"
    }

  property("render is idempotent through a second roundtrip") =
    Prop.forAll(hMap) { m =>
      val r1 = HstoreKernel.render(m)
      val r2 = HstoreKernel.render(HstoreKernel.parse(r1))
      r1 == r2
    }

  property("toJson of any map is valid JSON in both modes") =
    Prop.forAll(hMap) { m =>
      // cheap structural validation: jackson-parseable via Spark's own
      // JSON reader would be heavyweight; use the JDK-side check that
      // braces/quotes balance by reparsing with a tolerant scanner
      Seq(true, false).forall { loose =>
        val j = HstoreKernel.toJson(HstoreKernel.canonicalize(m), loose)
        // strip escape pairs first so embedded \" doesn't skew parity
        val un = j.replace("\\\\", "").replace("\\\"", "")
        j.startsWith("{") && j.endsWith("}") && un.count(_ == '"') % 2 == 0
      }
    }
}
