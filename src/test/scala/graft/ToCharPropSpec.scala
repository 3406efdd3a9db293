package graft

import org.scalacheck.{Prop, Properties, Gen}
import org.scalacheck.Prop.propBoolean
import graft.functions.ToCharFormat

/** Property-based checks of the numeric to_char engine — invariants that
  * must hold for EVERY value, not just the doc examples: fixed output
  * width, parse-back round trip, FM minimality, sign placement. */
object ToCharPropSpec extends Properties("NumFormat") {

  private val money: Gen[Double] = for {
    cents <- Gen.chooseNum(-99999999L, 99999999L)
  } yield cents / 100.0

  property("fixed width + parse-back for 999,999.00") = Prop.forAll(money) { x =>
    val out = ToCharFormat.parseNum("999,999.00").format(x)
    val parsed = out.replace(",", "").trim.toDouble
    (out.length == 11) :| s"width: '$out'" &&
      (math.abs(parsed - x) < 1e-9) :| s"roundtrip: '$out' vs $x"
  }

  property("FM output has no padding and parses back") = Prop.forAll(money) { x =>
    val out = ToCharFormat.parseNum("FM99999999.00").format(x)
    (out == out.trim) :| s"no pad: '$out'" &&
      (math.abs(out.toDouble - x) < 1e-9) :| s"roundtrip: '$out'"
  }

  property("MI places the sign trailing, never leading") =
    Prop.forAll(money) { x =>
      val out = ToCharFormat.parseNum("99999999.00MI").format(x)
      (!out.trim.startsWith("-")) :| s"no leading -: '$out'" &&
        ((x >= 0) == !out.endsWith("-")) :| s"trailing sign: '$out' for $x"
    }

  property("PR wraps negatives in angle brackets") = Prop.forAll(money) { x =>
    val out = ToCharFormat.parseNum("99999999.00PR").format(x)
    if (x < 0) (out.startsWith("<") && out.endsWith(">")) :| s"'$out'"
    else (!out.contains("<") && !out.contains(">")) :| s"'$out'"
  }

  property("forced zeros: 0-slots always render digits") =
    Prop.forAll(Gen.chooseNum(0L, 999999L)) { n =>
      val out = ToCharFormat.parseNum("0000000").format(n)
      (out.length == 8 && out.drop(1).forall(_.isDigit)) :| s"'$out'" &&
        (out.drop(1).toLong == n) :| s"value: '$out'"
    }

  property("grouped rendering groups every 3 digits") =
    Prop.forAll(Gen.chooseNum(1L, 99999999L)) { n =>
      val out = ToCharFormat.parseNum("FM99,999,999").format(n)
      (out.replace(",", "").toLong == n) :| s"digits: '$out'" &&
        out.split(',').drop(1).forall(_.length == 3) :| s"groups: '$out'"
    }
}
