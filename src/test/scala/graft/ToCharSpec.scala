package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ToCharFormat

/** Template-engine semantics, pinned to the examples in the PostgreSQL
  * documentation (Table 9.33) — the reference implements these in
  * `src/backend/utils/adt/formatting.c`. */
class ToCharSpec extends AnyFunSuite {
  private def num(x: Double, fmt: String): String =
    ToCharFormat.parseNum(fmt).format(x)
  private def dt(iso: String, fmt: String): String = {
    val micros = java.time.LocalDateTime.parse(iso)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    ToCharFormat.parseDt(fmt).format(micros)
  }

  test("numeric templates match the PostgreSQL doc examples") {
    assert(num(485, "999") == " 485")
    assert(num(-485, "999") == "-485")
    assert(num(1485, "9,999") == " 1,485")
    assert(num(148.5, "999.999") == " 148.500")
    assert(num(148.5, "FM999.999") == "148.5")
    assert(num(148.5, "FM999.990") == "148.500")
    assert(num(12, "9990999.9") == "    0012.0")
    assert(num(485, "0999") == " 0485")
    assert(num(-485, "999MI") == "485-")
    assert(num(485, "999MI") == "485 ")
    assert(num(-485, "999PR") == "<485>")
    assert(num(485, "999PR") == " 485 ")
  }

  test("multi-zero patterns force every digit from the leftmost 0") {
    assert(num(196824.94, "0000000.00") == " 0196824.94")
    assert(num(5, "00000") == " 00005")
    assert(num(0, "FM9,999,999") == "0")
    assert(num(0, "99") == "  0")
    assert(num(0.4, "99.99") == "   .40")
  }

  test("group separators appear only between emitted digits") {
    assert(num(485, "999,999") == "     485")
    assert(num(123456, "999,999.00") == " 123,456.00")
    assert(num(485, "FM999,999") == "485")
  }

  test("overflow renders # in every digit position") {
    assert(num(1234567, "999,999").contains("#"))
    assert(!num(1234567, "999,999").exists(_.isDigit))
  }

  test("datetime templates") {
    val ts = "1996-03-08T14:05:09"
    assert(dt(ts, "YYYY-MM-DD") == "1996-03-08")
    assert(dt(ts, "HH24:MI:SS") == "14:05:09")
    assert(dt(ts, "Mon DD, YYYY") == "Mar 08, 1996")
    assert(dt(ts, "Day") == "Friday   ")   // blank-padded to 9
    assert(dt(ts, "FMDay") == "Friday")
    assert(dt(ts, "Dy DD Mon YYYY HH12 PM") == "Fri 08 Mar 1996 02 PM")
    assert(dt(ts, "Q") == "1")
    assert(dt(ts, "DDD") == "068")
    assert(dt("1996-03-08T09:00:00", "HH12 AM") == "09 AM")
    assert(dt(ts, "Month") == "March    ")
  }
}
