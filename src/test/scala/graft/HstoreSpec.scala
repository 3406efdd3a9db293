package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HstoreKernel

/** contrib/hstore text-format + operator laws, pinned against the
  * reference regress (`contrib/hstore/sql/hstore.sql` /
  * `expected/hstore.out`). Parse/render vectors are the regress's own;
  * operator behavior is proven end-to-end by the q_hstore_ops /
  * q_hstore_each oracle rows. */
class HstoreSpec extends AnyFunSuite {

  private def roundtrip(s: String): String = {
    val pairs = HstoreKernel.parse(s)
    assert(pairs != null, s"parse failed on: $s")
    HstoreKernel.render(pairs)
  }

  test("parse tolerates whitespace in every regress position") {
    for (v <- Seq("a=>b", " a=>b", "a =>b", "a=>b ", "a=> b",
                  "\"a\"=>\"b\"", " \"a\"=>\"b\"", "\"a\" =>\"b\"",
                  "\"a\"=>\"b\" ", "\"a\"=> \"b\""))
      assert(roundtrip(v) == "\"a\"=>\"b\"", s"input: $v")
    for (v <- Seq("aa=>bb, cc=>dd", "aa=>bb , cc=>dd", "aa=>bb ,cc=>dd",
                  "aa=>bb, \"cc\"=>dd", "aa=>\"bb\" , cc=>dd"))
      assert(roundtrip(v) == "\"aa\"=>\"bb\", \"cc\"=>\"dd\"", s"input: $v")
  }

  test("unquoted NULL keyword is case-insensitive; quoted is literal") {
    assert(roundtrip("aa=>null") == "\"aa\"=>NULL")
    assert(roundtrip("aa=>NuLl") == "\"aa\"=>NULL")
    assert(roundtrip("aa=>\"NuLl\"") == "\"aa\"=>\"NuLl\"")
    assert(roundtrip("aa=>NULLx") == "\"aa\"=>\"NULLx\"")
  }

  test("backslash escapes inside and outside quotes (regress vectors)") {
    assert(roundtrip("\\=a=>q=w") == "\"=a\"=>\"q=w\"")
    assert(roundtrip("\"=a\"=>q\\=w") == "\"=a\"=>\"q=w\"")
    assert(roundtrip("\"\\\"a\"=>q>w") == "\"\\\"a\"=>\"q>w\"")
    assert(roundtrip("\\\"a=>q\"w") == "\"\\\"a\"=>\"q\\\"w\"")
  }

  test("empty and whitespace-only input parse to the empty hstore") {
    assert(roundtrip("") == "")
    assert(roundtrip("\t") == "")
    assert(roundtrip("  ") == "")
  }

  test("a comma can START an unquoted value (GV_WAITVAL consumes it)") {
    // 'a=>,b=>1' is ONE pair with value ',b=>1' in the reference's
    // state machine: WAITVAL appends ',' then INVAL's ignoreeq rules
    // swallow '=' and '>'
    assert(roundtrip("a=>,b") == "\"a\"=>\",b\"")
  }

  test("canonical order is (key length, key bytes); last duplicate wins") {
    assert(roundtrip("bb=>1, a=>2, ccc=>3, ab=>4") ==
      "\"a\"=>\"2\", \"ab\"=>\"4\", \"bb\"=>\"1\", \"ccc\"=>\"3\"")
    // duplicate keys: reference leaves the survivor unspecified; we pin
    // last-wins (documented in HstoreKernel)
    assert(roundtrip("k=>1, k=>2") == "\"k\"=>\"2\"")
  }

  test("malformed input yields null (documented divergence from ERROR)") {
    for (bad <- Seq("a", "a=>", "a=b", "a=>\"unterminated", "a=>1 b=>2",
                    "a==>1", "=>1"))
      assert(HstoreKernel.parse(bad) == null, s"should reject: $bad")
    // but 'a=>1,' has a trailing comma -> WKEY then end-of-input is
    // actually an error in the reference? No: get_val returning false
    // at WKEY is a clean return, so a trailing comma is LEGAL
    assert(roundtrip("a=>1,") == "\"a\"=>\"1\"")
  }

  test("hstore_to_json / _loose match the regress vector") {
    val src = "\"a key\" =>1, b => t, c => null, d=> 12345, e => 012345, " +
      "f=> 1.234, g=> 2.345e+4"
    val pairs = HstoreKernel.parse(src)
    assert(HstoreKernel.toJson(pairs, loose = false) ==
      """{"b": "t", "c": null, "d": "12345", "e": "012345", "f": "1.234", """ +
        """"g": "2.345e+4", "a key": "1"}""")
    val loose = HstoreKernel.parse(src + ", h=> \"2016-01-01\"")
    assert(HstoreKernel.toJson(loose, loose = true) ==
      """{"b": true, "c": null, "d": 12345, "e": "012345", "f": 1.234, """ +
        """"g": 2.345e+4, "h": "2016-01-01", "a key": 1}""")
    // jsonb_loose normalizes numerics (regress: 2.345e+4 -> 23450)
    assert(HstoreKernel.toJson(loose, loose = true, jsonb = true) ==
      """{"b": true, "c": null, "d": 12345, "e": "012345", "f": 1.234, """ +
        """"g": 23450, "h": "2016-01-01", "a key": 1}""")
  }

  test("loose booleans are exactly length-1 t/f — 'true'/'false' stay strings") {
    // hstore_io.c:1307-1313 only guesses single-char 't'/'f'; the words
    // "true"/"false" must render as quoted strings, not JSON booleans.
    val pairs = HstoreKernel.parse("a=>t, b=>true, c=>f, d=>false")
    assert(HstoreKernel.toJson(pairs, loose = true) ==
      """{"a": true, "b": "true", "c": false, "d": "false"}""")
    assert(HstoreKernel.toJson(pairs, loose = true, jsonb = true) ==
      """{"a": true, "b": "true", "c": false, "d": "false"}""")
  }

  test("render always quotes and escapes; null value renders bare NULL") {
    assert(HstoreKernel.render(Seq(("a b", "c\"d"), ("n", null))) ==
      "\"n\"=>NULL, \"a b\"=>\"c\\\"d\"")
  }
}
