package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.CryptMd5

/** md5-crypt kernel: the reference regress's own expected outputs, salt
  * parsing edges, and codegen/eval agreement. */
class CryptFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def crypt(pw: String, salt: String): String =
    CryptMd5(null, null)
      .kernel(UTF8String.fromString(pw), UTF8String.fromString(salt))
      .toString

  test("reference regress vectors (contrib/pgcrypto/expected/crypt-md5.out)") {
    assert(crypt("", "$1$Szzz0yzz") == "$1$Szzz0yzz$To38XrR3BsbXQW2ZpfKjF1")
    assert(crypt("foox", "$1$Szzz0yzz") == "$1$Szzz0yzz$IYL49cd3t9bllsA7Jmz1M1")
  }

  test("salt parsing: $1$ strip, 8-char cap, stop at $") {
    // over-long salt is cut to 8 chars: same hash either way
    assert(crypt("pw", "$1$abcdefghIGNORED$x") == crypt("pw", "$1$abcdefgh"))
    // a stored hash re-used as the salt re-derives itself (regress idiom)
    val h = crypt("password", "$1$abcdefgh")
    assert(crypt("password", h) == h)
    // bare salt without the $1$ magic parses identically
    assert(crypt("pw", "Szzz0yzz") == crypt("pw", "$1$Szzz0yzz"))
  }

  private def cryptDes(pw: String, salt: String): String =
    graft.functions.CryptDes(null, null)
      .kernel(UTF8String.fromString(pw), UTF8String.fromString(salt))
      .toString

  test("DES: reference regress vectors (expected/crypt-des.out)") {
    assert(cryptDes("", "NB") == "NBPx/38Y48kHg")
    assert(cryptDes("foox", "NB") == "NB53EGGqrrb5E")
    // regress: a 1-char salt is invalid
    intercept[IllegalArgumentException] { cryptDes("password", "a") }
    // 8-char truncation + hash-as-salt re-derivation
    assert(cryptDes("longerthan8chars", "Gr") == cryptDes("longerth", "Gr"))
    val h = cryptDes("password", "aa")
    assert(cryptDes("password", h) == h)
  }

  private def cryptXdes(pw: String, setting: String): String =
    graft.functions.CryptXdes(null, null)
      .kernel(UTF8String.fromString(pw), UTF8String.fromString(setting))
      .toString

  test("XDES: reference regress vectors (expected/crypt-xdes.out)") {
    assert(cryptXdes("", "_J9..j2zz") == "_J9..j2zzR/nIRDK3pPc")
    assert(cryptXdes("foox", "_J9..j2zz") == "_J9..j2zzAYKMvO2BYRY")
    assert(cryptXdes("longlongpassword", "_J9..j2zz") ==
      "_J9..j2zz4BeseiQNwUg")
    // the >8-char fold is live: prefix hash differs
    assert(cryptXdes("longlongpassword", "_J9..j2zz") !=
      cryptXdes("longlong", "_J9..j2zz"))
    // hash-as-setting re-derivation
    val h = cryptXdes("secret", "_J9..j2zz")
    assert(cryptXdes("secret", h) == h)
    intercept[IllegalArgumentException] { cryptXdes("pw", "_J9..") }
    // out-of-alphabet setting chars decode to 0 via ascii_to_bin, not
    // an error — the regress's '_/!!!!!!!' vector (count=1, salt=0)
    assert(cryptXdes("password", "_/!!!!!!!") == "_/!!!!!!!zqM49hRzxko")
    // ...but an all-zero count is still "crypt(3) returned NULL"
    intercept[IllegalArgumentException] { cryptXdes("password", "_........") }
    intercept[IllegalArgumentException] { cryptXdes("password", "_..!!!!!!") }
    // old-style DES also tolerates out-of-alphabet salt chars
    assert(cryptDes("password", "!!abc").startsWith("!!"))
  }

  private def cryptBf(pw: String, setting: String): String =
    graft.functions.CryptBf(null, null)
      .kernel(UTF8String.fromString(pw), UTF8String.fromString(setting))
      .toString

  test("bcrypt: generated pi boxes match the published constants") {
    import graft.functions.CryptFns
    assert(CryptFns.PiWords(0) == 0x243f6a88L)
    assert(CryptFns.PiWords(1) == 0x85a308d3L)
    assert(CryptFns.PiWords(18) == 0xd1310ba6L) // S0[0]
  }

  test("bcrypt: reference regress vectors (expected/crypt-blowfish.out)") {
    assert(cryptBf("", "$2a$06$RQiOJ.3ELirrXwxIZY8q0O") ==
      "$2a$06$RQiOJ.3ELirrXwxIZY8q0OlGbBEpDmx7IRZlNYvGJ1SHXwNi2cEKK")
    assert(cryptBf("foox", "$2a$06$RQiOJ.3ELirrXwxIZY8q0O") ==
      "$2a$06$RQiOJ.3ELirrXwxIZY8q0OR3CVJrAfda1z26CCHPnB6mmVZD8p0/C")
    // the regress's three invalid-salt rejections
    intercept[IllegalArgumentException] { cryptBf("foox", "$2a$") }
    intercept[IllegalArgumentException] {
      cryptBf("foox", "$2a$40$RQiOJ.3ELirrXwxIZY8q0O")
    }
    intercept[IllegalArgumentException] {
      cryptBf("foox", "$2a$00$RQiOJ.3ELirrXwxIZY8q0O")
    }
    // hash-as-setting re-derivation (the regress's worked idiom)
    val h = cryptBf("password", "$2a$06$RQiOJ.3ELirrXwxIZY8q0O")
    assert(cryptBf("password", h) == h)
  }

  test("pgp armor: regress vectors, junk-tolerant dearmor, CRC verification") {
    import graft.functions.{PgpArmor, PgpDearmor}
    def armor(s: String): String =
      PgpArmor(null).kernel(s.getBytes("UTF-8")).toString
    def dearmor(s: String): String =
      new String(PgpDearmor(null).kernel(UTF8String.fromString(s)), "UTF-8")
    assert(armor("") ==
      "-----BEGIN PGP MESSAGE-----\n\n=twTO\n-----END PGP MESSAGE-----\n")
    assert(armor("test") ==
      "-----BEGIN PGP MESSAGE-----\n\ndGVzdA==\n=+G7Q\n" +
        "-----END PGP MESSAGE-----\n")
    assert(dearmor(armor("zooka")) == "zooka")
    // a flipped body character must fail the CRC check ('v' -> 'w'
    // changes decoded bytes; a padding-bit flip would be ignored by the
    // lenient base64 decoder and never reach the CRC)
    val bad = armor("zooka").replace("em9va2E=", "em9wa2E=")
    intercept[IllegalArgumentException] { dearmor(bad) }
  }

  test("codegen and interpreted paths agree over a real column") {
    graft.functions.CryptFns.register(spark)
    val sp = spark; import sp.implicits._
    val df = Seq("a", "bb", "ccc", "Customer#1").toDF("pw")
      .select(col("pw"), expr("crypt_md5(pw, '$1$graftsal')").as("h"))
    val rows = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.foreach { case (pw, h) => assert(h == crypt(pw, "$1$graftsal")) }
    assert(rows.size == 4)
  }
}
