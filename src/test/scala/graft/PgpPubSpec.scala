package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{PgpDearmor, PgpKernel}
import graft.queries.PgpRegressKeys._

/** Public-key OpenPGP vs the reference regress
  * (`contrib/pgcrypto/sql/pgp-pubkey-decrypt.sql` + expected output):
  * keys and messages are the regress's own gnupg-generated fixtures, so
  * each successful decrypt proves wire-format interop for the full
  * chain — armored key block parsing (subkey selection, S2K-encrypted
  * secret MPIs), tag-1 session-key recovery (ElGamal and RSA,
  * EME-PKCS1-v1.5), and the shared payload tail. */
class PgpPubSpec extends AnyFunSuite {

  private def dearmor(s: String): Array[Byte] =
    PgpDearmor(null).kernel(UTF8String.fromString(s))

  private def dec(msg: String, key: String, psw: String = null): String =
    try {
      val out = PgpKernel.pubDecrypt(dearmor(msg), dearmor(key),
        if (psw == null) null else psw.getBytes("UTF-8"), "",
        textMode = true)
      new String(out, "UTF-8")
    } catch { case scala.util.control.NonFatal(_) => null }

  test("regress: elgamal and rsa decrypts of gnupg-produced messages") {
    assert(dec(msg1, sec_elg1024) == "Secret msg")
    assert(dec(msg4, sec_rsaenc2048) == "Secret message.")
  }

  test("regress: wrong key / sign-only key / short-read all fail closed") {
    assert(dec(msg4, sec_elg1024) == null)        // wrong key type
    assert(dec(msg1, sec_rsa2048) == null)        // sign-only: no enc subkey
    assert(dec(msg5, sec_rsaenc2048) == null)     // prefix short read
  }

  test("regress: password-protected secret keys (aes128 S2K, sha1 + sha256)") {
    // elgamal secret subkey, S2K-encrypted MPIs
    assert(dec(msg1, sec_psw_elg1024) == null)          // needs password
    assert(dec(msg1, sec_psw_elg1024, "foo") == null)   // wrong password
    assert(dec(msg1, sec_psw_elg1024, "parool") == "Secret msg")
    // rsa variant (key 7 = key 6 with passphrase)
    assert(dec(msg4, sec_rsaenc2048_psw, "123") == null)
    assert(dec(msg4, sec_rsaenc2048_psw, "parool") == "Secret message.")
  }

  private def roundtrip(msg: String, pub: String, sec: String,
                        psw: String = null, opts: String = ""): String = {
    val data = msg.getBytes("UTF-8")
    val enc = PgpKernel.pubEncrypt(data, dearmor(pub), opts,
      textMode = true, PgpKernel.defaultSeed(data, dearmor(pub)))
    try new String(PgpKernel.pubDecrypt(enc, dearmor(sec),
      if (psw == null) null else psw.getBytes("UTF-8"), "",
      textMode = true), "UTF-8")
    catch { case scala.util.control.NonFatal(_) => null }
  }

  test("roundtrip: elgamal and rsa, default and option lanes") {
    assert(roundtrip("pub secret", pub_elg1024, sec_elg1024) == "pub secret")
    assert(roundtrip("pub secret", pub_rsaenc2048, sec_rsaenc2048) ==
      "pub secret")
    // rsa message decrypted with the passphrase-protected twin key
    assert(roundtrip("psw lane", pub_rsaenc2048, sec_rsaenc2048_psw,
      psw = "parool") == "psw lane")
    for (o <- Seq("cipher-algo=aes256", "compress-algo=2", "disable-mdc=1"))
      assert(roundtrip(s"opt $o", pub_elg1024, sec_elg1024,
        opts = o) == s"opt $o", o)
  }

  test("encrypting with a sign-only key fails closed") {
    val data = "x".getBytes("UTF-8")
    intercept[RuntimeException] {
      PgpKernel.pubEncrypt(data, dearmor(sec_rsa2048), "",
        textMode = true, Array[Byte](1))
    }
  }
}
