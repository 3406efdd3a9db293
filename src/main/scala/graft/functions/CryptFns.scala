package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `crypt_md5(password, salt)` — the FreeBSD md5-crypt password scheme
  * pgcrypto's `crypt()` dispatches to for `$1$` salts
  * (`/root/reference/contrib/pgcrypto/crypt-md5.c`; regress
  * `contrib/pgcrypto/sql/crypt-md5.sql`, whose two expected outputs are
  * pinned known-answer vectors in CryptFnsSpec and the q_pgcrypto_crypt
  * oracle). The scheme is deliberately slow — a 1000-iteration MD5
  * stretching loop — which is far outside expression-DSL territory, so
  * it runs as a JIT-compiled Scala kernel behind the PqFns-style
  * reference-object codegen (one virtual call per row).
  *
  * Salt handling per crypt-md5.c: a leading `$1$` is stripped, the salt
  * ends at the next `$`, at most 8 characters are used — so
  * `crypt(pw, crypt(pw, salt))` re-derives the same hash (the
  * verification idiom the reference's regress asserts). */
case class CryptMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  private val Itoa64 =
    "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "crypt_md5"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(pwS: UTF8String, saltS: UTF8String): UTF8String = {
    val pw = pwS.toString.getBytes("UTF-8")
    var s = saltS.toString
    if (s.startsWith("$1$")) s = s.substring(3)
    val dollar = s.indexOf('$')
    if (dollar >= 0) s = s.substring(0, dollar)
    if (s.length > 8) s = s.substring(0, 8)
    val sb = s.getBytes("UTF-8")
    val magic = "$1$".getBytes("UTF-8")

    def md5 = java.security.MessageDigest.getInstance("MD5")
    val ctx = md5
    ctx.update(pw); ctx.update(magic); ctx.update(sb)
    val alt = md5
    alt.update(pw); alt.update(sb); alt.update(pw)
    var fin = alt.digest()
    var i = 0
    while (i < pw.length) { ctx.update(fin(i % 16)); i += 1 }
    i = pw.length
    while (i != 0) {
      ctx.update(if ((i & 1) != 0) 0.toByte else pw(0))
      i >>= 1
    }
    fin = ctx.digest()
    i = 0
    while (i < 1000) {
      val c2 = md5
      if ((i & 1) != 0) c2.update(pw) else c2.update(fin)
      if (i % 3 != 0) c2.update(sb)
      if (i % 7 != 0) c2.update(pw)
      if ((i & 1) != 0) c2.update(fin) else c2.update(pw)
      fin = c2.digest()
      i += 1
    }
    def b(j: Int): Int = fin(j) & 0xff
    val out = new StringBuilder("$1$").append(s).append('$')
    def to64(v0: Long, n: Int): Unit = {
      var v = v0
      var k = 0
      while (k < n) { out.append(Itoa64((v & 0x3f).toInt)); v >>= 6; k += 1 }
    }
    to64((b(0) << 16) | (b(6) << 8) | b(12), 4)
    to64((b(1) << 16) | (b(7) << 8) | b(13), 4)
    to64((b(2) << 16) | (b(8) << 8) | b(14), 4)
    to64((b(3) << 16) | (b(9) << 8) | b(15), 4)
    to64((b(4) << 16) | (b(10) << 8) | b(5), 4)
    to64(b(11), 2)
    UTF8String.fromString(out.toString)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cryptMd5", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $refName.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `crypt_des(password, salt)` — classic crypt(3): DES with the 12-bit
  * salt perturbing the E-expansion (bit i set swaps E rows i and i+24),
  * 25 iterations over the zero block, 2-char salt + 11-char MSB-first
  * base64 output (`/root/reference/contrib/pgcrypto/crypt-des.c`;
  * regress `sql/crypt-des.sql`, both expected outputs pinned in
  * CryptFnsSpec). Only the first 8 password characters participate
  * (7 bits each), the documented crypt(3) truncation. FIPS 46-3 tables;
  * same reference-object codegen as [[CryptMd5]]. */
case class CryptDes(left: Expression, right: Expression)
    extends BinaryExpression {
  import CryptFns._

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "crypt_des"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(pwS: UTF8String, saltS: UTF8String): UTF8String = {
    val pw = pwS.toString
    val salt = saltS.toString
    // out-of-alphabet chars decode to 0 per ascii_to_bin, not an error
    require(salt.length >= 2, "invalid salt")
    val key = new Array[Int](64)
    var i = 0
    while (i < math.min(pw.length, 8)) {
      val c = pw.charAt(i).toInt
      var b = 0
      while (b < 7) { key(i * 8 + b) = (c >> (6 - b)) & 1; b += 1 }
      i += 1
    }
    val saltval = asciiToBin(salt(0)) | (asciiToBin(salt(1)) << 6)
    val block = desCipher(new Array[Int](64), subkeysOf(key), saltval, 25)
    UTF8String.fromString(encode11(block, salt.take(2)))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cryptDes", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $refName.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `crypt_xdes(password, setting)` — BSDi extended DES (`_`-prefixed
  * settings: 4-char iteration count + 4-char salt, both LSB-first
  * base64): passwords beyond 8 characters fold into the key by
  * encrypt-then-XOR rounds (the reference regress explicitly tests
  * >8-char keys), then `count` DES iterations over the zero block with
  * the 24-bit salt perturbing the E-expansion
  * (`/root/reference/contrib/pgcrypto/crypt-des.c` xdes branch; regress
  * `sql/crypt-xdes.sql`, all three expected outputs pinned in
  * CryptFnsSpec). */
case class CryptXdes(left: Expression, right: Expression)
    extends BinaryExpression {
  import CryptFns._

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "crypt_xdes"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(pwS: UTF8String, settingS: UTF8String): UTF8String = {
    val setting = settingS.toString
    // length+prefix are the only hard requirements; out-of-alphabet
    // count/salt chars decode to 0 per ascii_to_bin (reference regress
    // pins crypt('password', '_/!!!!!!!') succeeding)
    require(setting.length >= 9 && setting(0) == '_', "invalid salt")
    def dec4(off: Int): Int =
      (0 until 4).map(i => asciiToBin(setting(off + i)) << (6 * i)).sum
    val count = dec4(1)
    require(count > 0, "invalid salt")
    val saltval = dec4(5)
    val pwb = pwS.toString.getBytes("UTF-8")
    val keybuf = new Array[Int](8)
    var i = 0
    while (i < 8) {
      keybuf(i) = if (i < pwb.length) ((pwb(i) & 0xff) << 1) & 0xff else 0
      i += 1
    }
    def bufBits: Array[Int] =
      Array.tabulate(64)(j => (keybuf(j / 8) >> (7 - j % 8)) & 1)
    var rest = pwb.drop(8)
    while (rest.nonEmpty) {
      val enc = desCipher(bufBits, subkeysOf(bufBits), 0, 1)
      i = 0
      while (i < 8) {
        var v = 0
        var b = 0
        while (b < 8) { v = (v << 1) | enc(i * 8 + b); b += 1 }
        keybuf(i) = v
        i += 1
      }
      val chunk = rest.take(8)
      rest = rest.drop(8)
      i = 0
      while (i < 8) {
        if (i < chunk.length)
          keybuf(i) = keybuf(i) ^ (((chunk(i) & 0xff) << 1) & 0xff)
        i += 1
      }
    }
    val block = desCipher(new Array[Int](64), subkeysOf(bufBits),
      saltval, count)
    UTF8String.fromString(encode11(block, setting.take(9)))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cryptXdes", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $refName.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `crypt_bf(password, setting)` — bcrypt (`$2a$` Eksblowfish,
  * Provos & Mazières 1999; `/root/reference/contrib/pgcrypto/
  * crypt-blowfish.c`, regress `sql/crypt-blowfish.sql` — both expected
  * outputs and all three invalid-salt rejections pinned in
  * CryptFnsSpec/q_pgcrypto_crypt_bf). The Blowfish P/S boxes are the
  * hexadecimal digits of pi: rather than transcribing 4 KB of
  * constants, [[CryptFns.PiWords]] GENERATES them at class init with a
  * Machin-formula fixed-point computation — transcription errors are
  * structurally impossible, and the two regress vectors prove the
  * digits (and everything downstream) right. Cost-parameterized key
  * schedule: 2^cost alternating password/salt expansions, then
  * "OrpheanBeholderScryDoubt" enciphered 64 times; keys cap at 72
  * bytes + the $2a$ NUL terminator per the spec. */
case class CryptBf(left: Expression, right: Expression)
    extends BinaryExpression {
  import CryptFns._

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "crypt_bf"

  private val M = 0xffffffffL

  private final class BfState {
    val p: Array[Long] = PiWords.slice(0, 18).clone()
    val s: Array[Array[Long]] =
      Array.tabulate(4)(i => PiWords.slice(18 + i * 256, 18 + (i + 1) * 256))

    private def f(x: Long): Long =
      ((((s(0)(((x >> 24) & 0xff).toInt) + s(1)(((x >> 16) & 0xff).toInt))
        & M) ^ s(2)(((x >> 8) & 0xff).toInt)) + s(3)((x & 0xff).toInt)) & M

    /** returns (l, r) enciphered, packed as Array(l, r). */
    def encipher(l0: Long, r0: Long): (Long, Long) = {
      var l = l0; var r = r0
      var i = 0
      while (i < 16) {
        l ^= p(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t // undo the 16th swap
      (l ^ p(17), r ^ p(16))
    }

    def expandKey(saltWords: Array[Long], key: Array[Byte]): Unit = {
      var j = 0
      var i = 0
      while (i < 18) {
        var w = 0L
        var b = 0
        while (b < 4) {
          w = ((w << 8) | (key(j % key.length) & 0xffL)) & M
          j += 1; b += 1
        }
        p(i) = (p(i) ^ w) & M
        i += 1
      }
      var l = 0L; var r = 0L
      var di = 0
      i = 0
      while (i < 18) {
        if (saltWords != null) {
          l ^= saltWords(di % 4); r ^= saltWords((di + 1) % 4); di += 2
        }
        val (nl, nr) = encipher(l, r)
        l = nl; r = nr
        p(i) = l; p(i + 1) = r
        i += 2
      }
      var si = 0
      while (si < 4) {
        i = 0
        while (i < 256) {
          if (saltWords != null) {
            l ^= saltWords(di % 4); r ^= saltWords((di + 1) % 4); di += 2
          }
          val (nl, nr) = encipher(l, r)
          l = nl; r = nr
          s(si)(i) = l; s(si)(i + 1) = r
          i += 2
        }
        si += 1
      }
    }
  }

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(pwS: UTF8String, settingS: UTF8String): UTF8String = {
    val setting = settingS.toString
    require(setting.length >= 29 && setting.startsWith("$2a$") &&
      setting(6) == '$' && setting(4).isDigit && setting(5).isDigit,
      "invalid salt")
    val cost = (setting(4) - '0') * 10 + (setting(5) - '0')
    require(cost >= 4 && cost <= 31, "invalid salt")
    val saltStr = setting.substring(7, 29)
    require(saltStr.forall(BcryptB64.indexOf(_) >= 0), "invalid salt")
    val salt = bcryptB64Decode(saltStr, 16)
    val saltWords = Array.tabulate(4)(i =>
      ((salt(i * 4) & 0xffL) << 24) | ((salt(i * 4 + 1) & 0xffL) << 16) |
        ((salt(i * 4 + 2) & 0xffL) << 8) | (salt(i * 4 + 3) & 0xffL))
    val pwb = pwS.toString.getBytes("UTF-8").take(72)
    val key = pwb :+ 0.toByte
    val bf = new BfState
    bf.expandKey(saltWords, key)
    var i = 0
    val rounds = 1 << cost
    while (i < rounds) {
      bf.expandKey(null, key)
      bf.expandKey(null, salt)
      i += 1
    }
    val text = "OrpheanBeholderScryDoubt".getBytes("US-ASCII")
    val words = Array.tabulate(6)(j =>
      ((text(j * 4) & 0xffL) << 24) | ((text(j * 4 + 1) & 0xffL) << 16) |
        ((text(j * 4 + 2) & 0xffL) << 8) | (text(j * 4 + 3) & 0xffL))
    i = 0
    while (i < 64) {
      var k = 0
      while (k < 6) {
        val (l, r) = bf.encipher(words(k), words(k + 1))
        words(k) = l; words(k + 1) = r
        k += 2
      }
      i += 1
    }
    val out = new Array[Byte](24)
    i = 0
    while (i < 6) {
      out(i * 4) = ((words(i) >> 24) & 0xff).toByte
      out(i * 4 + 1) = ((words(i) >> 16) & 0xff).toByte
      out(i * 4 + 2) = ((words(i) >> 8) & 0xff).toByte
      out(i * 4 + 3) = (words(i) & 0xff).toByte
      i += 1
    }
    UTF8String.fromString(
      setting.substring(0, 7) + saltStr + bcryptB64Encode(out.take(23)))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cryptBf", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $refName.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `pgp_armor(bytea)` — OpenPGP ASCII armor (`/root/reference/contrib/
  * pgcrypto/pgp-armor.c`; RFC 4880 §6): BEGIN/END PGP MESSAGE envelope,
  * RFC base64 wrapped at 76 columns, `=`-prefixed CRC-24 trailer
  * (init 0xB704CE, poly 0x1864CFB). Regress `sql/pgp-armor.sql` expected
  * outputs pinned in CryptFnsSpec and the q_pgp_armor oracle. */
case class PgpArmor(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "pgp_armor"

  def kernel(data: Array[Byte]): UTF8String = {
    val b64 = java.util.Base64.getEncoder.encodeToString(data)
    val body = b64.grouped(76).map(_ + "\n").mkString
    val crc = CryptFns.crc24(data)
    val crcB64 = java.util.Base64.getEncoder.encodeToString(
      Array(((crc >> 16) & 0xff).toByte, ((crc >> 8) & 0xff).toByte,
        (crc & 0xff).toByte))
    UTF8String.fromString(
      "-----BEGIN PGP MESSAGE-----\n\n" + body + "=" + crcB64 +
        "\n-----END PGP MESSAGE-----\n")
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("pgpArmor", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `pgp_dearmor(text)` — the tolerant inverse (pgp-armor.c dearmor):
  * pre-envelope garbage skipped, armor headers (Comment: ...) skipped to
  * the blank line, whitespace/blank lines inside the base64 body
  * ignored, and the CRC-24 trailer VERIFIED — a corrupted body throws,
  * like the reference's "Corrupt ascii-armor". */
case class PgpDearmor(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pgp_dearmor"

  def kernel(s: UTF8String): Array[Byte] = {
    val lines = s.toString.split("\n", -1)
    var i = 0
    while (i < lines.length && !lines(i).startsWith("-----BEGIN PGP"))
      i += 1
    require(i < lines.length, "Corrupt ascii-armor")
    i += 1
    // armor headers run to the first blank line
    while (i < lines.length && lines(i).trim.nonEmpty) i += 1
    val body = new StringBuilder
    var crcStr: String = null
    while (i < lines.length && crcStr == null &&
        !lines(i).startsWith("-----END")) {
      val t = lines(i).trim
      if (t.startsWith("=")) crcStr = t.substring(1)
      else body.append(t.filterNot(_.isWhitespace))
      i += 1
    }
    require(crcStr != null && crcStr.length == 4, "Corrupt ascii-armor")
    val data = java.util.Base64.getDecoder.decode(body.toString)
    val crcBytes = java.util.Base64.getDecoder.decode(crcStr)
    val want = ((crcBytes(0) & 0xff) << 16) | ((crcBytes(1) & 0xff) << 8) |
      (crcBytes(2) & 0xff)
    require(CryptFns.crc24(data) == want, "Corrupt ascii-armor")
    data
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("pgpDearmor", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CryptFns {
  /** OpenPGP CRC-24 (RFC 4880 §6.1). */
  private[graft] def crc24(data: Array[Byte]): Int = {
    var crc = 0xb704ce
    data.foreach { b =>
      crc ^= (b & 0xff) << 16
      var i = 0
      while (i < 8) {
        crc <<= 1
        if ((crc & 0x1000000) != 0) crc ^= 0x1864cfb
        i += 1
      }
    }
    crc & 0xffffff
  }

  /** bcrypt's own base64 alphabet (NOT RFC 4648). */
  private[functions] val BcryptB64 =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  private[functions] def bcryptB64Decode(s: String, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nb = 0
    s.foreach { ch =>
      acc = (acc << 6) | BcryptB64.indexOf(ch); nb += 6
      while (nb >= 8) { out.write(((acc >> (nb - 8)) & 0xff).toInt); nb -= 8 }
    }
    out.toByteArray.take(n)
  }

  private[functions] def bcryptB64Encode(bs: Array[Byte]): String = {
    val out = new StringBuilder
    var acc = 0L; var nb = 0
    bs.foreach { b =>
      acc = (acc << 8) | (b & 0xffL); nb += 8
      while (nb >= 6) {
        out.append(BcryptB64.charAt(((acc >> (nb - 6)) & 0x3f).toInt)); nb -= 6
      }
    }
    if (nb > 0) out.append(BcryptB64.charAt(((acc << (6 - nb)) & 0x3f).toInt))
    out.toString
  }

  /** The 18 + 4*256 Blowfish init words: the first 8336 hexadecimal
    * digits of pi's fraction, GENERATED by a Machin-formula fixed-point
    * computation (16 atan(1/5) - 4 atan(1/239)) instead of transcribed —
    * CryptFnsSpec pins the published first words (243f6a88, 85a308d3,
    * d1310ba6) and the regress vectors prove the rest. */
  private[graft] lazy val PiWords: Array[Long] = {
    val n = 18 + 4 * 256
    val digits = n * 8 + 16
    val bits = 4 * digits + 64
    val one = BigInt(1) << bits
    def atanInv(x: Long): BigInt = {
      var total = BigInt(0)
      var term = one / x
      val x2 = BigInt(x) * x
      var k = 0
      while (term.signum != 0) {
        val c = term / (2 * k + 1)
        total = if (k % 2 == 0) total + c else total - c
        term = term / x2
        k += 1
      }
      total
    }
    val pi = 16 * atanInv(5) - 4 * atanInv(239)
    var frac = pi - (BigInt(3) << bits)
    val mask = one - 1
    val digs = new Array[Int](digits)
    var i = 0
    while (i < digits) {
      frac *= 16
      digs(i) = (frac >> bits).toInt
      frac &= mask
      i += 1
    }
    Array.tabulate(n) { w =>
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 4) | digs(w * 8 + j); j += 1 }
      v
    }
  }

  /** 28-bit-halves key schedule from a 64-bit key bit array. */
  private[functions] def subkeysOf(key: Array[Int]): Array[Array[Int]] = {
    def perm(bits: Array[Int], table: Array[Int]): Array[Int] =
      table.map(t => bits(t - 1))
    val k56 = perm(key, PC1)
    var c28 = k56.slice(0, 28)
    var d28 = k56.slice(28, 56)
    Shifts.map { s =>
      c28 = c28.drop(s) ++ c28.take(s)
      d28 = d28.drop(s) ++ d28.take(s)
      perm(c28 ++ d28, PC2)
    }
  }

  /** `count` DES iterations over `block0` with the salt-perturbed
    * E-expansion (bit i of `saltval`, i < 24, swaps E rows i and i+24 —
    * classic crypt uses 12 salt bits, xdes all 24). */
  private[functions] def desCipher(block0: Array[Int],
                                   subkeys: Array[Array[Int]],
                                   saltval: Int, count: Int): Array[Int] = {
    def perm(bits: Array[Int], table: Array[Int]): Array[Int] =
      table.map(t => bits(t - 1))
    val e = ETab.clone()
    var i = 0
    while (i < 24) {
      if ((saltval & (1 << i)) != 0) {
        val t = e(i); e(i) = e(i + 24); e(i + 24) = t
      }
      i += 1
    }
    var block = block0
    var iter = 0
    while (iter < count) {
      val b = perm(block, IP)
      var l = b.slice(0, 32)
      var r = b.slice(32, 64)
      subkeys.foreach { k =>
        val x = new Array[Int](48)
        var j = 0
        while (j < 48) { x(j) = r(e(j) - 1) ^ k(j); j += 1 }
        val sOut = new Array[Int](32)
        var si = 0
        while (si < 8) {
          val o = si * 6
          val row = (x(o) << 1) | x(o + 5)
          val colv = (x(o + 1) << 3) | (x(o + 2) << 2) |
            (x(o + 3) << 1) | x(o + 4)
          val v = Sbox(si)(row)(colv)
          sOut(si * 4) = (v >> 3) & 1; sOut(si * 4 + 1) = (v >> 2) & 1
          sOut(si * 4 + 2) = (v >> 1) & 1; sOut(si * 4 + 3) = v & 1
          si += 1
        }
        val f = perm(sOut, PTab)
        val nr = new Array[Int](32)
        var m = 0
        while (m < 32) { nr(m) = l(m) ^ f(m); m += 1 }
        l = r; r = nr
      }
      block = perm(r ++ l, FP)
      iter += 1
    }
    block
  }

  /** crypt(3) output tail: 64 block bits + 2 pad bits as 11 MSB-first
    * base64 chars, appended to `prefix` (the setting echo). */
  private[functions] def encode11(block: Array[Int], prefix: String): String = {
    val out = new StringBuilder(prefix)
    val bits = block ++ Array(0, 0)
    var i = 0
    while (i < 11) {
      var v = 0
      var j = 0
      while (j < 6) { v = (v << 1) | bits(i * 6 + j); j += 1 }
      out.append(Itoa64Str.charAt(v))
      i += 1
    }
    out.toString
  }

  private[functions] val Itoa64Str =
    "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  /** crypt-des.c `ascii_to_bin`: decode a setting char to its 6-bit
    * value, clamping anything outside the itoa64 alphabet to 0 — the
    * reference accepts salts like `_/!!!!!!!` (regress
    * expected/crypt-xdes.out) rather than erroring, so the kernels must
    * tolerate out-of-alphabet setting characters the same way. */
  private[functions] def asciiToBin(ch: Char): Int =
    if (ch > 'z') 0
    else if (ch >= 'a') ch - 'a' + 38
    else if (ch > 'Z') 0
    else if (ch >= 'A') ch - 'A' + 12
    else if (ch > '9') 0
    else if (ch >= '.') ch - '.'
    else 0
  // FIPS 46-3 DES tables (public standard)
  private[functions] val IP = Array(
    58,50,42,34,26,18,10,2,60,52,44,36,28,20,12,4,
    62,54,46,38,30,22,14,6,64,56,48,40,32,24,16,8,
    57,49,41,33,25,17,9,1,59,51,43,35,27,19,11,3,
    61,53,45,37,29,21,13,5,63,55,47,39,31,23,15,7)
  private[functions] val FP = Array(
    40,8,48,16,56,24,64,32,39,7,47,15,55,23,63,31,
    38,6,46,14,54,22,62,30,37,5,45,13,53,21,61,29,
    36,4,44,12,52,20,60,28,35,3,43,11,51,19,59,27,
    34,2,42,10,50,18,58,26,33,1,41,9,49,17,57,25)
  private[functions] val ETab = Array(
    32,1,2,3,4,5,4,5,6,7,8,9,8,9,10,11,12,13,
    12,13,14,15,16,17,16,17,18,19,20,21,20,21,22,23,24,25,
    24,25,26,27,28,29,28,29,30,31,32,1)
  private[functions] val PTab = Array(
    16,7,20,21,29,12,28,17,1,15,23,26,5,18,31,10,
    2,8,24,14,32,27,3,9,19,13,30,6,22,11,4,25)
  private[functions] val PC1 = Array(
    57,49,41,33,25,17,9,1,58,50,42,34,26,18,
    10,2,59,51,43,35,27,19,11,3,60,52,44,36,
    63,55,47,39,31,23,15,7,62,54,46,38,30,22,
    14,6,61,53,45,37,29,21,13,5,28,20,12,4)
  private[functions] val PC2 = Array(
    14,17,11,24,1,5,3,28,15,6,21,10,
    23,19,12,4,26,8,16,7,27,20,13,2,
    41,52,31,37,47,55,30,40,51,45,33,48,
    44,49,39,56,34,53,46,42,50,36,29,32)
  private[functions] val Shifts =
    Array(1,1,2,2,2,2,2,2,1,2,2,2,2,2,2,1)
  private[functions] val Sbox: Array[Array[Array[Int]]] = Array(
    Array(Array(14,4,13,1,2,15,11,8,3,10,6,12,5,9,0,7),
      Array(0,15,7,4,14,2,13,1,10,6,12,11,9,5,3,8),
      Array(4,1,14,8,13,6,2,11,15,12,9,7,3,10,5,0),
      Array(15,12,8,2,4,9,1,7,5,11,3,14,10,0,6,13)),
    Array(Array(15,1,8,14,6,11,3,4,9,7,2,13,12,0,5,10),
      Array(3,13,4,7,15,2,8,14,12,0,1,10,6,9,11,5),
      Array(0,14,7,11,10,4,13,1,5,8,12,6,9,3,2,15),
      Array(13,8,10,1,3,15,4,2,11,6,7,12,0,5,14,9)),
    Array(Array(10,0,9,14,6,3,15,5,1,13,12,7,11,4,2,8),
      Array(13,7,0,9,3,4,6,10,2,8,5,14,12,11,15,1),
      Array(13,6,4,9,8,15,3,0,11,1,2,12,5,10,14,7),
      Array(1,10,13,0,6,9,8,7,4,15,14,3,11,5,2,12)),
    Array(Array(7,13,14,3,0,6,9,10,1,2,8,5,11,12,4,15),
      Array(13,8,11,5,6,15,0,3,4,7,2,12,1,10,14,9),
      Array(10,6,9,0,12,11,7,13,15,1,3,14,5,2,8,4),
      Array(3,15,0,6,10,1,13,8,9,4,5,11,12,7,2,14)),
    Array(Array(2,12,4,1,7,10,11,6,8,5,3,15,13,0,14,9),
      Array(14,11,2,12,4,7,13,1,5,0,15,10,3,9,8,6),
      Array(4,2,1,11,10,13,7,8,15,9,12,5,6,3,0,14),
      Array(11,8,12,7,1,14,2,13,6,15,0,9,10,4,5,3)),
    Array(Array(12,1,10,15,9,2,6,8,0,13,3,4,14,7,5,11),
      Array(10,15,4,2,7,12,9,5,6,1,13,14,0,11,3,8),
      Array(9,14,15,5,2,8,12,3,7,0,4,10,1,13,11,6),
      Array(4,3,2,12,9,5,15,10,11,14,1,7,6,0,8,13)),
    Array(Array(4,11,2,14,15,0,8,13,3,12,9,7,5,10,6,1),
      Array(13,0,11,7,4,9,1,10,14,3,5,12,2,15,8,6),
      Array(1,4,11,13,12,3,7,14,10,15,6,8,0,5,9,2),
      Array(6,11,13,8,1,4,10,7,9,5,0,15,14,2,3,12)),
    Array(Array(13,2,8,4,6,15,11,1,10,9,3,14,5,0,12,7),
      Array(1,15,13,8,10,3,7,4,12,5,6,11,0,14,9,2),
      Array(7,11,4,1,9,12,14,2,0,6,10,13,15,3,5,8),
      Array(2,1,14,7,4,10,8,13,15,12,9,0,3,5,6,11)))
  /** Register `crypt_md5` + `crypt_des` for SQL + `expr(...)` use.
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("crypt_md5"))) {
      reg.createOrReplaceTempFunction(
        "crypt_md5", exprs => CryptMd5(exprs(0), exprs(1)), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("crypt_des"))) {
      reg.createOrReplaceTempFunction(
        "crypt_des", exprs => CryptDes(exprs(0), exprs(1)), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("crypt_xdes"))) {
      reg.createOrReplaceTempFunction(
        "crypt_xdes", exprs => CryptXdes(exprs(0), exprs(1)), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("crypt_bf"))) {
      reg.createOrReplaceTempFunction(
        "crypt_bf", exprs => CryptBf(exprs(0), exprs(1)), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("pgp_armor"))) {
      reg.createOrReplaceTempFunction(
        "pgp_armor", exprs => PgpArmor(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "pgp_dearmor", exprs => PgpDearmor(exprs.head), "built-in")
    }
  }
}
