package graft.functions

import java.io.ByteArrayOutputStream
import java.security.MessageDigest
import java.util.zip.{Deflater, Inflater}

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** pgcrypto `pgp_sym_encrypt` / `pgp_sym_decrypt` — the OpenPGP
  * (RFC 4880) symmetric message format
  * (`/root/reference/contrib/pgcrypto/pgp-encrypt.c`, `pgp-decrypt.c`,
  * `pgp-cfb.c`, `pgp-s2k.c`, `pgp-pgsql.c`; regress
  * `contrib/pgcrypto/sql/pgp-decrypt.sql`, `pgp-encrypt.sql`,
  * `pgp-compression.sql` — PgpSpec decrypts the regress's own armored
  * messages, which were produced by the reference/gpg, so the wire
  * format is proven against independently-generated ciphertext).
  *
  * Message layout: a Symmetric-Key Encrypted Session Key packet (tag 3:
  * version 4, cipher algo, S2K specifier, optionally a CFB-encrypted
  * session key — without one the S2K-derived key IS the message key),
  * then either a Sym. Encrypted Integrity Protected Data packet
  * (tag 18 v1: normal CFB, zero IV, block+2 repeated-byte quick-check
  * prefix, inner packets, and a trailing MDC packet = SHA-1 over
  * everything including the 0xD3 0x14 header) or, with disable-mdc=1,
  * the old Symmetrically Encrypted Data packet (tag 9) using OpenPGP's
  * resync CFB (the "block #2 is 2 bytes" horror, ported byte-for-byte
  * from pgp-cfb.c). Inner packets: optional Compressed Data (tag 8,
  * ZIP=raw-deflate or ZLIB; BZip2 unsupported exactly as in the
  * reference's zlib build) around a Literal Data packet (tag 11,
  * format 'b'/'t'/'u', empty name, zero date).
  *
  * Supported options (pgp-pgsql.c option table): cipher-algo
  * (bf/aes/aes128/aes192/aes256/3des), s2k-mode (0/1/3), s2k-count,
  * s2k-digest-algo (md5/sha1), compress-algo (0/1/2), compress-level
  * (0 disables), sess-key, disable-mdc, convert-crlf, unicode-mode,
  * and the regress's expect-* check options on decrypt.
  *
  * Two pinned divergences, both operationally motivated:
  *  - the reference draws S2K salt / prefix / session key from a CSPRNG;
  *    a nondeterministic expression breaks task-retry determinism on a
  *    1000-executor cluster, so randomness comes from a SHA-1 counter
  *    DRBG seeded by an explicit `seed` argument (or derived from
  *    (data, password) when omitted). Equal (data, password, options,
  *    seed) therefore produce equal ciphertext — fine for an analytics
  *    engine, NOT a security property the reference has.
  *  - per-row errors (wrong key, corrupt data, unsupported algos)
  *    return SQL NULL instead of ereport (the Metaphone precedent).
  */
object PgpKernel {

  private[functions] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---- ciphers (RFC 4880 §9.2 ids; pgp.c pgp_get_cipher_*) ----------
  private case class CipherMeta(jce: String, keyLen: Int, blockLen: Int)
  private val ciphers: Map[Int, CipherMeta] = Map(
    2 -> CipherMeta("DESede/ECB/NoPadding", 24, 8), // 3des
    4 -> CipherMeta("Blowfish/ECB/NoPadding", 16, 8), // bf
    7 -> CipherMeta("AES/ECB/NoPadding", 16, 16), // aes128
    8 -> CipherMeta("AES/ECB/NoPadding", 24, 16), // aes192
    9 -> CipherMeta("AES/ECB/NoPadding", 32, 16)) // aes256

  private val cipherNames = Map(
    "3des" -> 2, "bf" -> 4, "blowfish" -> 4, "aes" -> 7,
    "aes128" -> 7, "aes-128" -> 7, "aes192" -> 8, "aes-192" -> 8,
    "aes256" -> 9, "aes-256" -> 9)
  private val digestNames = Map("md5" -> 1, "sha1" -> 2, "sha-1" -> 2)

  def cipherKeyLen(algo: Int): Int =
    ciphers.getOrElse(algo, throw Malformed).keyLen
  def cipherBlockLen(algo: Int): Int =
    ciphers.getOrElse(algo, throw Malformed).blockLen

  private def blockCipher(algo: Int, key: Array[Byte]): Cipher = {
    val m = ciphers.getOrElse(algo, throw Malformed)
    val c = Cipher.getInstance(m.jce)
    val k = if (key.length == m.keyLen) key
            else throw Malformed
    val alg = m.jce.substring(0, m.jce.indexOf('/'))
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k, alg))
    c
  }

  // ---- OpenPGP CFB (pgp-cfb.c, normal + resync modes) ---------------
  /** Stateful CFB engine; `resync` selects the old PGP_PKT_SYMENCRYPTED
    * _DATA mode where "block #2" is the 2-byte prefix tail and the
    * feedback register resynchronizes on the ciphertext boundary. */
  final class Cfb(algo: Int, key: Array[Byte], resync: Boolean,
                  iv: Array[Byte] = null) {
    private val ciph = blockCipher(algo, key)
    private val bs = cipherBlockLen(algo)
    private val fr = new Array[Byte](bs)
    if (iv != null) System.arraycopy(iv, 0, fr, 0, math.min(bs, iv.length))
    private val fre = new Array[Byte](bs)
    private val encbuf = new Array[Byte](bs)
    private var pos = 0
    private var blockNo = 0

    private def mix(data: Array[Byte], off0: Int, len0: Int,
                    dst: ByteArrayOutputStream, enc: Boolean): Int = {
      var off = off0
      var len = len0
      var produced = 0
      if (resync && blockNo == 2) {
        var n = math.min(2 - pos, len)
        var i = pos
        while (i < pos + n) {
          if (enc) { encbuf(i) = (fre(i) ^ data(off)).toByte; dst.write(encbuf(i)) }
          else { encbuf(i) = data(off); dst.write(fre(i) ^ encbuf(i)) }
          off += 1; i += 1
        }
        pos += n; len -= n; produced += n
        if (pos == 2) {
          System.arraycopy(encbuf, 2, fr, 0, bs - 2)
          // note: at this point only encbuf[0..1] are this half-block's
          // bytes; the tail comes from the PREVIOUS full block still in
          // encbuf — exactly the reference's aliasing
          System.arraycopy(encbuf, 0, fr, bs - 2, 2)
          pos = 0
          return produced
        }
      }
      var i = pos
      while (i < pos + len) {
        if (enc) { encbuf(i) = (fre(i) ^ data(off)).toByte; dst.write(encbuf(i)) }
        else { encbuf(i) = data(off); dst.write(fre(i) ^ encbuf(i)) }
        off += 1; i += 1
      }
      pos += len
      produced + len
    }

    private def process(data: Array[Byte], dst: ByteArrayOutputStream,
                        enc: Boolean): Unit = {
      var off = 0
      var len = data.length
      while (len > 0 && pos > 0) {
        val n = math.min(bs - pos, len)
        val done = mix(data, off, n, dst, enc)
        off += done; len -= done
        if (pos == bs) { System.arraycopy(encbuf, 0, fr, 0, bs); pos = 0 }
      }
      while (len > 0) {
        ciph.update(fr, 0, bs, fre, 0)
        if (blockNo < 5) blockNo += 1
        val n = math.min(bs, len)
        val done = mix(data, off, n, dst, enc)
        off += done; len -= done
        if (pos == bs) { System.arraycopy(encbuf, 0, fr, 0, bs); pos = 0 }
      }
    }

    def encrypt(data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length)
      process(data, out, enc = true)
      out.toByteArray
    }
    def decrypt(data: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(data.length)
      process(data, out, enc = false)
      out.toByteArray
    }
  }

  // ---- S2K (pgp-s2k.c) ----------------------------------------------
  def s2kDecodeCount(c: Int): Int = (16 + (c & 15)) << ((c >> 4) + 6)

  /** pgp-s2k.c s2k_encode_count: smallest one-byte code whose decoded
    * count is >= the requested count (clamped to the encodable range). */
  def s2kEncodeCount(count: Int): Int = {
    var c = 0
    while (c < 255 && s2kDecodeCount(c) < count) c += 1
    c
  }

  private def mdInstance(digestAlgo: Int): MessageDigest = digestAlgo match {
    case 1 => MessageDigest.getInstance("MD5")
    case 2 => MessageDigest.getInstance("SHA-1")
    case 8 => MessageDigest.getInstance("SHA-256")
    case 9 => MessageDigest.getInstance("SHA-384")
    case 10 => MessageDigest.getInstance("SHA-512")
    case 11 => MessageDigest.getInstance("SHA-224")
    case _ => throw Malformed
  }

  /** calc_s2k_{simple,salted,iter_salted}: multi-round with i zero-byte
    * preload per round until keyLen bytes are produced. */
  def s2k(mode: Int, digestAlgo: Int, salt: Array[Byte], iterByte: Int,
          pw: Array[Byte], keyLen: Int): Array[Byte] = {
    val out = new Array[Byte](keyLen)
    var off = 0
    var preload = 0
    while (off < keyLen) {
      val md = mdInstance(digestAlgo)
      md.update(new Array[Byte](preload))
      preload += 1
      mode match {
        case 0 => md.update(pw)
        case 1 => md.update(salt); md.update(pw)
        case 3 =>
          val count = s2kDecodeCount(iterByte)
          md.update(salt); md.update(pw)
          var cur = salt.length + pw.length
          var done = false
          while (cur < count && !done) {
            val cs = if (cur + salt.length < count) salt.length
                     else count - cur
            md.update(salt, 0, cs); cur += cs
            if (cur + pw.length < count) { md.update(pw); cur += pw.length }
            else if (cur < count) { md.update(pw, 0, count - cur); cur = count }
            else done = true
          }
        case _ => throw Malformed
      }
      val h = md.digest()
      val n = math.min(h.length, keyLen - off)
      System.arraycopy(h, 0, out, off, n)
      off += n
    }
    out
  }

  // ---- deterministic DRBG (divergence: see object scaladoc) ---------
  final class Drbg(seed: Array[Byte]) {
    private var counter = 0L
    private val buf = new ByteArrayOutputStream()
    def next(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val md = MessageDigest.getInstance("SHA-1")
        md.update(seed)
        md.update(java.nio.ByteBuffer.allocate(8).putLong(counter).array())
        counter += 1
        val h = md.digest()
        val c = math.min(h.length, n - off)
        System.arraycopy(h, 0, out, off, c)
        off += c
      }
      out
    }
  }

  // ---- packet framing (RFC 4880 §4.2, both header formats) ----------
  final class PacketReader(buf: Array[Byte]) {
    var pos = 0
    def atEnd: Boolean = pos >= buf.length
    private def u8(): Int = {
      if (pos >= buf.length) throw Malformed
      val b = buf(pos) & 0xff; pos += 1; b
    }
    private def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > buf.length) throw Malformed
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
      pos += n
      out
    }
    /** (tag, body) — partial new-format lengths are concatenated. */
    def next(): (Int, Array[Byte]) = {
      val hdr = u8()
      if ((hdr & 0x80) == 0) throw Malformed
      if ((hdr & 0x40) != 0) { // new format
        val tag = hdr & 0x3f
        val out = new ByteArrayOutputStream()
        var done = false
        while (!done) {
          val o1 = u8()
          if (o1 < 192) { out.write(take(o1)); done = true }
          else if (o1 <= 223) {
            out.write(take(((o1 - 192) << 8) + u8() + 192)); done = true
          } else if (o1 == 255) {
            val len = (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
            out.write(take(len)); done = true
          } else out.write(take(1 << (o1 & 0x1f))) // partial, keep going
        }
        (tag, out.toByteArray)
      } else { // old format
        val tag = (hdr >> 2) & 0x0f
        val body = (hdr & 3) match {
          case 0 => take(u8())
          case 1 => take((u8() << 8) | u8())
          case 2 =>
            val len = (u8() << 24) | (u8() << 16) | (u8() << 8) | u8()
            take(len)
          case 3 => take(buf.length - pos) // indeterminate: to EOF
        }
        (tag, body)
      }
    }
  }

  private def newHeader(tag: Int, len: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0xc0 | tag)
    if (len < 192) out.write(len)
    else if (len < 8384) {
      val l = len - 192
      out.write((l >> 8) + 192); out.write(l & 0xff)
    } else {
      out.write(255)
      out.write(len >>> 24); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
    }
    out.toByteArray
  }

  private def packet(tag: Int, body: Array[Byte]): Array[Byte] =
    newHeader(tag, body.length) ++ body

  // ---- options (pgp-pgsql.c set_arg table) --------------------------
  final case class Opts(
      cipherAlgo: Int = 7, s2kMode: Int = 3, s2kCount: Int = 65536,
      s2kDigest: Int = 2, compressAlgo: Int = 0, compressLevel: Int = 6,
      disableMdc: Boolean = false, sessKey: Boolean = false,
      convertCrlf: Boolean = false, unicodeMode: Boolean = false,
      expect: Map[String, Int] = Map.empty)

  def parseOpts(s: String): Opts = {
    var o = Opts()
    if (s == null || s.trim.isEmpty) return o
    s.split(",").foreach { kvs =>
      val kv = kvs.split("=", 2)
      if (kv.length != 2) throw Malformed
      val k = kv(0).trim.toLowerCase
      val v = kv(1).trim.toLowerCase
      def num: Int = try v.toInt catch { case _: NumberFormatException => throw Malformed }
      k match {
        case "cipher-algo" =>
          o = o.copy(cipherAlgo = cipherNames.getOrElse(v, throw Malformed))
        case "s2k-mode" =>
          if (num != 0 && num != 1 && num != 3) throw Malformed
          o = o.copy(s2kMode = num)
        case "s2k-count" => o = o.copy(s2kCount = num)
        case "s2k-digest-algo" =>
          o = o.copy(s2kDigest = digestNames.getOrElse(v, throw Malformed))
        case "s2k-cipher-algo" => // only relevant with sess-key; same table
          o = o.copy(cipherAlgo = cipherNames.getOrElse(v, throw Malformed))
        case "compress-algo" =>
          if (num < 0 || num > 2) throw Malformed // bzip2(3): unsupported
          o = o.copy(compressAlgo = num)
        case "compress-level" => o = o.copy(compressLevel = num)
        case "disable-mdc" => o = o.copy(disableMdc = num != 0)
        case "sess-key" => o = o.copy(sessKey = num != 0)
        case "convert-crlf" => o = o.copy(convertCrlf = num != 0)
        case "unicode-mode" => o = o.copy(unicodeMode = num != 0)
        case "debug" => // accepted, no-op
        case e if e.startsWith("expect-") =>
          val x = e.stripPrefix("expect-") match {
            case "cipher-algo" => cipherNames.getOrElse(v, throw Malformed)
            case "s2k-digest-algo" => digestNames.getOrElse(v, throw Malformed)
            case _ => num
          }
          o = o.copy(expect = o.expect + (e.stripPrefix("expect-") -> x))
        case _ => throw Malformed
      }
    }
    o
  }

  // ---- compression (tag 8; ZIP=raw deflate, ZLIB=wrapped) -----------
  private def deflate(data: Array[Byte], algo: Int, level: Int): Array[Byte] = {
    val d = new Deflater(math.max(1, math.min(9, level)), algo == 1)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], algo: Int): Array[Byte] = {
    val inf = new Inflater(algo == 1)
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 2 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw Malformed
        out.write(buf, 0, n)
      }
    } catch { case _: java.util.zip.DataFormatException => throw Malformed }
    finally inf.end()
    out.toByteArray
  }

  // ---- shared packet builders / parsers ----------------------------
  /** Literal packet, CRLF-converted and optionally compressed. */
  private def literalPacket(data: Array[Byte], o: Opts,
                            textMode: Boolean): Array[Byte] = {
    val litType: Byte =
      if (!textMode) 'b' else if (o.unicodeMode) 'u' else 't'
    val body = if (textMode && o.convertCrlf) crlfEncode(data) else data
    val lit = packet(11,
      Array(litType, 0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte) ++ body)
    if (o.compressAlgo == 0 || o.compressLevel == 0) lit
    else packet(8, Array(o.compressAlgo.toByte) ++
      deflate(lit, o.compressAlgo, o.compressLevel))
  }

  /** Tag-18 (MDC) or tag-9 (resync) encrypted data packet. */
  private def encryptedDataPacket(inner: Array[Byte], algo: Int,
      msgKey: Array[Byte], disableMdc: Boolean, rng: Drbg): Array[Byte] = {
    val bs = cipherBlockLen(algo)
    val prefixBase = rng.next(bs)
    val prefix = prefixBase ++ Array(prefixBase(bs - 2), prefixBase(bs - 1))
    if (!disableMdc) {
      val md = MessageDigest.getInstance("SHA-1")
      md.update(prefix); md.update(inner)
      md.update(Array(0xd3.toByte, 0x14.toByte))
      val mdc = Array(0xd3.toByte, 0x14.toByte) ++ md.digest()
      val cfb = new Cfb(algo, msgKey, resync = false)
      packet(18, Array(1.toByte) ++ cfb.encrypt(prefix ++ inner ++ mdc))
    } else {
      val cfb = new Cfb(algo, msgKey, resync = true)
      packet(9, cfb.encrypt(prefix ++ inner))
    }
  }

  // ---- encrypt ------------------------------------------------------
  def encrypt(data: Array[Byte], pw: Array[Byte], optStr: String,
              textMode: Boolean, seed: Array[Byte]): Array[Byte] = {
    val o = parseOpts(optStr)
    val rng = new Drbg(seed)
    val keyLen = cipherKeyLen(o.cipherAlgo)
    val bs = cipherBlockLen(o.cipherAlgo)

    // S2K specifier + derived key
    val salt = rng.next(8)
    val iterByte = s2kEncodeCount(o.s2kCount)
    val s2kKey = s2k(o.s2kMode, o.s2kDigest, salt, iterByte, pw, keyLen)
    val s2kSpec = new ByteArrayOutputStream()
    s2kSpec.write(o.s2kMode); s2kSpec.write(o.s2kDigest)
    if (o.s2kMode >= 1) s2kSpec.write(salt)
    if (o.s2kMode == 3) s2kSpec.write(iterByte)

    val tag3Body = new ByteArrayOutputStream()
    tag3Body.write(4); tag3Body.write(o.cipherAlgo)
    tag3Body.write(s2kSpec.toByteArray)
    val msgKey = if (o.sessKey) {
      val sk = rng.next(keyLen)
      val cfb = new Cfb(o.cipherAlgo, s2kKey, resync = false)
      tag3Body.write(cfb.encrypt(Array(o.cipherAlgo.toByte) ++ sk))
      sk
    } else s2kKey

    val inner = literalPacket(data, o, textMode)
    val enc = encryptedDataPacket(inner, o.cipherAlgo, msgKey,
      o.disableMdc, rng)
    packet(3, tag3Body.toByteArray) ++ enc
  }

  // ---- decrypt ------------------------------------------------------
  def decrypt(msg: Array[Byte], pw: Array[Byte], optStr: String,
              textMode: Boolean): Array[Byte] = {
    val o = parseOpts(optStr)
    val r = new PacketReader(msg)

    // tag 3: s2k + optional encrypted session key
    var keyAlgo = -1
    var msgKey: Array[Byte] = null
    var sawSessKey = false
    var s2kModeSeen = -1
    var s2kDigestSeen = -1
    var dataTag = -1
    var dataBody: Array[Byte] = null
    while (!r.atEnd && dataBody == null) {
      val (tag, body) = r.next()
      tag match {
        case 3 =>
          if (body.length < 4 || body(0) != 4) throw Malformed
          val algo = body(1) & 0xff
          val mode = body(2) & 0xff
          val digest = body(3) & 0xff
          var off = 4
          val salt = mode match {
            case 0 => Array.empty[Byte]
            case 1 | 3 =>
              if (body.length < off + 8) throw Malformed
              val s = java.util.Arrays.copyOfRange(body, off, off + 8)
              off += 8; s
            case _ => throw Malformed
          }
          val iter = if (mode == 3) { val i = body(off) & 0xff; off += 1; i }
                     else 0
          s2kModeSeen = mode; s2kDigestSeen = digest
          val s2kKey = s2k(mode, digest, salt, iter, pw, cipherKeyLen(algo))
          if (off == body.length) { // s2k key IS the session key
            keyAlgo = algo; msgKey = s2kKey; sawSessKey = false
          } else { // decrypt_key: separate session key
            val encKey = java.util.Arrays.copyOfRange(body, off, body.length)
            val cfb = new Cfb(algo, s2kKey, resync = false)
            val dec = cfb.decrypt(encKey)
            keyAlgo = dec(0) & 0xff
            msgKey = java.util.Arrays.copyOfRange(dec, 1, dec.length)
            if (msgKey.length != cipherKeyLen(keyAlgo)) throw Malformed
            sawSessKey = true
          }
        case 9 | 18 =>
          if (msgKey == null) throw Malformed
          dataTag = tag; dataBody = body
        case 10 => // marker packet: skip (pgp-decrypt.c PGP_PKT_MARKER)
        case _ => throw Malformed
      }
    }
    if (dataBody == null) throw Malformed
    decryptPayload(dataTag, dataBody, keyAlgo, msgKey, o, textMode,
      Map("sess-key" -> (if (sawSessKey) 1 else 0),
        "s2k-mode" -> s2kModeSeen, "s2k-digest-algo" -> s2kDigestSeen))
  }

  /** Shared data-packet decryption tail (tag 18/9 -> inner packets ->
    * literal), used by both the symmetric and public-key paths. */
  private def decryptPayload(dataTag: Int, dataBody: Array[Byte],
      keyAlgo: Int, msgKey: Array[Byte], o: Opts, textMode: Boolean,
      extraExpect: Map[String, Int]): Array[Byte] = {
    val bs = cipherBlockLen(keyAlgo)
    val mdcUsed = dataTag == 18
    val plainAll = if (mdcUsed) {
      if (dataBody.length < 1 || dataBody(0) != 1) throw Malformed
      val cfb = new Cfb(keyAlgo, msgKey, resync = false)
      cfb.decrypt(java.util.Arrays.copyOfRange(dataBody, 1, dataBody.length))
    } else {
      val cfb = new Cfb(keyAlgo, msgKey, resync = true)
      cfb.decrypt(dataBody)
    }
    if (plainAll.length < bs + 2) throw Malformed
    // prefix quick check (prefix_init)
    if (plainAll(bs - 2) != plainAll(bs) || plainAll(bs - 1) != plainAll(bs + 1))
      throw Malformed
    var inner = java.util.Arrays.copyOfRange(plainAll, bs + 2, plainAll.length)
    if (mdcUsed) {
      if (inner.length < 22) throw Malformed
      val mdcAt = inner.length - 22
      if ((inner(mdcAt) & 0xff) != 0xd3 || (inner(mdcAt + 1) & 0xff) != 0x14)
        throw Malformed
      val md = MessageDigest.getInstance("SHA-1")
      md.update(plainAll, 0, plainAll.length - 20)
      if (!java.util.Arrays.equals(md.digest(),
          java.util.Arrays.copyOfRange(inner, mdcAt + 2, inner.length)))
        throw Malformed
      inner = java.util.Arrays.copyOfRange(inner, 0, mdcAt)
    }

    // inner packets: optional compression around the literal
    var compressSeen = 0
    var rr = new PacketReader(inner)
    var lit: Array[Byte] = null
    while (lit == null) {
      if (rr.atEnd) throw Malformed
      val (tag, body) = rr.next()
      tag match {
        case 8 =>
          if (body.isEmpty) throw Malformed
          compressSeen = body(0) & 0xff
          if (compressSeen != 1 && compressSeen != 2) throw Malformed
          rr = new PacketReader(inflate(
            java.util.Arrays.copyOfRange(body, 1, body.length), compressSeen))
        case 11 => lit = body
        case _ => throw Malformed
      }
    }

    // literal packet (parse_literal_data)
    if (lit.length < 6) throw Malformed
    val litType = (lit(0) & 0xff).toChar
    val nameLen = lit(1) & 0xff
    if (lit.length < 6 + nameLen) throw Malformed
    var out = java.util.Arrays.copyOfRange(lit, 6 + nameLen, lit.length)
    if (textMode && litType != 't' && litType != 'u') throw Malformed
    if (textMode && o.convertCrlf) out = crlfDecode(out)

    // expect-* regress checks
    o.expect.foreach { case (k, v) =>
      val actual = k match {
        case "cipher-algo" => keyAlgo
        case "disable-mdc" => if (mdcUsed) 0 else 1
        case "compress-algo" => compressSeen
        case "unicode-mode" => if (litType == 'u') 1 else 0
        case other => extraExpect.getOrElse(other, throw Malformed)
      }
      if (actual != v) throw Malformed
    }
    out
  }

  // ---- public-key machinery (pgp-pubkey.c, pgp-pubdec.c, pgp-pubenc.c)
  import java.math.BigInteger

  /** Parsed key material; `sec` is empty for public-only keys. MPI raw
    * bytes (2-byte bit-count header + body) are kept for the key-packet
    * checksums and the v4 fingerprint. */
  private[functions] final case class PubKey(algo: Int,
      keyId: Array[Byte], pub: Vector[BigInteger],
      sec: Vector[BigInteger]) {
    def canEncrypt: Boolean = algo == 1 || algo == 2 || algo == 16
  }

  private final class ByteCursor(val b: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= b.length) throw Malformed
      val x = b(pos) & 0xff; pos += 1; x
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > b.length) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n; out
    }
    def atEnd: Boolean = pos >= b.length
  }

  /** (value, raw header+body bytes) — pgp_mpi_read. */
  private def readMpi(c: ByteCursor): (BigInteger, Array[Byte]) = {
    val start = c.pos
    val bits = (c.u8() << 8) | c.u8()
    val body = c.take((bits + 7) / 8)
    (new BigInteger(1, body),
      java.util.Arrays.copyOfRange(c.b, start, c.pos))
  }

  private def writeMpi(out: ByteArrayOutputStream, v: BigInteger): Unit = {
    val bits = math.max(v.bitLength, 1)
    out.write(bits >> 8); out.write(bits & 0xff)
    val raw = v.toByteArray
    val body = if (raw.length > 1 && raw(0) == 0)
      java.util.Arrays.copyOfRange(raw, 1, raw.length) else raw
    // left-pad to the byte length the bit count implies (never needed
    // for positive minimal BigIntegers, but cheap to be exact)
    val need = (bits + 7) / 8
    (body.length until need).foreach(_ => out.write(0))
    out.write(body)
  }

  private def mpiCount(algo: Int, secret: Boolean): Int = algo match {
    case 1 | 2 | 3 => if (secret) 4 else 2 // rsa: n,e / d,p,q,u
    case 16 => if (secret) 1 else 3        // elgamal: p,g,y / x
    case 17 => if (secret) 1 else 4        // dsa: p,q,g,y / x
    case _ => throw Malformed
  }

  /** _pgp_read_public_key + calc_key_id: returns the parsed public
    * part and leaves the cursor after it. */
  private def readPublicPart(c: ByteCursor): PubKey = {
    val start = c.pos
    if (c.u8() != 4) throw Malformed // v4 keys only, as the reference
    c.take(4) // creation time
    val algo = c.u8()
    val mpis = Vector.fill(mpiCount(algo, secret = false))(readMpi(c))
    val bodyLen = c.pos - start
    val md = MessageDigest.getInstance("SHA-1")
    md.update(Array(0x99.toByte, (bodyLen >> 8).toByte, (bodyLen & 0xff).toByte))
    md.update(c.b, start, bodyLen)
    val fp = md.digest()
    PubKey(algo, java.util.Arrays.copyOfRange(fp, 12, 20),
      mpis.map(_._1), Vector.empty)
  }

  /** process_secret_key: public part, then the (possibly CFB-encrypted)
    * secret MPIs with their sha1/cksum trailer. */
  private def readSecretKeyPacket(body: Array[Byte],
                                  psw: Array[Byte]): PubKey = {
    val c = new ByteCursor(body)
    val pk = readPublicPart(c)
    val usage = c.u8()
    val secStream: ByteCursor = usage match {
      case 254 | 255 =>
        if (psw == null) throw Malformed // PXE_PGP_NEED_SECRET_PSW
        val cipherAlgo = c.u8()
        val mode = c.u8()
        val digest = c.u8()
        val salt = if (mode >= 1) c.take(8) else Array.empty[Byte]
        val iter = if (mode == 3) c.u8() else 0
        val key = s2k(mode, digest, salt, iter, psw, cipherKeyLen(cipherAlgo))
        val iv = c.take(cipherBlockLen(cipherAlgo))
        val cfb = new Cfb(cipherAlgo, key, resync = false, iv)
        new ByteCursor(cfb.decrypt(c.take(body.length - c.pos)))
      case 0 => c
      case _ => throw Malformed
    }
    val mpis = Vector.fill(mpiCount(pk.algo, secret = true))(readMpi(secStream))
    val rawAll = mpis.map(_._2).reduce(_ ++ _)
    if (usage == 254) {
      val got = secStream.take(20)
      val md = MessageDigest.getInstance("SHA-1")
      md.update(rawAll)
      if (!java.util.Arrays.equals(md.digest(), got)) throw Malformed
    } else {
      val got = (secStream.u8() << 8) | secStream.u8()
      val mine = rawAll.foldLeft(0)((a, b) => a + (b & 0xff)) & 0xffff
      if (got != mine) throw Malformed
    }
    pk.copy(sec = mpis.map(_._1))
  }

  /** internal_read_key: ONLY encryption subkeys are usable (the main
    * key packet is skipped), exactly one must be present. */
  private[functions] def parseKey(keyBytes: Array[Byte], psw: Array[Byte],
                                  wantSecret: Boolean): PubKey = {
    val r = new PacketReader(keyBytes)
    var encKey: PubKey = null
    var gotMain = false
    while (!r.atEnd) {
      val (tag, body) = r.next()
      tag match {
        case 5 | 6 => // main key: skipped, second one is an error
          if (gotMain) throw Malformed
          gotMain = true
        case 14 => // public subkey
          if (wantSecret) throw Malformed // expected secret key
          val pk = readPublicPart(new ByteCursor(body))
          if (pk.canEncrypt) {
            if (encKey != null) throw Malformed // multiple subkeys
            encKey = pk
          }
        case 7 => // secret subkey
          if (!wantSecret) throw Malformed // expected public key
          val pk = readSecretKeyPacket(body, psw)
          if (pk.canEncrypt) {
            if (encKey != null) throw Malformed
            encKey = pk
          }
        case 2 | 10 | 12 | 13 | 17 | 61 => // sig/marker/trust/uid/attr
        case _ => throw Malformed
      }
    }
    if (encKey == null) throw Malformed // no usable key
    encKey
  }

  /** check_eme_pkcs1_v15 + control_cksum: unwrap the padded session-key
    * message (leading 0x00 already dropped by MPI encoding). */
  private def unwrapSessionKey(m: BigInteger): (Int, Array[Byte]) = {
    val raw = m.toByteArray
    val data = if (raw.length > 1 && raw(0) == 0)
      java.util.Arrays.copyOfRange(raw, 1, raw.length) else raw
    if (data.length < 10 || data(0) != 2) throw Malformed
    var p = 1
    while (p < data.length && data(p) != 0) p += 1
    if (p >= data.length || p - 1 < 8) throw Malformed
    val msg = java.util.Arrays.copyOfRange(data, p + 1, data.length)
    if (msg.length < 3) throw Malformed
    val myCk = msg.slice(1, msg.length - 2)
      .foldLeft(0)((a, b) => a + (b & 0xff)) & 0xffff
    val gotCk = ((msg(msg.length - 2) & 0xff) << 8) | (msg(msg.length - 1) & 0xff)
    if (myCk != gotCk) throw Malformed
    (msg(0) & 0xff, java.util.Arrays.copyOfRange(msg, 1, msg.length - 2))
  }

  /** pgp_pub_decrypt[_bytea]: tag-1 session key via ElGamal/RSA, then
    * the shared data-packet tail. */
  def pubDecrypt(msg: Array[Byte], keyBytes: Array[Byte], psw: Array[Byte],
                 optStr: String, textMode: Boolean): Array[Byte] = {
    val o = parseOpts(optStr)
    val pk = parseKey(keyBytes, psw, wantSecret = true)
    val r = new PacketReader(msg)
    var keyAlgo = -1
    var sessKey: Array[Byte] = null
    var dataTag = -1
    var dataBody: Array[Byte] = null
    while (!r.atEnd && dataBody == null) {
      val (tag, body) = r.next()
      tag match {
        case 1 => // pubkey-encrypted session key
          val c = new ByteCursor(body)
          if (c.u8() != 3) throw Malformed
          val keyId = c.take(8)
          if (!keyId.forall(_ == 0) &&
              !java.util.Arrays.equals(keyId, pk.keyId)) throw Malformed
          val algo = c.u8()
          val m = algo match {
            case 16 =>
              if (pk.algo != 16) throw Malformed
              val (c1, _) = readMpi(c)
              val (c2, _) = readMpi(c)
              val Vector(p, _, _) = pk.pub
              val x = pk.sec(0)
              c2.multiply(c1.modPow(x, p).modInverse(p)).mod(p)
            case 1 | 2 =>
              if (pk.algo != 1 && pk.algo != 2) throw Malformed
              val (cc, _) = readMpi(c)
              cc.modPow(pk.sec(0), pk.pub(0)) // m = c^d mod n
            case _ => throw Malformed
          }
          val (sAlgo, sKey) = unwrapSessionKey(m)
          if (sKey.length != cipherKeyLen(sAlgo)) throw Malformed
          keyAlgo = sAlgo; sessKey = sKey
        case 9 | 18 =>
          if (sessKey == null) throw Malformed
          dataTag = tag; dataBody = body
        case 10 =>
        case _ => throw Malformed
      }
    }
    if (dataBody == null) throw Malformed
    decryptPayload(dataTag, dataBody, keyAlgo, sessKey, o, textMode,
      Map.empty)
  }

  /** pgp_pub_encrypt[_bytea]: EME-PKCS1-v1.5-padded session key under
    * RSA or ElGamal, then the shared tag-18 data packet. Randomness
    * from the seeded DRBG (divergence documented above). */
  def pubEncrypt(data: Array[Byte], keyBytes: Array[Byte], optStr: String,
                 textMode: Boolean, seed: Array[Byte]): Array[Byte] = {
    val o = parseOpts(optStr)
    val pk = parseKey(keyBytes, null, wantSecret = false)
    val rng = new Drbg(seed)
    val sessKey = rng.next(cipherKeyLen(o.cipherAlgo))
    // secret message: algo byte + key + 16-bit checksum
    val ck = sessKey.foldLeft(0)((a, b) => a + (b & 0xff)) & 0xffff
    val secMsg = Array(o.cipherAlgo.toByte) ++ sessKey ++
      Array((ck >> 8).toByte, (ck & 0xff).toByte)
    val modulus = pk.pub(0) // n for rsa, p for elgamal
    val resBytes = (modulus.bitLength + 7) / 8
    val padLen = resBytes - 1 - 2 - secMsg.length
    if (padLen < 8) throw Malformed
    val pad = new Array[Byte](padLen)
    var i = 0
    while (i < padLen) { // nonzero random filler
      val b = rng.next(1)(0)
      if (b != 0) { pad(i) = b; i += 1 }
    }
    val em = Array(2.toByte) ++ pad ++ Array(0.toByte) ++ secMsg
    val m = new BigInteger(1, em)
    val tag1 = new ByteArrayOutputStream()
    tag1.write(3); tag1.write(pk.keyId, 0, 8); tag1.write(pk.algo)
    pk.algo match {
      case 1 | 2 =>
        val Vector(n, e) = pk.pub
        writeMpi(tag1, m.modPow(e, n))
      case 16 =>
        val Vector(p, g, y) = pk.pub
        // random k in [1, p-2]; DRBG-derived (see determinism note)
        val k = new BigInteger(1, rng.next(resBytes))
          .mod(p.subtract(BigInteger.TWO)).add(BigInteger.ONE)
        writeMpi(tag1, g.modPow(k, p))
        writeMpi(tag1, m.multiply(y.modPow(k, p)).mod(p))
      case _ => throw Malformed
    }
    val inner = literalPacket(data, o, textMode)
    packet(1, tag1.toByteArray) ++
      encryptedDataPacket(inner, o.cipherAlgo, sessKey, o.disableMdc, rng)
  }

  /** text-mode convert-crlf on encrypt: \n -> \r\n. */
  private[functions] def crlfEncode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    data.foreach { b =>
      if (b == '\n') out.write('\r')
      out.write(b)
    }
    out.toByteArray
  }

  /** copy_crlf on decrypt: \r\n -> \n (lone \r preserved). */
  private[functions] def crlfDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length)
    var i = 0
    while (i < data.length) {
      if (data(i) == '\r' && i + 1 < data.length && data(i + 1) == '\n') ()
      else out.write(data(i))
      i += 1
    }
    // trailing lone \r is preserved by copy_crlf's got_cr flush
    out.toByteArray
  }

  /** Derives all encryption randomness (S2K salt, session key, CFB
    * prefix, ElGamal k) when no explicit seed is given. SECURITY NOTE:
    * the default is SHA-1(data || key) — deterministic by design for
    * task-retry/parity, which means equal inputs yield equal ciphertext
    * and (on the public-key path, where `key` is the PUBLIC key) anyone
    * holding the ciphertext can offline-confirm guessed plaintexts.
    * NOT pgcrypto-equivalent confidentiality. Deployments that need
    * semantic security must set `spark.graft.pgp.seedSalt` to a secret
    * value — it is mixed into the seed here (still deterministic per
    * (salt, data, key), preserving retry-safety, but no longer
    * confirmable without the salt). */
  def defaultSeed(data: Array[Byte], pw: Array[Byte],
                  salt: String): Array[Byte] = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(data); md.update(pw)
    if (salt.nonEmpty) md.update(salt.getBytes("UTF-8"))
    md.update("graft-pgp-default-seed".getBytes("UTF-8"))
    md.digest()
  }

  /** Convenience overload for driver-side callers (tests, ad-hoc):
    * resolves the salt from the CURRENT thread's SQLConf. The encrypt
    * expressions do NOT use this — they capture the salt once at
    * construction (analysis, driver-side) via [[resolveSeedSalt]] and
    * close over it, so an executor with no propagated conf can never
    * silently degrade a salted deployment to the plaintext-confirmable
    * unsalted seed (r13 ADVICE). */
  def defaultSeed(data: Array[Byte], pw: Array[Byte]): Array[Byte] =
    defaultSeed(data, pw, resolveSeedSalt())

  /** `spark.graft.pgp.seedSalt` from the active SQLConf — deliberately
    * NO exception swallowing: a deployment that set the salt for
    * semantic security must fail loudly if the lookup is impossible,
    * not fall back to the unsalted seed. Called driver-side (expression
    * construction / analysis), where SQLConf.get is always available. */
  def resolveSeedSalt(): String =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.pgp.seedSalt", "")
}

object PgpSymFns {
  /** Session-idempotent registration (the CryptFns pattern). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        reg.createOrReplaceTempFunction(name, builder, "built-in")
      }
    import org.apache.spark.sql.catalyst.expressions.Literal
    def emptyStr: Expression = Literal(UTF8String.fromString(""), StringType)
    def third(e: Seq[Expression]): Expression =
      if (e.length >= 3) e(2) else emptyStr
    add("pgp_sym_encrypt",
      e => PgpSymEncrypt(e(0), e(1), third(e), textMode = true))
    add("pgp_sym_encrypt_bytea",
      e => PgpSymEncrypt(e(0), e(1), third(e), textMode = false))
    add("pgp_sym_decrypt",
      e => PgpSymDecrypt(e(0), e(1), third(e), textMode = true))
    add("pgp_sym_decrypt_bytea",
      e => PgpSymDecrypt(e(0), e(1), third(e), textMode = false))
    // public-key variants: (data, key[, opts]) / (msg, key[, psw[, opts]])
    add("pgp_pub_encrypt",
      e => PgpPubEncrypt(e(0), e(1), third(e), textMode = true))
    add("pgp_pub_encrypt_bytea",
      e => PgpPubEncrypt(e(0), e(1), third(e), textMode = false))
    add("pgp_pub_decrypt", e => PgpPubDecrypt(e(0), e(1),
      if (e.length >= 3) Some(e(2)) else None,
      if (e.length >= 4) e(3) else emptyStr, textMode = true))
    add("pgp_pub_decrypt_bytea", e => PgpPubDecrypt(e(0), e(1),
      if (e.length >= 3) Some(e(2)) else None,
      if (e.length >= 4) e(3) else emptyStr, textMode = false))
  }
}

/** `pgp_pub_encrypt[_bytea](data, pubkey[, options])` → bytea message
  * (pgp-pubenc.c): EME-PKCS1-v1.5 session key under the key's
  * encryption SUBKEY (RSA or ElGamal, exactly as the reference — the
  * primary key is never used), then the standard tag-18 data packet.
  * Seeded-DRBG determinism divergence as [[PgpKernel]] documents. */
case class PgpPubEncrypt(first: Expression, second: Expression,
                         third: Expression, textMode: Boolean)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType | BinaryType, BinaryType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string|binary, binary, string), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (textMode) "pgp_pub_encrypt" else "pgp_pub_encrypt_bytea"

  // Resolved once at construction (analysis, DRIVER-side) and serialized
  // with the expression: executors never re-read the conf, so a salted
  // deployment cannot silently degrade to the unsalted seed (r13 ADVICE).
  private val seedSalt: String = PgpKernel.resolveSeedSalt()

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(dataAny: Any, key: Array[Byte], optS: UTF8String): Array[Byte] = {
    val data = dataAny match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    try PgpKernel.pubEncrypt(data, key, optS.toString, textMode,
      PgpKernel.defaultSeed(data, key, seedSalt))
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    kernel(a, b.asInstanceOf[Array[Byte]], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("pgpPubEnc", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = $refName.kernel($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** `pgp_pub_decrypt[_bytea](msg, seckey[, psw[, options]])`
  * (pgp-pubdec.c): session key from the tag-1 packet via ElGamal or
  * RSA under the secret encryption subkey (S2K-encrypted secret MPIs
  * unlocked with `psw`), then the shared payload tail. Wrong key /
  * missing password / corrupt data → SQL NULL. */
case class PgpPubDecrypt(first: Expression, second: Expression,
                         pswOpt: Option[Expression], fourth: Expression,
                         textMode: Boolean)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // CodegenFallback is deliberate here (the documented trap considered):
  // the per-row work is one RSA/ElGamal modPow — milliseconds that dwarf
  // any interpreted-dispatch overhead, unlike the HOF kernels the
  // SCALING.md note is about.
  override def children: Seq[Expression] =
    Seq(first, second) ++ pswOpt.toSeq :+ fourth
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType,
      pswOpt.map(_.dataType).getOrElse(StringType), fourth.dataType) match {
      case (BinaryType, BinaryType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary[, string[, string]]), got $other")
    }
  override def dataType: DataType = if (textMode) StringType else BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (textMode) "pgp_pub_decrypt" else "pgp_pub_decrypt_bytea"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(msg: Array[Byte], key: Array[Byte], psw: UTF8String,
             optS: UTF8String): Any = {
    try {
      val out = PgpKernel.pubDecrypt(msg, key,
        if (psw == null) null else psw.getBytes, optS.toString, textMode)
      if (textMode) UTF8String.fromBytes(out) else out
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  override def eval(input: InternalRow): Any = {
    val m = first.eval(input)
    val k = second.eval(input)
    val o = fourth.eval(input)
    if (m == null || k == null || o == null) return null
    val p = pswOpt.map(_.eval(input)).orNull // absent OR SQL null -> no psw
    kernel(m.asInstanceOf[Array[Byte]], k.asInstanceOf[Array[Byte]],
      p.asInstanceOf[UTF8String], o.asInstanceOf[UTF8String])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    if (pswOpt.isDefined)
      copy(first = newChildren(0), second = newChildren(1),
        pswOpt = Some(newChildren(2)), fourth = newChildren(3))
    else
      copy(first = newChildren(0), second = newChildren(1),
        fourth = newChildren(2))
}

/** `pgp_sym_encrypt[_bytea](data, psw[, options])` → bytea message.
  * Deterministic-DRBG divergence documented on [[PgpKernel]]; pass
  * option `seed=<text>` is NOT supported — the seed derives from
  * (data, psw), so equal inputs give equal ciphertext. */
case class PgpSymEncrypt(first: Expression, second: Expression,
                         third: Expression, textMode: Boolean)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType | BinaryType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string|binary, string, string), got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (textMode) "pgp_sym_encrypt" else "pgp_sym_encrypt_bytea"

  // Driver-side capture — see PgpPubEncrypt.seedSalt.
  private val seedSalt: String = PgpKernel.resolveSeedSalt()

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(dataAny: Any, pwS: UTF8String, optS: UTF8String): Array[Byte] = {
    val data = dataAny match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val pw = pwS.getBytes
    try PgpKernel.encrypt(data, pw, optS.toString, textMode,
      PgpKernel.defaultSeed(data, pw, seedSalt))
    catch { case scala.util.control.NonFatal(_) => null }
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    kernel(a, b.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("pgpEnc", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = $refName.kernel($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}

/** `pgp_sym_decrypt[_bytea](msg, psw[, options])`; wrong key / corrupt
  * data / binary-into-text → SQL NULL (documented divergence). */
case class PgpSymDecrypt(first: Expression, second: Expression,
                         third: Expression, textMode: Boolean)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string, string), got $other")
    }
  override def dataType: DataType = if (textMode) StringType else BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (textMode) "pgp_sym_decrypt" else "pgp_sym_decrypt_bytea"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(msg: Array[Byte], pwS: UTF8String, optS: UTF8String): Any = {
    try {
      val out = PgpKernel.decrypt(msg, pwS.getBytes, optS.toString, textMode)
      if (textMode) UTF8String.fromBytes(out) else out
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    kernel(a.asInstanceOf[Array[Byte]], b.asInstanceOf[UTF8String],
      c.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("pgpDec", this, getClass.getName)
    val judt = if (textMode) "UTF8String" else "byte[]"
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
      ${ev.value} = ($judt) $refName.kernel($a, $b, $c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression): Expression =
    copy(first = a, second = b, third = c)
}
