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

object CryptFns {
  /** Register `crypt_md5` for SQL + `expr(...)` use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("crypt_md5"))) {
      reg.createOrReplaceTempFunction(
        "crypt_md5", exprs => CryptMd5(exprs(0), exprs(1)), "built-in")
    }
  }
}
