package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** One-pass, map-side near-dup SIGNATURE kernels.
  *
  * The DataFrame formulations these replace computed signatures with a
  * corpus-sized SHUFFLE: explode words/shingles, then groupBy(doc_id)
  * with 16-48 aggregates. Both signatures are pure per-document
  * functions, so the shuffle bought nothing — these expressions fold the
  * document's bytes in a single pass inside whole-stage codegen and the
  * signature stage becomes embarrassingly parallel (at 100 TB that
  * removes the largest exchange in the dedup pipeline; banding and
  * verification keep their own narrow shuffles).
  *
  * Bit-compatibility is load-bearing and spec-proven (`SigFnsSpec`
  * asserts corpus-wide equality against the DataFrame formulas):
  *
  *  - [[Minhash16]]: shingle k spans words k..k+2; because `split` cuts
  *    on EVERY single space, `concat_ws(' ', w[k], w[k+1], w[k+2])` is
  *    byte-identical to the original text span from the start of word k
  *    to the end of word k+2 — so shingles hash ZERO-COPY from the
  *    document's own bytes. Hashes call Spark's own `XXH64` statics
  *    (`xxhash64(sh)` = hashUnsafeBytes(seed 42); the 16 permutations =
  *    hashLong(h64, hashInt(i, 42)) — the exact fold `xxhash64(lit(i),
  *    h64)` performs). Documents with < 3 words have no shingles and
  *    yield an empty array (the pipeline's eligibility filter).
  *  - [[Simhash48]]: per word, the 48-bit value is the first 6 bytes of
  *    the word's md5 (== `conv(substring(md5(w),1,12),16,10)`,
  *    big-endian), folded into 48 signed counts; bit j of the signature
  *    is set iff count(j) >= 0. Empty words (consecutive/leading/
  *    trailing spaces) hash md5("") exactly like the explode did.
  */
object SigKernels {
  /** Per-thread MD5 instance, shared with the TextFns chunk kernels
    * (CdcChunkDigests/WordGridChunks previously constructed a fresh
    * MessageDigest per ROW — an avoidable allocation in exactly the
    * per-document hot paths the kernels exist to make cheap). */
  private[functions] val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** hashInt(i, 42) for the 16 minhash permutation seeds, precomputed. */
  private val seedHash: Array[Long] =
    Array.tabulate(16)(i => XXH64.hashInt(i, 42L))

  def minhash16(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // word start positions (a word starts at 0 and after every space)
    var nWords = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < 3) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](nWords)
    var w = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    val mins = Array.fill(16)(Long.MaxValue)
    var k = 0
    while (k <= nWords - 3) {
      val start = starts(k)
      // end of word k+2: next start minus the separating space, or EOS
      val end = if (k + 3 < nWords) starts(k + 3) - 1 else n
      val h64 = XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, end - start, 42L)
      var j = 0
      while (j < 16) {
        val h = XXH64.hashLong(h64, seedHash(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      k += 1
    }
    new GenericArrayData(mins)
  }

  /** Every sliding k-word window's (1-based start, md5 digest) in ONE
    * native pass — the ExactSubstr window stage. Bit-compatible with the
    * HOF formulation it replaces (`transform(sequence(1, size(w)-k+1),
    * i -> struct(i, unhex(md5(concat_ws(' ', slice(w, i, k))))))` over
    * `w = split(text, ' ')`): because `split` cuts on EVERY single
    * space, the k-word join is byte-identical to the original text span
    * from the start of word i to the end of word i+k-1 (the Minhash16
    * zero-copy argument), and `unhex(md5(...))` is the raw 16-byte
    * digest of exactly those bytes. Documents with < k words yield an
    * empty array (explode then drops the row, matching the old
    * `size(w) >= k` pre-filter). The HOF chain evaluated interpreted
    * per WINDOW — a slice copy, a concat_ws allocation, a hex render
    * and a re-parse per element (measured 615 s CPU for one x10 map
    * stage, ~61 µs/window); this kernel pays one digest per window
    * (~0.3 µs) inside whole-stage codegen. */
  def md5Windows(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var nWords = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < k) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(nWords) = n + 1 // sentinel: "start" of the one-past-last word
    val md = mdPool.get()
    val out = new Array[Any](nWords - k + 1)
    var j = 0
    while (j <= nWords - k) {
      val from = starts(j)
      // end of word j+k-1: the next word's start minus the separator
      val until = starts(j + k) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](j + 1, md.digest()))
      j += 1
    }
    new GenericArrayData(out)
  }

  def simhash48(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = mdPool.get()
    val counts = new Array[Int](48)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val dig = md.digest()
        var h = 0L
        var b = 0
        while (b < 6) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 48) {
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 48) { if (counts(j) >= 0) sig |= (1L << j); j += 1 }
    sig
  }
}

case class Minhash16(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash16"

  override def nullSafeEval(a: Any): Any =
    SigKernels.minhash16(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.minhash16($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class Simhash48(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override def nullSafeEval(a: Any): Any =
    SigKernels.simhash48(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.simhash48($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (1-based word start, 16-byte md5) of every sliding k-word window —
  * see [[SigKernels.md5Windows]] for the bit-compatibility contract. */
case class Md5Windows(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"window size must be positive, got $k")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("dg", BinaryType, nullable = false))), containsNull = false)
  override def prettyName: String = "md5_windows"

  override def nullSafeEval(a: Any): Any =
    SigKernels.md5Windows(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigKernels.md5Windows($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SigFns {
  /** Register `minhash16` / `simhash48` / `md5_windows` for SQL + expr
    * use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("minhash16"))) {
      reg.createOrReplaceTempFunction(
        "minhash16", exprs => Minhash16(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "simhash48", exprs => Simhash48(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "md5_windows", exprs => {
          // plan-time arity/foldability guard: a non-literal k would
          // otherwise eval() against no input row with an opaque error
          require(exprs.length == 2,
            s"md5_windows(text, k) takes exactly 2 arguments, got ${exprs.length}")
          require(exprs(1).foldable,
            "md5_windows: window size k must be a literal")
          Md5Windows(exprs.head, exprs(1).eval().asInstanceOf[Int])
        }, "built-in")
    }
  }
}
