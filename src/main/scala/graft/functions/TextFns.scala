package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint (Rabin-Karp family) as a
  * native codegen expression.
  *
  * Semantically identical to the higher-order-function chain
  * `aggregate(split(text,' '), 0L, (acc,w) -> (acc*131 +
  * aggregate(split(w,''), 0L, (a,c) -> (a*31 + ascii(c)) % 1e9+7)) %
  * 1e9+7)` — the per-word hash folds code points left-to-right, the
  * document folds word hashes, both mod 1e9+7 — but the HOF route is
  * CodegenFallback and allocates two array splits plus boxed lambda rows
  * PER WORD; this expression is one pass over the string's code points
  * with zero allocation (the same hot-kernel move as
  * [[DotProduct]]/`vec_dot`). Word-boundary semantics replicate
  * `split(text, ' ')` exactly: every single space ends a word, so
  * consecutive/leading/trailing spaces contribute empty words (hash 0),
  * and the final word is always folded. `TextFnsSpec` asserts equality
  * against the HOF chain over the whole corpus.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(a: Any): Any = {
    val str = a.asInstanceOf[UTF8String].toString
    val M = 1000000007L
    var acc = 0L
    var w = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp == ' ') { acc = (acc * 131L + w) % M; w = 0L }
      else w = (w * 31L + cp) % M
      i += Character.charCount(cp)
    }
    (acc * 131L + w) % M
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cp = ctx.freshName("cp")
      s"""
         |String $str = $a.toString();
         |long $acc = 0L; long $w = 0L;
         |int $i = 0; int $n = $str.length();
         |while ($i < $n) {
         |  int $cp = $str.codePointAt($i);
         |  if ($cp == 32) { $acc = ($acc * 131L + $w) % 1000000007L; $w = 0L; }
         |  else { $w = ($w * 31L + (long) $cp) % 1000000007L; }
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = ($acc * 131L + $w) % 1000000007L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunk boundaries (`cdc_bounds(text)` -> array<int>):
  * the word indexes i (1-based, 4 <= i < #words) where the 4-word rolling
  * hash is divisible by 8 — the boundary rule of `d_chunk_cdc`
  * (FastCDC/rsync family). Word hashes fold code points exactly like
  * [[RollingFingerprint]] ((a*31 + cp) mod 1e9+7, `split(text,' ')`
  * word-boundary semantics incl. empty words); the window folds the last
  * four word hashes with powers of 131 mod 1e9+7. One zero-allocation
  * pass with a 4-slot ring buffer — the HOF formulation
  * (transform/aggregate over split arrays) is CodegenFallback and was
  * measured ~60 s per bench run at sf0.1; this kernel replaces it, and
  * TextFnsSpec proves bit-equality against the HOF chain corpus-wide.
  * Codegen follows the PqFns pattern: one reference object + one virtual
  * call per row, the loop itself JIT-compiled Scala. */
case class CdcBounds(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val M = 1000000007L
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ring = new Array[Long](4)
    var words = 0
    var w = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp == ' ') {
        ring(words % 4) = w; words += 1; w = 0L
        if (words >= 4) {
          val h = (ring((words - 4) % 4) * 2248091L +
            ring((words - 3) % 4) * 17161L +
            ring((words - 2) % 4) * 131L + ring((words - 1) % 4)) % M
          if (h % 8 == 0) out += words
        }
      } else w = (w * 31L + cp) % M
      i += Character.charCount(cp)
    }
    // final word: may close a window but can never be a boundary (i < n)
    words += 1
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cdcBounds", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFns {
  /** Register `rolling_fp` + `cdc_bounds` for SQL + `expr(...)` use.
    * Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_fp"))) {
      reg.createOrReplaceTempFunction(
        "rolling_fp", exprs => RollingFingerprint(exprs.head), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_bounds"))) {
      reg.createOrReplaceTempFunction(
        "cdc_bounds", exprs => CdcBounds(exprs.head), "built-in")
    }
  }
}
