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
  def kernel(s: UTF8String): GenericArrayData =
    new GenericArrayData(CdcBounds.bounds(s))

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cdcBounds", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBounds {
  /** The boundary scan shared by [[CdcBounds]] and [[CdcChunkDigests]]
    * (one definition, so the two can't drift): 1-based word indexes i
    * (4 <= i < #words) where the 4-word rolling hash divides by 8. */
  def bounds(s: UTF8String): Array[Int] = {
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
    out.toArray
  }
}

/** md5 digests of every content-defined chunk
  * (`cdc_chunk_digests(text)` -> array<binary>, one 16-byte digest per
  * chunk, in document order): the digest-only view of the chunk
  * decomposition `zip_with(concat(array(1), transform(bpos, x -> x+1)),
  * concat(bpos, array(n)), (s1, e1) -> concat_ws(' ', slice(w, s1,
  * e1-s1+1)))` with `unhex(md5(...))` per element. Bit-compatible by the
  * zero-copy span argument ([[graft.functions.SigKernels.md5Windows]]):
  * `split` cuts on every single space, so the joined word span s..e is
  * byte-identical to the original text from the start of word s to the
  * end of word e, and the chunk's md5 digests exactly those bytes. The
  * HOF assembly evaluated interpreted per chunk AND was re-evaluated by
  * the explode's inferred size()>0 filter after pushdown (measured 285 s
  * executor-CPU for the x10 map stage — the suite's largest after the
  * ExactSubstr fix); this kernel runs the boundary scan once and one
  * in-place digest per chunk under whole-stage codegen. A document
  * always yields >= 1 chunk (zero boundaries -> the whole text, the
  * empty string included), exactly like the HOF form. */
case class CdcChunkDigests(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "cdc_chunk_digests"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(s: UTF8String): GenericArrayData = {
    val cuts = CdcBounds.bounds(s)
    val bytes = s.getBytes
    val n = bytes.length
    // byte start of every 1-based word (space = 0x20 never occurs inside
    // a UTF-8 multibyte sequence, so the byte scan finds exactly the
    // code-point word boundaries the hash scan used)
    var nWords = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(nWords) = n + 1 // sentinel: "start" of the one-past-last word
    val md = SigKernels.mdPool.get()
    val out = new Array[Any](cuts.length + 1)
    var k = 0
    var sw = 1 // chunk's first word (1-based)
    while (k <= cuts.length) {
      val ew = if (k < cuts.length) cuts(k) else nWords // chunk's last word
      val from = starts(sw - 1)
      val until = starts(ew) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(k) = md.digest()
      sw = ew + 1
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cdcChunkDigests", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Non-overlapping c-word grid chunks with their md5 digests
  * (`word_grid_chunks(text, c)` -> array<struct<idx:int, chunk:string,
  * dg:binary>>): the fused form of `posexplode(transform(sequence(0,
  * (size(w)-1) div c), i -> concat_ws(' ', slice(w, i*c+1, c))))` +
  * `unhex(md5(chunk))` — idx is the 0-based grid position, chunk the
  * joined word span (byte-identical to the original text span, the
  * zero-copy argument), dg its 16-byte digest. The HOF chain evaluated
  * interpreted per chunk (slice copy + concat_ws + hex md5); this kernel
  * is one pass per document under whole-stage codegen. A document always
  * yields >= 1 chunk (empty text included), like sequence(0, 0). */
case class WordGridChunks(child: Expression, c: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  require(c >= 1, s"chunk size must be positive, got $c")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false),
    StructField("dg", BinaryType, nullable = false))), containsNull = false)
  override def prettyName: String = "word_grid_chunks"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var nWords = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords + 1)
    var w = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(nWords) = n + 1
    val md = SigKernels.mdPool.get()
    val nChunks = (nWords - 1) / c + 1
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val from = starts(k * c)
      val until = starts(math.min((k + 1) * c, nWords)) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(k) = new GenericInternalRow(Array[Any](k,
        UTF8String.fromBytes(bytes, from, until - from), md.digest()))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("wordGridChunks", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Longest run of consecutive identical words (`word_max_run(text)` ->
  * int): the fused form of the posexplode + lag()-window + run-id-cumsum
  * + two-groupBy chain — a pure per-document function that needed a
  * corpus-wide (doc_id, pos) sort shuffle in the window formulation; the
  * kernel is one byte pass comparing adjacent word spans (split-on-
  * every-space word semantics, empty words compare equal like the
  * explode did). A document always has >= 1 word, so the result is
  * >= 1. */
case class WordMaxRun(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_max_run"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var best = 1
    var run = 1
    var prevFrom = 0
    var prevUntil = -1 // previous word's [from, until); -1 = none yet
    var from = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (prevUntil >= 0) {
          val len = i - from
          var eq = len == prevUntil - prevFrom
          var k = 0
          while (eq && k < len) {
            if (bytes(from + k) != bytes(prevFrom + k)) eq = false
            k += 1
          }
          run = if (eq) run + 1 else 1
          if (run > best) best = run
        }
        prevFrom = from; prevUntil = i
        from = i + 1
      }
      i += 1
    }
    best
  }

  override def nullSafeEval(a: Any): Any = kernel(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("wordMaxRun", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Ordered chunk reassembly (`chunk_assemble(arr)` -> string) for
  * `array<struct<idx:int, chunk:string>>`: the fused form of
  * `concat_ws(' ', transform(array_sort(arr), x -> x.chunk))` — sort by
  * the struct order (idx, then chunk bytes — array_sort's field-by-field
  * struct comparator; idx is unique per document so the tie branch is
  * formal), then join the chunk strings with a single space via the SAME
  * `UTF8String.concatWs` the builtin uses. The replaced chain evaluated
  * the sort comparator and the `x -> x.chunk` projection as interpreted
  * lambdas per element in the FINAL aggregate of d_boilerplate_strip
  * (r20 LaneProfile: ~1.0 s executor-CPU at the x10 probe, plus the
  * comparator share of the partial stage); this kernel is one native
  * pass per group. Null elements do not occur (collect_list never emits
  * them); an empty array yields the empty string exactly like
  * concat_ws over no children. */
case class ChunkAssemble(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(a, b)), _)
        if a.dataType == IntegerType && b.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<int, string>>, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "chunk_assemble"

  /** The per-group kernel (public: codegen calls it via reference obj). */
  def kernel(arr: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val idxs = new Array[Int](n)
    val chunks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val r = arr.getStruct(i, 2)
      idxs(i) = r.getInt(0)
      chunks(i) = r.getUTF8String(1)
      i += 1
    }
    val order = new Array[Integer](n)
    i = 0
    while (i < n) { order(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(order, (x: Integer, y: Integer) => {
      val c = Integer.compare(idxs(x), idxs(y))
      if (c != 0) c else chunks(x).compareTo(chunks(y))
    })
    val sorted = new Array[UTF8String](n)
    i = 0
    while (i < n) { sorted(i) = chunks(order(i)); i += 1 }
    UTF8String.concatWs(ChunkAssemble.Space, sorted: _*)
  }

  override def nullSafeEval(a: Any): Any =
    kernel(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("chunkAssemble", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkAssemble {
  private val Space = UTF8String.fromString(" ")
}

/** Intersection cardinality of two ELEMENT-DISTINCT string arrays
  * (`tok_inter(a, b)` -> int) — the fused form of
  * `size(array_intersect(a, b))` for inputs that are already distinct
  * (both q_hybrid_rrf legs pass `array_distinct(split(text, ' '))`
  * token sets). The builtin chain builds a hash set AND materializes the
  * intersection array, and its q_hybrid_rrf usage paired it with
  * `size(array_union(a, b))` (a second set + a second array) per scored
  * pair — 5.4 s executor-CPU at the x10 probe, the lane's whole cost.
  * This kernel builds one set over the smaller array and counts
  * membership of the larger — no output arrays. Distinctness of BOTH
  * inputs is a correctness precondition (a duplicated element in the
  * scanned array would double-count); membership equality is UTF8String
  * binary equality, exactly the builtin's. A null element counts iff
  * present in both, like array_intersect. */
case class TokenIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "tok_inter"

  /** The per-pair kernel (public: codegen calls it via reference obj). */
  def kernel(l: org.apache.spark.sql.catalyst.util.ArrayData,
             r: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val (small, large) = if (l.numElements() <= r.numElements()) (l, r) else (r, l)
    val ns = small.numElements()
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    val nl = large.numElements()
    var c = 0
    i = 0
    while (i < nl) { if (set.contains(large.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    kernel(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
           b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("tokenIntersect", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $refName.kernel($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextFns {
  /** Register `rolling_fp` + `cdc_bounds` + `cdc_chunk_digests` for SQL
    * + `expr(...)` use. Idempotent. */
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
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cdc_chunk_digests"))) {
      reg.createOrReplaceTempFunction(
        "cdc_chunk_digests", exprs => CdcChunkDigests(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "word_grid_chunks", exprs => {
          // plan-time arity/foldability guard: a non-literal c would
          // otherwise eval() against no input row with an opaque error
          require(exprs.length == 2,
            s"word_grid_chunks(text, c) takes exactly 2 arguments, got ${exprs.length}")
          require(exprs(1).foldable,
            "word_grid_chunks: chunk size c must be a literal")
          WordGridChunks(exprs.head, exprs(1).eval().asInstanceOf[Int])
        }, "built-in")
      reg.createOrReplaceTempFunction(
        "word_max_run", exprs => WordMaxRun(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "chunk_assemble", exprs => ChunkAssemble(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "tok_inter", exprs => TokenIntersect(exprs.head, exprs(1)), "built-in")
    }
  }
}
