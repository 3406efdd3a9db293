package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** contrib/hstore text format — parse and render
  * (`/root/reference/contrib/hstore/hstore_io.c`: `parse_hstore` +
  * `get_val` state machines for input, `hstore_out` for output; regress
  * `contrib/hstore/sql/hstore.sql`).
  *
  * The Spark carrier type for an hstore is a plain
  * `MapType(String, String, valueContainsNull = true)` — every hstore
  * OPERATOR (`->`, `?`, `?&`, `?|`, `@>`, `||`, `-`, `each`, `akeys`,
  * `avals`, `slice`) is then a stock codegen'd map/higher-order-function
  * composition (see `queries/HstoreOps.scala`); only the text format
  * itself needs kernels, because the grammar (optionally-quoted words,
  * backslash escapes both inside and outside quotes, `=>` separators,
  * the unquoted-NULL keyword) is a character state machine, not an
  * expression.
  *
  * Canonical order: the reference stores pairs sorted by (key length,
  * key bytes) — `comparePairs` — and renders in that order, so
  * [[HstoreParse]] emits its map entries in exactly that order (making
  * `map_keys` = `akeys()` for free) and [[HstoreRender]] re-sorts its
  * input, so maps built by other means (`map()`, `map_filter`,
  * `map_concat`) also render canonically. `hstore_out` always
  * double-quotes keys and values (escaping `"` and `\`) and renders
  * SQL nulls as the bare keyword `NULL`.
  *
  * Two pinned choices where the reference is looser:
  *  - duplicate keys in input are "unspecified which survives" in the
  *    reference (unstable qsort + keep-first); we pin LAST-wins, the
  *    usual map-update reading.
  *  - a syntax error is a per-row ERROR in the reference; a per-row
  *    error is operationally wrong on a 1000-executor scan (the
  *    Metaphone precedent), so malformed input yields SQL NULL.
  */
object HstoreKernel {

  /** (key length, unsigned key bytes) — hstore_io.c `comparePairs`. */
  private[functions] def canonicalLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    if (a.length != b.length) return a.length < b.length
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def keyBytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** Canonically sorted, last-wins-deduped pairs. */
  def canonicalize(pairs: Seq[(String, String)]): Seq[(String, String)] = {
    // last occurrence wins, then sort by (len, bytes)
    val lastWins = scala.collection.mutable.LinkedHashMap[String, String]()
    pairs.foreach { case (k, v) => lastWins(k) = v }
    lastWins.toSeq.sortWith((a, b) => canonicalLt(keyBytes(a._1), keyBytes(b._1)))
  }

  /** parse_hstore + get_val ported as one scanner. Returns null on the
    * grammar errors the reference ereports (see scaladoc). */
  def parse(input: String): Seq[(String, String)] = {
    val n = input.length
    var i = 0
    val out = ArrayBuffer.empty[(String, String)]

    // get_val: one optionally-quoted, backslash-escaped word.
    // Returns (word, escapedFlag, nextIndex) or null for end-of-input
    // (legal before a key, an error before a value), throws Malformed
    // on unterminated quotes/escapes.
    def getVal(start: Int, ignoreEq: Boolean): (String, Boolean, Int) = {
      val sb = new java.lang.StringBuilder
      var j = start
      // GV_WAITVAL
      while (j < n && Character.isWhitespace(input.charAt(j))) j += 1
      if (j >= n) return null
      val c0 = input.charAt(j)
      if (c0 == '"') { // GV_INESCVAL
        j += 1
        while (true) {
          if (j >= n) throw Malformed
          val c = input.charAt(j)
          if (c == '\\') {
            if (j + 1 >= n) throw Malformed
            sb.append(input.charAt(j + 1)); j += 2
          } else if (c == '"') return (sb.toString, true, j + 1)
          else { sb.append(c); j += 1 }
        }
        null // unreachable
      } else {
        if (c0 == '=' && !ignoreEq) throw Malformed
        // GV_WAITVAL consumes the first non-space char unconditionally
        // (so ',' or an ignoreeq '=' can START a word) — only then do
        // the GV_INVAL delimiter rules apply.
        if (c0 == '\\') {
          if (j + 1 >= n) throw Malformed
          sb.append(input.charAt(j + 1)); j += 2
        } else { sb.append(c0); j += 1 }
        while (j < n) {
          val c = input.charAt(j)
          if (c == '\\') {
            if (j + 1 >= n) throw Malformed
            sb.append(input.charAt(j + 1)); j += 2
          } else if ((c == '=' && !ignoreEq) || (c == ',' && ignoreEq)) {
            return (sb.toString, false, j) // ptr-- : delimiter not consumed
          } else if (Character.isWhitespace(c)) {
            return (sb.toString, false, j + 1)
          } else { sb.append(c); j += 1 }
        }
        (sb.toString, false, j)
      }
    }

    try {
      while (true) {
        // WKEY
        val kv = getVal(i, ignoreEq = false)
        if (kv == null) return canonicalize(out.toSeq)
        val (key, _, afterKey) = kv
        i = afterKey
        // WEQ: skip whitespace to '='
        while (i < n && Character.isWhitespace(input.charAt(i))) i += 1
        if (i >= n || input.charAt(i) != '=') throw Malformed
        i += 1
        // WGT: '>' must follow immediately
        if (i >= n || input.charAt(i) != '>') throw Malformed
        i += 1
        // WVAL
        val vv = getVal(i, ignoreEq = true)
        if (vv == null) throw Malformed
        val (value, escaped, afterVal) = vv
        i = afterVal
        out += ((key,
          if (!escaped && value.length == 4 && value.equalsIgnoreCase("null"))
            null
          else value))
        // WDEL: skip whitespace; ',' continues, end returns
        while (i < n && Character.isWhitespace(input.charAt(i))) i += 1
        if (i >= n) return canonicalize(out.toSeq)
        if (input.charAt(i) != ',') throw Malformed
        i += 1
      }
      null // unreachable
    } catch {
      case Malformed => null
    }
  }

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** hstore_out: always-quoted keys/values with `"`/`\` escaped, bare
    * NULL keyword for SQL nulls, `, ` separator, canonical order. */
  def render(pairs: Seq[(String, String)]): String = {
    val sb = new java.lang.StringBuilder
    var first = true
    canonicalize(pairs).foreach { case (k, v) =>
      if (!first) sb.append(", ")
      first = false
      appendQuoted(sb, k)
      sb.append("=>")
      if (v == null) sb.append("NULL") else appendQuoted(sb, v)
    }
    sb.toString
  }

  /** hstore_to_json[_loose] (hstore_io.c): `{"k": "v", ...}` in
    * canonical order with PG's `": "` / `", "` spacing; loose mode maps
    * exactly the length-1 values 't'/'f' to booleans (hstore_io.c:1307-1313
    * guesses ONLY single-char 't'/'f'; a value "true" stays the quoted
    * string "true") and emits values that satisfy the JSON
    * number grammar VERBATIM (so `2.345e+4` stays `2.345e+4` and the
    * leading-zero `012345` stays a string — the regress's own cases);
    * the jsonb flag additionally normalizes numbers the way the jsonb
    * numeric type does (`2.345e+4` -> `23450`, scale preserved). */
  def toJson(pairs: Seq[(String, String)], loose: Boolean,
             jsonb: Boolean = false): String = {
    val num = "-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?".r
    val sb = new java.lang.StringBuilder("{")
    var first = true
    canonicalize(pairs).foreach { case (k, v) =>
      if (!first) sb.append(", ")
      first = false
      appendJsonString(sb, k)
      sb.append(": ")
      if (v == null) sb.append("null")
      else if (loose && v == "t") sb.append("true")
      else if (loose && v == "f") sb.append("false")
      else if (loose && num.matches(v))
        sb.append(if (jsonb) new java.math.BigDecimal(v).toPlainString else v)
      else appendJsonString(sb, v)
    }
    sb.append("}").toString
  }

  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def appendQuoted(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\') sb.append('\\')
      sb.append(c)
      i += 1
    }
    sb.append('"')
  }
}

object HstoreFns {
  /** Session-idempotent registration (the CryptFns pattern) so queries
    * reach the kernels via `expr`/`call_function`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hstore_parse"))) {
      reg.createOrReplaceTempFunction(
        "hstore_parse", exprs => HstoreParse(exprs.head), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hstore_render"))) {
      reg.createOrReplaceTempFunction(
        "hstore_render", exprs => HstoreRender(exprs.head), "built-in")
    }
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("hstore_to_json"))) {
      reg.createOrReplaceTempFunction("hstore_to_json",
        exprs => HstoreToJson(exprs.head, loose = false), "built-in")
    }
    if (!reg.functionExists(org.apache.spark.sql.catalyst
        .FunctionIdentifier("hstore_to_json_loose"))) {
      reg.createOrReplaceTempFunction("hstore_to_json_loose",
        exprs => HstoreToJson(exprs.head, loose = true), "built-in")
    }
    if (!reg.functionExists(org.apache.spark.sql.catalyst
        .FunctionIdentifier("hstore_to_jsonb_loose"))) {
      reg.createOrReplaceTempFunction("hstore_to_jsonb_loose",
        exprs => HstoreToJson(exprs.head, loose = true, jsonb = true),
        "built-in")
    }
  }
}

/** `hstore_to_json[_loose](map)` → PG-formatted json text (see
  * [[HstoreKernel.toJson]]). */
case class HstoreToJson(child: Expression, loose: Boolean,
                        jsonb: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires map<string,string> input, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String =
    if (jsonb) "hstore_to_jsonb_loose"
    else if (loose) "hstore_to_json_loose" else "hstore_to_json"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(in: MapData): UTF8String = {
    val keys = in.keyArray()
    val vals = in.valueArray()
    val pairs = (0 until in.numElements()).map { i =>
      (keys.getUTF8String(i).toString,
        if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString)
    }
    UTF8String.fromString(HstoreKernel.toJson(pairs, loose, jsonb))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("hstoreToJson", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hstore_parse(text)` → map<string,string> in canonical hstore order
  * (null on malformed input — see [[HstoreKernel]] scaladoc). */
case class HstoreParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $other")
  }
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  override def nullable: Boolean = true // malformed input -> null
  override def prettyName: String = "hstore_parse"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(in: UTF8String): MapData = {
    val pairs = HstoreKernel.parse(in.toString)
    if (pairs == null) return null
    val keys = new Array[Any](pairs.length)
    val vals = new Array[Any](pairs.length)
    var i = 0
    pairs.foreach { case (k, v) =>
      keys(i) = UTF8String.fromString(k)
      vals(i) = if (v == null) null else UTF8String.fromString(v)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("hstoreParse", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $refName.kernel($a);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hstore_render(map<string,string>)` → canonical hstore text. */
case class HstoreRender(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires map<string,string> input, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "hstore_render"

  /** The per-row kernel (public: codegen calls it via reference obj). */
  def kernel(in: MapData): UTF8String = {
    val keys = in.keyArray()
    val vals = in.valueArray()
    val pairs = (0 until in.numElements()).map { i =>
      val k = keys.getUTF8String(i).toString
      val v = if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString
      (k, v)
    }
    UTF8String.fromString(HstoreKernel.render(pairs))
  }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("hstoreRender", this, getClass.getName)
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = $refName.kernel($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
