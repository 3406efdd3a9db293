package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL-style `to_char` template engine — the reference's formatting
  * pattern language (`/root/reference/src/backend/utils/adt/formatting.c:5995`,
  * `NUM_numpart_*` / `DCH_*` keyword tables), re-expressed Spark-first:
  * the template is compiled ONCE at plan time into an immutable formatter
  * object ([[NumFormat]] / [[DtFormat]], top-level classes so generated
  * code can reference them), and a custom codegen Expression calls it per
  * row — whole-stage codegen keeps flowing (the formatter call is a single
  * virtual dispatch, the same shape Spark uses for its own `date_format`).
  *
  * Supported numeric template: `9 0 , . FM MI PR` (digit, forced digit,
  * group separator, decimal point, fill mode, trailing sign, angle
  * brackets). Supported datetime template: `YYYY MM DD HH24 HH12 MI SS
  * DDD Q Mon Month Day Dy AM PM` + literal punctuation.
  *
  * Semantics follow the PostgreSQL documentation: positives carry a
  * leading sign blank (unless FM), values are rounded HALF_UP to the
  * pattern's decimal width, group separators appear only between emitted
  * digits, overflow renders `#` in every digit position.
  */
final case class NumFormat(intPattern: String, decPattern: String,
                           fm: Boolean, mi: Boolean, pr: Boolean) {
  private val decCount = decPattern.length
  // FM strips trailing zeros only from '9' decimal slots; '0' slots force
  // (PG doc: FM999.999 of 148.5 -> '148.5', FM999.990 -> '148.500')
  private val lastForcedDec = decPattern.lastIndexOf('0')
  private val intDigitSlots = intPattern.count(c => c == '9' || c == '0')
  // digit-slot index counted from the RIGHT of the leftmost forced '0';
  // -1 when the pattern has no '0'
  private val forcedFromRight: Int = {
    var slot = -1; var seen = -1
    intPattern.foreach { c =>
      if (c == '9' || c == '0') { slot += 1 }
      if (c == '0' && seen < 0) seen = slot // LEFTMOST forced digit
    }
    if (seen < 0) -1 else intDigitSlots - 1 - seen
  }
  /** pattern width in output chars (digits + separators + decimals). */
  val width: Int = intPattern.length + (if (decCount > 0) 1 + decCount else 0)

  def format(x: Double): String = format(JBigDecimal.valueOf(x))
  def format(x: Long): String = format(JBigDecimal.valueOf(x))

  def format(x0: JBigDecimal): String = {
    val neg = x0.signum() < 0
    val x = x0.abs.setScale(decCount, RoundingMode.HALF_UP)
    val plain = x.toPlainString
    val (intStr0, decStr) = plain.indexOf('.') match {
      case -1 => (plain, "")
      case i => (plain.substring(0, i), plain.substring(i + 1))
    }
    // a zero integer part is suppressed only next to a decimal point
    // (PG: to_char(0.4,'99.99') -> '   .40' but to_char(0,'99') -> '  0')
    val intStr = if (intStr0 == "0" && decCount > 0) "" else intStr0
    if (intStr.length > intDigitSlots) {
      // overflow: every digit position renders '#' (formatting.c fill char)
      val hashed = intPattern.map(c => if (c == ',') ',' else '#') +
        (if (decCount > 0) "." + "#" * decCount else "")
      return sign(neg, hashed, hashed.length)
    }
    // walk the integer pattern right-to-left consuming actual digits;
    // forced '0' slots keep emitting zeros, ',' emits only between digits
    val sb = new java.lang.StringBuilder
    var slot = 0 // digit-slot index from the right
    var di = intStr.length - 1
    var pi = intPattern.length - 1
    while (pi >= 0) {
      intPattern.charAt(pi) match {
        case ',' =>
          if (di >= 0 || slot <= forcedFromRight) sb.append(',')
        case _ =>
          if (di >= 0) { sb.append(intStr.charAt(di)); di -= 1 }
          else if (slot <= forcedFromRight) sb.append('0')
          slot += 1
      }
      pi -= 1
    }
    val decOut = if (!fm) decStr else {
      var end = decStr.length
      while (end - 1 > lastForcedDec && end > 0 && decStr.charAt(end - 1) == '0')
        end -= 1
      decStr.substring(0, end)
    }
    val core = sb.reverse.toString +
      (if (decOut.nonEmpty) "." + decOut else "")
    sign(neg, core, width)
  }

  private def lpadTo(s: String, w: Int): String =
    if (fm || s.length >= w) s else (" " * (w - s.length)) + s

  private def sign(neg: Boolean, core: String, w: Int): String = {
    if (mi) {
      val body = lpadTo(core, w)
      if (neg) body + "-" else if (fm) body else body + " "
    } else if (pr) {
      val inner = lpadTo(core, w)
      if (neg) "<" + inner + ">"
      else if (fm) inner else " " + inner + " "
    } else {
      val signed = if (neg) "-" + core else core
      if (fm) signed else lpadTo(signed, w + 1)
    }
  }
}

/** Compiled datetime template: a sequence of token / literal pieces.
  * Literal pieces carry a ' ' prefix so a literal can never collide
  * with a token name. */
final case class DtFormat(pieces: Array[String]) {
  import DtFormat._
  def format(micros: Long): String = {
    val dt = LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val sb = new java.lang.StringBuilder
    pieces.foreach {
      case "YYYY" => sb.append(f"${dt.getYear}%04d")
      case "MM" => sb.append(f"${dt.getMonthValue}%02d")
      case "DD" => sb.append(f"${dt.getDayOfMonth}%02d")
      case "HH24" => sb.append(f"${dt.getHour}%02d")
      case "HH12" => sb.append(f"${(dt.getHour + 11) % 12 + 1}%02d")
      case "MI" => sb.append(f"${dt.getMinute}%02d")
      case "SS" => sb.append(f"${dt.getSecond}%02d")
      case "DDD" => sb.append(f"${dt.getDayOfYear}%03d")
      case "Q" => sb.append((dt.getMonthValue + 2) / 3)
      case "Mon" => sb.append(MONS(dt.getMonthValue - 1))
      case "Month" => // blank-padded to 9 (formatting.c DCH_Month)
        sb.append(MONTHS(dt.getMonthValue - 1).padTo(9, ' '))
      case "FMMonth" => sb.append(MONTHS(dt.getMonthValue - 1))
      case "Day" => sb.append(DAYS(dt.getDayOfWeek.getValue - 1).padTo(9, ' '))
      case "FMDay" => sb.append(DAYS(dt.getDayOfWeek.getValue - 1))
      case "Dy" => sb.append(DAYS(dt.getDayOfWeek.getValue - 1).substring(0, 3))
      case "AM" | "PM" => sb.append(if (dt.getHour < 12) "AM" else "PM")
      case lit => sb.append(lit.substring(1)) // strip literal marker
    }
    sb.toString
  }
}

object DtFormat {
  private[functions] val MONS = Array("Jan", "Feb", "Mar", "Apr", "May",
    "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
  private[functions] val MONTHS = Array("January", "February", "March",
    "April", "May", "June", "July", "August", "September", "October",
    "November", "December")
  private[functions] val DAYS = Array("Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday", "Sunday") // ISO day-of-week 1..7
}

object ToCharFormat {

  def parseNum(fmt0: String): NumFormat = {
    var fmt = fmt0
    var fm = false; var mi = false; var pr = false
    if (fmt.startsWith("FM")) { fm = true; fmt = fmt.substring(2) }
    if (fmt.endsWith("MI")) { mi = true; fmt = fmt.dropRight(2) }
    if (fmt.endsWith("PR")) { pr = true; fmt = fmt.dropRight(2) }
    require(fmt.nonEmpty && fmt.forall(c => c == '9' || c == '0' || c == ',' || c == '.'),
      s"unsupported numeric to_char template: $fmt0")
    val dot = fmt.indexOf('.')
    val (intPat, decPat) = if (dot < 0) (fmt, "") else
      (fmt.substring(0, dot), fmt.substring(dot + 1))
    NumFormat(intPat, decPat, fm, mi, pr)
  }

  private val DT_TOKENS = Seq("FMMonth", "FMDay", "YYYY", "HH24", "HH12",
    "DDD", "Month", "Day", "Mon", "Dy", "MM", "DD", "MI", "SS", "AM", "PM", "Q")

  /** Map the PG datetime template subset to a Spark datetime pattern —
    * the parsing half of the formatting.c surface (`to_date` /
    * `to_timestamp(text, template)`): render with [[ToCharDateTime]],
    * parse back with Spark's own `to_date(col, toSparkDatetime(fmt))`. */
  def toSparkDatetime(fmt: String): String =
    parseDt(fmt).pieces.map {
      case "YYYY" => "yyyy"
      case "MM" => "MM"
      case "DD" => "dd"
      case "HH24" => "HH"
      case "HH12" => "hh"
      case "MI" => "mm"
      case "SS" => "ss"
      case "DDD" => "DDD"
      case "Mon" => "MMM"
      case "Dy" => "EEE"
      case "AM" | "PM" => "a"
      case lit if lit.startsWith(" ") =>
        val l = lit.substring(1)
        if (l.exists(_.isLetter)) s"'$l'" else l
      case other => throw new IllegalArgumentException(
        s"no Spark parse pattern for to_char token $other")
    }.mkString

  def parseDt(fmt: String): DtFormat = {
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < fmt.length) {
      DT_TOKENS.find(t => fmt.startsWith(t, i)) match {
        case Some(t) => pieces += t; i += t.length
        case None =>
          val start = i
          while (i < fmt.length && !DT_TOKENS.exists(t => fmt.startsWith(t, i))) i += 1
          pieces += " " + fmt.substring(start, i) // literal marker
      }
    }
    DtFormat(pieces.toArray)
  }
}

/** `to_char(numeric, template)` — template compiled at construction. */
case class ToCharNumber(child: Expression, fmt: String)
    extends UnaryExpression {
  private lazy val nf = ToCharFormat.parseNum(fmt)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType |
         _: DecimalType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_char_num requires a numeric input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "to_char_num"

  override def nullSafeEval(a: Any): Any = UTF8String.fromString(a match {
    case d: Double => nf.format(d)
    case f: Float => nf.format(f.toDouble)
    case l: Long => nf.format(l)
    case i: Int => nf.format(i.toLong)
    case s: Short => nf.format(s.toLong)
    case d: Decimal => nf.format(d.toJavaBigDecimal)
  })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nfRef = ctx.addReferenceObj("nf", nf, classOf[NumFormat].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val call = child.dataType match {
        case _: DecimalType => s"$nfRef.format($a.toJavaBigDecimal())"
        case DoubleType | FloatType => s"$nfRef.format((double) $a)"
        case _ => s"$nfRef.format((long) $a)"
      }
      s"${ev.value} = UTF8String.fromString($call);"
    })
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `to_char(timestamp, template)` — template compiled at construction.
  * Input micros are rendered in UTC (session convention). */
case class ToCharDateTime(child: Expression, fmt: String)
    extends UnaryExpression {
  private lazy val df = ToCharFormat.parseDt(fmt)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_char_dt requires a timestamp input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "to_char_dt"

  override def nullSafeEval(a: Any): Any =
    UTF8String.fromString(df.format(a.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dfRef = ctx.addReferenceObj("df", df, classOf[DtFormat].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = UTF8String.fromString($dfRef.format((long) $a));")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ToChar {
  private def litStr(e: Expression, name: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$name requires a literal template string, got $other")
  }
  /** Register `to_char_num` / `to_char_dt` for SQL + expr use.
    * Idempotent; call at the top of any query that needs them. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // exists-guard to avoid per-query "replaced" WARN spam (see VectorFns)
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("to_char_num"))) {
      reg.createOrReplaceTempFunction(
        "to_char_num",
        exprs => ToCharNumber(exprs(0), litStr(exprs(1), "to_char_num")),
        "built-in")
      reg.createOrReplaceTempFunction(
        "to_char_dt",
        exprs => ToCharDateTime(exprs(0), litStr(exprs(1), "to_char_dt")),
        "built-in")
    }
  }
}
