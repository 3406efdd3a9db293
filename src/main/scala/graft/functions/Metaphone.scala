package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** contrib/fuzzystrmatch metaphone()
  * (`/root/reference/contrib/fuzzystrmatch/fuzzystrmatch.c:344-700`, the
  * non-traditional variant the reference builds: CHR/S-CH harden to K,
  * SCHW collapses to SH).
  *
  * Behavioral port, not a transliteration: single forward scan with a
  * skip counter, the reference's five character-class predicates (vowel /
  * no-change / affects-H / soft-C-G / no-GH-to-F) folded into one 26-entry
  * bit table. First letter gets the special-cased treatment (AE→E, [GKP]N→N,
  * WR/WH, X→S, vowels preserved); after that vowels drop, duplicates drop
  * except CC, and the digraph rules fire exactly as in the C (SH='X',
  * TH='0').
  *
  * Two deliberate divergences, both documented here: the reference ERRORs
  * on input > 255 bytes and on max_output <= 0 — a per-row error is
  * operationally wrong on a 1000-executor scan, so long inputs are simply
  * processed in full and the expression requires a positive foldable
  * max at PLAN time instead (analysis error, not runtime).
  *
  * Known-answer parity is proven in MetaphoneSpec against vectors from an
  * independent Python port of the same C (anchored on the reference's own
  * regress vector metaphone('GUMBO',4) = 'KM').
  */
object MetaphoneKernel {
  // a..z: 1=vowel, 2=no-change(FJMNR), 4=affects-H(CGPST),
  // 8=softens-C/G(EIY), 16=blocks-GH-to-F(BDH)
  private val codes: Array[Int] = Array(
    1, 16, 4, 16, 9, 2, 4, 16, 9, 2, 0, 2, 2, 2, 1, 4, 0, 2, 4, 4,
    1, 0, 0, 0, 8, 0)

  @inline private def code(c: Char): Int =
    if (c >= 'A' && c <= 'Z') codes(c - 'A') else 0
  @inline private def vowel(c: Char): Boolean = (code(c) & 1) != 0
  @inline private def affectsH(c: Char): Boolean = (code(c) & 4) != 0
  @inline private def soft(c: Char): Boolean = (code(c) & 8) != 0
  @inline private def noGhToF(c: Char): Boolean = (code(c) & 16) != 0
  @inline private def alpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  /** ASCII toupper of the letter at `i`, or '\u0000' off either end —
    * the C's NUL-terminated reads (Look_Back/Next/After_Next/Look_Ahead
    * all degenerate to this on a bounds-checked string). */
  final val End = '\u0000'

  @inline private def at(w: String, i: Int): Char =
    if (i >= 0 && i < w.length) Character.toUpperCase(w.charAt(i)) else End

  def metaphone(s: UTF8String, max: Int): UTF8String =
    UTF8String.fromString(compute(s.toString, max))

  def compute(w: String, max: Int): String = {
    val n = w.length
    val out = new java.lang.StringBuilder(max)
    var i = 0
    while (i < n && !alpha(w.charAt(i))) i += 1
    if (i >= n) return ""

    // -- first letter --
    at(w, i) match {
      case 'A' =>
        if (at(w, i + 1) == 'E') { out.append('E'); i += 2 }
        else { out.append('A'); i += 1 }
      case 'G' | 'K' | 'P' =>
        if (at(w, i + 1) == 'N') { out.append('N'); i += 2 }
      case 'W' =>
        val nx = at(w, i + 1)
        if (nx == 'H' || nx == 'R') { out.append(nx); i += 2 }
        else if (vowel(nx)) { out.append('W'); i += 2 }
      case 'X' => out.append('S'); i += 1
      case 'E' | 'I' | 'O' | 'U' => out.append(at(w, i)); i += 1
      case _ => // consonant: main loop starts on it
    }

    // -- main scan --
    while (i < n && out.length < max) {
      val c = at(w, i)
      var skip = 0
      if (alpha(w.charAt(i))) {
        val prev = at(w, i - 1)
        if (c != prev || c == 'C') {
          val nx = at(w, i + 1)
          // After_Next guards on next != NUL exactly like the C macro
          val an = if (nx != End) at(w, i + 2) else End
          c match {
            case 'B' => if (prev != 'M') out.append('B')
            case 'C' =>
              if (soft(nx)) {
                if (an == 'A' && nx == 'I') out.append('X') // -CIA-
                else if (prev == 'S') ()                    // -SC[IEY]-
                else out.append('S')
              } else if (nx == 'H') {
                if (an == 'R' || prev == 'S') out.append('K') // CHR / SCH
                else out.append('X')
                skip += 1
              } else out.append('K')
            case 'D' =>
              if (nx == 'G' && soft(an)) { out.append('J'); skip += 1 }
              else out.append('T')
            case 'G' =>
              if (nx == 'H') {
                if (!(noGhToF(at(w, i - 3)) || at(w, i - 4) == 'H')) {
                  out.append('F'); skip += 1
                } // else silent
              } else if (nx == 'N') {
                // Isbreak(After_Next): off-end reads are End, real
                // spaces are non-alpha -- both break, as in the C
                if (!alpha(an) || (an == 'E' && at(w, i + 3) == 'D')) ()
                else out.append('K')
              } else if (soft(nx) && prev != 'G') out.append('J')
              else out.append('K')
            case 'H' =>
              if (vowel(nx) && !affectsH(prev)) out.append('H')
            case 'K' => if (prev != 'C') out.append('K')
            case 'P' => out.append(if (nx == 'H') 'F' else 'P')
            case 'Q' => out.append('K')
            case 'S' =>
              if (nx == 'I' && (an == 'O' || an == 'A')) out.append('X')
              else if (nx == 'H') { out.append('X'); skip += 1 }
              else if (nx == 'C' && at(w, i + 2) == 'H' &&
                       at(w, i + 3) == 'W') { out.append('X'); skip += 2 }
              else out.append('S')
            case 'T' =>
              if (nx == 'I' && (an == 'O' || an == 'A')) out.append('X')
              else if (nx == 'H') { out.append('0'); skip += 1 }
              else out.append('T')
            case 'V' => out.append('F')
            case 'W' => if (vowel(nx)) out.append('W')
            case 'X' =>
              out.append('K')
              if (out.length < max) out.append('S')
            case 'Y' => if (vowel(nx)) out.append('Y')
            case 'Z' => out.append('S')
            case 'F' | 'J' | 'L' | 'M' | 'N' | 'R' => out.append(c)
            case _ => // vowels mid-word: dropped
          }
        }
      }
      i += 1 + skip
    }
    out.toString
  }
}

/** `metaphone(text, max)` as a codegen scalar: the generated code is one
  * static call into [[MetaphoneKernel]], so the expression stays inside
  * whole-stage codegen like the repo's other kernels (SigFns/PqFns). */
case class Metaphone(child: Expression, max: Int) extends UnaryExpression {
  require(max > 0, "metaphone output length must be > 0")
  override def dataType: DataType = StringType
  override def prettyName: String = "metaphone"
  override def nullSafeEval(a: Any): Any =
    MetaphoneKernel.metaphone(a.asInstanceOf[UTF8String], max)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MetaphoneKernel.metaphone($c, $max)")
  override protected def withNewChildInternal(newChild: Expression): Metaphone =
    copy(child = newChild)
}

object MetaphoneFns {
  /** Register `metaphone(text, maxlen)` for SQL/expr use (maxlen must be
    * a foldable positive int — resolved once at plan time). Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("metaphone"))) {
      reg.createOrReplaceTempFunction(
        "metaphone",
        exprs => Metaphone(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()),
        "built-in")
    }
  }
}
