package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import graft.functions.TsQuery
import graft.functions.TsQuery._

/** Property-based round trip for the tsquery parser: render ANY AST with
  * fully-parenthesized, quoted-lexeme syntax, parse it back, and demand
  * the identical tree — for every operator shape and nesting depth, not
  * just the hand-picked spec cases. Also: precedence-sensitive rendering
  * (minimal parens) must parse to the same tree as the full-paren form. */
object TsQueryPropSpec extends Properties("TsQuery") {

  private val lexeme: Gen[Node] = for {
    w <- Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    p <- Gen.oneOf(true, false)
  } yield Lexeme(w, p)

  private def node(depth: Int): Gen[Node] =
    if (depth <= 0) lexeme
    else Gen.frequency(
      3 -> lexeme,
      2 -> (for { l <- node(depth - 1); r <- node(depth - 1) } yield And(l, r)),
      2 -> (for { l <- node(depth - 1); r <- node(depth - 1) } yield Or(l, r)),
      1 -> node(depth - 1).map(Not(_)),
      2 -> (for {
        l <- node(depth - 1); r <- node(depth - 1)
        d <- Gen.chooseNum(1, 9)
      } yield Phrase(l, r, d)))

  /** Fully-parenthesized canonical rendering. */
  private def render(n: Node): String = n match {
    case Lexeme(w, p) => s"'$w'" + (if (p) ":*" else "")
    case And(l, r)    => s"(${render(l)} & ${render(r)})"
    case Or(l, r)     => s"(${render(l)} | ${render(r)})"
    case Not(x)       => s"!${render(x)}"
    case Phrase(l, r, 1) => s"(${render(l)} <-> ${render(r)})"
    case Phrase(l, r, d) => s"(${render(l)} <$d> ${render(r)})"
  }

  property("render -> parse is the identity on ASTs") =
    Prop.forAll(node(4)) { n =>
      val q = render(n)
      val back = TsQuery.parse(q)
      (back == n) :| s"'$q' reparsed to $back, expected $n"
    }

  /** Left-deep chains rendered WITHOUT parens must reassociate correctly
    * under the declared precedence (| < & < <N> < !). */
  private val chain: Gen[(String, Node)] = for {
    ws <- Gen.listOfN(4, Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
    op <- Gen.oneOf("&", "|", "<->")
  } yield {
    val q = ws.map(w => s"'$w'").mkString(s" $op ")
    val mk: (Node, Node) => Node = op match {
      case "&" => And(_, _)
      case "|" => Or(_, _)
      case _   => Phrase(_, _, 1)
    }
    val tree = ws.map(w => Lexeme(w, prefix = false): Node).reduceLeft(mk)
    (q, tree)
  }

  property("unparenthesized same-operator chains are left-associative") =
    Prop.forAll(chain) { case (q, expected) =>
      (TsQuery.parse(q) == expected) :| s"'$q' -> ${TsQuery.parse(q)}"
    }
}
