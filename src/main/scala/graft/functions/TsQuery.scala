package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** tsquery dialect translator — the reference's text-search query language
  * (`/root/reference/src/backend/utils/adt/tsquery.c` makepol/parse_tsquery
  * recursive-descent grammar; executed by `tsvector_op.c` TS_execute /
  * TS_phrase_execute; tests `src/test/regress/sql/tsearch.sql`), compiled
  * to Catalyst Column predicates over a word-array column — the same
  * translator pattern as [[SimilarTo]].
  *
  * Grammar (PG precedence, loosest to tightest: `|` < `&` < `<->`/`<N>` <
  * `!`):
  * {{{
  *   or     := and  ( '|' and )*
  *   and    := phr  ( '&' phr )*
  *   phr    := not  ( ('<->' | '<' N '>') not )*    // left-associative
  *   not    := '!' not | primary
  *   primary:= '(' or ')' | lexeme [':*']
  *   lexeme := 'quoted word' | bare-word
  * }}}
  *
  * Semantics compiled:
  *  - lexeme: whole-word membership; `:*` prefix match (`tsquery.c`
  *    prefix flag);
  *  - `&` / `|` / `!`: boolean combinators over matches;
  *  - `a <N> b`: positional — some position p matching `b` has a match of
  *    `a` at `p - N` (`<->` = `<1>`, adjacent). Matches the reference's
  *    TSPhraseOperand evaluation where a phrase's match positions are the
  *    RIGHT operand's positions, so phrases nest left-associatively:
  *    `a <-> b <-> c` = `(a <-> b) <-> c`.
  *  - Inside a phrase operand, `|` unions position sets (per TS_phrase_
  *    execute OR handling). `&`/`!` inside a phrase operand need the
  *    reference's NOT/AND position algebra and are rejected as
  *    unsupported (deliberate subset; the error says so).
  *
  * All compiled predicates are per-row array expressions (positions via
  * index-aware transform+filter) — pure map-side, no explode, no shuffle,
  * exactly like the hand-built FTS queries in `TextOps`. */
object TsQuery {

  sealed trait Node
  final case class Lexeme(word: String, prefix: Boolean) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node
  final case class Phrase(l: Node, r: Node, dist: Int) extends Node

  // ---- parser -----------------------------------------------------------

  private sealed trait Tok
  private final case class TWord(w: String) extends Tok
  private case object TPrefix extends Tok // :*
  private case object TAnd extends Tok
  private case object TOr extends Tok
  private case object TNot extends Tok
  private final case class TDist(n: Int) extends Tok // <-> / <N>
  private case object TOpen extends Tok
  private case object TClose extends Tok

  private def tokenize(s: String): List[Tok] = {
    val b = List.newBuilder[Tok]
    var i = 0
    def err(msg: String) =
      throw new IllegalArgumentException(s"tsquery: $msg at offset $i in: $s")
    while (i < s.length) {
      s.charAt(i) match {
        case c if c.isWhitespace => i += 1
        case '&' => b += TAnd; i += 1
        case '|' => b += TOr; i += 1
        case '!' => b += TNot; i += 1
        case '(' => b += TOpen; i += 1
        case ')' => b += TClose; i += 1
        case ':' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '*') { b += TPrefix; i += 2 }
          else err("expected ':*'")
        case '<' =>
          val close = s.indexOf('>', i)
          if (close < 0) err("unterminated distance operator")
          val body = s.substring(i + 1, close)
          if (body == "-") b += TDist(1)
          else if (body.nonEmpty && body.forall(_.isDigit)) b += TDist(body.toInt)
          else err(s"bad distance operator <$body>")
          i = close + 1
        case '\'' =>
          val close = s.indexOf('\'', i + 1)
          if (close < 0) err("unterminated quoted lexeme")
          b += TWord(s.substring(i + 1, close)); i = close + 1
        case c if c.isLetterOrDigit || c == '_' =>
          val start = i
          while (i < s.length &&
                 (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          b += TWord(s.substring(start, i))
        case c => err(s"unexpected character '$c'")
      }
    }
    b.result()
  }

  /** Parse a tsquery string to its AST. Throws IllegalArgumentException on
    * syntax errors (unbalanced parens, dangling operators, empty input). */
  def parse(q: String): Node = {
    var toks = tokenize(q)
    def fail(msg: String) =
      throw new IllegalArgumentException(s"tsquery: $msg in: $q")
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil    => fail("unexpected end of input")
    }
    def primary(): Node = next() match {
      case TWord(w) =>
        val prefix = peek.contains(TPrefix)
        if (prefix) next()
        // A quoted multi-word lexeme desugars to an adjacency phrase
        // ('hash join' -> 'hash' <-> 'join'), like phraseto_tsquery.
        // Deliberate departure from the reference's tsquery literal
        // (there a space-embedded lexeme matches a tsvector lexeme that
        // itself contains a space): over space-split word arrays such a
        // lexeme could never match anything, and silently-always-false
        // is the worst failure mode for a query language. The prefix
        // flag applies to the LAST word of the phrase.
        val parts = w.trim.split("\\s+").toList.filter(_.nonEmpty)
        parts match {
          case Nil => fail("empty lexeme")
          case single :: Nil => Lexeme(single, prefix)
          case many =>
            val lexs = many.init.map(Lexeme(_, prefix = false)) :+
              Lexeme(many.last, prefix)
            lexs.reduceLeft[Node](Phrase(_, _, 1))
        }
      case TOpen =>
        val n = or()
        if (next() != TClose) fail("expected ')'")
        n
      case t => fail(s"unexpected token $t")
    }
    def not(): Node =
      if (peek.contains(TNot)) { next(); Not(not()) } else primary()
    def phr(): Node = {
      var n = not()
      while (peek.exists(_.isInstanceOf[TDist])) {
        val TDist(d) = next(): @unchecked
        n = Phrase(n, not(), d)
      }
      n
    }
    def and(): Node = {
      var n = phr()
      while (peek.contains(TAnd)) { next(); n = And(n, phr()) }
      n
    }
    def or(): Node = {
      var n = and()
      while (peek.contains(TOr)) { next(); n = Or(n, and()) }
      n
    }
    if (toks.isEmpty) fail("empty query")
    val n = or()
    if (toks.nonEmpty) fail(s"trailing tokens $toks")
    n
  }

  // ---- ts_rewrite -------------------------------------------------------

  /** `ts_rewrite(query, target, substitute)`
    * (`/root/reference/src/backend/utils/adt/tsquery_rewrite.c`,
    * `findsubquery`/`dofindsubquery` over QTNode trees; tests
    * `sql/tsearch.sql`): replace every occurrence of `target` inside
    * `query` with `substitute`. Like the reference, AND/OR matching is
    * SET-based over the flattened operator chain — rewriting
    * `a & b & c` by target `c & a` matches regardless of order and
    * leaves `b & sub` — and a target equal to a whole node replaces it
    * outright. The rewritten tree is rebuilt left-fold over the
    * remaining operands, then the substitute. */
  def rewrite(q: Node, target: Node, sub: Node): Node = {
    def flat(n: Node, isAnd: Boolean): List[Node] = n match {
      case And(l, r) if isAnd => flat(l, isAnd) ++ flat(r, isAnd)
      case Or(l, r) if !isAnd => flat(l, isAnd) ++ flat(r, isAnd)
      case other => List(other)
    }
    def rebuild(ops: List[Node], isAnd: Boolean): Node =
      ops.reduceLeft[Node]((a, b) => if (isAnd) And(a, b) else Or(a, b))
    def removeSubset(chain: List[Node], tgt: List[Node]): Option[List[Node]] = {
      // remove each target operand once (multiset subset)
      var rest = chain
      val ok = tgt.forall { t =>
        val i = rest.indexOf(t)
        if (i < 0) false else { rest = rest.patch(i, Nil, 1); true }
      }
      if (ok) Some(rest) else None
    }
    def go(n: Node): Node = {
      if (n == target) return sub
      n match {
        case _: And | _: Or =>
          val isAnd = n.isInstanceOf[And]
          val chain = flat(n, isAnd).map(go)
          val tgtChain = target match {
            case _: And if isAnd => flat(target, isAnd = true)
            case _: Or if !isAnd => flat(target, isAnd = false)
            case single => List(single)
          }
          removeSubset(chain, tgtChain) match {
            case Some(rest) => rebuild(rest :+ sub, isAnd)
            case None => rebuild(chain, isAnd)
          }
        case Not(c) => Not(go(c))
        case Phrase(l, r, d) => Phrase(go(l), go(r), d)
        case leaf => leaf
      }
    }
    go(q)
  }

  /** String-level ts_rewrite: parse all three and rewrite. */
  def rewrite(q: String, target: String, sub: String): Node =
    rewrite(parse(q), parse(target), parse(sub))

  // ---- websearch syntax -------------------------------------------------

  /** `websearch_to_tsquery` (`/root/reference/src/backend/tsquery/…` —
    * `to_tsany.c` websearch_to_tsquery / parse_or_operator): free-form
    * web-search syntax compiled onto the same AST. Unquoted words AND
    * together; `"quoted words"` form an adjacency phrase; a leading `-`
    * negates the following word or phrase; the word `or` (any case,
    * standing alone) separates OR branches and binds loosest. Like the
    * reference, the parser never throws on strange input — punctuation
    * that is not part of a word is treated as whitespace and dropped —
    * except for fully-empty input, which has no query to mean. */
  def websearch(q: String): Node = {
    // tokenize: quoted segments (with optional leading -) survive as
    // phrase tokens; everything else splits on non-word characters with
    // a remembered leading '-'
    sealed trait W
    final case class Word(w: String, neg: Boolean) extends W
    final case class Quoted(ws: List[String], neg: Boolean) extends W
    case object OrSep extends W
    // ONE word-character predicate for both quoted and unquoted text —
    // a quoted "café au" must tokenize the same letters the bare word
    // café does, or quoting a term changes what it matches
    def isWordChar(ch: Char): Boolean = ch.isLetterOrDigit || ch == '_'
    def splitWords(seg: String): List[String] = {
      val out = List.newBuilder[String]
      val cur = new StringBuilder
      seg.foreach { ch =>
        if (isWordChar(ch)) cur.append(ch)
        else if (cur.nonEmpty) { out += cur.result(); cur.clear() }
      }
      if (cur.nonEmpty) out += cur.result()
      out.result()
    }
    val toks = List.newBuilder[W]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c == '"' || (c == '-' && i + 1 < q.length && q.charAt(i + 1) == '"')) {
        val neg = c == '-'
        val open = if (neg) i + 1 else i
        val close = q.indexOf('"', open + 1)
        val end = if (close < 0) q.length else close
        val ws = splitWords(q.substring(open + 1, end))
        if (ws.nonEmpty) toks += Quoted(ws, neg)
        i = end + 1
      } else if (c == '-' || isWordChar(c)) {
        val neg = c == '-'
        val start = if (neg) i + 1 else i
        var j = start
        while (j < q.length && isWordChar(q.charAt(j))) j += 1
        val w = q.substring(start, j)
        if (w.equalsIgnoreCase("or") && !neg) toks += OrSep
        else if (w.nonEmpty) toks += Word(w, neg)
        i = if (j == start) start + 1 else j // lone '-' advances past it
      } else i += 1
    }
    def item(t: W): Option[Node] = t match {
      case Word(w, neg) =>
        val n = Lexeme(w, prefix = false)
        Some(if (neg) Not(n) else n)
      case Quoted(ws, neg) =>
        val n = ws.map(Lexeme(_, prefix = false)).reduceLeft[Node](Phrase(_, _, 1))
        Some(if (neg) Not(n) else n)
      case OrSep => None
    }
    val branches = {
      // split on OrSep; drop empty branches (leading/trailing/double OR)
      val (acc, last) = toks.result().foldLeft((List.empty[List[Node]], List.empty[Node])) {
        case ((done, cur), OrSep) => (if (cur.nonEmpty) done :+ cur else done, Nil)
        case ((done, cur), t)     => (done, cur ++ item(t))
      }
      if (last.nonEmpty) acc :+ last else acc
    }
    val chains = branches.map(_.reduceLeft[Node](And(_, _)))
    if (chains.isEmpty)
      throw new IllegalArgumentException(s"websearch: no query terms in: $q")
    chains.reduceLeft[Node](Or(_, _))
  }

  /** Parse websearch syntax + compile: `text @@ websearch_to_tsquery`. */
  def matchesWebsearch(query: String, words: Column): Column =
    matches(websearch(query), words)

  // ---- compiler ---------------------------------------------------------

  /** 1-based positions (array<int>) of a phrase operand's matches in
    * `words`. Defined for Lexeme, Or (position union), and nested Phrase
    * (right operand's positions with a left match at p - dist). */
  private def positions(node: Node, words: Column): Column = node match {
    case Lexeme(w, false) =>
      filter(transform(words, (x, i) => when(x === w, i + 1).otherwise(-1)),
             p => p >= 0)
    case Lexeme(w, true) =>
      filter(transform(words,
               (x, i) => when(x.startsWith(w), i + 1).otherwise(-1)),
             p => p >= 0)
    case Or(l, r) =>
      array_sort(array_distinct(
        concat(positions(l, words), positions(r, words))))
    case Phrase(l, r, d) =>
      // each operand's position set is computed ONCE and intersected —
      // embedding positions(l) inside a filter lambda over positions(r)
      // would re-evaluate the whole left subtree per right position
      // (O(|words|^depth) for nested phrases)
      array_intersect(positions(r, words),
        transform(positions(l, words), p => p + d))
    case other =>
      throw new IllegalArgumentException(
        s"tsquery: $other unsupported inside a phrase operand " +
          "(supported: lexemes, |, nested <N>)")
  }

  /** Compile an AST to a boolean match Column over a word array. */
  def matches(node: Node, words: Column): Column = node match {
    case Lexeme(w, false) => exists(words, _ === w)
    case Lexeme(w, true)  => exists(words, _.startsWith(w))
    case And(l, r)        => matches(l, words) && matches(r, words)
    case Or(l, r)         => matches(l, words) || matches(r, words)
    case Not(n)           => !matches(n, words)
    case p: Phrase        => size(positions(p, words)) > 0
  }

  /** Parse + compile in one step: the user-facing `text @@ tsquery`. */
  def matches(query: String, words: Column): Column =
    matches(parse(query), words)

  /** Match COUNT of a phrase/lexeme node (ts_rank-style evidence). */
  def matchCount(query: String, words: Column): Column = {
    val n = parse(query)
    n match {
      case _: Lexeme | _: Or | _: Phrase => size(positions(n, words))
      case other => throw new IllegalArgumentException(
        s"tsquery: matchCount needs a positional node, got $other")
    }
  }
}
