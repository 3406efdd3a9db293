package graft.functions

/** PL/pgSQL scalar functions compiled to a single SQL expression.
  *
  * The reference ships a per-row bytecode interpreter for PL/pgSQL
  * (`/root/reference/src/pl/plpgsql/src/pl_exec.c:2000-4000` exec_stmt_*,
  * `pl_comp.c` compilation, `pl_gram.y` grammar) plus planner-side inlining
  * of LANGUAGE sql functions
  * (`/root/reference/src/backend/optimizer/util/clauses.c` inline_function).
  * Interpreting procedural code per row is exactly the shape that dies at
  * 100 TB — every row pays a stack-frame + expression-eval round trip.
  *
  * The Spark-first answer is the Froid approach (Ramachandra et al.,
  * "Froid: Optimization of Imperative Programs in a Relational Database",
  * VLDB 2018): compile the imperative body ONCE into a single relational
  * expression and let the optimizer + whole-stage codegen treat it like any
  * other expression tree. This module implements that for the scalar subset:
  *
  *   - DECLARE blocks with typed variables and initializers (nested blocks
  *     with shadowing per PL/pgSQL scoping)
  *   - assignments (`:=` / `=`), statement `NULL`
  *   - IF / ELSIF / ELSE with early RETURN on any path
  *   - CASE statements, searched and simple (multi-value WHEN lists);
  *     a missing ELSE raises 'case not found' (ERRCODE_CASE_NOT_FOUND,
  *     pl_exec.c:2604)
  *   - RAISE EXCEPTION with %-formatting (`%%` literal, `<NULL>` for
  *     null args — exec_stmt_raise), compiled to `raise_error`; lower
  *     severities are logging and drop (an expression has nowhere to
  *     log); ASSERT cond [, 'msg'] desugars to IF NOT … RAISE
  *   - FOR i IN [REVERSE] <int>..<int> LOOP (literal bounds — unrolled;
  *     the reference interprets, we pay compile-time size instead),
  *     with EXIT [WHEN] / CONTINUE [WHEN] (exec_stmt_exit): the unroll
  *     gives every iteration a precise next-iteration continuation, so
  *     both jumps compile to plain CASE arms (no labels)
  *   - RETURN expr; falling off the end yields CAST(NULL AS ret) (the
  *     reference raises at runtime — a scalar expression has no raise, and
  *     NULL is the honest SQL value for "no value produced")
  *   - bounded self-recursion: self-calls inline to `maxInlineDepth`
  *     frames, beyond which the value is CAST(NULL AS ret) (the reference
  *     would still be recursing; callers declare the depth their data
  *     needs — see q_plpgsql_recursive, whose argument bounds the depth)
  *   - LANGUAGE sql bodies (`SELECT <expr>`) — direct inline, the
  *     clauses.c:inline_function analogue
  *
  * Compilation is continuation-passing over the statement list: an
  * environment maps each variable to the SQL expression that computes its
  * current value; IF compiles each arm against the same continuation
  * (first-match-wins CASE), so early returns, branch-local assignment and
  * fall-through merge all come out as ordinary CASE nesting. No UDF, no
  * closure, no interpreter at run time: the emitted text is parsed by
  * Spark's own SQL parser into built-in Catalyst expressions, so the
  * function body runs INSIDE whole-stage codegen and is visible to the
  * optimizer (constant folding, pushdown through the usual rules).
  *
  * Deliberately rejected (loud errors, documented): WHILE (unbounded
  * iteration has no finite expression form), loop labels, SELECT
  * INTO and any statement touching relations (a scalar expression cannot
  * embed a scan; the reference's regress uses those only in trigger
  * bodies, whose set-based replacement is `sources/Triggers.scala`), OUT
  * params / SETOF (table-valued — Spark-side these are DataFrames).
  *
  * Expression text is engine-portable by construction: statements carry
  * raw SQL expression slices through untouched, so the lane author keeps
  * the MoneyOps discipline (only primitives probed identical in Spark and
  * DuckDB). Branch continuations are duplicated per arm (single-expression
  * compilation cannot share; Froid shares via derived tables) — Spark's
  * runtime subexpression elimination recovers the repeated work, and the
  * size is bounded by arms^depth of the function's own control flow, fine
  * for function-sized bodies.
  */
object PlPgSql {

  // ---------- tokens ----------

  private sealed trait Tok { def sql: String }
  private final case class Id(s: String) extends Tok { def sql: String = s }
  private final case class Num(s: String) extends Tok { def sql: String = s }
  private final case class Str(s: String) extends Tok {
    def sql: String = "'" + s.replace("'", "''") + "'"
  }
  private final case class Op(s: String) extends Tok { def sql: String = s }
  /** Already-rendered SQL spliced during substitution; parenthesized. */
  private final case class Raw(s: String) extends Tok { def sql: String = s }

  private def render(toks: Seq[Tok]): String = toks.map(_.sql).mkString(" ")

  private val multiOps =
    Seq(":=", "..", "||", "<=", ">=", "<>", "!=", "->>", "->")

  /** Lex SQL-ish text: identifiers, numbers, '…''…' strings, operators;
    * strips -- and /* */ comments (non-nested, like every SQL lexer here).
    */
  private def lex(text: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && text(i + 1) == '-') {
        while (i < n && text(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && text(i + 1) == '*') {
        val e = text.indexOf("*/", i + 2)
        require(e >= 0, "unterminated /* comment in PL/pgSQL body")
        i = e + 2
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          require(i < n, "unterminated string literal in PL/pgSQL body")
          if (text(i) == '\'') {
            if (i + 1 < n && text(i + 1) == '\'') { sb += '\''; i += 2 }
            else { i += 1; done = true }
          } else { sb += text(i); i += 1 }
        }
        out += Str(sb.toString)
      } else if (c.isLetter || c == '_') {
        val st = i
        while (i < n && (text(i).isLetterOrDigit || text(i) == '_')) i += 1
        out += Id(text.substring(st, i).toLowerCase(java.util.Locale.ROOT))
      } else if (c == '$' && i + 1 < n && text(i + 1).isDigit) {
        val st = i; i += 1
        while (i < n && text(i).isDigit) i += 1
        out += Id(text.substring(st, i))
      } else if (c.isDigit ||
        (c == '.' && i + 1 < n && text(i + 1).isDigit &&
          // ".." must stay an operator: "1..3" lexes Num(1) Op(..) Num(3)
          !(i + 1 < n && text(i + 1) == '.'))) {
        val st = i
        var seenDot = false
        var cont = true
        while (i < n && cont) {
          val d = text(i)
          if (d.isDigit) i += 1
          else if (d == '.' && !seenDot && !(i + 1 < n && text(i + 1) == '.')) {
            seenDot = true; i += 1
          } else cont = false
        }
        // scientific notation: 1e6 / 2.5e-3 — without this, `e6` would
        // lex as a separate identifier (and even be eligible for
        // variable substitution), yielding broken SQL far from the cause
        if (i < n && (text(i) == 'e' || text(i) == 'E')) {
          val sgn = if (i + 1 < n && (text(i + 1) == '+' || text(i + 1) == '-')) 1 else 0
          if (i + 1 + sgn < n && text(i + 1 + sgn).isDigit) {
            i += 1 + sgn
            while (i < n && text(i).isDigit) i += 1
          }
        }
        out += Num(text.substring(st, i))
      } else {
        multiOps.find(op => text.startsWith(op, i)) match {
          case Some(op) => out += Op(op); i += op.length
          case None     => out += Op(c.toString); i += 1
        }
      }
    }
    out.result()
  }

  // ---------- statement AST ----------

  private final case class Decl(name: String, sqlType: String,
      init: Option[Vector[Tok]])
  private sealed trait Stmt
  private final case class Assign(name: String, expr: Vector[Tok]) extends Stmt
  private final case class IfStmt(
      branches: Vector[(Vector[Tok], Vector[Stmt])],
      els: Vector[Stmt]) extends Stmt
  private final case class Ret(expr: Vector[Tok]) extends Stmt
  private final case class ForLoop(v: String, lo: Long, hi: Long,
      reverse: Boolean, body: Vector[Stmt]) extends Stmt
  private final case class SubBlock(decls: Vector[Decl],
      body: Vector[Stmt]) extends Stmt
  /** RAISE EXCEPTION 'msg with %' , arg, … — terminal like RETURN.
    * Lower severities (NOTICE/WARNING/…) are logging, which a pure
    * expression has nowhere to emit — parsed and dropped, documented. */
  private final case class Raise(msg: String,
      args: Vector[Vector[Tok]]) extends Stmt
  /** EXIT/CONTINUE [WHEN cond] inside a FOR loop (exec_stmt_exit).
    * The loop is unrolled, so these compile to jumps into the loop-end
    * (EXIT) or next-iteration (CONTINUE) continuations. */
  private final case class LoopJump(isExit: Boolean,
      when: Option[Vector[Tok]]) extends Stmt
  private case object NullStmt extends Stmt

  /** Identifiers that may never be variable/parameter names — they appear
    * bare inside expression slices and substitution must not rewrite them.
    */
  private val reserved: Set[String] = Set(
    "select", "from", "where", "case", "when", "then", "else", "end",
    "and", "or", "not", "null", "true", "false", "cast", "as", "in",
    "like", "between", "is", "if", "elsif", "elseif", "loop", "for",
    "while", "begin", "declare", "return", "reverse", "into", "exists",
    "distinct", "order", "by", "group", "exit", "continue", "coalesce",
    "raise", "assert", "using", "exception")

  // ---------- parser ----------

  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def atEnd: Boolean = pos >= toks.length
    def isId(s: String): Boolean = peek.contains(Id(s))
    def expectId(s: String): Unit = {
      val t = next()
      require(t == Id(s), s"expected '$s' but found '${t.sql}'")
    }
    def expectOp(s: String): Unit = {
      val t = next()
      require(t == Op(s), s"expected '$s' but found '${t.sql}'")
    }

    /** Collect expression tokens until a depth-0 terminator (consumed when
      * it is `;`, left in place otherwise — callers eat keywords). Depth
      * counts BOTH parens and CASE…END expression nesting: a SQL CASE
      * expression inside an IF/EXIT/FOR condition carries `when`/`then`/
      * `else`/`end` identifiers that must not terminate the slice.
      */
    def exprUntil(stops: Set[String]): Vector[Tok] = {
      val b = Vector.newBuilder[Tok]
      var depth = 0
      var caseDepth = 0
      var done = false
      while (!done) {
        require(!atEnd, s"unterminated expression (expected one of $stops)")
        peek.get match {
          case Op("(") => depth += 1; b += next()
          case Op(")") if depth > 0 => depth -= 1; b += next()
          case Id("case") => caseDepth += 1; b += next()
          case Id("end") if caseDepth > 0 => caseDepth -= 1; b += next()
          case Op(";") if depth == 0 && caseDepth == 0 => next(); done = true
          case Id(k) if depth == 0 && caseDepth == 0 && stops(k) => done = true
          case Op(k) if depth == 0 && caseDepth == 0 && stops(k) && k != ";" =>
            done = true
          case Id(k) if caseDepth > 0 &&
            Set("when", "then", "else")(k) => b += next()
          case _ => b += next()
        }
      }
      val e = b.result()
      require(e.nonEmpty, "empty expression in PL/pgSQL body")
      e
    }

    def parseBlock(): SubBlock = {
      val decls = Vector.newBuilder[Decl]
      if (isId("declare")) {
        next()
        while (!isId("begin")) {
          val nameTok = next()
          val name = nameTok match {
            case Id(s) if !reserved(s) => s
            case t => throw new IllegalArgumentException(
              s"bad variable name '${t.sql}' (reserved words are rejected)")
          }
          // type = tokens until ';' or ':='/'='/ 'default'
          val ty = Vector.newBuilder[Tok]
          var init: Option[Vector[Tok]] = None
          var done = false
          while (!done) {
            require(!atEnd, "unterminated DECLARE section")
            peek.get match {
              case Op(";") => next(); done = true
              case Op(":=") | Op("=") =>
                next(); init = Some(exprUntil(Set.empty)); done = true
              case Id("default") =>
                next(); init = Some(exprUntil(Set.empty)); done = true
              case _ => ty += next()
            }
          }
          val tyToks = ty.result()
          require(tyToks.nonEmpty, s"variable '$name' has no type")
          decls += Decl(name, mapType(render(tyToks)), init)
        }
      }
      expectId("begin")
      val body = parseStmts(Set("end"))
      expectId("end")
      // optional trailing label/semicolon handled by caller
      if (peek.contains(Op(";"))) next()
      SubBlock(decls.result(), body)
    }

    def parseStmts(stops: Set[String]): Vector[Stmt] = {
      val b = Vector.newBuilder[Stmt]
      while (!atEnd && !peek.exists { case Id(k) => stops(k); case _ => false }) {
        b += parseStmt()
      }
      b.result()
    }

    private def parseStmt(): Stmt = peek match {
      case Some(Id("if")) =>
        next()
        val branches = Vector.newBuilder[(Vector[Tok], Vector[Stmt])]
        var cond = exprUntil(Set("then")); expectId("then")
        var body = parseStmts(Set("elsif", "elseif", "else", "end"))
        branches += ((cond, body))
        var els = Vector.empty[Stmt]
        var done = false
        while (!done) {
          peek match {
            case Some(Id("elsif")) | Some(Id("elseif")) =>
              next()
              cond = exprUntil(Set("then")); expectId("then")
              body = parseStmts(Set("elsif", "elseif", "else", "end"))
              branches += ((cond, body))
            case Some(Id("else")) =>
              next()
              els = parseStmts(Set("end"))
            case Some(Id("end")) =>
              next(); expectId("if"); expectOp(";"); done = true
            case t => throw new IllegalArgumentException(
              s"unterminated IF (found ${t.map(_.sql)})")
          }
        }
        IfStmt(branches.result(), els)

      case Some(Id("return")) =>
        next(); Ret(exprUntil(Set.empty))

      // CASE statement, searched and simple (pl_exec.c:2532
      // exec_stmt_case; pl_gram.y stmt_case) — desugared to the IF
      // machinery. Simple form compiles each WHEN's value list to
      // `(scrutinee) IN (v, …)` (exec_stmt_case builds the same
      // equality; a NULL scrutinee matches nothing either way). A
      // missing ELSE raises 'case not found' exactly like
      // ERRCODE_CASE_NOT_FOUND.
      case Some(Id("case")) =>
        next()
        val scrutinee: Option[Vector[Tok]] =
          if (isId("when")) None else Some(exprUntil(Set("when")))
        val branches = Vector.newBuilder[(Vector[Tok], Vector[Stmt])]
        var els: Option[Vector[Stmt]] = None
        var done = false
        while (!done) {
          peek match {
            case Some(Id("when")) =>
              next()
              val head = exprUntil(Set("then")); expectId("then")
              val cond = scrutinee match {
                case None => head
                case Some(s) =>
                  (Op("(") +: s :+ Op(")")) ++
                    (Id("in") +: Op("(") +: head :+ Op(")"))
              }
              branches += ((cond,
                parseStmts(Set("when", "else", "end"))))
            case Some(Id("else")) =>
              next(); els = Some(parseStmts(Set("end")))
            case Some(Id("end")) =>
              next(); expectId("case"); expectOp(";"); done = true
            case t => throw new IllegalArgumentException(
              s"unterminated CASE statement (found ${t.map(_.sql)})")
          }
        }
        val bs = branches.result()
        require(bs.nonEmpty, "CASE statement with no WHEN arm")
        IfStmt(bs, els.getOrElse(Vector(Raise("case not found", Vector.empty))))

      // RAISE level 'message % with % holes', arg, …  (pl_exec.c
      // exec_stmt_raise). EXCEPTION is terminal (compiles to
      // raise_error with the %-formatted message, <NULL> for null args
      // like the reference); NOTICE/WARNING/INFO/LOG/DEBUG are pure
      // logging — an expression has nowhere to log, so they parse and
      // drop. USING and bare re-throw RAISE are rejected.
      case Some(Id("raise")) =>
        next()
        val level = peek match {
          case Some(Id(l)) if Set("exception", "notice", "warning",
            "info", "log", "debug")(l) => next(); l
          case t => throw new IllegalArgumentException(
            s"RAISE needs an explicit level (found ${t.map(_.sql)}); " +
              "bare re-throw RAISE only makes sense in an exception " +
              "block, which compiled scalar functions do not have")
        }
        val body = exprUntil(Set.empty)
        require(!body.exists(_ == Id("using")),
          "RAISE ... USING is not supported (structured errdata has no " +
            "expression form); put the detail in the message")
        val (msgTok, argToks) = body match {
          case Str(m) +: rest =>
            // rest = (, arg)* — split on top-level commas
            val args = Vector.newBuilder[Vector[Tok]]
            if (rest.nonEmpty) {
              require(rest.head == Op(","),
                s"expected ',' after RAISE message, found '${rest.head.sql}'")
              var depth = 0
              val cur = Vector.newBuilder[Tok]
              rest.tail.foreach {
                case Op("(") => depth += 1; cur += Op("(")
                case Op(")") => depth -= 1; cur += Op(")")
                case Op(",") if depth == 0 =>
                  args += cur.result(); cur.clear()
                case t => cur += t
              }
              args += cur.result()
            }
            (m, args.result())
          case _ => throw new IllegalArgumentException(
            "RAISE needs a string-literal message")
        }
        argToks.foreach(a => require(a.nonEmpty, "empty RAISE parameter"))
        // every level gets the %-count check — PG raises "too many/few
        // parameters" at run time for NOTICE too, so a dropped level
        // must not silently accept a malformed format string
        require(countHoles(msgTok) == argToks.length,
          s"RAISE message has ${countHoles(msgTok)} % placeholders but " +
            s"${argToks.length} parameters (the reference raises the " +
            "same complaint)")
        if (level == "exception") Raise(msgTok, argToks) else NullStmt

      // ASSERT cond [, 'message'] (pl_exec.c exec_stmt_assert) —
      // desugars to IF NOT (cond) THEN RAISE EXCEPTION.
      case Some(Id("assert")) =>
        next()
        val cond = exprUntil(Set(","))
        val msg = peek match {
          case Some(Op(",")) =>
            next()
            val m = next() match {
              case Str(s) => s
              case t => throw new IllegalArgumentException(
                s"ASSERT message must be a string literal, found '${t.sql}'")
            }
            expectOp(";"); m
          case _ => "assertion failed" // terminator ';' already consumed
        }
        IfStmt(Vector((
          Id("not") +: Op("(") +: cond :+ Op(")"),
          Vector(Raise(msg, Vector.empty)))), Vector.empty)

      case Some(Id("for")) =>
        next()
        val v = next() match {
          case Id(s) if !reserved(s) => s
          case t => throw new IllegalArgumentException(
            s"bad FOR variable '${t.sql}'")
        }
        expectId("in")
        val reverse = if (isId("reverse")) { next(); true } else false
        val lo = intLit(exprUntil(Set("..")), "FOR lower bound")
        expectOp("..")
        val hi = intLit(exprUntil(Set("loop")), "FOR upper bound")
        expectId("loop")
        val body = parseStmts(Set("end"))
        expectId("end"); expectId("loop"); expectOp(";")
        ForLoop(v, lo, hi, reverse, body)

      case Some(Id("null")) =>
        next(); expectOp(";"); NullStmt

      case Some(Id("declare")) | Some(Id("begin")) =>
        parseBlock()

      case Some(Id("while")) =>
        throw new IllegalArgumentException(
          "PL/pgSQL 'while' is not supported: unbounded iteration has no " +
            "finite expression form (use FOR with literal bounds, or " +
            "restate set-wise over a DataFrame)")

      case Some(Id(j)) if j == "exit" || j == "continue" =>
        next()
        val when = peek match {
          case Some(Op(";")) => next(); None
          case Some(Id("when")) => next(); Some(exprUntil(Set.empty))
          case t => throw new IllegalArgumentException(
            s"'$j' takes only an optional WHEN clause (loop labels are " +
              s"not supported); found ${t.map(_.sql)}")
        }
        LoopJump(isExit = j == "exit", when)
      case Some(Id("select")) | Some(Id("perform")) |
           Some(Id("insert")) | Some(Id("update")) | Some(Id("delete")) =>
        throw new IllegalArgumentException(
          "statements touching relations (SELECT INTO / PERFORM / DML) are " +
            "not supported in compiled scalar functions; express data " +
            "access set-wise (joins) — see sources/Triggers.scala for the " +
            "trigger-body shapes")

      case Some(Id(name)) if !reserved(name) =>
        next()
        peek match {
          case Some(Op(":=")) | Some(Op("=")) =>
            next(); Assign(name, exprUntil(Set.empty))
          case t => throw new IllegalArgumentException(
            s"expected ':=' after '$name' but found ${t.map(_.sql)}")
        }
      case t => throw new IllegalArgumentException(
        s"unsupported statement start: ${t.map(_.sql)}")
    }

    private def intLit(toks: Vector[Tok], what: String): Long = toks match {
      case Vector(Num(s)) if !s.contains('.') => s.toLong
      case Vector(Op("-"), Num(s)) if !s.contains('.') => -s.toLong
      case _ => throw new IllegalArgumentException(
        s"$what must be an integer literal (got '${render(toks)}'): loop " +
          "unrolling needs compile-time bounds")
    }
  }

  /** PG type name → the one spelling BOTH engines parse in CAST(NULL AS t)
    * (STRING is a DuckDB VARCHAR alias and the Spark native name).
    */
  private def mapType(pg: String): String =
    pg.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "int" | "integer" | "int4"            => "INT"
      case "smallint" | "int2"                   => "SMALLINT"
      case "bigint" | "int8"                     => "BIGINT"
      case "real" | "float4"                     => "FLOAT"
      case "double precision" | "float8" | "double" => "DOUBLE"
      case "text" | "varchar" | "bpchar" | "char" | "string" => "STRING"
      case "bool" | "boolean"                    => "BOOLEAN"
      case "date"                                => "DATE"
      case "timestamp"                           => "TIMESTAMP"
      case t if t.startsWith("numeric") || t.startsWith("decimal") =>
        t.toUpperCase(java.util.Locale.ROOT)
      case other => throw new IllegalArgumentException(
        s"unsupported PL/pgSQL type '$other'")
    }

  // ---------- substitution ----------

  /** Replace variable references with their current value expressions.
    * A match is an Id token equal to an env key; env values splice in
    * parenthesized so operator precedence of the surrounding slice holds.
    */
  private def subst(toks: Vector[Tok], env: Map[String, String]): Vector[Tok] =
    toks.map {
      case Id(s) if env.contains(s) => Raw("(" + env(s) + ")")
      case t => t
    }

  // ---------- compiled function ----------

  /** A compiled scalar function. [[call]] yields portable SQL text;
    * Spark evaluates it via `expr`/`selectExpr` (native Catalyst tree,
    * whole-stage codegen), and the same text may be spliced into an
    * oracle engine.
    */
  final case class PlFunction private[functions] (
      name: String,
      paramNames: Vector[String],
      returnType: String,
      private val bodyExpr: String,
      private val maxInlineDepth: Int) {

    /** The function body as one SQL expression at full inline depth, with
      * parameters still free identifiers — useful for inspection/tests.
      */
    lazy val expressionSql: String = exprAtDepth(maxInlineDepth)

    // plain map + synchronized: exprAtDepth(d) recurses into d-1 while
    // memoizing, which a ConcurrentHashMap.computeIfAbsent would reject
    // as a recursive update
    private val depthCache = scala.collection.mutable.HashMap[Int, String]()

    private def exprAtDepth(d: Int): String = synchronized {
      depthCache.get(d) match {
        case Some(s) => s
        case None =>
          val v =
            if (d <= 0) s"CAST(NULL AS $returnType)"
            else inlineSelf(lex(bodyExpr), d - 1)
          depthCache(d) = v
          v
      }
    }

    /** Inline `name(arg, …)` self-calls: each becomes the body at one
      * less depth with the (recursively processed) argument texts bound.
      */
    private def inlineSelf(toks: Vector[Tok], d: Int): String = {
      val out = Vector.newBuilder[Tok]
      var i = 0
      while (i < toks.length) {
        toks(i) match {
          case Id(`name`) if i + 1 < toks.length && toks(i + 1) == Op("(") =>
            var depth = 1
            var j = i + 2
            val args = Vector.newBuilder[Vector[Tok]]
            val cur = Vector.newBuilder[Tok]
            while (depth > 0) {
              require(j < toks.length, s"unbalanced parens in $name(...) call")
              toks(j) match {
                case Op("(") => depth += 1; cur += toks(j)
                case Op(")") =>
                  depth -= 1
                  if (depth > 0) cur += toks(j)
                case Op(",") if depth == 1 =>
                  args += cur.result(); cur.clear()
                case t => cur += t
              }
              j += 1
            }
            args += cur.result()
            val argTexts = args.result().map(a => inlineSelf(a, d))
            out += Raw("(" + substituteParams(exprAtDepth(d), argTexts) + ")")
            i = j
          case t => out += t; i += 1
        }
      }
      render(out.result())
    }

    private def substituteParams(exprSql: String,
        args: Seq[String]): String = {
      require(args.length == paramNames.length,
        s"$name expects ${paramNames.length} args, got ${args.length}")
      val byName = paramNames.zip(args).toMap
      val byPos = paramNames.indices
        .map(i => ("$" + (i + 1)) -> args(i)).toMap
      render(lex(exprSql).map {
        case Id(s) if byName.contains(s) => Raw("(" + byName(s) + ")")
        case Id(s) if byPos.contains(s) => Raw("(" + byPos(s) + ")")
        case t => t
      })
    }

    /** SQL text of `name(args…)` with the body inlined — pass column
      * names or any SQL expressions.
      */
    def call(args: String*): String =
      "(" + substituteParams(expressionSql, args) + ")"
  }

  /** Register `fn` in the session's function registry so SQL can call it
    * BY NAME — the full `CREATE FUNCTION … ; SELECT f(col) FROM t` shape
    * (the reference resolves pg_proc and interprets per row; here name
    * resolution happens once at registration and every call site splices
    * the compiled expression tree inline, exactly like the reference's
    * LANGUAGE sql inlining in clauses.c:inline_function — so the planner
    * sees plain Catalyst operators, never an opaque function). The body
    * is parsed ONCE; each call transforms the parameter attributes into
    * the call site's argument expressions. Requires named parameters
    * (positional-only `$n` functions have no attribute form to bind). */
  def register(spark: org.apache.spark.sql.SparkSession,
               fn: PlFunction): Unit = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    require(fn.paramNames.forall(!_.startsWith("$")),
      s"register needs named parameters; ${fn.name} has positional-only")
    val template = spark.sessionState.sqlParser.parseExpression(fn.expressionSql)
    val lowered = fn.paramNames.map(_.toLowerCase(java.util.Locale.ROOT))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn.name,
      (children: Seq[Expression]) => {
        require(children.length == fn.paramNames.length,
          s"${fn.name} expects ${fn.paramNames.length} args, " +
            s"got ${children.length}")
        val byName = lowered.zip(children).toMap
        template.transformUp {
          case a: UnresolvedAttribute
            if a.nameParts.length == 1 &&
              byName.contains(a.name.toLowerCase(java.util.Locale.ROOT)) =>
            byName(a.name.toLowerCase(java.util.Locale.ROOT))
        }
      },
      // the registry's closed source vocabulary: sql_udf is the honest
      // label — the function arrived as SQL-ish source text and lowers
      // to a plain expression, the same thing Spark's own SQL UDFs do
      "sql_udf")
  }

  // ---------- CREATE FUNCTION front door ----------

  /** Compile `CREATE [OR REPLACE] FUNCTION name(params) RETURNS type AS
    * <body> LANGUAGE {plpgsql|sql}`. Body quoting: \$\$…\$\$, \$tag\$…\$tag\$,
    * or '…' with doubled quotes (the reference's regress uses all three).
    */
  def compile(createSql: String, maxInlineDepth: Int = 8,
              maxLoopUnroll: Int = 1000): PlFunction = {
    val (header, body, language) = splitCreate(createSql)
    val h = new P(lex(header))
    h.expectId("create")
    if (h.isId("or")) { h.next(); h.expectId("replace") }
    h.expectId("function")
    val fname = h.next() match {
      case Id(s) if !reserved(s) => s
      case t => throw new IllegalArgumentException(
        s"bad function name '${t.sql}'")
    }
    h.expectOp("(")
    val params = Vector.newBuilder[(String, String)] // name -> mapped type
    var pi = 0
    while (!h.peek.contains(Op(")"))) {
      // one param: [IN] [name] type…  — collect tokens to ',' or ')'
      val g = Vector.newBuilder[Tok]
      while (!h.peek.contains(Op(",")) && !h.peek.contains(Op(")"))) {
        g += h.next()
      }
      if (h.peek.contains(Op(","))) h.next()
      pi += 1
      var toks = g.result()
      require(toks.nonEmpty, "empty parameter")
      toks.head match {
        case Id("out") | Id("inout") => throw new IllegalArgumentException(
          "OUT/INOUT parameters are not supported (scalar functions only)")
        case Id("in") => toks = toks.tail
        case _ =>
      }
      // named iff ≥2 tokens and the first is a non-reserved, non-type id
      val (pname, tyToks) = toks match {
        case Id(s) +: rest if rest.nonEmpty && !reserved(s) &&
          scala.util.Try(mapType(s)).isFailure => (s, rest)
        case _ => ("$" + pi, toks)
      }
      params += ((pname, mapType(render(tyToks))))
    }
    h.expectOp(")")
    h.expectId("returns")
    val retToks = Vector.newBuilder[Tok]
    while (!h.atEnd && !h.isId("as")) retToks += h.next()
    val retType = mapType(render(retToks.result()))
    val paramPairs = params.result()
    val paramNames = paramPairs.map(_._1)
    require(paramNames.distinct.length == paramNames.length,
      "duplicate parameter names")

    val bodyExpr = language match {
      case "plpgsql" =>
        val p = new P(lex(body))
        // optional <<label>> before the block
        if (p.peek.contains(Op("<"))) {
          p.expectOp("<"); p.expectOp("<")
          p.next() // label
          p.expectOp(">"); p.expectOp(">")
        }
        val block = p.parseBlock()
        require(p.atEnd, "trailing tokens after END in PL/pgSQL body")
        // compilation recurses once per unrolled iteration through the
        // continuation chain; a dedicated big-stack thread keeps large
        // (but budgeted) loops from overflowing the caller's stack —
        // compile-time only, never on the query path
        withDeepStack(compileBody(block, paramPairs, retType, maxLoopUnroll))
      case "sql" =>
        val toks = lex(body)
        val inner = toks match {
          case Id("select") +: rest => rest
          case other => other
        }
        // only a TOP-LEVEL FROM is table access: EXTRACT(x FROM y),
        // SUBSTRING(s FROM n), TRIM(LEADING FROM s) carry FROM inside
        // their own parens and are plain scalar syntax
        var fromDepth = 0
        inner.foreach {
          case Op("(") => fromDepth += 1
          case Op(")") => fromDepth -= 1
          case Id("from") if fromDepth == 0 =>
            throw new IllegalArgumentException(
              "LANGUAGE sql bodies must be a single scalar SELECT " +
                "expression (no FROM): table access belongs in the " +
                "calling query")
          case _ =>
        }
        val trimmed = if (inner.lastOption.contains(Op(";")))
          inner.dropRight(1) else inner
        // PG coerces the SQL function's result to the declared return
        // type (check_sql_fn_retval)
        s"CAST((${render(trimmed)}) AS $retType)"
      case other => throw new IllegalArgumentException(
        s"unsupported LANGUAGE $other (plpgsql and sql are compiled)")
    }
    PlFunction(fname, paramNames, retType, bodyExpr, maxInlineDepth)
  }

  /** Split CREATE FUNCTION text into (header, body, language) across the
    * AS <quoted body> … LANGUAGE <l> tail; tolerates either clause order.
    */
  private def splitCreate(sql: String): (String, String, String) = {
    val t = sql.trim
    // find the body quote: $tag$ … $tag$ or a '…' string after AS
    val asIdx = {
      val m = "(?i)\\bAS\\b".r.findAllMatchIn(t)
        .find { mm =>
          val rest = t.substring(mm.end).trim
          rest.startsWith("$") || rest.startsWith("'")
        }
      require(m.isDefined, "no AS <body> clause found")
      m.get
    }
    val header = t.substring(0, asIdx.start)
    val afterAs = t.substring(asIdx.end).trim
    val (body, tail) =
      if (afterAs.startsWith("$")) {
        val close = afterAs.indexOf('$', 1)
        require(close > 0, "unterminated dollar-quote tag")
        val tag = afterAs.substring(0, close + 1)
        val end = afterAs.indexOf(tag, tag.length)
        require(end > 0, s"unterminated dollar-quoted body ($tag)")
        (afterAs.substring(tag.length, end),
          afterAs.substring(end + tag.length))
      } else {
        // '…' with doubled-quote escapes
        var i = 1
        val sb = new StringBuilder
        var done = false
        while (!done) {
          require(i < afterAs.length, "unterminated quoted body")
          if (afterAs(i) == '\'') {
            if (i + 1 < afterAs.length && afterAs(i + 1) == '\'') {
              sb += '\''; i += 2
            } else { i += 1; done = true }
          } else { sb += afterAs(i); i += 1 }
        }
        (sb.toString, afterAs.substring(i))
      }
    val langM = "(?i)\\bLANGUAGE\\s+(\\w+)".r.findFirstMatchIn(tail)
      .orElse("(?i)\\bLANGUAGE\\s+(\\w+)".r.findFirstMatchIn(header))
    require(langM.isDefined, "no LANGUAGE clause found")
    (header, body, langM.get.group(1).toLowerCase(java.util.Locale.ROOT))
  }

  /** The %-formatted RAISE message as one string expression: literal
    * segments concatenated with each argument rendered via
    * COALESCE(CAST(arg AS STRING), '<NULL>') — exec_stmt_raise prints
    * `<NULL>` for null parameters; `%%` is a literal percent. Counts
    * must match, like the reference's "too many/few parameters" errors.
    */
  /** Count % placeholders in a RAISE message (%% is a literal). */
  private def countHoles(msg: String): Int = {
    var i = 0; var holes = 0
    while (i < msg.length) {
      if (msg(i) == '%') {
        if (i + 1 < msg.length && msg(i + 1) == '%') i += 2
        else { holes += 1; i += 1 }
      } else i += 1
    }
    holes
  }

  private def raiseMsgSql(msg: String, args: Seq[String]): String = {
    val segs = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    var holes = 0
    while (i < msg.length) {
      if (msg(i) == '%') {
        if (i + 1 < msg.length && msg(i + 1) == '%') { cur += '%'; i += 2 }
        else { segs += cur.toString; cur.clear(); holes += 1; i += 1 }
      } else { cur += msg(i); i += 1 }
    }
    segs += cur.toString
    val ss = segs.result()
    require(holes == args.length,
      s"RAISE message has $holes % placeholders but ${args.length} " +
        "parameters (the reference raises the same complaint)")
    val lit = ss.map(s => Str(s).sql)
    if (args.isEmpty) lit.head
    else args.indices.map(j =>
      s"${lit(j)} || COALESCE(CAST((${args(j)}) AS STRING), '<NULL>') || ")
      .mkString + lit.last
  }

  /** Run `f` on a dedicated thread with a large stack (the scalac
    * idiom for deep recursive compilation). */
  private def withDeepStack[T](f: => T): T = {
    var out: Either[Throwable, T] = Left(new IllegalStateException("no result"))
    val t = new Thread(null, () => {
      out = try Right(f) catch { case e: Throwable => Left(e) }
    }, "plpgsql-compile", 256L * 1024 * 1024)
    t.start()
    t.join()
    out.fold(e => throw e, identity)
  }

  // ---------- the Froid core ----------

  private def compileBody(block: SubBlock, paramPairs: Vector[(String, String)],
      retType: String, maxLoopUnroll: Int): String = {
    val paramNames = paramPairs.map(_._1)
    paramNames.foreach(p => require(!reserved(p),
      s"parameter name '$p' is a reserved word"))

    // continuation-passing execution: k(env) = SQL for "control fell
    // past these statements". Inside a FOR loop two more continuations
    // exist — exitK (EXIT: jump past all remaining iterations) and
    // nextK (CONTINUE: jump to the next iteration) — threaded through
    // every construct and RE-WRAPPED by SubBlock so a jump out of a
    // nested block pops that block's declarations first (PG block scope
    // ends at the jump, pl_exec.c exec_stmt_exit unwinding).
    // `types` carries each in-scope variable's declared SQL type: every
    // assignment, initializer and RETURN is CAST to it, because PG
    // evaluates those through the variable's type — `d := x / 2` on
    // bigints is INTEGER division (trunc toward zero) in the reference,
    // while the raw substituted text would float through Spark's
    // fractional `/`. CAST-on-assign reproduces the truncation exactly
    // (both engines truncate toward zero casting to integral types).
    // Residual documented divergence: assigning a FRACTIONAL value to an
    // integer variable ROUNDS in PG (numeric->int cast) but truncates
    // here; integer-`/`-integer, the shape that matters, is exact, and
    // bigint quotients are exact up to 2^52 (the double mantissa).
    type K = Map[String, String] => String
    type Types = Map[String, String]
    def go(stmts: List[Stmt], env: Map[String, String], types: Types,
        k: K, exitK: Option[K], nextK: Option[K]): String = stmts match {
      case Nil => k(env)
      case Assign(v, e) :: rest =>
        require(env.contains(v),
          s"assignment to undeclared variable '$v'")
        val cast = s"CAST((${render(subst(e, env))}) AS ${types(v)})"
        go(rest, env + (v -> cast), types, k, exitK, nextK)
      case Ret(e) :: _ =>
        s"CAST((${render(subst(e, env))}) AS $retType)"
      case Raise(msg, args) :: _ =>
        val argSqls = args.map(a => render(subst(a, env)))
        s"CAST(RAISE_ERROR(${raiseMsgSql(msg, argSqls)}) AS $retType)"
      case LoopJump(isExit, when) :: rest =>
        val jump = (if (isExit) exitK else nextK).getOrElse(
          throw new IllegalArgumentException(
            s"${if (isExit) "EXIT" else "CONTINUE"} outside a loop"))
        when match {
          case None => jump(env)
          case Some(c) =>
            s"CASE WHEN ${render(subst(c, env))} THEN (${jump(env)}) " +
              s"ELSE (${go(rest, env, types, k, exitK, nextK)}) END"
        }
      case NullStmt :: rest => go(rest, env, types, k, exitK, nextK)
      case IfStmt(branches, els) :: rest =>
        val cont: K = e2 => go(rest, e2, types, k, exitK, nextK)
        val arms = branches.map { case (c, body) =>
          s"WHEN ${render(subst(c, env))} THEN " +
            s"(${go(body.toList, env, types, cont, exitK, nextK)})"
        }
        val elseSql = go(els.toList, env, types, cont, exitK, nextK)
        s"CASE ${arms.mkString(" ")} ELSE ($elseSql) END"
      case ForLoop(v, lo, hi, rev, body) :: rest =>
        // REVERSE iterates first-bound DOWN to second (pl_exec.c
        // exec_stmt_fori: reverse swaps the step, not the bounds)
        val idxs = if (rev) lo.to(hi, -1L) else lo.to(hi)
        require(idxs.length <= maxLoopUnroll,
          s"FOR loop spans ${idxs.length} iterations, above the " +
            s"$maxLoopUnroll unroll budget (maxLoopUnroll): each " +
            "iteration becomes expression text, so huge literal ranges " +
            "belong in a set-wise rewrite, not a scalar function")
        // loop var is auto-declared for the loop's scope (pl_gram.y for_control)
        val saved = env.get(v)
        val after: K = e2 =>
          go(rest, saved.fold(e2 - v)(old => e2 + (v -> old)),
            types, k, exitK, nextK)
        val bodyTypes = types + (v -> "BIGINT")
        // one iteration at a time so CONTINUE has a precise "rest of the
        // iterations" continuation; EXIT jumps straight to `after`
        def iter(remaining: List[Long], e: Map[String, String]): String =
          remaining match {
            case Nil => after(e)
            case i :: tail =>
              val bound = e + (v -> (if (i < 0) s"($i)" else i.toString))
              val toNext: K = e2 => iter(tail, e2)
              go(body.toList, bound, bodyTypes, toNext,
                exitK = Some(after), nextK = Some(toNext))
          }
        iter(idxs.toList, env)
      case SubBlock(decls, body) :: rest =>
        var e = env
        var t2 = types
        val shadowed = decls.map(d =>
          d.name -> (env.get(d.name), types.get(d.name)))
        decls.foreach { d =>
          require(!reserved(d.name), s"reserved variable name '${d.name}'")
          val init = d.init.map(x => s"CAST((${render(subst(x, e))}) AS ${d.sqlType})")
            .getOrElse(s"CAST(NULL AS ${d.sqlType})")
          e = e + (d.name -> init)
          t2 = t2 + (d.name -> d.sqlType)
        }
        val pop: Map[String, String] => Map[String, String] = e2 =>
          shadowed.foldLeft(e2) {
            case (m, (nm, (Some(old), _))) => m + (nm -> old)
            case (m, (nm, (None, _))) => m - nm
          }
        val restore: K = e2 => go(rest, pop(e2), types, k, exitK, nextK)
        go(body.toList, e, t2, restore,
          exitK.map(x => (e2: Map[String, String]) => x(pop(e2))),
          nextK.map(n => (e2: Map[String, String]) => n(pop(e2))))
    }

    // Parameters seed the environment mapped to THEMSELVES: unassigned
    // ones stay free identifiers for call-time substitution, while
    // assignment to a parameter (legal PL/pgSQL — recursion_test's regress
    // siblings do it) just rebinds the env entry like any variable.
    var env: Map[String, String] = paramNames.map(p => p -> p).toMap
    var types: Types = paramPairs.toMap
    block.decls.foreach { d =>
      require(!reserved(d.name), s"reserved variable name '${d.name}'")
      require(!paramNames.contains(d.name),
        s"variable '${d.name}' shadows a parameter")
      val init = d.init.map(t => s"CAST((${render(subst(t, env))}) AS ${d.sqlType})")
        .getOrElse(s"CAST(NULL AS ${d.sqlType})")
      env = env + (d.name -> init)
      types = types + (d.name -> d.sqlType)
    }
    go(block.body.toList, env, types,
      _ => s"CAST(NULL AS $retType)", None, None)
  }
}
