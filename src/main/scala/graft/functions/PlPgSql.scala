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
  *   - FOR i IN [REVERSE] lo..hi LOOP — literal bounds unroll exactly
  *     (the reference interprets, we pay compile-time size instead);
  *     NON-literal bounds evaluate once at entry (exec_stmt_fori) and
  *     unroll to `maxCondLoopUnroll` guarded iterations. EXIT [WHEN] /
  *     CONTINUE [WHEN] (exec_stmt_exit): the unroll gives every
  *     iteration a precise next-iteration continuation, so both jumps
  *     compile to plain CASE arms (no labels)
  *   - WHILE cond LOOP (exec_stmt_while) — unrolled to
  *     `maxCondLoopUnroll` condition-guarded iterations; a loop still
  *     live past the budget raises LOUDLY at run time. The compiled
  *     form is for short loops (digit scans, bounded convergence);
  *     unbounded iteration belongs in a set-wise rewrite
  *   - BEGIN … EXCEPTION WHEN cond THEN … END (exec_stmt_block's
  *     subtransaction path, pl_exec.c:1685) for the statically-
  *     enumerable error classes a compiled body can raise:
  *     raise_exception, assert_failure, case_not_found,
  *     division_by_zero (every division in the protected region gets a
  *     divisor-zero guard), and OTHERS (which, like the reference,
  *     does not catch assert_failure). Handlers see variables at their
  *     error-time values plus SQLERRM/SQLSTATE; bare RAISE re-throws
  *   - RETURNS SETOF t with RETURN NEXT / RETURN QUERY (FROM-less
  *     SELECT and VALUES rows) — the body compiles to ONE ARRAY<t>
  *     expression and callers explode() it: the Generator lowering of
  *     the reference's per-row tuplestore (exec_stmt_return_next)
  *   - RETURN expr; falling off the end of a scalar body raises
  *     'control reached end of function without RETURN' like the
  *     reference (SETOF bodies legally end their result set)
  *   - bounded self-recursion: self-calls inline to `maxInlineDepth`
  *     frames; the depth-0 frame raises 'recursion depth exceeded'
  *     loudly (callers declare the depth their data needs — see
  *     q_plpgsql_recursive, whose argument bounds the depth)
  *   - LANGUAGE sql bodies (`SELECT <expr>`) — direct inline, the
  *     clauses.c:inline_function analogue
  *
  * PG integer semantics: `/` between provably-integral operands is
  * rewritten to the truncating `div` operator in EVERY position
  * (conditions and compound expressions included — int4div/int8div),
  * and fractional values assigned/returned into integer-typed slots go
  * through round(x, 0) first, matching the reference's
  * half-away-from-zero numeric→int cast. Both analyses are
  * conservative: unknown grammar leaves the slice untouched.
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
  * Deliberately rejected (loud errors, documented): loop labels, SELECT
  * INTO and any statement touching relations (a scalar expression cannot
  * embed a scan; the reference's regress uses those only in trigger
  * bodies, whose set-based replacement is `sources/Triggers.scala`), OUT
  * params, RETURN QUERY with FROM (table-valued — DataFrames), and
  * exception conditions outside the statically-enumerable set.
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
  /** One EXCEPTION clause arm: `WHEN cond [OR cond…] THEN stmts`.
    * Conditions are the statically-enumerable error classes the
    * compiled body can raise (exception_matches_conditions,
    * pl_exec.c:1556). */
  private final case class Handler(conds: Vector[String],
      body: Vector[Stmt])
  private sealed trait Stmt
  private final case class Assign(name: String, expr: Vector[Tok]) extends Stmt
  private final case class IfStmt(
      branches: Vector[(Vector[Tok], Vector[Stmt])],
      els: Vector[Stmt]) extends Stmt
  private final case class Ret(expr: Vector[Tok]) extends Stmt
  /** Bare `RETURN;` — legal only in SETOF bodies (ends the result set). */
  private case object BareRet extends Stmt
  /** `RETURN NEXT expr;` — appends one element to the SETOF result. */
  private final case class RetNext(expr: Vector[Tok]) extends Stmt
  /** `RETURN QUERY SELECT e;` / `RETURN QUERY VALUES (e1),(e2)…;` —
    * appends the listed scalar rows to the SETOF result (the FROM-less
    * compilable subset of exec_stmt_return_query). */
  private final case class RetQueryRows(rows: Vector[Vector[Tok]]) extends Stmt
  private final case class ForLoop(v: String, lo: Long, hi: Long,
      reverse: Boolean, body: Vector[Stmt]) extends Stmt
  /** FOR with non-literal bounds: both bound expressions are evaluated
    * ONCE at loop entry (exec_stmt_fori), then the loop unrolls to the
    * condition-guarded budget like WHILE. */
  private final case class ForLoopDyn(v: String, lo: Vector[Tok],
      hi: Vector[Tok], reverse: Boolean, body: Vector[Stmt]) extends Stmt
  /** WHILE cond LOOP — unrolled to `maxCondLoopUnroll` condition-guarded
    * iterations; exceeding the budget at RUN time raises loudly. */
  private final case class WhileLoop(cond: Vector[Tok],
      body: Vector[Stmt]) extends Stmt
  private final case class SubBlock(decls: Vector[Decl],
      handlers: Vector[Handler], body: Vector[Stmt]) extends Stmt
  /** RAISE EXCEPTION 'msg with %' , arg, … — terminal like RETURN
    * unless an enclosing block's EXCEPTION clause catches `cls`.
    * Lower severities (NOTICE/WARNING/…) are logging, which a pure
    * expression has nowhere to emit — parsed and dropped, documented. */
  private final case class Raise(cls: String, msg: String,
      args: Vector[Vector[Tok]]) extends Stmt
  /** Bare `RAISE;` — re-throws the caught error, only inside a handler. */
  private case object ReRaise extends Stmt
  /** EXIT/CONTINUE [WHEN cond] inside a loop (exec_stmt_exit).
    * The loop is unrolled, so these compile to jumps into the loop-end
    * (EXIT) or next-iteration (CONTINUE) continuations. */
  private final case class LoopJump(isExit: Boolean,
      when: Option[Vector[Tok]]) extends Stmt
  private case object NullStmt extends Stmt

  /** The exception-condition names a compiled handler may catch — each
    * maps to a raise site the compiler itself plants, so matching is
    * decidable at compile time (What compiled bodies can throw:
    * RAISE EXCEPTION, ASSERT, CASE-not-found, and guarded divisions). */
  private val knownConds: Map[String, String] = Map(      // name -> SQLSTATE
    "others" -> "",
    "division_by_zero" -> "22012",
    "raise_exception" -> "P0001",
    "assert_failure" -> "P0004",
    "case_not_found" -> "20000")

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

  private final class P(toks: Vector[Tok], setof: Boolean = false) {
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

    /** Reject a RETURN QUERY SELECT slice that tries table access or
      * multiple output columns. */
    def rejectTableish(e: Vector[Tok], what: String): Unit = {
      var depth = 0
      e.foreach {
        case Op("(") => depth += 1
        case Op(")") => depth -= 1
        case Id("from") if depth == 0 =>
          throw new IllegalArgumentException(
            s"$what with FROM is not supported in compiled functions: " +
              "table access belongs in the calling query (set-wise)")
        case Op(",") if depth == 0 =>
          throw new IllegalArgumentException(
            s"$what must produce a single column " +
              "(SETOF scalar functions return one column)")
        case _ =>
      }
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
      val body = parseStmts(Set("end", "exception"))
      // EXCEPTION WHEN cond [OR cond…] THEN stmts …  (pl_exec.c:1685
      // exec_stmt_block's BEGIN … EXCEPTION subtransaction path; the
      // compilable subset is handlers over the statically-enumerable
      // classes in [[knownConds]] — anything else rejects loudly).
      val handlers = Vector.newBuilder[Handler]
      if (isId("exception")) {
        next()
        while (isId("when")) {
          next()
          val conds = Vector.newBuilder[String]
          var more = true
          while (more) {
            val c = next() match {
              case Id(s) => s
              case t => throw new IllegalArgumentException(
                s"bad exception condition '${t.sql}'")
            }
            require(knownConds.contains(c),
              s"unsupported exception condition '$c': compiled handlers " +
                s"cover the statically-enumerable classes " +
                s"${knownConds.keys.toSeq.sorted.mkString(", ")} " +
                "(pl_exec.c:1556 exception_matches_conditions)")
            conds += c
            if (isId("or")) next() else more = false
          }
          expectId("then")
          handlers += Handler(conds.result(),
            parseStmts(Set("when", "end")))
        }
        require(handlers.result().nonEmpty,
          "EXCEPTION section with no WHEN handler")
      }
      expectId("end")
      // optional trailing label/semicolon handled by caller
      if (peek.contains(Op(";"))) next()
      SubBlock(decls.result(), handlers.result(), body)
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
        next()
        peek match {
          case Some(Op(";")) =>
            next(); BareRet
          case Some(Id("next")) if setof =>
            next(); RetNext(exprUntil(Set.empty))
          case Some(Id("query")) if setof =>
            next()
            peek match {
              case Some(Id("select")) =>
                next()
                val e = exprUntil(Set.empty)
                rejectTableish(e, "RETURN QUERY SELECT")
                RetQueryRows(Vector(e))
              case Some(Id("values")) =>
                next()
                val rows = Vector.newBuilder[Vector[Tok]]
                var more = true
                while (more) {
                  expectOp("(")
                  val row = Vector.newBuilder[Tok]
                  var depth = 0
                  var closed = false
                  while (!closed) {
                    require(!atEnd, "unterminated VALUES row")
                    next() match {
                      case Op("(") => depth += 1; row += Op("(")
                      case Op(")") if depth == 0 => closed = true
                      case Op(")") => depth -= 1; row += Op(")")
                      case Op(",") if depth == 0 =>
                        throw new IllegalArgumentException(
                          "RETURN QUERY VALUES rows must be single-column " +
                            "(SETOF scalar functions return one column)")
                      case t => row += t
                    }
                  }
                  val r = row.result()
                  require(r.nonEmpty, "empty VALUES row")
                  rows += r
                  peek match {
                    case Some(Op(",")) => next()
                    case Some(Op(";")) => next(); more = false
                    case t => throw new IllegalArgumentException(
                      s"expected ',' or ';' after VALUES row, found " +
                        s"${t.map(_.sql)}")
                  }
                }
                RetQueryRows(rows.result())
              case t => throw new IllegalArgumentException(
                "RETURN QUERY supports only the FROM-less SELECT <expr> " +
                  s"and VALUES (e),(e)… forms (found ${t.map(_.sql)}); " +
                  "table-reading set functions belong in a DataFrame")
            }
          case _ => Ret(exprUntil(Set.empty))
        }

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
        IfStmt(bs, els.getOrElse(Vector(
          Raise("case_not_found", "case not found", Vector.empty))))

      // RAISE level 'message % with % holes', arg, …  (pl_exec.c
      // exec_stmt_raise). EXCEPTION is terminal (compiles to
      // raise_error with the %-formatted message, <NULL> for null args
      // like the reference); NOTICE/WARNING/INFO/LOG/DEBUG are pure
      // logging — an expression has nowhere to log, so they parse and
      // drop. USING and bare re-throw RAISE are rejected.
      case Some(Id("raise")) =>
        next()
        if (peek.contains(Op(";"))) {
          // bare re-throw — validated against handler context at compile
          next()
          return ReRaise
        }
        val level = peek match {
          case Some(Id(l)) if Set("exception", "notice", "warning",
            "info", "log", "debug")(l) => next(); l
          case t => throw new IllegalArgumentException(
            s"RAISE needs an explicit level (found ${t.map(_.sql)}); " +
              "bare re-throw RAISE is only valid inside an exception " +
              "handler")
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
        if (level == "exception") Raise("raise_exception", msgTok, argToks)
        else NullStmt

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
          Vector(Raise("assert_failure", msg, Vector.empty)))), Vector.empty)

      case Some(Id("for")) =>
        next()
        val v = next() match {
          case Id(s) if !reserved(s) => s
          case t => throw new IllegalArgumentException(
            s"bad FOR variable '${t.sql}'")
        }
        expectId("in")
        val reverse = if (isId("reverse")) { next(); true } else false
        val loE = exprUntil(Set(".."))
        expectOp("..")
        val hiE = exprUntil(Set("loop"))
        expectId("loop")
        val body = parseStmts(Set("end"))
        expectId("end"); expectId("loop"); expectOp(";")
        (intLit(loE), intLit(hiE)) match {
          case (Some(lo), Some(hi)) => ForLoop(v, lo, hi, reverse, body)
          case _ =>
            // non-literal bounds (exec_stmt_fori evaluates them once at
            // entry): compiles to the condition-guarded budgeted unroll
            ForLoopDyn(v, loE, hiE, reverse, body)
        }

      case Some(Id("null")) =>
        next(); expectOp(";"); NullStmt

      case Some(Id("declare")) | Some(Id("begin")) =>
        parseBlock()

      case Some(Id("while")) =>
        next()
        val cond = exprUntil(Set("loop"))
        expectId("loop")
        val body = parseStmts(Set("end"))
        expectId("end"); expectId("loop"); expectOp(";")
        WhileLoop(cond, body)

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
      // SELECT … INTO var — the FROM-less single-expression form is just
      // an assignment (exec_stmt_execsql's trivial case; pl_exec.c:311),
      // in both orders PG accepts (`SELECT e INTO v` and the historical
      // `SELECT INTO v e`); INTO STRICT is a no-op here (a FROM-less
      // SELECT always yields exactly one row). Anything with FROM keeps
      // the loud set-wise rejection.
      case Some(Id("select")) =>
        next()
        def intoVar(): String = next() match {
          case Id(s) if !reserved(s) => s
          case t => throw new IllegalArgumentException(
            s"bad SELECT INTO target '${t.sql}'")
        }
        def rejectFrom(): Nothing = throw new IllegalArgumentException(
          "SELECT with FROM is not supported in compiled functions; " +
            "express data access set-wise (joins) — see " +
            "sources/Triggers.scala for the trigger-body shapes")
        if (isId("into")) {
          next()
          if (isId("strict")) next()
          val v = intoVar()
          val e = exprUntil(Set("from"))
          if (isId("from")) rejectFrom()
          Assign(v, e)
        } else {
          val e = exprUntil(Set("into", "from"))
          if (isId("from")) rejectFrom()
          expectId("into")
          if (isId("strict")) next()
          val v = intoVar()
          peek match {
            case Some(Id("from")) => rejectFrom()
            case Some(Op(";")) => next()
            case t => throw new IllegalArgumentException(
              s"trailing tokens after SELECT INTO target: ${t.map(_.sql)}")
          }
          Assign(v, e)
        }

      case Some(Id("perform")) |
           Some(Id("insert")) | Some(Id("update")) | Some(Id("delete")) =>
        throw new IllegalArgumentException(
          "statements touching relations (PERFORM / DML) are " +
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

    private def intLit(toks: Vector[Tok]): Option[Long] = toks match {
      case Vector(Num(s)) if !s.contains('.') => Some(s.toLong)
      case Vector(Op("-"), Num(s)) if !s.contains('.') => Some(-s.toLong)
      case _ => None
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

  // ---------- slice typing, integer-division rewrite, divisor harvest ----

  /** Coarse expression type lattice — just enough to decide (a) which
    * `/` operators sit between two integral operands (PG evaluates those
    * as truncating integer division, pl_exec.c via int4div/int8div;
    * Spark's `/` is always fractional, so they rewrite to the infix
    * `div` operator, same precedence tier in SqlBaseParser), and (b)
    * whether a value assigned to an integer variable may be fractional
    * (PG's numeric→int cast ROUNDS half away from zero; a plain Spark
    * CAST truncates, so those casts go through round(x, 0) first). */
  private sealed trait Ty
  private case object TInt extends Ty
  private case object TFrac extends Ty
  private case object TStr extends Ty
  private case object TBool extends Ty
  private case object TOther extends Ty // dates, nulls, unknown calls

  private def tyOfDecl(t: String): Ty = {
    val s = t.trim.toUpperCase(java.util.Locale.ROOT)
    if (s == "INT" || s == "SMALLINT" || s == "BIGINT" || s == "TINYINT")
      TInt
    else if (s == "FLOAT" || s == "DOUBLE" || s.startsWith("DECIMAL") ||
      s.startsWith("NUMERIC")) TFrac
    else if (s == "STRING") TStr
    else if (s == "BOOLEAN") TBool
    else TOther
  }

  private def tyOfTypeName(raw: String): Ty = {
    val s = raw.trim.toLowerCase(java.util.Locale.ROOT)
    if (s.matches("(tiny|small|big)?int(eger)?[248]?")) TInt
    else if (s.startsWith("decimal") || s.startsWith("numeric") ||
      Set("double", "float", "real", "double precision")(s)) TFrac
    else if (Set("string", "text", "varchar", "char", "bpchar")(s)) TStr
    else if (Set("boolean", "bool")(s)) TBool
    else TOther
  }

  private def numCombine(l: Ty, r: Ty): Ty =
    if (l == TInt && r == TInt) TInt
    else if ((l == TInt || l == TFrac) && (r == TInt || r == TFrac)) TFrac
    else TOther
  private def combineSame(l: Ty, r: Ty): Ty =
    if (l == r) l
    else if ((l == TInt || l == TFrac) && (r == TInt || r == TFrac)) TFrac
    else TOther

  /** Result of analyzing one expression slice. When `ok` is false the
    * parse did not cover the slice's grammar — the tokens are returned
    * untouched and no division facts are known (conservative). */
  private final case class Analyzed(toks: Vector[Tok], ty: Ty,
      divisors: Vector[Vector[Tok]], ok: Boolean)

  /** A recursive-descent pass over one expression slice that (1) infers
    * the coarse type, (2) marks `/` operators whose operands are both
    * integral for the div rewrite, and (3) harvests every divisor
    * operand (of `/`, `%`, `div`) for division_by_zero guards. Fails
    * (→ conservative no-op) on grammar it does not model, e.g.
    * EXTRACT(x FROM y) or typed literals. */
  private final class SliceTyper(toks: Vector[Tok],
      types: Map[String, String]) {
    private var i = 0
    val swaps = scala.collection.mutable.BitSet()
    val divisorRanges =
      scala.collection.mutable.ArrayBuffer[(Int, Int)]() // [start, end)
    private def peek: Option[Tok] =
      if (i < toks.length) Some(toks(i)) else None
    private def bump(): Tok = { val t = toks(i); i += 1; t }
    private def fail(msg: String): Nothing =
      throw new IllegalStateException(msg)
    private def expect(t: Tok): Unit =
      if (!peek.contains(t)) fail(s"expected ${t.sql}") else bump()

    def run(): Ty = {
      val t = parseExpr()
      if (i != toks.length) fail("trailing tokens")
      t
    }

    private def parseExpr(): Ty = parseOr()
    private def parseOr(): Ty = {
      var t = parseAnd()
      while (peek.contains(Id("or"))) { bump(); parseAnd(); t = TBool }
      t
    }
    private def parseAnd(): Ty = {
      var t = parseNot()
      while (peek.contains(Id("and"))) { bump(); parseNot(); t = TBool }
      t
    }
    private def parseNot(): Ty =
      if (peek.contains(Id("not"))) { bump(); parseNot(); TBool }
      else parseCmp()
    private def parseCmp(): Ty = {
      val l = parseAdd()
      peek match {
        case Some(Op(o))
          if Set("=", "<>", "!=", "<", "<=", ">", ">=")(o) =>
          bump(); parseAdd(); TBool
        case Some(Id("is")) =>
          bump()
          if (peek.contains(Id("not"))) bump()
          peek match {
            case Some(Id("null")) | Some(Id("true")) | Some(Id("false")) =>
              bump(); TBool
            case _ => fail("IS <what>")
          }
        case Some(Id("between")) => bump(); parseBetween()
        case Some(Id("in")) => bump(); parseIn()
        case Some(Id("like")) => bump(); parseAdd(); TBool
        case Some(Id("not")) =>
          bump()
          peek match {
            case Some(Id("between")) => bump(); parseBetween()
            case Some(Id("in")) => bump(); parseIn()
            case Some(Id("like")) => bump(); parseAdd(); TBool
            case _ => fail("NOT <what>")
          }
        case _ => l
      }
    }
    private def parseBetween(): Ty = {
      parseAdd()
      expect(Id("and"))
      parseAdd()
      TBool
    }
    private def parseIn(): Ty = {
      expect(Op("("))
      parseExpr()
      while (peek.contains(Op(","))) { bump(); parseExpr() }
      expect(Op(")"))
      TBool
    }
    private def parseAdd(): Ty = {
      var t = parseMul()
      var cont = true
      while (cont) peek match {
        case Some(Op("+")) | Some(Op("-")) =>
          bump(); t = numCombine(t, parseMul())
        case Some(Op("||")) => bump(); parseMul(); t = TStr
        case _ => cont = false
      }
      t
    }
    private def parseMul(): Ty = {
      var t = parseUnary()
      var cont = true
      while (cont) peek match {
        case Some(Op("*")) => bump(); t = numCombine(t, parseUnary())
        case Some(Op("/")) =>
          val pos = i
          bump()
          val ds = i
          val r = parseUnary()
          divisorRanges += ((ds, i))
          if (t == TInt && r == TInt) { swaps += pos; t = TInt }
          else t = if ((t == TInt || t == TFrac) &&
            (r == TInt || r == TFrac)) TFrac else TOther
        case Some(Op("%")) =>
          bump()
          val ds = i
          val r = parseUnary()
          divisorRanges += ((ds, i))
          t = numCombine(t, r)
        case Some(Id("div")) =>
          bump()
          val ds = i
          parseUnary()
          divisorRanges += ((ds, i))
          t = TInt
        case _ => cont = false
      }
      t
    }
    private def parseUnary(): Ty = {
      while (peek.contains(Op("+")) || peek.contains(Op("-"))) bump()
      parsePrimary()
    }
    private def parsePrimary(): Ty = peek match {
      case Some(Num(s)) =>
        bump()
        if (s.exists(c => c == '.' || c == 'e' || c == 'E')) TFrac else TInt
      case Some(_: Str) => bump(); TStr
      case Some(_: Raw) => bump(); TOther
      case Some(Op("(")) =>
        bump()
        val t = parseExpr()
        expect(Op(")"))
        t
      case Some(Id("case")) => parseCase()
      case Some(Id("cast")) =>
        bump()
        expect(Op("("))
        parseExpr()
        expect(Id("as"))
        val tb = new StringBuilder
        var depth = 0
        var done = false
        while (!done) peek match {
          case None => fail("unterminated CAST")
          case Some(Op("(")) => depth += 1; tb.append('('); bump()
          case Some(Op(")")) if depth == 0 => bump(); done = true
          case Some(Op(")")) => depth -= 1; tb.append(')'); bump()
          case Some(t0) => tb.append(t0.sql).append(' '); bump()
        }
        tyOfTypeName(tb.toString)
      case Some(Id("null")) => bump(); TOther
      case Some(Id("true")) | Some(Id("false")) => bump(); TBool
      case Some(Id("coalesce")) => bump(); parseCallArgs("coalesce")
      case Some(Id(name)) if !reserved(name) =>
        bump()
        if (peek.contains(Op("("))) parseCallArgs(name)
        else types.get(name).map(tyOfDecl).getOrElse(TOther)
      case t => fail(s"unexpected ${t.map(_.sql)}")
    }
    private def parseCallArgs(name: String): Ty = {
      expect(Op("("))
      val argTys = scala.collection.mutable.ArrayBuffer[Ty]()
      if (!peek.contains(Op(")"))) {
        argTys += parseExpr()
        while (peek.contains(Op(","))) { bump(); argTys += parseExpr() }
      }
      expect(Op(")"))
      fnTy(name, argTys.toSeq)
    }
    private def parseCase(): Ty = {
      bump() // case
      if (!peek.contains(Id("when"))) parseExpr() // simple-case scrutinee
      var res: Option[Ty] = None
      while (peek.contains(Id("when"))) {
        bump()
        parseExpr()
        expect(Id("then"))
        val t = parseExpr()
        res = Some(res.fold(t)(combineSame(_, t)))
      }
      if (peek.contains(Id("else"))) {
        bump()
        val t = parseExpr()
        res = Some(res.fold(t)(combineSame(_, t)))
      }
      expect(Id("end"))
      res.getOrElse(TOther)
    }
    private def fnTy(name: String, args: Seq[Ty]): Ty = name match {
      // floor/ceil are integral in Spark (BIGINT for double input,
      // scale-0 DECIMAL for decimal input — both accepted by div)
      case "floor" | "ceil" | "ceiling" => TInt
      case "abs" | "round" | "trunc" => args.headOption.getOrElse(TOther)
      case "mod" | "pmod" =>
        if (args.length == 2) numCombine(args(0), args(1)) else TOther
      case "coalesce" | "least" | "greatest" | "nullif" =>
        args.reduceOption(combineSame).getOrElse(TOther)
      case "length" | "char_length" | "character_length" | "octet_length" |
           "ascii" | "instr" | "position" => TInt
      case "pow" | "power" | "sqrt" | "exp" | "ln" | "log" | "log10" |
           "log2" | "sin" | "cos" | "tan" | "atan" | "atan2" | "radians" |
           "degrees" => TFrac
      case "concat" | "substr" | "substring" | "upper" | "lower" | "trim" |
           "ltrim" | "rtrim" | "lpad" | "rpad" | "replace" | "repeat" |
           "reverse" | "left" | "right" | "translate" | "format_string" =>
        TStr
      case _ => TOther
    }
  }

  /** Analyze one slice with the in-scope declared types: returns the
    * (possibly div-rewritten) tokens, the inferred type, and the
    * divisor slices. On unmodeled grammar, returns the slice untouched
    * with ok=false. */
  private def analyzeSlice(toks: Vector[Tok],
      types: Map[String, String]): Analyzed = {
    val st = new SliceTyper(toks, types)
    try {
      val ty = st.run()
      val rewritten = toks.zipWithIndex.map {
        case (Op("/"), ix) if st.swaps(ix) => Id("div"): Tok
        case (t, _) => t
      }
      val divs = st.divisorRanges.toVector
        .map { case (s, e) => rewritten.slice(s, e) }
      Analyzed(rewritten, ty, divs, ok = true)
    } catch {
      case _: IllegalStateException | _: IndexOutOfBoundsException =>
        Analyzed(toks, TOther, Vector.empty, ok = false)
    }
  }

  /** Divisors that are provably nonzero literals need no runtime guard
    * (the zero-check would constant-fold anyway — skipping keeps the
    * emitted text small). */
  private def nonzeroLiteral(d: Vector[Tok]): Boolean = d match {
    case Vector(Num(s)) => BigDecimal(s) != 0
    case Vector(Op("-"), Num(s)) => BigDecimal(s) != 0
    case Vector(Op("("), Num(s), Op(")")) => BigDecimal(s) != 0
    case _ => false
  }

  private def integralDecl(t: String): Boolean = tyOfDecl(t) == TInt

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
      private val maxInlineDepth: Int,
      isSetof: Boolean = false) {

    /** The SQL type of the compiled expression: SETOF functions compile
      * to an ARRAY of the declared element type (the caller explodes). */
    def outSqlType: String =
      if (isSetof) s"ARRAY<$returnType>" else returnType

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
          // the depth-0 frame raises LOUDLY at run time (the r18 form
          // yielded typed NULL — silent and indistinguishable from a
          // legitimate result when a caller's data exceeds the declared
          // depth); only rows that actually recurse past the budget
          // evaluate it (lazy CASE arm)
          val v =
            if (d <= 0)
              s"CAST(RAISE_ERROR('recursion depth $maxInlineDepth " +
                s"exceeded in $name (maxInlineDepth)') AS $outSqlType)"
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
    // each parameter occurrence splices the argument expression, so an
    // argument referenced N times evaluates N times — PG evaluates call
    // arguments ONCE. Deterministic args are value-identical (and
    // subexpression elimination recovers the cost); a NON-deterministic
    // arg (rand(), uuid()) would silently produce N different values,
    // so those are rejected unless the parameter is referenced exactly
    // once.
    val occurrences: Map[String, Int] = {
      val counts = scala.collection.mutable.Map.empty[String, Int]
      template.foreach {
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          val n = a.name.toLowerCase(java.util.Locale.ROOT)
          if (lowered.contains(n)) counts(n) = counts.getOrElse(n, 0) + 1
        case _ =>
      }
      lowered.map(p => p -> counts.getOrElse(p, 0)).toMap
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fn.name,
      (children: Seq[Expression]) => {
        require(children.length == fn.paramNames.length,
          s"${fn.name} expects ${fn.paramNames.length} args, " +
            s"got ${children.length}")
        lowered.zip(children).foreach { case (p, ch) =>
          require(ch.deterministic || occurrences(p) == 1,
            s"argument for parameter '$p' of ${fn.name} is " +
              s"non-deterministic and the parameter is referenced " +
              s"${occurrences(p)} times in the compiled body — the " +
              "reference evaluates call arguments once; bind the value " +
              "in the calling query instead")
        }
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
              maxLoopUnroll: Int = 1000, maxCondLoopUnroll: Int = 64,
              maxEmitChars: Int = 4000000): PlFunction = {
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
    // RETURNS SETOF <type>: the function compiles to one ARRAY<type>
    // expression; callers explode() it (the Generator lowering of
    // exec_stmt_return_next — regress rangefuncs.sql)
    val isSetof = if (h.isId("setof")) { h.next(); true } else false
    val retToks = Vector.newBuilder[Tok]
    while (!h.atEnd && !h.isId("as")) retToks += h.next()
    val retType = mapType(render(retToks.result()))
    val paramPairs = params.result()
    val paramNames = paramPairs.map(_._1)
    require(paramNames.distinct.length == paramNames.length,
      "duplicate parameter names")

    val bodyExpr = language match {
      case "plpgsql" =>
        val p = new P(lex(body), isSetof)
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
        withDeepStack(compileBody(block, fname, paramPairs, retType,
          isSetof, maxLoopUnroll, maxCondLoopUnroll, maxEmitChars))
      case "sql" =>
        require(!isSetof,
          "RETURNS SETOF is compiled for LANGUAGE plpgsql bodies " +
            "(RETURN NEXT / RETURN QUERY); a LANGUAGE sql set function " +
            "is a table — express it as a DataFrame")
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
        // PG evaluates `/` between integer-typed operands as truncating
        // integer division inside SQL bodies too — same rewrite as the
        // plpgsql path (conservative: only provably-integral pairs)
        val rewritten = analyzeSlice(trimmed, paramPairs.toMap).toks
        // PG coerces the SQL function's result to the declared return
        // type (check_sql_fn_retval)
        s"CAST((${render(rewritten)}) AS $retType)"
      case other => throw new IllegalArgumentException(
        s"unsupported LANGUAGE $other (plpgsql and sql are compiled)")
    }
    PlFunction(fname, paramNames, retType, bodyExpr, maxInlineDepth,
      isSetof)
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

  /** SETOF accumulator's env key — '#' cannot lex as an identifier, so
    * no expression token can ever collide with (or substitute) it. */
  private val AccKey = "#acc"

  private def compileBody(block: SubBlock, fname: String,
      paramPairs: Vector[(String, String)], retType: String,
      setof: Boolean, maxLoopUnroll: Int, maxCondLoopUnroll: Int,
      maxEmitChars: Int): String = {
    val paramNames = paramPairs.map(_._1)
    paramNames.foreach(p => require(!reserved(p),
      s"parameter name '$p' is a reserved word"))
    val outType = if (setof) s"ARRAY<$retType>" else retType

    // continuation-passing execution: k(env) = SQL for "control fell
    // past these statements". The context carries the loop jump
    // continuations (exitK/nextK), the nearest EXCEPTION clause's raise
    // continuation (raiseK — None means raise_error), the caught error
    // inside a handler (for bare re-RAISE), the in-scope declared types
    // and whether any enclosing handler can catch division_by_zero
    // (which forces divisor guards onto every division). Jumps are
    // RE-WRAPPED by SubBlock so leaving a nested block pops that
    // block's declarations first (pl_exec.c exec_stmt_exit unwinding).
    //
    // Declared-type discipline: every assignment, initializer and
    // RETURN is CAST through the target's declared type, because PG
    // evaluates those through the variable's type. Integer division is
    // handled UPSTREAM of the cast: analyzeSlice rewrites `/` between
    // provably-integral operands to the truncating `div` operator
    // (int4div/int8div semantics — exact at any magnitude and correct
    // in ANY position, conditions and compound expressions included),
    // and a fractional (or unknown) value assigned to an integer
    // variable goes through round(x, 0) first, reproducing PG's
    // half-away-from-zero numeric→int cast instead of Spark's
    // truncating CAST.
    type Env = Map[String, String]
    type K = Env => String
    type RaiseK = (String, String, Env) => String
    final case class Ctx(types: Map[String, String], exitK: Option[K],
        nextK: Option[K], raiseK: Option[RaiseK],
        caught: Option[(String, String)], divGuard: Boolean)

    // emitted-text budget: branch continuations duplicate the rest of
    // the body per arm and condition-guarded loops emit every budgeted
    // iteration, so pathological nesting is O(2^N) TEXT — this counter
    // turns that into a loud compile error instead of a hang/OOM
    var emitted = 0L
    def emit(s: String): String = {
      emitted += s.length
      if (emitted > maxEmitChars) throw new IllegalArgumentException(
        s"compiling $fname emitted over $maxEmitChars characters of " +
          "expression text (maxEmitChars): conditional branches inside " +
          "loops recompile the remaining iterations per arm — reduce " +
          "maxLoopUnroll/maxCondLoopUnroll or restate the loop set-wise")
      s
    }

    def sq(s: String): String = "'" + s.replace("'", "''") + "'"
    def hardRaise(msg: String): String =
      s"CAST(RAISE_ERROR(${sq(msg)}) AS $outType)"

    /** Raise `cls` with message expression `msg` — into the nearest
      * EXCEPTION clause if one exists, else a run-time error. */
    def raise(ctx: Ctx, cls: String, msg: String, env: Env): String =
      ctx.raiseK match {
        case Some(rk) => rk(cls, msg, env)
        case None => emit(s"CAST(RAISE_ERROR($msg) AS $outType)")
      }

    /** Wrap `inner` in the division_by_zero guards the analyzed slices
      * require. Outside a catching block this is the identity (ANSI
      * Spark already raises on x/0, matching an uncaught PG error). */
    def guard(as: Seq[Analyzed], raws: Seq[Vector[Tok]], env: Env,
        ctx: Ctx)(inner: => String): String = {
      if (!ctx.divGuard) inner
      else {
        as.zip(raws).foreach { case (a, raw) =>
          if (!a.ok && raw.exists(t => t == Op("/") || t == Op("%")))
            throw new IllegalArgumentException(
              s"cannot statically analyze the divisions in " +
                s"'${render(raw)}' inside a block handling " +
                "division_by_zero — simplify the expression or drop " +
                "the handler")
        }
        val checks = as.flatMap(_.divisors).filterNot(nonzeroLiteral)
          .map(d => s"(${render(subst(d, env))}) = 0")
        if (checks.isEmpty) inner
        else emit(s"CASE WHEN ${checks.mkString(" OR ")} THEN " +
          s"(${raise(ctx, "division_by_zero", "'division by zero'", env)})" +
          s" ELSE (${inner}) END")
      }
    }

    /** Analyze + substitute + cast a slice to `target` with PG's
      * assignment semantics (round-half-away for fractional→integer). */
    def castTo(e: Vector[Tok], env: Env, target: String,
        ctx: Ctx): (String, Analyzed) = {
      val a = analyzeSlice(e, ctx.types)
      val inner = render(subst(a.toks, env))
      val sql =
        if (integralDecl(target) && a.ty != TInt && a.ty != TStr &&
          a.ty != TBool)
          s"CAST(ROUND(($inner), 0) AS $target)"
        else s"CAST(($inner) AS $target)"
      (sql, a)
    }

    def go(stmts: List[Stmt], env: Env, ctx: Ctx, k: K): String =
      stmts match {
        case Nil => k(env)

        case Assign(v, e) :: rest =>
          require(env.contains(v),
            s"assignment to undeclared variable '$v'")
          val (sql, a) = castTo(e, env, ctx.types(v), ctx)
          guard(Seq(a), Seq(e), env, ctx) {
            go(rest, env + (v -> sql), ctx, k)
          }

        case Ret(e) :: _ =>
          if (setof) throw new IllegalArgumentException(
            "RETURN with a value in a SETOF function — use RETURN NEXT " +
              "(exec_stmt_return rejects the same shape)")
          val (sql, a) = castTo(e, env, retType, ctx)
          guard(Seq(a), Seq(e), env, ctx)(emit(sql))

        case BareRet :: _ =>
          if (setof) emit(env(AccKey))
          else throw new IllegalArgumentException(
            "RETURN without a value is only legal in SETOF functions " +
              "(or with OUT parameters, which are unsupported)")

        case RetNext(e) :: rest =>
          require(setof, "RETURN NEXT outside a SETOF function")
          val (sql, a) = castTo(e, env, retType, ctx)
          guard(Seq(a), Seq(e), env, ctx) {
            go(rest,
              env + (AccKey -> s"concat(${env(AccKey)}, array($sql))"),
              ctx, k)
          }

        case RetQueryRows(rows) :: rest =>
          require(setof, "RETURN QUERY outside a SETOF function")
          val cast = rows.map(r => castTo(r, env, retType, ctx))
          guard(cast.map(_._2), rows, env, ctx) {
            val arr = cast.map(_._1).mkString(", ")
            go(rest,
              env + (AccKey -> s"concat(${env(AccKey)}, array($arr))"),
              ctx, k)
          }

        case Raise(cls, msg, args) :: _ =>
          val as = args.map(a => analyzeSlice(a, ctx.types))
          val argSqls = as.map(a => render(subst(a.toks, env)))
          guard(as, args, env, ctx) {
            raise(ctx, cls, raiseMsgSql(msg, argSqls), env)
          }

        case ReRaise :: _ =>
          val (cls, msg) = ctx.caught.getOrElse(
            throw new IllegalArgumentException(
              "bare RAISE is only valid inside an exception handler"))
          // ctx.raiseK here is already the ENCLOSING block's (a handler
          // compiles with its own block's handlers out of scope), so
          // the re-throw propagates outward like exec_stmt_raise
          raise(ctx, cls, msg, env)

        case LoopJump(isExit, when) :: rest =>
          val jump = (if (isExit) ctx.exitK else ctx.nextK).getOrElse(
            throw new IllegalArgumentException(
              s"${if (isExit) "EXIT" else "CONTINUE"} outside a loop"))
          when match {
            case None => jump(env)
            case Some(c) =>
              val a = analyzeSlice(c, ctx.types)
              guard(Seq(a), Seq(c), env, ctx) {
                emit(s"CASE WHEN ${render(subst(a.toks, env))} THEN " +
                  s"(${jump(env)}) ELSE (${go(rest, env, ctx, k)}) END")
              }
          }

        case NullStmt :: rest => go(rest, env, ctx, k)

        case IfStmt(branches, els) :: rest =>
          val cont: K = e2 => go(rest, e2, ctx, k)
          if (!ctx.divGuard) {
            // flat first-match-wins CASE (the compact form); conditions
            // still get the integer-division rewrite
            val arms = branches.map { case (c, body) =>
              val a = analyzeSlice(c, ctx.types)
              s"WHEN ${render(subst(a.toks, env))} THEN " +
                s"(${go(body.toList, env, ctx, cont)})"
            }
            val elseSql = go(els.toList, env, ctx, cont)
            emit(s"CASE ${arms.mkString(" ")} ELSE ($elseSql) END")
          } else {
            // guarded conditions evaluate strictly in order, each arm's
            // divisor checks firing before ITS condition runs
            def arm(bs: List[(Vector[Tok], Vector[Stmt])]): String =
              bs match {
                case Nil => go(els.toList, env, ctx, cont)
                case (c, body) :: more =>
                  val a = analyzeSlice(c, ctx.types)
                  guard(Seq(a), Seq(c), env, ctx) {
                    emit(s"CASE WHEN ${render(subst(a.toks, env))} THEN " +
                      s"(${go(body.toList, env, ctx, cont)}) ELSE " +
                      s"(${arm(more)}) END")
                  }
              }
            arm(branches.toList)
          }

        case ForLoop(v, lo, hi, rev, body) :: rest =>
          // REVERSE iterates first-bound DOWN to second (pl_exec.c
          // exec_stmt_fori: reverse swaps the step, not the bounds)
          val idxs = if (rev) lo.to(hi, -1L) else lo.to(hi)
          require(idxs.length <= maxLoopUnroll,
            s"FOR loop spans ${idxs.length} iterations, above the " +
              s"$maxLoopUnroll unroll budget (maxLoopUnroll): each " +
              "iteration becomes expression text, so huge literal " +
              "ranges belong in a set-wise rewrite, not a scalar " +
              "function")
          // loop var is auto-declared for the loop's scope
          val saved = env.get(v)
          val after: K = e2 =>
            go(rest, saved.fold(e2 - v)(old => e2 + (v -> old)), ctx, k)
          val bodyCtx0 = ctx.copy(types = ctx.types + (v -> "BIGINT"))
          // one iteration at a time so CONTINUE has a precise "rest of
          // the iterations" continuation; EXIT jumps straight to after
          def iter(remaining: List[Long], e: Env): String =
            remaining match {
              case Nil => after(e)
              case i :: tail =>
                val bound =
                  e + (v -> (if (i < 0) s"($i)" else i.toString))
                val toNext: K = e2 => iter(tail, e2)
                go(body.toList, bound,
                  bodyCtx0.copy(exitK = Some(after), nextK = Some(toNext)),
                  toNext)
            }
          iter(idxs.toList, env)

        case WhileLoop(cond, body) :: rest =>
          // unrolled to maxCondLoopUnroll condition-guarded iterations;
          // a loop still live past the budget raises LOUDLY at run time
          // (never a silent wrong value). WHILE NULL exits like WHILE
          // FALSE (a null CASE condition falls to ELSE), matching
          // exec_stmt_while's !isnull && value gate.
          val after: K = e2 => go(rest, e2, ctx, k)
          val a = analyzeSlice(cond, ctx.types)
          def iter(n: Int, e: Env): String = {
            val thenSql =
              if (n >= maxCondLoopUnroll)
                hardRaise(s"WHILE loop in $fname still running after " +
                  s"$maxCondLoopUnroll iterations (maxCondLoopUnroll): " +
                  "raise the budget or restate the loop set-wise")
              else {
                val toNext: K = e2 => iter(n + 1, e2)
                go(body.toList, e,
                  ctx.copy(exitK = Some(after), nextK = Some(toNext)),
                  toNext)
              }
            guard(Seq(a), Seq(cond), e, ctx) {
              emit(s"CASE WHEN ${render(subst(a.toks, e))} THEN " +
                s"($thenSql) ELSE (${after(e)}) END")
            }
          }
          iter(0, env)

        case ForLoopDyn(v, loE, hiE, rev, body) :: rest =>
          // both bounds evaluate ONCE at entry (exec_stmt_fori) — the
          // rendered bound text is captured against the ENTRY env, so
          // body writes to bound variables cannot move the goalposts
          val aLo = analyzeSlice(loE, ctx.types)
          val aHi = analyzeSlice(hiE, ctx.types)
          val loSql = s"CAST((${render(subst(aLo.toks, env))}) AS BIGINT)"
          val hiSql = s"CAST((${render(subst(aHi.toks, env))}) AS BIGINT)"
          val saved = env.get(v)
          val after: K = e2 =>
            go(rest, saved.fold(e2 - v)(old => e2 + (v -> old)), ctx, k)
          val bodyCtx0 = ctx.copy(types = ctx.types + (v -> "BIGINT"))
          val (step, cmp) = if (rev) ("-", ">=") else ("+", "<=")
          def cur(n: Int): String = s"(($loSql) $step $n)"
          def iter(n: Int, e: Env): String = {
            val thenSql =
              if (n >= maxCondLoopUnroll)
                hardRaise(s"FOR loop in $fname still running after " +
                  s"$maxCondLoopUnroll iterations (maxCondLoopUnroll): " +
                  "raise the budget or restate the loop set-wise")
              else {
                val bound = e + (v -> cur(n))
                val toNext: K = e2 => iter(n + 1, e2)
                go(body.toList, bound,
                  bodyCtx0.copy(exitK = Some(after), nextK = Some(toNext)),
                  toNext)
              }
            emit(s"CASE WHEN ${cur(n)} $cmp ($hiSql) THEN ($thenSql) " +
              s"ELSE (${after(e)}) END")
          }
          guard(Seq(aLo, aHi), Seq(loE, hiE), env, ctx) {
            // PG raises for null bounds (exec_stmt_fori); without this
            // the CASE guard would silently run zero iterations
            emit(s"CASE WHEN ($loSql) IS NULL OR ($hiSql) IS NULL THEN " +
              s"(${hardRaise(s"lower/upper bound of FOR loop in $fname " +
                "cannot be null")}) ELSE (${iter(0, env)}) END")
          }

        case SubBlock(decls, handlers, body) :: rest =>
          var e = env
          var t2 = ctx.types
          val shadowed = decls.map(d => d.name -> env.get(d.name))
          val initChecks = Vector.newBuilder[String]
          decls.foreach { d =>
            require(!reserved(d.name),
              s"reserved variable name '${d.name}'")
            val init = d.init match {
              case Some(x) =>
                val a = analyzeSlice(x, t2)
                // errors in DECLARE initializers are NOT caught by this
                // block's own EXCEPTION clause (PG: "handler does not
                // cover the declarations") — guards use the OUTER ctx
                if (ctx.divGuard) {
                  if (!a.ok &&
                    x.exists(t => t == Op("/") || t == Op("%")))
                    throw new IllegalArgumentException(
                      s"cannot statically analyze the divisions in " +
                        s"'${render(x)}' inside a block handling " +
                        "division_by_zero")
                  a.divisors.filterNot(nonzeroLiteral).foreach(dv =>
                    initChecks += s"(${render(subst(dv, e))}) = 0")
                }
                val inner = render(subst(a.toks, e))
                if (integralDecl(d.sqlType) && a.ty != TInt &&
                  a.ty != TStr && a.ty != TBool)
                  s"CAST(ROUND(($inner), 0) AS ${d.sqlType})"
                else s"CAST(($inner) AS ${d.sqlType})"
              case None => s"CAST(NULL AS ${d.sqlType})"
            }
            e = e + (d.name -> init)
            t2 = t2 + (d.name -> d.sqlType)
          }
          val pop: Env => Env = e2 =>
            shadowed.foldLeft(e2) {
              case (m, (nm, Some(old))) => m + (nm -> old)
              case (m, (nm, None)) => m - nm
            }
          val restore: K = e2 => go(rest, pop(e2), ctx, k)
          val exitW = ctx.exitK.map(x => (e2: Env) => x(pop(e2)))
          val nextW = ctx.nextK.map(x => (e2: Env) => x(pop(e2)))
          val canCatchDiv = handlers.exists(_.conds.exists(c =>
            c == "division_by_zero" || c == "others"))
          def handlerMatches(conds: Vector[String], cls: String): Boolean =
            conds.exists(c => c == cls ||
              // OTHERS matches everything except assert_failure (and
              // query_canceled, which has no compiled raise site) —
              // exception_matches_conditions, pl_exec.c:1556
              (c == "others" && cls != "assert_failure"))
          val blockRaiseK: Option[RaiseK] =
            if (handlers.isEmpty) ctx.raiseK
            else Some { (cls, msg, envAt) =>
              handlers.find(h => handlerMatches(h.conds, cls)) match {
                case Some(h) =>
                  // PG semantics: variables keep their values as of the
                  // error; SQLERRM/SQLSTATE describe the caught error;
                  // errors inside the handler (incl. bare RAISE)
                  // propagate OUT of this block (ctx.raiseK)
                  val priorErr = envAt.get("sqlerrm")
                  val priorSt = envAt.get("sqlstate")
                  val henv = envAt +
                    ("sqlerrm" -> s"CAST(($msg) AS STRING)") +
                    ("sqlstate" -> sq(knownConds(cls)))
                  val hpop: Env => Env = e2 => {
                    val b = pop(e2)
                    val b2 = priorErr.fold(b - "sqlerrm")(v =>
                      b + ("sqlerrm" -> v))
                    priorSt.fold(b2 - "sqlstate")(v =>
                      b2 + ("sqlstate" -> v))
                  }
                  go(h.body.toList, henv,
                    ctx.copy(
                      types = t2 + ("sqlerrm" -> "STRING") +
                        ("sqlstate" -> "STRING"),
                      exitK = ctx.exitK.map(x => (e2: Env) => x(hpop(e2))),
                      nextK = ctx.nextK.map(x => (e2: Env) => x(hpop(e2))),
                      caught = Some((cls, msg))),
                    e2 => go(rest, hpop(e2), ctx, k))
                case None =>
                  // no handler matches — propagate to the enclosing
                  // block with this block's locals out of scope
                  raise(ctx, cls, msg, pop(envAt))
              }
            }
          val bodyCtx = ctx.copy(types = t2, exitK = exitW, nextK = nextW,
            raiseK = blockRaiseK,
            divGuard = ctx.divGuard || canCatchDiv)
          val inner = go(body.toList, e, bodyCtx, restore)
          val checks = initChecks.result()
          if (checks.isEmpty) inner
          else emit(s"CASE WHEN ${checks.mkString(" OR ")} THEN " +
            s"(${raise(ctx, "division_by_zero", "'division by zero'", env)})" +
            s" ELSE ($inner) END")
      }

    // Parameters seed the environment mapped to THEMSELVES: unassigned
    // ones stay free identifiers for call-time substitution, while
    // assignment to a parameter (legal PL/pgSQL — recursion_test's
    // regress siblings do it) rebinds the env entry like any variable.
    var env: Map[String, String] = paramNames.map(p => p -> p).toMap
    var types: Map[String, String] = paramPairs.toMap
    if (setof) env = env + (AccKey -> s"CAST(ARRAY() AS ARRAY<$retType>)")
    block.decls.foreach { d =>
      require(!reserved(d.name), s"reserved variable name '${d.name}'")
      require(!paramNames.contains(d.name),
        s"variable '${d.name}' shadows a parameter")
      val a = analyzeSlice(d.init.getOrElse(Vector(Id("null"))), types)
      val init = d.init match {
        case Some(_) =>
          val inner = render(subst(a.toks, env))
          if (integralDecl(d.sqlType) && a.ty != TInt && a.ty != TStr &&
            a.ty != TBool)
            s"CAST(ROUND(($inner), 0) AS ${d.sqlType})"
          else s"CAST(($inner) AS ${d.sqlType})"
        case None => s"CAST(NULL AS ${d.sqlType})"
      }
      env = env + (d.name -> init)
      types = types + (d.name -> d.sqlType)
    }
    val rootCtx = Ctx(types, None, None, None, None, divGuard = false)
    // falling off the end: a SETOF body legally ends its result set; a
    // scalar body raises like exec_stmt_block's control-reached-end
    // error (the r18 typed-NULL form was silent and wrong-shaped)
    val k0: K = e =>
      if (setof) emit(e(AccKey))
      else hardRaise(
        s"control reached end of function $fname without RETURN")
    // the ROOT block's own EXCEPTION clause must still catch errors
    // from its body — compile it through the SubBlock machinery with
    // no extra decls (the root decls are already seeded above)
    if (block.handlers.isEmpty) go(block.body.toList, env, rootCtx, k0)
    else go(List(SubBlock(Vector.empty, block.handlers, block.body)),
      env, rootCtx, k0)
  }
}
