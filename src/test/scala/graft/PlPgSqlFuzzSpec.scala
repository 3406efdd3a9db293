package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.rng.Seed

import graft.functions.PlPgSql

/** Differential fuzzing for the PL/pgSQL compiler (the FuzzParitySpec
  * discipline applied to the r18 component): a bounded imperative
  * grammar — integer assignments, IF/ELSE, FOR loops with REVERSE /
  * EXIT WHEN / CONTINUE WHEN, early RETURN, loop-variable reuse and
  * reassignment — is generated as REAL `CREATE FUNCTION … plpgsql`
  * source text, compiled to the single expression, evaluated by Spark,
  * and compared against a direct Scala interpreter of the same AST.
  * Any divergence is a compiler bug: a wrong environment merge, a
  * mis-scoped jump, a broken unroll. Seeded and shrinking.
  *
  * Value discipline: every assigned/returned expression is wrapped
  * `% 97` by the GENERATOR (not the compiler), so all stored values sit
  * in [-96, 96]; expression nesting is bounded at depth 3, keeping
  * every intermediate < 2^53 — no overflow on either side (Spark runs
  * ANSI, the interpreter runs Long, and both `%` truncate toward zero).
  */
object PlPgSqlFuzzSpec extends Properties("PlPgSqlFuzz") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(70)
      .withInitialSeed(Seed(20260816L))

  private lazy val spark = SparkTestSession.spark

  // ---- the bounded AST ----

  private sealed trait E
  private case class Lit(n: Long) extends E
  private case class Vr(v: String) extends E
  private case class Bin(op: String, a: E, b: E) extends E

  private sealed trait C
  private case class Cmp(op: String, a: E, b: E) extends C
  private case class AndC(a: C, b: C) extends C
  private case class OrC(a: C, b: C) extends C
  private case class NotC(a: C) extends C

  private sealed trait S
  private case class Asn(v: String, e: E) extends S
  private case class If2(c: C, t: List[S], e: List[S]) extends S
  private case class For2(v: String, lo: Long, hi: Long, rev: Boolean,
      body: List[S]) extends S
  /** `cv := k; while cv > 0 loop cv := cv - dec; <body> end loop;` —
    * the decrement comes FIRST so CONTINUE cannot skip it: termination
    * is structural (cv strictly decreases, body cannot assign cv). */
  private case class While2(cv: String, k: Long, dec: Long,
      body: List[S]) extends S
  private case class ExitW(c: C) extends S
  private case class ContW(c: C) extends S
  private case class Ret2(e: E) extends S

  // ---- render to PL/pgSQL source ----

  private def rE(e: E): String = e match {
    case Lit(n) => if (n < 0) s"($n)" else n.toString
    case Vr(v) => v
    case Bin(op, a, b) => s"(${rE(a)} $op ${rE(b)})"
  }
  private def rC(c: C): String = c match {
    case Cmp(op, a, b) => s"(${rE(a)} $op ${rE(b)})"
    case AndC(a, b) => s"(${rC(a)} and ${rC(b)})"
    case OrC(a, b) => s"(${rC(a)} or ${rC(b)})"
    case NotC(a) => s"(not ${rC(a)})"
  }
  private def rS(s: S): String = s match {
    case Asn(v, e) => s"$v := ${rE(e)};"
    case If2(c, t, e) =>
      val els = if (e.isEmpty) "" else s" else ${e.map(rS).mkString(" ")}"
      s"if ${rC(c)} then ${t.map(rS).mkString(" ")}$els end if;"
    case For2(v, lo, hi, rev, body) =>
      val r = if (rev) "reverse " else ""
      s"for $v in $r$lo..$hi loop ${body.map(rS).mkString(" ")} end loop;"
    case While2(cv, k, dec, body) =>
      s"$cv := $k; while $cv > 0 loop $cv := $cv - $dec; " +
        s"${body.map(rS).mkString(" ")} end loop;"
    case ExitW(c) => s"exit when ${rC(c)};"
    case ContW(c) => s"continue when ${rC(c)};"
    case Ret2(e) => s"return ${rE(e)};"
  }
  private def renderProgram(body: List[S]): String =
    s"""create function fz(x bigint) returns bigint as $$$$
       |declare a bigint := (x % 97); b bigint := 3; c bigint := (0 - 5);
       |        w1 bigint := 0; w2 bigint := 0;
       |begin
       |${body.map(rS).mkString("\n")}
       |return (((a + b) + c) % 97);
       |end;
       |$$$$ language plpgsql""".stripMargin

  // ---- the direct interpreter ----

  private sealed trait Sig
  private case object Fall extends Sig
  private case class Rtn(v: Long) extends Sig
  private case object Exi extends Sig
  private case object Cont extends Sig

  private def eE(e: E, env: Map[String, Long]): Long = e match {
    case Lit(n) => n
    case Vr(v) => env(v)
    case Bin("+", a, b) => eE(a, env) + eE(b, env)
    case Bin("-", a, b) => eE(a, env) - eE(b, env)
    case Bin("*", a, b) => eE(a, env) * eE(b, env)
    case Bin("%", a, b) => eE(a, env) % eE(b, env)
    // PG integer '/' truncates toward zero (int8div) — so does Scala
    // Long division and so must the compiled div rewrite
    case Bin("/", a, b) => eE(a, env) / eE(b, env)
    case Bin(op, _, _) => sys.error(s"op $op")
  }
  private def eC(c: C, env: Map[String, Long]): Boolean = c match {
    case Cmp("<", a, b) => eE(a, env) < eE(b, env)
    case Cmp("<=", a, b) => eE(a, env) <= eE(b, env)
    case Cmp("=", a, b) => eE(a, env) == eE(b, env)
    case Cmp("<>", a, b) => eE(a, env) != eE(b, env)
    case Cmp(">", a, b) => eE(a, env) > eE(b, env)
    case Cmp(">=", a, b) => eE(a, env) >= eE(b, env)
    case Cmp(op, _, _) => sys.error(s"cmp $op")
    case AndC(a, b) => eC(a, env) && eC(b, env)
    case OrC(a, b) => eC(a, env) || eC(b, env)
    case NotC(a) => !eC(a, env)
  }

  private def run(ss: List[S], env0: Map[String, Long]): (Map[String, Long], Sig) = {
    var env = env0
    ss.foreach { s =>
      val sig: Sig = s match {
        case Asn(v, e) => env = env + (v -> eE(e, env)); Fall
        case Ret2(e) => Rtn(eE(e, env))
        case ExitW(c) => if (eC(c, env)) Exi else Fall
        case ContW(c) => if (eC(c, env)) Cont else Fall
        case If2(c, t, els) =>
          val (e2, sig2) = run(if (eC(c, env)) t else els, env)
          env = e2; sig2
        case For2(v, lo, hi, rev, body) =>
          val saved = env.get(v)
          val idxs = if (rev) lo.to(hi, -1L) else lo.to(hi)
          var res: Sig = Fall
          var exited = false
          val it = idxs.iterator
          while (!exited && res == Fall && it.hasNext) {
            val (e2, sig2) = run(body, env + (v -> it.next()))
            env = e2
            sig2 match {
              case Rtn(x) => res = Rtn(x) // RETURN ends the function
              case Exi => exited = true   // EXIT ends the loop
              case Cont | Fall => ()      // next iteration
            }
          }
          res match {
            case Rtn(x) => Rtn(x)
            case _ => // loop var scope ends (matches the compiler's pop)
              env = saved.fold(env - v)(old => env + (v -> old)); Fall
          }
        case While2(cv, kk, dec, body) =>
          env = env + (cv -> kk)
          var res: Sig = Fall
          var exited = false
          while (!exited && res == Fall && env(cv) > 0) {
            env = env + (cv -> (env(cv) - dec))
            val (e2, sig2) = run(body, env)
            env = e2
            sig2 match {
              case Rtn(x) => res = Rtn(x)
              case Exi => exited = true
              case Cont | Fall => ()
            }
          }
          res // cv is a declared variable: it KEEPS its value after
      }
      sig match {
        case Fall =>
        case other => return (env, other)
      }
    }
    (env, Fall)
  }

  /** Interpret a full program for one parameter value. */
  private def interpret(body: List[S], x: Long): Long = {
    val env0 = Map("x" -> x, "a" -> x % 97, "b" -> 3L, "c" -> -5L,
      "w1" -> 0L, "w2" -> 0L)
    run(body, env0) match {
      case (_, Rtn(v)) => v
      case (env, Fall) => ((env("a") + env("b")) + env("c")) % 97
      case (_, s) => sys.error(s"loop signal escaped the program: $s")
    }
  }

  // ---- generators ----

  private val baseVars = List("a", "b", "c", "x")
  private def genE(scope: List[String], depth: Int): Gen[E] =
    if (depth == 0)
      Gen.oneOf(Gen.chooseNum(-9L, 9L).map(Lit.apply),
        Gen.oneOf(scope).map(Vr.apply))
    else Gen.frequency(
      2 -> genE(scope, 0),
      3 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        a <- genE(scope, depth - 1)
        b <- genE(scope, depth - 1)
      } yield Bin(op, a, b)),
      1 -> (for {
        a <- genE(scope, depth - 1)
        op <- Gen.oneOf("%", "/") // '/' draws the r19 div rewrite
        k <- Gen.chooseNum(2L, 9L)
      } yield Bin(op, a, Lit(k))))

  private def genC(scope: List[String], depth: Int): Gen[C] = {
    val cmp = for {
      op <- Gen.oneOf("<", "<=", "=", "<>", ">", ">=")
      a <- genE(scope, 1)
      b <- genE(scope, 1)
    } yield Cmp(op, a, b): C
    if (depth == 0) cmp
    else Gen.frequency(
      3 -> cmp,
      1 -> (for { a <- genC(scope, 0); b <- genC(scope, 0) } yield AndC(a, b): C),
      1 -> (for { a <- genC(scope, 0); b <- genC(scope, 0) } yield OrC(a, b): C),
      1 -> genC(scope, 0).map(NotC.apply(_): C))
  }

  /** Assignments store `expr % 97` so values stay bounded. Loop vars
    * are assignable (PG semantics: the next iteration reassigns); the
    * parameter `x` stays pristine so the probes stay distinguishable.
    */
  private def genAsn(scope: List[String]): Gen[S] = for {
    // x stays pristine (distinguishable probes); w1/w2 are WHILE
    // counters whose structural termination forbids body writes
    v <- Gen.oneOf(scope.filterNot(s => s == "x" || s.startsWith("w")))
    e <- genE(scope, 2)
  } yield Asn(v, Bin("%", e, Lit(97)))

  private def genStmts(scope: List[String], loopDepth: Int,
      budget: Int): Gen[List[S]] =
    if (budget <= 0) Gen.const(Nil)
    else for {
      n <- Gen.chooseNum(0, math.min(3, budget))
      ss <- Gen.listOfN(n, genStmt(scope, loopDepth, budget / 2))
    } yield ss

  private def genStmt(scope: List[String], loopDepth: Int,
      budget: Int): Gen[S] = {
    val leafs = Seq(
      4 -> genAsn(scope),
      1 -> genE(scope, 1).map(e => Ret2(Bin("%", e, Lit(97))): S)) ++
      (if (loopDepth > 0) Seq(
        2 -> genC(scope, 1).map(ExitW.apply(_): S),
        2 -> genC(scope, 1).map(ContW.apply(_): S))
      else Nil)
    val nested =
      if (budget <= 1 || loopDepth >= 2) Nil
      else Seq(
        2 -> (for {
          c <- genC(scope, 1)
          t <- genStmts(scope, loopDepth, budget - 1)
          e <- genStmts(scope, loopDepth, budget - 1)
        } yield If2(c, t, e): S),
        2 -> (for {
          lo <- Gen.chooseNum(0L, 3L)
          hi <- Gen.chooseNum(0L, 3L)
          rev <- Gen.oneOf(true, false)
          v = s"i${loopDepth + 1}"
          body <- genStmts(v :: scope, loopDepth + 1, budget - 1)
        } yield For2(v, lo, hi, rev, body): S)) ++
        // WHILE only outside other loops: nested condition-guarded
        // unrolls multiply emitted text (the budgets exist for exactly
        // that, but the fuzzer should mostly draw COMPILABLE programs)
        (if (loopDepth == 0) Seq(
          1 -> (for {
            kk <- Gen.chooseNum(0L, 3L)
            dec <- Gen.chooseNum(1L, 2L)
            cv = "w1"
            body <- genStmts(cv :: scope, loopDepth + 1, budget - 1)
          } yield While2(cv, kk, dec, body): S))
        else Nil)
    Gen.frequency(leafs ++ nested: _*)
  }

  private val genProg: Gen[List[S]] = genStmts(baseVars, 0, 8)

  // ---- the property ----

  private val probes = Seq(-13L, 0L, 7L, 42L, 96L)

  property("compiled expression equals the direct interpreter") =
    Prop.forAll(genProg) { prog =>
      val src = renderProgram(prog)
      // WHILE counters run at most 3 iterations (k<=3, dec>=1,
      // structurally decreasing), so a 6-iteration unroll always covers
      val fn =
        try PlPgSql.compile(src, maxCondLoopUnroll = 6)
        catch {
          case e: IllegalArgumentException
            if e.getMessage.contains("maxEmitChars") =>
            // branch-heavy WHILE bodies can exceed the emit budget —
            // failing LOUDLY at compile is the designed behavior, not a
            // divergence
            null
        }
      if (fn == null) Prop.passed
      else {
        val cols = probes.zipWithIndex
          .map { case (x, i) => s"${fn.call(x.toString)} AS c$i" }
        val row = spark.sql(s"SELECT ${cols.mkString(", ")}").collect()(0)
        // constant-only programs fold to an INT column — read numerically
        val got = probes.indices
          .map(i => row.get(i).asInstanceOf[Number].longValue())
        val want = probes.map(x => interpret(prog, x))
        (got == want) :| s"diverged\nsrc:\n$src\n got $got\nwant $want"
      }
    }
}
