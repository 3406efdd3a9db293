package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical kill for the HUGEINT oracle-dtype trap (three red rows in
  * two rounds): every `SparkEntry.oracleSql` statement is BOUND through
  * DuckDB (`tools/oracle_type_lint.py`) and any HUGEINT-typed result
  * column — or any statement DuckDB cannot bind — fails the build before
  * the driver's gate ever sees it.
  *
  * The lint shells out to the same python3+duckdb the oracle itself runs
  * on; where that interpreter is absent (the shipped library has no
  * python dependency) the suite cancels rather than fails.
  */
class OracleTypeLintSpec extends AnyFunSuite {
  private val sfLint = "/root/testdata/sf0.001"
  private val lintPy = "tools/oracle_type_lint.py"

  private def haveDuckdb: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    catch { case _: Throwable => false }

  private def runLint(jsonPath: String): (Int, String) = {
    val sb = new StringBuilder
    val code = Process(Seq("python3", lintPy, jsonPath, sfLint))
      .!(ProcessLogger(l => sb.append(l).append('\n'), l => sb.append(l).append('\n')))
    (code, sb.toString)
  }

  test("no oracle statement produces a HUGEINT column (or fails to bind)") {
    assume(haveDuckdb, "python3+duckdb not available — lint runs driver-side")
    assume(Files.exists(Paths.get(sfLint)), s"$sfLint missing")
    val dir = Files.createTempDirectory("oracle_lint").toString
    Verify.writeOracleJson(dir)
    val (code, out) = runLint(s"$dir/oracle_sql.json")
    assert(code == 0, s"oracle type lint found violations:\n$out")
  }

  test("the lint catches a seeded HUGEINT regression") {
    assume(haveDuckdb, "python3+duckdb not available — lint runs driver-side")
    assume(Files.exists(Paths.get(sfLint)), s"$sfLint missing")
    val dir = Files.createTempDirectory("oracle_lint_seed")
    // the exact shape that slipped through three times: un-cast SUM(int)
    val seeded = """{"seeded_bad": "SELECT l_returnflag, sum(CAST(l_quantity AS BIGINT)) AS s FROM lineitem GROUP BY 1 ORDER BY 1", "seeded_ok": "SELECT count(*) AS n FROM lineitem"}"""
    val p = dir.resolve("oracle_sql.json")
    Files.writeString(p, seeded)
    val (code, out) = runLint(p.toString)
    assert(code != 0, "lint must flag an un-cast integral SUM")
    assert(out.contains("seeded_bad"), s"finding must name the query:\n$out")
    assert(!out.contains("LINT seeded_ok"), s"count(*) is BIGINT, not HUGEINT:\n$out")
  }
}
