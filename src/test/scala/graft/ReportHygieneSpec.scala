package graft

import org.scalatest.funsuite.AnyFunSuite

/** Report-hygiene canary (r13 VERDICT finding #2): `target/test-reports`
  * accumulates one `TEST-<suite>.xml` per suite run and sbt never prunes
  * it, so XMLs from DELETED scratch suites survive forever — in r13 four
  * such files (one recording a real failure from a suite that no longer
  * existed) made the directory read 786 tests / 1 failure while the live
  * battery was 782 / 0, tripping anyone auditing the gate.
  *
  * This spec makes the invariant self-healing: every report file must
  * name a class that still exists on the test classpath; debris is
  * deleted (a deleted suite's class cannot be mid-run, so the delete
  * cannot race a live report write) and the remaining set is asserted
  * clean. After any full battery the reports dir therefore equals the
  * live suite set exactly.
  */
class ReportHygieneSpec extends AnyFunSuite {

  private def reports: Array[java.io.File] = {
    val dir = new java.io.File("target/test-reports")
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("TEST-") && f.getName.endsWith(".xml"))
  }

  private def suiteClassOf(f: java.io.File): String =
    f.getName.stripPrefix("TEST-").stripSuffix(".xml")

  private def isLive(cls: String): Boolean =
    scala.util.Try(Class.forName(cls)).isSuccess

  test("test-reports holds no debris from deleted suites") {
    val stale = reports.filterNot(f => isLive(suiteClassOf(f)))
    stale.foreach { f =>
      info(s"deleting stale report for deleted suite: ${f.getName}")
      assert(f.delete(), s"could not delete stale report ${f.getName}")
    }
    val remaining = reports.map(suiteClassOf).filterNot(isLive)
    assert(remaining.isEmpty,
      s"stale reports survived cleanup: ${remaining.mkString(", ")}")
  }
}
