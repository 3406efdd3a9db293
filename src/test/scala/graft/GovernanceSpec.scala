package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ExternalExec, Governance}
import graft.sources.Governance.RowPolicy

/** RLS policy combination semantics (rowsecurity.c) + EXECUTE web
  * external tables (url_execute.c). */
class GovernanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def cust = Tables.t(spark, sf, "customer")

  test("permissive policies OR; restrictive AND onto the grant") {
    val seg = RowPolicy("seg", "c_mktsegment = 'BUILDING'")
    val nat = RowPolicy("nat", "c_nationkey < 5")
    val cap = RowPolicy("cap", "c_custkey <= 1000", restrictive = true)
    val both = Governance.applyPolicies(cust, Seq(seg, nat, cap))
    val expected = cust.filter(
      (col("c_mktsegment") === "BUILDING" || col("c_nationkey") < 5) &&
        col("c_custkey") <= 1000)
    assert(both.count() == expected.count())
    assert(both.count() > 0)
    // restrictive alone grants nothing (no permissive policy): deny
    assert(Governance.applyPolicies(cust, Seq(cap)).isEmpty)
    // RLS on with no policies at all: default deny
    assert(Governance.applyPolicies(cust, Nil).isEmpty)
    // BYPASSRLS reads everything
    assert(Governance.applyPolicies(cust, Nil, bypass = true).count() ==
      cust.count())
  }

  test("policy quals reach the scan as ordinary pushed filters") {
    val p = Governance.applyPolicies(cust,
      Seq(RowPolicy("seg", "c_mktsegment = 'BUILDING'")))
    val scan = p.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("c_mktsegment"), scan)
  }

  test("column masks replace values and cannot leak downstream") {
    val masked = Governance.withMasks(cust,
      Map("c_name" -> "'<redacted>'",
          "c_acctbal" -> "CAST(NULL AS DOUBLE)"))
    val names = masked.select("c_name").distinct().collect()
    assert(names.length == 1 && names(0).getString(0) == "<redacted>")
    // a downstream expression over the masked column sees the mask
    val probe = masked.filter(col("c_name").contains("Customer")).count()
    assert(probe == 0, "mask must not leak the underlying value")
    assert(masked.filter(col("c_acctbal").isNotNull).count() == 0)
  }

  test("EXECUTE ON ALL: command runs per segment, stdin carries the id") {
    val df = ExternalExec.executeCsv(spark,
      """while read s; do for i in 1 2 3; do echo "$s,$i"; done; done""",
      nSegments = 4, schemaDdl = "seg INT, i INT")
    assert(df.count() == 12)
    val perSeg = df.groupBy(col("seg")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSeg == (0 until 4).map(_ -> 3L).toMap)
  }

  test("EXECUTE ON MASTER: a single invocation") {
    val one = ExternalExec.executeCsv(spark, "seq 1 5",
      nSegments = 1, schemaDdl = "n INT")
    assert(one.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }
}
