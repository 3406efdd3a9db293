package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ExplainAnalyze

/** EXPLAIN ANALYZE parity: after execution the rendered plan must carry
  * real per-operator row counts, through AQE's adaptive wrapper. */
class ExplainAnalyzeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("q3 analyze shows actual rows on scans, joins, and aggregates") {
    val out = ExplainAnalyze.analyze(
      SparkEntry.queries("q3_shipping_priority")(spark, sf))
    assert(out.nonEmpty, out)
    // the adaptive wrapper must be unwrapped, not printed
    assert(!out.contains("AdaptiveSparkPlan"), out)
    // every load-bearing operator reports a populated rows metric
    Seq("Scan", "BroadcastHashJoin", "HashAggregate").foreach { op =>
      val line = out.linesIterator.find(_.contains(op))
      assert(line.isDefined, s"missing $op in:\n$out")
      assert(line.exists(_.contains("rows=")),
        s"$op line has no runtime rows metric in:\n$out")
    }
  }

  test("analyze on a filter-to-empty plan still renders (zero metrics elided)") {
    import org.apache.spark.sql.functions._
    val out = ExplainAnalyze.analyze(
      Tables.t(spark, sf, "orders").filter(lit(false)))
    assert(out.nonEmpty)
    assert(!out.contains("rows="), s"no rows should flow:\n$out")
  }
}
