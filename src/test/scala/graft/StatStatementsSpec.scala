package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tools.StatStatements

/** pg_stat_statements analogue: cumulative per-statement stats keyed on a
  * literal-normalized plan fingerprint. */
class StatStatementsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def awaitCalls(id: String, n: Long): Unit = {
    // QueryExecutionListener delivery is async on the listener bus
    val deadline = System.nanoTime() + 10_000_000_000L
    while (StatStatements.get(id).forall(_.calls < n) &&
           System.nanoTime() < deadline) Thread.sleep(50)
  }

  test("same statement with different literals accumulates under one id") {
    StatStatements.install(spark)
    StatStatements.reset()
    try {
      val q5 = Tables.t(spark, sf, "part").filter(col("p_size") > 5)
        .groupBy(col("p_brand")).count()
      val q17 = Tables.t(spark, sf, "part").filter(col("p_size") > 17)
        .groupBy(col("p_brand")).count()
      val id5 = StatStatements.fingerprint(q5.queryExecution)
      val id17 = StatStatements.fingerprint(q17.queryExecution)
      // the jumble property: literals are erased from the statement id
      assert(id5 == id17)

      q5.collect(); q17.collect()
      awaitCalls(id5, 2)
      val s = StatStatements.get(id5).get
      assert(s.calls == 2, s)
      assert(s.totalMs >= s.maxMs && s.maxMs >= s.minMs && s.minMs > 0, s)

      // a structurally different statement gets its own id
      val other = Tables.t(spark, sf, "nation").select(count(lit(1)))
      val idOther = StatStatements.fingerprint(other.queryExecution)
      assert(idOther != id5)
      other.collect()
      awaitCalls(idOther, 1)
      assert(StatStatements.get(idOther).exists(_.calls >= 1))

      // the view surface renders one row per normalized statement
      val snap = StatStatements.snapshot(spark)
        .filter(col("queryId").isin(id5, idOther)).collect()
      assert(snap.length == 2)
    } finally {
      StatStatements.uninstall(spark)
      StatStatements.reset()
    }
  }

  test("auto_explain captures executed plans only for queries over threshold") {
    StatStatements.installAutoExplain(spark, thresholdMs = 0.0)
    try {
      val q = Tables.t(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      q.collect()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (StatStatements.slowQueries().isEmpty &&
             System.nanoTime() < deadline) Thread.sleep(50)
      val slow = StatStatements.slowQueries()
      assert(slow.nonEmpty)
      // the captured text is the EXECUTED physical plan (AQE-final) —
      // what a slow-query post-mortem reads
      assert(slow.exists(s => s.plan.contains("HashAggregate") ||
                              s.plan.contains("AdaptiveSparkPlan")), slow.map(_.plan.take(80)))
      assert(slow.forall(_.ms >= 0.0))
    } finally StatStatements.uninstallAutoExplain(spark)

    // with an impossible threshold nothing is captured
    StatStatements.installAutoExplain(spark, thresholdMs = 1e12)
    try {
      Tables.t(spark, sf, "nation").count()
      Thread.sleep(500)
      assert(StatStatements.slowQueries().isEmpty)
    } finally StatStatements.uninstallAutoExplain(spark)
  }
}
