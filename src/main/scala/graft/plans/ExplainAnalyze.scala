package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** EXPLAIN ANALYZE — run the query, then render the physical plan with
  * each operator's RUNTIME metrics (rows out, spill, shuffle bytes), the
  * reference's instrumented-executor surface
  * (`/root/reference/src/backend/commands/explain.c` — EXPLAIN ANALYZE
  * attaches per-node Instrumentation and prints actual rows/loops).
  *
  * Spark-first: every SparkPlan already carries SQLMetrics accumulators;
  * executing the DataFrame populates them, so "ANALYZE" is just walking
  * the executed tree afterwards — including through AQE's adaptive
  * wrapper and materialized query stages, which is where the real
  * post-execution plan lives. No listeners, no extra passes.
  */
object ExplainAnalyze {

  /** Metrics worth surfacing per node, in print order. */
  private val Shown = Seq(
    "numOutputRows" -> "rows",
    "spillSize" -> "spill",
    "dataSize" -> "bytes",
    "shuffleBytesWritten" -> "shuffle-out",
    "numFiles" -> "files",
    "numPartitions" -> "parts")

  /** Execute `df` and return the annotated plan text. Rows are discarded
    * EXECUTOR-side (the reference's EXPLAIN ANALYZE discards tuples too)
    * — a collect here would pull the full result onto the driver just to
    * populate metrics.
    *
    * The action MUST be a Dataset action (runs under a SQLExecution id),
    * not a bare `toRdd.foreach`: without the execution id, SQLMetric
    * updates from shuffle-MAP stages never reach the driver-side
    * accumulators (observed: a window that demonstrably spilled reported
    * spillSize=0 whenever a shuffle sat above it), and EXPLAIN ANALYZE
    * silently undercounts every non-result stage. */
  def analyze(df: DataFrame): String = {
    org.apache.spark.sql.GraftBridge.withExecutionId(df) {
      df.queryExecution.toRdd.foreach(_ => ())
    }
    render(df.queryExecution.executedPlan)
  }

  /** Render an already-executed plan with its populated metrics. */
  def render(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = {
      // see through the adaptive machinery to the plans that actually ran
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
        case qs: QueryStageExec => walk(qs.plan, depth)
        case _ =>
          val ms = Shown.flatMap { case (key, label) =>
            p.metrics.get(key).filter(_.value > 0)
              .map(m => s"$label=${m.value}")
          }
          val tag = if (ms.isEmpty) "" else ms.mkString("  [", ", ", "]")
          sb.append("  " * depth).append(p.nodeName).append(tag).append('\n')
          p.children.foreach(walk(_, depth + 1))
          // subqueries (scalar/dynamic-pruning) execute too — show them
          p.subqueries.foreach { sq =>
            sb.append("  " * (depth + 1)).append("Subquery:\n")
            walk(sq, depth + 2)
          }
      }
    }
    walk(plan, 0)
    sb.result()
  }
}
