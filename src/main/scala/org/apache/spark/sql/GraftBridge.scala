package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan (the supported extension surface is SparkSessionExtensions;
  * this is the standard companion trick for programmatic plan injection). */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column <-> catalyst Expression (the private[sql] columnNodeSupport
    * pair) — for native expressions that carry non-expression state
    * (e.g. a hyperplane matrix as a codegen reference object) and so
    * can't go through the function registry. */
  def exprColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def columnExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Run `body` under a fresh SQL execution id for `df`'s OWN
    * queryExecution. Needed by EXPLAIN ANALYZE: a bare
    * `toRdd.foreach` has no execution id and shuffle-map-stage
    * SQLMetric updates are dropped, while Dataset actions that do set
    * one (`collect`, `foreachPartition`) either pull rows to the driver
    * or build a NEW plan tree whose metrics aren't `df`'s. */
  def withExecutionId[T](df: DataFrame)(body: => T): T = {
    val qe = df.asInstanceOf[classic.Dataset[Row]].queryExecution
    execution.SQLExecution.withNewExecutionId(qe)(body)
  }
}
