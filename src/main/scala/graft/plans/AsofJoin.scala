package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the second whole-operator Catalyst extension
  * (SURVEY §7.3(c), alongside TopKPerGroup): logical node + strategy +
  * physical exec for the backward as-of join Spark lacks (the reference
  * ecosystem's timeseries idiom; DuckDB/QuestDB ship it as ASOF JOIN,
  * pandas as merge_asof).
  *
  * Semantics: for every left row, the LATEST right row with the same key
  * and right.time <= left.time — or nulls when none exists (left outer).
  * Equal right timestamps resolve to the last row in (key, time) sort
  * order, matching the `last(...) over (rows unbounded preceding)`
  * convention of the union-trick formulation.
  *
  * Why an operator: the union-trick emulation works (q_asof_join) but
  * interleaves both relations through one window — the native exec keeps
  * the sides separate and streams them through a SINGLE in-partition
  * merge: one hash exchange per side on the key, in-partition sort by
  * (key, time), then an O(|L| + |R|) two-pointer pass with O(1) state
  * (one candidate row per live key). No window state, no union
  * materialization, and the sort/exchange requirements are declared to
  * Catalyst (`requiredChildDistribution/Ordering`), so EnsureRequirements
  * plans co-partitioned shuffles exactly like a sort-merge join — at
  * 100 TB this is the same scale shape as SMJ itself.
  */
case class AsofJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(lk, rk, lt, rt, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // surfaced by the EXPLAIN ANALYZE walk (plans/ExplainAnalyze.scala)
  // exactly like built-in join execs
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lTimeB = BindReferences.bindReference(lTime, lOut)
      val rTimeB = BindReferences.bindReference(rTime, rOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // the right side must project as NULLABLE regardless of the child
      // schema (unmatched left rows read the all-null row) — binding
      // output attrs against rOut would inherit non-nullable fields and
      // codegen would skip the null checks, rendering nulls as zeros
      val outProj = UnsafeProjection.create(
        (lOut ++ rOut).zipWithIndex.map { case (a, i) =>
          org.apache.spark.sql.catalyst.expressions.BoundReference(
            i, a.dataType, nullable = i >= lOut.length || a.nullable)
        })

      // single forward pass: `pending` is the not-yet-consumed head of
      // the right side; `cand`/`candKey` the latest right row at-or-
      // before the current left row for its key — O(1) state per key
      var pending: InternalRow = null
      var cand: InternalRow = null
      var candKey: InternalRow = null
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTimeB.eval(lRow).asInstanceOf[Long]
        var advance = true
        while (advance && (pending != null || rIter.hasNext)) {
          if (pending == null) pending = rIter.next().copy()
          val rk = rKeyProj(pending)
          val cmp = keyOrd.compare(rk, lk)
          if (cmp < 0) pending = null // right key already passed by left
          else if (cmp == 0 &&
                   rTimeB.eval(pending).asInstanceOf[Long] <= lt) {
            cand = pending; candKey = rk.copy(); pending = null
          } else advance = false // right is ahead; stop consuming
        }
        val matched = cand != null && keyOrd.compare(candKey, lk) == 0
        numOut += 1
        if (matched) numMatched += 1
        outProj(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override def nodeName: String = "AsofJoin"
}

object AsofJoin {
  /** Attach the strategy (idempotent) and plan `left ASOF LEFT JOIN
    * right` on equal `keys` with backward match on `lTime`/`rTime`
    * (LongType epoch-micros columns). Column names must be disjoint
    * across the two sides (rename before calling). */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
            keys: Seq[(String, String)], lTimeCol: String,
            rTimeCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      AsofJoin(
        keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
        attr(lPlan, lTimeCol), attr(rPlan, rTimeCol), lPlan, rPlan))
  }
}
