package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension — SURVEY §7.3(c): logical node +
  * planner strategy + physical exec, the Spark shape of a reference
  * executor node (the analogue here is the bounded-heap top-k inside
  * `/root/reference/src/backend/utils/sort/tuplesort.c`, generalized to
  * per-group).
  *
  * Top-k per group beats the window row_number()+filter plan by never
  * sorting whole partitions: a map-side partial stage keeps k rows per
  * group per partition in bounded heaps (the "partial aggregation" of
  * top-k — mergeable because top-k of a union = top-k of per-part
  * top-ks), then one shuffle on the group key and a final bounded-heap
  * pass. Memory is O(groups x k), not O(rows).
  */
case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, g, s, child) =>
      TopKPerGroupExec(k, g, s, partial = false,
        TopKPerGroupExec(k, g, s, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    // ClusteredDistribution rejects an empty clustering; a global top-k
    // (no group columns) needs ALL partial heaps in one place instead.
    else if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val sortLocal = sortOrder
    val outputLocal = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, outputLocal)
      // desired-first rows compare smallest; PriorityQueue dequeues the
      // max, i.e. the worst currently-kept row sits at the head
      val ord: Ordering[InternalRow] = RowOrdering.create(sortLocal, outputLocal)
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "PartialTopKPerGroup" else "TopKPerGroup"
}

object TopKPerGroup {
  /** Attach the strategy (idempotent) and plan a top-k-per-group over df.
    * `order` = (columnName, descending). */
  def apply(df: DataFrame, groupCols: Seq[String], order: Seq[(String, Boolean)],
            k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val sortOrder = order.map { case (name, desc) =>
      SortOrder(attr(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      TopKPerGroup(k, groupCols.map(attr), sortOrder, plan))
  }
}
