package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ExprBridge

/** Whole-operator extension: exact top-k rows per group, planned as a
  * custom physical operator instead of `row_number() OVER (...)  <= k`.
  *
  * Why it matters at 100 TB: the window form sorts every group's FULL
  * row set after the shuffle, and the shuffle itself moves every row.
  * This operator keeps a bounded k-heap per group — a map-side partial
  * pass caps each upstream partition's contribution at k rows per
  * group BEFORE the exchange (the aggregation-style partial/final
  * split), so the shuffle moves ≤ k·|groups| rows per partition and
  * nothing is ever fully sorted.
  *
  * Registered via `spark.experimental.extraStrategies` (the public
  * strategy-injection point); the logical node resolves through the
  * normal analyzer since its expressions are ordinary children.
  */
case class TopKPerGroupPlan(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroupPlan =
    copy(child = c)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      val ordering = RowOrdering.create(orderLocal, childOutput)
      // per group: max-heap on the ordering, head = worst row kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, g, o, child) =>
      val partial = TopKPerGroupExec(k, g, o, partial = true, planLater(child))
      TopKPerGroupExec(k, g, o, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Top `k` rows per group of `groupCols`, "top" defined by `orderCols`
    * (use `.desc`/`.asc` columns; bare columns default to ascending). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column],
                   k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val order = orderCols.map(ExprBridge.toExpression).map {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    val groups = groupCols.map(ExprBridge.toExpression)
    ExprBridge.ofRows(spark, TopKPerGroupPlan(k, groups, order, ExprBridge.logicalPlan(df)))
  }
}
