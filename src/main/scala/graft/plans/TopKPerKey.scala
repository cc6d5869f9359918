package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-key top-k as a first-class operator — the (c)-level custom
  * operator from the preference order in SURVEY §2: a LogicalPlan +
  * Strategy + SparkPlan, registered per-session.
  *
  * Spark's native formulation (row_number window + filter) sorts each
  * partition fully: O(n log n) time and O(n) sort buffer per
  * partition. This operator keeps a bounded heap per key instead:
  * O(n log k) and O(#keys·k) memory — at 100 TB the difference
  * between spilling sorts and a streaming pass. Same single shuffle
  * (the exec declares ClusteredDistribution on the keys and lets the
  * planner insert the exchange).
  */
case class TopKPerKeyPlan(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(groupExprs.nonEmpty, "need at least one group key")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyPlan =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, g, o, child) =>
      TopKPerKeyExec(k, g, o, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupExprsLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      // BaseOrdering compares "comes first in sort order" as <
      val ord: Ordering[InternalRow] = RowOrdering.create(orderLocal, childOutput)
      // max-heap on the ordering: the head is the WORST retained row
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = groupProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

/** Public API. */
object TopKPerKey {

  /** Top-k rows per group, ordered by `orderBy` (column name,
    * descending?) with the listed tie-breakers applied in order.
    * Emits each group's rows best-first. */
  def apply(df: DataFrame, k: Int, groupBy: Seq[String],
      orderBy: Seq[(String, Boolean)]): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark, TopKPerKeyPlan(k, groupBy.map(attr), order, child))
  }
}
