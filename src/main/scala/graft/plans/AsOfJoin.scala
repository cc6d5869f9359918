package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Event-time as-of join as a first-class binary operator: each left
  * row joins the most recent right row of the same key with
  * rightTime < leftTime (strictly prior), or nulls — or, with
  * `forward = true`, the FIRST right row with rightTime ≥ leftTime
  * (at-or-after; pandas/kdb direction="forward" — the
  * "time-to-next-event" join).
  *
  * Physical shape (the same one SortMergeJoinExec uses): both sides
  * hash-clustered on the key and sorted (key, time) — the planner
  * inserts the exchanges/sorts from requiredChildDistribution/
  * Ordering — then one streaming merge pass per partition:
  * O(|L|+|R|) time, O(1) state (the last-seen prior right row). At
  * 100 TB this is one shuffle per side and no window buffering,
  * versus the union+window composition which materializes the
  * combined stream per key.
  */
case class AsOfJoinPlan(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    left: LogicalPlan,
    right: LogicalPlan,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, tb, l, r, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r), fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan,
    right: SparkPlan,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    val lOut = left.output; val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against a nullable right schema — BindReferences takes
      // nullability from the INPUT attrs, and the null-row path needs it
      val out = UnsafeProjection.create(output, lOut ++ rOut.map(_.withNullability(true)))

      val rBuf = rIter.buffered
      var lastKey: InternalRow = null // key of lastRight
      var lastRight: InternalRow = null
      val fwd = forward

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l).copy()
        if (fwd) {
          // forward: discard right rows strictly before (lKey, lTime);
          // the buffer head — NOT consumed, later left rows may share
          // it — is the first at-or-after match when keys agree
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val c = keyOrd.compare(rKeyProj(r), lKey)
            if (c < 0 ||
              (c == 0 && timeOrd.compare(rTimeProj(r), lTime) < 0)) rBuf.next()
            else advancing = false
          }
          val matched = rBuf.hasNext &&
            keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0
          out(joined(l, if (matched) rBuf.head else nullRight))
        } else {
          // drop state from a previous key group
          if (lastKey != null && keyOrd.compare(lastKey, lKey) != 0) {
            lastKey = null; lastRight = null
          }
          // advance the right side to just before (lKey, lTime)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val c = keyOrd.compare(rKeyProj(r), lKey)
            if (c < 0) { rBuf.next() } // behind on key: discard
            else if (c == 0 && timeOrd.compare(rTimeProj(r), lTime) < 0) {
              lastRight = rBuf.next().copy()
              lastKey = lKey.copy()
            } else advancing = false
          }
          val matched = lastKey != null && keyOrd.compare(lastKey, lKey) == 0
          out(joined(l, if (matched) lastRight else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Public API:
  * `AsOfJoin(purchases, views, "user_id", "ts", "view_ts", "view_id")`
  * (key column may be named differently per side via the 7-arg form). */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, key: String, leftTime: String,
      rightTime: String, rightTieBreak: String): DataFrame =
    apply(left, right, key, key, leftTime, rightTime, rightTieBreak)

  def apply(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTieBreak: String,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name missing"))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTime), attr(rp, rightTime),
      attr(rp, rightTieBreak), lp, rp, forward))
  }
}
