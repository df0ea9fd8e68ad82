package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.ColumnBridge

/** As-of join as a first-class operator: logical node + planner
  * strategy + physical merge-scan — the (c) tier of the extension
  * ladder, for semantics the declarative spelling can't express as
  * directly. The declarative union-merge version
  * ([[graft.ops.Temporal.asofJoin]], q51) remains the reference
  * implementation; q58 runs THIS operator against q51's exact oracle,
  * so the custom physical operator is hash-gated against DuckDB too.
  *
  * Semantics: for every left row (k, t, …), attach the payload of the
  * LAST right row (k, t', …) with t' < t (strict), or nulls. Right
  * column names must not collide with left's.
  *
  * Scale design: `requiredChildDistribution` co-partitions both sides
  * on the key, `requiredChildOrdering` sorts within partitions by
  * (key, time) — Catalyst inserts the exchanges/sorts (and AQE still
  * plans them), then `doExecute` is a single zipped merge pass per
  * partition: O(|L|+|R|), no buffering beyond one right row, no
  * window state. That is strictly less memory than the union-merge
  * (which carries a running last-value per window frame) and never
  * materializes a join blowup.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ::
      Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0)
    val rightWidth = right.output.size
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema, schema)
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val buffered = rIter.buffered
      // last right row strictly before the current left row, same key
      var lastKey = Long.MinValue
      var lastMatch: InternalRow = null
      lIter.map { lRow =>
        val k = lRow.getLong(lKeyIdx)
        val t = lRow.getLong(lTimeIdx)
        if (k != lastKey) { lastMatch = null; lastKey = k }
        var advance = true
        while (advance && buffered.hasNext) {
          val head = buffered.head
          val rk = head.getLong(rKeyIdx)
          val rt = head.getLong(rTimeIdx)
          if (rk < k) { buffered.next() }
          else if (rk == k && rt < t) {
            lastMatch = buffered.next().copy()
          } else advance = false
        }
        joined(lRow, if (lastMatch != null) lastMatch else nullRight)
        proj(joined)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** `left` as-of-joined to `right` on long keys + timestamp columns
    * (strictly-before semantics). Column names of `right` must be
    * disjoint from `left`'s.
    */
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    val lPlan = ColumnBridge.planOf(left)
    val rPlan = ColumnBridge.planOf(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"overlapping column names: $dup")
    ColumnBridge.dataFrame(spark, AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime)))
  }
}
