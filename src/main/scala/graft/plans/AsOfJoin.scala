package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join as a first-class operator: logical node + planner
  * strategy + physical merge-scan — the (c) tier of the extension
  * ladder, for semantics the declarative spelling can't express as
  * directly. The declarative union-merge version
  * ([[graft.ops.Temporal.asofJoin]], q51) remains the reference
  * implementation; q58 runs THIS operator against q51's exact oracle,
  * so the custom physical operator is hash-gated against DuckDB too.
  *
  * Semantics: for every left row (k, t, …), attach the payload of the
  * LAST right row (k, t', …) with t' < t, or nulls. With tiebreak
  * columns the bound is lexicographic — (t', tb') < (t, tb) — which
  * matches the windowed union-merge spelling (ORDER BY ts, event_id
  * ROWS … 1 PRECEDING) exactly, including duplicate-timestamp rows;
  * without them the bound is strict t' < t and same-timestamp right
  * rows are excluded (and "last" among equal t' is sort-arbitrary).
  * Right column names must not collide with left's.
  *
  * Scale design: `requiredChildDistribution` co-partitions both sides
  * on the key, `requiredChildOrdering` sorts within partitions by
  * (key, time, tiebreak) — Catalyst inserts the exchanges/sorts (and
  * AQE still plans them), then `doExecute` is a single zipped merge
  * pass per partition: O(|L|+|R|), no buffering beyond one right row,
  * no window state. That is strictly less memory than the union-merge
  * (which carries a running last-value per window frame) and never
  * materializes a join blowup.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    leftTie: Option[Attribute], rightTie: Option[Attribute])
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    leftTie: Option[Attribute], rightTie: Option[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ++
      leftTie.map(SortOrder(_, Ascending))) ::
      (Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        rightTie.map(SortOrder(_, Ascending))) ::
      Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ++
      leftTie.map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    def idx(side: SparkPlan, a: Attribute): Int =
      side.output.indexWhere(_.exprId == a.exprId)
    val lKeyIdx = idx(left, leftKey)
    val lTimeIdx = idx(left, leftTime)
    val rKeyIdx = idx(right, rightKey)
    val rTimeIdx = idx(right, rightTime)
    require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0)
    val lTieIdx = leftTie.map(idx(left, _)).getOrElse(-1)
    val rTieIdx = rightTie.map(idx(right, _)).getOrElse(-1)
    val withTie = lTieIdx >= 0 && rTieIdx >= 0
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
        val ltb = if (withTie) lRow.getLong(lTieIdx) else 0L
        if (k != lastKey) { lastMatch = null; lastKey = k }
        var advance = true
        while (advance && buffered.hasNext) {
          val head = buffered.head
          val rk = head.getLong(rKeyIdx)
          val rt = head.getLong(rTimeIdx)
          if (rk < k) { buffered.next() }
          else if (rk == k && (rt < t ||
              (withTie && rt == t && head.getLong(rTieIdx) < ltb))) {
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
    case AsOfJoinNode(l, r, lk, lt, rk, rt, ltb, rtb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, ltb, rtb) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** `left` as-of-joined to `right` on long/timestamp keys + time
    * columns. With `leftTie`/`rightTie` (e.g. event ids) the bound is
    * lexicographic `(rt, rtb) < (t, ltb)` — deterministic on duplicate
    * timestamps; without them it is strict `rt < t`. Column names of
    * `right` must be disjoint from `left`'s.
    */
  def apply(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      leftTie: Option[String] = None,
      rightTie: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    val lPlan = ColumnBridge.planOf(left)
    val rPlan = ColumnBridge.planOf(right)
    def attr(p: LogicalPlan, name: String): Attribute = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
      // the merge scan reads key/time/tie via getLong — fail at plan
      // time, not mid-task, on an incompatible column type
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of column $name must be long/timestamp, got ${a.dataType}")
      a
    }
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"overlapping column names: $dup")
    require(leftTie.isDefined == rightTie.isDefined,
      "tiebreak columns must be given for both sides or neither")
    ColumnBridge.dataFrame(spark, AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, leftKey), attr(lPlan, leftTime),
      attr(rPlan, rightKey), attr(rPlan, rightTime),
      leftTie.map(attr(lPlan, _)), rightTie.map(attr(rPlan, _))))
  }
}
