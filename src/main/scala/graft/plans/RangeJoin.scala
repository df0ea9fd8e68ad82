package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Bucketed range-join rewrite.
  *
  * Open-source Spark plans an inner join whose only condition is a
  * range predicate (`l.v >= r.lo AND l.v < r.hi`) as a broadcast
  * nested-loop / cartesian — O(|L|·|R|) comparisons, a wall at 100 TB
  * whenever the interval side is too big to broadcast-scan cheaply.
  * This optimizer rule rewrites such joins into an equi-join on a
  * bucket id:
  *
  *   - point side gains `bucket = floor(v / W)` (one value per row);
  *   - interval side explodes into one row per covered bucket,
  *     `sequence(floor(lo/W), floor(hi/W))`;
  *   - the join becomes `bucket_l = bucket_r AND <original range>`,
  *     which Catalyst plans as a shuffled hash / sort-merge join.
  *
  * Each point row has exactly one bucket, so a matching (point,
  * interval) pair meets on exactly one bucket value — no duplicate
  * results, and the retained original predicate discards the
  * overcovered boundary buckets. Null keys drop on both paths
  * (inner-join null semantics ≡ three-valued predicate semantics).
  *
  * Opt-in and scoped two ways:
  *   - per plan (preferred): `graft.ops.RangeOps.bucketedRangeJoin`
  *     tags exactly one Join node with [[RangeJoinRewrite.WidthTag]] —
  *     no other join in the session is touched;
  *   - per session: setting `spark.graft.rangeJoin.bucketWidth`
  *     activates the rewrite for every qualifying inner join (the
  *     width W is in the point column's units, chosen ~ the typical
  *     interval length).
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  /** Per-plan opt-in: a Join carrying this tag is rewritten with the
    * tagged width regardless of the session conf. Catalyst's
    * transform/clone machinery copies tags, so a tag set on the
    * analyzed Join survives to the optimizer.
    */
  val WidthTag = new TreeNodeTag[Double]("graft.rangeJoin.bucketWidth")

  private val BucketPrefix = "__graft_bucket"

  private def width: Option[Double] =
    Option(SQLConf.get.getConfString(WidthConf, null)).map(_.toDouble)

  /** The rule lives in a fix-point optimizer batch, so it must be
    * idempotent: a join whose inputs already carry a bucket column is
    * one we produced — leave it alone.
    */
  private def alreadyRewritten(j: Join): Boolean =
    (j.left.output ++ j.right.output).exists(_.name.startsWith(BucketPrefix))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val sessionWidth = width
    plan.transformUp {
      case j: Join if j.joinType == Inner && j.condition.isDefined &&
          !alreadyRewritten(j) =>
        j.getTagValue(WidthTag).orElse(sessionWidth) match {
          case Some(w) => rewrite(j, w).getOrElse(j)
          case None => j
        }
    }
  }

  /** `v >= lo AND (v < hi | v <= hi)` with v from one side and lo/hi
    * from the other (either orientation) → bucketed equi-join.
    */
  private def rewrite(j: Join, w: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    def fromLeft(e: Expression) = e.references.subsetOf(j.left.outputSet)
    def fromRight(e: Expression) = e.references.subsetOf(j.right.outputSet)

    // normalize each comparison to (smaller, larger)
    val lowerBounds = conjuncts.collect {
      case GreaterThanOrEqual(v, lo) => (lo, v)
      case LessThanOrEqual(lo, v) => (lo, v)
      case GreaterThan(v, lo) => (lo, v)
      case LessThan(lo, v) => (lo, v)
    }
    val upperBounds = conjuncts.collect {
      case LessThanOrEqual(v, hi) => (v, hi)
      case GreaterThanOrEqual(hi, v) => (v, hi)
      case LessThan(v, hi) => (v, hi)
      case GreaterThan(hi, v) => (v, hi)
    }
    // find a (v, lo, hi) where v is a point column on one side and
    // lo/hi both live on the other
    val candidates = for {
      (lo, v1) <- lowerBounds
      (v2, hi) <- upperBounds
      if v1.semanticEquals(v2)
      if (fromLeft(v1) && fromRight(lo) && fromRight(hi)) ||
        (fromRight(v1) && fromLeft(lo) && fromLeft(hi))
    } yield (v1, lo, hi)

    candidates.headOption.map { case (v, lo, hi) =>
      val pointOnLeft = fromLeft(v)
      val (pointSide, intervalSide) =
        if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      // constructed post-analysis: TimeZoneAwareExpressions (Cast,
      // Sequence) must get their zone explicitly — ResolveTimeZone
      // has already run, and an empty zone leaves the plan unresolved
      val tz = Some(SQLConf.get.sessionLocalTimeZone)
      def bucketOf(e: Expression): Expression =
        Cast(Floor(Divide(Cast(e, DoubleType, tz), Literal(w))), LongType, tz)

      val pointBucket = Alias(bucketOf(v), "__graft_bucket_p")()
      val pointPlan = Project(pointSide.output :+ pointBucket, pointSide)

      // Degenerate intervals (lo > hi) match nothing under the
      // original predicate; clamp so Sequence emits one bucket instead
      // of throwing on a negative range.
      val seq = Sequence(bucketOf(lo),
        Greatest(Seq(bucketOf(hi), bucketOf(lo))), Some(Literal(1L)), tz)
      val bucketAttr =
        AttributeReference("__graft_bucket_i", LongType, nullable = false)()
      val intervalPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(bucketAttr), child = intervalSide)

      val (newLeft, newRight) =
        if (pointOnLeft) (pointPlan, intervalPlan)
        else (intervalPlan, pointPlan)
      val newCond = And(EqualTo(pointBucket.toAttribute, bucketAttr),
        j.condition.get)
      Project(j.output,
        Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }
}

/** Tripwire for the per-plan opt-in: a Join still carrying
  * [[RangeJoinRewrite.WidthTag]] at physical planning means the
  * optimizer rule never rewrote it (unrecognized condition shape, or
  * the rule was not installed) and the query is about to run as a
  * nested-loop. Logs a warning and plans nothing, so the fallback
  * still executes — degraded, but no longer silently. (A Catalyst
  * rule that rebuilds the Join via its constructor drops the tag and
  * escapes this check too; PlanSpec pins the rewritten plan shape per
  * Spark upgrade for that case.)
  */
object RangeJoinWarnStrategy
    extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = plan match {
    case j: Join if j.getTagValue(RangeJoinRewrite.WidthTag).isDefined =>
      logWarning(
        "graft: a bucketedRangeJoin-tagged join reached physical planning " +
          "un-rewritten; it will execute as a nested-loop join. Check that " +
          "GraftExtensions is installed and the join condition is a " +
          "recognized range shape (v >= lo AND v </<= hi).")
      Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions` entry point installing the engine's
  * planner/optimizer extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => RangeJoinWarnStrategy)
  }
}
