package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a bounded-difference inner join
  * `a JOIN b ON abs(a.x - b.y) <= k` (no equi-keys → Spark plans a
  * BroadcastNestedLoopJoin, O(n·m) comparisons) into the bucketed form
  * that [[graft.operators.Temporal.rangeJoinByValue]] builds by hand:
  *
  *   - left gains bucket `floor(x / k)`;
  *   - right is replicated into buckets `floor(y/k) - 1 | +0 | +1`
  *     (a union of three projections — a matching pair is at most one
  *     bucket apart, and lands in exactly ONE of the three, so no
  *     duplicate results);
  *   - join becomes an equi-join on the bucket with the original
  *     predicate retained as a residual filter.
  *
  * Scope guard: fires only on an Inner join whose entire condition is
  *  `abs(x - y) <= lit`, with x strictly from the left, y strictly from
  *  the right, both double, k > 0, both sides deterministic. Anything
  *  else is left untouched. Null semantics are preserved: a null x or y
  *  nulls the bucket, the equi-join drops the row — the same rows the
  *  original predicate would drop.
  *
  * Enable per-session via `RangeJoinRewrite.enable(spark)`
  * (ExperimentalMethods — public API) or cluster-wide through
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      extract(j, cond) match {
        case None => j
        case Some((x, y, k)) =>
          val lBucket =
            Alias(bucketOf(x, k), "__rjr_lb")()
          val newLeft = Project(left.output :+ lBucket, left)
          val rb = bucketOf(y, k)
          val rbAttr = AttributeReference("__rjr_rb", LongType)()
          // ONE Generate replicating each right row into its three
          // neighbor buckets — the right subtree executes once (a union
          // of three projections would execute it three times)
          val newRight = Generate(
            Explode(CreateArray(Seq(
              Add(rb, Literal(-1L)), rb, Add(rb, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(rbAttr), child = right)
          val joined = Join(newLeft, newRight, Inner,
            Some(And(EqualTo(lBucket.toAttribute, rbAttr), cond)), hint)
          Project(j.output, joined)
      }
  }

  /** `floor(v / k)`, clamped one step inside the Long range so the ±1
    * neighbor arithmetic can never overflow under ANSI mode — huge or
    * infinite values saturate into edge buckets and the residual
    * predicate (false for any such pair: abs diff is inf/NaN) discards
    * them, exactly as the un-rewritten join would.
    *
    * A NULL `v` must propagate to a NULL bucket explicitly:
    * Greatest/Least SKIP null children (the literal bound would win),
    * which would funnel every null-valued row on both sides — ×3 via
    * the neighbor expansion — into one shared bucket: an
    * O(nulls²) single-task pair set that only the residual predicate
    * discards. With a NULL bucket the inner equi-join drops the row
    * outright, matching the un-rewritten join (NULL comparison is never
    * true). */
  private def bucketOf(v: Expression, k: Double): Expression = {
    val clamped = Least(Seq(
      Greatest(Seq(Floor(Divide(v, Literal(k, DoubleType))),
        Literal(Long.MinValue + 1, LongType))),
      Literal(Long.MaxValue - 1, LongType)))
    If(IsNull(v), Literal(null, LongType), clamped)
  }

  /** Match `abs(x - y) <= k` with x ⊆ left, y ⊆ right (or mirrored),
    * both DoubleType and deterministic, k a positive double literal. */
  private def extract(j: Join, cond: Expression): Option[(Expression, Expression, Double)] =
    cond match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(k: Double, DoubleType))
          if k > 0 && a.deterministic && b.deterministic &&
            a.dataType == DoubleType && b.dataType == DoubleType =>
        if (a.references.subsetOf(j.left.outputSet) &&
            b.references.subsetOf(j.right.outputSet)) Some((a, b, k))
        else if (b.references.subsetOf(j.left.outputSet) &&
            a.references.subsetOf(j.right.outputSet)) Some((b, a, k))
        else None
      case _ => None
    }
}
