package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** The reference's APPX_COUNT_DISTINCT query option as a Catalyst rule
  * (`analysis/SelectStmt.java:642-666`: "Optionally rewrite all
  * count(distinct <expr>) into equivalent NDV() calls"): when
  * `spark.graft.appxCountDistinct` is true, every single-argument
  * `COUNT(DISTINCT x)` aggregate is replaced by the HyperLogLog++
  * estimate — the engine function `ndv()` maps to the same aggregate —
  * with the identical BIGINT result type the reference asserts
  * (`ndvFnCall.getType().equals(aggExpr.getType())`).
  *
  * Why a user would flip it: an exact distinct count forces a second
  * shuffle keyed on the counted expression (the two-phase distinct
  * rewrite); the sketch aggregates in ONE pass with map-side partial
  * merge — at 100 TB that is the difference between re-shuffling the
  * fact table per distinct column and a single scan. Multi-argument
  * `COUNT(DISTINCT a, b)` is left exact, exactly as the reference skips
  * `getParams().size() != 1`.
  *
  * Opt-in and inert by default, like [[RangeBucketJoinRewrite]]; applied
  * through the same two paths (session-attached extraOptimizations and
  * GraftExtensions.injectOptimizerRule). The two paths see different
  * plan states: extraOptimizations runs after
  * RewriteDistinctAggregates (multi-group queries already expanded),
  * while the extensions hook runs inside the Operator Optimization
  * batch BEFORE it. So the rule skips any Aggregate carrying more than
  * one distinct-argument group — otherwise the same query would be
  * exact on one wiring and approximate on the other. The reference has
  * no such split (its rewrite targets each FunctionCallExpr in
  * isolation), so single-group-only is the conservative intersection
  * of both semantics. */
object AppxCountDistinctRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.appxCountDistinct"

  private def enabled: Boolean =
    try conf.getConfString(EnabledKey, "false").toBoolean
    catch { case _: IllegalArgumentException => false }

  def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate if distinctGroups(agg) <= 1 =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(children), _, true, _, _)
              if children.size == 1 =>
            ae.copy(aggregateFunction = HyperLogLogPlusPlus(children.head),
              isDistinct = false)
        }
    }

  /** Distinct-argument groups, as RewriteDistinctAggregates groups them:
    * one per unique distinct-aggregate child set (with a filter treated
    * as its own group, matching that rule's expand-keying). */
  private def distinctGroups(agg: Aggregate): Int =
    agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression if ae.isDistinct =>
        (ae.aggregateFunction.children.map(_.canonicalized).toSet, ae.filter.map(_.canonicalized))
    }).distinct.size
}
