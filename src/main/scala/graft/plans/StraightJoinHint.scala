package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** `straight_join` analogue — the reference's per-statement toggle that
  * pins the FROM-clause join order (sql-parser.cup:9545 parses the token
  * after SELECT; TableRef.java:374-390 carries it into the planner,
  * which then skips createCheapestJoinPlan's cost-based ordering).
  *
  * Spark-first translation: a statement-level hint,
  *
  *   SELECT /*+ STRAIGHT_JOIN */ ... FROM a JOIN b ... JOIN c ...
  *
  * resolved by this analyzer rule (injected through
  * [[graft.engine.GraftExtensions]], so it runs before the analyzer's
  * "Remove Unresolved Hints" cleanup). It marks every hint-less join
  * under the hint scope with an empty-but-present [[JoinHint]]: both
  * Catalyst reorder paths — the heuristic ReorderJoin flatten and the
  * CBO CostBasedJoinReorder — pattern-match `JoinHint.NONE` and leave
  * any join carrying user hints in text order, while an empty
  * [[HintInfo]] forces NO strategy, so physical join selection
  * (broadcast vs shuffle) stays size-based exactly as before. Joins that
  * already carry a real strategy hint keep it untouched. Scope is the
  * hinted query block's subtree, matching the reference (a subquery with
  * its own SELECT list needs its own token). */
object StraightJoinHint extends Rule[LogicalPlan] {
  private val NoReorder = JoinHint(Some(HintInfo()), Some(HintInfo()))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case UnresolvedHint(name, Nil, child)
        if name.equalsIgnoreCase("STRAIGHT_JOIN") =>
      child.transformUp {
        case j: Join if j.hint == JoinHint.NONE => j.copy(hint = NoReorder)
      }
  }
}
