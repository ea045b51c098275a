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
  * "Remove Unresolved Hints" cleanup). It stamps every hint-less join
  * under the hint scope with a present-but-strategy-free [[JoinHint]]:
  * both Catalyst reorder paths — the heuristic ReorderJoin flatten and
  * the CBO CostBasedJoinReorder — pattern-match `JoinHint.NONE` and
  * leave any join carrying a hint in text order, while an empty
  * [[HintInfo]] forces NO strategy, so physical join selection
  * (broadcast vs shuffle) stays size-based exactly as before.
  *
  * At resolution time a user strategy hint (BROADCAST/MERGE/…) is still
  * a [[ResolvedHint]] wrapper above the named relation — it only merges
  * into the enclosing join in the optimizer's EliminateResolvedHint,
  * and ONLY into joins whose hint is still `JoinHint.NONE`. Stamping
  * alone would therefore silently drop any strategy hint inside a
  * STRAIGHT_JOIN scope. So before stamping, this rule performs the
  * same child-arm extraction EliminateResolvedHint would (walk each
  * arm through unary nodes, collect and strip ResolvedHint wrappers,
  * stopping at the next binary node) and folds the collected strategy
  * into the stamped hint side — order pinned AND the user's broadcast
  * preserved. Scope is the hinted query block's subtree, matching the
  * reference (a subquery with its own SELECT list needs its own
  * token). */
object StraightJoinHint extends Rule[LogicalPlan] {

  /** Mirror of the optimizer's hint extraction: pull ResolvedHint
    * wrappers out of a join arm, recursing through unary nodes and
    * stopping at the next leaf/binary node (a nested join keeps its
    * own arms' hints for its own stamping pass). */
  private def extract(plan: LogicalPlan): (LogicalPlan, Seq[HintInfo]) =
    plan match {
      case h: ResolvedHint =>
        val (c, hs) = extract(h.child)
        (c, h.hints +: hs)
      case u: UnaryNode =>
        val (c, hs) = extract(u.child)
        (u.withNewChildren(Seq(c)), hs)
      case other => (other, Nil)
    }

  /** First strategy wins (matches HintInfo.merge's resolution order for
    * the outermost hint); an arm with no hints pins order only.
    * Conflicting strategies inside one arm are logged, not silently
    * dropped — Spark's EliminateResolvedHint warns on hint conflicts
    * too (ADVICE r15). */
  private def fold(hints: Seq[HintInfo]): HintInfo = {
    val strategic = hints.filter(_.strategy.isDefined)
    if (strategic.size > 1)
      logWarning(s"STRAIGHT_JOIN arm carries ${strategic.size} strategy " +
        s"hints ${strategic.flatMap(_.strategy).mkString("[", ", ", "]")}; " +
        s"keeping the outermost (${strategic.head.strategy.get})")
    strategic.headOption.getOrElse(HintInfo())
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case UnresolvedHint(name, Nil, child)
        if name.equalsIgnoreCase("STRAIGHT_JOIN") =>
      child.transformUp {
        case j: Join if j.hint == JoinHint.NONE =>
          val (l, lh) = extract(j.left)
          val (r, rh) = extract(j.right)
          j.copy(left = l, right = r,
            hint = JoinHint(Some(fold(lh)), Some(fold(rh))))
      }
  }
}
