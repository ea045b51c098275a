package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Small-query single-node fast path — the reference's
  * exec_single_node_rows_threshold semantics (planner/Planner.java:91-108
  * + util/MaxRowsProcessedVisitor.java:28-60): when the planner can PROVE
  * a query processes at most N rows, skip the distributed machinery —
  * the exchanges cost more than the work.
  *
  * Spark-first translation: rather than a separate single-node plan
  * fragment, coalesce every leaf to one partition
  * (`Repartition(1, shuffle = false)`). `SinglePartition` satisfies
  * every downstream required distribution, so EnsureRequirements inserts
  * ZERO shuffle exchanges — joins, aggregates and sorts all run in one
  * task, which is exactly the reference's single-node plan, expressed
  * through Catalyst instead of around it.
  *
  * The rows-processed bound mirrors MaxRowsProcessedVisitor's shape: a
  * literal LIMIT directly above an unfiltered scan chain bounds that
  * scan (both engines stop early); a Filter or Sort voids the bound (the
  * scan may process everything); leaves must otherwise prove their
  * cardinality via `maxRows` (VALUES, ranges) or catalog row-count stats
  * (the COMPUTE STATS analogue); any unknown aborts — the fast path only
  * fires on proof, never on hope. Bounds sum across children.
  *
  * `spark.graft.exec.singleNodeRowsThreshold` — 0 disables; the
  * reference's default is 100 rows, applied here too. */
object SmallQueryFastPath extends Rule[LogicalPlan] {

  val ThresholdKey = "spark.graft.exec.singleNodeRowsThreshold"
  val DefaultThreshold = "100"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.getConfString(ThresholdKey, DefaultThreshold).toLong
    if (threshold <= 0 || plan.isStreaming) return plan
    // idempotency under the fixed-point user batch: already coalesced
    if (plan.exists {
          case r: Repartition => r.numPartitions == 1
          case _ => false
        }) return plan
    maxRowsProcessed(plan) match {
      case Some(rows) if rows <= threshold =>
        plan.transformUp { case l: LeafNode => Repartition(1, shuffle = false, l) }
      case _ => plan
    }
  }

  private def literalLimit(e: Expression): Option[BigInt] = e match {
    case Literal(n: Int, _) => Some(BigInt(n))
    case _ => None
  }

  /** Upper bound on rows processed anywhere in the plan; None = no proof. */
  private[plans] def maxRowsProcessed(plan: LogicalPlan): Option[BigInt] =
    bound(plan, None)

  private def bound(p: LogicalPlan, lim: Option[BigInt]): Option[BigInt] = p match {
    case GlobalLimit(le, c) =>
      literalLimit(le).flatMap(k => bound(c, Some(lim.fold(k)(_ min k))))
    case LocalLimit(le, c) =>
      literalLimit(le).flatMap(k => bound(c, Some(lim.fold(k)(_ min k))))
    case pr: Project => bound(pr.child, lim)
    // a predicate below a limit means the scan can process arbitrarily
    // many rows before k of them pass — the limit no longer bounds it
    case f: Filter => bound(f.child, None)
    case s: Sort => bound(s.child, None)
    case l: LeafNode =>
      val rows = l.maxRows.map(BigInt(_)).orElse(l.stats.rowCount)
      (lim, rows) match {
        case (Some(k), Some(r)) => Some(k min r)
        case (Some(k), None)    => Some(k) // incremental take: ~k rows read
        case (None, r)          => r
      }
    case other if other.children.nonEmpty =>
      val bs = other.children.map(bound(_, None))
      if (bs.forall(_.isDefined)) Some(bs.flatten.sum) else None
    case _ => None
  }
}
