package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** The reference's `optimize_partition_key_scans` query option
  * (SingleNodePlanner.java:603-613, 762-780; golden family
  * PlannerTest.java:178 testPartitionKeyScans): `SELECT DISTINCT
  * part_col`, `MIN/MAX(part_col)` and `NDV(part_col)` over a
  * partitioned table are answered from the PARTITION METADATA — "what
  * dates do we have?" over a 100 TB date-partitioned table is
  * O(partitions), not a full scan.
  *
  * Spark-first translation: when `spark.graft.optimizePartitionKeyScans`
  * is true, an [[Aggregate]] whose entire subtree references only
  * partition columns of a [[HadoopFsRelation]] — and whose aggregate
  * functions are all DUPLICATE-INSENSITIVE (min/max/ndv/count-distinct;
  * plain DISTINCT is an aggregate with no functions at all) — has the
  * file relation swapped for a [[LocalRelation]] holding one row per
  * non-empty partition directory, taken from the already-cached driver
  * file index. Any Project/Filter between the aggregate and the scan is
  * kept — Catalyst folds them over the tiny local relation — so
  * partition-pruning predicates, derived expressions and multi-column
  * grouping all behave identically to the scan they replaced.
  *
  * Opt-in, mirroring the reference's contract: a partition whose files
  * hold ZERO ROWS (as opposed to zero files, which is skipped) would
  * contribute a value a real scan would not — the same documented
  * caveat that keeps the reference's flag (and Spark's retired
  * `spark.sql.optimizer.metadataOnly`) default-off. Registered through
  * [[graft.engine.GraftSession.installOptimizerRules]] like the other
  * opt-in rewrites. */
object PartitionKeyScans extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.optimizePartitionKeyScans"

  private def enabled: Boolean =
    try conf.getConfString(EnabledKey, "false").toBoolean
    catch { case _: IllegalArgumentException => false }

  def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate if dupInsensitive(agg) =>
        rewrite(agg).getOrElse(agg)
    }

  /** Every aggregate function in the list is insensitive to row
    * multiplicity: min/max, HLL (ndv), or any distinct-marked Count.
    * A bare DISTINCT (no functions) passes vacuously. */
  private def dupInsensitive(agg: Aggregate): Boolean = {
    val aggExprs = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression => ae
    })
    aggExprs.forall { ae =>
      ae.filter.isEmpty && (ae.aggregateFunction match {
        case _: Min | _: Max | _: HyperLogLogPlusPlus => true
        case _: Count => ae.isDistinct
        case _ => false
      })
    }
  }

  /** Walk the Project/Filter chain below the aggregate; if it bottoms
    * out at a partitioned file relation and the WHOLE subtree touches
    * only partition attributes, swap the relation for the partition
    * listing. */
  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    def chainToRelation(p: LogicalPlan): Option[LogicalRelation] = p match {
      case pr: Project if pr.projectList.forall(_.deterministic) =>
        chainToRelation(pr.child)
      case f: Filter if f.condition.deterministic => chainToRelation(f.child)
      case lr: LogicalRelation => Some(lr)
      case _ => None
    }
    for {
      lr <- chainToRelation(agg.child)
      fs <- lr.relation match {
        case h: HadoopFsRelation if h.partitionSchema.nonEmpty => Some(h)
        case _ => None
      }
      partAttrs = partitionAttrs(lr, fs)
      // every column the aggregate subtree consumes is a partition column
      if referencesOnly(agg, lr, AttributeSet(partAttrs))
    } yield {
      val rows = fs.location.listFiles(Nil, Nil).collect {
        case d if d.files.nonEmpty => d.values.copy()
      }
      val local = LocalRelation(partAttrs, rows)
      agg.transformUp { case _: LogicalRelation => local }
    }
  }

  /** The relation's output attributes that are partition columns, in
    * partition-schema order (the order of values in each
    * PartitionDirectory row). */
  private def partitionAttrs(
      lr: LogicalRelation, fs: HadoopFsRelation): Seq[Attribute] =
    fs.partitionSchema.flatMap(f => lr.output.find(a => conf.resolver(a.name, f.name)))
      .toSeq

  /** All attributes referenced anywhere strictly above the relation —
    * the aggregate itself plus every intermediate Project/Filter —
    * resolve to partition columns. */
  private def referencesOnly(
      agg: Aggregate, lr: LogicalRelation, allowed: AttributeSet): Boolean = {
    var ok = true
    def visit(p: LogicalPlan): Unit = p match {
      case _: LogicalRelation => ()
      case other =>
        ok &&= other.expressions.forall(refsIn(_, allowed, lr))
        other.children.foreach(visit)
    }
    visit(agg)
    ok
  }

  private def refsIn(
      e: Expression, allowed: AttributeSet, lr: LogicalRelation): Boolean =
    e.references.forall { a =>
      // attrs produced by an intermediate Project are checked at their
      // own definition site; only attrs of the relation itself matter
      !lr.outputSet.contains(a) || allowed.contains(a)
    }
}
