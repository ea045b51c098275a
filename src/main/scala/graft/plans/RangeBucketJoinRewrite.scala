package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, TimestampType}

/** Opt-in optimizer rule: plan a pure timestamp *range* join as a
  * bucket-blocked EQUI join.
  *
  * Spark (like the reference — theta joins go through
  * planner/NestedLoopJoinNode.java:1-133) executes a join whose only
  * condition is `point BETWEEN lo AND hi` as a nested loop: O(N·M)
  * comparisons, a broadcast loop at best and a cartesian product at
  * worst. At 100 TB of events that plan is not runnable. This rule
  * rewrites
  *
  *   Join(P, B, Inner, p.ts >= b.lo AND p.ts <= b.hi)
  *
  * into
  *
  *   Project(orig output,
  *     Filter(original condition,                  -- exact refine
  *       Join(P + bucket(ts), explode(B, buckets(lo..hi)),
  *            Inner, bucket = bucket)))            -- hash join!
  *
  * where bucket(t) = epochSeconds(t) DIV width. Every interval explodes
  * into the buckets it covers, so a matching pair is guaranteed to
  * collide on the point row's single bucket (epoch-second extraction and
  * truncating division are monotonic, so lo <= ts <= hi implies
  * bucket(lo) <= bucket(ts) <= bucket(hi)); the original predicate then
  * filters false bucket neighbours. Cost becomes O(N + M·w/width) rows
  * through a hash join — the shape that survives 1M windows. A duplicate
  * can only arise if one interval emitted the same bucket twice, which
  * `sequence` cannot do, so no dedup is needed.
  *
  * Opt-in (the reference's SET-query-option surface, sql-parser.cup:
  * 678-897): inert unless `spark.graft.rangeJoin.bucketSeconds` is a
  * positive number — the user picks a width of the order of typical
  * interval length (fan-out is |interval|/width + 1 rows per interval).
  * The rule skips joins that already carry an equi conjunct (those hash
  * join fine) and streaming plans (stream-stream interval joins manage
  * watermark state through their own operator).
  *
  * Applied via [[graft.engine.GraftSession.attach]]
  * (`spark.experimental.extraOptimizations`) and
  * [[graft.engine.GraftExtensions]] (`injectOptimizerRule`). Idempotent:
  * the rewritten join carries an equi conjunct, so even after predicate
  * pushdown folds the refine filter back into the join condition the
  * guard refuses a second rewrite.
  */
object RangeBucketJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketSeconds"

  private def widthSeconds: Long =
    try conf.getConfString(WidthKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = widthSeconds
    if (width <= 0 || plan.isStreaming) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && !j.left.isStreaming && !j.right.isStreaming =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  /** A conjunct `point <op> bound` with the point expression on a known
    * side; `lower` = true when it reads `point >= bound`. */
  private case class Band(point: Expression, bound: Expression, lower: Boolean)

  private def asBand(e: Expression): Option[Band] = e match {
    case GreaterThanOrEqual(a, b) => Some(Band(a, b, lower = true))
    case GreaterThan(a, b)        => Some(Band(a, b, lower = true))
    case LessThanOrEqual(a, b)    => Some(Band(a, b, lower = false))
    case LessThan(a, b)           => Some(Band(a, b, lower = false))
    case _                        => None
  }

  // TimestampType only: cast-to-long (epoch seconds) is guaranteed
  // resolvable; NTZ would need its own epoch extraction
  private def isTimestamp(e: Expression): Boolean =
    e.dataType == TimestampType

  private def bucket(point: Expression, width: Long): Expression =
    IntegralDivide(Cast(point, LongType), Literal(width))

  private def rewrite(j: Join, cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (b.references.subsetOf(j.left.outputSet) && a.references.subsetOf(j.right.outputSet))
      case EqualNullSafe(a, b) =>
        (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet)) ||
          (b.references.subsetOf(j.left.outputSet) && a.references.subsetOf(j.right.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    // the point expression lives on `side`; both bounds on the other side
    def bandsFor(side: LogicalPlan, other: LogicalPlan): Option[(Expression, Expression, Expression)] = {
      val bands = conjuncts.flatMap(asBand).flatMap {
        case Band(a, b, lower)
            if a.references.nonEmpty && a.references.subsetOf(side.outputSet) &&
              b.references.nonEmpty && b.references.subsetOf(other.outputSet) =>
          Some(Band(a, b, lower))
        case Band(a, b, lower)
            if b.references.nonEmpty && b.references.subsetOf(side.outputSet) &&
              a.references.nonEmpty && a.references.subsetOf(other.outputSet) =>
          Some(Band(b, a, !lower)) // bound <op> point, flipped
        case _ => None
      }
      for {
        lo <- bands.find(b => b.lower && isTimestamp(b.point) && b.point.deterministic && b.bound.deterministic)
        hi <- bands.find(b => !b.lower && b.point.semanticEquals(lo.point) && b.bound.deterministic)
      } yield (lo.point, lo.bound, hi.bound)
    }

    val leftIsPoint = bandsFor(j.left, j.right)
    val found = leftIsPoint.map((_, true)).orElse(bandsFor(j.right, j.left).map((_, false)))
    found.map { case ((point, lo, hi), pointOnLeft) =>
      val (pointPlan, boundsPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

      val pBucket = Alias(bucket(point, width), "__graft_pbucket")()
      val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)

      // Sequence is TimeZoneAwareExpression: resolved only with a zone id.
      // A reversed/empty interval (lo > hi) must yield an EMPTY bucket set,
      // not a descending enumeration (default step -1 walks DOWN, possibly
      // materializing a huge array) and not an error (explicit step 1 makes
      // Sequence throw on start > stop) — so guard with a conditional. Null
      // bounds also land in the else branch: no buckets, row drops, same as
      // the original join condition evaluating to null.
      val bLo = bucket(lo, width)
      val bHi = bucket(hi, width)
      val seq = If(
        LessThanOrEqual(bLo, bHi),
        Sequence(bLo, bHi, Some(Literal(1L)), Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val bBucket = AttributeReference("__graft_bucket", LongType, nullable = true)()
      val boundsGen = Generate(Explode(seq), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(bBucket), child = boundsPlan)

      val equi = EqualTo(pBucket.toAttribute, bBucket)
      val newJoin =
        if (pointOnLeft) Join(pointProj, boundsGen, Inner, Some(equi), j.hint)
        else Join(boundsGen, pointProj, Inner, Some(equi), j.hint)
      Project(j.output, Filter(cond, newJoin))
    }
  }
}
