package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numeric helpers.
  *
  * Double-precision SUMs are order-dependent, and Spark's partial/final
  * aggregation (planner analogue: two-phase agg, reference
  * planner/DistributedPlanner.java:747-948) sums in a different order than
  * a single-threaded oracle — last-ulp drift would fail a hash compare.
  * Casting inputs to DECIMAL makes aggregation exact and therefore
  * order/partitioning-independent (same trick at any cluster size), after
  * which a final cast to DOUBLE is deterministic on both engines.
  */
object Num {
  /** money-like doubles (prices, balances): 2-decimal values up to 1e9 */
  val Money: DecimalType = DecimalType(12, 2)
  /** unit-interval rates (discount, tax): 6 decimals avoids double↔decimal
    * rounding ties that exist at scale 2 (e.g. 0.125) */
  val Rate: DecimalType = DecimalType(8, 6)

  def money(c: Column): Column = c.cast(Money)
  def rate(c: Column): Column = c.cast(Rate)

  /** exact decimal sum surfaced as DOUBLE */
  def dsum(c: Column): Column = sum(c).cast("double")
  /** exact-sum-based average surfaced as DOUBLE (avoids engine-specific
    * AVG accumulation) */
  def davg(c: Column): Column = sum(c).cast("double") / count(c)

  /** Oracle-side SQL fragments mirroring the casts above. */
  val MoneySql = "DECIMAL(12,2)"
  val RateSql = "DECIMAL(8,6)"
}
