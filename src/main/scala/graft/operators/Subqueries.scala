package graft.operators

import graft.QuerySpec

/** Subquery surface of the reference — analysis/Subquery.java,
  * StmtRewriter.java:40-887: scalar subqueries in binary predicates,
  * [NOT] IN, [NOT] EXISTS, correlated forms; all rewritten to joins by the
  * reference's StmtRewriter, and by Catalyst's RewritePredicateSubquery /
  * RewriteCorrelatedScalarSubquery for us. Written in engine-portable SQL:
  * the same text runs on Spark and the DuckDB oracle, so the oracle checks
  * the whole parse→rewrite→join pipeline.
  */
object Subqueries {

  /** Uncorrelated scalar subquery in a comparison predicate
    * (StmtRewriter scalar-subquery → cross-join rewrite). max() is exact
    * on DOUBLE, so the derived threshold is engine-stable. */
  val q41ScalarUncorrelated: QuerySpec = QuerySpec.sql(
    "q41_sub_scalar_uncorr",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 0.9 * (SELECT MAX(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin)

  /** Uncorrelated IN subquery → LEFT SEMI rewrite. */
  val q42InSubquery: QuerySpec = QuerySpec.sql(
    "q42_sub_in",
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE c_custkey IN
      |  (SELECT o_custkey FROM orders
      |   WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000)
      |ORDER BY c_custkey""".stripMargin)

  /** Correlated EXISTS → LEFT SEMI with hoisted correlation predicate. */
  val q43ExistsCorrelated: QuerySpec = QuerySpec.sql(
    "q43_sub_exists_corr",
    """SELECT o_orderkey, o_orderpriority
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49.5)
      |ORDER BY o_orderkey""".stripMargin)

  /** Correlated NOT EXISTS → LEFT ANTI. */
  val q44NotExistsCorrelated: QuerySpec = QuerySpec.sql(
    "q44_sub_not_exists_corr",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 290000
      |  AND NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
      |ORDER BY o_orderkey""".stripMargin)

  /** Correlated scalar subquery (per-group max equality) →
    * RewriteCorrelatedScalarSubquery plans a LEFT OUTER against the
    * grouped subquery; max() keeps the comparison exact. */
  val q45ScalarCorrelated: QuerySpec = QuerySpec.sql(
    "q45_sub_scalar_corr",
    """SELECT c_nationkey AS nationkey, c_custkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal = (SELECT MAX(c2.c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY nationkey, c_custkey""".stripMargin)

  /** Scalar COUNT subquery compared against a constant — the reference's
    * trickiest rewrite (empty group must read as 0, not NULL: zeroifnull
    * insertion, StmtRewriter.java scalar-agg handling). */
  val q46CountSubquery: QuerySpec = QuerySpec.sql(
    "q46_sub_count_scalar",
    """SELECT c_custkey
      |FROM customer c
      |WHERE (SELECT COUNT(*) FROM orders o
      |       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) >= 8
      |ORDER BY c_custkey""".stripMargin)

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — top-k per
    * outer row, the modern spelling of the reference's SubplanNode
    * (planner/SubplanNode.java:27-109: evaluate right subtree per input
    * row). Spark decorrelates it into a ranked join (one shuffle on the
    * correlation key), not a per-row re-execution — at 100 TB the outer
    * table drives a single window pass instead of N subplan runs. */
  val q145LateralTopK: QuerySpec = QuerySpec.sql(
    "q145_sub_lateral_topk",
    """SELECT r.r_name, t.c_name, t.c_acctbal
      |FROM region r,
      |LATERAL (
      |  SELECT c.c_name, c.c_acctbal
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  WHERE n.n_regionkey = r.r_regionkey
      |  ORDER BY c.c_acctbal DESC, c.c_name
      |  LIMIT 2) t
      |ORDER BY r.r_name, t.c_acctbal DESC, t.c_name""".stripMargin)

  val all: Seq[QuerySpec] = Seq(
    q41ScalarUncorrelated, q42InSubquery, q43ExistsCorrelated,
    q44NotExistsCorrelated, q45ScalarCorrelated, q46CountSubquery,
    q145LateralTopK)
}
