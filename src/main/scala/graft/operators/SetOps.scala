package graft.operators

import graft.QuerySpec

/** Set operations + query-structure surface — UnionStmt.java:37-625
  * (UNION normalizes to DISTINCT-prefix + ALL-suffix; DISTINCT implemented
  * as group-by-all-cols, exactly what Catalyst's Distinct→Aggregate does),
  * ValuesStmt.java:22-50, WithClause.java (CTEs), inline views, ORDER BY
  * NULLS FIRST/LAST (QueryStmt.java:170-300), LIMIT/OFFSET
  * (LimitElement.java; UnionNode planner/UnionNode.java:1-228).
  */
object SetOps {

  /** N-ary UNION ALL (UnionNode passthrough; Catalyst CombineUnions). */
  val q21UnionAll: QuerySpec = QuerySpec.sql(
    "q21_union_all",
    """SELECT c_custkey AS key, 'customer' AS src FROM customer WHERE c_custkey <= 200
      |UNION ALL
      |SELECT s_suppkey AS key, 'supplier' AS src FROM supplier
      |UNION ALL
      |SELECT n_nationkey AS key, 'nation' AS src FROM nation
      |ORDER BY src, key""".stripMargin)

  /** UNION DISTINCT → aggregation on all output columns. */
  val q22UnionDistinct: QuerySpec = QuerySpec.sql(
    "q22_union_distinct",
    """SELECT c_nationkey AS nk FROM customer
      |UNION
      |SELECT s_nationkey AS nk FROM supplier
      |ORDER BY nk""".stripMargin)

  /** VALUES constant relation (ValuesStmt = constrained UNION ALL of
    * constant selects). Spark spells the inline table `VALUES … AS t(…)`,
    * DuckDB `(VALUES …) t(…)`. */
  val q23Values: QuerySpec = QuerySpec.sql2(
    "q23_values",
    """SELECT id, tag, score FROM VALUES
      |  (1, 'alpha', 1.5D), (2, 'beta', CAST(NULL AS DOUBLE)), (3, 'gamma', -2.25D)
      |  AS t(id, tag, score)
      |ORDER BY id""".stripMargin,
    """SELECT id, tag, score FROM
      |  (VALUES (1, 'alpha', 1.5), (2, 'beta', CAST(NULL AS DOUBLE)), (3, 'gamma', -2.25))
      |  t(id, tag, score)
      |ORDER BY id""".stripMargin)

  /** WITH / CTEs, referenced twice (WithClause registers inline views). */
  val q24WithCte: QuerySpec = QuerySpec.sql(
    "q24_with_cte",
    """WITH per_cust AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY o_custkey
      |), seg AS (
      |  SELECT c_custkey, c_mktsegment FROM customer
      |)
      |SELECT c_mktsegment AS segment,
      |       COUNT(*) AS n_customers,
      |       CAST(SUM(CAST(spend AS DECIMAL(14,2))) AS DOUBLE) AS segment_spend
      |FROM per_cust JOIN seg ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY segment""".stripMargin)

  /** Inline view with an outer conjunct that can only be evaluated above
    * the view's agg — the reference's standalone SelectNode
    * (planner/SelectNode.java:1-95). */
  val q25InlineView: QuerySpec = QuerySpec.sql(
    "q25_inline_view",
    """SELECT o_custkey, n_orders
      |FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) v
      |WHERE n_orders >= 15
      |ORDER BY o_custkey""".stripMargin)

  /** Explicit NULL ordering, made observable through row_number (a plain
    * row-sorted compare can't see output order). Impala defaults NULLS
    * LAST on ASC (SortInfo.java) — spelled explicitly for both engines. */
  val q26SortNulls: QuerySpec = QuerySpec.sql(
    "q26_sort_nulls",
    """SELECT o_orderkey, pri,
      |       ROW_NUMBER() OVER (ORDER BY pri ASC NULLS LAST, o_orderkey) AS rn
      |FROM (SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pri
      |      FROM orders WHERE o_orderkey <= 2000) t
      |ORDER BY rn""".stripMargin)

  /** LIMIT + OFFSET over a unique sort key (SortNode limit+offset,
    * planner/SortNode.java:50-78; Spark ≥3.4 offset). */
  val q27LimitOffset: QuerySpec = QuerySpec.sql(
    "q27_limit_offset",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 20 OFFSET 40""".stripMargin)

  /** GROUP BY / ORDER BY by ordinal and by select-list alias
    * (QueryStmt.java:170-300 substitutes ordinals and aliases). */
  val q76Ordinals: QuerySpec = QuerySpec.sql(
    "q76_group_order_ordinals",
    """SELECT c_mktsegment AS seg, COUNT(*) AS n
      |FROM customer
      |GROUP BY 1
      |ORDER BY 2 DESC, seg""".stripMargin)

  /** GROUP BY ALL / ORDER BY ALL — the modern-SQL sugar for "group by
    * every non-aggregate select item" (beyond the reference's grammar,
    * which substitutes explicit ordinals only, QueryStmt.java:170-300;
    * a q76 companion). The sugar stays on the Spark side only; the
    * oracle gets the explicit, unambiguous grouping/ordering text so the
    * feature under test is never resolved by the oracle engine itself
    * (DuckDB versions differ on ORDER BY ALL resolution). The payload
    * aggregate is integer cents — summing a DOUBLE through a
    * DECIMAL(19,2) cast proved hash-fragile across oracle-engine
    * versions (double→decimal rounding at .xx5 boundaries shifted
    * between DuckDB releases); per-row ROUND to BIGINT before SUM is
    * bit-stable in both engines and decimal-cast conformance is pinned
    * elsewhere (q51, DecimalConformanceSpec). The plan is the ordinary
    * two-phase hash aggregate, nothing new at scale. */
  val q171GroupByAll: QuerySpec = QuerySpec.sql2(
    "q171_group_order_all",
    """SELECT c_mktsegment AS seg, c_nationkey AS nk, COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM customer
      |WHERE c_acctbal > 5000
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin,
    """SELECT c_mktsegment AS seg, c_nationkey AS nk, COUNT(*) AS n,
      |       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      |FROM customer
      |WHERE c_acctbal > 5000
      |GROUP BY seg, nk
      |ORDER BY seg, nk, n, bal_cents""".stripMargin)

  /** INTERSECT [ALL] — beyond the reference's grammar (UnionStmt handles
    * only UNION, sql-parser.cup:5085-5278); Spark plans it as a left-semi
    * join over distinct inputs (ReplaceIntersectWithSemiJoin), which is
    * the shuffle-minimal shape at scale. nation keys present in both
    * customer and supplier, with ALL multiplicity on a bounded slice. */
  val q133Intersect: QuerySpec = QuerySpec.sql(
    "q133_set_intersect",
    """SELECT nk FROM (
      |  SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 7500
      |  INTERSECT
      |  SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 2500) t
      |ORDER BY nk""".stripMargin)

  /** EXCEPT [ALL] — Spark rewrites to left-anti join
    * (ReplaceExceptWithAntiJoin); EXCEPT ALL keeps multiplicity via the
    * generated sum-of-counts plan. Distinct + ALL variants unioned so one
    * result pins both rewrites. */
  val q134Except: QuerySpec = QuerySpec.sql(
    "q134_set_except",
    """SELECT 'distinct' AS variant, nk FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  EXCEPT
      |  SELECT s_nationkey AS nk FROM supplier) d
      |UNION ALL
      |SELECT 'all' AS variant, nk FROM (
      |  SELECT c_nationkey AS nk FROM customer WHERE c_custkey <= 60
      |  EXCEPT ALL
      |  SELECT s_nationkey AS nk FROM supplier) a
      |ORDER BY variant, nk""".stripMargin)

  val all: Seq[QuerySpec] = Seq(
    q21UnionAll, q22UnionDistinct, q23Values, q24WithCte, q25InlineView,
    q26SortNulls, q27LimitOffset, q76Ordinals, q133Intersect, q134Except,
    q171GroupByAll)
}
