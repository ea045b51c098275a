package graft.operators

import graft.QuerySpec

/** The remaining TPC-H plan shapes from the reference's planner golden
  * corpus (fe/src/test/java/org/apache/impala/planner/PlannerTest.java:195
  * runs all 22 TPC-H queries as plan tests). Rounds 1-2 covered Q1, Q3,
  * Q4, Q5, Q6, Q10, Q14 and Q18; this module adds the other fourteen.
  *
  * The driver's star schema is a reduced TPC-H (FIXTURES.md §A): no
  * partsupp table, no l_commitdate/l_receiptdate/l_shipmode, no c_phone.
  * Queries needing those columns are adapted to equivalents that keep the
  * PLAN SHAPE the reference's planner exercises — e.g. Q21's "late" test
  * becomes l_shipdate > o_orderdate + 60 days (same correlated
  * EXISTS / NOT EXISTS pair over the fact table), Q22's country code
  * becomes a c_name digit slice (same NOT EXISTS + scalar-AVG-subquery
  * shape). All texts are engine-portable ANSI SQL (one text runs on both
  * Spark and the DuckDB oracle) with the Num decimal-cast discipline so
  * double sums are order/partitioning-independent.
  *
  * Scale notes (100 TB design): every query here is shuffle-partitioned on
  * its natural keys by Catalyst; dimension sides (region/nation/supplier/
  * part at TPC-H ratios) stay under the broadcast threshold so the fact
  * table never reshuffles for them; AQE handles build-side selection and
  * skew. The correlated-subquery queries (Q2/Q17/Q21) rewrite to
  * aggregate-then-join under RewriteCorrelatedScalarSubquery — one extra
  * shuffle on the correlation key, no per-row execution.
  */
object TpchFull {
  import Num.{MoneySql => M, RateSql => R}

  /** revenue volume with exact decimal arithmetic (see Num) */
  private val Vol =
    s"CAST(CAST(l_extendedprice AS $M) * (CAST(1 AS $R) - CAST(l_discount AS $R)) AS DECIMAL(19,8))"

  /** TPC-H Q7 (volume shipping): two nation roles over one nation table —
    * the reference plans the self-joined dimension twice; the OR of nation
    * pairs must not block pushdown below the 6-way join. */
  val q106TpchQ7: QuerySpec = QuerySpec.sql(
    "q106_join_tpch_q7",
    s"""SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
       |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |             YEAR(l_shipdate) AS l_year,
       |             $Vol AS volume
       |      FROM supplier
       |      JOIN lineitem ON s_suppkey = l_suppkey
       |      JOIN orders ON o_orderkey = l_orderkey
       |      JOIN customer ON c_custkey = o_custkey
       |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
       |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)

  /** TPC-H Q8 (market share): conditional share-of-total inside one
    * aggregation — no second scan, no self-join. */
  val q107TpchQ8: QuerySpec = QuerySpec.sql(
    "q107_join_tpch_q8",
    s"""SELECT o_year,
       |  CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(19,8)) END) AS DOUBLE)
       |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
       |FROM (SELECT YEAR(o_orderdate) AS o_year,
       |             $Vol AS volume,
       |             n2.n_name AS nation
       |      FROM part
       |      JOIN lineitem ON p_partkey = l_partkey
       |      JOIN supplier ON s_suppkey = l_suppkey
       |      JOIN orders ON l_orderkey = o_orderkey
       |      JOIN customer ON o_custkey = c_custkey
       |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |      JOIN region ON n1.n_regionkey = r_regionkey
       |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |      WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
       |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') all_nations
       |GROUP BY o_year
       |ORDER BY o_year""".stripMargin)

  /** TPC-H Q9 (product-type profit; adapted — no partsupp, so amount is
    * discounted revenue rather than revenue minus supply cost): LIKE
    * filter on the part dimension drives a selective semi-filtered scan
    * of the fact table. */
  val q108TpchQ9: QuerySpec = QuerySpec.sql(
    "q108_join_tpch_q9",
    s"""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
       |FROM (SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
       |             $Vol AS amount
       |      FROM part
       |      JOIN lineitem ON p_partkey = l_partkey
       |      JOIN supplier ON s_suppkey = l_suppkey
       |      JOIN orders ON o_orderkey = l_orderkey
       |      JOIN nation ON s_nationkey = n_nationkey
       |      WHERE p_name LIKE '%red%') profit
       |GROUP BY nation, o_year
       |ORDER BY nation, o_year DESC""".stripMargin).benched

  /** TPC-H Q12 (adapted — no l_shipmode/l_commitdate: grouped on
    * l_returnflag, lateness = shipped more than 75 days after the order):
    * join + conditional two-way counts. */
  val q109TpchQ12: QuerySpec = QuerySpec.sql(
    "q109_join_tpch_q12",
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 75 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin)

  /** TPC-H Q13 (customer order-count distribution): LEFT OUTER with an
    * extra ON-clause predicate (must NOT fall to the WHERE clause — that
    * would turn the join inner), then an aggregation over an aggregation. */
  val q110TpchQ13: QuerySpec = QuerySpec.sql(
    "q110_join_tpch_q13",
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer
      |      LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |        AND o_orderpriority <> '4-NOT SPECIFIED'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin).benched

  /** TPC-H Q15 (top supplier): CTE evaluated twice — once joined, once
    * under MAX — exercising Spark's subquery reuse; revenue is an exact
    * decimal sum so the double equality against MAX is well-defined. */
  val q111TpchQ15: QuerySpec = QuerySpec.sql(
    "q111_join_tpch_q15",
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |         CAST(SUM($Vol) AS DOUBLE) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier
       |JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin)

  /** TPC-H Q16 (adapted — supplier relationships come from lineitem, not
    * partsupp): COUNT(DISTINCT) per part attributes + NOT IN subquery
    * (null-aware anti join on the distinct supplier set). */
  val q112TpchQ16: QuerySpec = QuerySpec.sql(
    "q112_join_tpch_q16",
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)

  /** TPC-H Q17 (small-quantity order revenue): correlated scalar AVG
    * subquery against the same fact table — Catalyst decorrelates to an
    * aggregate-then-join (RewriteCorrelatedScalarSubquery), i.e. one
    * extra shuffle on l_partkey instead of a per-row subquery. The sums
    * feeding the threshold are exact (integer-valued quantities), so the
    * predicate is partitioning-independent. */
  val q113TpchQ17: QuerySpec = QuerySpec.sql(
    "q113_sub_tpch_q17",
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3' AND p_size < 10
      |  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin)

  /** TPC-H Q19 (disjunctive join predicates): three OR'd AND-groups mixing
    * both join sides — the classic test that a planner extracts the common
    * p_partkey = l_partkey equi-conjunct and keeps the disjunction as a
    * residual filter instead of falling back to a nested-loop join. */
  val q114TpchQ19: QuerySpec = QuerySpec.sql(
    "q114_join_tpch_q19",
    s"""SELECT CAST(SUM($Vol) AS DOUBLE) AS revenue
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1 AND l_quantity <= 11)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
       |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin)

  /** TPC-H Q20 (adapted — shipments stand in for partsupp availability):
    * IN over a grouped-HAVING subquery (semi join against an aggregate)
    * nested with a second IN chain through the dimension tables. */
  val q115TpchQ20: QuerySpec = QuerySpec.sql(
    "q115_sub_tpch_q20",
    """SELECT s_suppkey, s_name
      |FROM supplier
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem
      |    JOIN part ON p_partkey = l_partkey
      |    WHERE p_name LIKE '%red%'
      |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l_suppkey
      |    HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 50)
      |  AND s_nationkey IN (
      |    SELECT n_nationkey FROM nation
      |    WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
      |ORDER BY s_suppkey""".stripMargin)

  /** TPC-H Q21 (adapted — lateness = shipped >60 days after the order):
    * the famous EXISTS + NOT EXISTS pair, both correlated to the same
    * fact-table alias AND referencing the outer orders row inside the
    * anti branch.
    *
    * The oracle keeps the literal EXISTS/NOT EXISTS statement; the Spark
    * text runs a single-pass equivalent: group the joined fact table by
    * (order, supplier) with a late-lineitem count, then derive per-order
    * supplier/late-supplier counts with WINDOW functions over the same
    * relation — not a second aggregation, which Spark would satisfy by
    * rebuilding the inlined CTE and scanning lineitem⋈orders twice
    * (verified via graft.Explain). The naive form shuffles lineitem three
    * times (semi + anti + main); here the fact table is scanned once and
    * shuffled once — on l_orderkey at the join — after which the grouping
    * keys and the window partition reuse that partitioning, so at 100 TB
    * the fact table crosses the network exactly once. Equivalence is
    * oracle-checked (numwait counts late lineitems, so multiplicity is
    * preserved). */
  val q116TpchQ21: QuerySpec = QuerySpec.sql2(
    "q116_sub_tpch_q21",
    """WITH li AS (
      |  SELECT l_orderkey, l_suppkey,
      |         CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_late_items
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F'
      |  GROUP BY l_orderkey, l_suppkey),
      |w AS (
      |  SELECT l_suppkey, n_late_items,
      |         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
      |         SUM(CASE WHEN n_late_items > 0 THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY l_orderkey) AS n_late_supp
      |  FROM li)
      |SELECT s_name, CAST(SUM(n_late_items) AS BIGINT) AS numwait
      |FROM w
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE n_late_items > 0 AND n_supp > 1 AND n_late_supp = 1 AND r_name = 'ASIA'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin,
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderstatus = 'F'
      |  AND r_name = 'ASIA'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin).benched

  /** TPC-H Q22 (adapted — country code = digits 17-18 of c_name; "no
    * orders" = no urgent orders, since every fixture customer has some
    * order): scalar AVG subquery threshold + correlated NOT EXISTS. The
    * AVG is over an exact decimal cast so the threshold is identical on
    * both engines regardless of partitioning. */
  val q117TpchQ22: QuerySpec = QuerySpec.sql(
    "q117_sub_tpch_q22",
    """SELECT cntrycode, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM (SELECT SUBSTR(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      |      FROM customer
      |      WHERE c_acctbal > (SELECT AVG(CAST(c_acctbal AS DECIMAL(12,2)))
      |                         FROM customer c2 WHERE c2.c_acctbal > 0.0)
      |        AND NOT EXISTS (SELECT 1 FROM orders
      |                        WHERE o_custkey = c_custkey
      |                          AND o_orderpriority = '1-URGENT')) custsale
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin)

  /** TPC-H Q2 (adapted — min lineitem price stands in for min partsupp
    * supply cost): correlated MIN subquery whose inner side repeats the
    * outer's dimension join chain. MIN over doubles is exact, so the
    * equality join back against the minimum is deterministic. */
  val q118TpchQ2: QuerySpec = QuerySpec.sql(
    "q118_sub_tpch_q2",
    """SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'LARGE'
      |  AND l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice)
      |    FROM lineitem l2
      |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE l2.l_partkey = part.p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, p_partkey, s_suppkey""".stripMargin)

  /** TPC-H Q11 (adapted — shipment value stands in for partsupp stock
    * value): HAVING against a scalar subquery that re-aggregates the same
    * relation (share-of-total threshold). The product is cast to
    * DECIMAL(25,4) before summing — above 18 digits DuckDB computes in
    * INT128, dodging its stats-narrowed INT64 multiply overflow. */
  val q119TpchQ11: QuerySpec = QuerySpec.sql(
    "q119_agg_tpch_q11",
    """SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS value
      |FROM (SELECT l_partkey,
      |             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4)) AS val
      |      FROM lineitem
      |      JOIN supplier ON s_suppkey = l_suppkey
      |      JOIN nation ON s_nationkey = n_nationkey
      |      JOIN region ON n_regionkey = r_regionkey
      |      WHERE r_name = 'ASIA') t
      |GROUP BY l_partkey
      |HAVING CAST(SUM(val) AS DOUBLE) > (
      |  SELECT CAST(SUM(val2) AS DOUBLE) * 0.001
      |  FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(25,4)) AS val2
      |        FROM lineitem
      |        JOIN supplier ON s_suppkey = l_suppkey
      |        JOIN nation ON s_nationkey = n_nationkey
      |        JOIN region ON n_regionkey = r_regionkey
      |        WHERE r_name = 'ASIA') t2)
      |ORDER BY value DESC, l_partkey""".stripMargin)

  val all: Seq[QuerySpec] = Seq(
    q106TpchQ7, q107TpchQ8, q108TpchQ9, q109TpchQ12, q110TpchQ13,
    q111TpchQ15, q112TpchQ16, q113TpchQ17, q114TpchQ19, q115TpchQ20,
    q116TpchQ21, q117TpchQ22, q118TpchQ2, q119TpchQ11)
}
