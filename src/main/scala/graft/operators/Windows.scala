package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec

/** Analytic (window) function surface — AnalyticEvalNode
  * (planner/AnalyticEvalNode.java:1-251) planned by AnalyticPlanner
  * (minimizing sorts by grouping compatible partition/order/frame specs —
  * Catalyst's CollapseWindow does the same). Functions per
  * catalog/BuiltinsDb.java:953-1052; the reference rewrites percent_rank /
  * cume_dist / ntile into rank/count arithmetic (AnalyticExpr.java:239-341)
  * — Spark executes them natively, no rewrite needed. Frames per
  * AnalyticWindow.java:1-417 (RANGE restricted to UNBOUNDED↔CURRENT —
  * mirrored below; Spark itself is a superset).
  */
object Windows {

  /** rank / dense_rank / row_number per partition — DSL form
    * (Window.partitionBy.orderBy). */
  val q36Rank: QuerySpec = QuerySpec(
    "q36_win_rank",
    """SELECT c_nationkey AS nationkey, c_custkey,
      |       RANK()       OVER w AS rnk,
      |       DENSE_RANK() OVER w AS drnk,
      |       ROW_NUMBER() OVER w AS rn
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY nationkey, rn""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    sp.table("customer").select(
      col("c_nationkey").as("nationkey"), col("c_custkey"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("drnk"),
      row_number().over(w).as("rn"))
      .orderBy(col("nationkey"), col("rn"))
  }

  /** percent_rank / cume_dist / ntile — exact rationals, engine-stable. */
  val q37NtilePct: QuerySpec = QuerySpec.sql(
    "q37_win_ntile_pct",
    """SELECT c_nationkey AS nationkey, c_custkey,
      |       PERCENT_RANK() OVER w AS pct_rnk,
      |       CUME_DIST()    OVER w AS cdist,
      |       NTILE(4)       OVER w AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY nationkey, c_custkey""".stripMargin)

  /** lag / lead with offset + default (BuiltinsDb.java:1029-1052). */
  val q38LagLead: QuerySpec = QuerySpec.sql(
    "q38_win_lag_lead",
    """SELECT event_id, value,
      |       LAG(value)           OVER w AS prev_value,
      |       LEAD(value, 2, -1.0) OVER w AS next2_value
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin)

  /** first_value / last_value with IGNORE NULLS
    * (BuiltinsDb.java:987-1027) over an explicit full frame (last_value
    * under the default frame would just echo the current row). */
  val q39FirstLast: QuerySpec = QuerySpec.sql2(
    "q39_win_first_last",
    """SELECT event_id,
      |       FIRST_VALUE(v) IGNORE NULLS OVER w AS first_v,
      |       LAST_VALUE(v)  IGNORE NULLS OVER w AS last_v,
      |       LAG(v)  IGNORE NULLS OVER w2 AS prev_v,
      |       LEAD(v) IGNORE NULLS OVER w2 AS next_v
      |FROM (SELECT event_id, user_id, ts,
      |             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |      FROM events) t
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |       w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin,
    // DuckDB spells IGNORE NULLS inside the call parens.
    """SELECT event_id,
      |       FIRST_VALUE(v IGNORE NULLS) OVER w AS first_v,
      |       LAST_VALUE(v IGNORE NULLS)  OVER w AS last_v,
      |       LAG(v IGNORE NULLS)  OVER w2 AS prev_v,
      |       LEAD(v IGNORE NULLS) OVER w2 AS next_v
      |FROM (SELECT event_id, user_id, ts,
      |             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      |      FROM events) t
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
      |       w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin)

  /** ROWS frames: running total + bounded moving window (exact decimal
    * sums keep the compare drift-free at any partitioning). */
  val q40Frames: QuerySpec = QuerySpec.sql(
    "q40_win_frames",
    """SELECT event_id,
      |       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
      |            (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
      |       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
      |            (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3
      |FROM events
      |ORDER BY event_id""".stripMargin)

  /** RANGE UNBOUNDED↔CURRENT — the only RANGE shape the reference allows
    * (AnalyticWindow.java:363-390): peer rows (ties on the order key)
    * share the aggregate value. */
  val q47RangeFrame: QuerySpec = QuerySpec.sql(
    "q47_win_range_frame",
    """SELECT event_id,
      |       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
      |            (PARTITION BY event_type ORDER BY user_id
      |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_by_user
      |FROM events
      |ORDER BY event_id""".stripMargin)

  /** Window over an aggregate (TPC-DS-style share-of-parent): per-nation
    * revenue and its share of the region total, computed by a window over
    * the agg output — AnalyticEvalNode above AggregationNode. */
  val q104ShareOfRegion: QuerySpec = QuerySpec.sql(
    "q104_win_share_of_region",
    """SELECT r_name, n_name, revenue,
      |  ROUND(revenue / SUM(revenue) OVER (PARTITION BY r_name), 6) AS region_share
      |FROM (SELECT r_name, n_name,
      |        CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS revenue
      |      FROM customer
      |      JOIN nation ON c_nationkey = n_nationkey
      |      JOIN region ON n_regionkey = r_regionkey
      |      WHERE c_acctbal > 0
      |      GROUP BY r_name, n_name) per_nation
      |ORDER BY r_name, n_name""".stripMargin)

  val all: Seq[QuerySpec] = Seq(
    q36Rank, q37NtilePct, q38LagLead, q39FirstLast, q40Frames.benched,
    q47RangeFrame, q104ShareOfRegion)
}
