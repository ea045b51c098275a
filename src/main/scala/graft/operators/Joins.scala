package graft.operators

import org.apache.spark.sql.functions._
import graft.QuerySpec

/** The reference's full join-operator matrix — enum
  * analysis/JoinOperator.java:23-36: INNER, LEFT/RIGHT OUTER, LEFT/RIGHT
  * SEMI, LEFT/RIGHT ANTI, FULL OUTER, CROSS, NULL_AWARE_LEFT_ANTI —
  * executed via HashJoinNode (planner/HashJoinNode.java:1-193) or
  * NestedLoopJoinNode for non-equi conjuncts
  * (planner/NestedLoopJoinNode.java:1-133), distributed broadcast or
  * partitioned (planner/DistributedPlanner.java:420-560).
  *
  * Spark-first mapping: `df.join(other, cond, joinType)`; Catalyst + AQE
  * pick broadcast/shuffled-hash/sort-merge. Dimension sides are small →
  * `broadcast()` hints mirror the reference's cost-model choice and stay
  * correct at 100 TB fact-table scale (the dims don't grow with SF).
  */
object Joins {
  import Num._

  /** LEFT OUTER: every customer, with NULL-extended counts for those
    * without qualifying orders (JoinNode NULL-extension semantics). */
  val q11LeftOuter: QuerySpec = QuerySpec(
    "q11_join_left_outer",
    s"""SELECT c_custkey,
       |  COUNT(o_orderkey) AS n_big,
       |  CAST(COALESCE(SUM(CAST(o_totalprice AS $MoneySql)), 0) AS DOUBLE) AS sum_big
       |FROM customer
       |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000) big
       |  ON c_custkey = o_custkey
       |GROUP BY c_custkey
       |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val big = sp.table("orders").filter(col("o_totalprice") > 250000)
    sp.table("customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_big"),
        coalesce(dsum(money(col("o_totalprice"))), lit(0d)).as("sum_big"))
      .orderBy(col("c_custkey"))
  }

  /** RIGHT OUTER: all orders preserved against a filtered lineitem side. */
  val q12RightOuter: QuerySpec = QuerySpec(
    "q12_join_right_outer",
    """SELECT o_orderkey, COUNT(l_linenumber) AS n_hi
      |FROM (SELECT * FROM lineitem WHERE l_quantity >= 48) hi
      |RIGHT JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    sp.table("lineitem").filter(col("l_quantity") >= 48)
      .join(sp.table("orders"), col("l_orderkey") === col("o_orderkey"), "right_outer")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_linenumber")).as("n_hi"))
      .orderBy(col("o_orderkey"))
  }

  /** FULL OUTER: per-nation extremes of two one-sided aggregates — rows
    * survive with NULLs from either side. */
  val q13FullOuter: QuerySpec = QuerySpec(
    "q13_join_full_outer",
    """SELECT
      |  COALESCE(c.nk, s.nk) AS nationkey,
      |  c.n_poor_cust AS n_poor_cust,
      |  s.n_rich_supp AS n_rich_supp
      |FROM
      |  (SELECT c_nationkey AS nk, COUNT(*) AS n_poor_cust
      |   FROM customer WHERE c_acctbal < -900 GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |  (SELECT s_nationkey AS nk, COUNT(*) AS n_rich_supp
      |   FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
      |ON c.nk = s.nk
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val c = sp.table("customer").filter(col("c_acctbal") < -900)
      .groupBy(col("c_nationkey").as("c_nk")).agg(count(lit(1)).as("n_poor_cust"))
    val su = sp.table("supplier").filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("s_nk")).agg(count(lit(1)).as("n_rich_supp"))
    c.join(su, col("c_nk") === col("s_nk"), "full_outer")
      .select(
        coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        col("n_poor_cust"), col("n_rich_supp"))
      .orderBy(col("nationkey"))
  }

  /** LEFT SEMI: customers having at least one qualifying order; at most
    * one output row per probe row regardless of match count. */
  val q14LeftSemi: QuerySpec = QuerySpec(
    "q14_join_left_semi",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderpriority = '1-URGENT' AND o_totalprice > 200000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val urgent = sp.table("orders")
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
    sp.table("customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** LEFT ANTI: customers with no qualifying order. */
  val q15LeftAnti: QuerySpec = QuerySpec(
    "q15_join_left_anti",
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val big = sp.table("orders").filter(col("o_totalprice") > 300000)
    sp.table("customer")
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** NULL-AWARE LEFT ANTI: `NOT IN (subquery)` — the reference rewrites to
    * NULL_AWARE_LEFT_ANTI_JOIN (StmtRewriter.java:200-887; must broadcast,
    * DistributedPlanner.java:506-508). Spark's RewritePredicateSubquery
    * plans LeftAnti with Or(cond, IsNull(cond)) — same semantics. */
  val q16NullAwareAnti: QuerySpec = QuerySpec.sql(
    "q16_join_nullaware_anti",
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 280000)
      |ORDER BY c_custkey""".stripMargin)

  /** CROSS: small × small Cartesian product (NestedLoopJoinNode). */
  val q17Cross: QuerySpec = QuerySpec(
    "q17_join_cross",
    """SELECT r_name, n_name
      |FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    sp.table("region").crossJoin(sp.table("nation"))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")
  }

  /** Range-bucket join: non-equi BETWEEN conjunct against a tiny broadcast
    * bounds relation → BroadcastNestedLoopJoin. The 100 TB-safe shape for
    * banding a fact table: the bounds side is constant-size. */
  val q18RangeBucket: QuerySpec = QuerySpec(
    "q18_join_range_bucket",
    """SELECT b.bucket AS bucket, COUNT(*) AS n_items
      |FROM lineitem
      |JOIN (VALUES ('q1', 0, 10), ('q2', 11, 20), ('q3', 21, 30),
      |             ('q4', 31, 40), ('q5', 41, 50)) AS b(bucket, lo, hi)
      |  ON l_quantity >= b.lo AND l_quantity <= b.hi
      |GROUP BY b.bucket
      |ORDER BY b.bucket""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    import sp.implicits._
    val bounds = Seq(("q1", 0, 10), ("q2", 11, 20), ("q3", 21, 30),
      ("q4", 31, 40), ("q5", 41, 50)).toDF("bucket", "lo", "hi")
    sp.table("lineitem")
      .join(broadcast(bounds),
        col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_items"))
      .orderBy(col("bucket"))
  }

  /** Multiway join with per-table filters and TopN — TPC-H Q3 shape
    * (the reference's golden-plan corpus, PlannerTest.java:195). Exercises
    * join ordering + broadcast choice + partial agg + TakeOrderedAndProject. */
  val q19MultiwayTpchQ3: QuerySpec = QuerySpec(
    "q19_join_multiway_tpch_q3",
    s"""SELECT l_orderkey,
       |  CAST(SUM(CAST(CAST(l_extendedprice AS $MoneySql) * (CAST(1 AS $RateSql) - CAST(l_discount AS $RateSql)) AS DECIMAL(19,8))) AS DOUBLE) AS revenue,
       |  o_orderdate, o_orderpriority
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    val one = lit(1).cast(Rate)
    sp.table("customer").filter(col("c_mktsegment") === "BUILDING")
      .join(sp.table("orders").filter(col("o_orderdate") < lit("1995-03-15 00:00:00").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(sp.table("lineitem").filter(col("l_shipdate") > lit("1995-03-15 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum((money(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast("decimal(19,8)")).as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Theta join: equi conjunct on nation + inequality "other conjunct"
    * (HashJoinNode eq-conjuncts vs otherJoinConjuncts split,
    * planner/HashJoinNode.java). */
  val q20ThetaInequality: QuerySpec = QuerySpec(
    "q20_join_theta_inequality",
    """SELECT c_nationkey AS nationkey, COUNT(*) AS n_pairs
      |FROM customer JOIN supplier
      |  ON c_nationkey = s_nationkey AND s_acctbal > c_acctbal
      |GROUP BY c_nationkey
      |ORDER BY nationkey""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    sp.table("customer")
      .join(broadcast(sp.table("supplier")),
        col("c_nationkey") === col("s_nationkey") && col("s_acctbal") > col("c_acctbal"))
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("nationkey"))
  }

  /** Skew-safe salted join: the probe side adds a salt, the build side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — the portable hot-key pattern when AQE's skew-join
    * split isn't available (e.g. a broadcast-ineligible build side with
    * one dominant key). Results provably equal the plain join. */
  val q78SaltedJoin: QuerySpec = QuerySpec(
    "q78_join_salted_skew",
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
      |FROM orders
      |JOIN (VALUES ('1-URGENT', 10), ('2-HIGH', 5)) AS w(pri, weight)
      |  ON o_orderpriority = w.pri
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    import sp.implicits._
    val nSalt = 8
    val weights = Seq(("1-URGENT", 10), ("2-HIGH", 5)).toDF("pri", "weight")
    val salted = sp.table("orders")
      .withColumn("salt", pmod(col("o_orderkey"), lit(nSalt)))
    val replicated = weights
      .withColumn("salt", explode(expr(s"sequence(0, ${nSalt - 1})")))
    salted
      .join(replicated,
        col("o_orderpriority") === col("pri") && salted("salt") === replicated("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** Interval (range) join via bucket blocking — the scale-path twin of
    * [[q18RangeBucket]]'s broadcast theta join. Each time window
    * explodes into the 15-minute buckets it covers; the probe side keys
    * each event by its single bucket; the range predicate then refines
    * an EQUI-join match. The reference has no range join at all (theta
    * goes through NestedLoopJoinNode, planner/NestedLoopJoinNode.java:
    * 1-133 — O(N·M) pairs); the bucketed form is a hash join whose cost
    * is O(N + M·buckets_per_window), which is what survives 1M windows ×
    * 100 TB of events — no nested loop anywhere in the plan. With 10
    * windows Spark broadcasts the build side; at scale the same plan
    * shuffles both sides on the bucket key. */
  val q147IntervalBucketJoin: QuerySpec = QuerySpec(
    "q147_join_interval_bucket",
    """WITH w AS (
      |  SELECT event_id AS window_id,
      |         ts - INTERVAL 15 MINUTE AS lo, ts + INTERVAL 15 MINUTE AS hi
      |  FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase'
      |        ORDER BY value DESC, event_id LIMIT 10) t)
      |SELECT w.window_id, COUNT(*) AS n_events,
      |       COUNT(DISTINCT e.user_id) AS n_users
      |FROM w JOIN events e ON e.ts >= w.lo AND e.ts <= w.hi
      |GROUP BY w.window_id
      |ORDER BY w.window_id""".stripMargin) { (s, dir) =>
    val sp = QuerySpec.prepared(s, dir)
    import sp.implicits._
    val bucketSec = 900L
    val ev = sp.table("events")
    val wins = ev.filter($"event_type" === "purchase")
      .orderBy($"value".desc, $"event_id")
      .limit(10)
      .select($"event_id".as("window_id"),
        ($"ts" - expr("INTERVAL 15 MINUTE")).as("lo"),
        ($"ts" + expr("INTERVAL 15 MINUTE")).as("hi"))
      .withColumn("bucket",
        explode(sequence(floor($"lo".cast("long") / bucketSec),
          floor($"hi".cast("long") / bucketSec))))
    ev.withColumn("ev_bucket", floor($"ts".cast("long") / bucketSec))
      .join(broadcast(wins),
        $"ev_bucket" === wins("bucket") && $"ts" >= $"lo" && $"ts" <= $"hi")
      .groupBy($"window_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"window_id")
  }

  /** The same range-join semantics as [[q147IntervalBucketJoin]], but
    * written as the PLAIN inequality join a user would type — the
    * bucket blocking is applied automatically by the engine's
    * [[graft.plans.RangeBucketJoinRewrite]] optimizer rule once
    * `spark.graft.rangeJoin.bucketSeconds` is set (the reference's SET
    * query-option surface). One SQL text serves both engines; Spark
    * plans a hash join, DuckDB its own IEJoin. Plan pinned hash-join in
    * PlanSpec. */
  val q148AutoRangeJoin: QuerySpec = {
    val text =
      """WITH w AS (
        |  SELECT event_id AS window_id,
        |         ts - INTERVAL 30 MINUTE AS lo, ts + INTERVAL 30 MINUTE AS hi
        |  FROM (SELECT event_id, ts FROM events WHERE event_type = 'signup'
        |        ORDER BY value DESC, event_id LIMIT 20) t)
        |SELECT w.window_id, COUNT(*) AS n_events,
        |       COUNT(DISTINCT e.user_id) AS n_users
        |FROM w JOIN events e ON e.ts >= w.lo AND e.ts <= w.hi
        |GROUP BY w.window_id
        |ORDER BY w.window_id""".stripMargin
    QuerySpec("q148_join_auto_range", text) { (s, dir) =>
      val sp = QuerySpec.prepared(s, dir)
      // Scope the opt-in width to THIS query: the rewrite rule reads the
      // conf at optimization time, so force optimizedPlan (a cached lazy
      // val) while the conf is set, then restore — no session-wide leak
      // into later pure-range joins.
      val key = graft.plans.RangeBucketJoinRewrite.WidthKey
      val prev = sp.conf.getOption(key)
      sp.conf.set(key, "900")
      try {
        val df = sp.sql(text)
        graft.discard(df.queryExecution.optimizedPlan)
        df
      } finally prev match {
        case Some(v) => sp.conf.set(key, v)
        case None    => sp.conf.unset(key)
      }
    }
  }

  val all: Seq[QuerySpec] = Seq(
    q11LeftOuter, q12RightOuter, q13FullOuter, q14LeftSemi, q15LeftAnti,
    q16NullAwareAnti, q17Cross, q18RangeBucket, q19MultiwayTpchQ3.benched,
    q20ThetaInequality, q78SaltedJoin, q147IntervalBucketJoin,
    q148AutoRangeJoin)
}
