package graft

import org.apache.spark.sql.functions._

/** COMPUTE STATS analogue — ComputeStatsStmt.java:46-580 runs COUNT(*) +
  * per-column NDV/nulls/len child queries; Spark's ANALYZE TABLE computes
  * the same surface and feeds CBO (the reference's cost-based join order,
  * SingleNodePlanner.createCheapestJoinPlan). */
class StatsSpec extends EngineSuite {

  test("ANALYZE TABLE computes table and column stats consumed by CBO") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_stats_nation")
    s.table("nation").write.mode("overwrite").saveAsTable("graft_stats_nation")
    s.sql("ANALYZE TABLE graft_stats_nation COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_name")

    val described = s.sql("DESCRIBE EXTENDED graft_stats_nation n_nationkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described("distinct_count").toLong == 25L, s"stats: $described")
    assert(described("num_nulls").toLong == 0L)

    // CBO sees the row count on the analyzed table
    val stats = s.table("graft_stats_nation").queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.toLong == 25L), s"rowCount missing: $stats")
    s.sql("DROP TABLE IF EXISTS graft_stats_nation")
  }

  test("COMPUTE INCREMENTAL STATS analogue: per-partition ANALYZE lands partition row counts") {
    // ComputeStatsStmt.java:79-83 — incremental stats run the stats child
    // query only for (new) partitions instead of rescanning the table.
    // Spark analogue: ANALYZE TABLE ... PARTITION (p=...) — per-partition
    // row counts land in the catalog, and a later unqualified PARTITION(p)
    // pass fills the remaining partitions without disturbing the first.
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS graft_stats_part")
    s.table("region").select(col("r_regionkey"), col("r_name"))
      .withColumn("p", (col("r_regionkey") % 2).cast("int"))
      .write.mode("overwrite").partitionBy("p").saveAsTable("graft_stats_part")
    import org.apache.spark.sql.catalyst.TableIdentifier
    def rowCounts: Map[String, Option[BigInt]] =
      s.sessionState.catalog.listPartitions(TableIdentifier("graft_stats_part"))
        .map(pt => pt.spec("p") -> pt.stats.flatMap(_.rowCount)).toMap
    // increment 1: only the fresh partition is analyzed
    s.sql("ANALYZE TABLE graft_stats_part PARTITION (p=0) COMPUTE STATISTICS")
    val first = rowCounts
    assert(first("0").contains(BigInt(3)), s"p=0 stats missing: $first")
    assert(first("1").isEmpty, s"p=1 must not be analyzed yet: $first")
    // increment 2: the unqualified partition spec sweeps the rest
    s.sql("ANALYZE TABLE graft_stats_part PARTITION (p) COMPUTE STATISTICS")
    val second = rowCounts
    assert(second("0").contains(BigInt(3)) && second("1").contains(BigInt(2)),
      s"incremental sweep incomplete: $second")
    s.sql("DROP TABLE IF EXISTS graft_stats_part")
  }

  test("CBO join reorder: column stats re-order a mis-ordered join; their absence leaves it") {
    // SingleNodePlanner.createCheapestJoinPlan:349-403 — the reference
    // orders joins by cost from COMPUTE STATS output. Spark's analogue
    // (CostBasedJoinReorder) is enabled by GraftSession but inert on
    // stat-less parquet views, so this pins the full loop on real
    // catalog tables: the SQL text deliberately joins the two FACT
    // tables first and the selective tiny dim last; with ANALYZE'd
    // row/column stats the optimizer must pull the tiny dim ahead of
    // the fact-fact join, and without stats it must leave the text
    // order untouched (no row counts → no reorder).
    val s = spark
    QuerySpec.prepared(s, sfDir)
    for (t <- Seq("graft_cbo_l", "graft_cbo_o", "graft_cbo_tiny"))
      s.sql(s"DROP TABLE IF EXISTS $t")
    s.table("lineitem").select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .write.mode("overwrite").saveAsTable("graft_cbo_l")
    s.table("orders").select(col("o_orderkey"), col("o_custkey"))
      .write.mode("overwrite").saveAsTable("graft_cbo_o")
    s.table("part").select(col("p_partkey")).filter(col("p_partkey") <= 5)
      .write.mode("overwrite").saveAsTable("graft_cbo_tiny")
    try {
      val q =
        """SELECT COUNT(*) AS n
          |FROM graft_cbo_l l
          |JOIN graft_cbo_o o ON l.l_orderkey = o.o_orderkey
          |JOIN graft_cbo_tiny t ON l.l_partkey = t.p_partkey""".stripMargin
      def leaves: Seq[String] = s.sql(q).queryExecution.optimizedPlan.collectLeaves().flatMap {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.catalogTable.map(_.identifier.table)
        case _ => None
      }.toSeq
      val before = leaves
      assert(before == Seq("graft_cbo_l", "graft_cbo_o", "graft_cbo_tiny"),
        s"without stats the text order must stand: $before")
      Seq("graft_cbo_l" -> "l_orderkey, l_partkey", "graft_cbo_o" -> "o_orderkey",
        "graft_cbo_tiny" -> "p_partkey").foreach { case (t, cols) =>
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS $cols")
      }
      val after = leaves
      assert(after != before, s"stats did not trigger a reorder: $after")
      assert(after.last == "graft_cbo_o",
        s"the fact-fact join must run last once the tiny dim's selectivity is known: $after")
    } finally {
      for (t <- Seq("graft_cbo_l", "graft_cbo_o", "graft_cbo_tiny"))
        s.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("STRAIGHT_JOIN hint pins the text join order that CBO would otherwise rewrite") {
    // sql-parser.cup:9545 + TableRef.java:374-390 — straight_join
    // disables createCheapestJoinPlan for the statement. Pin BOTH ways
    // on the same mis-ordered join as the CBO test: with ANALYZE'd stats
    // the bare query reorders (tiny dim pulled ahead), the hinted query
    // must keep the deliberate fact-fact-first text order.
    val s = spark
    QuerySpec.prepared(s, sfDir)
    for (t <- Seq("graft_sj_l", "graft_sj_o", "graft_sj_tiny"))
      s.sql(s"DROP TABLE IF EXISTS $t")
    s.table("lineitem").select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .write.mode("overwrite").saveAsTable("graft_sj_l")
    s.table("orders").select(col("o_orderkey"), col("o_custkey"))
      .write.mode("overwrite").saveAsTable("graft_sj_o")
    s.table("part").select(col("p_partkey")).filter(col("p_partkey") <= 5)
      .write.mode("overwrite").saveAsTable("graft_sj_tiny")
    try {
      Seq("graft_sj_l" -> "l_orderkey, l_partkey", "graft_sj_o" -> "o_orderkey",
        "graft_sj_tiny" -> "p_partkey").foreach { case (t, cols) =>
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS $cols")
      }
      def leaves(hint: String): Seq[String] = {
        val q =
          s"""SELECT $hint COUNT(*) AS n
             |FROM graft_sj_l l
             |JOIN graft_sj_o o ON l.l_orderkey = o.o_orderkey
             |JOIN graft_sj_tiny t ON l.l_partkey = t.p_partkey""".stripMargin
        s.sql(q).queryExecution.optimizedPlan.collectLeaves().flatMap {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.catalogTable.map(_.identifier.table)
          case _ => None
        }.toSeq
      }
      val text = Seq("graft_sj_l", "graft_sj_o", "graft_sj_tiny")
      assert(leaves("") != text,
        "precondition lost: stats no longer trigger a reorder on the bare query")
      assert(leaves("/*+ STRAIGHT_JOIN */") == text,
        "STRAIGHT_JOIN did not pin the text join order")
      // result parity: the hint only constrains order, never the rows
      val bare = s.sql(
        """SELECT COUNT(*) AS n FROM graft_sj_l l
          |JOIN graft_sj_o o ON l.l_orderkey = o.o_orderkey
          |JOIN graft_sj_tiny t ON l.l_partkey = t.p_partkey""".stripMargin)
        .collect().head.getLong(0)
      val pinned = s.sql(
        """SELECT /*+ STRAIGHT_JOIN */ COUNT(*) AS n FROM graft_sj_l l
          |JOIN graft_sj_o o ON l.l_orderkey = o.o_orderkey
          |JOIN graft_sj_tiny t ON l.l_partkey = t.p_partkey""".stripMargin)
        .collect().head.getLong(0)
      assert(bare == pinned && bare > 0)
    } finally {
      for (t <- Seq("graft_sj_l", "graft_sj_o", "graft_sj_tiny"))
        s.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("a BROADCAST hint inside a STRAIGHT_JOIN scope survives the stamping") {
    // r14 ADVICE: at resolution time a strategy hint is still a
    // ResolvedHint wrapper; stamping the join with a bare JoinHint made
    // EliminateResolvedHint (which only merges into JoinHint.NONE
    // joins) silently drop the user's BROADCAST. The rule now extracts
    // child-arm ResolvedHints into the stamped hint.
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = s.sql(
        """SELECT /*+ STRAIGHT_JOIN BROADCAST(n) */ COUNT(*) AS c
          |FROM customer c
          |JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin)
      import org.apache.spark.sql.catalyst.plans.logical.Join
      val hints = df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }
      assert(hints.exists(h => h.rightHint.exists(_.strategy.isDefined)),
        s"user BROADCAST hint dropped under STRAIGHT_JOIN: $hints")
      assert(df.collect().head.getLong(0) > 0)
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"),
        s"hinted broadcast not selected (auto-threshold off):\n$phys")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("murmur_hash and fnv_hash are deterministic and distinct per layout") {
    val s = spark
    graft.engine.GraftSession.attach(s)
    val r = s.sql(
      """SELECT murmur_hash('abc') a, murmur_hash('abc') b, murmur_hash('abd') c,
        |       murmur_hash(CAST(7 AS INT)) d, murmur_hash(CAST(7 AS BIGINT)) e,
        |       fnv_hash('abc') f""".stripMargin).collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
    assert(r.getLong(3) != r.getLong(4), "4-byte vs 8-byte layouts must differ")
    assert(r.getLong(0) != r.getLong(5), "murmur and fnv must differ")
  }
}
