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
