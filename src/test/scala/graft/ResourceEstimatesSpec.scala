package graft

import graft.engine.ResourceEstimates
import org.apache.spark.sql.functions.col

/** The EXPLAIN resource-estimate surface (Planner.computeResourceReqs:
  * 352-430, PipelinedPlanNodeSet.java): estimates are advisory but must
  * be DIRECTIONALLY right — broadcast builds show up as per-host bytes,
  * stage memory scales with the relation the operator materializes, and
  * streaming-only plans estimate ~zero. */
class ResourceEstimatesSpec extends EngineSuite {

  test("broadcast join reports the build side as per-host broadcast bytes") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val df = s.table("orders")
      .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    val est = ResourceEstimates.of(df)
    assert(est.broadcastBytes > 0,
      s"dimension broadcast missing from the estimate: ${est.render}")
    assert(est.perHostBytes >= est.broadcastBytes)
    assert(est.render.contains("Per-Host Resource Estimates"))
    assert(est.render.contains("broadcast build"))
  }

  test("an already-executed AQE plan still accounts broadcast builds") {
    // ADVICE r15: after execution AQE replaces exchanges with
    // QueryStageExec LEAVES; un-handled they match no case and the
    // broadcast silently accounts as ~0 bytes — admitQuery called on an
    // executed DataFrame could then under-estimate and wrongly admit.
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val df = s.table("orders")
      .join(s.table("customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").count()
    val before = ResourceEstimates.of(df)
    discard(df.collect()) // materialize: the plan now holds query stages
    val after = ResourceEstimates.of(df)
    assert(after.broadcastBytes > 0,
      s"executed-plan broadcast dropped to zero: ${after.render}")
    assert(after.broadcastBytes == before.broadcastBytes,
      s"executed vs planned broadcast bytes diverge: " +
        s"${after.broadcastBytes} vs ${before.broadcastBytes}")
  }

  test("a streaming-only scan estimates no reserved memory") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val df = s.table("lineitem").select("l_orderkey", "l_quantity")
      .filter(col("l_quantity") > 10)
    val est = ResourceEstimates.of(df)
    assert(est.broadcastBytes == 0)
    assert(est.perHostBytes == 0,
      s"pure scan/filter should hold no state: ${est.render}")
  }

  test("aggregation memory scales with the aggregated relation") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    def aggEst(table: String, key: String): Long = ResourceEstimates.of(
      s.table(table).groupBy(key).count()).perHostBytes
    val big = aggEst("lineitem", "l_orderkey")
    val small = aggEst("nation", "n_name")
    assert(big > small,
      s"lineitem agg ($big) should estimate more than nation agg ($small)")
  }

  test("missing stats mark the estimate incomplete, never an 8-EB rejection") {
    // r15 review finding: relations without statistics surface Spark's
    // defaultSizeInBytes sentinel (Long.MaxValue). Summed as a real
    // size it overflows the accumulators and makes memory-bounded
    // admission reject every RDD-backed query (or, wrapped negative,
    // admit the worst one). Such sizes must become "unavailable" notes.
    val s = spark
    import s.implicits._
    val rddDf = s.sparkContext.parallelize(Seq(1L -> "a", 2L -> "b"))
      .toDF("k", "v")
    val df = rddDf.groupBy("v").count()
    val est = ResourceEstimates.of(df)
    assert(!est.complete, est.render)
    assert(est.perHostBytes >= 0 && est.perHostBytes < (1L << 40),
      s"sentinel leaked into the totals: ${est.render}")
    assert(est.render.contains("unavailable"))
    // memory-bounded admission sees the known part only — it admits
    val pools = graft.engine.RequestPools.fromXml(
      """<?xml version="1.0"?>
        |<allocations>
        |  <queue name="root"><queue name="q">
        |    <aclSubmitApps>*</aclSubmitApps>
        |    <maxResources>64 mb, 1 vcores</maxResources>
        |  </queue></queue>
        |</allocations>""".stripMargin)
    assert(pools.admitQuery("q", 0, 0, df) == graft.engine.RequestPools.Admitted)
  }

  test("the explainString surface carries both header and plan") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    val text = ResourceEstimates.explainString(
      s.table("nation").groupBy("n_regionkey").count())
    assert(text.contains("Per-Host Resource Estimates"))
    assert(text.contains("HashAggregate"))
  }
}
