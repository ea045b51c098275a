package graft

/** Bucketing for co-located joins — the 100 TB answer to fact⋈fact
  * shuffles (SURVEY §2.1 HashJoinNode / partitioned dist mode): writing
  * both sides bucketed on the join key lets the sort-merge join read
  * bucket-aligned files with NO exchange on either side. */
class BucketedJoinSpec extends EngineSuite {

  test("join of two tables bucketed on the join key plans no shuffle") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    s.table("orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    s.table("lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = s.sql(
      """SELECT /*+ MERGE(b_lineitem) */ o_orderkey, COUNT(*) AS n
        |FROM b_orders JOIN b_lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    // bucket-aligned scan: the join itself needs no shuffle; the only
    // exchange allowed is the final aggregation's (and even that is
    // avoided since grouping matches the bucket key)
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    // ShuffleExchangeExec prints as "Exchange hashpartitioning(...)"
    assert(!joinSection.contains("Exchange hashpartitioning"),
      "bucketed join still shuffles:\n" + joinSection.take(800))
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      "scan is not bucket-aware")

    // and the result matches the unbucketed join
    val n1 = joined.count()
    val n2 = s.table("orders")
      .join(s.table("lineitem"),
        s.table("orders")("o_orderkey") === s.table("lineitem")("l_orderkey"))
      .groupBy("o_orderkey").count().count()
    assert(n1 == n2)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
