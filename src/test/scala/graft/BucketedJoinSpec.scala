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

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))

  test("compaction collapses the fragmented ingest into a few files") {
    operators.Layout.q153Compaction.run(spark, sfDir).collect()
    val before = parquetFiles(operators.Layout.FragmentedDir).size
    val after = parquetFiles(operators.Layout.CompactedDir).size
    assert(before >= 32, s"fragmented ingest should be many files, got $before")
    assert(after <= 4, s"compaction should bin-pack to a few files, got $after")
  }

  test("z-ordered files each cover a narrow time span") {
    // at test SF user_id has only ~4 bits, so the z-value's high bits —
    // the ones range-partitioning splits on — come from the hour
    // dimension: the verifiable skipping property here is that every
    // file covers a fraction of the time range (at production scale,
    // with comparable bit-widths, the same holds for both dimensions)
    operators.Layout.q154ZOrder.run(spark, sfDir).collect()
    val s = spark
    val files = parquetFiles(operators.Layout.ZOrderDir)
    assert(files.size >= 2, s"z-order layout should write multiple files, got ${files.size}")
    import org.apache.spark.sql.functions.{expr, max, min}
    val spans = files.map { f =>
      val r = s.read.parquet(f.getPath)
        .select(expr("cast(ts as long) div 3600").as("h"))
        .agg(min("h"), max("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    val globalSpan = spans.map(_._2).max - spans.map(_._1).min
    spans.foreach { case (lo, hi) =>
      assert(hi - lo <= globalSpan / 2,
        s"file hour-span [$lo,$hi] not narrowed vs global $globalSpan")
    }
  }
}
