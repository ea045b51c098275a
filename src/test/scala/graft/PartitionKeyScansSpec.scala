package graft

import org.apache.spark.sql.functions._

/** Focused conformance for the partition-key metadata scan rule beyond
  * the q368/q369 registry queries: many partitions, multi-column
  * partitioning, pruning predicates folded over the listing, the null
  * partition, and the duplicate-SENSITIVE aggregate guard (COUNT must
  * never be answered from the listing). */
class PartitionKeyScansSpec extends EngineSuite {

  private val Key = graft.plans.PartitionKeyScans.EnabledKey

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pks_spec").toString
    val s = spark
    import s.implicits._
    // 40 (day, shard) partitions + null-day partitions for both shards
    // (shard decorrelated from day: i%20 vs (i/20)%2)
    val base = (0 until 400).map { i =>
      (i.toLong, if (i % 100 == 99) None else Some(i % 20), (i / 20) % 2)
    }.toDF("id", "day", "shard")
    base.write.mode("overwrite").partitionBy("day", "shard").parquet(d)
    d
  }

  private def withRule[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("multi-column DISTINCT over 42 partitions answers from the listing") {
    val q = () => spark.read.parquet(dir)
      .select(col("day"), col("shard")).distinct()
      .orderBy(col("day").asc_nulls_first, col("shard"))
    val (metaRows, metaPlan) = withRule(on = true) {
      val df = q(); (df.collect().toSeq, planOf(df))
    }
    val scanRows = withRule(on = false)(q().collect().toSeq)
    assert(!metaPlan.contains("Scan parquet") && metaPlan.contains("LocalTableScan"),
      metaPlan)
    assert(metaRows == scanRows)
    assert(metaRows.length == 42) // 20 days x 2 shards + (null, 0) + (null, 1)
  }

  test("pruning predicate on the partition column folds over the listing") {
    val q = () => spark.read.parquet(dir)
      .filter(col("day") < 5 && col("shard") === 0)
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"),
        countDistinct(col("day")).as("n"))
    val (metaRows, metaPlan) = withRule(on = true) {
      val df = q(); (df.collect().toSeq, planOf(df))
    }
    val scanRows = withRule(on = false)(q().collect().toSeq)
    assert(!metaPlan.contains("Scan parquet"), metaPlan)
    assert(metaRows == scanRows)
    assert(metaRows.head.getInt(0) == 0 && metaRows.head.getInt(1) == 4 &&
      metaRows.head.getLong(2) == 5L)
  }

  test("the null partition round-trips through the listing") {
    val q = () => spark.read.parquet(dir)
      .select(col("day")).distinct()
      .orderBy(col("day").asc_nulls_first)
    val metaRows = withRule(on = true)(q().collect().toSeq)
    val scanRows = withRule(on = false)(q().collect().toSeq)
    assert(metaRows == scanRows)
    assert(metaRows.head.isNullAt(0), "null partition missing from the listing")
  }

  test("duplicate-sensitive aggregates never rewrite") {
    // COUNT(*) / SUM over partition cols depend on row multiplicity —
    // the listing is NOT a sufficient statistic; the plan must scan
    withRule(on = true) {
      val counts = spark.read.parquet(dir).groupBy("day").count()
      assert(planOf(counts).contains("Scan parquet"),
        s"COUNT must scan:\n${planOf(counts)}")
      val sums = spark.read.parquet(dir)
        .agg(sum(col("shard")).as("s"))
      assert(planOf(sums).contains("Scan parquet"),
        s"SUM must scan:\n${planOf(sums)}")
      // and a query touching a NON-partition column must scan too
      val data = spark.read.parquet(dir)
        .select(col("id")).distinct().agg(max(col("id")))
      assert(planOf(data).contains("Scan parquet"),
        s"data-column aggregate must scan:\n${planOf(data)}")
    }
  }
}
