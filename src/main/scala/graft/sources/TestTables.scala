package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Catalog over the harness testdata: registers every parquet table in a
  * scale-factor directory as a temp view, mirroring the reference's catalog
  * of HDFS tables (impala/catalog/HdfsTable.java:1-2026) — in Spark the
  * FileSourceScan handles partition pruning / predicate pushdown that
  * HdfsScanNode (planner/HdfsScanNode.java:1-666) implements by hand.
  */
object TestTables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table; normalizes the `events.ts` TIMESTAMP(NANOS) column
    * (read as nanos-since-epoch long under
    * spark.sql.legacy.parquet.nanosAsLong) to a microsecond timestamp. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    var df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    df
  }

  /** Register all tables as temp views. Idempotent and cheap on repeat
    * calls for the same dir (each query's run() prepares its session; only
    * the first registration per (session, dir) reads parquet footers). */
  def register(spark: SparkSession, dir: String): Unit = {
    val key = "graft.registered.dir"
    if (!spark.conf.getOption(key).contains(dir)) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      spark.conf.set(key, dir)
    }
  }
}
