package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** CREATE FUNCTION surface (CreateUdfStmt/CreateUdaStmt,
  * hive/executor/UdfExecutor.java:61-290): JVM scalar UDFs and custom
  * aggregates register into the session and are callable from SQL — the
  * Spark-native equivalent of the reference's Java-UDF bridge. */
object UdfSpec {
  final case class GBuf(logSum: Double, n: Long)

  /** geometric mean: log-sum buffer → exp(mean) — merge is commutative,
    * so the result is partitioning-independent like every engine agg */
  object GeoMean extends Aggregator[Double, GBuf, Double] {
    def zero: GBuf = GBuf(0.0, 0L)
    def reduce(b: GBuf, x: Double): GBuf = GBuf(b.logSum + math.log(x), b.n + 1)
    def merge(a: GBuf, b: GBuf): GBuf = GBuf(a.logSum + b.logSum, a.n + b.n)
    def finish(b: GBuf): Double = if (b.n == 0) 0.0 else math.exp(b.logSum / b.n)
    def bufferEncoder: Encoder[GBuf] = Encoders.product[GBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

class UdfSpec extends EngineSuite {

  test("spark.sql.extensions=GraftExtensions installs the function surface") {
    // A session built ONLY with the extensions hook — no attach() call —
    // must resolve the engine's functions. Temporarily clear the default
    // session so the builder creates a fresh one (over the same
    // SparkContext) instead of returning ours.
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val clean = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.engine.GraftExtensions())
        .getOrCreate()
      val r = clean.sql(
        "SELECT fnv_hash(CAST(7 AS BIGINT)) AS h, zeroifnull(CAST(NULL AS INT)) AS z")
        .collect().head
      assert(r.getLong(0) == graft.functions.FnvHashUtil.hashLong(7L, 8))
      assert(r.getInt(1) == 0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("scalar JVM UDF registers and runs in SQL") {
    val s = spark
    s.udf.register("graft_plus_one", (x: Long) => x + 1)
    QuerySpec.prepared(s, sfDir)
    val r = s.sql(
      "SELECT graft_plus_one(MAX(n_nationkey)) AS m FROM nation").collect().head
    assert(r.getLong(0) == 25L)
  }

  test("typed Aggregator registers as a UDA and distributes correctly") {
    val s = spark
    s.udf.register("graft_gmean", udaf(UdfSpec.GeoMean))
    val r = s.sql("SELECT graft_gmean(CAST(id AS DOUBLE)) AS g FROM range(1, 5)")
      .collect().head.getDouble(0)
    // gmean(1,2,3,4) = (24)^(1/4)
    assert(math.abs(r - math.pow(24.0, 0.25)) < 1e-9)
  }
}
