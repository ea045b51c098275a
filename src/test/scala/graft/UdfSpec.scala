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

/** Hive-convention UDF classes for the CREATE FUNCTION ... AS 'class'
  * bridge (instantiated by UdfDdl via Class.forName + reflection). */
class TestHiveUdf {
  def evaluate(s: String): String = if (s == null) null else s.reverse
  def evaluate(x: java.lang.Long, y: java.lang.Long): java.lang.Long = x + y
}
class TestHiveUdfSingle {
  def evaluate(x: java.lang.Double): java.lang.Double = x * 2.0
}

class UdfSpec extends EngineSuite {

  test("CREATE FUNCTION ... AS 'class': typed form binds the matching evaluate()") {
    val s = spark
    QuerySpec.prepared(s, sfDir)
    functions.UdfDdl(s, "CREATE FUNCTION g_rev(STRING) RETURNS STRING AS 'graft.TestHiveUdf'")
    functions.UdfDdl(s, "CREATE FUNCTION g_add(BIGINT, BIGINT) RETURNS BIGINT AS 'graft.TestHiveUdf'")
    val r = s.sql(
      """SELECT g_rev(n_name) AS rev, g_add(n_nationkey, 100) AS a,
        |       g_rev(CAST(NULL AS STRING)) AS nul
        |FROM nation WHERE n_nationkey = 3""".stripMargin).collect().head
    assert(r.getString(0) == s.sql(
      "SELECT n_name FROM nation WHERE n_nationkey = 3").collect().head.getString(0).reverse)
    assert(r.getLong(1) == 103L)
    assert(r.isNullAt(2), "null-in must be null-out without invoking evaluate()")
  }

  test("CREATE FUNCTION bare form: single overload resolves, ambiguous rejects") {
    val s = spark
    functions.UdfDdl(s, "CREATE FUNCTION g_dbl AS 'graft.TestHiveUdfSingle'")
    val r = s.sql("SELECT g_dbl(CAST(21 AS DOUBLE)) AS d").collect().head
    assert(r.getDouble(0) == 42.0)
    val e = intercept[IllegalArgumentException](
      functions.UdfDdl(s, "CREATE FUNCTION g_amb AS 'graft.TestHiveUdf'"))
    assert(e.getMessage.contains("overloads"))
    val m = intercept[IllegalArgumentException](
      functions.UdfDdl(s, "CREATE FUNCTION g_no(INT) RETURNS INT AS 'graft.TestHiveUdf'"))
    assert(m.getMessage.contains("no evaluate"))
  }

  test("DROP FUNCTION unregisters the bridged UDF") {
    val s = spark
    functions.UdfDdl(s, "CREATE FUNCTION g_tmp(DOUBLE) RETURNS DOUBLE AS 'graft.TestHiveUdfSingle'")
    assert(s.sql("SELECT g_tmp(1.5D) AS d").collect().head.getDouble(0) == 3.0)
    functions.UdfDdl(s, "DROP FUNCTION g_tmp")
    intercept[Exception](s.sql("SELECT g_tmp(1.5D)").collect())
  }

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
