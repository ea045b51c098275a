package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Pins the salted-join operator: row-for-row equivalence with the
  * plain join (hot keys, cold keys, keys missing from the build side),
  * and the plan shape that makes it worth having — the build side
  * explodes its salt fan-out, the physical join keys include the salt,
  * and the hot-key relation broadcasts. */
class SkewSpec extends EngineSuite {

  private def fixture = {
    val s = spark
    import s.implicits._
    // key 7 is hot (60 rows), keys 1..20 cold, key 999 has no build row
    val probe = ((1 to 60).map(i => (7L, 1000L + i)) ++
      (1 to 20).map(i => (i.toLong, 2000L + i)) ++
      Seq((999L, 3000L)))
      .toDF("k", "row_id")
    val build = (1 to 40).map(i => (i.toLong, s"dim_$i")).toDF("k", "attr")
    (probe, build)
  }

  test("saltedJoin == plain inner join, row for row") {
    val (probe, build) = fixture
    val got = Skew.saltedJoin(probe, build, "k",
      saltBy = col("row_id"), salts = 4, hotThreshold = 30L)
      .select("k", "row_id", "attr")
    val want = probe.join(build, "k").select("k", "row_id", "attr")
    assert(got.count() == want.count(), "row count diverged")
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "salted join result differs from the plain join")
  }

  test("hot probe rows spread across salts; cold keys stay single-salt") {
    val (probe, build) = fixture
    val hot = probe.groupBy(col("k")).agg(count(lit(1)).as("__kc"))
      .filter(col("__kc") > 30L).select(col("k"), lit(true).as("__hot"))
    val salted = probe.join(broadcast(hot), Seq("k"), "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(xxhash64(col("row_id")), lit(4L)))
          .otherwise(lit(0L)))
    val hotSalts = salted.filter(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(hotSalts > 1, "hot key never scattered")
    val coldSalts = salted.filter(col("k") =!= 7L)
      .select("__salt").distinct().collect().map(_.getLong(0)).toSet
    assert(coldSalts == Set(0L), "cold keys must stay at salt 0")
  }

  test("q383 plan: salt in the join keys, build-side explode, broadcast hot list") {
    val df = SparkEntry.queries("q383_skew_salted_join")(spark, sfDir)
    discard(df.collect())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column missing from the plan")
    assert(plan.contains("Generate explode"), "build-side salt fan-out lost")
    assert("BroadcastExchange|BroadcastQueryStage".r.findAllIn(plan).nonEmpty,
      "hot-key list must broadcast")
  }
}
