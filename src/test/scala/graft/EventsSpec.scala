package graft

/** Event-analytics properties the oracle can't express. */
class EventsSpec extends EngineSuite {

  test("HLL sketch rollup estimates daily uniques within 5% of exact") {
    QuerySpec.prepared(spark, sfDir)
    val est = operators.Events.q102HllRollup.run(spark, sfDir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = spark.sql(
      """SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day,
        |       COUNT(DISTINCT user_id) AS n
        |FROM events GROUP BY 1""".stripMargin)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (day, e) =>
      val x = exact(day)
      assert(math.abs(e - x).toDouble / x < 0.05, s"$day: est $e vs exact $x")
    }
  }
}
