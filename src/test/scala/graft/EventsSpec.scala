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

  test("asofLastValue matches brute force on random data (ties included)") {
    // Seeded-random property check of the union+window as-of composition
    // against a per-probe brute-force reference, with deliberate ts
    // collisions to exercise the (ts, side, value) tie order.
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(1234)
    // small ts domain (20 values) over 8 users forces same-user same-ts
    // collisions between builds and probes and among builds; ~15% of
    // build values are NULL (a matching null-valued build row must yield
    // NULL, not fall back to an earlier value)
    val builds = Seq.tabulate(120) { _ =>
      (rnd.nextInt(8).toLong, new java.sql.Timestamp(rnd.nextInt(20) * 60000L),
        if (rnd.nextInt(7) == 0) Option.empty[Double]
        else Some((rnd.nextInt(100) + 1).toDouble))
    }
    val probes = Seq.tabulate(150) { i =>
      (rnd.nextInt(8).toLong, new java.sql.Timestamp(rnd.nextInt(20) * 60000L), i.toLong)
    }
    val bDf = builds.toDF("user_id", "ts", "value")
    val pDf = probes.toDF("user_id", "ts", "event_id")
    val got = operators.Events.asofLastValue(bDf, pDf)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    probes.foreach { case (u, ts, id) =>
      val eligible = builds.filter { case (bu, bts, _) => bu == u && !bts.after(ts) }
      // expected: among latest-ts builds, MAX value with nulls-first (all
      // null → the match yields Some-row-with-null ≡ None result value
      // is ambiguous; model it as the operator does: null result)
      val expected: Option[Double] = if (eligible.isEmpty) None
        else {
          val maxTs = eligible.map(_._2.getTime).max
          val nonNull = eligible.filter(_._2.getTime == maxTs).flatMap(_._3)
          if (nonNull.isEmpty) None else Some(nonNull.max)
        }
      assert(got(id) == expected, s"probe $id (user $u, ts $ts): got ${got(id)}, expected $expected")
    }
  }
}
