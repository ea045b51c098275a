package graft

/** Distributed-determinism and edge-case behavior of the sketch
  * aggregates (distinctpc/distinctpcsa/sample/histogram/ndv). */
class SketchesSpec extends EngineSuite {

  private def attach(): Unit = graft.engine.GraftSession.attach(spark)

  test("distinctpc returns 0 for empty and all-NULL groups") {
    attach()
    val r = spark.sql(
      """SELECT distinctpc(x) a, distinctpcsa(x) b
        |FROM (SELECT CAST(NULL AS INT) AS x WHERE 1 = 0) t""".stripMargin).collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
    val rn = spark.sql(
      """SELECT distinctpc(x) a FROM VALUES (CAST(NULL AS INT)), (CAST(NULL AS INT)) t(x)""")
      .collect().head
    assert(rn.getLong(0) == 0L)
  }

  test("distinctpc estimates are in a sane range") {
    attach()
    val est = spark.sql("SELECT distinctpcsa(id) FROM range(0, 10000)").collect().head.getLong(0)
    assert(est > 2000 && est < 50000, s"estimate $est wildly off for n=10000")
  }

  test("sample/histogram are identical under any partitioning") {
    attach()
    val s = spark
    import s.implicits._
    val vals = (1 to 5000).map(i => (i * 37) % 1000)
    def run(parts: Int): (String, String) = {
      vals.toDF("x").repartition(parts).createOrReplaceTempView("sk_t")
      val r = spark.sql("SELECT sample(x) s, histogram(x) h FROM sk_t").collect().head
      (r.getString(0), r.getString(1))
    }
    assert(run(1) == run(13), "bottom-k sample must not depend on partitioning")
  }

  test("ndv ≈ exact distinct") {
    attach()
    val Seq(ndv, exact) = spark.sql(
      "SELECT ndv(id), COUNT(DISTINCT id) FROM range(0, 20000)")
      .collect().head.toSeq.map(_.toString.toLong)
    assert(math.abs(ndv - exact).toDouble / exact < 0.05)
  }
  test("mg_top_k is exact and partition-independent when capacity >= distinct") {
    attach()
    val s = spark
    import s.implicits._
    // zipfian-ish: value v appears 1000/v times, 40 distinct < 256 capacity
    val vals = (1 to 40).flatMap(v => Seq.fill(1000 / v)(s"w$v"))
    def run(parts: Int): Seq[(String, Long)] = {
      vals.toDF("x").repartition(parts).createOrReplaceTempView("mg_t")
      spark.sql("SELECT explode(mg_top_k(x, 10)) AS t FROM mg_t")
        .selectExpr("t.item", "t.cnt").as[(String, Long)].collect().toSeq
    }
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(10)
    assert(run(1) == exact, "capacity >= distinct must yield exact counts")
    assert(run(17) == run(1), "MG result must not depend on partitioning")
  }

  test("mg_top_k honors the deterministic MG error bound when capacity << distinct") {
    attach()
    val s = spark
    import s.implicits._
    // 2000 distinct, capacity 64: every surviving counter must satisfy
    // true - n/(capacity+1) <= mg <= true
    val vals = (1 to 2000).flatMap(v => Seq.fill(if (v <= 5) 500 else 3)(s"w$v"))
    val n = vals.size
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    vals.toDF("x").repartition(11).createOrReplaceTempView("mg_small")
    val got = spark.sql("SELECT explode(mg_top_k(x, 64, 64)) AS t FROM mg_small")
      .selectExpr("t.item", "t.cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.nonEmpty)
    got.foreach { case (w, c) =>
      val t = exact(w)
      assert(c <= t, s"$w: mg count $c exceeds true $t")
      assert(c >= t - n / 65, s"$w: mg count $c below bound ${t - n / 65}")
    }
    // the 5 true heavy hitters (500 >> n/65) are guaranteed to survive
    (1 to 5).foreach(v => assert(got.exists(_._1 == s"w$v"), s"lost heavy hitter w$v"))
  }

}
