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
}
