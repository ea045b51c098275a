package graft

/** AnalysisError conformance — the reference's analysis layer rejects
  * these statements (AnalyzeStmtsTest/AnalyzeExprsTest patterns); the
  * engine must fail them at analysis too, not at runtime. Where Spark is
  * a documented superset (select-list subqueries, grouping sets) no test
  * pins a rejection. */
class AnalysisErrorSpec extends EngineSuite {

  private def fails(sql: String, fragment: String): Unit = {
    QuerySpec.prepared(spark, sfDir)
    val e = intercept[Exception](spark.sql(sql).collect())
    assert(e.getMessage.toLowerCase.contains(fragment.toLowerCase),
      s"expected '$fragment' in: ${e.getMessage.take(300)}")
  }

  test("ORDER BY ordinal out of range") {
    fails("SELECT n_name FROM nation ORDER BY 99", "ORDER_BY_POS_OUT_OF_RANGE")
  }

  test("GROUP BY ordinal out of range") {
    fails("SELECT n_name, COUNT(*) FROM nation GROUP BY 7", "GROUP_BY_POS_OUT_OF_RANGE")
  }

  test("aggregate in WHERE clause") {
    fails("SELECT n_name FROM nation WHERE COUNT(*) > 1", "WHERE")
  }

  test("unknown column") {
    fails("SELECT no_such_column FROM nation", "no_such_column")
  }

  test("unknown table") {
    fails("SELECT * FROM definitely_not_a_table", "definitely_not_a_table")
  }

  test("non-aggregated select column outside GROUP BY") {
    fails("SELECT n_name, n_regionkey, COUNT(*) FROM nation GROUP BY n_name",
      "n_regionkey")
  }

  test("window function in WHERE clause") {
    fails("SELECT n_name FROM nation WHERE ROW_NUMBER() OVER (ORDER BY n_name) = 1",
      "window")
  }
}
