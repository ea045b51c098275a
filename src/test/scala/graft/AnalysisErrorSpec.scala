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

  // --- type-keyword rejection family (catalog/Type.java:92-110:
  // the reference rejects unsupported column types at parse/analysis).
  // DATETIME is not a type in this engine either — rejected at parse.
  // DATE and BINARY are a documented superset (first-class here), so no
  // rejection is pinned for them; they get positive round-trips instead.
  test("DATETIME is not a valid column type") {
    fails("CREATE TABLE g_bad_dt (x DATETIME) USING parquet", "DATETIME")
  }

  test("DATE and BINARY are a supported superset of the reference's rejection list") {
    QuerySpec.prepared(spark, sfDir)
    val r = spark.sql(
      """SELECT CAST('2024-05-05' AS DATE) AS d, CAST('ab' AS BINARY) AS b,
        |       length(CAST('ab' AS BINARY)) AS blen""".stripMargin).collect().head
    assert(r.get(0).toString == "2024-05-05" && r.getInt(2) == 2)
  }

  // --- RANGE-frame restriction family (analysis/AnalyticWindow.java:
  // 363-390: RANGE with an offset boundary requires exactly one
  // numeric ORDER BY expression)
  test("RANGE offset frame with multiple ORDER BY expressions") {
    fails(
      """SELECT SUM(n_nationkey) OVER (ORDER BY n_regionkey, n_name
        |RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM nation""".stripMargin,
      "RANGE")
  }

  test("RANGE offset frame over a non-numeric ORDER BY key") {
    fails(
      """SELECT SUM(n_nationkey) OVER (ORDER BY n_name
        |RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) FROM nation""".stripMargin,
      "RANGE")
  }

  // --- set-operation conformance family (AnalyzeStmtsTest.java
  // TestUnion: operand arity and type compatibility are analysis-time
  // errors in the reference)
  test("UNION operands with different column counts") {
    fails("SELECT n_nationkey FROM nation UNION ALL SELECT n_nationkey, n_name FROM nation",
      "NUM_COLUMNS_MISMATCH")
  }

  test("UNION operands with incompatible column types") {
    fails("SELECT n_nationkey FROM nation UNION ALL SELECT array(n_nationkey) FROM nation",
      "INCOMPATIBLE_COLUMN_TYPE")
  }

  // --- union implicit-cast matrix (UnionStmt.java:37-144 analyze →
  // Type.getAssignmentCompatibleType over the compatibilityMatrix,
  // Type.java:627-700): operand types must be implicitly castable and
  // the result type is the widened compatible type.
  test("UNION widens operands along the implicit-cast lattice") {
    QuerySpec.prepared(spark, sfDir)
    val wide = spark.sql(
      "SELECT CAST(1 AS TINYINT) AS x UNION ALL SELECT CAST(2 AS BIGINT)")
    assert(wide.schema.head.dataType.simpleString == "bigint", wide.schema)
    assert(wide.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val dd = spark.sql(
      "SELECT CAST(1.5 AS DECIMAL(9,2)) AS x UNION ALL SELECT CAST(2.5 AS DOUBLE)")
    assert(dd.schema.head.dataType.simpleString == "double", dd.schema)
  }

  test("UNION of INT with STRING coerces to STRING — a documented superset") {
    // the reference's matrix has no INT↔STRING implicit cast, so it
    // rejects this; Spark's WidenSetOperationTypes resolves to STRING
    QuerySpec.prepared(spark, sfDir)
    val df = spark.sql("SELECT 1 AS x UNION ALL SELECT 'abc'")
    assert(df.schema.head.dataType.simpleString == "string", df.schema)
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "abc"))
  }

  test("UNION of non-castable types is rejected like the reference's matrix") {
    // TIMESTAMP↔INT and MAP↔INT have no implicit cast in either engine
    fails("SELECT TIMESTAMP'2024-01-01 00:00:00' AS x UNION ALL SELECT 5",
      "INCOMPATIBLE_COLUMN_TYPE")
    fails("SELECT map('a', 1) AS x UNION ALL SELECT 2",
      "INCOMPATIBLE_COLUMN_TYPE")
  }

  // --- subquery placement family (SelectStmt.java:181 "Subqueries are
  // not supported in the select list", :538 HAVING, :598 GROUP BY;
  // QueryStmt.java:192 ORDER BY; AnalyzeSubqueriesTest.java:438 rejects
  // correlated subqueries with LIMIT): the reference allows subqueries
  // ONLY in WHERE. This engine is a documented superset — every
  // placement the reference rejects round-trips here with its result
  // pinned, so a regression to WHERE-only would fail loudly.
  test("subqueries outside WHERE are a supported superset of the reference") {
    QuerySpec.prepared(spark, sfDir)
    // select list: scalar (uncorrelated + correlated), EXISTS, IN
    val sel = spark.sql(
      """SELECT n_name,
        |       (SELECT MAX(r_regionkey) FROM region) AS mx,
        |       (SELECT r_name FROM region WHERE r_regionkey = n_regionkey) AS rn,
        |       EXISTS (SELECT 1 FROM region WHERE r_regionkey = n_regionkey) AS ex,
        |       n_regionkey IN (SELECT r_regionkey FROM region WHERE r_regionkey < 2) AS inn
        |FROM nation WHERE n_nationkey = 0""".stripMargin).collect().head
    assert(sel.getInt(1) == 4 && sel.getString(2) == "AFRICA")
    assert(sel.getBoolean(3) && sel.getBoolean(4))
    // HAVING
    val hav = spark.sql(
      """SELECT n_regionkey, COUNT(*) AS n FROM nation GROUP BY n_regionkey
        |HAVING COUNT(*) > (SELECT MIN(r_regionkey) FROM region)""".stripMargin)
    assert(hav.count() == 5) // every region has 5 nations > MIN(r_regionkey)=0
    // GROUP BY expression containing a scalar subquery
    val grp = spark.sql(
      """SELECT (SELECT MAX(r_regionkey) FROM region) + n_regionkey AS g, COUNT(*) AS n
        |FROM nation GROUP BY (SELECT MAX(r_regionkey) FROM region) + n_regionkey""".stripMargin)
    assert(grp.count() == 5 && grp.collect().map(_.getInt(0)).min == 4)
    // ORDER BY (constant scalar subquery key, name tiebreak)
    val ord = spark.sql(
      """SELECT n_name FROM nation
        |ORDER BY (SELECT MAX(r_regionkey) FROM region), n_name LIMIT 1""".stripMargin)
    assert(ord.collect().head.getString(0) == "NATION_0") // synthetic names sort 0 first
    // correlated IN subquery with LIMIT (AnalyzeSubqueriesTest.java:438)
    val lim = spark.sql(
      """SELECT c_custkey FROM customer t WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders s WHERE s.o_custkey = t.c_custkey LIMIT 1)
        |ORDER BY c_custkey LIMIT 1""".stripMargin)
    assert(lim.count() == 1)
  }

  // --- correlated-subquery restriction family (AnalyzeSubqueriesTest
  // .java): the shapes BOTH engines reject. The reference rejects these
  // at analysis ("Unsupported correlated subquery ..."); this engine
  // rejects the aggregate-of-outer-column and multi-level correlation at
  // analysis too, and the >1-row scalar subquery at runtime (the
  // reference's runtime also errors there when its cardinality check is
  // deferred).
  test("aggregate over an outer-query column inside a subquery is rejected") {
    // AnalyzeSubqueriesTest.java:445 "Unsupported correlated subquery
    // with grouping and/or aggregation" — here: CORRELATED_REFERENCE
    fails(
      """SELECT c_name FROM customer
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
      "CORRELATED_REFERENCE")
  }

  test("correlation across two nesting levels is rejected") {
    // the reference only resolves correlated refs one level up
    // (Analyzer.resolvePath over the direct parent block); same here —
    // the doubly-nested reference fails to resolve
    fails(
      """SELECT c_name FROM customer WHERE EXISTS (
        |  SELECT 1 FROM orders WHERE EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_suppkey = c_custkey))""".stripMargin,
      "c_custkey")
  }

  test("scalar subquery returning more than one row errors") {
    // runtime cardinality enforcement of the scalar-subquery contract
    // (the reference's rewrite requires an aggregate or LIMIT 1 —
    // AnalyzeSubqueriesTest runtime-cardinality family)
    fails(
      """SELECT c_name, (SELECT o_totalprice FROM orders WHERE o_custkey = c_custkey) AS m
        |FROM customer LIMIT 3""".stripMargin,
      "SCALAR_SUBQUERY_TOO_MANY_ROWS")
  }

  // --- aggregate-nesting family (AnalyzeExprsTest.java testAggregates:
  // "aggregate function must not contain aggregate parameters")
  test("aggregate of an aggregate") {
    fails("SELECT SUM(COUNT(*)) FROM nation", "NESTED_AGGREGATE_FUNCTION")
  }

  test("HAVING references a non-grouped column") {
    fails(
      "SELECT n_regionkey, COUNT(*) FROM nation GROUP BY n_regionkey HAVING n_name = 'x'",
      "n_name")
  }

  test("star select-list with aggregation") {
    fails("SELECT *, COUNT(*) FROM nation", "MISSING_GROUP_BY")
  }

  // --- generator/placement family (the reference rejects collection-
  // producing exprs outside FROM; Spark mirrors with generator rules)
  test("generator in WHERE clause") {
    fails("SELECT n_name FROM nation WHERE explode(array(1, 2)) = 1",
      "GENERATOR")
  }

  // --- LIMIT/OFFSET constant family (AnalyzeStmtsTest testLimitOffset:
  // LIMIT must be a non-negative constant)
  test("negative LIMIT") {
    fails("SELECT n_name FROM nation LIMIT -1", "LIMIT")
  }

  test("non-constant LIMIT") {
    fails("SELECT n_name FROM nation LIMIT n_nationkey", "LIMIT")
  }

  // --- name-resolution family (AnalyzeStmtsTest: ambiguous column/alias
  // errors)
  test("ambiguous column reference in a self-join") {
    fails(
      """SELECT n_name FROM nation a JOIN nation b
        |ON a.n_nationkey = b.n_nationkey""".stripMargin,
      "AMBIGUOUS_REFERENCE")
  }

  test("duplicate CTE name") {
    fails(
      "WITH t AS (SELECT 1 AS x), t AS (SELECT 2 AS x) SELECT * FROM t",
      "duplicate")
  }

  test("SELECT DISTINCT with ORDER BY on a non-selected column") {
    fails("SELECT DISTINCT n_name FROM nation ORDER BY n_regionkey",
      "n_regionkey")
  }

  // --- grouping-function family (the reference ties grouping() to
  // GROUP BY presence)
  test("grouping() without GROUP BY context") {
    fails("SELECT grouping(n_name) FROM nation", "GROUPING")
  }

  // --- window-frame validity (analysis/AnalyticWindow.java boundary
  // order checks)
  test("window frame starting at UNBOUNDED FOLLOWING") {
    fails(
      """SELECT SUM(n_nationkey) OVER (ORDER BY n_nationkey
        |ROWS BETWEEN UNBOUNDED FOLLOWING AND CURRENT ROW) FROM nation""".stripMargin,
      "frame")
  }

  // --- function-resolution family (AnalyzeExprsTest testFunctions:
  // unknown functions and arity mismatches are analysis-time errors)
  // --- statement-shape families (AnalyzeStmtsTest patterns) ---

  test("INSERT with mismatched column count") {
    QuerySpec.prepared(spark, sfDir)
    spark.sql("CREATE OR REPLACE TEMP VIEW g_ins_probe AS SELECT 1 AS x, 2 AS y")
    fails("INSERT INTO g_ins_probe VALUES (1)", "INSERT")
  }

  test("VALUES rows with inconsistent arity") {
    fails("SELECT * FROM (VALUES (1, 2), (3)) t", "values")
  }

  test("SUM(*) — star is only valid under COUNT") {
    // the reference rejects star under any non-count aggregate outright;
    // Spark first EXPANDS the star to the column list, so on any
    // multi-column relation the same statement still fails analysis
    // (wrong arity). Same user-facing outcome, different message.
    fails("SELECT SUM(*) FROM nation", "WRONG_NUM_ARGS")
  }

  test("window function nested inside a window function is a supported superset") {
    // the reference rejects analytic-in-analytic (analysis/AnalyticExpr
    // .java); Spark evaluates the inner window in a separate Window
    // operator — documented superset, pinned as a positive round-trip
    QuerySpec.prepared(spark, sfDir)
    val n = spark.sql(
      "SELECT ROW_NUMBER() OVER (ORDER BY RANK() OVER (ORDER BY n_name)) AS r FROM nation")
      .collect().length
    assert(n == 25)
  }

  test("duplicate column name in CREATE TABLE") {
    fails("CREATE TABLE g_bad_dup_col (x INT, x INT) USING parquet", "x")
  }

  test("duplicate table alias is rejected when referenced") {
    // the reference rejects the duplicate alias at registration
    // (analyzer duplicate-alias check); Spark registers both and rejects
    // the first AMBIGUOUS reference instead — the statement a user would
    // actually run still fails analysis
    fails("SELECT a.n_name FROM nation a, nation a", "AMBIGUOUS")
  }

  test("CREATE VIEW with duplicate output column names") {
    fails("CREATE TEMP VIEW g_bad_dup_view (a, a) AS SELECT n_name, n_regionkey FROM nation",
      "a")
  }

  test("unknown function") {
    fails("SELECT definitely_no_such_fn(n_name) FROM nation", "definitely_no_such_fn")
  }

  test("builtin called with wrong argument count") {
    fails("SELECT substr('abc') FROM nation", "substr")
  }

  // --- subquery-shape family (AnalyzeSubqueriesTest: operand arity)
  test("IN subquery with mismatched column count") {
    fails(
      "SELECT n_name FROM nation WHERE n_nationkey IN (SELECT n_nationkey, n_name FROM nation)",
      "column")
  }

  test("scalar subquery returning multiple columns") {
    fails("SELECT (SELECT n_nationkey, n_name FROM nation LIMIT 1) FROM nation",
      "column")
  }

  // --- type-name family (sql-parser.cup: unknown type keywords are
  // rejected at parse)
  test("CAST to an unknown type") {
    fails("SELECT CAST(1 AS FOOTYPE) FROM nation", "FOOTYPE")
  }

  // --- generator-placement family (LATERAL VIEW requires a generator)
  test("LATERAL VIEW over a non-generator function") {
    fails("SELECT x FROM nation LATERAL VIEW upper(n_name) t AS x",
      "generator")
  }

  // --- single-distinct-group rule (analysis/SelectStmt.java,
  // analyzeAggregation: the reference requires all DISTINCT aggregates
  // to share one expression list). This engine is a documented superset
  // — multiple DISTINCT groups plan through Expand — so the pin is the
  // ---- r15 additional families (AnalyzeExprsTest/AnalyzeStmtsTest) ----

  test("DECIMAL precision above 38 is rejected") {
    // ScalarType.MAX_PRECISION = 38 in the reference's type system;
    // Spark's DecimalType shares the bound
    fails("SELECT CAST(1 AS DECIMAL(39,0)) AS x", "38")
  }

  test("aggregate function in GROUP BY expression") {
    fails("SELECT COUNT(*) FROM nation GROUP BY SUM(n_regionkey)",
      "GROUP_BY_AGGREGATE")
  }

  test("aggregate function in a JOIN ON clause") {
    fails(
      "SELECT * FROM nation a JOIN region b ON SUM(a.n_regionkey) = b.r_regionkey",
      "UNSUPPORTED_EXPR_FOR_OPERATOR")
  }

  test("window function in GROUP BY expression") {
    fails("SELECT COUNT(*) FROM nation GROUP BY RANK() OVER (ORDER BY n_name)",
      "UNSUPPORTED_EXPR_FOR_OPERATOR")
  }

  test("select-list alias is not visible in WHERE") {
    // the reference resolves WHERE against base columns only
    // (AnalyzeStmtsTest "couldn't resolve column reference"); Spark's
    // lateral column aliases extend the SELECT list, never the filter
    fails("SELECT n_regionkey AS rk FROM nation WHERE rk > 1", "rk")
  }

  test("INSERT into a view is rejected") {
    QuerySpec.prepared(spark, sfDir)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW g_aerr_v AS SELECT 1 AS a")
    try fails("INSERT INTO g_aerr_v VALUES (2)", "view")
    finally spark.catalog.dropTempView("g_aerr_v"): Unit
  }

  test("non-integer LIMIT") {
    fails("SELECT n_name FROM nation LIMIT 2.5", "integer")
  }

  // Documented supersets of the reference's grammar/analyzer, pinned as
  // correct ANSWERS so a Spark upgrade can't silently change them:

  test("OFFSET without ORDER BY is a supported superset") {
    // the reference requires ORDER BY for OFFSET (AnalyzeStmtsTest);
    // Spark applies it to the unordered stream — pin the row count only
    QuerySpec.prepared(spark, sfDir)
    assert(spark.sql("SELECT n_name FROM nation LIMIT 5 OFFSET 3")
      .collect().length == 5)
  }

  test("WITH RECURSIVE is a supported superset of the reference's grammar") {
    QuerySpec.prepared(spark, sfDir)
    val r = spark.sql(
      """WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n < 5)
        |SELECT SUM(n) AS s FROM r""".stripMargin).collect().head
    assert(r.getLong(0) == 15L)
  }

  test("negative LEAD offset is a supported superset (evaluates as LAG)") {
    // the reference rejects negative analytic offsets
    // (AnalyticExpr.checkOffset); Spark evaluates lead(x, -1) = lag(x, 1)
    QuerySpec.prepared(spark, sfDir)
    val rows = spark.sql(
      """SELECT lead(n_name, -1) OVER (ORDER BY n_name) AS l,
        |       lag(n_name, 1)  OVER (ORDER BY n_name) AS g
        |FROM nation""".stripMargin).collect()
    assert(rows.forall(r => r.getString(0) == r.getString(1)))
  }

  // correct ANSWER, not a rejection.
  test("multiple DISTINCT aggregate groups are a supported superset") {
    QuerySpec.prepared(spark, sfDir)
    val r = spark.sql(
      """SELECT COUNT(DISTINCT n_regionkey) AS a, COUNT(DISTINCT n_name) AS b,
        |       SUM(DISTINCT n_regionkey) AS c FROM nation""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 25 && r.getLong(2) == 10)
  }
}
