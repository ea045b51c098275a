package graft

import org.apache.spark.sql.DataFrame

/** Rewrite-equivalence properties (ExprRewriteRulesTest analogue,
  * rewrite/BetweenToCompoundRule.java etc.): for random data, a query and
  * its reference-rewritten form return identical results. Deterministic
  * seed → reproducible. */
class RewriteEquivalenceSpec extends EngineSuite {

  private lazy val t: DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(300) { i =>
      (i.toLong,
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(20).toString,
        rnd.nextInt(100),
        rnd.nextDouble() * 100 - 50)
    }
    val df = rows.toDF("id", "s", "k", "x")
    df.createOrReplaceTempView("rw_t")
    df
  }

  private def same(q1: String, q2: String): Unit = {
    t // force view
    val a = spark.sql(q1).collect().map(_.toString).sorted.toSeq
    val b = spark.sql(q2).collect().map(_.toString).sorted.toSeq
    assert(a == b, s"rewrite changed results:\n$q1\nvs\n$q2")
  }

  test("BETWEEN ≡ compound comparison (BetweenToCompoundRule)") {
    same("SELECT id FROM rw_t WHERE k BETWEEN 20 AND 60",
      "SELECT id FROM rw_t WHERE k >= 20 AND k <= 60")
    same("SELECT id FROM rw_t WHERE k NOT BETWEEN 20 AND 60",
      "SELECT id FROM rw_t WHERE k < 20 OR k > 60")
  }

  test("decode ≡ null-safe CASE (CaseExpr.java:99-150)") {
    graft.engine.GraftSession.attach(spark)
    same("SELECT id, decode(s, NULL, 'n', '5', 'five', 'other') AS d FROM rw_t",
      """SELECT id, CASE WHEN s IS NULL THEN 'n' WHEN s = '5' THEN 'five'
        |ELSE 'other' END AS d FROM rw_t""".stripMargin)
  }

  test("IN list ≡ OR chain (InPredicate)") {
    same("SELECT id FROM rw_t WHERE k IN (3, 17, 42)",
      "SELECT id FROM rw_t WHERE k = 3 OR k = 17 OR k = 42")
  }

  test("EXISTS ≡ LEFT SEMI, NOT EXISTS ≡ LEFT ANTI (StmtRewriter)") {
    same(
      "SELECT a.id FROM rw_t a WHERE EXISTS (SELECT 1 FROM rw_t b WHERE b.k = a.k AND b.x > 25)",
      "SELECT a.id FROM rw_t a LEFT SEMI JOIN (SELECT k FROM rw_t WHERE x > 25) b ON a.k = b.k")
    same(
      "SELECT a.id FROM rw_t a WHERE NOT EXISTS (SELECT 1 FROM rw_t b WHERE b.k = a.k AND b.x > 25)",
      "SELECT a.id FROM rw_t a LEFT ANTI JOIN (SELECT k FROM rw_t WHERE x > 25) b ON a.k = b.k")
  }

  test("null-safe equality: <=> ≡ IS NOT DISTINCT FROM") {
    same("SELECT id FROM rw_t WHERE s <=> '5'",
      "SELECT id FROM rw_t WHERE s IS NOT DISTINCT FROM '5'")
    same("SELECT id FROM rw_t WHERE s <=> NULL",
      "SELECT id FROM rw_t WHERE s IS NULL")
  }

  test("distinct UNION ≡ group-by-all-columns agg (UnionStmt.java:137-144)") {
    same(
      "SELECT k FROM rw_t WHERE x > 0 UNION SELECT k FROM rw_t WHERE x < -25",
      """SELECT k FROM (SELECT k FROM rw_t WHERE x > 0
        |UNION ALL SELECT k FROM rw_t WHERE x < -25) u GROUP BY k""".stripMargin)
  }

  test("uuid() exists and produces well-formed ids") {
    val u = spark.sql("SELECT uuid() AS u").collect().head.getString(0)
    assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("percent_rank/cume_dist ≡ rank/count arithmetic (AnalyticExpr.java:239-341)") {
    // the reference rewrites these to arithmetic over rank()/count()
    // windows at analysis time; Spark executes them natively — pin the
    // equivalence the rewrite depends on
    same(
      "SELECT id, percent_rank() OVER (ORDER BY k, id) AS pr FROM rw_t",
      """SELECT id, CASE WHEN cnt = 1 THEN 0.0D
        |  ELSE CAST(rnk - 1 AS DOUBLE) / (cnt - 1) END AS pr
        |FROM (SELECT id, RANK() OVER (ORDER BY k, id) AS rnk,
        |             COUNT(*) OVER () AS cnt FROM rw_t) t""".stripMargin)
    same(
      "SELECT id, cume_dist() OVER (ORDER BY k) AS cd FROM rw_t",
      """SELECT id, CAST(cr AS DOUBLE) / cnt AS cd
        |FROM (SELECT id,
        |        COUNT(*) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED PRECEDING
        |                       AND CURRENT ROW) AS cr,
        |        COUNT(*) OVER () AS cnt FROM rw_t) t""".stripMargin)
  }

  test("last_value ≡ first_value over the reversed window (AnalyticExpr.java:544-778)") {
    same(
      """SELECT id, last_value(k) OVER (ORDER BY id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v FROM rw_t""".stripMargin,
      """SELECT id, first_value(k) OVER (ORDER BY id DESC
        |ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v FROM rw_t""".stripMargin)
  }

  // --- plan-visible rewrites (the §4.1 rules Catalyst applies natively;
  // pinned on the optimized plan so a conf regression trips the suite)

  test("constant folding happens at plan time (FoldConstantsRule.java:26-63)") {
    // over a parquet-backed table so the relation itself can't fold away
    QuerySpec.prepared(spark, sfDir)
    val p = spark.sql("SELECT n_nationkey + (1 + 2) AS v FROM nation")
      .queryExecution.optimizedPlan.toString
    assert(p.contains("+ 3)") && !p.contains("(1 + 2)"),
      s"constants not folded:\n$p")
  }

  test("common conjunct extracted from a disjunction (ExtractCommonConjunctRule.java:30-102)") {
    QuerySpec.prepared(spark, sfDir)
    val p = spark.sql(
      """SELECT n_name FROM nation
        |WHERE (n_nationkey > 5 AND n_name = 'a') OR (n_nationkey > 5 AND n_name = 'b')""".stripMargin)
      .queryExecution.optimizedPlan.toString
    // (a&b)|(a&c) → a&(b|c): the common n_nationkey > 5 appears once
    val n = "> 5".r.findAllIn(p).size
    assert(n == 1, s"common conjunct not extracted ($n occurrences):\n$p")
  }

  test("constant-false predicate folds the whole relation away (replaceExistsPredicate analogue)") {
    QuerySpec.prepared(spark, sfDir)
    val p = spark.sql("SELECT n_name FROM nation WHERE NULL AND n_nationkey > 5")
      .queryExecution.optimizedPlan.toString
    assert(p.contains("LocalRelation <empty>"), s"null-false filter not folded:\n$p")
  }
}
