package graft

import graft.positions.SqlPositions

/** Entry-point-2 parity: parse SQL as a library and read back source
  * spans, mirroring the reference's startPosition/endPosition/subBlocks
  * demo (README.md; ExtendSymbol.java:1-52). */
class PositionsSpec extends EngineSuite {

  test("parse returns a block tree with source spans") {
    val sql = "SELECT a, b FROM t WHERE a > 1 UNION ALL SELECT c, d FROM u"
    val root = SqlPositions.parse(spark, sql)
    assert(root.nodeName.nonEmpty)
    val flat = SqlPositions.flatten(root)
    assert(flat.nonEmpty, "no positioned blocks found")
    // the two SELECT blocks must map back to their exact source fragments
    val frags = flat.map(_._4)
    assert(frags.exists(_.startsWith("SELECT a, b")), s"missing left select in $frags")
    assert(frags.exists(_.startsWith("SELECT c, d")), s"missing right select in $frags")
  }

  test("subBlocks nest: union has two select children with disjoint spans") {
    val sql = "SELECT a FROM t UNION ALL SELECT b FROM u"
    val root = SqlPositions.parse(spark, sql)
    val selects = SqlPositions.flatten(root).filter(_._4.startsWith("SELECT"))
    val spans = selects.map(s => (s._2, s._3)).distinct.sorted
    assert(spans.size >= 2)
    assert(spans.head._2 < spans.last._1, s"spans overlap: $spans")
  }

  test("parse works without any catalog (unresolved relations)") {
    val b = SqlPositions.parse(spark, "SELECT x FROM no_such_table_anywhere")
    assert(b.subBlocks.nonEmpty || b.nodeName.nonEmpty)
  }

  // ---- analysis-error position parity: the fork's position-carrying
  // errors past the parser (ExtendSymbol.java:1-52; ParserTest expected
  // errors assert exact positions). Each family pins the exact span.

  private def issue(sql: String): SqlPositions.AnalysisIssue = {
    QuerySpec.prepared(spark, sfDir)
    SqlPositions.analyze(spark, sql) match {
      case Left(i) => i
      case Right(_) => fail(s"expected an analysis error for: $sql")
    }
  }

  test("analyze: success returns the analyzed block tree") {
    QuerySpec.prepared(spark, sfDir)
    val r = SqlPositions.analyze(spark, "SELECT c_name FROM customer")
    assert(r.isRight, r)
  }

  test("unknown column: exact span + line/col of the offending identifier") {
    val i = issue("SELECT no_such_col FROM customer")
    assert(i.errorClass.startsWith("UNRESOLVED_COLUMN"), i)
    assert(i.fragment.contains("no_such_col"), i)
    assert(i.startIndex.contains(7) && i.stopIndex.contains(17), i)
    assert(i.startLine.contains(1) && i.startCol.contains(7), i)
    assert(i.endLine.contains(1) && i.endCol.contains(17), i)
  }

  test("unknown table: span covers exactly the relation name") {
    val i = issue("SELECT c_name FROM no_such_table")
    assert(i.errorClass == "TABLE_OR_VIEW_NOT_FOUND", i)
    assert(i.fragment.contains("no_such_table"), i)
    assert(i.startIndex.contains(19) && i.stopIndex.contains(31), i)
  }

  test("unknown function: span covers the whole call") {
    val i = issue("SELECT no_such_fn(c_name) FROM customer")
    assert(i.errorClass == "UNRESOLVED_ROUTINE", i)
    assert(i.fragment.contains("no_such_fn(c_name)"), i)
    assert(i.startIndex.contains(7) && i.stopIndex.contains(24), i)
  }

  test("type mismatch: span covers the mis-typed expression") {
    val i = issue("SELECT array_contains(c_acctbal, 1) FROM customer")
    assert(i.errorClass.startsWith("DATATYPE_MISMATCH"), i)
    assert(i.fragment.contains("array_contains(c_acctbal, 1)"), i)
    assert(i.startIndex.contains(7) && i.stopIndex.contains(34), i)
  }

  test("ordinal out of range: span is exactly the ordinal literal") {
    val g = issue("SELECT c_name FROM customer GROUP BY 9")
    assert(g.errorClass == "GROUP_BY_POS_OUT_OF_RANGE", g)
    assert(g.fragment.contains("9") && g.startIndex.contains(37) && g.stopIndex.contains(37), g)
    val o = issue("SELECT c_custkey FROM customer ORDER BY 99")
    assert(o.errorClass == "ORDER_BY_POS_OUT_OF_RANGE", o)
    assert(o.fragment.contains("99") && o.startIndex.contains(40) && o.stopIndex.contains(41), o)
  }

  test("set-op arity mismatch: span covers the whole statement") {
    val sql = "SELECT c_name FROM customer UNION ALL SELECT c_name, c_custkey FROM customer"
    val i = issue(sql)
    assert(i.errorClass == "NUM_COLUMNS_MISMATCH", i)
    assert(i.startIndex.contains(0) && i.stopIndex.contains(sql.length - 1), i)
  }

  test("multi-line SQL: line/col computed from the absolute span") {
    val i = issue("SELECT c_name,\n       bogus_col\nFROM customer")
    assert(i.errorClass.startsWith("UNRESOLVED_COLUMN"), i)
    assert(i.fragment.contains("bogus_col"), i)
    assert(i.startLine.contains(2) && i.startCol.contains(7), i)
    assert(i.endLine.contains(2) && i.endCol.contains(15), i)
  }

  test("parse error: still positioned through the same surface") {
    val i = issue("SELECT c_name FROM customer WHERE (c_acctbal >")
    assert(i.startLine.contains(1), i)
    assert(i.message.toLowerCase.contains("syntax"), i)
  }

  // ---- column-level lineage: which base table.columns feed each
  // output column (the library-embedding use case the fork exists for)

  private def lin(sql: String): Map[String, Set[String]] = {
    QuerySpec.prepared(spark, sfDir)
    graft.positions.SqlLineage.lineage(spark, sql)
  }

  test("lineage: projection and expression columns ground in their base columns") {
    val m = lin(
      """SELECT o_orderkey, o_totalprice * 2 AS doubled,
        |       CONCAT(o_orderstatus, o_orderpriority) AS tag
        |FROM orders""".stripMargin)
    assert(m("o_orderkey") == Set("orders.o_orderkey"), m.toString)
    assert(m("doubled") == Set("orders.o_totalprice"), m.toString)
    assert(m("tag") == Set("orders.o_orderstatus", "orders.o_orderpriority"), m.toString)
  }

  test("lineage: joins and aggregates merge lineage across tables") {
    val m = lin(
      """SELECT c_mktsegment, SUM(o_totalprice) AS revenue,
        |       COUNT(o_orderkey + c_custkey) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(m("c_mktsegment") == Set("customer.c_mktsegment"), m.toString)
    assert(m("revenue") == Set("orders.o_totalprice"), m.toString)
    assert(m("n") == Set("orders.o_orderkey", "customer.c_custkey"), m.toString)
  }

  test("lineage: flows through CTEs, unions, windows, and subqueries") {
    val m = lin(
      """WITH x AS (SELECT o_custkey AS k, o_totalprice AS v FROM orders),
        |y AS (SELECT c_custkey AS k, c_acctbal AS v FROM customer)
        |SELECT k, SUM(v) AS total,
        |  RANK() OVER (ORDER BY SUM(v) DESC) AS rk,
        |  (SELECT MAX(n_nationkey) FROM nation) AS cap
        |FROM (SELECT * FROM x UNION ALL SELECT * FROM y) u
        |GROUP BY k""".stripMargin)
    assert(m("k") == Set("orders.o_custkey", "customer.c_custkey"), m.toString)
    assert(m("total") == Set("orders.o_totalprice", "customer.c_acctbal"), m.toString)
    assert(m("rk") == Set("orders.o_totalprice", "customer.c_acctbal"), m.toString)
    assert(m("cap") == Set("nation.n_nationkey"), m.toString)
  }

  test("lineage: lateral view output grounds in the exploded expression") {
    val m = lin(
      """SELECT word FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS word""".stripMargin)
    assert(m("word") == Set("documents.text"), m.toString)
  }

  test("lineage: corpus sweep — every SQL spec resolves, derived columns ground in base tables") {
    QuerySpec.prepared(spark, sfDir)
    val tables = sources.TestTables.names.toSet
    var grounded = 0
    for (s <- SparkEntry.specs; text <- s.sparkSql) {
      val m = graft.positions.SqlLineage.lineage(spark, text) // must not throw
      val cols = m.values.flatten.toSet
      // an inline VALUES table is a legitimate base relation under its
      // own alias; everything else must ground in a registered table
      val hasInline = "(?i)VALUES\\s*\\(".r.findFirstIn(text).isDefined
      cols.foreach { c =>
        assert(hasInline || tables.contains(c.split('.').head),
          s"${s.name}: lineage escaped the base tables: $c")
      }
      if (cols.nonEmpty) grounded += 1
    }
    // only pure-literal (VALUES) and pure-COUNT(*) queries — no column
    // VALUES flow into their outputs — may come back ungrounded (the
    // round-13 reliability/governance/time-series families are
    // count-statistic-heavy: kappa/alpha/k-anonymity/PSI, and now the
    // day-count series operators — Friedman/Kleinberg/PACF/Holt-
    // Winters/Gumbel/Granger/log-rank — are all functions of group
    // COUNTs alone, so they legitimately carry no column lineage)
    assert(grounded >= SparkEntry.specs.count(_.sparkSql.isDefined) - 21,
      s"only $grounded queries produced grounded lineage")
  }
}
