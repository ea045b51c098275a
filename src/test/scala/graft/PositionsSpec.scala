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
}
