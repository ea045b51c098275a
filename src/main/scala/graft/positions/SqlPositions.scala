package graft.positions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.trees.Origin

/** Position-annotated SQL parsing — the reference fork's headline feature.
  *
  * 924060929/impala-frontend patches Impala's CUP parser to expose
  * `startPosition`/`endPosition`/`subBlocks` on every syntax block
  * (README.md demo; fe/src/main/java/java_cup/runtime/ExtendSymbol.java:
  * 1-52, analysis/SyntaxBlock.java) so the frontend can be embedded as a
  * SQL-analysis library for lineage/IDE tooling.
  *
  * Spark-first equivalent: Catalyst's parser already records an [[Origin]]
  * (line, startPosition, startIndex, stopIndex, sqlText) on every
  * [[LogicalPlan]] node — this module walks the parsed (unresolved) tree
  * and materializes the same block structure: node type, source span, the
  * exact SQL fragment, and children (= subBlocks).
  */
object SqlPositions {

  /** One syntax block: mirror of the reference's SyntaxBlock surface. */
  final case class Block(
      nodeName: String,
      line: Option[Int],
      startIndex: Option[Int],
      stopIndex: Option[Int],
      fragment: Option[String],
      subBlocks: Seq[Block]) {
    def startPosition: Option[Int] = startIndex
    def endPosition: Option[Int] = stopIndex
  }

  /** Parse without analysis (entry point 2 of the reference — no catalog
    * needed) and return the annotated block tree. */
  def parse(spark: SparkSession, sql: String): Block =
    toBlock(spark.sessionState.sqlParser.parsePlan(sql), sql)

  private def fragmentOf(o: Origin, sql: String): Option[String] =
    for (a <- o.startIndex; b <- o.stopIndex if a >= 0 && b < sql.length && a <= b)
      yield sql.substring(a, b + 1)

  private def toBlock(p: LogicalPlan, sql: String): Block = {
    val o = p.origin
    Block(
      nodeName = p.nodeName,
      line = o.line,
      startIndex = o.startIndex,
      stopIndex = o.stopIndex,
      fragment = fragmentOf(o, sql),
      subBlocks = p.children.map(toBlock(_, sql)))
  }

  /** Flattened pre-order listing (nodeName, start, stop, fragment) — the
    * shape lineage tools consume. */
  def flatten(b: Block): Seq[(String, Int, Int, String)] = {
    val self = for (a <- b.startIndex; z <- b.stopIndex; f <- b.fragment)
      yield (b.nodeName, a, z, f)
    self.toSeq ++ b.subBlocks.flatMap(flatten)
  }
}
