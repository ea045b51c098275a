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

  /** A position-annotated ANALYSIS failure — the reference fork's
    * position-carrying errors extended past the parser (ParserTest's
    * expected errors carry exact source positions; the fork's
    * ExtendSymbol.java:1-52 threads them through every symbol). Spark
    * attaches a SQL [[org.apache.spark.QueryContext]] to analysis errors
    * (unknown column/table/function, type mismatch, ordinal range, …);
    * this surfaces it as absolute index span + exact fragment + 1-based
    * line / 0-based column coordinates for both span ends, so an IDE or
    * lineage tool can underline precisely the offending text. */
  final case class AnalysisIssue(
      errorClass: String,
      message: String,
      startIndex: Option[Int],
      stopIndex: Option[Int],
      fragment: Option[String],
      startLine: Option[Int],
      startCol: Option[Int],
      endLine: Option[Int],
      endCol: Option[Int])

  /** (1-based line, 0-based column) of an absolute character offset —
    * the coordinate convention of Spark's own `line N pos P` rendering,
    * which matches the reference's error positions. */
  def lineCol(sql: String, index: Int): (Int, Int) = {
    var line = 1
    var lineStart = 0
    var i = 0
    while (i < index && i < sql.length) {
      if (sql.charAt(i) == '\n') { line += 1; lineStart = i + 1 }
      i += 1
    }
    (line, index - lineStart)
  }

  /** Entry point 3: parse AND analyze against the session catalog.
    * Success → the analyzed plan's block tree; failure → a positioned
    * [[AnalysisIssue]] (never a thrown exception for analysis-grade
    * errors — the library-embedding contract). Parse errors surface the
    * same way (Spark's ParseException IS an AnalysisException and
    * carries line/startPosition). */
  def analyze(spark: SparkSession, sql: String): Either[AnalysisIssue, Block] =
    try {
      val qe = spark.sessionState.executePlan(
        spark.sessionState.sqlParser.parsePlan(sql))
      qe.assertAnalyzed()
      Right(toBlock(qe.analyzed, sql))
    } catch {
      case e: org.apache.spark.sql.AnalysisException =>
        // prefer the SQL query context (exact span); fall back to the
        // exception's own line/pos (parse errors, context-free analyses)
        val ctx = e.getQueryContext.find(
          _.contextType() == org.apache.spark.QueryContextType.SQL)
        val start = ctx.map(_.startIndex())
        val stop = ctx.map(_.stopIndex())
        val startLc = start.map(lineCol(sql, _))
        val stopLc = stop.map(lineCol(sql, _))
        Left(AnalysisIssue(
          errorClass = Option(e.getCondition).getOrElse("_LEGACY"),
          message = e.getMessage,
          startIndex = start,
          stopIndex = stop,
          fragment = ctx.map(_.fragment()),
          startLine = startLc.map(_._1).orElse(e.line),
          startCol = startLc.map(_._2).orElse(e.startPosition),
          endLine = stopLc.map(_._1),
          endCol = stopLc.map(_._2)))
    }
}
