package graft.positions

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage from the ANALYZED plan — the other half of the
  * reference fork's purpose (embedding the frontend as a SQL-analysis
  * library for lineage/IDE tooling, README demo + SyntaxBlock surface):
  * [[SqlPositions]] answers "where in the text", this answers "which
  * base columns feed each output column". Spark-first: the analyzed
  * plan's `ExprId` graph already IS the lineage graph — every Alias
  * introduces a node whose inputs are its child's attribute references,
  * every relation leaf grounds attributes in a named table — so lineage
  * is one bottom-up fold, no parsing of our own.
  *
  * Returned per output column: the set of `table.column` strings it
  * transitively derives from (through projections, aggregates, windows,
  * joins, unions, CTEs, generators, and subquery expressions). Columns
  * consumed only by filters/join conditions are control-flow lineage
  * and deliberately excluded — the map answers "what VALUES flow into
  * this column", the same contract lineage tools give. */
object SqlLineage {

  /** output column name → base `table.column` set. */
  def lineage(spark: SparkSession, sql: String): Map[String, Set[String]] = {
    val qe = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(sql))
    qe.assertAnalyzed()
    val plan = qe.analyzed
    val base = mutable.Map.empty[ExprId, Set[String]]
    val cteDefs = mutable.Map.empty[Long, Seq[Attribute]]

    def refsOf(e: Expression): Set[String] = {
      val direct = e.references.iterator
        .flatMap(a => base.getOrElse(a.exprId, Set.empty[String])).toSet
      // a subquery expression contributes its own plan's output lineage
      val sub = e.collect { case pe: PlanExpression[_] => pe.plan }.flatMap {
        case lp: LogicalPlan =>
          walk(lp)
          lp.output.flatMap(a => base.getOrElse(a.exprId, Set.empty[String]))
        case _ => Nil
      }.toSet
      direct ++ sub
    }

    def named(list: Seq[NamedExpression]): Unit = list.foreach {
      case a: Alias => base(a.exprId) = refsOf(a.child)
      case _ => () // bare attribute: same ExprId flows through
    }

    def walk(p: LogicalPlan): Unit = p.foreachUp {
      case s: SubqueryAlias =>
        // a BASE relation behind the alias (temp view over files,
        // catalog table): the alias names the table for every column.
        // A derived child (subquery, SQL view body) flows through
        // instead, grounding in ITS base tables.
        val isBase = s.child match {
          case v: View => v.child.children.isEmpty
          case _: CTERelationRef => false // wired to its def's lineage below
          case leaf => leaf.children.isEmpty
        }
        if (isBase) s.output.foreach { a =>
          base(a.exprId) = Set(s"${s.identifier.name}.${a.name}")
        }
      case v: View if v.child.children.nonEmpty =>
        v.output.zip(v.child.output).foreach { case (o, i) =>
          if (o.exprId != i.exprId)
            base(o.exprId) = base.getOrElse(i.exprId, Set.empty)
        }
      case pr: Project => named(pr.projectList)
      case ag: Aggregate => named(ag.aggregateExpressions)
      case w: Window => named(w.windowExpressions)
      case g: Generate =>
        val src = refsOf(g.generator)
        g.generatorOutput.foreach(a => base(a.exprId) = src)
      case e: Expand =>
        // grouping-set expand: output slot i unions that slot across
        // every projection row
        e.output.zipWithIndex.foreach { case (o, i) =>
          val srcs = e.projections
            .flatMap(row => if (i < row.size) refsOf(row(i)) else Set.empty[String])
          base(o.exprId) = base.getOrElse(o.exprId, Set.empty) ++ srcs
        }
      case u: Union =>
        u.output.zipWithIndex.foreach { case (o, i) =>
          val srcs = u.children
            .flatMap(c => base.getOrElse(c.output(i).exprId, Set.empty[String]))
          base(o.exprId) = base.getOrElse(o.exprId, srcs.toSet) ++ srcs
        }
      // CTE refs carry fresh ExprIds: wire them to their def's outputs
      // (foreachUp visits the defs before the consuming plan)
      case d: CTERelationDef => cteDefs(d.id) = d.child.output
      case r: CTERelationRef =>
        cteDefs.get(r.cteId).foreach { defOut =>
          r.output.zip(defOut).foreach { case (o, i) =>
            base(o.exprId) = base.getOrElse(i.exprId, Set.empty)
          }
        }
      case _ => ()
    }

    walk(plan)
    // second pass reaches the fixpoint when a ref was read before its
    // def's lineage finished grounding (nested CTEs, subquery plans)
    walk(plan)

    plan.output.map(a =>
      a.name -> base.getOrElse(a.exprId, Set.empty[String])).toMap
  }
}
