package graft.positions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedHaving, UnresolvedOrdinal, UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Exists, Expression, InSubquery, Not, PlanExpression, SortOrder}
import org.apache.spark.sql.types.BooleanType
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.trees.Origin

/** SQL regeneration from the parsed plan — the reference's ToSql surface
  * (the toSql() methods across fe/.../impala/analysis, golden-tested by
  * ToSqlTest.java: every statement must render back to SQL that
  * re-parses and re-executes to the same result). The Spark-first twist:
  * instead of hand-maintaining a renderer for every expression form,
  * expressions re-render by SPLICING their source fragment through the
  * parser's [[Origin]] spans — the same position machinery
  * [[SqlPositions]] exposes (the fork's headline feature). The
  * query-block SKELETON (SELECT/FROM/WHERE/GROUP BY/HAVING/ORDER BY/
  * LIMIT/OFFSET, joins, set ops, CTEs) is rendered structurally, so a
  * skeleton-level drift (clause dropped, join type flipped, span
  * misaligned) changes the regenerated SQL and fails ToSqlSpec's
  * re-execute-and-hash sweep.
  *
  * Spans are NOT trusted blindly: Spark's parser mis-originates several
  * predicate forms (LIKE/IN/BETWEEN start their span at the operator,
  * some aliased literals inherit statement-wide spans), so each spliced
  * fragment is VALIDATED — re-parsed as an expression and compared
  * (structurally, modulo expr-ids) against the node it stands for —
  * trying the node's own span, the subtree-union span, then the
  * children-union span. A fragment that cannot be validated raises
  * [[Unsupported]]; callers (the sweep) fall back to the original text
  * and count structural coverage instead. */
object SqlRender {

  final class Unsupported(what: String) extends RuntimeException(what)

  private final case class Ctx(src: String, parser: ParserInterface)

  /** Regenerate SQL for `sqlText` from its parsed plan. Throws
    * [[Unsupported]] when the plan leaves the renderable subset. */
  def toSql(spark: SparkSession, sqlText: String): String = {
    val parser = spark.sessionState.sqlParser
    render(parser.parsePlan(sqlText), Ctx(sqlText, parser))
  }

  // ---- fragment splicing -------------------------------------------------

  private def slice(o: Origin, src: String): Option[String] =
    for (a <- o.startIndex; b <- o.stopIndex if a >= 0 && b < src.length && a <= b)
      yield src.substring(a, b + 1)

  /** Every origin reachable from `e`, including subquery plans. */
  private def origins(e: Expression, includeSelf: Boolean): Seq[Origin] = {
    val buf = new ArrayBuffer[Origin]
    def visitPlan(p: LogicalPlan): Unit = p.foreach { n =>
      buf += n.origin
      n.expressions.foreach(visitExpr)
    }
    def visitExpr(x: Expression): Unit = {
      buf += x.origin
      x.children.foreach(visitExpr)
      x match {
        case pe: PlanExpression[_] => pe.plan match {
          case lp: LogicalPlan => visitPlan(lp)
          case _ => ()
        }
        case _ => ()
      }
    }
    if (includeSelf) visitExpr(e) else {
      e.children.foreach(visitExpr)
      e match {
        case pe: PlanExpression[_] => pe.plan match {
          case lp: LogicalPlan => visitPlan(lp)
          case _ => ()
        }
        case _ => ()
      }
    }
    buf.toSeq
  }

  private def unionSpan(os: Seq[Origin], src: String): Option[String] = {
    val starts = os.flatMap(_.startIndex).filter(_ >= 0)
    val stops = os.flatMap(_.stopIndex).filter(_ < src.length)
    if (starts.isEmpty || stops.isEmpty) None
    else {
      val (a, b) = (starts.min, stops.max)
      if (a <= b) Some(src.substring(a, b + 1)) else None
    }
  }

  /** Structural comparison key, modulo expr-ids (fresh on every parse)
    * and the non-comparable UnresolvedAlias wrapper. */
  private def canon(e: Expression): String = {
    val stripped = e match {
      case UnresolvedAlias(c, _) => c
      case other => other
    }
    stripped.toString.replaceAll("#\\d+", "")
  }

  /** Source fragment for `e`, validated by re-parse. An [[Alias]] also
    * accepts a fragment matching only its child (the parser sometimes
    * leaves the alias wrapper with a bogus span) — [[selectItem]]
    * re-attaches the alias structurally in that case. */
  private def frag(e: Expression, ctx: Ctx): String = {
    e match {
      // ordinals parse as integer literals, not ordinal markers — render
      // the ordinal digit itself
      case o: UnresolvedOrdinal => return o.ordinal.toString
      case _ => ()
    }
    val targets: Set[String] = e match {
      case a: Alias => Set(canon(a), canon(a.child))
      // the parser wraps WHERE/HAVING predicates in an implicit boolean
      // cast that a whole-query re-parse re-adds — accept the bare form
      case c: Cast if c.dataType == BooleanType => Set(canon(c), canon(c.child))
      case other => Set(canon(other))
    }
    def ok(text: String): Boolean =
      try targets.contains(canon(ctx.parser.parseExpression(text)))
      catch { case _: Exception => false }
    val candidates =
      (slice(e.origin, ctx.src).toSeq :+
        unionSpan(origins(e, includeSelf = true), ctx.src) :+
        unionSpan(origins(e, includeSelf = false), ctx.src) :+
        structuralExpr(e, ctx))
        .flatMap {
          case s: String => Seq(s)
          case Some(s: String) => Seq(s)
          case _ => Nil
        }.distinct
    candidates.find(ok).getOrElse(
      throw new Unsupported(s"no validating span for: ${e.simpleString(5)}"))
  }

  /** Structural last-resort candidates for subquery predicates — the one
    * expression family whose spans never cover their leading keyword
    * (EXISTS/IN subqueries originate at the inner SELECT). Still
    * validated like any spliced candidate. */
  private def structuralExpr(e: Expression, ctx: Ctx): Option[String] =
    try e match {
      case ex: Exists => Some(s"EXISTS (${render(ex.plan, ctx)})")
      case Not(ex: Exists) => Some(s"NOT EXISTS (${render(ex.plan, ctx)})")
      case in: InSubquery =>
        val vals = in.values.map(frag(_, ctx)).mkString(", ")
        val lhs = if (in.values.size > 1) s"($vals)" else vals
        Some(s"$lhs IN (${render(in.query.plan, ctx)})")
      case Not(in: InSubquery) =>
        val vals = in.values.map(frag(_, ctx)).mkString(", ")
        val lhs = if (in.values.size > 1) s"($vals)" else vals
        Some(s"$lhs NOT IN (${render(in.query.plan, ctx)})")
      case c: Cast if c.dataType == BooleanType => structuralExpr(c.child, ctx)
      case _ => None
    } catch { case _: Unsupported => None }

  /** ORDER BY items carry direction keywords the expression parser
    * rejects, so validation runs on the child; the rendered text is the
    * child fragment plus structurally-rendered direction — span drift on
    * the child still fails validation. */
  private def sortFrag(s: SortOrder, ctx: Ctx): String = {
    val dir = s.direction.sql
    val nulls = s.nullOrdering.sql
    s"${frag(s.child, ctx)} $dir $nulls"
  }

  // ---- plan skeleton -----------------------------------------------------

  private def render(p: LogicalPlan, ctx: Ctx): String = p match {
    case w: UnresolvedWith =>
      val defs = w.cteRelations.map {
        // WITH name(col, …) AS (…): the parser wraps the definition in
        // UnresolvedSubqueryColumnAliases — re-emit the column list
        case (name, sa, _) => sa.child match {
          case u: UnresolvedSubqueryColumnAliases =>
            s"$name(${u.outputColumnNames.mkString(", ")}) AS (${render(u.child, ctx)})"
          case child => s"$name AS (${render(child, ctx)})"
        }
      }
      s"WITH ${defs.mkString(", ")} ${render(w.child, ctx)}"
    case h: UnresolvedHint =>
      // a /*+ hint */ is semantics-free: regenerate the query without it
      // (rows identical; the hint only steers the physical plan)
      render(h.child, ctx)
    case t: org.apache.spark.sql.catalyst.analysis.UnresolvedInlineTable =>
      // inline VALUES table (the parsed form of a VALUES CTE body before
      // constant evaluation): per-row expressions render as validated
      // fragments
      "VALUES " + t.rows.map(r =>
        "(" + r.map(frag(_, ctx)).mkString(", ") + ")").mkString(", ")
    case g: GlobalLimit =>
      g.child match {
        case LocalLimit(_, o: Offset) =>
          s"${render(o.child, ctx)} LIMIT ${frag(g.limitExpr, ctx)} OFFSET ${frag(o.offsetExpr, ctx)}"
        case l: LocalLimit =>
          s"${render(l.child, ctx)} LIMIT ${frag(g.limitExpr, ctx)}"
        case _ => throw new Unsupported("GlobalLimit without LocalLimit")
      }
    case o: Offset =>
      s"${render(o.child, ctx)} OFFSET ${frag(o.offsetExpr, ctx)}"
    case s: Sort if s.global =>
      s"${render(s.child, ctx)} ORDER BY ${s.order.map(sortFrag(_, ctx)).mkString(", ")}"
    case Distinct(u: Union) =>
      u.children.map(render(_, ctx)).mkString(" UNION ")
    case u: Union =>
      u.children.map(render(_, ctx)).mkString(" UNION ALL ")
    case i: Intersect =>
      val kw = if (i.isAll) "INTERSECT ALL" else "INTERSECT"
      s"${render(i.left, ctx)} $kw ${render(i.right, ctx)}"
    case e: Except =>
      val kw = if (e.isAll) "EXCEPT ALL" else "EXCEPT"
      s"${render(e.left, ctx)} $kw ${render(e.right, ctx)}"
    case Distinct(p: Project) =>
      selectBlock("SELECT DISTINCT", p.projectList, p.child, ctx)
    case p: Project =>
      selectBlock("SELECT", p.projectList, p.child, ctx)
    case h: UnresolvedHaving =>
      s"${render(h.child, ctx)} HAVING ${frag(h.havingCondition, ctx)}"
    case w: WithWindowDefinition =>
      // named WINDOW clause: the spec's span covers its parenthesized
      // definition; clause order (after the block, before ORDER BY) is
      // preserved because Sort renders above this node
      val defs = w.windowDefinitions.toSeq.map { case (name, spec) =>
        val body = slice(spec.origin, ctx.src).getOrElse(
          throw new Unsupported(s"window spec without span: $name"))
        s"$name AS $body"
      }
      s"${render(w.child, ctx)} WINDOW ${defs.mkString(", ")}"
    case a: Aggregate =>
      val base = selectBlock("SELECT", a.aggregateExpressions, a.child, ctx)
      if (a.groupingExpressions.isEmpty) base
      else s"$base ${groupByClause(a.groupingExpressions, ctx)}"
    case l: LocalRelation =>
      s"SELECT * FROM ${valuesSql(l)}"
    case other => throw new Unsupported(s"plan node ${other.nodeName}")
  }

  /** An inline VALUES table (the parser folds it to a [[LocalRelation]]
    * before any analysis, source spans lost) re-renders from the DATA:
    * each cell through [[org.apache.spark.sql.catalyst.expressions.Literal]]'s
    * own SQL rendering — the reference's ToSqlTest covers VALUES the
    * same way, from values not source text. */
  private def valuesSql(l: LocalRelation): String = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    if (l.data.isEmpty) throw new Unsupported("empty VALUES relation")
    val rows = l.data.map { row =>
      l.output.zipWithIndex.map { case (a, i) =>
        Literal(row.get(i, a.dataType), a.dataType).sql
      }.mkString("(", ", ", ")")
    }.mkString(", ")
    s"VALUES $rows AS __values(${l.output.map(a => s"`${a.name}`").mkString(", ")})"
  }

  /** GROUP BY — ROLLUP/CUBE/GROUPING SETS frags arrive with the clause
    * keywords already inside the span (the parser originates the
    * grouping-analytics node at the clause), so a fragment that already
    * says GROUP BY is the whole clause verbatim. */
  private def groupByClause(groups: Seq[Expression], ctx: Ctx): String = {
    val frags = groups.map { g =>
      slice(g.origin, ctx.src).getOrElse(frag(g, ctx))
    }
    frags match {
      case Seq(one) if one.toUpperCase.startsWith("GROUP BY") => one
      case _ =>
        // plain grouping expressions re-validate like any other fragment
        s"GROUP BY ${groups.map(frag(_, ctx)).mkString(", ")}"
    }
  }

  private def selectBlock(
      prefix: String, list: Seq[Expression], child: LogicalPlan, ctx: Ctx): String = {
    val items = list.map(selectItem(_, ctx)).mkString(", ")
    val (rel, where) = child match {
      // UNPIVOT plants a span-less null filter over its value column;
      // re-parsing the regenerated UNPIVOT clause replants it
      case f @ Filter(_, u: Unpivot) if isImplicitUnpivotFilter(f.condition, u) =>
        (u, "")
      case f: Filter => (f.child, s" WHERE ${frag(f.condition, ctx)}")
      case r => (r, "")
    }
    val from = fromClause(rel, ctx)
    s"$prefix $items$from$where"
  }

  private def isImplicitUnpivotFilter(cond: Expression, u: Unpivot): Boolean =
    cond match {
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(c) =>
        val names = c.collect {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
        }
        names.nonEmpty && names.forall(u.valueColumnNames.contains)
      case _ => false
    }

  /** A projection item must keep its alias: when the validated fragment
    * came from a child span (alias-wrapper span was bogus), re-attach
    * the alias structurally. */
  private def selectItem(e: Expression, ctx: Ctx): String = e match {
    case a: Alias =>
      val f = frag(a, ctx)
      val carriesAlias =
        try canon(ctx.parser.parseExpression(f)) == canon(a)
        catch { case _: Exception => false }
      if (carriesAlias) f else s"$f AS `${a.name}`"
    case other => frag(other, ctx)
  }

  private def fromClause(rel: LogicalPlan, ctx: Ctx): String = rel match {
    case _: OneRowRelation => ""
    case r => s" FROM ${relation(r, ctx)}"
  }

  private def relation(r: LogicalPlan, ctx: Ctx): String = r match {
    case u: UnresolvedRelation => u.multipartIdentifier.mkString(".")
    case SubqueryAlias(id, u: UnresolvedRelation) =>
      s"${u.multipartIdentifier.mkString(".")} AS ${id.name}"
    case SubqueryAlias(id, u: UnresolvedSubqueryColumnAliases) =>
      s"(${render(u.child, ctx)}) AS ${id.name}(${u.outputColumnNames.mkString(", ")})"
    case l: LocalRelation => valuesSql(l)
    case SubqueryAlias(id, l: LocalRelation) =>
      s"(SELECT * FROM ${valuesSql(l)}) AS ${id.name}"
    case SubqueryAlias(id, child) =>
      s"(${render(child, ctx)}) AS ${id.name}"
    case g: Generate =>
      // LATERAL VIEW: the generator call renders structurally (its node
      // class differs from a re-parsed function call, so whole-call
      // validation can't apply) from per-argument validated fragments;
      // the table/column aliases come from the plan
      val call = g.generator match {
        case ug: org.apache.spark.sql.catalyst.analysis.UnresolvedGenerator =>
          s"${ug.name.funcName}(${ug.children.map(frag(_, ctx)).mkString(", ")})"
        case other => frag(other, ctx)
      }
      val outer = if (g.outer) " OUTER" else ""
      val alias = g.qualifier.map(q => s" $q").getOrElse("")
      val cols =
        if (g.generatorOutput.isEmpty) ""
        else s" AS ${g.generatorOutput.map(_.name).mkString(", ")}"
      s"${relation(g.child, ctx)} LATERAL VIEW$outer $call$alias$cols"
    case j: Join => joinTree(j, ctx)
    case p: Pivot if p.groupByExprsOpt.isEmpty =>
      val aggs = p.aggregates.map(selectItem(_, ctx)).mkString(", ")
      val vals = p.pivotValues.map(selectItem(_, ctx)).mkString(", ")
      // the FOR column's span is parser-lost; an attribute renders by name
      val pc = p.pivotColumn match {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
        case other => frag(other, ctx)
      }
      s"${relation(p.child, ctx)} PIVOT ($aggs FOR $pc IN ($vals))"
    case u: Unpivot =>
      (u.values, u.valueColumnNames) match {
        case (Some(vals), Seq(valueCol)) if vals.forall(_.size == 1) =>
          val ins = vals.zip(u.aliases.getOrElse(vals.map(_ => None))).map {
            case (Seq(v), alias) =>
              alias.map(a => s"${frag(v, ctx)} AS $a").getOrElse(frag(v, ctx))
            case other => throw new Unsupported(s"UNPIVOT value group $other")
          }
          s"${relation(u.child, ctx)} UNPIVOT ($valueCol FOR ${u.variableColumnName} IN (${ins.mkString(", ")}))"
        case _ => throw new Unsupported("multi-value UNPIVOT")
      }
    case lj: LateralJoin if lj.joinType == Inner && lj.condition.isEmpty =>
      s"${relation(lj.left, ctx)}, LATERAL ${relation(lj.right.plan, ctx)}"
    case other => throw new Unsupported(s"relation node ${other.nodeName}")
  }

  private def joinTree(j: Join, ctx: Ctx): String = {
    val left = relation(j.left, ctx)
    val right = j.right match {
      // parenthesize a right-nested join so re-parse keeps the tree shape
      case rj: Join => s"(${joinTree(rj, ctx)})"
      case r => relation(r, ctx)
    }
    j.joinType match {
      case UsingJoin(tpe, cols) =>
        s"$left ${typeKw(tpe)} $right USING (${cols.mkString(", ")})"
      case tpe =>
        val on = j.condition.map(c => s" ON ${frag(c, ctx)}").getOrElse("")
        s"$left ${typeKw(tpe)} $right$on"
    }
  }

  private def typeKw(t: JoinType): String = t match {
    case Inner => "JOIN"
    case Cross => "CROSS JOIN"
    case LeftOuter => "LEFT JOIN"
    case RightOuter => "RIGHT JOIN"
    case FullOuter => "FULL JOIN"
    case LeftSemi => "LEFT SEMI JOIN"
    case LeftAnti => "LEFT ANTI JOIN"
    case other => throw new Unsupported(s"join type $other")
  }
}
