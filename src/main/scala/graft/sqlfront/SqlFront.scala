package graft.sqlfront

import graft.gen.Generator
import graft.model.Catalog
import graft.plan.{FieldRef, SemanticQuery}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedHaving, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, SortOrder, Ascending}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Semantic SQL front end: rewrites SQL that references semantic models
  * (`SELECT orders.revenue, customer.mktsegment FROM orders …`) into
  * planner queries, passes non-semantic SQL through untouched
  * (reference: sql/query_rewriter.py:170-298).
  *
  * Parsing uses Spark's own SQL parser — no second grammar. A SELECT
  * scope is semantic when its FROM names a registered model; select items
  * are metric/dimension references by name (the semantic-SQL contract),
  * WHERE/HAVING conditions route through the planner's pushdown/HAVING
  * classifier, GROUP BY (when present) must echo the dimensions exactly
  * (reference: query_rewriter.py:2572-2614). UNION/INTERSECT/EXCEPT
  * rewrite each branch independently.
  */
final class SqlFront(spark: SparkSession, cat: Catalog, gen: Generator) {

  def sql(text: String): DataFrame = {
    val plan = GraftSqlBridge.parser(spark).parsePlan(text)
    rewrite(plan).getOrElse(spark.sql(text))
  }

  /** Strict variant: error instead of passthrough when the SQL does not
    * reference any semantic model. */
  def sqlStrict(text: String): DataFrame = {
    val plan = GraftSqlBridge.parser(spark).parsePlan(text)
    rewrite(plan).getOrElse(throw new IllegalArgumentException(
      s"SQL does not reference a semantic model: $text"))
  }

  // ------------------------------------------------------------------

  /** Plan-level entry for the analyzer-rule integration: Some(df) when the
    * plan is a semantic scope this front end understands. */
  def rewritePlan(plan: LogicalPlan): Option[DataFrame] = rewrite(plan)

  /** True when any relation in the plan names a semantic model. */
  def referencesSemanticModel(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case ur: UnresolvedRelation
          if ur.multipartIdentifier.size == 1 &&
            cat.models.contains(ur.multipartIdentifier.head) => ()
    }.isDefined

  private def rewrite(plan: LogicalPlan): Option[DataFrame] = plan match {
    case d: Distinct => d.child match {
      case u: Union => branchFrames(u).map(_.distinct())
      case _        => single(plan)
    }
    case u: Union => branchFrames(u)
    case i: Intersect =>
      for (lf <- rewrite(i.left); rf <- rewrite(i.right))
        yield if (i.isAll) lf.intersectAll(rf) else lf.intersect(rf)
    case e: Except =>
      for (lf <- rewrite(e.left); rf <- rewrite(e.right))
        yield if (e.isAll) lf.exceptAll(rf) else lf.except(rf)
    case other => single(other)
  }

  private def branchFrames(u: Union): Option[DataFrame] = {
    val frames = u.children.map(rewrite)
    if (frames.exists(_.isEmpty)) None
    else Some(frames.flatten.reduce(_ union _))
  }

  /** One SELECT scope → SemanticQuery. */
  private def single(plan: LogicalPlan): Option[DataFrame] = {
    var limit: Option[Int] = None
    var offset: Option[Int] = None
    var sorts: Seq[SortOrder] = Nil
    var cur = plan

    var unwrapping = true
    while (unwrapping) cur match {
      case gl: GlobalLimit =>
        limit = Some(gl.limitExpr.eval().asInstanceOf[Number].intValue())
        cur = gl.child
      case ll: LocalLimit => cur = ll.child
      case o: Offset =>
        offset = Some(o.offsetExpr.eval().asInstanceOf[Number].intValue())
        cur = o.child
      case s: Sort if s.global => sorts = s.order; cur = s.child
      case _ => unwrapping = false
    }

    var having: Seq[String] = Nil
    cur match {
      case h: UnresolvedHaving =>
        having = Seq(h.havingCondition.sql); cur = h.child
      case _ => ()
    }

    val (items, groupBy, src0) = cur match {
      case p: Project   => (p.projectList, None, p.child)
      case a: Aggregate => (a.aggregateExpressions, Some(a.groupingExpressions), a.child)
      case _ => return None
    }

    var filters: Seq[String] = having
    var src = src0
    var filtering = true
    while (filtering) src match {
      case f: Filter        => filters :+= f.condition.sql; src = f.child
      case sa: SubqueryAlias => src = sa.child
      case _ => filtering = false
    }

    val modelName = src match {
      case ur: UnresolvedRelation if ur.multipartIdentifier.size == 1 =>
        ur.multipartIdentifier.head
      case _ => return None
    }
    if (!cat.models.contains(modelName)) return None
    val model = cat.model(modelName)

    // classify select items: metric vs dimension references by name
    var metrics = Seq.empty[String]
    var dims = Seq.empty[String]
    var renames = Seq.empty[(String, String)]
    items.foreach { item =>
      val (e, alias) = item match {
        case UnresolvedAlias(child, _) => (child, None)
        case a @ Alias(child, name)    => (child, Some(name))
        case other                     => (other: Expression, None)
      }
      val ref = e match {
        case ua: UnresolvedAttribute if ua.nameParts.size == 2 =>
          s"${ua.nameParts.head}.${ua.nameParts(1)}"
        case ua: UnresolvedAttribute if ua.nameParts.size == 1 =>
          s"$modelName.${ua.nameParts.head}"
        case _ => throw new IllegalArgumentException(
          s"Semantic SQL select items must be metric/dimension references, got: ${e.sql}")
      }
      val fr = FieldRef.parse(ref)
      val owner = cat.model(fr.model)
      if (owner.metric(fr.field).isDefined ||
        (fr.model == "" && cat.graphMetrics.contains(fr.field))) {
        metrics :+= ref
        alias.foreach(a => renames :+= (fr.field, a))
      } else if (owner.dimension(fr.field).isDefined) {
        dims :+= ref
        alias.foreach(a => renames :+= (fr.outName, a))
      } else throw new IllegalArgumentException(
        s"'$ref' is neither a metric nor a dimension of '${fr.model}'")
    }

    // GROUP BY, when written out, must echo the dimensions exactly
    groupBy.filter(_.nonEmpty).foreach { g =>
      val groupRefs = g.map {
        case ua: UnresolvedAttribute => ua.nameParts.takeRight(2).mkString(".")
        case other => throw new IllegalArgumentException(
          s"GROUP BY must reference dimensions, got: ${other.sql}")
      }.map(r => if (r.contains(".")) r else s"$modelName.$r").toSet
      val dimSet = dims.map(d => FieldRef.parse(d))
        .map(fr => s"${fr.model}.${fr.field}${fr.grain.map("__" + _).getOrElse("")}").toSet
      require(groupRefs == dimSet,
        s"GROUP BY ${groupRefs.mkString(",")} must echo the selected dimensions ${dimSet.mkString(",")}")
    }

    // ORDER BY may use select aliases — translate back to planner names
    val aliasToName = renames.map { case (orig, a) => a -> orig }.toMap
    val orderBy = sorts.map { so =>
      val name = so.child match {
        case ua: UnresolvedAttribute =>
          aliasToName.getOrElse(ua.nameParts.last, ua.nameParts.last)
        case other => throw new IllegalArgumentException(
          s"ORDER BY must reference output columns, got: ${other.sql}")
      }
      if (so.direction == Ascending) name else s"-$name"
    }

    val q = SemanticQuery(metrics = metrics, dimensions = dims,
      filters = filters, orderBy = orderBy, limit = limit, offset = offset)
    val df = gen.plan(q)
    Some(renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  }
}
