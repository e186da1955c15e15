package graft.sqlfront

import graft.gen.Generator
import graft.model.Catalog
import graft.plan.{FieldRef, SemanticQuery}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedHaving, UnresolvedRelation, UnresolvedStar}
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

  /** Yardstick AS MEASURE mode rides the same front door: SEMANTIC /
    * AGGREGATE() / AT (…) SQL routes through [[Yardstick]] (whose AT
    * lowering must run before Spark's parser sees the text). */
  private lazy val yardstick = new Yardstick(spark, cat)

  def sql(text: String): DataFrame = {
    val yard =
      if (yardstick.handles(text)) yardstick.trySql(text) else None
    yard.getOrElse {
      val plan = GraftSqlBridge.parser(spark).parsePlan(text)
      rewrite(plan).getOrElse(spark.sql(text))
    }
  }

  /** Strict variant: error instead of passthrough when the SQL does not
    * reference any semantic model. */
  def sqlStrict(text: String): DataFrame = {
    val plan = GraftSqlBridge.parser(spark).parsePlan(text)
    rewrite(plan).getOrElse(throw new IllegalArgumentException(
      s"SQL does not reference a semantic model: $text"))
  }

  /** User attributes for semantic queries compiled inside a
    * [[transportSql]] call (deny-by-default: None outside one). */
  private val currentUser =
    new scala.util.DynamicVariable[Option[Map[String, String]]](None)

  /** Transport-grade entry with fail-closed security (reference:
    * core/transport_security.py rewrite_transport_sql, :96-182): when
    * any control is active ([[TransportSecurity.controlsAreActive]]),
    * SQL that cannot be PROVEN to route through the semantic layer is
    * refused before execution —
    *
    *  - sources that are not semantic models / `metrics` / local CTEs
    *  - expression subqueries (reads outside any securable scope)
    *  - Yardstick AS MEASURE text (that rewrite expands directly
    *    against model tables, transport_security.py:152-162)
    *  - semantic-looking SQL the rewriter nevertheless left untouched
    *
    * Projection-only SQL (`SELECT 1`) stays available. Pre-aggregation
    * routing is already bypassed for secured models inside the planner
    * itself (rollups are materialized without per-user row scope), so
    * the transport needs no extra preagg switch. With no controls
    * declared this is exactly [[sql]]. */
  def transportSql(text: String, transport: String = "sql_transport",
      user: Option[Map[String, String]] = None): DataFrame = {
    if (!TransportSecurity.controlsAreActive(cat))
      return currentUser.withValue(user) { sql(text) }
    if (yardstick.handles(text)) throw new SecurityException(
      s"$transport refused Yardstick semantic SQL while security controls " +
        "are active: the AS MEASURE rewrite expands directly against model " +
        "tables and cannot prove access gates, row filters, and column " +
        "restrictions were enforced. Use a structured query or standard " +
        "semantic SQL.")
    val plan = GraftSqlBridge.parser(spark).parsePlan(text)
    val unrec = TransportSecurity.unrecognizedSources(plan, cat)
    if (unrec.nonEmpty) throw new SecurityException(
      s"$transport refused non-semantic source(s) ${unrec.mkString(", ")}: " +
        "security controls are active, and reads outside the declared " +
        "models cannot carry the access gates, row filters, or hidden-" +
        "field rules. Reference declared model fields instead (or use the " +
        "structured API).")
    if (TransportSecurity.hasExpressionSubquery(plan))
      throw new SecurityException(
        s"$transport refused an expression subquery while security " +
          "controls are active: nested expression reads cannot prove " +
          "access gates, row filters, and column restrictions were " +
          "enforced. Rewrite as structured semantic filters or a " +
          "supported semantic join.")
    currentUser.withValue(user) {
      rewrite(plan).getOrElse {
        if (TransportSecurity.readsAnySource(plan))
          throw new SecurityException(
            s"$transport refused SQL the semantic rewriter left untouched: " +
              "with security controls active, a passthrough that reads any " +
              "relation cannot be shown to honor them. Reference declared " +
              "model fields instead (or use the structured API).")
        spark.sql(text)
      }
    }
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
    case w: UnresolvedWith => withCtes(w)
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
    case other => single(other).orElse(hybridSubqueries(other))
  }

  /** WITH query (reference: query_rewriter.py:917-1107): each CTE compiles
    * independently — semantic scopes through the planner, plain SQL (which
    * may reference earlier CTEs) through Spark — and registers as a temp
    * view under its own name; the main body then compiles in the same way.
    * Engaged only when something in the query is semantic, so pure-SQL WITH
    * queries pass through Spark untouched with no view side effects.
    *
    * The temp registrations are SCOPED, not a session side effect: any
    * pre-existing temp view a CTE name collides with is saved first and
    * restored after, and names this query introduced are dropped — a
    * query's `WITH orders_view AS …` must not shadow the user's session
    * state for every later query. Restoring after the final DataFrame is
    * built is sound because every compile path analyzes eagerly (the
    * views are inlined into the analyzed plan before the finally runs). */
  private def withCtes(w: UnresolvedWith): Option[DataFrame] = {
    val defs = w.cteRelations.map(_._2)
    val semantic = (w.child +: defs.map(_.child))
      .exists(p => referencesSemanticModel(p) || referencesMetricsTable(p))
    if (!semantic) return None
    val catalog = spark.sessionState.catalog
    val saved = w.cteRelations.map { case (name, _, _) =>
      name -> catalog.getRawTempView(name)
    }
    try {
      w.cteRelations.foreach { case (name, sa, _) =>
        val df = rewrite(sa.child)
          .getOrElse(GraftSqlBridge.dataFrame(spark, sa.child))
        df.createOrReplaceTempView(name)
      }
      Some(rewrite(w.child).getOrElse(GraftSqlBridge.dataFrame(spark, w.child)))
    } finally {
      saved.foreach {
        case (name, Some(prior)) =>
          catalog.createTempView(name, prior, overrideIfExists = true)
        case (name, None) => spark.catalog.dropTempView(name)
      }
    }
  }

  /** Subquery-in-FROM recursion: replace each aliased semantic sub-scope
    * with a temp view of its planned DataFrame, then run the remaining
    * (plain-SQL) outer shell through Spark. */
  private val subCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  private def hybridSubqueries(plan: LogicalPlan): Option[DataFrame] = {
    var views = List.empty[String]
    val replaced = plan.transformUp {
      case sa @ SubqueryAlias(ident, child) if single(child).isDefined =>
        val df = single(child).get
        val view = s"__graft_sub_${subCounter.incrementAndGet()}"
        df.createOrReplaceTempView(view)
        views ::= view
        SubqueryAlias(ident, UnresolvedRelation(Seq(view)))
    }
    if (views.isEmpty) None
    else
      // eager analysis inlines the scratch views; drop them so the
      // session catalog doesn't accumulate one per compiled subquery
      try Some(GraftSqlBridge.dataFrame(spark, replaced))
      finally views.foreach(spark.catalog.dropTempView)
  }

  private def referencesMetricsTable(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case ur: UnresolvedRelation
          if ur.multipartIdentifier == Seq("metrics") &&
            !cat.models.contains("metrics") => ()
    }.isDefined

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
    // `FROM metrics` is the cross-model virtual scope (reference:
    // query_rewriter.py:2616-2623): select items may reference ANY model's
    // fields (qualified) or graph-level metrics (bare); joins come from
    // the semantic graph exactly as in structured queries.
    val isMetricsScope = modelName == "metrics" && !cat.models.contains("metrics")
    if (!isMetricsScope && !cat.models.contains(modelName)) return None

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
      e match {
        case _: UnresolvedStar =>
          // SELECT * expands to every dimension + metric of the model
          // (reference: query_rewriter.py:5912-5935; refused on the
          // cross-model metrics scope there and here)
          if (isMetricsScope) throw new IllegalArgumentException(
            "SELECT * is not supported with FROM metrics; select fields explicitly")
          val model = cat.model(modelName)
          dims ++= model.dimensions.filter(_.public).map(d => s"$modelName.${d.name}")
          metrics ++= model.metrics.filter(m => m.public && m.kind != "conversion" &&
            m.kind != "retention" && m.kind != "cohort" && m.kind != "funnel")
            .map(m => s"$modelName.${m.name}")
        case ua: UnresolvedAttribute if ua.nameParts.size <= 2 =>
          val bare = ua.nameParts.size == 1
          val ref =
            if (!bare) s"${ua.nameParts.head}.${ua.nameParts(1)}"
            else if (isMetricsScope) ua.nameParts.head // graph metric
            else s"$modelName.${ua.nameParts.head}"
          if (!ref.contains(".")) {
            require(cat.graphMetrics.contains(ref), s"'$ref' is not a graph-level metric")
            metrics :+= ref
            alias.foreach(a => renames :+= (ref, a))
          } else {
            val fr = FieldRef.parse(ref)
            val owner = cat.model(fr.model)
            if (owner.metric(fr.field).isDefined) {
              metrics :+= ref
              alias.foreach(a => renames :+= (fr.field, a))
            } else if (owner.dimension(fr.field).isDefined) {
              dims :+= ref
              alias.foreach(a => renames :+= (fr.outName, a))
            } else throw new IllegalArgumentException(
              s"'$ref' is neither a metric nor a dimension of '${fr.model}'")
          }
        case _ => throw new IllegalArgumentException(
          s"Semantic SQL select items must be metric/dimension references, got: ${e.sql}")
      }
    }

    // GROUP BY, when written out, must echo the dimensions exactly
    // (bare names on the metrics scope resolve through the selected dims)
    val bareToDim = dims.map(d => FieldRef.parse(d))
      .map(fr => fr.field -> s"${fr.model}.${fr.field}").toMap
    groupBy.filter(_.nonEmpty).foreach { g =>
      val groupRefs = g.map {
        case ua: UnresolvedAttribute => ua.nameParts.takeRight(2).mkString(".")
        case other => throw new IllegalArgumentException(
          s"GROUP BY must reference dimensions, got: ${other.sql}")
      }.map(r => if (r.contains(".")) r
        else if (isMetricsScope) bareToDim.getOrElse(r, r)
        else s"$modelName.$r").toSet
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
      filters = filters, orderBy = orderBy, limit = limit, offset = offset,
      user = currentUser.value)
    val df = gen.plan(q)
    Some(renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  }
}
