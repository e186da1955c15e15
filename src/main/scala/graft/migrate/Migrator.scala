package graft.migrate

import graft.model._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, SubqueryAlias}

/** Migration tooling (reference: core/migrator.py via `sidemantic migrate
  * generate/check` in cli.py): analyze a corpus of raw SQL queries for
  * semantic-layer coverage, and generate model definitions from the
  * observed query patterns. The reference parses with sqlglot; here the
  * queries go through Spark's own Catalyst parser, so anything Spark SQL
  * accepts is analyzable.
  *
  * Scope mirrors the reference's core loop: tables → models, GROUP BY
  * columns → dimensions (DATE_TRUNC grains → time dimensions at the
  * finest observed grain), aggregate calls → metrics (query alias
  * preferred for the name), equi-join conditions → many_to_one
  * relationships, and a coverage check of each query against an existing
  * [[Catalog]] flagging missing models / dimensions / metrics.
  */
object Migrator {

  /** agg-function spellings we can lift to a semantic metric
    * (reference: migrator.py _AGG_NAME_MAP). */
  private val AggNames = Map(
    "sum" -> "sum", "avg" -> "avg", "mean" -> "avg", "count" -> "count",
    "min" -> "min", "max" -> "max", "median" -> "median",
    "stddev" -> "stddev", "stddev_samp" -> "stddev", "stddev_pop" -> "stddev_pop",
    "variance" -> "variance", "var_samp" -> "variance", "var_pop" -> "variance_pop",
    "approx_count_distinct" -> "approx_count_distinct")

  private val GrainOrder = Seq("second", "minute", "hour", "day", "week",
    "month", "quarter", "year")

  final case class Agg(agg: String, column: String, table: String,
      alias: Option[String])

  final case class QueryAnalysis(
      query: String,
      tables: Set[String] = Set.empty,
      aggregations: Seq[Agg] = Nil,
      groupByColumns: Set[(String, String)] = Set.empty, // (table, col)
      timeDimensions: Seq[(String, String, String)] = Nil, // (table, col, grain)
      relationships: Seq[(String, String, String, String)] = Nil, // (from, to, fk, pk)
      missingModels: Set[String] = Set.empty,
      missingDimensions: Set[(String, String)] = Set.empty,
      missingMetrics: Set[(String, String, String)] = Set.empty, // (model, agg, col)
      parseError: Option[String] = None) {
    def success: Boolean = parseError.isEmpty
    def canRewrite: Boolean = success && tables.nonEmpty &&
      missingModels.isEmpty && missingDimensions.isEmpty && missingMetrics.isEmpty
  }

  final case class MigrationReport(analyses: Seq[QueryAnalysis]) {
    def totalQueries: Int = analyses.size
    def parseableQueries: Int = analyses.count(_.success)
    def rewritableQueries: Int = analyses.count(_.canRewrite)
    def missingModels: Set[String] = analyses.flatMap(_.missingModels).toSet
    def missingDimensions: Map[String, Set[String]] =
      analyses.flatMap(_.missingDimensions).groupBy(_._1)
        .map { case (m, xs) => m -> xs.map(_._2).toSet }
    def missingMetrics: Map[String, Set[(String, String)]] =
      analyses.flatMap(_.missingMetrics).groupBy(_._1)
        .map { case (m, xs) => m -> xs.map(x => (x._2, x._3)).toSet }
    def coveragePercentage: Double =
      if (analyses.isEmpty) 0.0 else 100.0 * rewritableQueries / totalQueries
  }

  /** Split SQL text on statement-separating semicolons (string-literal
    * and comment aware — reference: migrator.py split_sql_statements). */
  def splitSqlStatements(content: String): Seq[String] = {
    var out = Vector.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < content.length) {
      val c = content(i)
      if (c == '\'' || c == '"' || c == '`') {
        cur.append(c); i += 1
        while (i < content.length && content(i) != c) {
          if (content(i) == '\\' && i + 1 < content.length) {
            cur.append(content(i)).append(content(i + 1)); i += 2
          } else { cur.append(content(i)); i += 1 }
        }
        if (i < content.length) { cur.append(c); i += 1 }
      } else if (c == '-' && i + 1 < content.length && content(i + 1) == '-') {
        while (i < content.length && content(i) != '\n') { cur.append(content(i)); i += 1 }
      } else if (c == ';') { out :+= cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    if (cur.toString.trim.nonEmpty) out :+= cur.toString
    out.map(_.trim).filter(_.nonEmpty)
  }

  /** Does column `col` look like a foreign key INTO `table`? True when the
    * column's core name (suffixes id/key stripped, last underscore segment)
    * prefixes the table name — e.g. `o_custkey` / `cust_id` vs `customer`. */
  private[migrate] def fkNameMatch(col: String, table: String): Boolean = {
    val c = col.toLowerCase
    val base = c.stripSuffix("_id").stripSuffix("_key")
      .stripSuffix("id").stripSuffix("key")
    val core = base.split('_').filter(_.nonEmpty).lastOption.getOrElse("")
    val t = table.toLowerCase
    val tCore = t.stripSuffix("s")
    // both cores need >= 3 chars: a 1-2 char (or empty) table core would
    // prefix-match nearly any column and fabricate fk directions
    core.length >= 3 &&
      (t.startsWith(core) || (tCore.length >= 3 && core.startsWith(tCore)))
  }

  // ------------------------------------------------------------------
  // analysis
  // ------------------------------------------------------------------

  def analyzeQueries(queries: Seq[String], cat: Catalog = Catalog()): MigrationReport =
    MigrationReport(queries.map(analyzeQuery(_, cat)))

  def analyzeQuery(query: String, cat: Catalog = Catalog()): QueryAnalysis = {
    val plan =
      try CatalystSqlParser.parsePlan(query)
      catch {
        case e: Exception =>
          return QueryAnalysis(query, parseError = Some(e.getMessage))
      }

    // table registry: alias → table, plus the bare table names
    var aliases = Map.empty[String, String]
    var tables = Vector.empty[String] // in FROM order; head = main table
    plan.foreach {
      case SubqueryAlias(ident, ur: UnresolvedRelation)
          if ur.multipartIdentifier.size == 1 =>
        aliases += (ident.name.toLowerCase -> ur.multipartIdentifier.head)
      case ur: UnresolvedRelation if ur.multipartIdentifier.size == 1 =>
        if (!tables.contains(ur.multipartIdentifier.head))
          tables :+= ur.multipartIdentifier.head
      case _ => ()
    }
    val mainTable = tables.headOption // TreeNode.foreach is pre-order, so the
    // FROM (left-most) relation is visited first; unqualified columns and
    // count(*) in a join query belong to it, not to the last-joined dim
    def tableOf(ua: UnresolvedAttribute): Option[String] =
      if (ua.nameParts.size > 1)
        aliases.get(ua.nameParts.head.toLowerCase)
          .orElse(tables.find(_.equalsIgnoreCase(ua.nameParts.head)))
      else mainTable

    var aggs = Vector.empty[Agg]
    var groupBy = Set.empty[(String, String)]
    var timeDims = Vector.empty[(String, String, String)]
    var rels = Vector.empty[(String, String, String, String)]

    def liftAgg(e: Expression, alias: Option[String]): Unit = e match {
      case f: UnresolvedFunction if f.nameParts.size == 1 =>
        val name = f.nameParts.head.toLowerCase
        val agg =
          if (name == "count" && f.isDistinct) Some("count_distinct")
          else AggNames.get(name).filterNot(_ => f.isDistinct)
        agg.foreach { a =>
          f.arguments match {
            case Seq(ua: UnresolvedAttribute) =>
              tableOf(ua).foreach(t =>
                aggs :+= Agg(a, ua.nameParts.last, t, alias))
            case Seq(_: UnresolvedStar) | Seq(Literal(_, _)) | Nil if a == "count" =>
              mainTable.foreach(t => aggs :+= Agg("count", "*", t, alias))
            case _ => () // composite argument — out of lift scope
          }
        }
      case _ => ()
    }

    plan.foreach {
      case ag: Aggregate =>
        ag.aggregateExpressions.foreach {
          case Alias(child, name) => liftAgg(child, Some(name))
          case org.apache.spark.sql.catalyst.analysis.UnresolvedAlias(child, _) =>
            liftAgg(child, None)
          case other => liftAgg(other, None)
        }
        ag.groupingExpressions.foreach {
          case ua: UnresolvedAttribute =>
            tableOf(ua).foreach(t => groupBy += (t -> ua.nameParts.last))
          case f: UnresolvedFunction
              if f.nameParts.last.equalsIgnoreCase("date_trunc") =>
            f.arguments match {
              case Seq(Literal(g, _), ua: UnresolvedAttribute) =>
                tableOf(ua).foreach(t =>
                  timeDims :+= ((t, ua.nameParts.last, g.toString.toLowerCase)))
              case _ => ()
            }
          case _ => ()
        }
      case j: Join =>
        j.condition.foreach(_.foreach {
          case org.apache.spark.sql.catalyst.expressions.EqualTo(
              l: UnresolvedAttribute, r: UnresolvedAttribute) =>
            (tableOf(l), tableOf(r)) match {
              case (Some(lt), Some(rt)) if lt != rt =>
                // fk side heuristic: the column named like the OTHER table's
                // key (cust_id / custkey vs table "customer") sits on the fk
                // (many) side; when only the RIGHT column matches the LEFT
                // table's naming, the relationship runs right -> left.
                // Ambiguous (both match) defaults to left=fk; when NEITHER
                // column looks key-like (e.g. ON a.status = b.state) the
                // equality is not evidence of a relationship — emit nothing.
                val lc = l.nameParts.last
                val rc = r.nameParts.last
                val leftLooks = fkNameMatch(lc, rt)
                val rightLooks = fkNameMatch(rc, lt)
                if (rightLooks && !leftLooks)
                  rels :+= ((rt, lt, rc, lc))
                else if (leftLooks)
                  rels :+= ((lt, rt, lc, rc))
              case _ => ()
            }
          case _ => ()
        })
      case _ => ()
    }

    // ---- coverage vs the existing catalog ----
    val tableToModel: Map[String, String] = cat.models.values.flatMap { m =>
      m.source match {
        case ModelSource.Table(t) => Seq(t -> m.name)
        case ModelSource.Parquet(p) =>
          val base = p.split('/').last.stripSuffix(".parquet")
          Seq(base -> m.name)
        case _ => Nil
      }
    }.toMap ++ cat.models.keys.map(n => n -> n)

    val missingModels = tables.filterNot(tableToModel.contains).toSet
    def modelOf(t: String): Option[Model] =
      tableToModel.get(t).flatMap(cat.models.get)
    def hasDim(m: Model, colName: String): Boolean =
      m.dimensions.exists(dd =>
        dd.name.equalsIgnoreCase(colName) ||
          dd.sql.exists(_.equalsIgnoreCase(colName)))
    val missingDims = (groupBy ++ timeDims.map(td => (td._1, td._2)))
      .flatMap { case (t, colName) =>
        modelOf(t) match {
          case Some(m) if !hasDim(m, colName) => Some(tableToModel(t) -> colName)
          case _ => None
        }
      }
    val missingMets = aggs.flatMap { a =>
      modelOf(a.table) match {
        case Some(m) =>
          val covered = m.metrics.exists { met =>
            met.agg.contains(a.agg) && (a.column == "*" ||
              met.sql.exists(_.toLowerCase.contains(a.column.toLowerCase)) ||
              (met.sql.isEmpty && a.agg == "count"))
          }
          if (covered) None else Some((tableToModel(a.table), a.agg, a.column))
        case None => None // already a missing model
      }
    }.toSet

    QueryAnalysis(query, tables.toSet, aggs, groupBy, timeDims, rels,
      missingModels, missingDims, missingMets)
  }

  // ------------------------------------------------------------------
  // model generation (reference: migrator.py generate_models)
  // ------------------------------------------------------------------

  def generateModels(report: MigrationReport,
      resolve: String => ModelSource = ModelSource.Table.apply): Seq[Model] = {
    val ok = report.analyses.filter(_.success)
    val tables = ok.flatMap(_.tables).distinct.sorted
    tables.map { t =>
      val dims = ok.flatMap(_.groupByColumns).filter(_._1 == t).map(_._2).distinct
      val tds = ok.flatMap(_.timeDimensions).filter(_._1 == t)
        .groupBy(_._2).map { case (colName, xs) =>
          // keep the FINEST observed grain so coarser queries still roll up
          colName -> xs.map(_._3).minBy(g =>
            GrainOrder.indexOf(g) match { case -1 => Int.MaxValue; case i => i })
        }
      val aggsHere = ok.flatMap(_.aggregations).filter(_.table == t)
        .distinctBy(a => (a.agg, a.column))
      val rels = ok.flatMap(_.relationships).filter(_._1 == t)
        .map { case (_, to, fk, pk) =>
          Relationship(to = to, relType = "many_to_one",
            foreignKey = Seq(fk), primaryKey = Seq(pk))
        }.distinct
      Model(
        name = t,
        source = resolve(t),
        dimensions =
          dims.filterNot(tds.contains).map(c => Dimension(c)) ++
            tds.toSeq.sorted.map { case (c, g) =>
              Dimension(c, DimType.Time, granularity = Some(g)) },
        metrics = aggsHere.map { a =>
          val name = a.alias.getOrElse(
            if (a.column == "*") s"${t}_count" else s"${a.agg}_${a.column}")
          Metric(name, agg = Some(a.agg),
            sql = if (a.column == "*") None else Some(a.column))
        },
        relationships = rels)
    }
  }
}
