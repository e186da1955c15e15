package graft.preagg

import graft.functions.Exprs
import graft.model.{Catalog, Model, PreAggregation}
import graft.plan.{FieldRef, Grains, SemanticQuery}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Materialized rollup store: build, refresh, match, and route
  * (reference: core/pre_aggregation.py:35,135 materialization;
  * core/preagg_matcher.py:43-432 matching; sql/generator.py:6861-7217
  * routing).
  *
  * Rollups are partitioned Parquet keyed on a time bucket at
  * `partition_granularity`, so partition pruning applies when a routed
  * query filters on time — at 100 TB the rollup read is the point, and a
  * pruned read of a pre-aggregated table is orders of magnitude less IO
  * than the fact scan.
  *
  * Measures are stored as additive components (`m__sum`, `m__count`,
  * `m__min`, `m__max`) so coarser grains re-derive exactly: sum→Σsum,
  * count→Σcount, avg→Σsum/Σcount, min/max→min/max.
  */
final class PreAggStore(spark: SparkSession, cat: Catalog, basePath: String) {

  def rollupPath(model: String, pa: PreAggregation): String =
    s"$basePath/${model}_preagg_${pa.name}"

  /** A rollup exists when its directory holds parquet data — dynamic
    * partition overwrites don't leave a top-level _SUCCESS marker. */
  def rollupExists(path: String): Boolean = {
    val dir = new java.io.File(path)
    def hasParquet(f: java.io.File, depth: Int): Boolean =
      f.listFiles() != null && f.listFiles().exists { c =>
        (c.isFile && c.getName.endsWith(".parquet")) ||
          (c.isDirectory && depth > 0 && hasParquet(c, depth - 1))
      }
    dir.isDirectory && hasParquet(dir, 2)
  }

  // ------------------------------------------------------------------
  // Materialization
  // ------------------------------------------------------------------

  private def components(m: graft.model.Model, metricName: String): Seq[Column] = {
    val met = m.metric(metricName).getOrElse(throw new IllegalArgumentException(
      s"Unknown measure '$metricName' in pre-aggregation for '${m.name}'"))
    require(met.isSimple && met.filters.isEmpty,
      s"Pre-aggregation measures must be unfiltered simple aggregates: '$metricName'")
    val in = met.sql.map(sql => Exprs.column(spark, sql)).getOrElse(lit(1L))
    met.agg.get match {
      case "sum"   => Seq(sum(in).as(s"${metricName}__sum"))
      case "count" => Seq(count(in).as(s"${metricName}__count"))
      case "avg"   => Seq(sum(in).as(s"${metricName}__sum"),
                          count(in).as(s"${metricName}__count"))
      case "min"   => Seq(min(in).as(s"${metricName}__min"))
      case "max"   => Seq(max(in).as(s"${metricName}__max"))
      case other => throw new IllegalArgumentException(
        s"Measure '$metricName': agg '$other' is not additively derivable " +
          "from a rollup (count_distinct/median/stddev need the raw rows)")
    }
  }

  private def dimCol(m: Model, dim: String): Column =
    Exprs.column(spark, m.dimension(dim).get.expr).as(dim)

  private def timeCols(m: Model, pa: PreAggregation): Seq[Column] =
    pa.timeDimension.toSeq.flatMap { td =>
      val grain = pa.granularity.getOrElse("day")
      val base = Exprs.column(spark, m.dimension(td).get.expr)
      val bucket = date_trunc(grain, base).as(s"${td}__$grain")
      pa.partitionGranularity match {
        case Some(pg) => Seq(bucket,
          date_format(date_trunc(pg, base), "yyyy-MM-dd").as("__part"))
        case None => Seq(bucket)
      }
    }

  /** Rollup aggregation of an arbitrary frame of the model's rows —
    * shared by batch materialization and streaming maintenance. */
  private[graft] def rollupOf(m: Model, pa: PreAggregation,
      df: DataFrame): DataFrame = {
    val dims = pa.dimensions.map(d => dimCol(m, d)) ++ timeCols(m, pa)
    val aggs = pa.measures.flatMap(components(m, _)) :+ count(lit(1L)).as("__rows")
    df.groupBy(dims: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two component frames additively (Σsum, Σcount, min, max) —
    * legal because every stored measure is decomposable. */
  private[graft] def mergeComponents(pa: PreAggregation, m: Model,
      frames: DataFrame): DataFrame = {
    val keyCols = frames.columns.filterNot(c =>
      c.contains("__sum") || c.contains("__count") || c.contains("__min") ||
        c.contains("__max") || c == "__rows")
    val aggs = frames.columns.filterNot(keyCols.contains).map { c =>
      if (c.contains("__min")) min(col(c)).as(c)
      else if (c.contains("__max")) max(col(c)).as(c)
      else sum(col(c)).as(c)
    }.toSeq
    frames.groupBy(keyCols.map(col).toSeq: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Full rebuild: one aggregated write, partitioned on the time bucket. */
  def materialize(modelName: String, pa: PreAggregation): String = {
    val m = cat.model(modelName)
    val rollup = rollupOf(m, pa, cat.scan(spark, m))
    val path = rollupPath(modelName, pa)
    val writer = rollup.write.mode("overwrite")
    (if (pa.partitionGranularity.isDefined) writer.partitionBy("__part")
     else writer).parquet(path)
    path
  }

  /** Build only when the rollup doesn't exist yet (source data is
    * immutable per directory here; production refresh goes through
    * [[refreshIncremental]]). */
  def materializeIfAbsent(modelName: String, pa: PreAggregation): String = {
    val path = rollupPath(modelName, pa)
    if (rollupExists(path)) path else materialize(modelName, pa)
  }

  /** Incremental refresh: recompute only partitions at/after the watermark
    * (reference: _refresh_incremental, pre_aggregation.py:718-789). The
    * lookback re-covers late-arriving data inside the window. */
  def refreshIncremental(modelName: String, pa: PreAggregation,
      watermark: String, lookback: Int = 1): String = {
    val m = cat.model(modelName)
    val pg = pa.partitionGranularity.getOrElse(throw new IllegalArgumentException(
      "Incremental refresh needs partition_granularity"))
    val td = pa.timeDimension.get
    val base = Exprs.column(spark, m.dimension(td).get.expr)
    val cutoff = date_trunc(pg, lit(watermark).cast("timestamp")) -
      expr(s"INTERVAL $lookback ${pg.toUpperCase}")
    val rollup = rollupOf(m, pa, cat.scan(spark, m).filter(base >= cutoff))
    val path = rollupPath(modelName, pa)
    // dynamic partition overwrite replaces only the recomputed buckets
    rollup.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__part").parquet(path)
    path
  }

  // ------------------------------------------------------------------
  // Matching (dimension subset / measure derivability / grain rollup /
  // filter-column availability — reference: preagg_matcher.py:120-378)
  // ------------------------------------------------------------------

  /** Grains a stored grain can roll up to via date_trunc. Week only comes
    * from day-or-finer (weeks cross month boundaries). */
  private def canRollup(stored: String, target: String): Boolean = {
    val fine = Seq("second", "minute", "hour", "day")
    if (stored == target) true
    else if (fine.contains(stored))
      Grains.All.indexOf(target) > Grains.All.indexOf(stored)
    else stored match {
      case "month"   => Seq("quarter", "year").contains(target)
      case "quarter" => Seq("year").contains(target)
      case _         => false
    }
  }

  private case class Match(model: Model, pa: PreAggregation, path: String,
      dims: Seq[FieldRef], filters: Seq[String])

  private def matchQuery(q: SemanticQuery): Option[Match] = {
    if (q.ungrouped || q.withTotals || q.segments.nonEmpty) return None
    val metricRefs = q.metrics.map(FieldRef.parse)
    val models = metricRefs.map(_.model).distinct
    if (models.size != 1) return None
    val m = cat.models.getOrElse(models.head, return None)
    val metrics = metricRefs.map(r => m.metric(r.field).getOrElse(return None))
    if (!metrics.forall(met => met.isSimple && met.filters.isEmpty &&
      met.nonAdditive.isEmpty &&
      Seq("sum", "count", "avg", "min", "max").contains(met.agg.get))) return None

    val dims = q.dimensions.map(FieldRef.parse)
    if (dims.exists(_.model != m.name)) return None

    m.preAggregations.view.flatMap { pa =>
      val dimsOk = dims.forall { d =>
        if (pa.dimensions.contains(d.field) && d.grain.isEmpty) true
        else pa.timeDimension.contains(d.field) && d.grain.exists(g =>
          canRollup(pa.granularity.getOrElse("day"), g))
      }
      val measuresOk = q.metrics.map(FieldRef.parse(_).field)
        .forall(pa.measures.contains)
      // every filter conjunct must reference only rolled-up columns
      val filtersOk = q.filters.forall { f =>
        Exprs.refs(spark, Exprs.interpolate(f, q.parameters)).forall {
          case Seq(mm, fld) =>
            mm == m.name && {
              val (b, g) = fld.split("__") match {
                case Array(x, gg) if Grains.isGrain(gg) => (x, Some(gg))
                case _ => (fld, None)
              }
              pa.dimensions.contains(b) ||
                (pa.timeDimension.contains(b) && g.exists(gg =>
                  canRollup(pa.granularity.getOrElse("day"), gg)))
            }
          case _ => false
        }
      }
      val path = rollupPath(m.name, pa)
      if (dimsOk && measuresOk && filtersOk && rollupExists(path))
        Some(Match(m, pa, path, dims, q.filters))
      else None
    } // prefer the narrowest matching rollup (fewest stored dimensions)
      .toSeq.sortBy(mt => mt.pa.dimensions.size).headOption
  }

  /** Column in rollup scope for a query field ref. */
  private def rollupCol(mt: Match, field: String, grain: Option[String]): Column =
    grain match {
      case Some(g) =>
        val stored = s"${field}__${mt.pa.granularity.getOrElse("day")}"
        if (mt.pa.granularity.contains(g)) col(stored)
        else date_trunc(g, col(stored))
      case None => col(field)
    }

  /** Try to serve the query from a rollup. None = no usable rollup; the
    * caller falls back to the base-table plan (the reference's fallback-
    * with-recompile, semantic_layer.py:798-849). */
  def plan(q: SemanticQuery): Option[DataFrame] = matchQuery(q).map { mt =>
    var df = spark.read.parquet(mt.path)
    // rewrite query filters into rollup scope
    mt.filters.foreach { f =>
      val e = Exprs.rewriteRelativeDates(
        Exprs.parse(spark, Exprs.interpolate(f, q.parameters)), q.anchorDate)
      val rewritten = Exprs.rewriteAttrs(e) {
        case Seq(_, fld) => fld.split("__") match {
          case Array(b, g) if Grains.isGrain(g) =>
            Some(Exprs.truncExpr(g,
              UnresolvedAttribute(Seq(s"${b}__${mt.pa.granularity.getOrElse("day")}"))))
          case _ => Some(UnresolvedAttribute(Seq(fld)))
        }
        case _ => None
      }
      df = df.filter(Exprs.toColumn(rewritten))
    }
    val dimCols = mt.dims.map(d => rollupCol(mt, d.field, d.grain).as(d.outName))
    val aggCols = q.metrics.map { ref =>
      val name = FieldRef.parse(ref).field
      val met = mt.model.metric(name).get
      met.agg.get match {
        case "sum"   => sum(col(s"${name}__sum")).as(name)
        case "count" => sum(col(s"${name}__count")).as(name)
        case "avg"   => (sum(col(s"${name}__sum")).cast("double") /
                         sum(col(s"${name}__count")).cast("double")).as(name)
        case "min"   => min(col(s"${name}__min")).as(name)
        case "max"   => max(col(s"${name}__max")).as(name)
      }
    }
    var out =
      if (dimCols.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
      else df.groupBy(dimCols: _*).agg(aggCols.head, aggCols.tail: _*)
        .select(mt.dims.map(d => col(d.outName)) ++
          q.metrics.map(r => col(FieldRef.parse(r).field)): _*)
    if (q.orderBy.nonEmpty)
      out = out.orderBy(q.orderBy.map(o =>
        if (o.startsWith("-")) col(o.drop(1)).desc else col(o).asc): _*)
    q.offset.foreach(n => out = out.offset(n))
    q.limit.foreach(n => out = out.limit(n))
    out
  }
}
