package graft.load

import graft.model._
import org.yaml.snakeyaml.{DumperOptions, Yaml}

/** Native-format export: serialize a [[Catalog]] (or bare models) back to
  * version-1 YAML that [[YamlLoader]] reloads identically (reference:
  * `sidemantic export-native` in cli.py; docs/native-format.md). This is
  * the inverse direction of the 19 import adapters — import any format,
  * export native, and the semantic definitions become portable files.
  *
  * The writer emits only keys the loader reads, omits defaults, and the
  * round-trip contract (import → export → reload → equal models) is
  * pinned by YamlWriterSpec across the native fixture corpus, the TPC-H
  * catalog, and adapter imports.
  */
object YamlWriter {

  def write(models: Seq[Model]): String = dump(pkgMap(models, Nil, Nil))

  def writePackage(cat: Catalog): String = {
    val root = pkgMap(cat.models.values.toSeq.sortBy(_.name),
      cat.graphMetrics.values.toSeq.sortBy(_.name),
      cat.explores.values.toSeq.sortBy(_.name))
    if (cat.paramTypes.nonEmpty)
      root.put("parameters", jlist(cat.paramTypes.toSeq.sortBy(_._1).map {
        case (name, ptype) =>
          jmap(
            "name" -> name,
            "type" -> ptype,
            "default_value" -> cat.paramDefaults.get(name).map(unformat))
      }))
    dump(root)
  }

  def writeFile(cat: Catalog, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      writePackage(cat).getBytes("UTF-8"))

  // ------------------------------------------------------------------

  private def pkgMap(models: Seq[Model], graphMetrics: Seq[Metric],
      explores: Seq[Explore]): java.util.Map[String, Any] =
    jmap(
      "version" -> 1,
      "models" -> (if (models.isEmpty) None else jlist(models.map(modelMap))),
      "metrics" -> (if (graphMetrics.isEmpty) None
        else jlist(graphMetrics.map(metricMap))),
      "explores" -> (if (explores.isEmpty) None
        else jlist(explores.map(exploreMap))))

  private def modelMap(m: Model): java.util.Map[String, Any] = {
    val source: (String, Any) = m.source match {
      case ModelSource.Table(t)     => "table" -> t
      case ModelSource.SqlView(s)   => "sql" -> s
      case ModelSource.Parquet(p)   => "source_uri" -> p
    }
    val out = jmap(
      "name" -> m.name,
      source,
      "extends" -> m.extendsModel,
      "primary_key" -> strs(m.primaryKey),
      "default_time_dimension" -> m.defaultTimeDimension,
      "default_grain" -> m.defaultGrain,
      "dimensions" -> (if (m.dimensions.isEmpty) None
        else jlist(m.dimensions.map(dimensionMap))),
      "metrics" -> (if (m.metrics.isEmpty) None
        else jlist(m.metrics.map(metricMap))),
      "relationships" -> (if (m.relationships.isEmpty) None
        else jlist(m.relationships.map(relationshipMap))),
      "segments" -> (if (m.segments.isEmpty) None
        else jlist(m.segments.map(s => jmap(
          "name" -> s.name, "sql" -> s.sql,
          "public" -> (if (s.public) None else Some(false)))))),
      "pre_aggregations" -> (if (m.preAggregations.isEmpty) None
        else jlist(m.preAggregations.map(preAggMap))),
      "security" -> m.security.map(sec => jmap(
        "access" -> sec.access,
        "row_filters" -> strs(sec.rowFilters))),
      "freshness" -> m.freshness.map(freshnessMap))
    m.governance.foreach(g => governanceInto(g, out))
    out
  }

  private def freshnessMap(f: graft.model.Freshness): java.util.Map[String, Any] =
    jmap(
      "watermark" -> f.watermark,
      "sql" -> f.sql,
      "ttl_seconds" -> f.ttlSeconds)

  private def dimensionMap(d: Dimension): java.util.Map[String, Any] = jmap(
    "name" -> d.name,
    "type" -> (d.dimType match {
      case DimType.Time        => Some("time")
      case DimType.Bool        => Some("boolean")
      case DimType.Numeric     => Some("numeric")
      case DimType.Categorical => None // loader default
    }),
    "sql" -> d.sql,
    "granularity" -> d.granularity,
    "supported_granularities" -> strs(d.supportedGranularities),
    "label" -> d.label,
    "parent" -> d.parent,
    "public" -> (if (d.public) None else Some(false)))

  private def metricMap(met: Metric): java.util.Map[String, Any] = {
    val cohort = met.metricType.contains("cohort")
    val out = jmap(
      "name" -> met.name,
      "type" -> met.metricType,
      // the loader routes `agg` to outerAgg for cohort metrics
      "agg" -> (if (cohort) met.outerAgg else met.agg),
      "sql" -> met.sql,
      "filters" -> strs(met.filters),
      "fill_nulls_with" -> met.fillNullsWith,
      "label" -> met.label,
      "public" -> (if (met.public) None else Some(false)),
      "numerator" -> met.numerator,
      "denominator" -> met.denominator,
      "offset_window" -> met.offsetWindow,
      "base_metric" -> met.baseMetric,
      "window" -> met.window,
      "grain_to_date" -> met.grainToDate,
      "window_expression" -> met.windowExpression,
      "window_frame" -> met.windowFrame,
      "window_order" -> met.windowOrder,
      "window_domain" -> met.windowDomain,
      "comparison_type" -> met.comparison,
      "calculation" -> met.calculation,
      "steps" -> strs(met.steps),
      "entity" -> met.entity,
      "base_event" -> met.baseFilter,
      "conversion_event" -> met.conversionFilter,
      "conversion_window" -> met.conversionWindow,
      "periods" -> met.retentionPeriods,
      "retention_granularity" -> met.retentionGrain,
      "having" -> met.having,
      "entity_dimensions" -> strs(met.entityDimensions),
      "non_additive_dimension" -> met.nonAdditive.map(nad => jmap(
        "name" -> nad.name,
        "window_choice" -> (if (nad.windowChoice == "max") None
          else Some(nad.windowChoice)),
        "window_groupings" -> strs(nad.windowGroupings))))
    met.governance.foreach(g => governanceInto(g, out))
    out
  }

  private def relationshipMap(r: Relationship): java.util.Map[String, Any] = jmap(
    "name" -> r.to,
    "type" -> r.relType,
    "foreign_key" -> strs(r.foreignKey),
    "primary_key" -> strs(r.primaryKey),
    "through" -> r.through,
    "through_foreign_key" -> strs(r.throughForeignKey),
    "related_foreign_key" -> strs(r.relatedForeignKey),
    "sql" -> r.sqlOn)

  private def preAggMap(p: PreAggregation): java.util.Map[String, Any] = jmap(
    "name" -> p.name,
    "measures" -> strs(p.measures),
    "dimensions" -> strs(p.dimensions),
    "time_dimension" -> p.timeDimension,
    "granularity" -> p.granularity,
    "partition_granularity" -> p.partitionGranularity)

  private def exploreMap(e: Explore): java.util.Map[String, Any] = {
    val out = jmap(
      "name" -> e.name,
      "model" -> e.model,
      "label" -> e.label,
      "allowed_dimensions" -> e.allowedDimensions.map(l => jlist(l)),
      "allowed_metrics" -> e.allowedMetrics.map(l => jlist(l)),
      "allowed_filter_fields" -> e.allowedFilterFields.map(l => jlist(l)),
      "default_dimensions" -> strs(e.defaultDimensions),
      "default_metrics" -> strs(e.defaultMetrics),
      "filters" -> strs(e.filters),
      "default_filters" -> strs(e.defaultFilters),
      "default_order_by" -> strs(e.defaultOrderBy),
      "default_limit" -> e.defaultLimit,
      "max_limit" -> e.maxLimit,
      "freshness" -> e.freshness.map(freshnessMap))
    e.governance.foreach(g => governanceInto(g, out))
    out
  }

  /** Governance keys inline into a model/metric/explore map — the same
    * spelling parseGovernance reads. Emitting `visibility` even at its
    * default keeps an otherwise-empty Governance present on reload. */
  private def governanceInto(g: Governance,
      out: java.util.Map[String, Any]): Unit = {
    g.owner.foreach(out.put("owner", _))
    g.domain.foreach(out.put("domain", _))
    g.category.foreach(out.put("category", _))
    if (g.tags.nonEmpty) out.put("tags", jlist(g.tags))
    g.status.foreach(out.put("status", _))
    g.certification.foreach(out.put("certification", _))
    out.put("visibility", g.visibility)
    if (g.deprecationMessage.isDefined || g.replacedBy.isDefined)
      out.put("deprecation", jmap(
        "message" -> g.deprecationMessage,
        "replaced_by" -> g.replacedBy))
  }

  // ------------------------------------------------------------------

  /** Parameter defaults are stored pre-formatted ('it''s' quoting); undo
    * the string formatting so reload-time formatting is idempotent. */
  private def unformat(v: String): String =
    if (v.length >= 2 && v.head == '\'' && v.last == '\'')
      v.substring(1, v.length - 1).replace("''", "'").replace("\\\\", "\\")
    else v

  private def strs(l: Seq[String]): Option[java.util.List[Any]] =
    if (l.isEmpty) None else Some(jlist(l))

  private def jlist(l: Seq[Any]): java.util.List[Any] = {
    val out = new java.util.ArrayList[Any](l.size)
    l.foreach(out.add)
    out
  }

  private def jmap(entries: (String, Any)*): java.util.LinkedHashMap[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    entries.foreach { case (k, v) => v match {
      case None          => ()
      case Some(x)       => m.put(k, x)
      case other         => m.put(k, other)
    }}
    m
  }

  private def dump(root: java.util.Map[String, Any]): String = {
    val opts = new DumperOptions
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    opts.setIndent(2)
    opts.setWidth(100)
    new Yaml(opts).dump(root)
  }
}
