package graft.model

import graft.load.Fidelity

/** Structured semantic-graph metadata for UI / FFI consumers
  * (reference: core/introspection.py:14 `describe_graph`) — the
  * machine-readable catalog dump a front end renders as a field
  * picker: every model with its kind, source, keys, dimensions,
  * metrics, relationships and segments, plus graph-level metrics and
  * any import warnings. Pure driver-side metadata (no Spark jobs); the
  * document is a deterministic JSON string with keys in declaration
  * order, so goldens can pin it byte-for-byte.
  *
  * Mirrored reference semantics:
  *   - `modelNames` restricts to the requested models; graph metrics
  *     keep only those whose base metric's owner model is requested
  *     (or that have no owner model), `introspection.py:37-44`
  *   - `enforceVisibility` drops `public: false` dimensions, metrics
  *     and graph metrics (`introspection.py:56-57`), the view a
  *     non-privileged consumer gets
  *   - model `kind`: `derived_table` when the source is a SQL view,
  *     else `table` (`introspection.py:86-93`; the reference's
  *     `calculated_table` kind is a DAX-import artifact carried by its
  *     TMDL adapter — graft's TMDL import translates DAX at load, so
  *     the resulting model IS a derived table)
  *   - absent optionals AND empty collections are omitted — the
  *     reference's `_drop_none` (`introspection.py:330`) filters
  *     `item != []` too, so a model with no relationships has no
  *     `relationships` key at all. Two exceptions, mirroring the
  *     reference's `setdefault` at `introspection.py:150-151`: metric
  *     `filters` and `drill_fields` stay present as `[]` (downstream
  *     DTOs decode them as non-optional arrays). The top-level
  *     `models`/`metrics`/`import_warnings` keys are always present
  *     (`describe_graph` returns them without `_drop_none`).
  */
object Introspection {

  def describeGraph(catalog: Catalog, modelNames: Seq[String] = Nil,
      enforceVisibility: Boolean = false,
      importWarnings: Seq[Fidelity.Note] = Nil): String = {
    val requested = modelNames.toSet
    val models = catalog.models.values.toSeq.sortBy(_.name)
      .filter(m => requested.isEmpty || requested(m.name))
      .map(describeModel(_, enforceVisibility))
    val graphMetrics = catalog.graphMetrics.values.toSeq.sortBy(_.name)
      .filter(m => includeGraphMetric(m, requested))
      .filter(m => !enforceVisibility || m.public)
      .map(describeMetric(_, None))
    val warnings = importWarnings.map { n =>
      obj(Seq(
        "construct" -> Some(str(n.construct)),
        "detail" -> Some(str(n.detail)),
        "severity" -> Some(str(n.severity)),
        "source" -> n.source.map(str),
        "location" -> n.location.map(str)))
    }
    obj(Seq(
      "models" -> Some(arr(models)),
      "metrics" -> Some(arr(graphMetrics)),
      "import_warnings" -> Some(arr(warnings))))
  }

  /** A graph metric is in scope when no filter is given, when its base
    * metric's owner model is requested, or when it has no owner. */
  private def includeGraphMetric(m: Metric, requested: Set[String]): Boolean =
    requested.isEmpty || (metricOwnerModel(m) match {
      case Some(owner) => requested(owner)
      case None => true
    })

  private def metricOwnerModel(m: Metric): Option[String] =
    m.baseMetric.filter(_.contains("."))
      .map(_.split("\\.", 2)(0))

  private def describeModel(m: Model, enforceVisibility: Boolean): String = {
    val dims = m.dimensions.filter(d => !enforceVisibility || d.public)
    val mets = m.metrics.filter(x => !enforceVisibility || x.public)
    val (kind, table, sql) = m.source match {
      case ModelSource.Table(t) => ("table", Some(t), None)
      case ModelSource.Parquet(p) => ("table", Some(p), None)
      case ModelSource.SqlView(s) => ("derived_table", None, Some(s))
    }
    obj(Seq(
      "name" -> Some(str(m.name)),
      "kind" -> Some(str(kind)),
      "table" -> table.map(str),
      "sql" -> sql.map(str),
      "primary_key" -> arrOpt(m.primaryKey.map(str)),
      "dimensions" -> arrOpt(dims.map(describeDimension)),
      "metrics" -> arrOpt(mets.map(describeMetric(_, Some(m.name)))),
      "relationships" -> arrOpt(m.relationships.map(describeRelationship)),
      "segments" -> arrOpt(m.segments.map(s => str(s.name))),
      "default_time_dimension" -> m.defaultTimeDimension.map(str),
      "default_grain" -> m.defaultGrain.map(str)))
  }

  private def describeDimension(d: Dimension): String = obj(Seq(
    "name" -> Some(str(d.name)),
    "type" -> Some(str(d.dimType.toString.toLowerCase)),
    "sql" -> d.sql.map(str),
    "granularity" -> d.granularity.map(str),
    "supported_granularities" ->
      (if (d.supportedGranularities.isEmpty) None
       else Some(arr(d.supportedGranularities.map(str)))),
    "parent" -> d.parent.map(str),
    "label" -> d.label.map(str),
    "public" -> Some(d.public.toString)))

  private def describeMetric(m: Metric, modelName: Option[String]): String = obj(Seq(
    "name" -> Some(str(m.name)),
    "model" -> modelName.map(str),
    "agg" -> m.agg.map(str),
    "sql" -> m.sql.map(str),
    "type" -> Some(str(m.kind)),
    "base_metric" -> m.baseMetric.map(str),
    "comparison_type" -> m.comparison.map(str),
    "calculation" -> m.calculation.map(str),
    "window" -> m.window.map(str),
    "grain_to_date" -> m.grainToDate.map(str),
    "window_order" -> m.windowOrder.map(str),
    // filters/drill_fields stay present even when empty — the
    // reference setdefault()s them back after _drop_none because
    // downstream DTOs decode them as non-optional arrays
    "filters" -> Some(arr(m.filters.map(str))),
    "drill_fields" -> Some(arr(Nil)),
    "label" -> m.label.map(str),
    "public" -> Some(m.public.toString)))

  private def describeRelationship(r: Relationship): String = obj(Seq(
    "name" -> Some(str(r.to)),
    "type" -> Some(str(r.relType)),
    "foreign_key" -> arrOpt(r.foreignKey.map(str)),
    "primary_key" -> arrOpt(r.primaryKey.map(str)),
    "through" -> r.through.map(str),
    "sql_on" -> r.sqlOn.map(str)))

  // ---- minimal deterministic JSON rendering (declaration order) ----

  private def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def arr(items: Seq[String]): String =
    items.mkString("[", ",", "]")

  /** `_drop_none` list rule: an empty collection omits its key. */
  private def arrOpt(items: Seq[String]): Option[String] =
    if (items.isEmpty) None else Some(arr(items))

  private def obj(fields: Seq[(String, Option[String])]): String =
    fields.collect { case (k, Some(v)) => str(k) + ":" + v }
      .mkString("{", ",", "}")
}
