package graft.model

/** Core semantic-layer metadata model.
  *
  * From-scratch Spark-native equivalent of the reference's semantic
  * abstractions (sidemantic/core/model.py:16, dimension.py:8, metric.py:10,
  * relationship.py:8, segment.py:6, pre_aggregation.py:35, security.py:40).
  * Pure metadata — all physical execution is delegated to Catalyst.
  */

/** Semantic dimension types (reference: sidemantic/core/dimension.py:15). */
sealed trait DimType
object DimType {
  case object Categorical extends DimType
  case object Time        extends DimType
  case object Bool        extends DimType
  case object Numeric     extends DimType
}

/** A queryable attribute of a model.
  *
  * @param sql expression over the model's physical columns (single-part
  *            references); None means a physical column of the same name.
  * @param granularity default time grain for Time dims (second..year).
  */
final case class Dimension(
    name: String,
    dimType: DimType = DimType.Categorical,
    sql: Option[String] = None,
    granularity: Option[String] = None,
    supportedGranularities: Seq[String] = Nil, // empty = all grains allowed
    label: Option[String] = None,
    parent: Option[String] = None, // hierarchy metadata (drill up/down)
    public: Boolean = true
) {
  def expr: String = sql.getOrElse(name)
}

/** Aggregation kinds (reference: sidemantic/core/metric.py:36-52). */
object AggKind {
  val All: Set[String] = Set(
    "sum", "count", "count_distinct", "approx_count_distinct", "avg",
    "min", "max", "median", "stddev", "stddev_pop", "variance",
    "variance_pop", "percentile_cont", "percentile_disc")
  /** Idempotent under row duplication (fan-out safe as-is). */
  val FanoutSafe: Set[String] =
    Set("min", "max", "count_distinct", "approx_count_distinct")
  /** No distributive decomposition exists — must raise under fan-out
    * (reference: symmetric_aggregate.py:147-159). */
  val NonDecomposable: Set[String] =
    Set("median", "stddev", "stddev_pop", "variance", "variance_pop",
      "percentile_cont", "percentile_disc")
}

/** Time-comparison offsets (reference: core/time_intelligence.py). */
object Comparison {
  val Offsets = Map("dod" -> "day", "wow" -> "week", "mom" -> "month",
    "qoq" -> "quarter", "yoy" -> "year", "prior" -> "prior")
}

/** Semi-additive metric config (reference: metric.py:368). */
final case class NonAdditiveDimension(
    name: String,                    // time dim the metric is non-additive over
    windowChoice: String = "max",    // "max" (last snapshot) | "min" (first)
    windowGroupings: Seq[String] = Nil // extra per-entity groupings (e.g. account)
)

/** A measure or computed metric.
  *
  * Exactly one "kind" applies:
  *   - agg defined              → simple aggregate over `sql` expr
  *   - metricType = ratio       → numerator / nullif(denominator, 0)
  *   - metricType = derived     → `sql` formula over other metric names
  *   - metricType = cumulative  → running total of baseMetric (window/grainToDate)
  *   - metricType = time_comparison → lag of baseMetric by comparison offset
  *   - metricType = conversion  → entity funnel base→conversion within window
  *   - metricType = retention   → cohort retention curve
  *   - metricType = cohort      → two-stage per-entity agg then outer agg
  */
final case class Metric(
    name: String,
    agg: Option[String] = None,
    // parameter for parameterized aggregations — the fraction for
    // percentile_cont / percentile_disc (e.g. "0.99")
    aggParam: Option[String] = None,
    sql: Option[String] = None,
    metricType: Option[String] = None,
    filters: Seq[String] = Nil,
    fillNullsWith: Option[String] = None,
    label: Option[String] = None,
    public: Boolean = true,
    governance: Option[Governance] = None,
    // ratio
    numerator: Option[String] = None,
    denominator: Option[String] = None,
    offsetWindow: Option[String] = None, // e.g. "1 month" lag on denominator
    // cumulative / time_comparison
    baseMetric: Option[String] = None,
    window: Option[String] = None,        // e.g. "7 day" trailing window
    grainToDate: Option[String] = None,   // e.g. "month" → MTD, "year" → YTD
    // arbitrary window passthrough (reference: core/metric.py:299-308):
    // raw window-function SQL over inner metric columns + optional frame
    // and order column; frames pass through to Spark's window support
    windowExpression: Option[String] = None,
    windowFrame: Option[String] = None,
    windowOrder: Option[String] = None,
    // ranking domain constraint: the window expression's semantics are
    // "over the values of THIS column" (DAX RANKX(ALL(T[Col]), …)), so
    // the plan is only faithful when the query groups by exactly that
    // column — the planner enforces it and refuses other groupings
    windowDomain: Option[String] = None,
    comparison: Option[String] = None,    // dod|wow|mom|qoq|yoy|prior
    calculation: Option[String] = None,   // difference|percent_change|ratio
    // conversion / retention / cohort / funnel
    steps: Seq[String] = Nil,               // N-step funnel predicates, in order
    entity: Option[String] = None,          // entity dimension (e.g. user_id)
    baseFilter: Option[String] = None,      // base-event predicate
    conversionFilter: Option[String] = None,
    conversionWindow: Option[String] = None, // e.g. "7 day"
    retentionPeriods: Option[Int] = None,
    retentionGrain: Option[String] = None,   // day|week|month
    having: Option[String] = None,           // cohort qualification gate
    outerAgg: Option[String] = None,         // cohort outer aggregation
    entityDimensions: Seq[String] = Nil,     // cohort output dims (metric-owned)
    nonAdditive: Option[NonAdditiveDimension] = None
) {
  def isSimple: Boolean = metricType.isEmpty && agg.isDefined
  def kind: String = metricType.getOrElse("simple")
}

/** Join edge between models (reference: relationship.py:8).
  *
  * @param foreignKey key column(s) on the owning (from) model
  * @param primaryKey key column(s) on the related (to) model; defaults to
  *                   the to-model's primary key
  * @param through    junction model name for many_to_many
  * @param sqlOn      custom join condition with {from}/{to} model refs
  */
final case class Relationship(
    to: String,
    relType: String, // many_to_one | one_to_one | one_to_many | many_to_many | cross
    foreignKey: Seq[String] = Nil,
    primaryKey: Seq[String] = Nil,
    through: Option[String] = None,
    throughForeignKey: Seq[String] = Nil,
    relatedForeignKey: Seq[String] = Nil,
    sqlOn: Option[String] = None
)

/** Named reusable filter; `{model}` refers to the owning model. */
final case class Segment(name: String, sql: String, public: Boolean = true)

/** Non-enforcing governance metadata (reference: core/governance.py:22):
  * trust and lifecycle description — authorization stays with
  * [[SecurityPolicy]]. */
final case class Governance(
    owner: Option[String] = None,
    domain: Option[String] = None,
    category: Option[String] = None,
    tags: Seq[String] = Nil,
    status: Option[String] = None,        // draft | active | deprecated
    certification: Option[String] = None, // certified | verified | uncertified
    visibility: String = "public",        // public | internal | private
    deprecationMessage: Option[String] = None,
    replacedBy: Option[String] = None)

/** Freshness expectation for models and curated explores (reference:
  * core/freshness.py:1-25). Prefer `watermark` (a dimension or source
  * column whose MAX value represents source freshness); `sql` is the
  * advanced escape hatch — an arbitrary query returning one scalar
  * marker. `ttlSeconds` is the maximum allowed age before the data is
  * considered stale. Policy only — evaluation happens in
  * [[graft.gen.FreshnessCheck]]. */
final case class Freshness(
    watermark: Option[String] = None,
    sql: Option[String] = None,
    ttlSeconds: Option[Long] = None) {
  require(!(watermark.isDefined && sql.isDefined),
    "Freshness cannot define both watermark and sql")
  require(ttlSeconds.forall(_ > 0), "Freshness ttl_seconds must be > 0")
  // a ttl with no probe source can never be evaluated — FreshnessCheck
  // would skip the model and the declared contract would silently
  // never run, which is exactly what this block exists to prevent
  require(ttlSeconds.isEmpty || watermark.isDefined || sql.isDefined,
    "Freshness ttl_seconds requires a watermark or sql probe to evaluate it")
}

/** Curated entrypoint over the semantic graph (reference:
  * core/consumption.py:100 — Hex calls the same concept a View):
  * allowlists constrain callers, defaults fill omitted selections, and
  * `filters` are mandatory on every query. Bare field names qualify
  * against the base model. */
final case class Explore(
    name: String,
    model: String, // base model — pins the join graph anchor
    label: Option[String] = None,
    allowedDimensions: Option[Seq[String]] = None, // None = unrestricted
    allowedMetrics: Option[Seq[String]] = None,
    allowedFilterFields: Option[Seq[String]] = None,
    defaultDimensions: Seq[String] = Nil,
    defaultMetrics: Seq[String] = Nil,
    filters: Seq[String] = Nil, // mandatory, ANDed into every query
    defaultFilters: Seq[String] = Nil,
    defaultOrderBy: Seq[String] = Nil,
    defaultLimit: Option[Int] = None,
    maxLimit: Option[Int] = None,
    governance: Option[Governance] = None,
    freshness: Option[Freshness] = None) {
  def qualify(v: String): String = if (v.contains(".")) v else s"$model.$v"
}

/** Row/field security (reference: core/security.py:40-57, docs/security.md).
  * Two independent controls, both deny-by-default when the model declares a
  * policy and the query supplies no user attributes:
  *  - `access`: boolean gate — a SQL boolean expression over `user.attr`
  *    references (e.g. "user.role IN ('analyst','admin')"); None = allow.
  *  - `rowFilters`: SQL templates over `{{ user.attr }}`, AND-ed into the
  *    model's own frame before any join (fan-out-safe row scoping).
  * Attribute values render as escaped type-correct SQL literals — a value
  * like "1 OR 1=1" cannot escape its predicate (security.py value safety). */
final case class SecurityPolicy(
    access: Option[String] = None,  // boolean expr over user.*; None = allow
    rowFilters: Seq[String] = Nil   // rendered with user attrs, pushed pre-join
)

/** Materialized rollup definition (reference: pre_aggregation.py:35). */
final case class PreAggregation(
    name: String,
    measures: Seq[String],            // metric names (simple aggs only)
    dimensions: Seq[String] = Nil,    // dim names
    timeDimension: Option[String] = None,
    granularity: Option[String] = None,  // stored grain
    partitionGranularity: Option[String] = None
)

/** How a model binds to physical data. */
sealed trait ModelSource
object ModelSource {
  /** Parquet path; `{dir}` is substituted with the data directory at plan time. */
  final case class Parquet(pathPattern: String) extends ModelSource
  /** Catalog table name (spark.table). */
  final case class Table(name: String) extends ModelSource
  /** Derived table — arbitrary Spark SQL. */
  final case class SqlView(sql: String) extends ModelSource
}

/** A semantic model: a dataset + its dimensions/metrics/join edges.
  * (reference: core/model.py:16) */
final case class Model(
    name: String,
    source: ModelSource,
    primaryKey: Seq[String] = Nil,
    dimensions: Seq[Dimension] = Nil,
    metrics: Seq[Metric] = Nil,
    relationships: Seq[Relationship] = Nil,
    segments: Seq[Segment] = Nil,
    security: Option[SecurityPolicy] = None,
    defaultTimeDimension: Option[String] = None,
    defaultGrain: Option[String] = None,
    extendsModel: Option[String] = None,
    preAggregations: Seq[PreAggregation] = Nil,
    governance: Option[Governance] = None,
    freshness: Option[Freshness] = None
) {
  def dimension(n: String): Option[Dimension] = dimensions.find(_.name == n)
  def metric(n: String): Option[Metric] = metrics.find(_.name == n)
  def segment(n: String): Option[Segment] = segments.find(_.name == n)

  // ---- dimension hierarchies (reference: core/model.py:132-196) ----

  /** Root-to-dim path along `parent` links, cycle-safe. */
  def hierarchyPath(dimName: String): Seq[String] = dimension(dimName) match {
    case None => Nil
    case Some(d) =>
      var path = List(d.name)
      var visited = Set(d.name)
      var cur: Option[Dimension] = Some(d)
      while (cur.exists(_.parent.exists(p => !visited(p)))) {
        val p = cur.get.parent.get
        path = p :: path
        visited += p
        cur = dimension(p)
      }
      path
  }

  /** Child dimension to drill down into (the dim whose parent is this). */
  def drillDown(dimName: String): Option[String] =
    dimensions.find(_.parent.contains(dimName)).map(_.name)

  /** Parent dimension to drill up to. */
  def drillUp(dimName: String): Option[String] =
    dimension(dimName).flatMap(_.parent)
}
