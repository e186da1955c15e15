package graft

import graft.model._
import graft.model.ModelSource.Parquet

/** Semantic graph over the driver-generated TPC-H-ish testdata
  * (TESTDATA.md / FIXTURES.md §B):
  *
  *   lineitem ↘N:1 orders ↘N:1 customer ↘N:1 nation ↘N:1 region
  *   lineitem ↘N:1 part, supplier;  supplier ↘N:1 nation
  *   events: standalone event-grain model for funnel/window metrics
  *
  * The customer→orders edge doubles as the one_to_many fan-out test bed
  * (symmetric aggregation gate, FIXTURES.md fanout_symmetric_aggregation).
  */
object TpchCatalog {

  private def t(name: String) = Parquet(s"{dir}/$name.parquet")

  val region = Model(
    name = "region", source = t("region"), primaryKey = Seq("r_regionkey"),
    dimensions = Seq(
      Dimension("name", sql = Some("r_name")),
      Dimension("regionkey", DimType.Numeric, sql = Some("r_regionkey"))),
    metrics = Seq(Metric("region_count", agg = Some("count"))))

  val nation = Model(
    name = "nation", source = t("nation"), primaryKey = Seq("n_nationkey"),
    dimensions = Seq(
      Dimension("name", sql = Some("n_name")),
      Dimension("nationkey", DimType.Numeric, sql = Some("n_nationkey"))),
    metrics = Seq(Metric("nation_count", agg = Some("count"))),
    relationships = Seq(
      Relationship("region", "many_to_one", foreignKey = Seq("n_regionkey"))))

  val customer = Model(
    name = "customer", source = t("customer"), primaryKey = Seq("c_custkey"),
    dimensions = Seq(
      Dimension("name", sql = Some("c_name")),
      Dimension("mktsegment", sql = Some("c_mktsegment")),
      Dimension("acctbal", DimType.Numeric, sql = Some("c_acctbal"))),
    metrics = Seq(
      Metric("customer_count", agg = Some("count")),
      Metric("total_acctbal", agg = Some("sum"), sql = Some("cast(c_acctbal as decimal(18,2))")),
      Metric("avg_acctbal", agg = Some("avg"),
        sql = Some("cast(c_acctbal as decimal(18,2))")),
      Metric("median_acctbal", agg = Some("median"), sql = Some("c_acctbal"))),
    relationships = Seq(
      Relationship("nation", "many_to_one", foreignKey = Seq("c_nationkey")),
      Relationship("orders", "one_to_many", foreignKey = Seq("o_custkey"))),
    segments = Seq(
      Segment("automobile", "{model}.mktsegment = 'AUTOMOBILE'")))

  val orders = Model(
    name = "orders", source = t("orders"), primaryKey = Seq("o_orderkey"),
    dimensions = Seq(
      Dimension("orderstatus", sql = Some("o_orderstatus")),
      Dimension("orderpriority", sql = Some("o_orderpriority")),
      Dimension("totalprice", DimType.Numeric, sql = Some("o_totalprice")),
      Dimension("order_date", DimType.Time, sql = Some("o_orderdate"),
        granularity = Some("day")),
      Dimension("is_high_value", DimType.Bool, sql = Some("o_totalprice > 200000"))),
    metrics = Seq(
      Metric("order_count", agg = Some("count")),
      Metric("revenue", agg = Some("sum"), sql = Some("cast(o_totalprice as decimal(18,2))")),
      Metric("avg_order_value", agg = Some("avg"),
        sql = Some("cast(o_totalprice as decimal(18,2))")),
      Metric("max_order_value", agg = Some("max"), sql = Some("o_totalprice")),
      Metric("min_order_value", agg = Some("min"), sql = Some("o_totalprice")),
      Metric("distinct_customers", agg = Some("count_distinct"), sql = Some("o_custkey")),
      Metric("open_revenue", agg = Some("sum"), sql = Some("cast(o_totalprice as decimal(18,2))"),
        filters = Seq("orders.orderstatus = 'O'")),
      Metric("aov", metricType = Some("ratio"),
        numerator = Some("orders.revenue"), denominator = Some("orders.order_count")),
      Metric("revenue_per_customer", metricType = Some("ratio"),
        numerator = Some("orders.revenue"), denominator = Some("orders.distinct_customers")),
      Metric("open_revenue_share", metricType = Some("derived"),
        sql = Some("cast(open_revenue as double) / cast(revenue as double)")),
      Metric("cumulative_revenue", metricType = Some("cumulative"),
        baseMetric = Some("revenue")),
      Metric("revenue_3m", metricType = Some("cumulative"),
        baseMetric = Some("revenue"), window = Some("3 month")),
      Metric("revenue_ytd", metricType = Some("cumulative"),
        baseMetric = Some("revenue"), grainToDate = Some("year")),
      Metric("revenue_mom", metricType = Some("time_comparison"),
        baseMetric = Some("revenue"), comparison = Some("mom"),
        calculation = Some("percent_change")),
      Metric("revenue_yoy_diff", metricType = Some("time_comparison"),
        baseMetric = Some("revenue"), comparison = Some("yoy"),
        calculation = Some("difference")),
      Metric("revenue_vs_prev_month", metricType = Some("ratio"),
        numerator = Some("revenue"), denominator = Some("revenue"),
        offsetWindow = Some("1 month")),
      // multi-argument COUNT(DISTINCT a, b): distinct tuples
      Metric("custkey_status_pairs", agg = Some("count_distinct"),
        sql = Some("o_custkey, o_orderstatus")),
      // BSL-style share-of-total: total(x) → SUM(SUM(x)) OVER ()
      // (reference: generator.py:4358-4460)
      Metric("revenue_share_of_total", metricType = Some("derived"),
        sql = Some("cast(revenue as double) / cast(total(revenue) as double)")),
      // arbitrary window_expression + window_frame passthrough
      // (reference: core/metric.py:299-308)
      Metric("revenue_ma3m", metricType = Some("cumulative"),
        windowExpression = Some("avg(cast(revenue as double))"),
        windowFrame = Some("ROWS BETWEEN 2 PRECEDING AND CURRENT ROW")),
      // RANKX-style rank with an explicit window order and NO time
      // axis: queried by a plain dimension the rank runs over the
      // whole grouped result (reference: RANKX(ALL('orders'), [rev]))
      Metric("revenue_rank", metricType = Some("cumulative"),
        windowExpression = Some("rank()"),
        windowOrder = Some("revenue DESC"))),
    relationships = Seq(
      Relationship("customer", "many_to_one", foreignKey = Seq("o_custkey"))),
    segments = Seq(
      Segment("fulfilled", "{model}.orderstatus = 'F'"),
      Segment("recent", "{model}.order_date >= '1998-01-01'")),
    defaultTimeDimension = Some("order_date"),
    preAggregations = Seq(
      PreAggregation("daily",
        measures = Seq("revenue", "order_count", "avg_order_value",
          "max_order_value"),
        dimensions = Seq("orderstatus", "orderpriority"),
        timeDimension = Some("order_date"), granularity = Some("day"),
        partitionGranularity = Some("month")),
      // stores the customer fk so joined dashboard queries (dims from
      // customer/nation/region) can still route to the rollup
      PreAggregation("daily_by_customer",
        measures = Seq("revenue", "order_count"),
        dimensions = Seq("o_custkey"),
        timeDimension = Some("order_date"), granularity = Some("day"),
        partitionGranularity = Some("month"))))

  val lineitem = Model(
    name = "lineitem", source = t("lineitem"),
    primaryKey = Seq("l_orderkey", "l_linenumber"),
    dimensions = Seq(
      Dimension("returnflag", sql = Some("l_returnflag")),
      Dimension("linestatus", sql = Some("l_linestatus")),
      Dimension("shipdate", DimType.Time, sql = Some("l_shipdate"),
        granularity = Some("day"))),
    metrics = Seq(
      Metric("quantity", agg = Some("sum"), sql = Some("l_quantity")),
      Metric("item_count", agg = Some("count")),
      Metric("net_revenue", agg = Some("sum"),
        sql = Some("cast(l_extendedprice * (1 - l_discount) as decimal(18,4))")),
      Metric("avg_quantity", agg = Some("avg"), sql = Some("l_quantity")),
      Metric("median_quantity", agg = Some("median"), sql = Some("l_quantity")),
      Metric("stddev_quantity", agg = Some("stddev"), sql = Some("l_quantity")),
      Metric("stddev_pop_quantity", agg = Some("stddev_pop"), sql = Some("l_quantity")),
      Metric("var_quantity", agg = Some("variance"), sql = Some("l_quantity")),
      Metric("var_pop_quantity", agg = Some("variance_pop"), sql = Some("l_quantity")),
      Metric("distinct_parts", agg = Some("count_distinct"), sql = Some("l_partkey")),
      Metric("approx_parts", agg = Some("approx_count_distinct"), sql = Some("l_partkey"))),
    relationships = Seq(
      Relationship("orders", "many_to_one", foreignKey = Seq("l_orderkey")),
      Relationship("part", "many_to_one", foreignKey = Seq("l_partkey")),
      Relationship("supplier", "many_to_one", foreignKey = Seq("l_suppkey"))),
    defaultTimeDimension = Some("shipdate"))

  val part = Model(
    name = "part", source = t("part"), primaryKey = Seq("p_partkey"),
    dimensions = Seq(
      Dimension("brand", sql = Some("p_brand")),
      Dimension("ptype", sql = Some("p_type")),
      Dimension("size", DimType.Numeric, sql = Some("p_size"))),
    metrics = Seq(
      Metric("part_count", agg = Some("count")),
      Metric("avg_retail", agg = Some("avg"), sql = Some("p_retailprice"))),
    relationships = Seq(
      // partsupp-style junction: part ↔ supplier through lineitem
      Relationship("supplier", "many_to_many", through = Some("lineitem"),
        throughForeignKey = Seq("l_partkey"), relatedForeignKey = Seq("l_suppkey"))))

  val supplier = Model(
    name = "supplier", source = t("supplier"), primaryKey = Seq("s_suppkey"),
    dimensions = Seq(Dimension("name", sql = Some("s_name"))),
    metrics = Seq(
      Metric("supplier_count", agg = Some("count")),
      Metric("total_s_acctbal", agg = Some("sum"), sql = Some("cast(s_acctbal as decimal(18,2))"))),
    relationships = Seq(
      // custom SQL join condition ({from}/{to} placeholders) — exercised by
      // every lineitem→supplier→nation query (reference: relationship.py:46)
      Relationship("nation", "many_to_one", foreignKey = Seq("s_nationkey"),
        sqlOn = Some("{from}.s_nationkey = {to}.n_nationkey"))))

  val events = Model(
    name = "events", source = t("events"), primaryKey = Seq("event_id"),
    dimensions = Seq(
      Dimension("event_type"),
      Dimension("user_id", DimType.Numeric),
      // events.parquet stores TIMESTAMP(MICROS), which Spark reads as
      // TIMESTAMP_NTZ; the cast pins the session-zoned type every
      // downstream grain/window/comparison expects. NOTE: this static
      // SQL targets the micros files only — on a legacy TIMESTAMP(NANOS)
      // file (read as a nanos long) it would silently interpret seconds;
      // use timestamp_micros(ts div 1000) there instead
      Dimension("ts", DimType.Time, sql = Some("cast(ts as timestamp)"),
        granularity = Some("day")),
      Dimension("value", DimType.Numeric),
      // dimension-level window (reference: core/dimension.py:105-112)
      Dimension("next_event_type",
        sql = Some("lead(event_type) over (partition by user_id order by ts)"))),
    metrics = Seq(
      Metric("event_count", agg = Some("count")),
      Metric("total_value", agg = Some("sum"), sql = Some("cast(value as decimal(18,2))")),
      Metric("active_users", agg = Some("count_distinct"), sql = Some("user_id")),
      Metric("cumulative_value", metricType = Some("cumulative"),
        baseMetric = Some("total_value")),
      Metric("value_wow", metricType = Some("time_comparison"),
        baseMetric = Some("total_value"), comparison = Some("wow"),
        calculation = Some("percent_change")),
      Metric("signup_conversion", metricType = Some("conversion"),
        entity = Some("user_id"),
        baseFilter = Some("event_type = 'signup'"),
        conversionFilter = Some("event_type = 'purchase'"),
        conversionWindow = Some("7 day")),
      Metric("signup_retention", metricType = Some("retention"),
        entity = Some("user_id"),
        baseFilter = Some("event_type = 'signup'"),
        conversionFilter = Some("event_type IN ('click','view','purchase')"),
        retentionGrain = Some("day"), retentionPeriods = Some(7)),
      Metric("signup_funnel", metricType = Some("funnel"),
        entity = Some("user_id"),
        steps = Seq("event_type = 'signup'", "event_type = 'purchase'",
          "event_type = 'click'")),
      Metric("multi_type_users", metricType = Some("cohort"),
        entity = Some("user_id"),
        sql = Some("count(distinct event_type)"),
        having = Some("value >= 4"),
        outerAgg = Some("count")),
      // semi-additive: per-user last observed value, summed across users
      Metric("last_value_total", agg = Some("sum"), sql = Some("cast(value as decimal(18,2))"),
        nonAdditive = Some(NonAdditiveDimension("ts", "max", Seq("user_id")))),
      Metric("purchase_value", agg = Some("sum"), sql = Some("cast(value as decimal(18,2))"),
        filters = Seq("events.event_type = 'purchase'"), fillNullsWith = Some("0.0"))),
    segments = Seq(Segment("purchases", "{model}.event_type = 'purchase'")),
    defaultTimeDimension = Some("ts"))

  /** Secured view over orders: deny-by-default role gate + row filter
    * templated on the user's nation attribute (reference: security.py:40). */
  val ordersSecured = Model(
    name = "orders_secured", source = t("orders"), primaryKey = Seq("o_orderkey"),
    dimensions = Seq(
      Dimension("orderstatus", sql = Some("o_orderstatus")),
      Dimension("order_date", DimType.Time, sql = Some("o_orderdate"),
        granularity = Some("day"))),
    metrics = Seq(
      Metric("revenue", agg = Some("sum"), sql = Some("cast(o_totalprice as decimal(18,2))")),
      Metric("order_count", agg = Some("count"))),
    security = Some(SecurityPolicy(
      access = Some("user.role IN ('analyst', 'admin')"),
      rowFilters = Seq("orderstatus = {{ user.status }}"))))

  /** Secured event-grain view with an access gate and NO row filters — the
    * exact shape whose funnel-path enforcement the shared securedScan
    * guarantees (conversion/retention/cohort plans must deny-by-default
    * like the standard path). */
  val eventsSecured = Model(
    name = "events_secured", source = t("events"), primaryKey = Seq("event_id"),
    dimensions = Seq(
      Dimension("event_type"),
      Dimension("user_id", DimType.Numeric),
      Dimension("ts", DimType.Time, sql = Some("cast(ts as timestamp)"),
        granularity = Some("day"))),
    metrics = Seq(
      Metric("event_count", agg = Some("count")),
      Metric("signup_conversion", metricType = Some("conversion"),
        entity = Some("user_id"),
        baseFilter = Some("event_type = 'signup'"),
        conversionFilter = Some("event_type = 'purchase'"),
        conversionWindow = Some("7 day"))),
    security = Some(SecurityPolicy(
      access = Some("user.role IN ('analyst', 'admin')"))),
    defaultTimeDimension = Some("ts"))

  def build(dataDir: String): Catalog =
    Catalog(dataDir = dataDir)
      .add(region, nation, customer, orders, lineitem, part, supplier,
        events, ordersSecured, eventsSecured)
      .addGraphMetric(
        Metric("revenue_per_item", metricType = Some("ratio"),
          numerator = Some("orders.revenue"), denominator = Some("lineitem.item_count")))
      .addSavedQuery("revenue_by_priority", graft.plan.SemanticQuery(
        metrics = Seq("orders.revenue", "orders.order_count"),
        dimensions = Seq("orders.orderpriority"),
        orderBy = Seq("orderpriority")))
      // curated entrypoint with allowlists + a mandatory filter
      // (reference: core/consumption.py:100)
      .addExplore(Explore(
        name = "fulfilled_orders",
        model = "orders",
        allowedDimensions = Some(Seq("orderpriority", "orderstatus")),
        allowedMetrics = Some(Seq("revenue", "order_count", "aov")),
        defaultDimensions = Seq("orderpriority"),
        defaultMetrics = Seq("revenue", "order_count"),
        filters = Seq("orders.orderstatus = 'F'"),
        defaultOrderBy = Seq("orderpriority"),
        maxLimit = Some(1000),
        governance = Some(Governance(owner = Some("finance"),
          status = Some("active"), certification = Some("certified")))))
}
