package graft

import graft.adapters.MetricFlowAdapter
import graft.gen.Generator
import graft.model.{Catalog, DimType, ModelSource}
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** dbt MetricFlow adapter conformance against the reference's fixture
  * corpus (/root/reference/tests/fixtures/metricflow/) plus seeded
  * end-to-end queries over the imported models. */
class MetricFlowAdapterSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures/metricflow"

  private def session() = TestSpark.spark.newSession()

  test("semantic_models fixture: entities, joins, graph metrics execute") {
    val spark = session()
    import spark.implicits._
    Seq((1, 1, "2024-01-05", "shipped", 100.0),
        (2, 1, "2024-02-10", "shipped", 200.0),
        (3, 2, "2024-02-11", "open", 50.0))
      .toDF("order_id", "customer_id", "created_at", "status", "order_amount")
      .createOrReplaceTempView("orders_tbl")
    Seq((1, "EMEA", "gold"), (2, "APAC", "silver"))
      .toDF("customer_id", "region", "tier")
      .createOrReplaceTempView("customers_tbl")

    val imp = MetricFlowAdapter.loadFile(s"$fixtures/semantic_models.yml",
      t => ModelSource.Table(t.split('.').last.replace("orders", "orders_tbl")
        .replace("customers", "customers_tbl")))
    val cat = MetricFlowAdapter.toCatalog(imp)

    // primary/foreign entities became keys + a resolved many_to_one edge
    val orders = cat.model("orders")
    assert(orders.primaryKey == Seq("order_id"))
    val rel = orders.relationships.find(_.to == "customers").get
    assert(rel.relType == "many_to_one" && rel.foreignKey == Seq("customer_id"))

    val gen = new Generator(spark, cat)
    // join through the entity-resolved edge
    val byRegion = gen.plan(SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("customers.region"),
      orderBy = Seq("region")))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(byRegion == Seq(("APAC", 50.0), ("EMEA", 300.0)))

    // top-level simple metric kept queryable by bare name via graph alias
    val total = gen.plan(SemanticQuery(metrics = Seq("total_revenue")))
      .collect()(0).getDouble(0)
    assert(total == 350.0)

    // top-level ratio metric with measure refs qualified to model.measure
    val aov = gen.plan(SemanticQuery(metrics = Seq("average_order_value")))
      .collect()(0).getDouble(0)
    assert(math.abs(aov - 350.0 / 3) < 1e-9)

    // time dimension imported with grain support
    val byMonth = gen.plan(SemanticQuery(
      metrics = Seq("orders.order_count"),
      dimensions = Seq("orders.order_date__month"),
      orderBy = Seq("order_date__month"))).collect()
    assert(byMonth.length == 2 && byMonth(1).getLong(1) == 2L)
  }

  test("conversion metrics: CASE WHEN measures lift into a real funnel") {
    val spark = session()
    import spark.implicits._
    // u1 visits then buys within 7d; u2 visits, never buys
    Seq((1, "u1", "visit", "2024-01-01"), (2, "u1", "buy", "2024-01-03"),
        (3, "u2", "visit", "2024-01-01"), (4, "u2", "view_item", "2024-01-02"))
      .toDF("event_id", "user_id", "event_type", "event_time")
      .createOrReplaceTempView("user_events_tbl")

    val imp = MetricFlowAdapter.loadFile(s"$fixtures/conversion_metrics.yml",
      _ => ModelSource.Table("user_events_tbl"))
    val cat = MetricFlowAdapter.toCatalog(imp)

    val m = cat.model("user_events")
      .metric("visit_to_buy_conversion_rate")
      .getOrElse(fail("conversion metric not lifted"))
    assert(m.kind == "conversion")
    assert(m.baseFilter.contains("event_type = 'visit'"))
    assert(m.conversionFilter.contains("event_type = 'buy'"))
    assert(m.entity.contains("user_id"))

    val rate = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("user_events.visit_to_buy_conversion_rate")))
      .select("visit_to_buy_conversion_rate").collect()(0).getDouble(0)
    assert(rate == 0.5)
  }

  test("latest spec: column entities/dimensions and folded simple metrics") {
    val imp = MetricFlowAdapter.loadFile(s"$fixtures/latest_spec_models.yml")
    val orders = imp.models.find(_.model.name == "orders")
      .getOrElse(fail("latest-spec model missing")).model
    assert(orders.primaryKey == Seq("order_id"))
    assert(orders.relationships.exists(r =>
      r.foreignKey == Seq("customer_id") && r.relType == "many_to_one"))
    val statusDim = orders.dimension("status").getOrElse(fail("renamed dim lost"))
    assert(statusDim.sql.contains("order_status"))
    assert(orders.dimension("ordered_at").exists(_.dimType == DimType.Time))
    // folded measures: sum keeps its expr, bare count anchors to the pk
    assert(orders.metric("order_total").exists(m =>
      m.agg.contains("sum") && m.sql.contains("amount")))
    assert(orders.metric("order_count").exists(m =>
      m.agg.contains("count") && m.sql.contains("order_id")))
  }

  test("saved queries parse into structured semantic queries") {
    val imp = MetricFlowAdapter.loadFile(s"$fixtures/saved_queries_example.yml")
    val q = imp.savedQueries.getOrElse("monthly_sales_by_region",
      fail("saved query missing"))
    assert(q.metrics == Seq("total_sales", "sales_transactions"))
    assert(q.dimensions.toSet ==
      Set("sales_data.sale_date__month", "sales_data.region"))
  }

  test("cumulative and derived top-level metrics import with windows") {
    val imp = MetricFlowAdapter.loadString(
      """semantic_models:
        |  - name: txns
        |    model: ref('txns')
        |    defaults:
        |      agg_time_dimension: ds
        |    entities:
        |      - name: txn
        |        type: primary
        |        expr: txn_id
        |    dimensions:
        |      - name: ds
        |        type: time
        |        type_params:
        |          time_granularity: day
        |    measures:
        |      - name: amount_total
        |        agg: sum
        |        expr: amount
        |      - name: txn_count
        |        agg: count
        |        expr: txn_id
        |metrics:
        |  - name: rolling_amount
        |    type: cumulative
        |    type_params:
        |      measure: amount_total
        |      cumulative_type_params:
        |        window: 7 days
        |  - name: amount_per_txn
        |    type: derived
        |    type_params:
        |      expr: total_amt / txns
        |      metrics:
        |        - name: amount_total
        |          alias: total_amt
        |        - name: txn_count
        |          alias: txns
        |""".stripMargin)
    val cum = imp.graphMetrics.find(_.name == "rolling_amount").get
    assert(cum.kind == "cumulative")
    assert(cum.baseMetric.contains("txns.amount_total"))
    assert(cum.window.contains("7 day")) // plural normalized
    val der = imp.graphMetrics.find(_.name == "amount_per_txn").get
    assert(der.sql.contains("amount_total / txn_count")) // aliases rewritten
  }

  test("every imported aggregation is an engine-legal kind — nothing " +
      "silently coerces") {
    val imp = MetricFlowAdapter.loadFile(
      s"$fixtures/simple_manifest_buys_source.yaml")
    imp.models.foreach(_.model.metrics.foreach(m =>
      assert(m.agg.forall(graft.model.AggKind.All))))
  }

  test("legacy expr-less measures aggregate the measure-name column, not the pk") {
    val imp = MetricFlowAdapter.loadFile(s"$fixtures/accounts_source.yml")
    val m = imp.models.head.model
    // `- name: account_balance / agg: sum` with no expr must sum the
    // account_balance column (ref adapters/metricflow.py:156-162)
    assert(m.metric("account_balance").exists(_.sql.contains("account_balance")))
  }

  test("filtered metric shadowing its measure keeps the raw measure for siblings") {
    val spark = session()
    import spark.implicits._
    Seq((1, 10.0, "done"), (2, 20.0, "open"))
      .toDF("txn_id", "amount", "status")
      .createOrReplaceTempView("shadow_txns_tbl")
    val imp = MetricFlowAdapter.loadString(
      """semantic_models:
        |  - name: txns
        |    model: ref('shadow_txns_tbl')
        |    entities:
        |      - name: txn
        |        type: primary
        |        expr: txn_id
        |    dimensions:
        |      - name: status
        |        type: categorical
        |    measures:
        |      - name: revenue
        |        agg: sum
        |        expr: amount
        |      - name: txn_count
        |        agg: count
        |        expr: txn_id
        |metrics:
        |  - name: revenue
        |    type: simple
        |    type_params:
        |      measure: revenue
        |    filter: "status = 'done'"
        |  - name: revenue_per_txn
        |    type: ratio
        |    type_params:
        |      numerator: revenue
        |      denominator: txn_count
        |""".stripMargin)
    val txns = imp.models.head.model
    // raw measure survives under an internal name, unfiltered
    assert(txns.metric("revenue__base").exists(_.filters.isEmpty))
    // public name carries the filter
    assert(txns.metric("revenue").exists(_.filters == Seq("status = 'done'")))
    // sibling ratio is a METRIC reference: it reads the PUBLIC (filtered)
    // metric, not the raw measure (ref semantic_graph
    // resolve_metric_reference resolves graph metrics first)
    val ratio = imp.graphMetrics.find(_.name == "revenue_per_txn").get
    assert(ratio.numerator.contains("txns.revenue"))

    val cat = MetricFlowAdapter.toCatalog(imp)
    val gen = new Generator(spark, cat)
    val filtered = gen.plan(SemanticQuery(metrics = Seq("txns.revenue")))
      .collect()(0).getDouble(0)
    assert(filtered == 10.0) // only the 'done' txn
    val perTxn = gen.plan(SemanticQuery(metrics = Seq("revenue_per_txn")))
      .collect()(0).getDouble(0)
    assert(perTxn == 5.0) // 10 / 2 — filtered numerator, dbt semantics
  }

  test("measure literally named foo__base is not captured by resolution") {
    val spark = session()
    import spark.implicits._
    Seq((1, 10.0, 3.0), (2, 20.0, 4.0))
      .toDF("txn_id", "amount", "base_amt")
      .createOrReplaceTempView("base_clash_tbl")
    val imp = MetricFlowAdapter.loadString(
      """semantic_models:
        |  - name: clash
        |    model: ref('base_clash_tbl')
        |    entities:
        |      - name: txn
        |        type: primary
        |        expr: txn_id
        |    measures:
        |      - name: foo
        |        agg: sum
        |        expr: amount
        |      - name: foo__base
        |        agg: sum
        |        expr: base_amt
        |metrics:
        |  - name: total_foo
        |    type: simple
        |    type_params:
        |      measure: foo
        |""".stripMargin)
    val m = imp.models.head.model
    // no shadowing here: `foo` stays raw, `foo__base` stays the user's own
    assert(m.metric("foo").exists(_.sql.contains("amount")))
    assert(m.metric("foo__base").exists(_.sql.contains("base_amt")))
    val cat = MetricFlowAdapter.toCatalog(imp)
    val gen = new Generator(spark, cat)
    val v = gen.plan(SemanticQuery(metrics = Seq("clash.total_foo")))
      .collect()(0).getDouble(0)
    assert(v == 30.0) // sums amount, never the user's foo__base measure
  }

  test("percentile measures import as first-class percentile_cont/disc " +
      "aggregations (the reference drops them — strict extension)") {
    val (imp, rep) = graft.load.Fidelity.capture {
      MetricFlowAdapter.loadFile(s"$fixtures/bookings_source.yml")
    }
    val bookings = imp.models.map(_.model)
      .find(_.metric("booking_value_p99").isDefined).get
    assert(bookings.metric("booking_value_p99").exists(m =>
      m.agg == Some("percentile_cont") && m.aggParam == Some("0.99") &&
        m.sql == Some("booking_value")))
    assert(bookings.metric("discrete_booking_value_p99").exists(m =>
      m.agg == Some("percentile_disc") && m.aggParam == Some("0.99")))
    // approximate flavors lower to the exact form with an info note only
    assert(bookings.metric("approximate_continuous_booking_value_p99")
      .exists(_.agg == Some("percentile_cont")))
    assert(rep.byConstruct("unsupported_aggregation").isEmpty,
      rep.summaryLines.mkString("\n"))
    assert(rep.byConstruct("approximate_percentile_hint").nonEmpty)
  }

  test("the whole metricflow fixture corpus parses and validates") {
    val dir = new java.io.File(fixtures)
    val files = dir.listFiles().filter(f =>
      f.getName.endsWith(".yml") || f.getName.endsWith(".yaml"))
    assert(files.length >= 25)
    files.foreach { f =>
      val imp = MetricFlowAdapter.loadFile(f.getPath)
      // every file must also register cleanly (validation passes)
      MetricFlowAdapter.toCatalog(imp)
    }
  }
}
