package graft

import graft.adapters.BslAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** BSL (boring-semantic-layer) importer against the reference's fixture
  * corpus (tests/fixtures/bsl/). */
class BslAdapterSpec extends AnyFunSuite {
  private val dir = "/root/reference/tests/fixtures/bsl"

  test("every fixture parses into models") {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".yml") || f.getName.endsWith(".yaml"))
    assert(files.length >= 7)
    files.foreach { f =>
      val imp = BslAdapter.loadFile(f.getPath)
      assert(imp.models.nonEmpty, s"${f.getName} produced no models")
    }
  }

  test("orders: ibis deferred measures, time grain, entity dims") {
    val orders = BslAdapter.loadFile(s"$dir/orders.yml").models.head
    assert(orders.source == ModelSource.Table("public.orders"))
    assert(orders.metric("count").exists(m =>
      m.agg == Some("count") && m.sql.isEmpty))
    assert(orders.metric("revenue").exists(m =>
      m.agg == Some("sum") && m.sql == Some("amount")))
    assert(orders.metric("avg_order_value").exists(_.agg == Some("avg")))
    assert(orders.dimension("created_at").exists(d =>
      d.dimType == DimType.Time && d.granularity == Some("day")))
  }

  test("flights: five models, left_on/right_on joins") {
    val imp = BslAdapter.loadFile(s"$dir/flights.yml")
    assert(imp.models.map(_.name).toSet ==
      Set("carriers", "aircraft_models", "aircraft", "airports", "flights"))
    val flights = imp.models.find(_.name == "flights").get
    assert(flights.relationships.exists(r =>
      r.to == "carriers" && r.relType == "many_to_one" &&
        r.foreignKey == Seq("carrier") && r.primaryKey == Seq("code")))
  }

  test("healthcare: with-shorthand joins, boolean and compound measures") {
    val imp = BslAdapter.loadFile(s"$dir/healthcare.yml")
    val enc = imp.models.find(_.name == "encounters").get
    // with: _.patient_id joins the target's declared primary key
    assert(enc.relationships.exists(r => r.to == "patients" &&
      r.foreignKey == Seq("patient_id") && r.primaryKey == Seq("id")))
    // compound arithmetic under .sum()
    assert(enc.metric("total_out_of_pocket").exists(m =>
      m.agg == Some("sum") &&
        m.sql == Some("total_claim_cost - payer_coverage")))
    // boolean aggregation lowers to a row-level CASE under sum
    assert(enc.metric("emergency_count").exists(m =>
      m.agg == Some("sum") &&
        m.sql.exists(_.contains("CASE WHEN encounter_class = 'emergency'"))))
  }

  test("ga_sessions: nested struct dims and measures") {
    val ga = BslAdapter.loadFile(s"$dir/ga_sessions.yaml").models.head
    assert(ga.dimension("source").exists(_.sql == Some("trafficSource.source")))
    assert(ga.metric("total_visits").exists(m =>
      m.agg == Some("sum") && m.sql == Some("totals.visits")))
    assert(ga.metric("user_count").exists(m =>
      m.agg == Some("count_distinct") && m.sql == Some("fullVisitorId")))
  }

  test("model-level filter wraps the source") {
    val f = BslAdapter.loadFile(s"$dir/yaml_example_filter.yaml")
      .models.find(_.name == "flights").get
    f.source match {
      case ModelSource.SqlView(sql) =>
        assert(sql.contains("WHERE year > 2020"))
      case other => fail(s"expected filtered view, got $other")
    }
  }

  test("query end-to-end over a BSL model bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "orders_t")
          s"""SELECT o_orderkey AS id, o_custkey AS customer_id,
             |  o_orderstatus AS status,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS id, c_mktsegment AS segment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = BslAdapter.loadString(
      """bsl_orders:
        |  table: orders_t
        |  primary_key: id
        |  dimensions:
        |    status: _.status
        |    customer_id: _.customer_id
        |  measures:
        |    order_count: _.count()
        |    revenue: _.amount.sum()
        |    final_count: (_.status == "F").sum()
        |  joins:
        |    customer:
        |      model: bsl_customers
        |      type: one
        |      with: _.customer_id
        |bsl_customers:
        |  table: customer_t
        |  primary_key: id
        |  dimensions:
        |    id: _.id
        |    segment: _.segment
        |""".stripMargin, resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("bsl_orders.revenue", "bsl_orders.order_count",
        "bsl_orders.final_count"),
      dimensions = Seq("bsl_customers.segment"),
      orderBy = Seq("segment"))).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(3) > 0))
  }
}
