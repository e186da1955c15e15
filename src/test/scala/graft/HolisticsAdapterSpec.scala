package graft

import graft.adapters.HolisticsAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Holistics AML importer against the reference's fixture corpora
  * (tests/fixtures/holistics/ + holistics_kitchen_sink/). */
class HolisticsAdapterSpec extends AnyFunSuite {
  private val basic = "/root/reference/tests/fixtures/holistics"
  private val sink = "/root/reference/tests/fixtures/holistics_kitchen_sink"

  test("basic corpus: models, @sql definitions, aggregation types") {
    val imp = HolisticsAdapter.loadDirectory(basic)
    val byName = imp.models.map(m => m.name -> m).toMap
    assert(byName.keySet == Set("accounts", "orders", "users"))

    val orders = byName("orders")
    assert(orders.source == ModelSource.Table("public.orders"))
    assert(orders.primaryKey == Seq("id"))
    // {{ #SOURCE.col }} interpolation
    assert(orders.dimension("user_id").exists(_.sql.isEmpty))
    assert(orders.metric("order_count").exists(m =>
      m.agg == Some("count") && m.sql == Some("id")))
    assert(orders.metric("revenue").exists(m =>
      m.agg == Some("sum") && m.sql == Some("amount")))
    assert(orders.metric("amount_stdev").exists(_.agg == Some("stddev")))
    // custom aggregation → derived over other measures
    assert(orders.metric("aov").exists(m =>
      m.metricType == Some("derived") &&
        m.sql == Some("revenue / NULLIF(order_count, 0)")))

    val users = byName("users")
    assert(users.dimension("created_at").exists(_.dimType == DimType.Time))
  }

  test("dataset relationships: named refs, inline configs, rel_expr ops") {
    val imp = HolisticsAdapter.loadDirectory(basic)
    val orders = imp.models.find(_.name == "orders").get
    // inline RelationshipConfig (orders.user_id → users.id)
    assert(orders.relationships.exists(r =>
      r.to == "users" && r.relType == "many_to_one" &&
        r.foreignKey == Seq("user_id") && r.primaryKey == Seq("id")))
    // rel(rel_expr: orders.user_id > users.id, active: false) is dropped
    assert(orders.relationships.count(_.to == "users") == 1)
    val users = imp.models.find(_.name == "users").get
    // relationship(users_accounts, true) resolves the named one_to_one
    assert(users.relationships.exists(r =>
      r.to == "accounts" && r.relType == "one_to_one"))
    // rel_expr dash shorthand also targets accounts and dedups
    assert(users.relationships.count(_.to == "accounts") == 1)
  }

  test("kitchen sink: partials, extend(), modules parse") {
    val imp = HolisticsAdapter.loadDirectory(sink)
    val names = imp.models.map(_.name).toSet
    assert(names.contains("kitchen_orders"))
    assert(names.contains("kitchen_orders_extended"))
    val ext = imp.models.find(_.name == "kitchen_orders_extended").get
    // extension adds shipping_method on top of the base fields
    assert(ext.dimension("shipping_method").isDefined)
    assert(ext.dimension("order_id").isDefined)
    val inline = imp.models.find(_.name == "kitchen_orders_inline")
    assert(inline.exists(_.dimension("promised_at").exists(_.dimType == DimType.Time)))
  }

  test("kitchen sink: @aql definitions translate to SQL fragments " +
      "(ref holistics.py:1910-2171)") {
    val imp = HolisticsAdapter.loadDirectory(sink)
    val orders = imp.models.find(_.name == "kitchen_orders").get
    // pipeline form: order_id | count() → COUNT(order_id)
    assert(orders.metric("order_count_aql").exists(m =>
      m.sql == Some("COUNT(order_id)")), orders.metric("order_count_aql"))
    // inline arithmetic over agg calls
    assert(orders.metric("revenue_per_order_aql").exists(m =>
      m.sql == Some("SUM(amount) / COUNT(order_id)")))
    // @today macro inside a dimension definition
    assert(orders.dimension("today").exists(_.sql == Some("CURRENT_DATE")))
    // the translator alone: two-arg agg, count_if, table funcs, macros
    import graft.adapters.HolisticsAdapter.translateAql
    assert(translateAql("sum(orders, orders.amount)") == "SUM(orders.amount)")
    assert(translateAql("count_if(status == 'paid')") ==
      "SUM(CASE WHEN status == 'paid' THEN 1 ELSE 0 END)")
    assert(translateAql("orders | where(status == 'x') | count()") ==
      "COUNT(orders)")
    assert(translateAql("count(orders.id) | of_all(orders)") ==
      "COUNT(orders.id)")
    assert(translateAql("created_at > @today") ==
      "created_at > CURRENT_DATE")
  }

  test("query end-to-end over a Holistics model bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "orders_t")
          s"""SELECT o_orderkey AS id, o_custkey AS user_id,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS id, c_mktsegment AS segment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = HolisticsAdapter.load(Seq(
      """Model h_orders {
        |  type: 'table'
        |  table_name: 'orders_t'
        |  dimension id {
        |    type: 'number'
        |    primary_key: true
        |  }
        |  dimension user_id {
        |    type: 'number'
        |  }
        |  measure order_count {
        |    type: 'number'
        |    definition: @sql {{ id }};;
        |    aggregation_type: 'count'
        |  }
        |  measure revenue {
        |    type: 'number'
        |    definition: @sql {{ amount }};;
        |    aggregation_type: 'sum'
        |  }
        |}
        |Model h_users {
        |  type: 'table'
        |  table_name: 'customer_t'
        |  dimension id {
        |    type: 'number'
        |    primary_key: true
        |  }
        |  dimension segment {
        |    type: 'text'
        |  }
        |}
        |Dataset d {
        |  models: [h_orders, h_users]
        |  relationships: [
        |    RelationshipConfig {
        |      active: true
        |      rel: Relationship {
        |        type: 'many_to_one'
        |        from: r(h_orders.user_id)
        |        to: r(h_users.id)
        |      }
        |    }
        |  ]
        |}
        |""".stripMargin), resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("h_orders.revenue", "h_orders.order_count"),
      dimensions = Seq("h_users.segment"),
      orderBy = Seq("segment"))).collect()
    assert(out.length == 5)
  }
}
