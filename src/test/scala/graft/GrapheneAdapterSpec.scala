package graft

import graft.adapters.GrapheneAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Graphene .gsql importer, mirroring the reference's parsing tests
  * (tests/adapters/graphene/test_parsing.py). */
class GrapheneAdapterSpec extends AnyFunSuite {

  test("table block: columns, joins, computed entries, composition") {
    val imp = GrapheneAdapter.load(Seq(
      """-- Customer orders.
        |table orders (
        |  order_id INT64
        |  user_id INT64
        |  created_at TIMESTAMP #timeGrain=day
        |  status STRING -- One of 'Processing', 'Complete'
        |  amount FLOAT64 #currency=USD
        |  cost FLOAT64 #currency=USD
        |
        |  join one users on user_id = users.id
        |  join many order_items on order_id = order_items.order_id
        |
        |  is_complete: status = 'Complete'
        |  revenue: sum(case when is_complete then amount else 0 end) #currency=USD
        |  sum(amount) as gross_revenue #currency=USD
        |  cogs: sum(case when is_complete then cost else 0 end) #currency=USD
        |  profit: revenue - cogs #currency=USD
        |  profit_margin: profit / revenue #ratio
        |)
        |""".stripMargin))
    val orders = imp.models.find(_.name == "orders").get
    assert(orders.source == ModelSource.Table("orders"))
    assert(orders.primaryKey == Seq("order_id"))
    assert(orders.dimension("created_at").exists(d =>
      d.dimType == DimType.Time && d.granularity == Some("day")))
    assert(orders.dimension("is_complete").exists(d =>
      d.dimType == DimType.Bool && d.sql == Some("status = 'Complete'")))
    // computed dim inlined into the metric, which stays a native sum
    val rev = orders.metric("revenue").get
    assert(rev.agg == Some("sum") &&
      rev.sql.exists(s => s.contains("status = 'Complete'") &&
        !s.contains("is_complete")))
    assert(orders.metric("gross_revenue").exists(m =>
      m.agg == Some("sum") && m.sql == Some("amount")))
    // order-independent derived composition
    assert(orders.metric("profit").exists(m =>
      m.metricType == Some("derived") && m.sql == Some("revenue - cogs")))
    assert(orders.dimension("profit").isEmpty)
    assert(orders.metric("profit_margin").exists(_.metricType == Some("derived")))
    // joins
    assert(orders.relationships.exists(r => r.to == "users" &&
      r.relType == "many_to_one" && r.foreignKey == Seq("user_id") &&
      r.primaryKey == Seq("id")))
    assert(orders.relationships.exists(r => r.to == "order_items" &&
      r.relType == "one_to_many"))
  }

  test("alias join creates a role-playing model") {
    val imp = GrapheneAdapter.load(Seq(
      """table flights (
        |  id BIGINT
        |  origin VARCHAR
        |  destination VARCHAR
        |
        |  join one airports as origin_airport on origin = origin_airport.code
        |  join one airports as destination_airport on destination = destination_airport.code
        |)
        |""".stripMargin,
      """table airports (
        |  code VARCHAR
        |  name VARCHAR
        |)
        |""".stripMargin))
    assert(imp.models.exists(_.name == "origin_airport"))
    val role = imp.models.find(_.name == "origin_airport").get
    assert(role.source == ModelSource.Table("airports"))
    assert(role.primaryKey == Seq("code"))
    val flights = imp.models.find(_.name == "flights").get
    assert(flights.relationships.exists(r => r.to == "origin_airport" &&
      r.foreignKey == Seq("origin") && r.primaryKey == Seq("code")))
  }

  test("view block + extend: from-first rewrites, extend adds dimensions") {
    val imp = GrapheneAdapter.load(Seq(
      """table regional_orders as (
        |  select region, count(*) as num_orders, sum(amount) as total_revenue
        |  from orders
        |  group by 1
        |)
        |
        |extend regional_orders (
        |  avg_order_value: total_revenue / num_orders #currency=USD
        |)
        |""".stripMargin))
    val m = imp.models.find(_.name == "regional_orders").get
    assert(m.dimension("region").isDefined)
    assert(m.dimension("num_orders").isDefined)
    assert(m.dimension("avg_order_value").exists(d =>
      d.dimType == DimType.Numeric &&
        d.sql == Some("total_revenue / num_orders")))
  }

  test("gsql from-first clause order becomes runnable SELECT") {
    val imp = GrapheneAdapter.load(Seq(
      """table carrier_performance as (
        |  from flights
        |  where cancelled = 'N'
        |  group by carrier
        |  select carrier, count() as flights_n, avg(arr_delay) as avg_arrival_delay
        |  order by flights_n desc
        |  limit 10
        |)
        |""".stripMargin))
    val m = imp.models.find(_.name == "carrier_performance").get
    val sql = m.source.asInstanceOf[ModelSource.SqlView].sql
    assert(sql.toLowerCase.startsWith("select carrier"),
      s"not select-first: $sql")
    assert(m.dimension("carrier").isDefined &&
      m.dimension("flights_n").isDefined &&
      m.dimension("avg_arrival_delay").isDefined)
  }

  test("CTE selects are ignored when inferring view dimensions") {
    val imp = GrapheneAdapter.load(Seq(
      """table weekly_orders as (
        |  with filtered_orders as (
        |    select id, created_at, amount
        |    from orders
        |    where status = 'Complete'
        |  )
        |  from filtered_orders
        |  select date_trunc('week', created_at) as order_week, sum(amount) as revenue
        |)
        |""".stripMargin))
    val m = imp.models.find(_.name == "weekly_orders").get
    assert(m.dimension("id").isEmpty)
    assert(m.dimension("order_week").isDefined)
    assert(m.dimension("revenue").isDefined)
  }

  test("query end-to-end over a gsql table bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "g_orders")
          s"""SELECT o_orderkey AS order_id, o_custkey AS user_id,
             |  o_orderstatus AS status,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS id, c_mktsegment AS segment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = GrapheneAdapter.load(Seq(
      """table g_orders (
        |  order_id INT64
        |  user_id INT64
        |  status STRING
        |  amount FLOAT64
        |
        |  join one g_users on user_id = g_users.id
        |
        |  is_final: status = 'F'
        |  revenue: sum(amount)
        |  final_revenue: sum(case when is_final then amount else 0 end)
        |)
        |""".stripMargin,
      """table g_users (
        |  id INT64
        |  segment STRING
        |)
        |""".stripMargin), resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("g_orders.revenue", "g_orders.final_revenue"),
      dimensions = Seq("g_users.segment"),
      orderBy = Seq("segment"))).collect()
    assert(out.length == 5)
    out.foreach(r => assert(
      r.getDecimal(2).doubleValue > 0 &&
        r.getDecimal(2).doubleValue < r.getDecimal(1).doubleValue))
  }
}
