package graft

import graft.adapters.OmniAdapter
import graft.gen.Generator
import graft.model._
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's Omni adapter tests
  * (tests/adapters/omni/test_parsing.py, test_estore.py) against the same
  * fixture corpus. */
class OmniAdapterSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures/omni"
  private def session() = TestSpark.spark

  test("basic project: views, dims, measures, model.yaml relationships") {
    val imp = OmniAdapter.loadDirectory(fixtures)
    assert(imp.models.map(_.name).toSet == Set("orders", "customers"))
    val orders = imp.models.find(_.name == "orders").get
    assert(orders.source == ModelSource.Table("public.orders"))
    assert(orders.primaryKey == Seq("id"))

    val created = orders.dimension("created_at").get
    assert(created.dimType == DimType.Time)
    assert(created.granularity.contains("day")) // first timeframe 'date'
    assert(created.supportedGranularities == Seq("day", "week", "month", "year"))
    assert(orders.dimension("amount").get.dimType == DimType.Numeric)
    assert(orders.dimension("status").get.sql.contains("status"))

    assert(orders.metric("count").get.agg.contains("count"))
    val rev = orders.metric("total_revenue").get
    assert(rev.agg.contains("sum") && rev.sql.contains("amount"))
    assert(orders.metric("avg_order_value").get.agg.contains("avg"))
    val comp = orders.metric("completed_revenue").get
    assert(comp.filters == Seq("status = 'completed'"))

    val rel = orders.relationships.head
    assert(rel.to == "customers" && rel.relType == "many_to_one")
    assert(rel.foreignKey == Seq("customer_id") && rel.primaryKey == Seq("id"))
  }

  test("estore corpus: schema-scoped names, relationships, topics") {
    val imp = OmniAdapter.loadDirectory(s"$fixtures/estore")
    val names = imp.models.map(_.name).toSet
    assert(names.contains("omni_dbt_marts__fct_sessions"))
    assert(names.contains("omni_dbt_marts__dim_products"))

    val events = imp.models.find(_.name == "omni_dbt_marts__fct_events").get
    val toProducts = events.relationships
      .find(_.to == "omni_dbt_marts__dim_products").get
    assert(toProducts.relType == "many_to_one")
    assert(toProducts.foreignKey == Seq("product_id"))
    assert(toProducts.primaryKey == Seq("product_id"))

    // one_to_one: the RELATED view holds the FK (keys swap sides)
    val users = imp.models.find(_.name == "omni_dbt_marts__dim_users").get
    val toRfm = users.relationships
      .find(_.to == "omni_dbt_marts__dim_user_rfm").get
    assert(toRfm.relType == "one_to_one")

    // topics import as explores anchored at their base view
    val topicNames = imp.topics.map(_.name).toSet
    assert(topicNames.contains("sessions"))
    assert(imp.topics.find(_.name == "sessions").get.model ==
      "omni_dbt_marts__fct_sessions")
  }

  test("end-to-end: omni orders + customers query through the Generator") {
    val spark = session()
    import spark.implicits._
    Seq((1, 10, "completed", 10.0), (2, 10, "pending", 20.0),
      (3, 20, "completed", 5.0))
      .toDF("id", "customer_id", "status", "amount")
      .createOrReplaceTempView("omni_orders_tbl")
    Seq((10, "US"), (20, "DE"))
      .toDF("id", "country")
      .createOrReplaceTempView("omni_customers_tbl")
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      if (t.endsWith("orders")) ModelSource.Table("omni_orders_tbl")
      else ModelSource.Table("omni_customers_tbl")
    val imp = OmniAdapter.loadDirectory(fixtures, resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.total_revenue", "orders.completed_revenue"),
      dimensions = Seq("customers.country"),
      orderBy = Seq("country"))).collect()
    assert(out.length == 2)
    // DE: 5.0 total, 5.0 completed; US: 30.0 total, 10.0 completed
    assert(out(0).getString(0) == "DE" && out(0).getDouble(1) == 5.0)
    assert(out(1).getString(0) == "US" && out(1).getDouble(2) == 10.0)
  }
}
