package graft

import graft.adapters.GoodDataAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** GoodData LDM importer against the reference's fixture corpus
  * (tests/fixtures/gooddata/ — cloud, SDK declarative, and legacy). */
class GoodDataAdapterSpec extends AnyFunSuite {
  private val dir = "/root/reference/tests/fixtures/gooddata"

  test("every LDM fixture parses into models") {
    val ldmFiles = Seq("cloud_ldm.json", "cloud_kitchen_sink.json",
      "ecommerce_demo_ldm.json", "legacy_kitchen_sink.json",
      "legacy_project_model.json", "sdk_declarative_ldm.json",
      "sdk_declarative_ldm_with_sql_dataset.json")
    ldmFiles.foreach { f =>
      val imp = GoodDataAdapter.loadFile(s"$dir/$f")
      assert(imp.models.nonEmpty, s"$f produced no models")
    }
  }

  test("sdk declarative: attributes, facts, aggregated facts, references") {
    val imp = GoodDataAdapter.loadFile(s"$dir/sdk_declarative_ldm.json")
    val byName = imp.models.map(m => m.name -> m).toMap
    assert(byName.contains("campaign_channels"))
    val cc = byName("campaign_channels")
    assert(cc.source == ModelSource.Table("campaign_channels"))
    assert(cc.primaryKey == Seq("campaign_channel_id"))
    assert(cc.dimension("category").exists(_.sql.isEmpty)) // attr id short form
    assert(cc.metric("budget").exists(m =>
      m.agg == Some("sum") && m.sql == Some("budget")))
    assert(cc.metric("spend").exists(_.agg == Some("sum")))
    assert(cc.relationships.exists(r =>
      r.to == "campaigns" && r.foreignKey == Seq("campaign_id")))
    // aggregated fact elsewhere in the file carries its operation
    val withAgg = imp.models.flatMap(_.metrics).find(_.name == "budget_agg")
    assert(withAgg.exists(_.agg == Some("sum")))
  }

  test("legacy project model: anchor key, label columns, references") {
    val imp = GoodDataAdapter.loadFile(s"$dir/legacy_project_model.json")
    val orders = imp.models.find(_.name == "orders").get
    assert(orders.primaryKey == Seq("order_id"))
    assert(orders.dimension("status").exists(_.sql.isEmpty) ||
      orders.dimension("status").exists(_.sql == Some("status")))
    assert(orders.metric("amount").exists(_.agg == Some("sum")))
    assert(orders.relationships.exists(_.to == "customers"))
  }

  test("query end-to-end over a GoodData LDM bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "orders_t")
          s"""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS customer_id, c_mktsegment AS segment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = GoodDataAdapter.loadString(
      """{"ldm": {"datasets": [
        |  {"id": "gd_orders",
        |   "dataSourceTableId": {"id": "orders_t"},
        |   "grain": [{"id": "order_id", "type": "attribute"}],
        |   "attributes": [
        |     {"id": "order_id", "sourceColumn": "order_id",
        |      "sourceColumnDataType": "INT"},
        |     {"id": "customer_id", "sourceColumn": "customer_id",
        |      "sourceColumnDataType": "INT"}],
        |   "facts": [
        |     {"id": "amount", "sourceColumn": "amount",
        |      "sourceColumnDataType": "NUMERIC"}],
        |   "references": [
        |     {"identifier": {"id": "gd_customers", "type": "dataset"},
        |      "sources": [{"column": "customer_id",
        |        "target": {"id": "customer_id", "type": "attribute"}}]}]},
        |  {"id": "gd_customers",
        |   "dataSourceTableId": {"id": "customer_t"},
        |   "grain": [{"id": "customer_id", "type": "attribute"}],
        |   "attributes": [
        |     {"id": "customer_id", "sourceColumn": "customer_id",
        |      "sourceColumnDataType": "INT"},
        |     {"id": "segment", "sourceColumn": "segment",
        |      "sourceColumnDataType": "STRING"}]}
        |]}}""".stripMargin, resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("gd_orders.amount"),
      dimensions = Seq("gd_customers.segment"),
      orderBy = Seq("segment"))).collect()
    assert(out.length == 5)
  }
}
