package graft

import graft.adapters.ThoughtSpotAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** ThoughtSpot TML importer against the reference's fixture corpus
  * (tests/fixtures/thoughtspot/). */
class ThoughtSpotAdapterSpec extends AnyFunSuite {
  private val dir = "/root/reference/tests/fixtures/thoughtspot"

  test("every table/worksheet/model fixture parses") {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".table.tml") ||
        f.getName.endsWith(".worksheet.tml") || f.getName.endsWith(".model.tml"))
    assert(files.length > 30)
    files.foreach { f =>
      val imp = ThoughtSpotAdapter.loadFile(f.getPath)
      assert(imp.models.nonEmpty, s"${f.getName} produced no models")
    }
  }

  test("table tml: attribute/measure split, db_column_properties, buckets") {
    val orders = ThoughtSpotAdapter.loadFile(s"$dir/orders.table.tml").models.head
    assert(orders.source == ModelSource.Table("orders"))
    assert(orders.dimension("order_date").exists(d =>
      d.dimType == DimType.Time && d.granularity == Some("day")))
    assert(orders.metric("amount").exists(m =>
      m.agg == Some("sum") && m.sql == Some("amount")))
    assert(orders.metric("order_count").exists(m =>
      m.agg == Some("count") && m.sql == Some("id")))

    val inv = ThoughtSpotAdapter.loadFile(
      s"$dir/table_db_column_properties.table.tml").models.head
    assert(inv.dimension("sku").exists(_.dimType == DimType.Categorical))
    assert(inv.dimension("in_stock").exists(_.dimType == DimType.Bool))
    assert(inv.dimension("last_updated").exists(d =>
      d.dimType == DimType.Time && d.granularity == Some("hour")))
    assert(inv.metric("quantity").exists(_.agg == Some("sum")))
  }

  test("model tml: flattened join source, formulas inline to columns") {
    val m = ThoughtSpotAdapter.loadFile(s"$dir/sales.model.tml").models.head
    assert(m.name == "sales_model")
    val src = m.source.asInstanceOf[ModelSource.SqlView].sql
    assert(src.contains("LEFT JOIN") &&
      src.contains("sales.customer_id = customers.id"))
    assert(m.metric("gross_revenue").exists(m2 =>
      m2.agg == Some("sum") && m2.sql == Some("sales__gross_revenue")))
    assert(m.metric("net_revenue").exists(_.sql ==
      Some("sales__gross_revenue - sales__discount")))
    assert(m.metric("revenue_stddev").exists(_.agg == Some("stddev")))
    assert(m.dimension("customer_name").exists(_.sql == Some("customers__name")))
  }

  test("nested formulas inline to physical columns (reference regression)") {
    val m = ThoughtSpotAdapter.loadFile(
      s"$dir/model_nested_formula.model.tml").models.head
    val margin = m.metric("margin").get
    assert(margin.sql.exists(s =>
      s.contains("sales__gross_revenue") && s.contains("sales__discount") &&
        !s.contains("[")))
  }

  test("role-playing aliases join the same table twice") {
    val m = ThoughtSpotAdapter.loadFile(s"$dir/role_playing.model.tml").models.head
    val src = m.source.asInstanceOf[ModelSource.SqlView].sql
    assert(src.contains("AS ship_country") && src.contains("AS bill_country"))
    assert(m.dimension("ship_country_name").exists(_.sql ==
      Some("ship_country__name")))
  }

  test("query end-to-end over a model tml bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "orders")
          s"""SELECT o_orderkey AS id, o_custkey AS customer_id,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS id, c_mktsegment AS segment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = ThoughtSpotAdapter.loadString(
      """guid: "m1"
        |export_schema_version: "2"
        |model:
        |  name: ts_sales
        |  model_tables:
        |    - name: orders
        |      fqn: DB.PUBLIC.orders
        |      joins:
        |        - with: customers
        |          on: "[orders::customer_id] = [customers::id]"
        |          type: LEFT_OUTER
        |          cardinality: MANY_TO_ONE
        |    - name: customers
        |      fqn: DB.PUBLIC.customers
        |  formulas:
        |    - name: double_amount
        |      expr: "[orders::amount] * 2"
        |      id: da
        |  columns:
        |    - name: segment
        |      column_id: customers::segment
        |      properties:
        |        column_type: ATTRIBUTE
        |    - name: revenue
        |      column_id: orders::amount
        |      properties:
        |        column_type: MEASURE
        |        aggregation: SUM
        |    - name: double_revenue
        |      formula_id: da
        |      properties:
        |        column_type: MEASURE
        |        aggregation: SUM
        |""".stripMargin, resolve)
    val cat = Catalog().add(imp.models: _*)
    val rows = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("ts_sales.revenue", "ts_sales.double_revenue"),
      dimensions = Seq("ts_sales.segment"),
      orderBy = Seq("segment"))).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(
      math.abs(r.getDecimal(2).doubleValue - 2 * r.getDecimal(1).doubleValue) < 1e-6))
  }
}
