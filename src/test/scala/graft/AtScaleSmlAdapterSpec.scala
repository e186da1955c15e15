package graft

import graft.adapters.AtScaleSmlAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** AtScale SML repository importer against the reference's fixture
  * corpora (tests/fixtures/atscale_sml/ + atscale_sml_kitchen_sink/). */
class AtScaleSmlAdapterSpec extends AnyFunSuite {
  private val basic = "/root/reference/tests/fixtures/atscale_sml"
  private val sink = "/root/reference/tests/fixtures/atscale_sml_kitchen_sink"

  test("basic repo: datasets, level dims, calc methods, relationships") {
    val imp = AtScaleSmlAdapter.loadDirectory(basic)
    val byName = imp.models.map(m => m.name -> m).toMap
    assert(byName.contains("fact_sales") && byName.contains("dim_customers")
      && byName.contains("dim_regions"))

    val fact = byName("fact_sales")
    assert(fact.source == ModelSource.Table("sales"))
    assert(fact.metric("total_sales").exists(m =>
      m.agg == Some("sum") && m.sql == Some("amount")))
    assert(fact.metric("order_count").exists(m =>
      m.agg == Some("count") && m.sql == Some("sale_id")))
    assert(fact.metric("sales_stddev").exists(_.agg == Some("stddev_pop")))
    assert(fact.metric("sales_median").exists(_.agg == Some("median")))
    // order_date level attr lands on the fact with time typing
    assert(fact.dimension("order_date").exists(d =>
      d.dimType == DimType.Time && d.granularity == Some("day")))
    // fact → customer dim resolved through the level attribute
    assert(fact.relationships.exists(r =>
      r.to == "dim_customers" && r.foreignKey == Seq("customer_id") &&
        r.primaryKey == Seq("customer_id")))

    val cust = byName("dim_customers")
    // hierarchy parent chain: customer_name drills up to customer_id
    assert(cust.dimension("customer_name").exists(_.parent == Some("customer_id")))
    // metrical attribute embedded in a hierarchy level
    assert(cust.metric("customer_count").exists(_.agg == Some("count_distinct")))
    // dimension-to-dimension relationship
    assert(cust.relationships.exists(r => r.to == "dim_regions"))

    // metric_calc with MDX refs qualified to the owning dataset
    val avg = imp.graphMetrics.find(_.name == "avg_order_value").get
    assert(avg.sql.exists(s => s.contains("fact_sales.total_sales") &&
      s.contains("fact_sales.order_count")))
  }

  test("kitchen-sink repo parses without errors and keeps its facts") {
    val imp = AtScaleSmlAdapter.loadDirectory(sink)
    val names = imp.models.map(_.name).toSet
    assert(names.contains("factinternetsales"))
    assert(names.contains("fact_orders"))
    val sales = imp.models.find(_.name == "factinternetsales").get
    assert(sales.metrics.nonEmpty)
    assert(imp.models.flatMap(_.relationships).nonEmpty)
  }

  test("query end-to-end over an SML repo bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "orders_t")
          s"""SELECT o_orderkey, o_custkey,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey, c_mktsegment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = AtScaleSmlAdapter.load(Seq(
      """unique_name: fact_orders
        |object_type: dataset
        |table: orders_t
        |columns:
        |  - name: o_orderkey
        |    data_type: int
        |  - name: o_custkey
        |    data_type: int
        |  - name: amount
        |    data_type: decimal(18,2)
        |""".stripMargin,
      """unique_name: dim_cust
        |object_type: dataset
        |table: customer_t
        |columns:
        |  - name: c_custkey
        |    data_type: int
        |  - name: c_mktsegment
        |    data_type: string
        |""".stripMargin,
      """unique_name: customer_dimension
        |object_type: dimension
        |type: standard
        |hierarchies:
        |  - unique_name: h
        |    levels:
        |      - unique_name: cust_key
        |      - unique_name: segment
        |level_attributes:
        |  - unique_name: cust_key
        |    dataset: dim_cust
        |    name_column: c_custkey
        |    key_columns: [c_custkey]
        |  - unique_name: segment
        |    dataset: dim_cust
        |    name_column: c_mktsegment
        |    key_columns: [c_custkey]
        |""".stripMargin,
      """unique_name: total_amount
        |object_type: metric
        |calculation_method: sum
        |dataset: fact_orders
        |column: amount
        |""".stripMargin,
      """unique_name: sales_model
        |object_type: model
        |relationships:
        |  - unique_name: o2c
        |    from:
        |      dataset: fact_orders
        |      join_columns: [o_custkey]
        |    to:
        |      dimension: customer_dimension
        |      level: cust_key
        |""".stripMargin), resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("fact_orders.total_amount"),
      dimensions = Seq("dim_cust.segment"),
      orderBy = Seq("segment"))).collect()
    assert(out.length == 5)
  }
}
