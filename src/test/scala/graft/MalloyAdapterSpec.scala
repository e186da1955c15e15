package graft

import graft.adapters.MalloyAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Malloy source importer against the reference's fixture corpus
  * (tests/fixtures/malloy/). */
class MalloyAdapterSpec extends AnyFunSuite {
  private val dir = "/root/reference/tests/fixtures/malloy"

  test("the corpus parses: most files yield models") {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".malloy"))
      .filterNot(_.getName == "syntax_error.malloy")
    val parsed = files.map(f => f.getName -> MalloyAdapter.loadFile(f.getPath))
    val withModels = parsed.count(_._2.models.nonEmpty)
    info(s"$withModels of ${files.length} files yield models")
    assert(withModels >= files.length * 3 / 4,
      s"only $withModels of ${files.length} files yielded models: " +
        parsed.filter(_._2.models.isEmpty).map(_._1).mkString(", "))
  }

  test("ecommerce: dimensions, filtered measures, joins") {
    val imp = MalloyAdapter.loadFile(s"$dir/ecommerce.malloy")
    val byName = imp.models.map(m => m.name -> m).toMap
    assert(byName.keySet ==
      Set("orders", "customers", "order_items", "products"))

    val orders = byName("orders")
    assert(orders.source == ModelSource.Table("orders"))
    assert(orders.primaryKey == Seq("order_id"))
    assert(orders.dimension("order_month").exists(d =>
      d.dimType == DimType.Time && d.granularity == Some("month")))
    assert(orders.metric("order_count").exists(_.agg == Some("count")))
    assert(orders.metric("revenue").exists(m =>
      m.agg == Some("sum") && m.sql == Some("amount")))
    // count() { where: … } refinement → metric filter
    assert(orders.metric("completed_orders").exists(m =>
      m.agg == Some("count") && m.filters == Seq("status = 'completed'")))
    // join_one ... with → pk from the target
    assert(orders.relationships.exists(r =>
      r.to == "customers" && r.relType == "many_to_one" &&
        r.foreignKey == Seq("customer_id") && r.primaryKey == Seq("customer_id")))
    // join_many ... on
    assert(orders.relationships.exists(r =>
      r.to == "order_items" && r.relType == "one_to_many"))

    val items = byName("order_items")
    assert(items.metric("line_total").exists(m =>
      m.agg == Some("sum") && m.sql == Some("quantity * unit_price")))
    val customers = byName("customers")
    assert(customers.metric("unique_customers").exists(_.agg ==
      Some("count_distinct")))
    assert(customers.dimension("signup_date").exists(_.sql ==
      Some("CAST(created_at AS DATE)")))
  }

  test("airports: rename, views skipped, expression dims") {
    val ap = MalloyAdapter.loadFile(s"$dir/airports.malloy").models.head
    assert(ap.name == "airports")
    assert(ap.primaryKey == Seq("code"))
    assert(ap.dimension("facility_type").exists(_.sql == Some("fac_type")))
    assert(ap.metric("airport_count").exists(_.agg == Some("count")))
    assert(ap.metric("avg_elevation").exists(m =>
      m.agg == Some("avg") && m.sql == Some("elevation")))
    // view blocks contribute nothing
    assert(ap.dimension("by_state").isEmpty)
  }

  test("edge cases: pick/when becomes CASE WHEN") {
    val imp = MalloyAdapter.loadFile(s"$dir/edge_cases.malloy")
    val complex = imp.models.find(_.name == "complex_expressions").get
    val pl = complex.dimension("priority_level").get
    assert(pl.sql.exists(s => s.startsWith("CASE WHEN") &&
      s.contains("THEN 'Critical'") && s.contains("ELSE 'Low'")))
  }

  test("query end-to-end over a Malloy source bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "orders")
          s"""SELECT o_orderkey AS order_id, o_custkey AS customer_id,
             |  o_orderstatus AS status,
             |  cast(o_totalprice as decimal(18,2)) AS amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS customer_id, c_mktsegment AS region
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = MalloyAdapter.loadString(
      """source: m_orders is duckdb.table('orders.parquet') extend {
        |  primary_key: order_id
        |  dimension:
        |    status is status
        |    customer_id is customer_id
        |  measure:
        |    order_count is count()
        |    revenue is sum(amount)
        |    final_orders is count() { where: status = 'F' }
        |  join_one: m_customers with customer_id
        |}
        |source: m_customers is duckdb.table('customers.parquet') extend {
        |  primary_key: customer_id
        |  dimension:
        |    customer_id is customer_id
        |    region is region
        |}
        |""".stripMargin,
      t => resolve(if (t == "customers") "customers" else "orders"))
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("m_orders.revenue", "m_orders.order_count",
        "m_orders.final_orders"),
      dimensions = Seq("m_customers.region"),
      orderBy = Seq("region"))).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(3) > 0 && r.getLong(3) < r.getLong(2)))
  }

  test("bigquery_jobs: multi-line and-chained on joins map to " +
      "composite key pairs") {
    val imp = MalloyAdapter.loadFile(s"$dir/bigquery_jobs.malloy")
    val tables = imp.models.find(_.name == "tables").get
    val stats = tables.relationships.find(_.to == "table_query_stats").get
    assert(stats.foreignKey ==
      Seq("table_catalog", "table_schema", "table_name"))
    assert(stats.primaryKey == Seq("project_id", "dataset_id", "table_id"))
    val storage = tables.relationships.find(_.to == "table_storage").get
    assert(storage.foreignKey.size == 3 && storage.primaryKey.size == 3)
  }

  test("aliased and direction-qualified joins import under the alias") {
    // flights_docs: `join_one: origin is airports with origin_code` —
    // the relationship is named by the alias (ref malloy.py:1930-1935)
    val fd = MalloyAdapter.loadFile(s"$dir/flights_docs.malloy")
    val flights = fd.models.find(_.relationships.exists(_.to == "origin"))
    assert(flights.isDefined, "alias join 'origin is airports' missing")
    assert(flights.get.relationships.exists(r =>
      r.to == "origin" && r.foreignKey == Seq("origin_code")))
    // edge_cases: matrixOperation direction between name and on
    val ec = MalloyAdapter.loadFile(s"$dir/edge_cases.malloy")
    // `join_target_a left on id = join_target_a.id` and the inner
    // variant: the direction keyword is consumed, the equi keys land
    val withDir = ec.models.flatMap(_.relationships)
      .filter(r => Set("join_target_a", "join_target_b")(r.to) &&
        r.foreignKey == Seq("id") && r.primaryKey == Seq("id"))
    assert(withDir.size == 2, s"direction-qualified joins dropped: $withDir")
  }

  test("the_met: an inline-source join synthesizes its aliased model") {
    // `join_one: images is bigquery.table('…') extend { primary_key:
    // object_id } with object_id` — the alias gets a model (like the
    // reference's _extract_inline_join_source) and the join binds its
    // primary key
    val imp = MalloyAdapter.loadFile(s"$dir/the_met.malloy")
    val images = imp.models.find(_.name == "images")
    assert(images.isDefined, imp.models.map(_.name).mkString(", "))
    assert(images.get.primaryKey == Seq("object_id"))
    assert(imp.models.exists(_.relationships.exists(r =>
      r.to == "images" && r.foreignKey == Seq("object_id") &&
        r.primaryKey == Seq("object_id"))))
  }
}
