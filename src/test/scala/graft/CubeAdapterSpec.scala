package graft

import graft.adapters.CubeAdapter
import graft.gen.Generator
import graft.model.{Catalog, ModelSource}
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** Cube.js adapter conformance against the reference's own cube fixture
  * corpus (/root/reference/tests/fixtures/cube/) plus seeded end-to-end
  * queries over the imported models. */
class CubeAdapterSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures/cube"

  private def session() = TestSpark.spark.newSession()

  test("ecommerce multi-cube: joins, segments, fan-out all execute") {
    val spark = session()
    import spark.implicits._
    Seq((1, "completed", 100, 1), (2, "completed", 200, 1), (3, "pending", 50, 2))
      .toDF("id", "status", "amount", "customer_id")
      .createOrReplaceTempView("orders")
    Seq((1, "Ada", "San Francisco", "CA"), (2, "Bo", "Portland", "OR"))
      .toDF("id", "name", "city", "state").createOrReplaceTempView("customers")
    Seq((1, 1, 10, 1, 60), (2, 1, 11, 2, 40), (3, 2, 10, 4, 200), (4, 3, 12, 1, 50))
      .toDF("id", "order_id", "product_id", "quantity", "price")
      .createOrReplaceTempView("line_items")

    val cat = Catalog().add(CubeAdapter.loadFile(
      s"$fixtures/ecommerce_multi_cube.yml"): _*)
    val gen = new Generator(spark, cat)

    // many_to_one join from the ${CUBE}.customer_id = ${customers.id} condition
    val byCity = gen.plan(SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("customers.city"),
      orderBy = Seq("city")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(byCity == Seq(("Portland", 50L), ("San Francisco", 300L)))

    // segment translated from ${CUBE}.status = 'completed'
    val completed = gen.plan(SemanticQuery(
      metrics = Seq("orders.revenue"),
      segments = Seq("orders.completed"))).collect()(0).getLong(0)
    assert(completed == 300L)

    // one_to_many fan-out: customer count must not multiply across orders
    val custCount = gen.plan(SemanticQuery(
      metrics = Seq("customers.count"),
      filters = Seq("orders.status = 'completed'"))).collect()(0).getLong(0)
    assert(custCount == 1L)
  }

  test("orders fixture: measure filters and the lifted ratio metric") {
    val spark = session()
    import spark.implicits._
    Seq((1, "completed", 100.0, 1), (2, "completed", 300.0, 1), (3, "pending", 100.0, 2))
      .toDF("id", "status", "amount", "customer_id")
      .createOrReplaceTempView("cube_orders")
    val cat = Catalog().add(CubeAdapter.loadFile(s"$fixtures/orders.yml",
      _ => ModelSource.Table("cube_orders")).filter(_.name == "orders"): _*)
    val got = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.revenue", "orders.completed_revenue",
        "orders.conversion_rate"))).collect()(0)
    assert(got.getDouble(0) == 500.0)
    assert(got.getDouble(1) == 400.0)  // filters: ${CUBE}.status = 'completed'
    assert(got.getDouble(2) == 0.8)    // ${completed_revenue} / NULLIF(${revenue}, 0)
  }

  test("kitchen sink: all cubes, joins, and measures import") {
    val models = CubeAdapter.loadFile(s"$fixtures/kitchen_sink.yml")
    assert(models.size >= 8)
    val byName = models.map(m => m.name -> m).toMap
    // belongsTo joins → many_to_one with structured keys
    val dept = byName("departments")
    val rel = dept.relationships.find(_.to == "companies").get
    assert(rel.relType == "many_to_one")
    assert(rel.foreignKey == Seq("company_id"))
    // rolling_window → hidden base + cumulative
    val ts = byName("timesheets")
    val cum = ts.metric("cumulative_hours").get
    assert(cum.kind == "cumulative")
    assert(cum.baseMetric.exists(b => ts.metric(b).exists(_.agg.isDefined)))
    // ratio pattern with ::float casts lifted to a ratio metric
    val ratio = ts.metric("billable_ratio").get
    assert(ratio.kind == "ratio")
    assert(ratio.numerator.contains("timesheets.billable_hours"))
    // the corpus loads into one catalog without validation errors
    Catalog().add(models: _*)
  }

  test("orders_with_preagg: pre-aggregation definitions survive the import") {
    val models = CubeAdapter.loadFile(s"$fixtures/orders_with_preagg.yml")
    val m = models.find(_.preAggregations.nonEmpty).get
    val pa = m.preAggregations.head
    assert(pa.measures.nonEmpty && pa.granularity.isDefined)
    Catalog().add(models: _*) // references must validate
  }

  test("access_policy row filters translate and enforce") {
    val spark = session()
    import spark.implicits._
    Seq((1, "NY", 10), (2, "SF", 20), (3, "NY", 30))
      .toDF("id", "city", "amount").createOrReplaceTempView("policy_rows")
    val models = CubeAdapter.loadString(
      """cubes:
        |  - name: sales
        |    sql_table: policy_rows
        |    dimensions:
        |      - name: id
        |        sql: id
        |        type: number
        |        primary_key: true
        |      - name: city
        |        sql: city
        |        type: string
        |    measures:
        |      - name: total
        |        sql: amount
        |        type: sum
        |    access_policy:
        |      - group: "*"
        |        row_level:
        |          filters:
        |            - member: city
        |              operator: equals
        |              values: [NY]
        |""".stripMargin)
    val pol = models.head.security.getOrElse(fail("access_policy dropped"))
    assert(pol.rowFilters == Seq("city = 'NY'"))
    val gen = new Generator(spark, Catalog().add(models: _*))
    val got = gen.plan(SemanticQuery(metrics = Seq("sales.total"),
      user = Some(Map.empty))).collect()(0).getLong(0)
    assert(got == 40L)
    // deny-by-default still applies: no user context, no rows
    intercept[SecurityException] {
      gen.plan(SemanticQuery(metrics = Seq("sales.total")))
    }
  }

  test("the whole cube fixture corpus parses") {
    val dir = new java.io.File(fixtures)
    val files = dir.listFiles().filter(f =>
      f.getName.endsWith(".yml") || f.getName.endsWith(".yaml"))
    assert(files.length >= 20)
    files.foreach { f =>
      val models = CubeAdapter.loadFile(f.getPath)
      assert(models != null, f.getName)
    }
  }

  test("whole-corpus directory load: intra-file extends and " +
      "joined-cube pre-agg dimensions resolve") {
    val cat = CubeAdapter.loadDirectory(fixtures)
    // extends_and_hierarchies.yml defines orders_base then extends it
    // in the SAME file — one add() call must resolve sibling extends
    assert(cat.models.contains("orders_base"))
    // pre_aggregation_types.yaml's multiplied_rollup stores a QUALIFIED
    // joined-cube dimension; it validates late-bound instead of failing
    // (its `visitors` cube is shadowed by a later file in the directory
    // catalog, so pin the single-file load — visitor_checkins follows
    // visitors in the same add() call, the late-bound branch)
    val single = Catalog().add(
      CubeAdapter.loadFile(s"$fixtures/pre_aggregation_types.yaml"): _*)
    assert(single.models("visitors").preAggregations.exists(pa =>
      pa.name == "multiplied_rollup" &&
        pa.dimensions.contains("visitor_checkins.source")))
  }
}
