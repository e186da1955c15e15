package graft

import graft.adapters.{LkmlParser, LookMLAdapter}
import graft.gen.Generator
import graft.model.{Catalog, DimType, ModelSource}
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** LookML adapter conformance against the reference's lookml fixture
  * corpus (/root/reference/tests/fixtures/lookml/) plus seeded end-to-end
  * queries over the imported models. */
class LookMLAdapterSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures/lookml"

  private def session() = TestSpark.spark.newSession()

  test("lkml parser: blocks, sql terminators, lists, filters shorthand") {
    val doc = LkmlParser.parse(
      """# comment
        |view: orders {
        |  sql_table_name: public.orders ;;
        |  dimension: id {
        |    type: number
        |    primary_key: yes
        |    sql: ${TABLE}.id ;;
        |  }
        |  dimension_group: created {
        |    type: time
        |    timeframes: [date, week, month]
        |    sql: ${TABLE}.created_at ;;
        |  }
        |  measure: completed_revenue {
        |    type: sum
        |    sql: ${TABLE}.amount ;;
        |    filters: [status: "completed", amount: ">100"]
        |  }
        |}
        |""".stripMargin)
    val view = doc.objs("view").head
    assert(view.name.contains("orders"))
    assert(view.str("sql_table_name").contains("public.orders"))
    val dim = view.objs("dimension").head
    assert(dim.str("sql").contains("${TABLE}.id"))
    assert(dim.str("primary_key").contains("yes"))
    val group = view.objs("dimension_group").head
    assert(group.list("timeframes").collect {
      case LkmlParser.LStr(s) => s } == Seq("date", "week", "month"))
    val measure = view.objs("measure").head
    assert(measure.list("filters").collect {
      case LkmlParser.LPair(k, LkmlParser.LStr(v)) => (k, v) } ==
      Seq(("status", "completed"), ("amount", ">100")))
  }

  test("lkml parser: unterminated sql at EOF keeps the final character") {
    val doc = LkmlParser.parse(
      "view: v {\n  dimension: d {\n    sql: ${TABLE}.amount")
    val dim = doc.objs("view").head.objs("dimension").head
    assert(dim.str("sql").contains("${TABLE}.amount"))
  }

  test("orders fixture: measures, filtered measures, ratio, segments run") {
    val spark = session()
    import spark.implicits._
    Seq((1, "completed", 600.0, 1, "2024-01-03"),
        (2, "completed", 200.0, 1, "2024-02-05"),
        (3, "pending", 100.0, 2, "2024-02-07"))
      .toDF("id", "status", "amount", "customer_id", "created_at")
      .createOrReplaceTempView("lookml_orders")

    val imp = LookMLAdapter.loadFile(s"$fixtures/orders.lkml",
      _ => ModelSource.Table("lookml_orders"))
    val orders = imp.models.find(_.name == "orders").get
    assert(orders.primaryKey == Seq("id"))
    // dimension_group created → time dim with mapped granularities
    val created = orders.dimension("created").get
    assert(created.dimType == DimType.Time)
    assert(created.supportedGranularities == Seq("day", "week", "month", "year"))

    val cat = Catalog().add(imp.models.filter(_.name == "orders"): _*)
    val gen = new Generator(spark, cat)

    val got = gen.plan(SemanticQuery(metrics = Seq(
      "orders.count", "orders.revenue", "orders.completed_revenue",
      "orders.conversion_rate"))).collect()(0)
    assert(got.getLong(0) == 3L)
    assert(got.getDouble(1) == 900.0)
    assert(got.getDouble(2) == 800.0)  // filters: [status: "completed"]
    assert(math.abs(got.getDouble(3) - 800.0 / 900.0) < 1e-9) // ratio lift

    // filter: blocks import as segments
    val seg = gen.plan(SemanticQuery(metrics = Seq("orders.revenue"),
      segments = Seq("orders.high_value"))).collect()(0).getDouble(0)
    assert(seg == 600.0)

    // time grain over the dimension group
    val byMonth = gen.plan(SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("orders.created__month"),
      orderBy = Seq("created__month"))).collect()
    assert(byMonth.length == 2 && byMonth(1).getDouble(1) == 300.0)
  }

  test("ecommerce + explores: chained join edges land on the right models") {
    val views = LookMLAdapter.loadFiles(Seq(
      s"$fixtures/ecommerce.lkml", s"$fixtures/ecommerce_explores.lkml"))
    val byName = views.models.map(m => m.name -> m).toMap
    // orders → customers (many_to_one on explore: orders)
    val oc = byName("orders").relationships.find(_.to == "customers").get
    assert(oc.relType == "many_to_one" && oc.foreignKey == Seq("customer_id"))
    // chained join: ${order_items.product_id} = ${products.id} attaches to
    // order_items, not to the explore base
    val ip = byName("order_items").relationships.find(_.to == "products").get
    assert(ip.relType == "many_to_one" && ip.foreignKey == Seq("product_id"))
    // explores became contracts anchored at their base models
    assert(views.explores.exists(_.model == "orders"))
  }

  test("explore join graph executes a cross-view metric query") {
    val spark = session()
    import spark.implicits._
    Seq((1, 1, "completed", 100.0), (2, 1, "completed", 200.0), (3, 2, "pending", 50.0))
      .toDF("id", "customer_id", "status", "amount")
      .createOrReplaceTempView("ec_orders")
    Seq((1, "Ada", "US"), (2, "Bo", "DE"))
      .toDF("id", "name", "country").createOrReplaceTempView("ec_customers")

    val imp = LookMLAdapter.loadFiles(
      Seq(s"$fixtures/ecommerce.lkml", s"$fixtures/ecommerce_explores.lkml"),
      t => ModelSource.Table("ec_" + t.split('.').last))
    val cat = Catalog().add(
      imp.models.filter(m => Set("orders", "customers")(m.name))
        .map(m => m.copy(relationships = m.relationships.filter(r =>
          Set("orders", "customers")(r.to)))): _*)
    val out = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.total_revenue"),
      dimensions = Seq("customers.country"),
      orderBy = Seq("country")))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out == Seq(("DE", 50.0), ("US", 300.0)))
  }

  test("looker filter expressions translate to SQL") {
    import LookMLAdapter.lookerFilterToSql
    assert(lookerFilterToSql("status", "completed") ==
      "{model}.status = 'completed'")
    assert(lookerFilterToSql("amount", ">=500") == "{model}.amount >= 500")
    assert(lookerFilterToSql("status", "a,b") == "{model}.status IN ('a', 'b')")
    assert(lookerFilterToSql("status", "-cancelled") ==
      "{model}.status != 'cancelled'")
    assert(lookerFilterToSql("email", "%@gmail.com") ==
      "{model}.email LIKE '%@gmail.com'")
    assert(lookerFilterToSql("amount", "5 to 10") ==
      "({model}.amount >= 5 AND {model}.amount <= 10)")
    assert(lookerFilterToSql("deleted_at", "NULL") == "{model}.deleted_at IS NULL")
    assert(lookerFilterToSql("is_active", "yes") == "{model}.is_active = true")
  }

  test("refinements merge and extends resolves across files") {
    val imp = LookMLAdapter.loadString(
      """view: base_orders {
        |  sql_table_name: base ;;
        |  dimension: id {
        |    primary_key: yes
        |    type: number
        |  }
        |  measure: count {
        |    type: count
        |  }
        |}
        |view: +base_orders {
        |  dimension: status {
        |    type: string
        |  }
        |}
        |view: orders_ext {
        |  extends: [base_orders]
        |  measure: revenue {
        |    type: sum
        |    sql: ${TABLE}.amount ;;
        |  }
        |}
        |""".stripMargin)
    val base = imp.models.find(_.name == "base_orders").get
    assert(base.dimension("status").isDefined) // refinement merged
    val cat = Catalog().add(base)
      .add(imp.models.find(_.name == "orders_ext").get)
    val ext = cat.model("orders_ext")
    assert(ext.metric("count").isDefined && ext.metric("revenue").isDefined)
    assert(ext.primaryKey == Seq("id"))
  }

  test("the whole lookml fixture corpus parses without errors") {
    val dir = new java.io.File(fixtures)
    val files = dir.listFiles().filter(_.getName.endsWith(".lkml"))
    assert(files.length >= 40)
    files.foreach { f =>
      val doc = LkmlParser.parse(new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      assert(doc != null, f.getName)
      // views import to models without throwing
      LookMLAdapter.loadFile(f.getPath)
    }
  }

  test("whole-corpus directory load survives placeholder fixtures: " +
      "refinements deep-merge, self/unknown extends degrade to notes") {
    val (cat, rep) = graft.load.Fidelity.capture {
      LookMLAdapter.loadDirectory(fixtures)
    }
    assert(cat.models.nonEmpty)
    // `view: +deep_merging { dimension: dim { label: … } }` merges the
    // field onto the base — ONE dim, refined label — instead of
    // duplicating it (node_lookml_refinement_merging.model.lkml)
    val dm = cat.models("deep_merging")
    assert(dm.dimensions.count(_.name == "dim") == 1)
    assert(dm.dimensions.find(_.name == "dim").exists(d =>
      d.label == Some("My Dim")),
      dm.dimensions.find(_.name == "dim").toString)
    // the doc-placeholder corpus degrades, never crashes
    assert(rep.byConstruct("self_extends").nonEmpty)
    assert(rep.byConstruct("unknown_extends_base").nonEmpty)
  }
}
