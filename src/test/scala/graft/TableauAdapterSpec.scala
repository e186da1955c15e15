package graft

import graft.adapters.TableauAdapter
import graft.gen.Generator
import graft.model._
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's Tableau adapter tests
  * (tests/adapters/tableau/test_parsing.py, test_formula.py,
  * test_relation_types.py) against the same fixture corpus. */
class TableauAdapterSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures/tableau"
  private def session() = TestSpark.spark

  test("orders.tds: single-table datasource, dims, metrics, pk") {
    val models = TableauAdapter.loadFile(s"$fixtures/orders.tds")
    assert(models.map(_.name) == Seq("orders"))
    val m = models.head
    assert(m.source == ModelSource.Table("public.orders"))
    assert(m.primaryKey == Seq("id"))

    val id = m.dimension("id").get
    assert(id.dimType == DimType.Numeric && id.label.contains("Order ID"))
    val od = m.dimension("order_date").get
    assert(od.dimType == DimType.Time && od.granularity.contains("day"))

    assert(m.metric("amount").exists(_.agg.contains("sum")))
    val oc = m.metric("order_count").get
    assert(oc.agg.contains("count") && oc.sql.contains("id"))
  }

  test("kitchen_sink.tds: full datatype and aggregation mapping") {
    val m = TableauAdapter.loadFile(s"$fixtures/kitchen_sink.tds").head
    assert(m.dimension("id").get.dimType == DimType.Numeric)
    assert(m.dimension("category").get.dimType == DimType.Categorical)
    val ed = m.dimension("event_date").get
    assert(ed.dimType == DimType.Time && ed.granularity.contains("day"))
    val ca = m.dimension("created_at").get
    assert(ca.dimType == DimType.Time && ca.granularity.contains("hour"))
    assert(m.dimension("is_active").get.dimType == DimType.Bool)
    assert(m.dimension("score").get.dimType == DimType.Numeric)

    assert(m.metric("amount").get.agg.contains("sum"))
    assert(m.metric("avg_amount").get.agg.contains("avg"))
    assert(m.metric("event_count").get.agg.contains("count"))
    val uu = m.metric("unique_users").get
    assert(uu.agg.contains("count_distinct") && uu.sql.contains("user_id"))
    assert(m.metric("min_amount").get.agg.contains("min"))
    assert(m.metric("max_amount").get.agg.contains("max"))
    assert(m.metric("median_amount").get.agg.contains("median"))
    // attr aggregation: no SQL equivalent -> derived passthrough
    val attr = m.metric("attr_amount").get
    assert(attr.metricType.contains("derived") && attr.agg.isEmpty)
    // ZN translation
    assert(m.metric("calc_safe_value").get.sql.get.contains("COALESCE(amount, 0)"))
    // LOD expression: untranslatable -> hidden with NULL sql
    val lod = m.metric("calc_lod").get
    assert(!lod.public && lod.sql.contains("NULL"))
    // group -> segment
    val seg = m.segment("Category Group").get
    assert(seg.sql == "category IN ('Tech', 'Science')")
  }

  test("sales_calcs.tds: formulas, hidden measures, drill paths") {
    val m = TableauAdapter.loadFile(s"$fixtures/sales_calcs.tds").head
    val rev = m.metric("calc_revenue").get
    assert(rev.agg.contains("sum"))
    assert(rev.sql.get.contains("price") && rev.sql.get.contains("quantity"))
    assert(m.metric("calc_safe_discount").get.sql.get.contains("COALESCE"))
    assert(!m.metric("hidden_cost").get.public)
    // drill path Geography: country > state > city
    assert(m.dimension("country").get.parent.isEmpty)
    assert(m.dimension("state").get.parent.contains("country"))
    assert(m.dimension("city").get.parent.contains("state"))
  }

  test("multi_join.tds: join tree becomes derived SQL + relationship") {
    val m = TableauAdapter.loadFile(s"$fixtures/multi_join.tds").head
    m.source match {
      case ModelSource.SqlView(sql) =>
        assert(sql.contains("SELECT * FROM public.orders"))
        assert(sql.contains("INNER JOIN public.customers"))
        assert(sql.contains("ON customer_id = id"))
      case other => fail(s"expected SqlView, got $other")
    }
    val rel = m.relationships.head
    assert(rel.to == "customers" && rel.relType == "many_to_one")
    assert(rel.foreignKey == Seq("customer_id") && rel.primaryKey == Seq("id"))
  }

  test("embedded.twb: workbook datasource extraction") {
    val models = TableauAdapter.loadFile(s"$fixtures/embedded.twb")
    val m = models.find(_.name == "orders").get
    assert(m.source == ModelSource.Table("public.orders"))
    assert(m.metric("amount").exists(_.agg.contains("sum")))
  }

  test("union.tds: members stack with UNION ALL") {
    val m = TableauAdapter.loadFile(s"$fixtures/union.tds").head
    m.source match {
      case ModelSource.SqlView(sql) =>
        assert(sql.contains("SELECT * FROM public.sales_2023"))
        assert(sql.contains("UNION ALL"))
        assert(sql.contains("SELECT * FROM public.sales_2024"))
      case other => fail(s"expected SqlView, got $other")
    }
  }

  test("tdsx zip: unpacks and parses the inner tds") {
    val tmp = java.nio.file.Files.createTempFile("orders", ".tdsx")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(tmp))
    zos.putNextEntry(new java.util.zip.ZipEntry("orders.tds"))
    zos.write(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$fixtures/orders.tds")))
    zos.closeEntry(); zos.close()
    val models = TableauAdapter.loadFile(tmp.toString)
    assert(models.map(_.name) == Seq("orders"))
    java.nio.file.Files.delete(tmp)
  }

  test("the whole tableau fixture corpus parses") {
    val files = new java.io.File(fixtures).listFiles()
      .filter(f => f.getName.endsWith(".tds") || f.getName.endsWith(".twb"))
    assert(files.length >= 12)
    files.foreach { f =>
      val models = TableauAdapter.loadFile(f.getPath)
      assert(models.nonEmpty, s"${f.getName} produced no models")
    }
  }

  // ---- formula translation (test_formula.py essentials) ----

  private def tr(f: String): String = TableauAdapter.translateFormula(f)._1.get

  test("formula: IIF, IF/ELSEIF, CONTAINS, DATEADD, quotes, concat") {
    assert(tr("IIF([a] > 1, \"big\", \"small\")") ==
      "CASE WHEN a > 1 THEN 'big' ELSE 'small' END")
    assert(tr("IF [x] > 0 THEN 1 ELSEIF [x] < 0 THEN -1 ELSE 0 END") ==
      "CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END")
    assert(tr("CONTAINS([name], \"abc\")") == "name LIKE '%' || 'abc' || '%'")
    assert(tr("DATEADD('month', 3, [d])") == "TIMESTAMPADD(month, 3, d)")
    assert(tr("\"it\"\"s\"") == "'it\"s'")
    assert(tr("[first] + \", \" + [last]") == "first || ', ' || last")
    assert(tr("MID([s], 2, 3)") == "SUBSTRING(s, 2, 3)")
    assert(tr("LEN([s])") == "LENGTH(s)")
    assert(tr("INT([x]) + FLOAT([y])") == "CAST(x AS INT) + CAST(y AS DOUBLE)")
    assert(tr("ISNULL([x])") == "(x IS NULL)")
    assert(tr("IFNULL([x], 0)") == "COALESCE(x, 0)")
    assert(tr("// note\n[a] * [b]") == "a * b")
    assert(tr("DATETRUNC('month', [d])") == "DATE_TRUNC('month', d)")
    assert(tr("COUNTD([user])") == "COUNT(DISTINCT user)")
  }

  test("formula: LOD and table calcs are untranslatable") {
    assert(!TableauAdapter.translateFormula("{FIXED [c] : SUM([a])}")._2)
    assert(!TableauAdapter.translateFormula("RUNNING_SUM(SUM([a]))")._2)
    assert(!TableauAdapter.translateFormula("RANK(SUM([a]))")._2)
    assert(!TableauAdapter.translateFormula("USERNAME()")._2)
    // but the same tokens inside string literals are fine
    assert(TableauAdapter.translateFormula("\"{FIXED} RANK(\"")._2)
  }

  test("end-to-end: orders.tds model queries through the Generator") {
    val spark = session()
    import spark.implicits._
    Seq((1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-02", 5.0))
      .toDF("id", "order_date", "amount")
      .createOrReplaceTempView("tableau_orders_tbl")
    val resolve: graft.load.YamlLoader.TableResolver =
      _ => ModelSource.Table("tableau_orders_tbl")
    val m = TableauAdapter.loadFile(s"$fixtures/orders.tds", resolve).head
    val cat = Catalog().add(m)
    val out = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.amount", "orders.order_count"),
      dimensions = Seq("orders.order_date"),
      orderBy = Seq("order_date"))).collect()
    assert(out.length == 2)
    assert(out(1).getDouble(1) == 25.0 && out(1).getLong(2) == 2L)
  }
}
