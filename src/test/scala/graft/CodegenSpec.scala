package graft

import graft.adapters.TmdlAdapter
import graft.load.Codegen
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Typed-schema codegen (reference: codegen.py / `generate types`). */
class CodegenSpec extends AnyFunSuite {

  private val cat = TpchCatalog.build("{dir}")

  test("schema JSON: deterministic, valid, typed") {
    val json = Codegen.generateSchemaJson(cat)
    // valid JSON (snakeyaml parses the JSON subset)
    val root = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Any]](json)
    val models = root.get("models").asInstanceOf[java.util.Map[String, Any]]
    assert(models.containsKey("orders") && models.containsKey("lineitem"))
    val orders = models.get("orders").asInstanceOf[java.util.Map[String, Any]]
    val dims = orders.get("dimensions").asInstanceOf[java.util.Map[String, Any]]
    val od = dims.get("order_date").asInstanceOf[java.util.Map[String, Any]]
    assert(od.get("kind") == "time" && od.get("type") == "java.sql.Timestamp")
    assert(od.get("grains").asInstanceOf[java.util.List[Any]].contains("month"))
    val mets = orders.get("metrics").asInstanceOf[java.util.Map[String, Any]]
    assert(mets.get("order_count").asInstanceOf[java.util.Map[String, Any]]
      .get("type") == "Long")
    assert(mets.get("revenue").asInstanceOf[java.util.Map[String, Any]]
      .get("type") == "Double")
    // regeneration is byte-identical
    assert(json == Codegen.generateSchemaJson(cat))
  }

  test("scala artifact: golden shape over the TPC-H catalog") {
    val src = Codegen.generateScala(cat)
    // golden excerpts: row classes + typed fields + constants
    assert(src.contains("package graft.generated"))
    assert(src.contains("final case class OrdersRow("))
    assert(src.contains("order_count: Option[Long]"))
    assert(src.contains("revenue: Option[Double]"))
    assert(src.contains("order_date: Option[java.sql.Timestamp]"))
    assert(src.contains("""val revenue = "orders.revenue""""))
    // deterministic
    assert(src == Codegen.generateScala(cat))
    // balanced braces/parens — cheap structural sanity for generated code
    assert(src.count(_ == '(') == src.count(_ == ')'))
    assert(src.count(_ == '{') == src.count(_ == '}'))
  }

  test("adapter import: spaced TMDL names escape to backticked idents") {
    val imp = TmdlAdapter.load(Seq(
      """table Sales
        |    column 'Order Date'
        |        dataType: date
        |        sourceColumn: OrderDate
        |    column Amount
        |        dataType: decimal
        |        sourceColumn: Amount
        |    measure 'Total Sales' = SUM(Sales[Amount])
        |""".stripMargin))
    val src = Codegen.generateScala(Catalog().add(imp.models: _*))
    assert(src.contains("final case class SalesRow("))
    assert(src.contains("`Order Date`: Option[java.sql.Timestamp]"))
    assert(src.contains("`Total Sales`: Option[Double]"))
    assert(src.contains("""val `Total Sales` = "Sales.Total Sales""""))
    // a `type`-named field must be escaped too
    val kw = Catalog().add(Model("kw", ModelSource.Table("t"),
      dimensions = Seq(Dimension("type"))))
    assert(Codegen.generateScala(kw).contains("`type`: Option[String]"))
  }

  test("hostile names: control chars escape in JSON, quotes in Scala, backticks reject") {
    val hostile = Catalog().add(Model("m1", ModelSource.Table("t"),
      dimensions = Seq(Dimension("tab\tand\rctl"),
        Dimension("say \"hi\""))))
    val json = Codegen.generateSchemaJson(hostile)
    // must stay parseable JSON with every control char escaped
    assert(!json.exists(c => c < 0x20))
    assert(json.contains("tab\\tand\\rctl\\u0001"))
    val root = new org.yaml.snakeyaml.Yaml().load[java.util.Map[String, Any]](json)
    val dims = root.get("models").asInstanceOf[java.util.Map[String, Any]]
      .get("m1").asInstanceOf[java.util.Map[String, Any]]
      .get("dimensions").asInstanceOf[java.util.Map[String, Any]]
    assert(dims.containsKey("tab\tand\rctl"))
    // Scala artifact: quoted name escapes inside the emitted string literal
    val quoted = Catalog().add(Model("m2", ModelSource.Table("t"),
      dimensions = Seq(Dimension("say \"hi\""))))
    val src = Codegen.generateScala(quoted)
    assert(src.contains("val `say \"hi\"` = \"m2.say \\\"hi\\\"\""))
    // backtick / control-char names can never be legal Scala identifiers
    intercept[IllegalArgumentException] {
      Codegen.generateScala(Catalog().add(Model("m3", ModelSource.Table("t"),
        dimensions = Seq(Dimension("back`tick")))))
    }
    intercept[IllegalArgumentException] {
      Codegen.generateScala(Catalog().add(Model("m4", ModelSource.Table("t"),
        dimensions = Seq(Dimension("ctlname")))))
    }
  }
}
