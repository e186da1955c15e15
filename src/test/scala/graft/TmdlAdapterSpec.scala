package graft

import graft.adapters.TmdlAdapter
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Power BI TMDL importer against the reference's fixture corpora
  * (tests/fixtures/tmdl/, tmdl_realistic/, external_powerbi/). */
class TmdlAdapterSpec extends AnyFunSuite {
  private val fx = "/root/reference/tests/fixtures"

  test("basic tmdl: columns, keys, measures, relationship") {
    val imp = TmdlAdapter.loadDirectory(s"$fx/tmdl")
    val byName = imp.models.map(m => m.name -> m).toMap
    assert(byName.keySet == Set("Sales", "Products"))

    val sales = byName("Sales")
    assert(sales.primaryKey == Seq("SaleID"))
    // column name → sourceColumn mapping
    assert(sales.dimension("Order Date").exists(d =>
      d.dimType == DimType.Time && d.sql == Some("OrderDate")))
    // simple DAX aggregate
    assert(sales.metric("Total Sales").exists(m =>
      m.agg == Some("sum") && m.sql == Some("Amount")))
    // triple-backtick measure body
    assert(sales.metric("Backtick Measure").exists(m =>
      m.agg == Some("sum") && m.sql == Some("Amount")))
    // CALCULATE/time-intelligence measure → non-public stub
    assert(sales.metric("Sales LY").exists(m => !m.public))
    // relationship resolved through sourceColumns, many-to-one
    assert(sales.relationships.exists(r =>
      r.to == "Products" && r.relType == "many_to_one" &&
        r.foreignKey == Seq("ProductKey") && r.primaryKey == Seq("ProductKey")))
  }

  test("realistic tmdl: calculatedColumn, COUNTROWS, calculated table") {
    val imp = TmdlAdapter.loadDirectory(s"$fx/tmdl_realistic")
    val byName = imp.models.map(m => m.name -> m).toMap
    assert(byName.keySet ==
      Set("Sales", "Products", "Calendar", "Sales By Category"))
    val sales = byName("Sales")
    assert(sales.metric("Order Count").exists(m =>
      m.agg == Some("count") && m.sql.isEmpty))
    assert(sales.dimension("Amount x2").exists(_.sql == Some("Amount * 2")))
    // two relationships from the fact
    assert(sales.relationships.map(_.to).toSet == Set("Products", "Calendar"))
  }

  test("external Power BI repos parse without errors") {
    val repos = Option(new java.io.File(s"$fx/external_powerbi").listFiles())
      .getOrElse(Array.empty).filter(_.isDirectory)
      // marfolger-powerbi-dax is a raw DAX corpus without a TMDL definition
      .filter(r => new java.io.File(r, "definition").isDirectory)
    assert(repos.nonEmpty)
    repos.foreach { repo =>
      val imp = TmdlAdapter.loadDirectory(repo.getPath)
      assert(imp.models.nonEmpty, s"${repo.getName} produced no models")
      // every model has at least its columns
      assert(imp.models.forall(m => m.dimensions.nonEmpty || m.metrics.nonEmpty),
        s"${repo.getName} has an empty model")
    }
  }

  test("query end-to-end over a TMDL model bound to TPC-H") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = t =>
      ModelSource.SqlView(
        if (t == "Sales")
          s"""SELECT o_orderkey AS SaleID, o_custkey AS CustKey,
             |  cast(o_totalprice as decimal(18,2)) AS Amount
             |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin
        else
          s"""SELECT c_custkey AS CustKey, c_mktsegment AS Segment
             |FROM parquet.`${TestSpark.sfDir}/customer.parquet`""".stripMargin)
    val imp = TmdlAdapter.load(Seq(
      """table Sales
        |    column 'Sale ID'
        |        dataType: int64
        |        isKey
        |        sourceColumn: SaleID
        |    column CustKey
        |        dataType: int64
        |        sourceColumn: CustKey
        |    column Amount
        |        dataType: decimal
        |        sourceColumn: Amount
        |    measure 'Total Sales' = SUM(Sales[Amount])
        |    measure 'Order Count' = COUNTROWS(Sales)
        |    measure 'Avg Sale' = DIVIDE([Total Sales], [Order Count])
        |""".stripMargin,
      """table Customers
        |    column CustKey
        |        dataType: int64
        |        isKey
        |        sourceColumn: CustKey
        |    column Segment
        |        dataType: string
        |        sourceColumn: Segment
        |""".stripMargin,
      """relationship 'Sales-Customers'
        |    fromColumn: Sales[CustKey]
        |    toColumn: Customers[CustKey]
        |    fromCardinality: many
        |    toCardinality: one
        |""".stripMargin), resolve)
    val cat = Catalog().add(imp.models: _*)
    val out = new graft.gen.Generator(spark, cat).plan(graft.plan.SemanticQuery(
      metrics = Seq("Sales.Total Sales", "Sales.Order Count", "Sales.Avg Sale"),
      dimensions = Seq("Customers.Segment"),
      orderBy = Seq("Segment"))).collect()
    assert(out.length == 5)
    assert(out.forall(r => !r.isNullAt(3)))
  }
}
