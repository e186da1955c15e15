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
    // CALCULATE + SAMEPERIODLASTYEAR (behind VAR/RETURN) → executable
    // time_comparison carrying the prior-period value
    assert(sales.metric("Sales LY").exists(m =>
      m.public && m.metricType == Some("time_comparison") &&
        m.comparison == Some("yoy") && m.calculation == Some("prior") &&
        m.baseMetric == Some("Total Sales")))
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

  test("kitchen-sink DAX: >=80% of measures translate to executable metrics") {
    val imp = TmdlAdapter.load(Seq(
      """table Sales
        |    column SaleID
        |        dataType: int64
        |        isKey
        |        sourceColumn: SaleID
        |    column Region
        |        dataType: string
        |        sourceColumn: Region
        |    column OrderDate
        |        dataType: date
        |        sourceColumn: OrderDate
        |    column Amount
        |        dataType: decimal
        |        sourceColumn: Amount
        |    column Qty
        |        dataType: int64
        |        sourceColumn: Qty
        |    measure 'Total Sales' = SUM(Sales[Amount])
        |    measure 'Order Count' = COUNTROWS(Sales)
        |    measure 'Avg Sale' = DIVIDE([Total Sales], [Order Count])
        |    measure 'West Sales' = CALCULATE(SUM(Sales[Amount]), Sales[Region] = "West")
        |    measure 'Big West Sales' = CALCULATE(SUM(Sales[Amount]), Sales[Region] = "West" && Sales[Qty] > 10)
        |    measure 'Sales YTD' = TOTALYTD(SUM(Sales[Amount]), Sales[OrderDate])
        |    measure 'Sales QTD' = CALCULATE([Total Sales], DATESQTD(Sales[OrderDate]))
        |    measure 'Sales LY' = CALCULATE([Total Sales], SAMEPERIODLASTYEAR(Sales[OrderDate]))
        |    measure 'Sales PM' =
        |        VAR pm = CALCULATE([Total Sales], DATEADD(Sales[OrderDate], -1, MONTH))
        |        RETURN pm
        |    measure 'Sales Rank' = RANKX(ALL(Sales[Region]), [Total Sales])
        |    measure 'Filtered Sales' = CALCULATE(SUM(Sales[Amount]), FILTER(Sales, Sales[Qty] > 5))
        |    measure 'Sales Tier' = SWITCH(TRUE(), [Total Sales] > 1000, "High", [Total Sales] > 100, "Mid", "Low")
        |    measure 'Region Code' = SWITCH(Sales[Region], "West", 1, "East", 2, 0)
        |    measure 'Safe Avg' = IF(ISBLANK([Order Count]), BLANK(), DIVIDE([Total Sales], [Order Count]))
        |    measure 'Sales R3M' = CALCULATE([Total Sales], DATESINPERIOD(Sales[OrderDate], MAX(Sales[OrderDate]), -3, MONTH))
        |    measure 'Weighted Qty' = SUMX(Sales, Sales[Amount] * Sales[Qty])
        |""".stripMargin))
    val sales = imp.models.find(_.name == "Sales").get
    val declared = Seq("Total Sales", "Order Count", "Avg Sale", "West Sales",
      "Big West Sales", "Sales YTD", "Sales QTD", "Sales LY", "Sales PM",
      "Sales Rank", "Filtered Sales", "Sales Tier", "Region Code",
      "Safe Avg", "Sales R3M", "Weighted Qty")
    def isStub(m: graft.model.Metric): Boolean =
      !m.public && m.metricType == Some("derived")
    val executable = declared.filter(n => sales.metric(n).exists(!isStub(_)))
    // r16 closed the sink: RANKX lowers to a rank window and SUMX to an
    // aggregate-of-expression — every declared measure now executes
    assert(executable.size == declared.size,
      s"only ${executable.size}/${declared.size} executable: $executable")
    assert(sales.metric("Filtered Sales").exists(m =>
      m.agg == Some("sum") && m.filters == Seq("Qty > 5")))
    assert(sales.metric("Sales Tier").exists(m =>
      m.sql.exists(s => s.startsWith("CASE WHEN") && s.contains("'High'") &&
        s.contains("ELSE 'Low' END"))))
    assert(sales.metric("Region Code").exists(m =>
      m.sql.exists(s => s.contains("CASE Region WHEN 'West' THEN 1") &&
        s.contains("ELSE 0 END"))))
    assert(sales.metric("Safe Avg").exists(m =>
      m.sql.exists(s => s.contains("IS NULL") && s.contains("NULL") &&
        s.contains("NULLIF"))))
    assert(sales.metric("Sales R3M").exists(m =>
      m.metricType == Some("cumulative") && m.window == Some("3 month") &&
        m.baseMetric == Some("Total Sales")))
    // spot-check each translated shape
    assert(sales.metric("West Sales").exists(m =>
      m.agg == Some("sum") && m.filters == Seq("Region = 'West'")))
    assert(sales.metric("Big West Sales").exists(m =>
      m.filters == Seq("Region = 'West' AND Qty > 10")))
    assert(sales.metric("Sales YTD").exists(m =>
      m.metricType == Some("cumulative") && m.grainToDate == Some("year") &&
        m.baseMetric == Some("Sales YTD (Base)")))
    assert(sales.metric("Sales YTD (Base)").exists(m =>
      !m.public && m.agg == Some("sum")))
    assert(sales.metric("Sales QTD").exists(m =>
      m.grainToDate == Some("quarter") && m.baseMetric == Some("Total Sales")))
    assert(sales.metric("Sales PM").exists(m =>
      m.comparison == Some("mom") && m.calculation == Some("prior")))
    // RANKX → rank window over the grouped result, DESC by default;
    // ALL(Sales[Region]) pins the ranking domain to Region — the
    // planner refuses any other grouping (r16 ADVICE: lowering it
    // unconditionally silently diverged from DAX)
    assert(sales.metric("Sales Rank").exists(m =>
      m.metricType == Some("cumulative") &&
        m.windowExpression == Some("RANK()") &&
        m.windowOrder == Some("`Total Sales` DESC") &&
        m.windowDomain == Some("Region")))
    // SUMX over a same-table scalar body → aggregate-of-expression
    assert(sales.metric("Weighted Qty").exists(m =>
      m.agg == Some("sum") && m.sql.exists(s =>
        s.contains("Amount") && s.contains("*") && s.contains("Qty"))))
  }

  test("DAX IN-list braces translate to SQL IN; other braces stay stubs") {
    val imp = TmdlAdapter.load(Seq(
      """table Sales
        |    column Region
        |        dataType: string
        |        sourceColumn: Region
        |    column Amount
        |        dataType: decimal
        |        sourceColumn: Amount
        |    measure 'Coastal Sales' = CALCULATE(SUM(Sales[Amount]), Sales[Region] IN {"East", "West"})
        |    measure 'Table Ctor' = CALCULATE(SUM(Sales[Amount]), Sales[Region] = {"X"})
        |""".stripMargin))
    val sales = imp.models.find(_.name == "Sales").get
    // IN {...} is valid DAX but invalid SQL — must be requoted AND reparenthesized
    assert(sales.metric("Coastal Sales").exists(m =>
      m.public && m.agg == Some("sum") &&
        m.filters == Seq("Region IN ('East', 'West')")),
      sales.metric("Coastal Sales").toString)
    // a non-IN table constructor can't be translated: honest stub, never
    // invalid SQL stored on a public metric
    assert(sales.metric("Table Ctor").exists(m =>
      !m.public && m.filters.forall(f => !f.contains("{"))),
      sales.metric("Table Ctor").toString)
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

  test("RANKX(ALL(T[Col])) executes when the query groups by Col and " +
      "refuses any other grouping at plan time") {
    val spark = TestSpark.spark
    val resolve: graft.load.YamlLoader.TableResolver = _ =>
      ModelSource.SqlView(
        s"""SELECT o_orderkey AS SaleID, o_orderstatus AS Region,
           |  o_orderpriority AS Pri,
           |  cast(o_totalprice as decimal(18,2)) AS Amount
           |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin)
    val imp = TmdlAdapter.load(Seq(
      """table Sales
        |    column SaleID
        |        dataType: int64
        |        isKey
        |        sourceColumn: SaleID
        |    column Region
        |        dataType: string
        |        sourceColumn: Region
        |    column Pri
        |        dataType: string
        |        sourceColumn: Pri
        |    column Amount
        |        dataType: decimal
        |        sourceColumn: Amount
        |    measure 'Total Sales' = SUM(Sales[Amount])
        |    measure 'Sales Rank' = RANKX(ALL(Sales[Region]), [Total Sales])
        |""".stripMargin), resolve)
    val gen = new graft.gen.Generator(spark, Catalog().add(imp.models: _*))
    // grouped by the pinned domain: ranks across the Region values
    val ok = gen.plan(graft.plan.SemanticQuery(
        metrics = Seq("Sales.Total Sales", "Sales.Sales Rank"),
        dimensions = Seq("Sales.Region"), orderBy = Seq("Region")))
      .collect()
    assert(ok.length == 3) // orderstatus has 3 values
    val ranks = ok.map(_.getAs[Int]("Sales Rank")).sorted
    assert(ranks.toSeq == Seq(1, 2, 3),
      s"rank must span the grouped result, got ${ranks.toSeq}")
    // grouped by anything else: loud plan-time refusal, not a wrong rank
    val e = intercept[IllegalArgumentException] {
      gen.plan(graft.plan.SemanticQuery(
        metrics = Seq("Sales.Sales Rank"),
        dimensions = Seq("Sales.Pri")))
    }
    assert(e.getMessage.contains("Region"), e.getMessage)
  }
}
