package graft

import graft.gen.Generator
import graft.plan.SemanticQuery
import graft.sqlfront.SqlFront
import org.scalatest.funsuite.AnyFunSuite

class SqlFrontSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val cat = TpchCatalog.build(TestSpark.sfDir)
  private lazy val gen = new Generator(spark, cat)
  private lazy val front = new SqlFront(spark, cat, gen)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(_.toSeq)

  test("simple semantic select compiles to the structured query") {
    val viaSql = front.sql(
      "SELECT orders.orderstatus, orders.revenue FROM orders ORDER BY orderstatus")
    val viaApi = gen.plan(SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("orders.orderstatus"),
      orderBy = Seq("orderstatus")))
    assert(rows(viaSql) == rows(viaApi))
  }

  test("cross-model select joins automatically") {
    val viaSql = front.sql(
      "SELECT customer.mktsegment, orders.revenue FROM orders ORDER BY mktsegment")
    assert(viaSql.columns.toSeq == Seq("mktsegment", "revenue"))
    assert(viaSql.count() == 5)
  }

  test("WHERE splits into pushdown and HAVING automatically") {
    val viaSql = front.sql(
      """SELECT orders.orderpriority, orders.revenue FROM orders
        |WHERE orders.orderstatus = 'F' AND orders.revenue > 1000
        |ORDER BY orderpriority""".stripMargin)
    val viaApi = gen.plan(SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("orders.orderpriority"),
      filters = Seq("orders.orderstatus = 'F'", "orders.revenue > 1000"),
      orderBy = Seq("orderpriority")))
    assert(rows(viaSql) == rows(viaApi))
  }

  test("HAVING clause routes to post-aggregation filter") {
    val viaSql = front.sql(
      """SELECT orders.orderpriority, orders.revenue FROM orders
        |GROUP BY orders.orderpriority HAVING orders.revenue > 75000000
        |ORDER BY orderpriority""".stripMargin)
    assert(viaSql.count() < 5)
  }

  test("time grain suffix works in SQL") {
    val viaSql = front.sql(
      "SELECT orders.order_date__month, orders.revenue FROM orders ORDER BY order_date__month LIMIT 3")
    assert(viaSql.columns.toSeq == Seq("order_date__month", "revenue"))
    assert(viaSql.count() == 3)
  }

  test("GROUP BY must echo dimensions") {
    val e = intercept[IllegalArgumentException](front.sql(
      "SELECT orders.orderstatus, orders.revenue FROM orders GROUP BY orders.orderpriority"))
    assert(e.getMessage.contains("echo"))
  }

  test("aliases rename output columns") {
    val df = front.sql(
      "SELECT orders.orderstatus AS status, orders.revenue AS total FROM orders ORDER BY status")
    assert(df.columns.toSeq == Seq("status", "total"))
  }

  test("non-semantic SQL passes through to Spark") {
    spark.read.parquet(s"${TestSpark.sfDir}/region.parquet")
      .createOrReplaceTempView("raw_region")
    val df = front.sql("SELECT count(*) AS n FROM raw_region")
    assert(df.collect()(0).getLong(0) == 5)
  }

  test("strict mode rejects non-semantic SQL") {
    intercept[IllegalArgumentException](
      front.sqlStrict("SELECT count(*) FROM raw_region"))
  }

  test("UNION of semantic branches") {
    val df = front.sql(
      """SELECT orders.orderstatus, orders.revenue FROM orders WHERE orders.orderstatus = 'F'
        |UNION ALL
        |SELECT orders.orderstatus, orders.revenue FROM orders WHERE orders.orderstatus = 'O'""".stripMargin)
    assert(df.count() == 2)
  }

  test("ungrouped metrics-only select returns the global aggregate") {
    val df = front.sql("SELECT orders.revenue, orders.order_count FROM orders")
    assert(df.count() == 1)
  }
}
