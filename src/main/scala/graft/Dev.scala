package graft

import graft.gen.Generator
import graft.plan.SemanticQuery
import org.apache.spark.sql.SparkSession

/** Scratch driver for local iteration: `sbt "runMain graft.Dev"`. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide aggregates (LSH plane dots, simhash bit-sums) need per-
      // function codegen splitting or they overflow janino's 64 KB limit
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cat = TpchCatalog.build("/root/testdata/sf0.001")
    val gen = new Generator(spark, cat)

    def show(name: String, q: SemanticQuery): Unit = {
      println(s"=== $name")
      try gen.plan(q).show(8, truncate = false)
      catch { case e: Throwable =>
        println(s"FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }

    show("q1 simple agg", SemanticQuery(
      metrics = Seq("lineitem.quantity", "lineitem.net_revenue", "lineitem.item_count"),
      dimensions = Seq("lineitem.returnflag", "lineitem.linestatus"),
      orderBy = Seq("returnflag", "linestatus")))

    show("multi-hop join", SemanticQuery(
      metrics = Seq("lineitem.net_revenue"),
      dimensions = Seq("region.name"),
      orderBy = Seq("name")))

    show("time grain + filter", SemanticQuery(
      metrics = Seq("orders.revenue", "orders.order_count"),
      dimensions = Seq("orders.order_date__month"),
      filters = Seq("orders.orderstatus = 'F'"),
      orderBy = Seq("order_date__month"), limit = Some(5)))

    show("fanout symmetric", SemanticQuery(
      metrics = Seq("customer.total_acctbal", "customer.customer_count"),
      dimensions = Seq("orders.orderstatus"),
      orderBy = Seq("orderstatus")))

    show("multi-fact split", SemanticQuery(
      metrics = Seq("orders.revenue", "lineitem.quantity"),
      dimensions = Seq("customer.mktsegment"),
      orderBy = Seq("mktsegment")))

    show("ratio + derived", SemanticQuery(
      metrics = Seq("orders.aov", "orders.open_revenue_share"),
      dimensions = Seq("orders.orderpriority"),
      orderBy = Seq("orderpriority")))

    show("cumulative", SemanticQuery(
      metrics = Seq("orders.cumulative_revenue", "orders.revenue"),
      dimensions = Seq("orders.order_date__month"),
      orderBy = Seq("order_date__month"), limit = Some(6)))

    show("mom", SemanticQuery(
      metrics = Seq("orders.revenue_mom"),
      dimensions = Seq("orders.order_date__month"),
      orderBy = Seq("order_date__month"), limit = Some(6)))

    show("conversion", SemanticQuery(metrics = Seq("events.signup_conversion")))

    show("retention", SemanticQuery(
      metrics = Seq("events.signup_retention"),
      orderBy = Seq("cohort_date", "days_since"), limit = Some(10)))

    show("cohort", SemanticQuery(metrics = Seq("events.multi_type_users")))

    show("having + totals", SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("orders.orderpriority"),
      filters = Seq("orders.revenue > 1000000"),
      withTotals = true))

    show("ungrouped", SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("orders.orderstatus"),
      ungrouped = true, limit = Some(3), orderBy = Seq("o_orderkey")))

    show("security", SemanticQuery(
      metrics = Seq("orders_secured.revenue"),
      dimensions = Seq("orders_secured.orderstatus"),
      user = Some(Map("role" -> "analyst", "status" -> "F"))))

    show("graph ratio metric", SemanticQuery(metrics = Seq("revenue_per_item")))

    show("segment + relative date", SemanticQuery(
      metrics = Seq("orders.order_count"),
      segments = Seq("orders.fulfilled"),
      filters = Seq("orders.order_date >= 'last 400 weeks'"),
      anchorDate = Some("1999-01-01")))

    // semantic SQL front end
    val front = new graft.sqlfront.SqlFront(spark, cat, gen)
    println("=== sqlfront cross-model")
    front.sql(
      """SELECT customer.mktsegment, orders.revenue FROM orders
        |WHERE orders.orderstatus = 'F' ORDER BY mktsegment""".stripMargin)
      .show(5, truncate = false)
    println("=== sqlfront passthrough")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      .createOrReplaceTempView("raw_region")
    front.sql("SELECT count(*) AS n FROM raw_region").show()

    // native YAML loader on the reference's own fixture files
    println("=== yaml loader (reference fixture)")
    import spark.implicits._
    Seq((1, "paid", 100), (2, "paid", 150), (3, "refunded", 50))
      .toDF("order_id", "status", "amount").createOrReplaceTempView("fx_orders")
    val fxCat = graft.load.YamlLoader.loadDirectory(
      "/root/reference/tests/native-fixtures/basic_model/models",
      name => graft.model.ModelSource.Table(s"fx_$name"))
    new graft.gen.Generator(spark, fxCat).plan(SemanticQuery(
      metrics = Seq("orders.total_revenue"),
      dimensions = Seq("orders.status"), orderBy = Seq("status"))).show()

    // SparkSessionExtensions: semantic models in plain spark.sql
    println("=== extensions: spark.sql over semantic models")
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val ext = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide aggregates (LSH plane dots, simhash bit-sums) need per-
      // function codegen splitting or they overflow janino's 64 KB limit
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.sqlfront.GraftExtensions)
      .getOrCreate()
    graft.sqlfront.GraftExtensions.register(ext, cat)
    ext.sql("SELECT region.name, orders.revenue FROM orders ORDER BY name")
      .show(5, truncate = false)
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    org.apache.spark.sql.SparkSession.setDefaultSession(spark)

    // probes — these SHOULD fail with clear errors
    show("PROBE security: no role", SemanticQuery(
      metrics = Seq("orders_secured.revenue"), user = Some(Map("status" -> "F"))))
    show("PROBE median under fan-out", SemanticQuery(
      metrics = Seq("customer.median_acctbal"),
      dimensions = Seq("orders.orderstatus")))
    show("PROBE m2o chain keeps median legal", SemanticQuery(
      metrics = Seq("lineitem.median_quantity"),
      dimensions = Seq("part.brand"),
      filters = Seq("customer.mktsegment = 'AUTOMOBILE'"), limit = Some(3)))
    show("PROBE unknown metric", SemanticQuery(metrics = Seq("orders.nope")))

    spark.stop()
  }
}
