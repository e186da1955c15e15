package graft

import graft.gen.Generator
import graft.plan.SemanticQuery
import org.apache.spark.sql.SparkSession

/** Plan inspection: sbt "runMain graft.DevExplain". */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gen = new Generator(spark, TpchCatalog.build("/root/testdata/sf0.1"))

    def ex(name: String, q: SemanticQuery): Unit = {
      println(s"########## $name")
      gen.plan(q).explain("formatted")
    }

    ex("multi_hop", SemanticQuery(
      metrics = Seq("orders.revenue"),
      dimensions = Seq("region.name")))

    ex("filter_pushdown", SemanticQuery(
      metrics = Seq("lineitem.net_revenue"),
      dimensions = Seq("nation.name"),
      filters = Seq("orders.orderstatus = 'F'",
        "lineitem.shipdate >= '1997-01-01'")))

    ex("fanout", SemanticQuery(
      metrics = Seq("customer.total_acctbal"),
      dimensions = Seq("orders.orderstatus")))

    // the user-facing explain surface: route + formatted physical plan
    println("########## gen.explain output")
    println(gen.explain(SemanticQuery(
      metrics = Seq("customer.total_acctbal"),
      dimensions = Seq("orders.orderstatus"))).linesIterator.take(12).mkString("\n"))
    println(gen.explain(SemanticQuery(
      metrics = Seq("orders.revenue", "lineitem.quantity"),
      dimensions = Seq("customer.mktsegment"))).linesIterator.take(4).mkString("\n"))
    println(gen.explain(SemanticQuery(
      metrics = Seq("events.signup_retention"))).linesIterator.take(4).mkString("\n"))

    spark.stop()
  }
}
