package graft

import graft.gen.Generator
import graft.plan.SemanticQuery
import graft.sqlfront.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: semantic models usable from plain
  * spark.sql(...) on a session built with GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark // ensures a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("semantic models resolve inside plain spark.sql") {
    withExtendedSession { s =>
      val cat = TpchCatalog.build(TestSpark.sfDir)
      GraftExtensions.register(s, cat)
      val viaSql = s.sql(
        "SELECT orders.orderstatus, orders.revenue FROM orders ORDER BY orderstatus")
        .collect().map(_.toSeq).toSeq
      val viaApi = new Generator(s, cat).plan(SemanticQuery(
        metrics = Seq("orders.revenue"),
        dimensions = Seq("orders.orderstatus"),
        orderBy = Seq("orderstatus"))).collect().map(_.toSeq).toSeq
      assert(viaSql == viaApi)
    }
  }

  test("cross-model semantic SQL joins through the graph") {
    withExtendedSession { s =>
      GraftExtensions.register(s, TpchCatalog.build(TestSpark.sfDir))
      val df = s.sql(
        "SELECT region.name, orders.revenue FROM orders ORDER BY name")
      assert(df.columns.toSeq == Seq("name", "revenue"))
      assert(df.count() == 5)
    }
  }

  test("non-semantic SQL on the extended session is untouched") {
    withExtendedSession { s =>
      GraftExtensions.register(s, TpchCatalog.build(TestSpark.sfDir))
      s.read.parquet(s"${TestSpark.sfDir}/region.parquet")
        .createOrReplaceTempView("plain_region")
      assert(s.sql("SELECT count(*) FROM plain_region").collect()(0).getLong(0) == 5)
    }
  }
}
