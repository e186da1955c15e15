package graft

import graft.gen.Generator
import graft.load.Bootstrap
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bootstrapped catalog from parquet dir is immediately queryable") {
    val cat = Bootstrap.fromParquetDir(spark, TestSpark.sfDir)
    assert(cat.models.keySet.contains("orders"))
    val orders = cat.model("orders")
    assert(orders.primaryKey == Seq("o_orderkey"))
    assert(orders.dimension("o_orderdate").exists(_.dimType == graft.model.DimType.Time))
    assert(orders.metric("total_o_totalprice").isDefined)

    val got = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.row_count", "orders.total_o_totalprice"),
      dimensions = Seq("orders.o_orderstatus"),
      orderBy = Seq("o_orderstatus"))).collect()
    assert(got.length == 3)
    val want = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet").count()
    assert(got.map(_.getLong(1)).sum == want)
  }

  test("documents/embeddings bootstrap too (no time dim, binary-ish cols)") {
    val cat = Bootstrap.fromParquetDir(spark, TestSpark.sfDir)
    assert(cat.model("documents").metric("row_count").isDefined)
    assert(cat.model("embeddings").dimension("embedding").isDefined)
  }
}
