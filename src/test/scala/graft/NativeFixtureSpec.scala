package graft

import graft.gen.Generator
import graft.load.YamlLoader
import graft.model.{Catalog, ModelSource}
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's native-fixture contract: the ACTUAL model YAML
  * from /root/reference/tests/native-fixtures/<fixture>/models/ loads
  * through our YamlLoader, the seed rows are registered as temp views, and
  * query results must equal expected/result.json.
  */
class NativeFixtureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fixtures = "/root/reference/tests/native-fixtures"
  private def viewResolver: YamlLoader.TableResolver =
    name => ModelSource.Table(s"fx_$name")

  private def loadCatalog(fixture: String): Catalog =
    YamlLoader.loadDirectory(s"$fixtures/$fixture/models", viewResolver)

  test("basic_model: revenue by status matches expected/result.json") {
    // seed/duckdb.sql: 3 orders (paid 100, paid 150, refunded 50)
    Seq(
      (1, "paid", 100, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2, "paid", 150, java.sql.Timestamp.valueOf("2026-01-02 10:00:00")),
      (3, "refunded", 50, java.sql.Timestamp.valueOf("2026-01-03 10:00:00")))
      .toDF("order_id", "status", "amount", "created_at")
      .createOrReplaceTempView("fx_orders")
    val cat = loadCatalog("basic_model")
    val got = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.total_revenue"),
      dimensions = Seq("orders.status"),
      orderBy = Seq("status")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("paid", 250L), ("refunded", 50L)))
  }

  test("relationships: cross-model metric × dimension") {
    Seq((1, "US"), (2, "UK"), (3, "DE"))
      .toDF("customer_id", "country").createOrReplaceTempView("fx_customers")
    Seq((1, 1, "completed", 100), (2, 1, "completed", 200), (3, 2, "pending", 50))
      .toDF("order_id", "customer_id", "status", "amount")
      .createOrReplaceTempView("fx_orders")
    val cat = loadCatalog("relationships")
    val got = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.total_revenue"),
      dimensions = Seq("customers.country"),
      orderBy = Seq("country")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("UK", 50L), ("US", 300L)))
  }

  test("fanout_symmetric_aggregation: one-side sum must not multiply") {
    // seed: customers US 1000, CA 500; orders cust1 paid×2 + pending,
    // cust2 paid → paid = 1500 (cust1 counted once), pending = 1000
    Seq((1, "US", 1000), (2, "CA", 500))
      .toDF("customer_id", "country", "credit_limit")
      .createOrReplaceTempView("fx_customers")
    Seq((101, 1, "paid"), (102, 1, "paid"), (103, 1, "pending"), (104, 2, "paid"))
      .toDF("order_id", "customer_id", "status")
      .createOrReplaceTempView("fx_orders")
    val cat = loadCatalog("fanout_symmetric_aggregation")
    val gen = new Generator(spark, cat)
    val got = gen.plan(SemanticQuery(
      metrics = Seq("customers.total_credit_limit"),
      dimensions = Seq("orders.status"),
      orderBy = Seq("status")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("paid", 1500L), ("pending", 1000L)))
    // and the ungrouped total is the plain sum
    val total = gen.plan(SemanticQuery(
      metrics = Seq("customers.total_credit_limit")))
      .collect()(0).getLong(0)
    assert(total == 1500L)
  }

  test("derived_ratio_metrics: expected/result.json values") {
    // seed: (paid 100/10), (paid 200/20), (refunded 50/5)
    Seq((1, "paid", 100, 10), (2, "paid", 200, 20), (3, "refunded", 50, 5))
      .toDF("order_id", "status", "amount", "discount_amount")
      .createOrReplaceTempView("fx_orders")
    val cat = loadCatalog("derived_ratio_metrics")
    val got = new Generator(spark, cat).plan(SemanticQuery(
      metrics = Seq("orders.net_revenue", "orders.average_order_value"),
      dimensions = Seq("orders.status"),
      orderBy = Seq("status"))).collect()
    assert(got(0).getString(0) == "paid")
    assert(got(0).getLong(1) == 270L)
    assert(got(0).getDouble(2) == 135.0)
    assert(got(1).getLong(1) == 45L && got(1).getDouble(2) == 45.0)
  }

  test("invalid fixtures: unknown field and unsupported version raise") {
    intercept[IllegalArgumentException] {
      loadCatalog("invalid_unknown_native_field")
    }
    intercept[IllegalArgumentException] {
      loadCatalog("unsupported_version")
    }
  }
}
