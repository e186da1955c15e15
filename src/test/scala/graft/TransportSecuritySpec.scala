package graft

import graft.gen.Generator

import graft.sqlfront.{SqlFront, TransportSecurity}
import org.scalatest.funsuite.AnyFunSuite

/** Fail-closed SQL-transport gates (reference: core/transport_security.py).
  * The TPC-H catalog carries `orders_secured` (a row policy) and hidden
  * fields, so controls are ACTIVE on it by construction. */
class TransportSecuritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val cat = TpchCatalog.build(TestSpark.sfDir)
  private lazy val gen = new Generator(spark, cat)
  private lazy val front = new SqlFront(spark, cat, gen)

  private def refused(body: => Any): String =
    intercept[SecurityException](body).getMessage

  test("controls are active on the secured catalog") {
    assert(TransportSecurity.hasDeclaredSecurity(cat))
    assert(TransportSecurity.controlsAreActive(cat))
  }

  test("transport refuses raw source reads while controls are active") {
    val msg = refused(front.transportSql(
      "SELECT * FROM parquet.`/root/testdata/sf0.01/orders.parquet`",
      transport = "test_transport"))
    assert(msg.contains("test_transport") && msg.contains("non-semantic"))
    // an unregistered temp-view name is equally unprovable
    assert(refused(front.transportSql("SELECT * FROM some_view"))
      .contains("non-semantic source(s) some_view"))
  }

  test("transport refuses expression subqueries under controls") {
    val msg = refused(front.transportSql(
      "SELECT orders.revenue FROM orders " +
        "WHERE orders.orderpriority IN (SELECT p FROM orders)"))
    assert(msg.contains("expression subquery"))
  }

  test("transport refuses Yardstick AS MEASURE text under controls") {
    assert(refused(front.transportSql(
      "SELECT orderpriority, AGGREGATE(revenue) FROM orders GROUP BY 1"))
      .contains("Yardstick"))
  }

  test("projection-only SQL stays available; semantic SQL plans normally") {
    assert(front.transportSql("SELECT 1 AS one").collect()(0).getInt(0) == 1)
    val df = front.transportSql(
      "SELECT orders.orderpriority, orders.revenue FROM orders " +
        "ORDER BY orderpriority")
    assert(df.count() > 0)
  }

  test("transport threads user attributes into secured semantic queries " +
      "(deny-by-default without them)") {
    val denied = refused(front.transportSql(
      "SELECT orders_secured.revenue FROM orders_secured"))
    assert(denied.toLowerCase.contains("user"))
    val allowed = front.transportSql(
      "SELECT orders_secured.revenue FROM orders_secured",
      user = Some(Map("role" -> "analyst", "status" -> "F")))
    assert(allowed.count() == 1)
  }

  test("CTE references are recognized, but under controls a non-semantic " +
      "passthrough that reads anything is refused (reference conservatism)") {
    val msg = refused(front.transportSql(
      "WITH t AS (SELECT 1 AS n) SELECT n FROM t"))
    assert(msg.contains("left untouched"))
  }

  test("denyRawSql names every active control class") {
    val msg = intercept[SecurityException](
      TransportSecurity.denyRawSql(cat, "raw_db_endpoint")).getMessage
    assert(msg.contains("raw_db_endpoint"))
    assert(msg.contains("model access/row policies"))
  }

  test("with no controls declared, transportSql is plain sql() passthrough") {
    val open = cat.copy(models = cat.models.map { case (n, m) =>
      n -> m.copy(security = None,
        dimensions = m.dimensions.map(_.copy(public = true)),
        metrics = m.metrics.map(_.copy(public = true)))
    })
    assert(!TransportSecurity.controlsAreActive(open))
    val openFront = new SqlFront(spark, open, new Generator(spark, open))
    val s = spark; import s.implicits._
    Seq((41, "x")).toDF("n", "s").createOrReplaceTempView("ts_plain_rows")
    assert(openFront.transportSql("SELECT n + 1 AS m FROM ts_plain_rows")
      .collect()(0).getInt(0) == 42)
  }

  test("secured models bypass pre-aggregation routing (rollups have no " +
      "per-user row scope)") {
    import graft.plan.SemanticQuery
    gen.plan(SemanticQuery(
      metrics = Seq("orders_secured.revenue"),
      dimensions = Seq("orders_secured.orderstatus"),
      user = Some(Map("role" -> "analyst", "status" -> "F")))).collect()
    assert(gen.lastRoute != "preagg")
  }
}
