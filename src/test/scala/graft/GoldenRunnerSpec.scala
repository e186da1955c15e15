package graft

import graft.model._
import graft.testing.GoldenRunner
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's golden-runner battery
  * (reference: tests/test_testing.py — loader shape validation, runner
  * assertions and failure messages, live schema drift). */
class GoldenRunnerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // ---- fixture layer: 3 orders, revenue + order_count over a status dim ----
  spark.sql("""SELECT * FROM VALUES (1, 'paid', 100.0), (2, 'paid', 150.0),
    | (3, 'pending', 50.0) AS t(id, status, amount)""".stripMargin)
    .createOrReplaceTempView("gr_orders_t")
  private val ordersModel = Model(
    name = "gr_orders",
    source = ModelSource.Table("gr_orders_t"),
    primaryKey = Seq("id"),
    dimensions = Seq(Dimension("status")),
    metrics = Seq(
      Metric("revenue", agg = Some("sum"), sql = Some("amount")),
      Metric("order_count", agg = Some("count"))))
  private val cat = Catalog().add(ordersModel)

  private def runYaml(yaml: String): GoldenRunner.GoldenReport =
    GoldenRunner.run(spark, cat, GoldenRunner.loadString(yaml))

  // ---- loader shape validation ----

  test("loader parses valid cases") {
    val cases = GoldenRunner.loadString(
      """tests:
        |  - name: revenue
        |    sql: SELECT gr_orders.revenue FROM gr_orders
        |    expect:
        |      value: 250.0
        |      tolerance: 0.01""".stripMargin)
    assert(cases.size == 1)
    assert(cases.head.name == "revenue")
    assert(cases.head.expect.value.contains(250.0))
    assert(cases.head.expect.tolerance == 0.01)
  }

  test("loader rejects malformed documents with the reference messages") {
    def err(yaml: String): String =
      intercept[IllegalArgumentException](GoldenRunner.loadString(yaml)).getMessage
    assert(err("not_tests: []").contains("expected a top-level 'tests' list"))
    assert(err("tests:\n  - name: x\n    expect:\n      value: 1")
      .contains("missing a 'sql' string"))
    assert(err("tests:\n  - name: x\n    sql: SELECT 1")
      .contains("missing an 'expect' mapping"))
    assert(err("tests:\n  - name: x\n    sql: SELECT 1\n    expect:\n      value: 1\n      bogus: 2")
      .contains("unknown expect keys: bogus"))
    assert(err("tests:\n  - name: x\n    sql: SELECT 1\n    expect:\n      tolerance: 0.1")
      .contains("needs at least one of"))
  }

  // ---- runner assertions ----

  test("value with tolerance passes") {
    val report = runYaml(
      """tests:
        |  - name: revenue
        |    sql: SELECT gr_orders.revenue FROM gr_orders
        |    expect:
        |      value: 300.0
        |      tolerance: 0.5""".stripMargin)
    assert(report.passed, report.render)
    assert(report.results.head.message.isEmpty)
  }

  test("row_count passes") {
    val report = runYaml(
      """tests:
        |  - name: shape
        |    sql: SELECT gr_orders.status, gr_orders.revenue FROM gr_orders
        |    expect:
        |      row_count: 2""".stripMargin)
    assert(report.passed, report.render)
  }

  test("rows mismatch reports the offending cell") {
    val report = runYaml(
      """tests:
        |  - name: rows
        |    sql: SELECT gr_orders.status, gr_orders.revenue FROM gr_orders ORDER BY gr_orders.status
        |    expect:
        |      rows:
        |        - [paid, 999.0]
        |        - [pending, 50.0]""".stripMargin)
    assert(!report.passed)
    assert(report.results.head.message.get.contains("expected 999.0"))
  }

  test("exact rows pass in order") {
    val report = runYaml(
      """tests:
        |  - name: rows
        |    sql: SELECT gr_orders.status, gr_orders.revenue FROM gr_orders ORDER BY gr_orders.status
        |    expect:
        |      rows:
        |        - [paid, 250.0]
        |        - [pending, 50.0]
        |      columns: [status, revenue]""".stripMargin)
    assert(report.passed, report.render)
  }

  test("columns mismatch message") {
    val report = runYaml(
      """tests:
        |  - name: cols
        |    sql: SELECT gr_orders.status FROM gr_orders
        |    expect:
        |      columns: [wrong_name]""".stripMargin)
    assert(!report.passed)
    assert(report.results.head.message.get.contains("expected columns"))
  }

  test("query failure is reported, not thrown") {
    val report = runYaml(
      """tests:
        |  - name: broken
        |    sql: SELECT gr_orders.nonexistent FROM gr_orders
        |    expect:
        |      value: 1""".stripMargin)
    assert(!report.passed)
    assert(report.results.head.message.get.startsWith("query failed:"))
  }

  test("oversized result fails the case instead of collecting it") {
    // a miswritten case with no LIMIT must not pull the full result to the
    // driver — take(cap+1) bounds the transfer and the case fails loudly
    val big = GoldenRunner.GoldenCase(
      name = "runaway",
      sql = "unused",
      expect = GoldenRunner.Expectation(rowCount = Some(3)),
      source = "inline")
    val report = GoldenRunner.run(
      _ => spark.range(GoldenRunner.MaxGoldenRows + 10L).toDF("id"),
      Seq(big))
    assert(!report.passed)
    assert(report.results.head.message.get.contains("add a LIMIT"),
      report.results.head.message.toString)
  }

  test("report summarizes like to_dict and renders a diff") {
    val report = runYaml(
      """tests:
        |  - name: ok
        |    sql: SELECT gr_orders.revenue FROM gr_orders
        |    expect:
        |      value: 300.0
        |  - name: bad
        |    sql: SELECT gr_orders.revenue FROM gr_orders
        |    expect:
        |      value: 1.0""".stripMargin)
    val payload = report.toMap
    assert(payload("passed") == false)
    assert(payload("total") == 2)
    assert(payload("failed") == 1)
    assert(report.render.contains("FAIL bad"))
    assert(report.render.contains("2 test(s), 1 failed"))
  }

  // ---- live schema drift ----

  test("drift: happy path counts the model, no errors") {
    val report = GoldenRunner.checkSchemaDrift(spark, cat)
    assert(report.errors.isEmpty, report.errors.mkString("; "))
    assert(report.checkedModels == 1)
  }

  test("drift: missing dimension column, primary key, and foreign key") {
    spark.sql("SELECT * FROM VALUES (1, 'x') AS t(id, status)")
      .createOrReplaceTempView("gr_drift_t")
    val drifted = Model(
      name = "gr_drift",
      source = ModelSource.Table("gr_drift_t"),
      primaryKey = Seq("order_id"),
      dimensions = Seq(Dimension("ghost", sql = Some("does_not_exist"))),
      metrics = Seq(Metric("c", agg = Some("count"))),
      relationships = Seq(Relationship(to = "gr_orders",
        relType = "many_to_one", foreignKey = Seq("customer_id"))))
    val report = GoldenRunner.checkSchemaDrift(spark, Seq(drifted))
    assert(report.checkedModels == 1)
    assert(report.errors.exists(_.contains("does_not_exist")))
    assert(report.errors.exists(e =>
      e.contains("primary key") && e.contains("order_id")))
    assert(report.errors.exists(e =>
      e.contains("foreign key") && e.contains("customer_id")))
  }

  test("drift: unreadable source is an error and not counted") {
    val missing = Model(
      name = "gr_gone",
      source = ModelSource.Table("gr_no_such_table"),
      metrics = Seq(Metric("c", agg = Some("count"))))
    val report = GoldenRunner.checkSchemaDrift(spark, Seq(missing))
    assert(report.checkedModels == 0)
    assert(report.errors.exists(_.contains("cannot read")))
  }

  // ---- file discovery round-trip ----

  test("discovery finds tests/*.yml under a root, sorted") {
    val root = java.nio.file.Files.createTempDirectory("golden")
    val tests = java.nio.file.Files.createDirectory(root.resolve("tests"))
    java.nio.file.Files.write(tests.resolve("b.yml"),
      "tests:\n  - sql: SELECT 1 AS one\n    expect:\n      row_count: 1\n".getBytes)
    java.nio.file.Files.write(tests.resolve("a.yaml"),
      ("tests:\n  - name: rev\n    sql: SELECT gr_orders.revenue FROM gr_orders\n" +
        "    expect:\n      value: 300.0\n").getBytes)
    java.nio.file.Files.write(tests.resolve("ignore.txt"), "x".getBytes)
    val files = GoldenRunner.discoverTestFiles(root)
    assert(files.map(_.getFileName.toString) == Seq("a.yaml", "b.yml"))
    val report = GoldenRunner.run(spark, cat, GoldenRunner.loadTestFiles(files))
    assert(report.passed, report.render)
    assert(report.results.map(_.testCase.name) == Seq("rev", "test 1"))
  }
}
