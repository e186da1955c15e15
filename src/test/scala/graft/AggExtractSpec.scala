package graft

import graft.load.{AggExtract, YamlLoader}
import org.scalatest.funsuite.AnyFunSuite

/** Agg auto-extraction from metric SQL strings (reference:
  * core/metric.py:68-226 — sqlglot there, Catalyst here). */
class AggExtractSpec extends AnyFunSuite {

  test("lone aggregate calls extract to (agg, inner, filter)") {
    assert(AggExtract.parse("SUM(amount)") ==
      Some(AggExtract.Extracted("sum", Some("amount"), None)))
    assert(AggExtract.parse("count(*)") ==
      Some(AggExtract.Extracted("count", None, None)))
    assert(AggExtract.parse("COUNT(DISTINCT user_id)") ==
      Some(AggExtract.Extracted("count_distinct", Some("user_id"), None)))
    assert(AggExtract.parse("AVG(price * qty)") ==
      Some(AggExtract.Extracted("avg", Some("(price * qty)"), None)))
    val filtered = AggExtract.parse(
      "SUM(amount) FILTER (WHERE status = 'done')")
    assert(filtered.exists(x => x.agg == "sum" && x.inner == Some("amount") &&
      x.filter.exists(_.toLowerCase.contains("status"))))
    assert(AggExtract.parse("stddev_samp(v)").map(_.agg) == Some("stddev"))
  }

  test("composite or non-aggregate expressions stay unextracted") {
    assert(AggExtract.parse("SUM(a) / SUM(b)").isEmpty)
    assert(AggExtract.parse("SUM(a) + 1").isEmpty)
    assert(AggExtract.parse("price * qty").isEmpty)
    assert(AggExtract.parse("revenue - cost").isEmpty)
  }

  test("yaml metric `sql: SUM(amount)` compiles identically to `agg: sum`") {
    val viaSql = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t1
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: revenue
        |        sql: SUM(amount)
        |      - name: done_count
        |        sql: COUNT(*) FILTER (WHERE status = 'done')
        |""".stripMargin)
    val viaAgg = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t2
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: revenue
        |        agg: sum
        |        sql: amount
        |""".stripMargin)
    val m1 = viaSql.head.metric("revenue").get
    val m2 = viaAgg.head.metric("revenue").get
    assert(m1.agg == m2.agg && m1.sql == m2.sql && m1.metricType.isEmpty)
    val dc = viaSql.head.metric("done_count").get
    assert(dc.agg == Some("count") && dc.sql.isEmpty &&
      dc.filters.exists(_.toLowerCase.contains("status")))
  }

  test("sql_is_complete and DAX expressions are preserved verbatim " +
      "(no extraction — core/metric.py:104-117)") {
    val ms = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t4
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: imported
        |        sql: SUM(amount)
        |        sql_is_complete: true
        |      - name: daxish
        |        sql: SUM(amount)
        |        expression_language: dax
        |""".stripMargin)
    val imp = ms.head.metric("imported").get
    assert(imp.agg.isEmpty && imp.sql == Some("SUM(amount)"))
    val dax = ms.head.metric("daxish").get
    assert(dax.agg.isEmpty && dax.sql == Some("SUM(amount)"))
  }

  test("sql_is_complete accepts YAML truthy spellings (yes/on/1) and " +
      "rejects unrecognized values loudly") {
    def load(v: String) = YamlLoader.loadString(
      s"""version: 1
         |models:
         |  - name: t4b
         |    table: orders
         |    primary_key: id
         |    metrics:
         |      - name: imported
         |        sql: SUM(amount)
         |        sql_is_complete: $v
         |""".stripMargin)
    // truthy spellings opt OUT of extraction (reference reads plain
    // truthiness); falsy spellings extract normally
    for (v <- Seq("yes", "on", "'1'", "TRUE"))
      assert(load(v).head.metric("imported").get.agg.isEmpty,
        s"sql_is_complete: $v must preserve verbatim")
    for (v <- Seq("no", "off", "'0'", "FALSE"))
      assert(load(v).head.metric("imported").get.agg == Some("sum"),
        s"sql_is_complete: $v must extract")
    val e = intercept[IllegalArgumentException](load("maybe"))
    assert(e.getMessage.contains("accepted spellings"))
  }

  test("user metric colliding with the reserved '<name>__base' hidden " +
      "name raises instead of silently shadowing") {
    val e = intercept[IllegalArgumentException](YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t4c
        |    table: orders
        |    primary_key: id
        |    dimensions:
        |      - name: order_date
        |        type: time
        |        granularity: day
        |    metrics:
        |      - name: running__base
        |        agg: sum
        |        sql: other_amount
        |      - name: running
        |        type: cumulative
        |        sql: SUM(amount)
        |""".stripMargin))
    assert(e.getMessage.contains("reserved") &&
      e.getMessage.contains("running__base"))
  }

  test("expr is an accepted alias of sql; both with different values raise") {
    val ms = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t5
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: revenue
        |        expr: SUM(amount)
        |""".stripMargin)
    val m = ms.head.metric("revenue").get
    assert(m.agg == Some("sum") && m.sql == Some("amount"))
    intercept[IllegalArgumentException](YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t6
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: bad
        |        sql: SUM(a)
        |        expr: SUM(b)
        |""".stripMargin))
  }

  test("cumulative with an inline aggregate decomposes to a hidden base " +
      "(reference allows extraction for cumulative, core/metric.py:115)") {
    val ms = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t7
        |    table: orders
        |    primary_key: id
        |    dimensions:
        |      - name: order_date
        |        type: time
        |        granularity: day
        |    metrics:
        |      - name: running_revenue
        |        type: cumulative
        |        sql: SUM(amount)
        |""".stripMargin)
    val base = ms.head.metric("running_revenue__base").get
    assert(base.agg == Some("sum") && base.sql == Some("amount") && !base.public)
    val cum = ms.head.metric("running_revenue").get
    assert(cum.metricType == Some("cumulative") &&
      cum.baseMetric == Some("running_revenue__base"))
    // and the decomposed pair plans end-to-end: the running total's last
    // bucket equals the plain sum of the whole table
    val spark = TestSpark.spark
    val resolve: YamlLoader.TableResolver = _ =>
      graft.model.ModelSource.SqlView(
        s"""SELECT o_orderkey, cast(o_totalprice as decimal(18,2)) AS amount,
           |  o_orderdate
           |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin)
    val pkg = YamlLoader.loadPackageString(
      """version: 1
        |models:
        |  - name: cx_orders
        |    table: orders
        |    primary_key: o_orderkey
        |    dimensions:
        |      - name: order_date
        |        type: time
        |        sql: o_orderdate
        |        granularity: day
        |    metrics:
        |      - name: running_revenue
        |        type: cumulative
        |        sql: SUM(amount)
        |""".stripMargin, resolve)
    val cat = graft.model.Catalog().add(pkg.models: _*)
    val df = new graft.gen.Generator(spark, cat).plan(
      graft.plan.SemanticQuery(
        metrics = Seq("cx_orders.running_revenue"),
        dimensions = Seq("cx_orders.order_date__month"),
        orderBy = Seq("order_date__month")))
    val last = df.collect().last.getAs[java.math.BigDecimal]("running_revenue")
    val total = spark.read
      .parquet(s"${TestSpark.sfDir}/orders.parquet")
      .selectExpr("sum(cast(o_totalprice as decimal(18,2))) AS t")
      .collect()(0).getAs[java.math.BigDecimal]("t")
    assert(last.compareTo(total) == 0,
      s"running total $last != table sum $total")

    // a NAMED base reference stays untouched (no false decomposition)
    val named = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t8
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: revenue
        |        agg: sum
        |        sql: amount
        |      - name: running
        |        type: cumulative
        |        sql: revenue
        |""".stripMargin)
    assert(named.head.metric("running").get.baseMetric == Some("revenue"))
    assert(named.head.metric("running__base").isEmpty)
  }

  test("derived formulas over other metrics are not captured") {
    val ms = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: t3
        |    table: orders
        |    primary_key: id
        |    metrics:
        |      - name: revenue
        |        sql: SUM(amount)
        |      - name: margin
        |        type: derived
        |        sql: revenue - cost
        |""".stripMargin)
    val margin = ms.head.metric("margin").get
    assert(margin.agg.isEmpty && margin.metricType == Some("derived") &&
      margin.sql == Some("revenue - cost"))
  }
}
