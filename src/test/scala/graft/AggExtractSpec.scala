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
