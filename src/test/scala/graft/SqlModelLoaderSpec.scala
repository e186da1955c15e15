package graft

import graft.load.SqlModelLoader
import org.scalatest.funsuite.AnyFunSuite

/** Statement splitting in the SQL DDL loader: `--` comment stripping
  * must respect ALL THREE quote kinds — a double-quoted identifier or
  * backtick-quoted name containing `--` is part of the name, not a
  * comment start (the loader is otherwise exercised end-to-end through
  * q_sql_ddl and LoadersSpec). */
class SqlModelLoaderSpec extends AnyFunSuite {

  test("`--` inside double quotes, backticks, or single quotes is not " +
      "a comment") {
    val models = SqlModelLoader.parse(
      """-- a real banner comment
        |MODEL (name ddl_q, table orders, primary_key o_orderkey);
        |DIMENSION (name dq, sql "a--b"); -- trailing comment
        |DIMENSION (name bq, sql `x--y`);
        |METRIC (name m1, agg sum, sql amount,
        |  filters "status = 'open--ish'");
        |METRIC (name m2, agg count);
        |""".stripMargin)
    assert(models.length === 1)
    val m = models.head
    // the quoted names survive intact — nothing truncated at `--`
    assert(m.dimensions.find(_.name == "dq").get.sql.get.contains("a--b"))
    assert(m.dimensions.find(_.name == "bq").get.sql.get.contains("x--y"))
    assert(m.metrics.find(_.name == "m1").get.filters
      .exists(_.contains("open--ish")))
    // everything after the quoted `--` still parsed (the old
    // single-quote-only scanner dropped the rest of each line)
    assert(m.metrics.exists(_.name == "m2"))
  }

  test("real comments are still stripped, including mid-statement") {
    val models = SqlModelLoader.parse(
      """MODEL (name ddl_c, -- inline comment inside the paren body
        |  table orders, primary_key o_orderkey);
        |-- a whole commented-out statement must vanish:
        |-- METRIC (name ghost, agg count);
        |METRIC (name real, agg count);
        |""".stripMargin)
    val m = models.head
    assert(m.name === "ddl_c")
    assert(m.metrics.map(_.name) === Seq("real"))
  }
}
