package graft

import graft.functions.Exprs
import graft.load.YamlLoader
import org.scalatest.funsuite.AnyFunSuite

/** Rendering-layer security properties: literal escaping against Spark's
  * parser (backslash escapes are ON by default), paired-quote stripping,
  * bracket-list rewriting, and YAML `security:` parsing.
  * (reference: core/security.py, docs/security.md) */
class SecuritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("userLiteral escapes backslashes as well as quotes") {
    // Spark's parser (escapedStringLiterals=false) treats backslash as an
    // escape inside string literals; doubling only the quote would let
    // \' OR 1=1 --  break out of the literal
    val df = {
      import spark.implicits._
      Seq(("F", 1), ("O", 2)).toDF("status", "n")
    }
    for (evil <- Seq("F' OR '1'='1", "\\' OR 1=1 --", "x\\", "a'b\\'c")) {
      val rendered = Exprs.renderUser(
        "status = {{ user.status }}", Map("status" -> evil))
      assert(df.filter(rendered).count() == 0, s"value <$evil> escaped")
    }
    // honest values still match
    val ok = Exprs.renderUser("status = {{ user.status }}", Map("status" -> "F"))
    assert(df.filter(ok).count() == 1)
  }

  test("paired author quotes strip; unpaired quotes belong to the SQL") {
    val r1 = Exprs.renderUser("region = '{{ user.region }}'", Map("region" -> "EU"))
    assert(r1 == "region = 'EU'")
    val r2 = Exprs.renderUser("region = {{ user.region }}", Map("region" -> "EU"))
    assert(r2 == "region = 'EU'")
    // unpaired quote from a neighboring literal is preserved, not consumed
    val r3 = Exprs.renderUser(
      "note = concat('x', {{ user.region }})", Map("region" -> "EU"))
    assert(r3 == "note = concat('x', 'EU')")
  }

  test("missing user attribute raises instead of rendering empty") {
    intercept[IllegalArgumentException] {
      Exprs.renderUser("tenant = {{ user.tenant }}", Map.empty)
    }
  }

  test("bracket lists rewrite in list context only; value brackets survive") {
    val r = Exprs.renderUserExpr(
      "user.role in ['ops[eu]','admin']", Map("role" -> "ops[eu]"))
    assert(r == "'ops[eu]' in ('ops[eu]','admin')")
    // no list context: brackets inside the rendered value untouched
    val r2 = Exprs.renderUserExpr("user.role = 'ops[eu]'", Map("role" -> "ops[eu]"))
    assert(r2 == "'ops[eu]' = 'ops[eu]'")
  }

  test("YAML security block parses into a SecurityPolicy") {
    val models = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: m
        |    table: m
        |    primary_key: id
        |    dimensions:
        |      - name: tenant_id
        |    security:
        |      access: "{{ user.role == 'admin' }}"
        |      row_filters:
        |        - "tenant_id = {{ user.tenant_id }}"
        |""".stripMargin)
    val pol = models.head.security.getOrElse(fail("security: dropped by loader"))
    assert(pol.access.contains("user.role = 'admin'"))
    assert(pol.rowFilters == Seq("tenant_id = {{ user.tenant_id }}"))
  }

  test("YAML access: false denies; access: true means no gate; unknown keys raise") {
    val denied = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: m
        |    table: m
        |    security:
        |      access: false
        |""".stripMargin)
    assert(denied.head.security.get.access.contains("false"))
    val open = YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: m
        |    table: m
        |    security:
        |      access: true
        |""".stripMargin)
    assert(open.head.security.get.access.isEmpty)
    intercept[IllegalArgumentException] {
      YamlLoader.loadString(
        """version: 1
          |models:
          |  - name: m
          |    table: m
          |    security:
          |      acces: true
          |""".stripMargin)
    }
  }

  test("a loaded secured model enforces its row filter end to end") {
    import spark.implicits._
    Seq((1, "t1", 10), (2, "t1", 20), (3, "t2", 30))
      .toDF("id", "tenant_id", "amount").createOrReplaceTempView("sec_rows")
    val cat = graft.model.Catalog().add(YamlLoader.loadString(
      """version: 1
        |models:
        |  - name: sec_rows
        |    table: sec_rows
        |    primary_key: id
        |    dimensions:
        |      - name: tenant_id
        |    metrics:
        |      - name: total
        |        agg: sum
        |        sql: amount
        |    security:
        |      row_filters:
        |        - "tenant_id = {{ user.tenant_id }}"
        |""".stripMargin): _*)
    val gen = new graft.gen.Generator(spark, cat)
    val got = gen.plan(graft.plan.SemanticQuery(
      metrics = Seq("sec_rows.total"),
      user = Some(Map("tenant_id" -> "t1")))).collect()
    assert(got.head.getLong(0) == 30L)
    intercept[SecurityException] {
      gen.plan(graft.plan.SemanticQuery(metrics = Seq("sec_rows.total")))
    }
  }
}
