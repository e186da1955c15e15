package graft

import graft.functions.Params
import graft.gen.Generator
import graft.load.YamlLoader
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** Typed parameters + Jinja-subset templates (reference:
  * core/parameter.py format_value, core/template.py,
  * tests/templates/test_parameters.py). */
class ParamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("typed formatting mirrors format_value") {
    assert(Params.format("string", "completed") == "'completed'")
    assert(Params.format("date", "2024-01-15") == "'2024-01-15'")
    assert(Params.format("number", "100") == "100")
    assert(Params.format("number", "-2.5") == "-2.5")
    assert(Params.format("unquoted", "orders") == "orders")
    assert(Params.format("unquoted", "schema.orders") == "schema.orders")
    assert(Params.format("yesno", "true") == "TRUE")
    assert(Params.format("yesno", "false") == "FALSE")
  }

  test("injection-shaped values cannot escape their type") {
    // quote-bearing string stays one literal
    assert(Params.format("string", "x' OR '1'='1") == "'x'' OR ''1''=''1'")
    assert(Params.format("string", raw"\' OR 1=1 --") ==
      raw"'\\'' OR 1=1 --'")
    intercept[IllegalArgumentException](Params.format("number", "1 OR 1=1"))
    intercept[IllegalArgumentException](Params.format("number", "1; DROP TABLE x"))
    intercept[IllegalArgumentException](Params.format("unquoted", "orders; --"))
    intercept[IllegalArgumentException](Params.format("unquoted", "a b"))
  }

  test("jinja subset: comments, if/elif/else, substitution") {
    assert(Params.render("SELECT * FROM {{ table }}",
      Map("table" -> "orders")) == "SELECT * FROM orders")
    assert(Params.render("{# note #}a = 1", Map.empty) == "a = 1")
    assert(Params.render("{% if active %}status = 'active'{% endif %}",
      Map("active" -> "true")) == "status = 'active'")
    assert(Params.render("{% if active %}x{% endif %}",
      Map("active" -> "false")) == "")
    assert(Params.render("{% if region == 'US' %}us{% else %}intl{% endif %}",
      Map("region" -> "US")) == "us")
    assert(Params.render("{% if region == 'US' %}us{% else %}intl{% endif %}",
      Map("region" -> "'EU'")) == "intl") // formatted value compares raw
    assert(Params.render(
      "{% if r == 'a' %}A{% elif r == 'b' %}B{% else %}C{% endif %}",
      Map("r" -> "b")) == "B")
    assert(Params.render("{% if not flag %}off{% endif %}", Map.empty) == "off")
  }

  test("and/or inside a quoted literal stays a plain comparison") {
    // the comparison form must match BEFORE the compound-condition guard:
    // 'Food and Drink' contains ' and ' but is a string literal, not a
    // conjunction
    assert(Params.render(
      "{% if seg == 'Food and Drink' %}fnd{% else %}other{% endif %}",
      Map("seg" -> "Food and Drink")) == "fnd")
    assert(Params.render(
      "{% if seg == 'Food and Drink' %}fnd{% else %}other{% endif %}",
      Map("seg" -> "Toys")) == "other")
    assert(Params.render(
      "{% if seg != 'Rock or Pop' %}x{% endif %}",
      Map("seg" -> "'Rock or Pop'")) == "") // formatted value compares raw
  }

  test("templates outside the subset are refused, not silently mis-rendered") {
    // nested if: the flat non-greedy matcher would mis-pair endifs
    intercept[IllegalArgumentException] {
      Params.render("{% if a %}X{% if b %}Y{% endif %}Z{% endif %}",
        Map("a" -> "true", "b" -> "true"))
    }
    // variable-in-variable membership stays outside the subset (the
    // supported forms are quoted-literal lists on either side)
    intercept[IllegalArgumentException] {
      Params.render("{% if x in xs %}X{% endif %}", Map("x" -> "1"))
    }
    // unbalanced grouping is refused, not guessed
    intercept[IllegalArgumentException] {
      Params.render("{% if (a and (b) %}X{% endif %}", Map("a" -> "true"))
    }
    // membership against an unquoted list refuses (an unquoted RHS is
    // outside the subset, same as comparisons)
    intercept[IllegalArgumentException] {
      Params.render("{% if x in [a, b] %}X{% endif %}", Map("x" -> "1"))
    }
    // a dangling and/or is malformed, not a lookup of the empty key
    intercept[IllegalArgumentException] {
      Params.render("{% if a and %}X{% endif %}", Map("a" -> "true"))
    }
    // a stray endif (or any other {% %} construct) is refused
    intercept[IllegalArgumentException] {
      Params.render("head {% endif %} tail", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Params.render("{% for x in xs %}{{ x }}{% endfor %}", Map.empty)
    }
  }

  test("jinja subset: compound and/or conditions at Jinja precedence") {
    val ctx = Map("region" -> "'west'", "tier" -> "'gold'", "flag" -> "true")
    def r(cond: String) =
      Params.render(s"{% if $cond %}Y{% else %}N{% endif %}", ctx)
    assert(r("region == 'west' and tier == 'gold'") == "Y")
    assert(r("region == 'east' and tier == 'gold'") == "N")
    assert(r("region == 'east' or tier == 'gold'") == "Y")
    // `and` binds tighter than `or`: false-and-X or true → true
    assert(r("region == 'east' and flag or tier == 'gold'") == "Y")
    // `not` applies to its atom; missing variables are falsy
    assert(r("not missing and flag") == "Y")
    assert(r("flag and missing") == "N")
    // a quoted literal containing the words stays one comparison
    assert(Params.render(
      "{% if seg == 'Food and Drink' or seg == 'Bars or Pubs' %}Y{% endif %}",
      Map("seg" -> "'Food and Drink'")) == "Y")
    // elif branches evaluate compound conditions too
    assert(Params.render(
      "{% if a and b %}1{% elif a or b %}2{% else %}3{% endif %}",
      Map("a" -> "true")) == "2")
  }

  test("jinja subset: parenthesized conditions group at Jinja precedence") {
    val ctx = Map("region" -> "'west'", "flag" -> "true")
    def r(cond: String) =
      Params.render(s"{% if $cond %}Y{% else %}N{% endif %}", ctx)
    // grouping overrides and-over-or: (false or true) and true → true,
    // where the ungrouped read false-or-(true-and-true) is ALSO true —
    // so pin the distinguishing shape: (true or x) and false → false
    assert(r("(region == 'east' or flag) and region == 'west'") == "Y")
    assert(r("(flag or missing) and region == 'east'") == "N")
    assert(r("flag or (missing and region == 'west')") == "Y")
    // not distributes over a group
    assert(r("not (missing or region == 'east')") == "Y")
    assert(r("not (flag or missing)") == "N")
    // nesting and quoted parens inside literals
    assert(r("((region == 'west'))") == "Y")
    assert(Params.render(
      "{% if (seg == 'a (small)' or flag) %}Y{% endif %}",
      Map("seg" -> "'a (small)'")) == "Y")
  }

  test("jinja subset: in / not in membership") {
    val ctx = Map("region" -> "'west'", "statuses" -> "open,paid,closed")
    def r(cond: String) =
      Params.render(s"{% if $cond %}Y{% else %}N{% endif %}", ctx)
    // variable against a quoted-literal list (list and tuple syntax)
    assert(r("region in ['west', 'east']") == "Y")
    assert(r("region in ['north', 'east']") == "N")
    assert(r("region not in ['north', 'east']") == "Y")
    assert(r("region in ('west', 'east')") == "Y")
    // quoted literal against the context's comma-separated list form
    assert(r("'paid' in statuses") == "Y")
    assert(r("'void' in statuses") == "N")
    assert(r("'void' not in statuses") == "Y")
    // prefix not parses as not (x in y) — Jinja's reading
    assert(r("not region in ['north']") == "Y")
    // membership composes with and/or and grouping
    assert(r("region in ['west'] and 'open' in statuses") == "Y")
    assert(r("(region in ['north']) or 'paid' in statuses") == "Y")
    // missing variable on the left is simply not a member
    assert(r("missing in ['west']") == "N")
    // membership in an UNDEFINED list variable is an error (strict
    // undefined, like for-loops), not an empty-list pass
    intercept[IllegalArgumentException] { r("'x' in nothere") }
  }

  test("jinja subset: dotted names compare like plain variables " +
      "(loop.index inside a for body)") {
    val out = Params.render(
      "{% for s in statuses %}{% if loop.index == '2' %}[{{ s }}]{% else %}{{ s }}{% endif %} {% endfor %}",
      Map("statuses" -> "a,b,c"))
    assert(out == "a [b] c ", s"got '$out'")
  }

  test("jinja subset: join filter re-delimits a context list") {
    assert(Params.render("IN ({{ statuses | join(' , ') }})",
      Map("statuses" -> "a,b,c")) == "IN (a , b , c)")
    // no argument joins with the empty separator (Jinja's default)
    assert(Params.render("{{ statuses | join }}",
      Map("statuses" -> "a, b, c")) == "abc")
    // unbound variable passes through for the next context layer
    assert(Params.render("{{ nope | join(',') }}", Map.empty)
      == "{{ nope | join(',') }}")
  }

  test("jinja subset: for loops with loop bindings (mirrors the " +
      "reference's test_template_with_loop)") {
    // the reference's canonical loop case, verbatim template
    assert(Params.render(
      "id IN ({% for id in ids %}{{ id }}{% if not loop.last %}, " +
        "{% endif %}{% endfor %})",
      Map("ids" -> "1,2,3")) == "id IN (1, 2, 3)")
    // loop.first separators and 1-based loop.index
    assert(Params.render(
      "{% for c in cols %}{% if not loop.first %} AND {% endif %}" +
        "{{ c }} = {{ loop.index }}{% endfor %}",
      Map("cols" -> "a,b")) == "a = 1 AND b = 2")
    // an if around the loop still resolves
    assert(Params.render(
      "{% if go %}({% for x in xs %}{{ x }};{% endfor %}){% endif %}",
      Map("go" -> "true", "xs" -> "p, q")) == "(p;q;)")
    // nested for is refused, not mis-paired
    intercept[IllegalArgumentException] {
      Params.render(
        "{% for x in xs %}{% for y in xs %}z{% endfor %}{% endfor %}",
        Map("xs" -> "1"))
    }
  }

  test("jinja subset: default/upper/lower filters (mirrors the " +
      "reference's test_template_with_filters)") {
    assert(Params.render("SELECT {{ col | upper }}",
      Map("col" -> "name")) == "SELECT NAME")
    assert(Params.render("{{ col | lower }}",
      Map("col" -> "NAME")) == "name")
    assert(Params.render("{{ region | default('all') }}",
      Map.empty) == "all")
    assert(Params.render("{{ region | default('all') }}",
      Map("region" -> "emea")) == "emea")
    // filters outside the subset refuse loudly
    intercept[IllegalArgumentException] {
      Params.render("{{ col | trim }}", Map("col" -> "x"))
    }
    // dict iteration over a value NOT in the key: value map form is
    // refused, not silently bound to an empty value
    intercept[IllegalArgumentException] {
      Params.render("{% for k, v in m.items() %}{{ k }}{% endfor %}",
        Map("m" -> "x"))
    }
  }

  test("jinja subset: dict iteration via .items() over the key: value " +
      "map form (mirrors the reference's test_complex_template_example)") {
    val out = Params.render(
      """CASE {% for status, value in status_map.items() %}WHEN status = '{{ status }}' THEN {{ value }} {% endfor %}ELSE 0 END""",
      Map("status_map" -> "completed: 1, pending: 0.5, cancelled: 0"))
    assert(out.contains("WHEN status = 'completed' THEN 1"))
    assert(out.contains("WHEN status = 'pending' THEN 0.5"))
    assert(out.contains("ELSE 0"))
    // loop bindings work in the items() form too
    assert(Params.render(
      "{% for k, v in m.items() %}{{ k }}={{ v }}{% if not loop.last %},{% endif %}{% endfor %}",
      Map("m" -> "a:1,b:2")) == "a=1,b=2")
  }

  test("declared typed parameter quotes itself; injection value returns no rows") {
    spark.sql(
      """SELECT * FROM VALUES (1, 'pending', 10.0), (2, 'completed', 20.0),
        |  (3, 'pending', 5.0) AS t(id, status, amount)""".stripMargin)
      .createOrReplaceTempView("param_orders")
    val pkg = YamlLoader.loadPackageString(
      """version: 1
        |parameters:
        |  - name: status_filter
        |    type: string
        |    default_value: pending
        |models:
        |  - name: porders
        |    table: param_orders
        |    primary_key: id
        |    dimensions:
        |      - name: status
        |    metrics:
        |      - name: revenue
        |        agg: sum
        |        sql: amount
        |""".stripMargin)
    val cat = graft.model.Catalog().add(pkg.models: _*)
      .withParamDefaults(pkg.paramDefaults).withParamTypes(pkg.paramTypes)
    val gen = new Generator(spark, cat)
    // the filter references the param UNQUOTED — the type adds the quotes
    def run(value: Option[String]) = gen.plan(SemanticQuery(
      metrics = Seq("porders.revenue"),
      filters = Seq("porders.status = {{ status_filter }}"),
      parameters = value.map("status_filter" -> _).toMap)).collect()
    assert(run(None).head.getDecimal(0).doubleValue() == 15.0) // default
    assert(run(Some("completed")).head.getDecimal(0).doubleValue() == 20.0)
    // quote-bearing injection value matches nothing instead of everything
    val inj = run(Some("x' OR '1'='1"))
    assert(inj.isEmpty || inj.head.isNullAt(0))
  }
}
