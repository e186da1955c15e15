package graft

import graft.gen.FreshnessCheck
import graft.load.{YamlLoader, YamlWriter}
import graft.model._
import graft.testing.GoldenRunner
import org.scalatest.funsuite.AnyFunSuite

/** Freshness policies (reference: core/freshness.py): watermark / sql /
  * ttl_seconds on models and explores, MAX(watermark) probes, YAML
  * round-trip, and the staleness verdict. */
class FreshnessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")

  spark.sql(
    """SELECT * FROM VALUES
      |  (1, TIMESTAMP '2024-01-31 22:00:00'),
      |  (2, TIMESTAMP '2024-01-31 23:30:00') AS t(id, updated_at)""".stripMargin)
    .createOrReplaceTempView("fr_t")

  private def model(ttl: Option[Long], watermark: Option[String] = Some("updated_at"),
      sql: Option[String] = None) = Model(
    name = "fr_m", source = ModelSource.Table("fr_t"), primaryKey = Seq("id"),
    dimensions = Seq(Dimension("updated_at", DimType.Time)),
    freshness = Some(Freshness(watermark, sql, ttl)))

  test("watermark probe: max age vs ttl decides fresh/stale") {
    val fresh = FreshnessCheck.check(spark, Catalog().add(model(Some(3600))),
      "fr_m", asOf)
    assert(fresh.watermark.contains(java.sql.Timestamp.valueOf("2024-01-31 23:30:00")))
    assert(fresh.ageSeconds.contains(1800L))
    assert(fresh.fresh.contains(true))
    val stale = FreshnessCheck.check(spark, Catalog().add(model(Some(900))),
      "fr_m", asOf)
    assert(stale.fresh.contains(false))
    // ttl-less policy: probe-only, no verdict
    val probeOnly = FreshnessCheck.check(spark, Catalog().add(model(None)),
      "fr_m", asOf)
    assert(probeOnly.ageSeconds.contains(1800L) && probeOnly.fresh.isEmpty)
  }

  test("sql escape hatch: scalar marker query replaces the column probe") {
    val m = model(Some(86400), watermark = None,
      sql = Some("SELECT max(updated_at) FROM fr_t"))
    val r = FreshnessCheck.check(spark, Catalog().add(m), "fr_m", asOf)
    assert(r.ageSeconds.contains(1800L) && r.fresh.contains(true))
  }

  test("policy validation: watermark+sql conflict, non-positive ttl") {
    intercept[IllegalArgumentException] {
      Freshness(Some("a"), Some("SELECT 1"), Some(10))
    }
    intercept[IllegalArgumentException] { Freshness(Some("a"), None, Some(0)) }
    // a ttl with no watermark/sql probe could never be evaluated — the
    // declared contract would silently never run, so it is rejected
    intercept[IllegalArgumentException] { Freshness(None, None, Some(60)) }
    val e = intercept[IllegalArgumentException] {
      YamlLoader.loadPackageString(
        """models:
          |  - name: fr_ttl_only
          |    table: t
          |    primary_key: id
          |    freshness:
          |      ttl_seconds: 60
          |""".stripMargin)
    }
    assert(e.getMessage.contains("watermark or sql"))
  }

  test("yaml: parse, alias, unknown-key error, writer round-trip") {
    val pkg = YamlLoader.loadPackageString(
      """models:
        |  - name: fr_y
        |    table: fr_t
        |    primary_key: id
        |    dimensions:
        |      - name: updated_at
        |        type: time
        |    freshness:
        |      watermark: updated_at
        |      ttl_seconds: 3600
        |explores:
        |  - name: fr_explore
        |    model: fr_y
        |    freshness:
        |      watermark: updated_at
        |      ttlSeconds: 7200
        |""".stripMargin)
    val m = pkg.models.head
    assert(m.freshness.contains(Freshness(Some("updated_at"), None, Some(3600))))
    // camelCase alias accepted on explores too
    assert(pkg.explores.head.freshness.flatMap(_.ttlSeconds).contains(7200L))
    // writer round-trip preserves the policy
    val yaml = YamlWriter.write(Seq(m))
    val reloaded = YamlLoader.loadPackageString(yaml).models.head
    assert(reloaded.freshness == m.freshness)
    // unknown key is a hard error, not a silent drop
    val e = intercept[IllegalArgumentException] {
      YamlLoader.loadPackageString(
        """models:
          |  - name: bad
          |    table: fr_t
          |    freshness:
          |      watermark: updated_at
          |      max_lag: 10
          |""".stripMargin)
    }
    assert(e.getMessage.contains("max_lag"), e.getMessage)
    // conflicting double spelling is a hard error
    intercept[IllegalArgumentException] {
      YamlLoader.loadPackageString(
        """models:
          |  - name: bad2
          |    table: fr_t
          |    freshness:
          |      ttl_seconds: 10
          |      ttlSeconds: 20
          |""".stripMargin)
    }
  }

  test("extends inherits the parent policy unless overridden") {
    val cat = Catalog().add(model(Some(3600)))
      .add(Model("child", ModelSource.Table("fr_t"),
        extendsModel = Some("fr_m")))
    assert(cat.model("child").freshness.flatMap(_.ttlSeconds).contains(3600L))
    val cat2 = cat.add(Model("child2", ModelSource.Table("fr_t"),
      extendsModel = Some("fr_m"),
      freshness = Some(Freshness(Some("updated_at"), None, Some(60)))))
    assert(cat2.model("child2").freshness.flatMap(_.ttlSeconds).contains(60L))
  }

  test("golden case over the freshness battery") {
    FreshnessCheck.checkAll(spark, Catalog().add(model(Some(3600))), asOf)
      .createOrReplaceTempView("fr_report")
    val report = GoldenRunner.run(spark.sql(_: String), GoldenRunner.loadString(
      """tests:
        |  - name: freshness_verdict
        |    sql: SELECT name, age_seconds, is_fresh FROM fr_report
        |    expect:
        |      rows:
        |        - [fr_m, 1800, true]
        |      columns: [name, age_seconds, is_fresh]""".stripMargin))
    assert(report.passed, report.render)
  }
}
