package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's FULL native fixture corpus, driven by its manifest.yml:
  * every valid fixture compiles and its manifest queries match their
  * expected result rows; every invalid fixture refuses to load; rewrite
  * (semantic SQL) queries execute through SqlFront. */
class FixtureCorpusSpec extends AnyFunSuite {

  // composite_keys' expected rows keep order_items without shipments
  // (item 102 → count 0): the reference runtime anchors the join graph at
  // the dimension-preserving model there, which the explicit base_model
  // anchor reproduces (reference: generator.py:84-101)
  private val baseOverrides: Map[String, String] =
    Map("composite_keys" -> "order_items")

  FixtureHarness.manifest().foreach { fx =>
    if (fx.valid) {
      test(s"native fixture: ${fx.name}") {
        FixtureHarness.run(TestSpark.spark, fx, baseOverrides.get(fx.name))
      }
      fx.rewriteSqls.zipWithIndex.foreach { case (sql, i) =>
        test(s"native fixture (sql rewrite $i): ${fx.name}") {
          FixtureHarness.runRewrite(TestSpark.spark, fx.name, sql)
        }
      }
    } else {
      test(s"native fixture (invalid): ${fx.name}") {
        intercept[IllegalArgumentException] {
          FixtureHarness.loadCatalog(TestSpark.spark.newSession(), fx.name)
        }
      }
    }
  }
}
