package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's native fixtures, run verbatim through the generic
  * harness: seed SQL → temp views, model YAML → YamlLoader, query YAML →
  * planner, expected/result.json → comparison. */
class FixtureCorpusSpec extends AnyFunSuite {

  // composite_keys' expected rows keep order_items without shipments
  // (item 102 → count 0): the reference runtime anchors the join graph at
  // the dimension-preserving model there, which the explicit base_model
  // anchor reproduces (reference: generator.py:84-101)
  private val fixtures: Seq[(String, Option[String])] = Seq(
    "multi_hop_joins" -> None,
    "composite_keys" -> Some("order_items"),
    "many_to_many_relationship" -> None,
    "relationship_default_keys" -> None,
    "segments_metric_filters" -> None,
    "parameterized_filters" -> None,
    "statistical_aggregations" -> None,
    "default_time_dimension" -> None,
    "custom_relationship_sql" -> None)

  fixtures.foreach { case (f, base) =>
    test(s"native fixture: $f") {
      FixtureHarness.run(TestSpark.spark, f, base)
    }
  }
}
