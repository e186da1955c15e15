package graft

import graft.adapters.{GoodDataAdapter, HolisticsAdapter, LookMLAdapter,
  TableauAdapter, TmdlAdapter}
import graft.load.Fidelity
import org.scalatest.funsuite.AnyFunSuite

/** Import fidelity reporting (reference: sidemantic/fidelity.py) —
  * adapters record structured dropped/approximated/unsupported notes that
  * a [[Fidelity.capture]] block collects without changing what gets
  * imported. */
class FidelitySpec extends AnyFunSuite {

  test("note outside a capture is a no-op; capture scopes collection") {
    Fidelity.note("orphan", "no capture active") // must not throw
    val (_, outer) = Fidelity.capture {
      Fidelity.note("a", "first")
      val (_, inner) = Fidelity.capture {
        Fidelity.note("b", "second", severity = "approximated")
      }
      // nested capture sees only its own note; outer sees both
      assert(inner.notes.map(_.construct) == Seq("b"))
    }
    assert(outer.notes.map(_.construct) == Seq("a", "b"))
    assert(outer.counts == Map("dropped" -> 1, "approximated" -> 1))
    assert(outer.hasLosses)
  }

  test("summary lines group by severity in a stable order") {
    val (_, r) = Fidelity.capture {
      Fidelity.note("x", "was cut", severity = "unsupported", source = Some("fmt"))
      Fidelity.note("y", "was bent", severity = "approximated")
      Fidelity.note("z", "was lost") // dropped
    }
    val lines = r.summaryLines
    assert(lines == Seq(
      "dropped (1):", "  z: was lost",
      "approximated (1):", "  y: was bent",
      "unsupported (1):", "  x: was cut (fmt)"))
  }

  test("TMDL: non-translatable DAX measures are counted, translatables are not") {
    val (imp, report) = Fidelity.capture {
      TmdlAdapter.load(Seq(
        """table Sales
          |    column Region
          |        dataType: string
          |        sourceColumn: Region
          |    column Amount
          |        dataType: decimal
          |        sourceColumn: Amount
          |    measure 'Total Sales' = SUM(Sales[Amount])
          |    measure 'West Sales' = CALCULATE(SUM(Sales[Amount]), Sales[Region] = "West")
          |    measure 'Rank Ties' = RANKX(ALL(Sales[Region]), [Total Sales], [Total Sales], DESC, Dense)
          |    measure 'Cross Filter' = CALCULATE(SUM(Sales[Amount]), Other[K] = 1)
          |""".stripMargin))
    }
    assert(imp.models.nonEmpty)
    // exactly the two stubbed measures produce notes; executables are silent
    val dax = report.byConstruct("non_translatable_dax")
    assert(dax.size == 2, report.summaryLines.mkString("\n"))
    assert(dax.forall(_.severity == "unsupported"))
    assert(dax.exists(_.detail.contains("Rank Ties")))
    assert(dax.exists(_.detail.contains("Cross Filter")))
  }

  test("LookML: dropped measures, duration groups, and remapped distincts") {
    val (imp, report) = Fidelity.capture {
      LookMLAdapter.loadString(
        """view: orders {
          |  sql_table_name: orders ;;
          |  dimension: status { sql: ${TABLE}.status ;; }
          |  dimension_group: wait {
          |    type: duration
          |    sql_start: ${TABLE}.created_at ;;
          |    sql_end: ${TABLE}.shipped_at ;;
          |  }
          |  dimension_group: created {
          |    type: time
          |    timeframes: [date, month, fiscal_quarter]
          |    sql: ${TABLE}.created_at ;;
          |  }
          |  measure: revenue {
          |    type: sum
          |    sql: ${TABLE}.amount ;;
          |  }
          |  measure: p95_amount {
          |    type: percentile_95
          |    sql: ${TABLE}.amount ;;
          |  }
          |  measure: uniq_rev {
          |    type: sum_distinct
          |    sql: ${TABLE}.amount ;;
          |  }
          |  measure: mixed {
          |    type: number
          |    sql: ${revenue} / ${status} ;;
          |  }
          |}""".stripMargin)
    }
    val orders = imp.models.head
    // imports still happen: revenue + uniq_rev present, drops absent
    assert(orders.metric("revenue").isDefined)
    assert(orders.metric("uniq_rev").exists(_.agg == Some("sum")))
    assert(orders.metric("p95_amount").isEmpty)
    assert(report.byConstruct("duration_dimension_group").size == 1)
    assert(report.byConstruct("unsupported_timeframe").size == 1) // fiscal_quarter
    assert(report.byConstruct("unsupported_measure_type").size == 1)
    assert(report.byConstruct("dimension_mixing_formula").size == 1)
    val remap = report.byConstruct("distinct_aggregate_remap")
    assert(remap.size == 1 && remap.head.severity == "approximated")
  }

  test("Tableau: LOD and table-calc formulas are reported as unsupported") {
    val (models, report) = Fidelity.capture {
      TableauAdapter.loadFile(
        "/root/reference/tests/fixtures/tableau/kitchen_sink.tds")
    }
    assert(models.nonEmpty)
    // the fixture's LOD and RUNNING_SUM calcs import hidden-with-NULL and
    // each records exactly one unsupported note
    assert(report.byConstruct("lod_expression").nonEmpty ||
      report.byConstruct("table_calc_function").nonEmpty,
      report.summaryLines.mkString("\n"))
    assert(report.notes.forall(_.severity == "unsupported"))
  }

  test("AtScale: unsupported calculation methods are reported") {
    val (imp, report) = Fidelity.capture {
      graft.adapters.AtScaleSmlAdapter.load(Seq(
        """unique_name: fact_sales
          |object_type: dataset
          |table: sales_t
          |columns:
          |  - name: amount
          |    data_type: decimal(18,2)
          |  - name: user_id
          |    data_type: int
          |""".stripMargin,
        """unique_name: total
          |object_type: metric
          |calculation_method: sum
          |dataset: fact_sales
          |column: amount
          |""".stripMargin,
        """unique_name: ndv_sketch
          |object_type: metric
          |calculation_method: hyper log log
          |dataset: fact_sales
          |column: user_id
          |""".stripMargin))
    }
    assert(report.byConstruct("unsupported_calculation_method").exists(
      _.detail.contains("ndv_sketch")), report.summaryLines.mkString("\n"))
  }

  test("Holistics kitchen sink: exactly the AQL surfaces report, with file:line") {
    val fx = "/root/reference/tests/fixtures/holistics_kitchen_sink"
    val (imp, r) = Fidelity.capture { HolisticsAdapter.loadDirectory(fx) }
    assert(imp.models.nonEmpty)
    assert(r.notes.size == 1, r.summaryLines.mkString("\n"))
    // @aql measure/dimension definitions translate since r17 (see the
    // HolisticsAdapterSpec AQL test); only the dataset-level Metric
    // surface still reports
    assert(r.byConstruct("measure_without_definition").isEmpty)
    val metricNote = r.byConstruct("top_level_metric")
    assert(metricNote.size == 1)
    assert(metricNote.head.location.contains("metric_store.aml:8"))
    // the aggregation variants that used to drop now import
    val orders = imp.models.find(_.name == "kitchen_orders").get
    assert(orders.metrics.exists(m =>
      m.name == "distinct_customers" && m.agg.contains("count_distinct")))
    assert(orders.metrics.exists(m =>
      m.name == "revenue_stdevp" && m.sql.exists(_.startsWith("STDDEV_POP("))))
    assert(orders.metrics.exists(m =>
      m.name == "revenue_varp" && m.sql.exists(_.startsWith("VAR_POP("))))
    // the FieldRef-form relationship parses (was an unparseable drop)
    assert(imp.models.exists(_.relationships.exists(_.to == "kitchen_customers")))
  }

  test("GoodData: analytics payloads and non-dataset references report with paths") {
    val dir = "/root/reference/tests/fixtures/gooddata"
    val (_, r1) = Fidelity.capture {
      GoodDataAdapter.loadFile(s"$dir/sdk_declarative_analytics_model.json") }
    assert(r1.byConstruct("analytics_payload").size == 1)
    assert(r1.notes.forall(_.severity == "unsupported"))
    val (imp2, r2) = Fidelity.capture {
      GoodDataAdapter.loadFile(s"$dir/legacy_project_model.json") }
    assert(imp2.models.nonEmpty)
    val refNotes = r2.byConstruct("non_dataset_reference")
    assert(refNotes.size == 1, r2.summaryLines.mkString("\n"))
    assert(refNotes.head.location.contains("projectModel.datasets[0].references"))
    val (impClean, rClean) = Fidelity.capture {
      GoodDataAdapter.loadFile(s"$dir/cloud_kitchen_sink.json") }
    assert(impClean.models.nonEmpty && !rClean.hasLosses)
  }

  test("clean import has no losses") {
    val (_, report) = Fidelity.capture {
      LookMLAdapter.loadString(
        """view: parts {
          |  sql_table_name: part ;;
          |  dimension: brand {
          |    sql: ${TABLE}.p_brand ;;
          |  }
          |  measure: n {
          |    type: count
          |  }
          |}""".stripMargin)
    }
    assert(!report.hasLosses, report.summaryLines.mkString("\n"))
  }

  test("fixture-corpus drop census: the committed grammar depth is a " +
      "floor, not a high-water mark") {
    // r17 closed multi-line/aliased/direction/inline-source joins
    // (malloy 13 → 0) and @aql measure definitions (kitchen sink
    // 3 → 1); these caps make a grammar regression loud. The one
    // survivor is known: the dataset-level Metric note.
    val (_, malloy) = Fidelity.capture {
      graft.adapters.MalloyAdapter
        .loadDirectory("/root/reference/tests/fixtures/malloy")
    }
    assert(malloy.notes.isEmpty,
      malloy.summaryLines.mkString("\n"))
    val (_, sinkRep) = Fidelity.capture {
      graft.adapters.HolisticsAdapter.loadDirectory(
        "/root/reference/tests/fixtures/holistics_kitchen_sink")
    }
    assert(sinkRep.notes.size <= 1, sinkRep.summaryLines.mkString("\n"))
    assert(sinkRep.notes.forall(_.construct == "top_level_metric"))
  }
}
