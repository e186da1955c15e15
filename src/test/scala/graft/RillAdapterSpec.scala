package graft

import graft.adapters.RillAdapter
import graft.gen.Generator
import graft.model.{Catalog, DimType, ModelSource}
import graft.plan.SemanticQuery
import org.scalatest.funsuite.AnyFunSuite

/** Rill metrics-view adapter conformance against the reference's fixture
  * corpus (/root/reference/tests/fixtures/rill/) plus seeded end-to-end
  * queries. */
class RillAdapterSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures/rill"

  private def session() = TestSpark.spark.newSession()

  test("orders fixture: expression measures decompose and execute") {
    val spark = session()
    import spark.implicits._
    Seq((1, "completed", 100.0, 1, "US", "electronics", "2024-01-03"),
        (2, "completed", 200.0, 1, "DE", "food", "2024-02-05"),
        (3, "pending", 60.0, 2, "US", "computers", "2024-02-07"))
      .toDF("id", "status", "amount", "customer_id", "country",
        "product_type", "created_at")
      .createOrReplaceTempView("rill_orders")

    val imp = RillAdapter.loadFile(s"$fixtures/orders.yaml",
      _ => ModelSource.Table("rill_orders"))
    val m = imp.models.head
    // timeseries became the default time dimension
    assert(m.defaultTimeDimension.contains("created_at"))
    assert(m.dimension("created_at").exists(_.dimType == DimType.Time))
    // expression dimension survives verbatim
    assert(m.dimension("product_category").exists(_.sql.exists(_.startsWith("CASE"))))

    val gen = new Generator(spark, Catalog().add(m))
    val got = gen.plan(SemanticQuery(metrics = Seq(
      "orders.total_orders", "orders.total_revenue",
      "orders.avg_order_value", "orders.completed_orders"))).collect()(0)
    assert(got.getLong(0) == 3L)
    assert(got.getDouble(1) == 360.0)
    assert(got.getDouble(2) == 120.0)
    assert(got.getLong(3) == 2L) // COUNT(CASE WHEN completed THEN 1 END)
  }

  test("multi-aggregate formulas become hidden measures + derived") {
    val ms = RillAdapter.expressionToMetrics("win_rate",
      "SUM(wins) / NULLIF(SUM(bids), 0) * 1.0", None)
    assert(ms.length == 3)
    val hidden = ms.filterNot(_.public)
    assert(hidden.length == 2 && hidden.forall(_.agg.contains("sum")))
    val derived = ms.last
    assert(derived.kind == "derived")
    assert(derived.sql.contains("win_rate__agg0 / NULLIF(win_rate__agg1, 0) * 1.0"))

    // single aggregate: simple metric, no decomposition
    val simple = RillAdapter.expressionToMetrics("uniq",
      "COUNT(DISTINCT user_id)", None)
    assert(simple == Seq(graft.model.Metric("uniq",
      agg = Some("count_distinct"), sql = Some("user_id"))))
  }

  test("kitchen sink: every measure imports as an executable metric") {
    val spark = session()
    // one wide row covering every column the kitchen-sink expressions touch
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, 'open', 100.0D, 'u1', 'NY', 'NY', false,
        |   timestamp'2024-01-01 10:00:00', 5.0D, 2.0D, 10.0D, 40.1D, -73.9D,
        |   2.5D, 120.0D, 9.0D, 30.0D, 'h1', 4.0D, 2.0D, 'v1', 1, 1,
        |   6.0D, 800.0D, 3.0D, 10.0D, 2.0D),
        |  (2, 'closed', 2000.0D, 'u2', 'SF', 'CA', true,
        |   timestamp'2024-01-02 11:00:00', 7.0D, 3.0D, 20.0D, 37.7D, -122.4D,
        |   1.5D, 300.0D, 21.0D, 50.0D, 'h2', 6.0D, 1.0D, 'v2', 2, NULL,
        |   8.0D, 900.0D, 4.0D, 20.0D, 3.0D)
        |AS t(id, status, amount, user_id, city, state, is_merge_commit,
        |     event_time, bid_price, cost, revenue, latitude, longitude,
        |     duration_hours, media_spend_usd, clicks, views, commit_hash,
        |     additions, deletions, visitor_id, started_id, completed_id,
        |     changes, bid_price_usd, bid_cnt, total_revenue, unique_users)
        |""".stripMargin).createOrReplaceTempView("rill_ks")

    val imp = RillAdapter.loadFile(s"$fixtures/kitchen_sink.yaml",
      _ => ModelSource.Table("rill_ks"))
    val m = imp.models.head
    assert(m.name == "kitchen_sink")
    assert(m.metrics.count(_.public) >= 8)
    // every public metric must plan (aggregates resolved, formulas valid)
    val gen = new Generator(spark, Catalog().add(m))
    m.metrics.filter(_.public).foreach { met =>
      // window/comparison metrics are only well-defined over a time axis
      val dims = if (met.metricType.exists(
          Set("cumulative", "time_comparison"))) Seq(s"${m.name}.event_time")
        else Nil
      val df = gen.plan(SemanticQuery(
        metrics = Seq(s"${m.name}.${met.name}"), dimensions = dims))
      assert(df.collect().length >= 1, met.name)
    }
  }

  test("security policy: user refs translate and row filter enforces") {
    val spark = session()
    import spark.implicits._
    Seq(("msn.com", "pub1", 10.0, 3.0, 5.0, "2024-01-01 00:00:00"),
        ("espn.com", "pub2", 20.0, 7.0, 6.0, "2024-01-02 00:00:00"))
      .toDF("domain", "publisher", "volume", "impressions", "clicks", "timestamp")
      .createOrReplaceTempView("rill_bids")

    val imp = RillAdapter.loadFile(s"$fixtures/ad_bids_policy.yaml",
      _ => ModelSource.Table("rill_bids"))
    val m = imp.models.head
    val pol = m.security.getOrElse(fail("security dropped"))
    assert(pol.rowFilters == Seq("domain = '{{ user.domain }}'"))

    val gen = new Generator(spark, Catalog().add(m))
    val got = gen.plan(SemanticQuery(
      metrics = Seq(s"${m.name}.total volume"),
      user = Some(Map("domain" -> "msn.com")))).collect()(0).getDouble(0)
    assert(got == 10.0)
    intercept[SecurityException] { // deny-by-default with no user context
      gen.plan(SemanticQuery(metrics = Seq(s"${m.name}.total volume")))
    }
  }

  test("explore resource maps to an Explore contract") {
    val imp = RillAdapter.loadString(
      """type: explore
        |title: "Bids"
        |metrics_view: bids_metrics
        |dimensions: '*'
        |measures: '*'
        |defaults:
        |  measures: [total_bids]
        |  dimensions: [adomain]
        |""".stripMargin, defaultName = "bids_explore")
    val e = imp.explores.head
    assert(e.model == "bids_metrics")
    assert(e.allowedDimensions.isEmpty && e.allowedMetrics.isEmpty)
    assert(e.defaultMetrics == Seq("total_bids"))
  }

  test("nameless dimension drops entry-wise; nameless measure gets measure_<i>") {
    val imp = RillAdapter.loadString(
      """type: metrics_view
        |name: partial_view
        |model: some_tbl
        |dimensions:
        |  - expression: upper(region)
        |  - name: status
        |measures:
        |  - expression: count(*)
        |  - name: total
        |    expression: sum(amount)
        |""".stripMargin)
    val m = imp.models.headOption.getOrElse(fail("whole view was dropped"))
    assert(m.dimension("status").isDefined) // valid sibling survives
    assert(m.dimensions.size == 1)
    assert(m.metric("total").isDefined)
    // Rill's parser names a nameless measure measure_<index>
    assert(m.metric("measure_0").exists(_.agg.contains("count")))
  }

  test("derived, time_comparison, window, and parent views import") {
    val imp = RillAdapter.loadString(
      """type: metrics_view
        |name: rich_view
        |model: tbl
        |timeseries: event_time
        |measures:
        |  - name: revenue
        |    expression: sum(amount)
        |  - name: users
        |    expression: count(distinct user_id)
        |  - name: arpu
        |    type: derived
        |    expression: revenue / users
        |  - name: revenue_prev
        |    type: time_comparison
        |    expression: revenue
        |  - name: rolling_revenue
        |    expression: sum(amount)
        |    window:
        |      order: event_time
        |      frame: RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
        |  - name: skipped
        |    ignore: true
        |    expression: sum(amount)
        |""".stripMargin)
    val m = imp.models.head
    assert(m.metric("arpu").exists(x =>
      x.metricType.contains("derived") && x.sql.contains("revenue / users")))
    assert(m.metric("revenue_prev").exists(x =>
      x.metricType.contains("time_comparison") &&
        x.baseMetric.contains("revenue") && x.comparison.contains("prior")))
    assert(m.metric("rolling_revenue").exists(x =>
      x.metricType.contains("cumulative") &&
        x.windowExpression.contains("sum(amount)") &&
        x.windowOrder.contains("event_time") &&
        x.windowFrame.exists(_.startsWith("RANGE BETWEEN"))))
    assert(m.metric("skipped").isEmpty) // ignore: true
    // parent (derived) view resolution over a project directory
    val dir = java.nio.file.Files.createTempDirectory("rill_parent")
    java.nio.file.Files.write(dir.resolve("parent_view.yaml"),
      """type: metrics_view
        |name: parent_view
        |model: tbl
        |dimensions:
        |  - name: region
        |  - name: channel
        |measures:
        |  - name: revenue
        |    expression: sum(amount)
        |  - name: orders
        |    expression: count(*)
        |  - name: aov
        |    type: derived
        |    expression: revenue / orders
        |""".stripMargin.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("regional.yaml"),
      """type: metrics_view
        |parent: parent_view
        |parent_dimensions:
        |  - region
        |parent_measures:
        |  - aov
        |""".stripMargin.getBytes("UTF-8"))
    val cat = RillAdapter.loadDirectory(dir.toString)
    val child = cat.models("regional")
    assert(child.dimensions.map(_.name) == Seq("region"))
    // aov selected; its referenced parents ride along as non-public deps
    assert(child.metric("aov").exists(_.public))
    assert(child.metric("revenue").exists(!_.public))
    assert(child.metric("orders").exists(!_.public))
  }

  test("the whole rill fixture corpus parses") {
    val dir = new java.io.File(fixtures)
    val files = dir.listFiles().filter(f =>
      f.getName.endsWith(".yml") || f.getName.endsWith(".yaml"))
    assert(files.length >= 15)
    files.foreach { f =>
      val imp = RillAdapter.loadFile(f.getPath)
      imp.models.foreach(m => Catalog().add(m)) // must validate
    }
  }
}
