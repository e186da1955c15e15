package graft

import graft.load.Loaders
import org.scalatest.funsuite.AnyFunSuite

/** Project-directory import with per-file format auto-detection
  * (Loaders.loadProject vs reference loaders.py:169): a mixed tree of
  * 13 formats — native YAML/SQL, Yardstick SQL, Cube, LookML (nested
  * dir), MetricFlow, Hex, Superset, Rill, Snowflake Cortex, BSL, OSI
  * JSON (OSI/ tree), TMDL (PBIP definition dir) — plus a
  * generated-artifact decoy and non-semantic files, loads to one
  * catalog with per-file format attribution. */
class LoadersSpec extends AnyFunSuite {

  private val fixtures = "/root/reference/tests/fixtures"

  /** Assemble the mixed project once per suite run. */
  private lazy val projDir: java.io.File = {
    val root = java.nio.file.Files.createTempDirectory("graft_proj_").toFile
    def put(relPath: String, content: String): Unit = {
      val f = new java.io.File(root, relPath)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    def cp(src: String, relPath: String): Unit =
      put(relPath, new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$fixtures/$src")), "UTF-8"))

    cp("sidemantic/orders.yml", "orders.yml")               // native
    cp("sql/orders.sql", "detail.sql")                      // native SQL DDL
    put("measures.sql",                                     // yardstick
      """CREATE VIEW order_measures AS
        |SELECT status,
        |  SUM(amount) AS MEASURE total_revenue,
        |  COUNT(*) AS MEASURE order_count
        |FROM public.orders""".stripMargin)
    cp("cube/iot_sensors.yml", "cube/iot_sensors.yml")      // cube, nested
    cp("lookml/thelook_products.view.lkml",                 // lookml, nested
      "views/thelook_products.view.lkml")
    cp("metricflow/bookings_source.yml", "mf_bookings.yml") // metricflow
    cp("hex/users.yml", "hex_users.yml")                    // hex
    cp("superset/video_game_sales.yaml", "superset_games.yaml") // superset
    cp("rill/sales.yaml", "rill_sales.yaml")                // rill
    cp("snowflake/revenue_timeseries.yaml", "snowflake_revenue.yaml")
    cp("bsl/flights.yml", "bsl_flights.yml")                // bsl
    cp("osi/dbt_released.json", "OSI/released.json")        // osi json
    // PBIP TMDL tree: root resolves through definition/ + tables/
    cp("tmdl/definition/model.tmdl", "pbip/definition/model.tmdl")
    cp("tmdl/definition/relationships.tmdl",
      "pbip/definition/relationships.tmdl")
    cp("tmdl/definition/tables/Products.tmdl",
      "pbip/definition/tables/Products.tmdl")
    cp("tmdl/definition/tables/Sales.tmdl",
      "pbip/definition/tables/Sales.tmdl")
    // decoys: a dbt compile artifact must not shadow OSI/ sources; an
    // OSI-shaped file outside OSI/ is rejected; non-semantic files skip
    cp("osi/dbt_released.json", "target/osi_document.json")
    cp("osi/dbt_released.json", "backups/old_osi.json")
    put("README.md", "# a project readme\n")
    put("Makefile", "all:\n\techo hi\n")
    root
  }

  private lazy val loaded = Loaders.loadProject(projDir.getPath)
  private lazy val byPath: Map[String, String] =
    loaded.attributions.map(a => a.path -> a.format).toMap

  test("per-file format attribution routes all 13 formats") {
    val expected = Map(
      "orders.yml" -> "native",
      "detail.sql" -> "native-sql",
      "measures.sql" -> "yardstick",
      "cube/iot_sensors.yml" -> "cube",
      "views/thelook_products.view.lkml" -> "lookml",
      "mf_bookings.yml" -> "metricflow",
      "hex_users.yml" -> "hex",
      "superset_games.yaml" -> "superset",
      "rill_sales.yaml" -> "rill",
      "snowflake_revenue.yaml" -> "snowflake",
      "bsl_flights.yml" -> "bsl",
      "OSI/released.json" -> "osi",
      "pbip/definition/tables/Products.tmdl" -> "tmdl",
      "pbip/definition/tables/Sales.tmdl" -> "tmdl")
    expected.foreach { case (p, fmt) =>
      assert(byPath.get(p) == Some(fmt), s"$p should route to $fmt, " +
        s"got ${byPath.get(p)}; skipped=${loaded.skipped}")
    }
  }

  test("the merged catalog carries models from every format") {
    val models = loaded.catalog.models.keySet
    val expectSome = Seq(
      "orders",           // native (then overwritten by OSI — same name)
      "order_measures",   // yardstick view
      "sensor_readings",  // cube
      "products",         // lookml
      "bookings_source",  // metricflow
      "users",            // hex
      "rill_sales",       // rill (model named from the file)
      "daily_revenue",    // snowflake
      "flights",          // bsl
      "customers",        // osi
      "Products", "Sales") // tmdl tables
    expectSome.foreach(m => assert(models.contains(m),
      s"missing model '$m'; have ${models.toSeq.sorted.mkString(", ")}"))
    // the superset dataset lands under whatever name the adapter
    // derives from table_name — pin via its attribution row
    val supersetModels = loaded.attributions
      .find(_.path == "superset_games.yaml").get.models
    assert(supersetModels.nonEmpty &&
      supersetModels.forall(models.contains))
  }

  test("generated-artifact decoy, out-of-tree OSI, and non-semantic " +
      "files are skipped with reasons") {
    val skippedByPath = loaded.skipped.map(s => s.path -> s.format).toMap
    assert(skippedByPath.keySet.contains("target/osi_document.json"))
    assert(skippedByPath("target/osi_document.json")
      .contains("generated artifact"))
    assert(skippedByPath.keySet.contains("backups/old_osi.json"))
    assert(skippedByPath("backups/old_osi.json").contains("OSI/"))
    assert(skippedByPath.keySet.contains("README.md"))
    // nothing routed from the decoys
    assert(!byPath.contains("target/osi_document.json"))
    assert(!byPath.contains("backups/old_osi.json"))
  }

  test("cross-file duplicate model names warn and later definition wins") {
    // native orders.yml and OSI/released.json both define 'orders'
    assert(loaded.warnings.exists(w =>
      w.contains("'orders'") && w.contains("more than once")),
      s"warnings=${loaded.warnings}")
  }

  test("duplicate-model resolution follows walk order, not " +
      "loader-category order") {
    // group formats (MetricFlow, SML, …) PARSE before the per-file
    // loop, but 'later file wins' must mean later in the directory
    // WALK, matching the reference's strictly in-order merge
    // (loaders.py processes files in scan order)
    val mfYaml =
      """semantic_models:
        |  - name: dup_walk
        |    model: ref('orders')
        |    entities:
        |      - name: dup_walk
        |        type: primary
        |        expr: o_orderkey
        |    dimensions:
        |      - name: status
        |        type: categorical
        |    measures:
        |      - name: mf_only
        |        agg: sum
        |        expr: amount
        |""".stripMargin
    val nativeYaml =
      """version: 1
        |models:
        |  - name: dup_walk
        |    table: orders
        |    primary_key: o_orderkey
        |    dimensions:
        |      - name: status
        |    metrics:
        |      - name: native_only
        |        agg: sum
        |        sql: amount
        |""".stripMargin
    def build(mfName: String, nativeName: String): graft.model.Model = {
      val root =
        java.nio.file.Files.createTempDirectory("graft_walk_").toFile
      def put(relPath: String, content: String): Unit = {
        val f = new java.io.File(root, relPath)
        java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
        ()
      }
      put(mfName, mfYaml)
      put(nativeName, nativeYaml)
      val p = Loaders.loadProject(root.getPath)
      assert(p.warnings.exists(_.contains("more than once")),
        s"expected a duplicate warning, got ${p.warnings}")
      p.catalog.model("dup_walk")
    }
    // metricflow file walks LAST → its definition wins
    val mfWins = build("z_mf.yml", "a_native.yml")
    assert(mfWins.metrics.exists(_.name == "mf_only") &&
      !mfWins.metrics.exists(_.name == "native_only"),
      s"metricflow should win: ${mfWins.metrics.map(_.name)}")
    // native file walks LAST → reversed outcome
    val nativeWins = build("a_mf.yml", "z_native.yml")
    assert(nativeWins.metrics.exists(_.name == "native_only") &&
      !nativeWins.metrics.exists(_.name == "mf_only"),
      s"native should win: ${nativeWins.metrics.map(_.name)}")
  }

  test("a project-loaded model plans and executes end-to-end") {
    // rebind every table reference to the real sf0.01 orders table and
    // run a semantic query through the Yardstick-imported view
    val resolve: graft.load.YamlLoader.TableResolver = _ =>
      graft.model.ModelSource.SqlView(
        s"""SELECT o_orderkey, o_orderstatus AS status,
           |  cast(o_totalprice as decimal(18,2)) AS amount
           |FROM parquet.`${TestSpark.sfDir}/orders.parquet`""".stripMargin)
    val root = java.nio.file.Files.createTempDirectory("graft_projc_").toFile
    val f = new java.io.File(root, "pm.yml")
    java.nio.file.Files.write(f.toPath,
      """version: 1
        |models:
        |  - name: pm
        |    table: orders
        |    primary_key: o_orderkey
        |    dimensions:
        |      - name: status
        |    metrics:
        |      - name: total_revenue
        |        agg: sum
        |        sql: amount
        |      - name: order_count
        |        agg: count
        |""".stripMargin.getBytes("UTF-8"))
    val p = Loaders.loadProject(root.getPath, resolve)
    assert(p.attributions.map(a => a.path -> a.format) ==
      Seq("pm.yml" -> "native"))
    val spark = TestSpark.spark
    val out = new graft.gen.Generator(spark, p.catalog).plan(
      graft.plan.SemanticQuery(
        metrics = Seq("pm.total_revenue", "pm.order_count"),
        dimensions = Seq("pm.status"),
        orderBy = Seq("status"))).collect()
    assert(out.length == 3) // O, F, P order statuses
    assert(out.map(_.getAs[Long]("order_count")).sum > 0)
  }

  test("strict=false degrades a malformed semantic file to a warning") {
    val root = java.nio.file.Files.createTempDirectory("graft_projb_").toFile
    val bad = new java.io.File(root, "broken.yml")
    java.nio.file.Files.write(bad.toPath,
      "models:\n  - name: x\n   badindent: [unclosed\n".getBytes("UTF-8"))
    val ok = new java.io.File(root, "good.yml")
    java.nio.file.Files.write(ok.toPath,
      """version: 1
        |models:
        |  - name: good_one
        |    table: t
        |    primary_key: id
        |""".stripMargin.getBytes("UTF-8"))
    intercept[Exception](Loaders.loadProject(root.getPath))
    val lax = Loaders.loadProject(root.getPath, strict = false)
    assert(lax.catalog.models.contains("good_one"))
    assert(lax.warnings.nonEmpty || lax.skipped.exists(_.path == "broken.yml"))
  }
}
