package graft

/** Diagnostic census: fidelity notes across every adapter's fixture
  * corpus (run via Test/runMain graft.FidelityCensusMain). */
object FidelityCensusMain {
  def main(args: Array[String]): Unit = {
    import graft.adapters._
    val fx = "/root/reference/tests/fixtures"
    def report(label: String, thunk: => Any): Unit =
      try {
        val (_, rep) = graft.load.Fidelity.capture { thunk }
        if (rep.notes.nonEmpty) {
          println(s"== $label: ${rep.notes.size} notes")
          rep.notes.groupBy(_.construct).toSeq.sortBy(-_._2.size).foreach {
            case (k, ns) =>
              println(f"  $k%-38s ${ns.size}%4d  ${ns.head.detail.take(120)}")
          }
        } else println(s"== $label: clean")
      } catch { case e: Exception =>
        println(s"== $label: EXCEPTION ${e.getMessage.take(120)}")
        e.getStackTrace.take(6).foreach(f => println(s"    at $f")) }
    report("atscale", AtScaleSmlAdapter.loadDirectory(s"$fx/atscale_sml"))
    report("atscale_sink", AtScaleSmlAdapter.loadDirectory(s"$fx/atscale_sml_kitchen_sink"))
    report("bsl", {
      val d = new java.io.File(s"$fx/bsl")
      Option(d.listFiles()).getOrElse(Array()).filter(_.isFile)
        .sortBy(_.getName).map(f => BslAdapter.loadFile(f.getPath))
    })
    report("cube", CubeAdapter.loadDirectory(s"$fx/cube"))
    report("gooddata", {
      val d = new java.io.File(s"$fx/gooddata")
      Option(d.listFiles()).getOrElse(Array())
        .filter(f => f.isFile && f.getName.endsWith(".json"))
        .sortBy(_.getName).map(f => GoodDataAdapter.loadFile(f.getPath))
    })
    report("hex", HexAdapter.loadDirectory(s"$fx/hex"))
    report("lookml", LookMLAdapter.loadDirectory(s"$fx/lookml"))
    report("metricflow", MetricFlowAdapter.loadDirectory(s"$fx/metricflow"))
    report("omni", OmniAdapter.loadDirectory(s"$fx/omni"))
    report("osi", {
      val d = new java.io.File(s"$fx/osi")
      Option(d.listFiles()).getOrElse(Array()).filter(_.isFile)
        .sortBy(_.getName).map(f => OsiAdapter.loadFile(f.getPath))
    })
    report("rill", RillAdapter.loadDirectory(s"$fx/rill"))
    report("snowflake", {
      val d = new java.io.File(s"$fx/snowflake")
      Option(d.listFiles()).getOrElse(Array()).filter(_.isFile)
        .sortBy(_.getName).map(f => SnowflakeAdapter.loadFile(f.getPath))
    })
    report("superset", SupersetAdapter.loadDirectory(s"$fx/superset"))
    report("tableau", {
      val d = new java.io.File(s"$fx/tableau")
      Option(d.listFiles()).getOrElse(Array()).filter(_.isFile)
        .sortBy(_.getName).map(f => TableauAdapter.loadFile(f.getPath))
    })
    report("thoughtspot", ThoughtSpotAdapter.loadDirectory(s"$fx/thoughtspot"))
    report("tmdl", TmdlAdapter.loadDirectory(s"$fx/tmdl"))
    report("tmdl_realistic", TmdlAdapter.loadDirectory(s"$fx/tmdl_realistic"))
  }
}
