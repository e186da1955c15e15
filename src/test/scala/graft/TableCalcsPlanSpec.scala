package graft

import graft.gen.TableCalcs
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** The global (no-partition) table calcs are SIZE-GATED
  * (`spark.graft.tablecalc.globalWindowMaxBytes`): a result-set-sized
  * frame takes a plain single-partition WindowExec (the decomposed
  * plans paid 5-8 extra exchanges/AQE jobs to avoid a microsecond
  * sort), while a frame whose optimizer estimate clears the gate
  * decomposes into range-partition + broadcast-offset plans (TableCalcs
  * Scaladoc) and must NOT funnel through one task. This pins the plan
  * shape on both sides of the gate and the value-level equivalence of
  * the decomposition against the plain single-window forms, including
  * nulls, ties, zeros, and the N=1 percentile edge. */
class TableCalcsPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val GateConf = "spark.graft.tablecalc.globalWindowMaxBytes"

  /** Run `body` with the gate forced shut — every global calc takes the
    * decomposed distributed plan, as a fact-grain frame would. */
  private def forceDecomposed[A](body: => A): A = {
    spark.conf.set(GateConf, "0")
    try body finally spark.conf.unset(GateConf)
  }

  private def partitionlessWindows(df: DataFrame): Seq[WindowExec] =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  test("above the size gate driver queries plan no single-partition window") {
    forceDecomposed {
      Seq("q_topn", "q_tablecalc_pct", "q_tablecalc_running",
          "q_tablecalc_rank", "q_tablecalc_moving_avg").foreach { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        val bad = partitionlessWindows(df)
        assert(bad.isEmpty,
          s"$name plans a partition-less WindowExec:\n${bad.mkString("\n")}")
        assert(df.collect().nonEmpty, s"$name returned no rows")
      }
    }
  }

  test("result-sized frames take the single-window fast path") {
    // small result set: the gated fast path engages — the plan carries a
    // partition-less window and NONE of the decomposition's machinery
    // (range exchange, __tc_pid); values are pinned against the
    // decomposed plan of the identical frame
    import spark.implicits._
    val df = Seq((1, 10.0), (2, 5.0), (3, 20.0), (4, 1.0)).toDF("id", "v")
    val fast = TableCalcs.runningTotal(df, "v", Seq("id"), "x")
    assert(partitionlessWindows(fast).nonEmpty,
      "small frame did not take the single-window path")
    assert(!fast.queryExecution.optimizedPlan.toString.contains("__tc_pid"),
      "fast path still carries decomposition columns")
    val slow = forceDecomposed(
      TableCalcs.runningTotal(df, "v", Seq("id"), "x").collect().toSeq)
    assert(fast.collect().toSeq == slow,
      "gated paths disagree on running_total values")
  }

  test("distributed global calcs match single-window reference semantics") {
    forceDecomposed {
    import spark.implicits._
    val df = Seq(
      (1, Option(10.0)), (2, Option.empty[Double]), (3, Option(5.0)),
      (4, Option(5.0)), (5, Option(0.0)), (6, Option(20.0)),
      (7, Option.empty[Double]), (8, Option(1.0))
    ).toDF("id", "v")
    def byId(d: DataFrame, c: String): Map[Int, Option[Any]] =
      d.select("id", c).collect()
        .map(r => r.getInt(0) -> Option(r.get(1))).toMap

    val wOrd = Window.orderBy("id")
    val expRun = df.withColumn("x", sum($"v").over(
      wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(byId(TableCalcs.runningTotal(df, "v", Seq("id"), "x"), "x")
      == byId(expRun, "x"), "running_total")

    val expMav = df.withColumn("x",
      avg($"v".cast("double")).over(wOrd.rowsBetween(-2L, Window.currentRow)))
    assert(byId(TableCalcs.movingAverage(df, "v", Seq("id"), 3, "x"), "x")
      == byId(expMav, "x"), "moving_average")

    val prev = lag($"v", 1).over(wOrd).cast("double")
    val expPop = df.withColumn("x",
      ($"v".cast("double") - prev) * 100 / when(prev =!= 0, prev))
    assert(byId(TableCalcs.percentOfPrevious(df, "v", Seq("id"), "x"), "x")
      == byId(expPop, "x"), "percent_of_previous")

    val expRank = df.withColumn("x", rank().over(Window.orderBy($"v".desc)))
    assert(byId(TableCalcs.rankBy(df, "v", "x"), "x")
      == byId(expRank, "x"), "rank (ties share rank)")

    val expPct = df.withColumn("x", percent_rank().over(Window.orderBy($"v")))
    assert(byId(TableCalcs.percentileOf(df, "v", "x"), "x")
      == byId(expPct, "x"), "percent_rank")

    val expTot = df.withColumn("x",
      $"v".cast("double") * 100 / sum($"v").over(Window.partitionBy()).cast("double"))
    assert(byId(TableCalcs.percentOfTotal(df, "v", "x"), "x")
      == byId(expTot, "x"), "percent_of_total")

    // N=1 edge: percent_rank of a single row is 0.0, not null
    val one = Seq((1, 42.0)).toDF("id", "v")
    assert(byId(TableCalcs.percentileOf(one, "v", "x"), "x")
      == Map(1 -> Some(0.0)), "percent_rank single row")
    }
  }

  test("percentileValue: constant interpolated quantile, numpy-style") {
    import spark.implicits._
    // values 10,20,30,40: p=0.5 -> pos 1.5 -> 25.0 (linear interpolation,
    // the reference's formula); p=1 -> 40; p=0 -> 10
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)).toDF("id", "v")
    def vals(p: Double) = TableCalcs.percentileValue(df, "v", p, "q")
      .select("q").distinct().collect().map(_.getDouble(0)).toSeq
    assert(vals(0.5) == Seq(25.0))
    assert(vals(0.0) == Seq(10.0))
    assert(vals(1.0) == Seq(40.0))
    // partitioned: per-group constants
    val g = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 30.0))
      .toDF("k", "v")
    val byK = TableCalcs.percentileValue(g, "v", 0.5, "q", Seq("k"))
      .select("k", "q").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byK == Map("a" -> 2.0, "b" -> 20.0))
  }

  test("formula is a named row-local expression over result columns") {
    import spark.implicits._
    val df = Seq((1, 10.0, 2L), (2, 9.0, 3L), (3, 5.0, 0L))
      .toDF("id", "rev", "n")
    val out = TableCalcs.formula(df, "rev / nullif(n, 0)", "aov")
      .collect().map(r => (r.getInt(0),
        Option(r.get(r.fieldIndex("aov"))).map(_.asInstanceOf[Double]))).toMap
    assert(out == Map(1 -> Some(5.0), 2 -> Some(3.0), 3 -> None))
    // row-local: no exchange, no window in the plan
    val plan = TableCalcs.formula(df, "rev * 2", "x")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"formula changed the plan shape:\n$plan")
  }
}
