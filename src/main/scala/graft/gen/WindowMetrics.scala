package graft.gen

import graft.model.DimType
import graft.plan.{FieldRef, SemanticQuery}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Lowers cumulative and time-comparison metric types to Spark window
  * functions over an inner aggregated query — the reference's two-stage
  * shape (sql/generator.py:5701, :6150-6210, :6326).
  *
  * Inner stage: base metrics aggregated at (dims × time grain) via the
  * standard path. Outer stage: window functions over the result. Interval
  * RANGE frames (Spark supports only numeric range keys) are handled by
  * ordering on an epoch-period key per grain (SURVEY §7.4 hard spot #1).
  */
final class WindowMetrics(spark: SparkSession, gen: Generator) {

  private val cat = gen.catRef

  def plan(q: SemanticQuery): DataFrame = {
    val mets = q.metrics.map(r => (r, gen.metricOf(r)))
    val innerRefs = mets.flatMap { case (ref, (model, m)) =>
      m.kind match {
        case "cumulative" | "time_comparison" =>
          Seq(qualify(model, m.baseMetric.getOrElse(throw new IllegalArgumentException(
            s"Metric '${m.name}' needs base_metric"))))
        case "ratio" if m.offsetWindow.isDefined =>
          Seq(qualify(model, m.numerator.get), qualify(model, m.denominator.get))
        case _ => Seq(ref)
      }
    }.distinct
    val innerQ = q.copy(metrics = innerRefs, orderBy = Nil, limit = None,
      offset = None, withTotals = false)
    var df = gen.planAggregate(innerQ, finalShape = true)

    // locate the time dimension in the requested dims
    val dimInfo = q.dimensions.map { r =>
      val fr = FieldRef.parse(r)
      (fr, cat.model(fr.model).dimension(fr.field).getOrElse(
        throw new IllegalArgumentException(s"Unknown dimension '$r'")))
    }
    val timeIdx = dimInfo.indexWhere { case (fr, d) =>
      fr.grain.isDefined || d.dimType == DimType.Time }
    require(timeIdx >= 0,
      "cumulative/time_comparison metrics require a time dimension in the query")
    val (timeFr, timeDim) = dimInfo(timeIdx)
    val timeName = timeFr.outName
    val queryGrain = timeFr.grain.orElse(timeDim.granularity).getOrElse("day")
    val otherDims = dimInfo.zipWithIndex.collect {
      case ((fr, _), i) if i != timeIdx => fr.outName }

    mets.foreach { case (_, (model, m)) =>
      m.kind match {
        case "cumulative" =>
          val base = col(strip(m.baseMetric.get))
          val c = (m.window, m.grainToDate) match {
            case (Some(w), _) =>
              // `window: N grain` → trailing window; RANGE over an integer
              // epoch-period key (Spark has no interval range frames)
              val (n, unit) = parseWindow(w)
              val win = Window.partitionBy(otherDims.map(col): _*)
                .orderBy(periodKey(col(timeName), unit))
                .rangeBetween(-(n - 1L), 0L)
              sum(base).over(win)
            case (_, Some(g)) =>
              // grain_to_date (MTD/YTD): restart the running sum each grain
              val win = Window
                .partitionBy(otherDims.map(col) :+ date_trunc(g, col(timeName)): _*)
                .orderBy(col(timeName))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
              sum(base).over(win)
            case _ =>
              val win = Window.partitionBy(otherDims.map(col): _*)
                .orderBy(col(timeName))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
              sum(base).over(win)
          }
          df = df.withColumn(m.name, c)
        case "time_comparison" =>
          val base = col(strip(m.baseMetric.get))
          val k = offsetPeriods(m.comparison.getOrElse("prior"), queryGrain)
          val win = Window.partitionBy(otherDims.map(col): _*).orderBy(col(timeName))
          val prev = lag(base, k).over(win)
          val prevD = prev.cast("double")
          val c = m.calculation.getOrElse("percent_change") match {
            case "difference"     => base - prev
            case "percent_change" =>
              (base.cast("double") - prevD) / when(prevD =!= 0, prevD)
            case "ratio"          => base.cast("double") / when(prevD =!= 0, prevD)
          }
          df = df.withColumn(m.name, c)
        case "ratio" if m.offsetWindow.isDefined =>
          // ratio with lagged denominator (reference: generator.py:6391)
          val (n, unit) = parseWindow(m.offsetWindow.get)
          val k = n * unitsPerGrain(unit, queryGrain)
          val win = Window.partitionBy(otherDims.map(col): _*).orderBy(col(timeName))
          val den = lag(col(strip(m.denominator.get)), k).over(win).cast("double")
          df = df.withColumn(m.name,
            col(strip(m.numerator.get)).cast("double") / when(den =!= 0, den))
        case _ => ()
      }
    }

    val dimOut = dimInfo.map { case (fr, _) => col(fr.outName) }
    val metOut = mets.map { case (_, (_, m)) => col(m.name) }
    gen.shape(q, df.select(dimOut ++ metOut: _*))
  }

  private def strip(ref: String): String =
    if (ref.contains(".")) ref.split('.')(1) else ref

  private def qualify(model: String, ref: String): String =
    if (ref.contains(".")) ref else s"$model.$ref"

  private[gen] def parseWindow(w: String): (Int, String) = {
    val m = raw"(?i)\s*(\d+)\s+(day|week|month|quarter|year)s?\s*".r
    w match {
      case m(n, unit) => (n.toInt, unit.toLowerCase)
      case _ => throw new IllegalArgumentException(s"Bad window spec '$w'")
    }
  }

  /** How many query-grain periods one offset unit spans. */
  private def unitsPerGrain(unit: String, grain: String): Int =
    (unit, grain) match {
      case (u, g) if u == g    => 1
      case ("week", "day")     => 7
      case ("month", "day")    => 30 // calendar-naive; month grain preferred
      case ("quarter", "month") => 3
      case ("year", "month")   => 12
      case ("year", "quarter") => 4
      case _ => throw new IllegalArgumentException(
        s"offset_window unit '$unit' unsupported at query grain '$grain'")
    }

  /** Integer periods-since-epoch for a grain — the numeric RANGE key. */
  private def periodKey(t: Column, unit: String): Column = unit match {
    case "day"     => datediff(t, to_date(lit("1970-01-01"))).cast("long")
    case "week"    => floor(datediff(t, to_date(lit("1970-01-05"))) / 7).cast("long")
    case "month"   => (year(t) * 12 + month(t)).cast("long")
    case "quarter" => (year(t) * 4 + quarter(t)).cast("long")
    case "year"    => year(t).cast("long")
  }

  /** Comparison offset in units of the query grain
    * (reference: generator.py:4023-4078). */
  private def offsetPeriods(comparison: String, grain: String): Int =
    (comparison.toLowerCase, grain) match {
      case ("prior", _)        => 1
      case ("dod", "day")      => 1
      case ("wow", "day")      => 7
      case ("wow", "week")     => 1
      case ("mom", "month")    => 1
      case ("qoq", "month")    => 3
      case ("qoq", "quarter")  => 1
      case ("yoy", "day")      => 365
      case ("yoy", "week")     => 52
      case ("yoy", "month")    => 12
      case ("yoy", "quarter")  => 4
      case ("yoy", "year")     => 1
      case (c, g) => throw new IllegalArgumentException(
        s"time_comparison '$c' unsupported at grain '$g'")
    }
}
