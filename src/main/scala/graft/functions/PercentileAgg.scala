package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{PercentileCont, PercentileDisc}
import org.apache.spark.sql.{Column, GraftSqlBridge}

/** ANSI inverse-distribution aggregates — PERCENTILE_CONT / DISC(p)
  * WITHIN GROUP (ORDER BY expr) — as Columns. Built directly on
  * Catalyst's aggregate classes because the public functions API has no
  * WITHIN GROUP form. Shared by the Generator's agg lowering and the
  * Yardstick AS MEASURE rewriter. */
object PercentileAgg {

  /** kind ∈ {percentile_cont, percentile_disc}; param is the fraction
    * (defaults to the median). */
  def column(kind: String, in: Column, param: Option[String]): Column = {
    val frac = Literal(param.map(_.toDouble).getOrElse(0.5))
    val child = GraftSqlBridge.expression(in)
    val agg =
      if (kind == "percentile_cont") new PercentileCont(child, frac, false)
      else new PercentileDisc(child, frac, false)
    GraftSqlBridge.column(agg.toAggregateExpression())
  }
}
