package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Date-spine densification: a time-grained metric result only contains
  * the periods that HAVE rows, so a sparse series silently skips
  * periods — charts connect across the gap, moving averages shorten
  * their windows, and downstream `LAG`-style comparisons step over
  * missing months instead of seeing a zero. `densify` rebuilds the
  * complete scaffold and makes absence explicit.
  *
  * Mechanics: the spine is `sequence(min, max, step)` over the frame's
  * OWN time extent (or explicit bounds), exploded from a one-row
  * aggregate — generating N periods costs one tiny task regardless of
  * corpus size, because the grain domain (months, weeks, days of a few
  * decades) is small by nature even at 100 TB of fact data. The
  * scaffold is spine × observed dimension combinations (a distinct over
  * the already-aggregated result, NOT the fact table), broadcast-joined
  * back to the data, metric columns filled per `fills`. Every input
  * column survives; added rows carry the fill values.
  *
  * The join is a LEFT join from the scaffold, so pre-aggregated rows
  * pass through byte-identical — densify composes after any grouped
  * semantic query (`date_trunc` grain column + metrics).
  */
object TimeSpine {

  /** @param step  a SQL interval literal body, e.g. "1 month", "7 days"
    * @param dims  non-time grouping columns whose observed combinations
    *              each get the full spine (empty = single series)
    * @param fills metric column → fill value for generated rows; input
    *              columns not listed stay null on generated rows */
  def densify(df: DataFrame, timeCol: String, step: String,
      dims: Seq[String] = Nil,
      fills: Map[String, Column] = Map.empty): DataFrame = {
    val bounds = df.agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
    val spine = bounds
      .select(explode_outer(expr(s"sequence(__lo, __hi, interval $step)"))
        .as(timeCol))
      .filter(col(timeCol).isNotNull) // empty input → empty spine, not a null row
    val scaffold =
      if (dims.isEmpty) spine
      else spine.crossJoin(df.select(dims.map(col): _*).distinct())
    val joined = scaffold.join(df, timeCol +: dims, "left")
    fills.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v.cast(d.schema(c).dataType)))
    }
  }
}
