package graft.gen

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Post-query table calculations — window functions over the *result*
  * DataFrame of a semantic query (reference: core/table_calculation.py:14).
  *
  * These run on already-aggregated frames (small relative to the fact
  * tables), so single-partition windows (`Window.partitionBy()` with no
  * keys) are acceptable: the result set is result-grain, not fact-grain.
  * Pass `partitionBy` whenever a natural partition exists to keep even
  * that parallel.
  */
object TableCalcs {

  private def part(partitionBy: Seq[String]) =
    Window.partitionBy(partitionBy.map(col): _*)

  /** value·100 / sum(value) over the partition — percent form ×100, the
    * reference's contract (table_calc_processor.py:184). Double division
    * keeps the result type stable regardless of input scale. */
  def percentOfTotal(df: DataFrame, value: String, as: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    df.withColumn(as, col(value).cast("double") * 100 /
      sum(col(value)).over(part(partitionBy)).cast("double"))

  /** value·100 / sum(value) over a *column* partition while partitioned
    * rows stay at row grain (percent_of_column_total). */
  def percentOfColumnTotal(df: DataFrame, value: String, columns: Seq[String],
      as: String): DataFrame =
    df.withColumn(as, col(value).cast("double") * 100 /
      sum(col(value)).over(part(columns)).cast("double"))

  /** (value − lag(value))·100 / lag(value) ordered by `orderBy`
    * (percent_of_previous, ×100 — table_calc_processor.py:197). */
  def percentOfPrevious(df: DataFrame, value: String, orderBy: Seq[String],
      as: String, partitionBy: Seq[String] = Nil): DataFrame = {
    val w = part(partitionBy).orderBy(orderBy.map(col): _*)
    val prev = lag(col(value), 1).over(w).cast("double")
    df.withColumn(as,
      (col(value).cast("double") - prev) * 100 / when(prev =!= 0, prev))
  }

  /** Running total ordered by `orderBy`. */
  def runningTotal(df: DataFrame, value: String, orderBy: Seq[String],
      as: String, partitionBy: Seq[String] = Nil): DataFrame = {
    val w = part(partitionBy).orderBy(orderBy.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(col(value)).over(w))
  }

  /** Competition rank by `value` descending (ties share rank). */
  def rankBy(df: DataFrame, value: String, as: String,
      partitionBy: Seq[String] = Nil, ascending: Boolean = false): DataFrame = {
    val o = if (ascending) col(value).asc else col(value).desc
    df.withColumn(as, rank().over(part(partitionBy).orderBy(o)))
  }

  /** Stable row number by the given ordering. */
  def rowNumberBy(df: DataFrame, orderBy: Seq[String], as: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    df.withColumn(as,
      row_number().over(part(partitionBy).orderBy(orderBy.map(col): _*)))

  /** percent_rank of `value`. */
  def percentileOf(df: DataFrame, value: String, as: String,
      partitionBy: Seq[String] = Nil): DataFrame =
    df.withColumn(as, percent_rank().over(part(partitionBy).orderBy(col(value))))

  /** Trailing moving average over the previous `n` rows (inclusive). */
  def movingAverage(df: DataFrame, value: String, orderBy: Seq[String], n: Int,
      as: String, partitionBy: Seq[String] = Nil): DataFrame = {
    val w = part(partitionBy).orderBy(orderBy.map(col): _*)
      .rowsBetween(-(n - 1L), Window.currentRow)
    df.withColumn(as, avg(col(value).cast("double")).over(w))
  }

  /** Top-N rows per partition by `value` (QUALIFY row_number() <= n shape,
    * reference: query_rewriter.py:1201-1478). Catalyst lowers the no-
    * partition case to TakeOrderedAndProject — no full sort at scale. */
  def topN(df: DataFrame, value: String, n: Int,
      partitionBy: Seq[String] = Nil, ascending: Boolean = false): DataFrame = {
    val o = if (ascending) col(value).asc else col(value).desc
    df.withColumn("__rn", row_number().over(part(partitionBy).orderBy(o)))
      .filter(col("__rn") <= n).drop("__rn")
  }
}
