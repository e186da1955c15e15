package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface

/** Narrow bridge into Spark's `private[sql]` surface: wrap a Catalyst
  * Expression back into a public Column, and reach the session's SQL parser.
  * Kept to two one-liners so the engine touches no other internals.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def parser(spark: SparkSession): ParserInterface =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser
  def explainString(df: Dataset[Row], mode: String): String =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution
      .explainString(execution.ExplainMode.fromString(mode))
  def logicalPlan(df: Dataset[Row]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
  def dataFrame(spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
