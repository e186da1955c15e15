package graft.load

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

/** Catalyst-based recovery of `(agg, inner expr, filter)` from
  * aggregate-shaped SQL strings like `SUM(amount)` or
  * `COUNT(DISTINCT user_id) FILTER (WHERE status = 'done')`
  * (reference: core/metric.py:68-226 does this with sqlglot; Spark's own
  * parser is the moral equivalent here — no second grammar).
  *
  * Only a lone top-level aggregate call is recovered; anything composite
  * (`SUM(a) / SUM(b)`, `SUM(a) + 1`) is NOT a simple aggregation and
  * returns None so callers keep it as a derived expression.
  */
object AggExtract {

  /** agg ∈ AggKind.All; inner None = `*` (count star); `param` carries
    * a parameterized aggregation's argument (the percentile fraction). */
  final case class Extracted(agg: String, inner: Option[String],
      filter: Option[String], param: Option[String] = None)

  private val Renames = Map("stddev_samp" -> "stddev", "var_samp" -> "variance",
    "var_pop" -> "variance_pop", "mean" -> "avg")

  /** Parse an SQL string; None when it is not a lone aggregate call. */
  def parse(sql: String): Option[Extracted] =
    try extract(CatalystSqlParser.parseExpression(sql))
    catch { case _: Exception => None }

  /** Same, over an already-parsed (unresolved) expression. */
  def extract(e: Expression): Option[Extracted] = e match {
    case f: UnresolvedFunction if f.nameParts.size == 1 =>
      val name = Renames.getOrElse(f.nameParts.head.toLowerCase,
        f.nameParts.head.toLowerCase)
      val filter = f.filter.map(exprSql)
      if (name == "percentile_cont" || name == "percentile_disc") {
        // inverse-distribution form: PERCENTILE_*(p) WITHIN GROUP
        // (ORDER BY expr) — the value column is the ordering child, the
        // lone argument is the fraction. The supported subset is a
        // single ASCENDING sort; anything else stays unextracted.
        import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
        f.orderingWithinGroup match {
          case Seq(SortOrder(child, Ascending, _, _)) =>
            Some(Extracted(name, Some(exprSql(child)), filter,
              f.arguments.headOption.map(exprSql)))
          case _ => None
        }
      } else if (name == "count") {
        if (f.isDistinct)
          Some(Extracted("count_distinct",
            Some(f.arguments.map(exprSql).mkString(", ")), filter))
        else f.arguments match {
          // `COUNT(*)` arrives as star or as the parser's count(1) form
          case Seq(_: UnresolvedStar) | Nil => Some(Extracted("count", None, filter))
          case Seq(org.apache.spark.sql.catalyst.expressions.Literal(1, _)) =>
            Some(Extracted("count", None, filter))
          case args => Some(Extracted("count", Some(args.map(exprSql).mkString(", ")), filter))
        }
      } else if (name == "approx_count_distinct")
        Some(Extracted("approx_count_distinct",
          f.arguments.headOption.map(exprSql), filter))
      else if (graft.model.AggKind.All(name))
        Some(Extracted(name, f.arguments.headOption.map(exprSql), filter))
      else None
    case _ => None
  }

  /** Column names referenced anywhere in an expression (lowercased). */
  def referencedColumns(e: Expression): Set[String] =
    e.collect { case a: UnresolvedAttribute => a.nameParts.last.toLowerCase }.toSet

  /** `Expression.sql` quotes unresolved attributes with backticks; strip
    * them for plain single-part names so stored metric SQL stays clean. */
  private def exprSql(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.mkString(".")
    case other                  => other.sql
  }
}
