package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, GreaterThanOrEqual, GreaterThan, LessThanOrEqual, LessThan, EqualTo, Not, And}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.unsafe.types.UTF8String

/** Expression plumbing: parse semantic expression strings with Spark's own
  * SQL parser, rewrite `model.field` attribute references at the AST level
  * (no regex — string literals, casing, quoting all handled by Catalyst),
  * and wrap back into Columns.
  *
  * Replaces the reference's sqlglot string pipeline
  * (sidemantic/sql/generator.py:4660-4682) with Catalyst-native rewriting.
  */
object Exprs {

  def parse(spark: SparkSession, sql: String): Expression =
    GraftSqlBridge.parser(spark).parseExpression(sql)

  def toColumn(e: Expression): Column = GraftSqlBridge.column(e)

  def column(spark: SparkSession, sql: String): Column = toColumn(parse(spark, sql))

  /** All attribute references (nameParts) in an expression string. */
  def refs(spark: SparkSession, sql: String): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ListBuffer[Seq[String]]()
    parse(spark, sql).foreach {
      case ua: UnresolvedAttribute => out += ua.nameParts
      case _ => ()
    }
    out.toList
  }

  /** Rewrite every attribute reference through `f` (None = keep as-is). */
  def rewriteAttrs(e: Expression)(f: Seq[String] => Option[Expression]): Expression =
    e.transformUp {
      case ua: UnresolvedAttribute => f(ua.nameParts).getOrElse(ua)
    }

  def attr(parts: String*): Expression = UnresolvedAttribute(parts.toSeq)

  def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args.toSeq, isDistinct = false)

  def strLit(s: String): Expression = Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType)

  /** date_trunc at a grain, as an Expression (composable inside rewrites). */
  def truncExpr(grain: String, e: Expression): Expression =
    fn("date_trunc", strLit(grain), e)

  /** Split a boolean expression into its top-level AND conjuncts. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  // ---------------------------------------------------------------------
  // Relative-date grammar (reference: core/relative_date.py:14-55):
  //   'today' | 'yesterday' | 'tomorrow'
  //   'last N days|weeks|months|quarters|years'  (start of range, inclusive)
  //   'next N ...'
  //   'this week|month|quarter|year'
  // A comparison `col >= 'last 7 days'` lowers to `col >= anchor - 7 days`;
  // `col = 'last 7 days'` lowers to the closed-open range.
  // ---------------------------------------------------------------------

  private val LastNext = raw"(?i)(last|next)\s+(\d+)\s+(day|week|month|quarter|year)s?".r
  private val This = raw"(?i)this\s+(day|week|month|quarter|year)".r

  private def anchorExpr(anchor: Option[String]): Expression =
    anchor.map(d => fn("to_date", strLit(d))).getOrElse(fn("current_date"))

  private def addIntervals(base: Expression, n: Int, unit: String): Expression = {
    val amount = Literal(n)
    unit.toLowerCase match {
      case "day"     => fn("date_add", base, amount)
      case "week"    => fn("date_add", base, Literal(n * 7))
      case "month"   => fn("add_months", base, amount)
      case "quarter" => fn("add_months", base, Literal(n * 3))
      case "year"    => fn("add_months", base, Literal(n * 12))
    }
  }

  /** Lower a relative-date string to (rangeStart, rangeEnd) expressions, if
    * it matches the grammar. End is exclusive. */
  def relativeRange(s: String, anchor: Option[String]): Option[(Expression, Expression)] = {
    val a = anchorExpr(anchor)
    s.trim match {
      case t if t.equalsIgnoreCase("today")     => Some((a, addIntervals(a, 1, "day")))
      case t if t.equalsIgnoreCase("yesterday") => Some((addIntervals(a, -1, "day"), a))
      case t if t.equalsIgnoreCase("tomorrow")  => Some((addIntervals(a, 1, "day"), addIntervals(a, 2, "day")))
      case LastNext(dir, n, unit) =>
        val k = n.toInt
        if (dir.equalsIgnoreCase("last")) Some((addIntervals(a, -k, unit), addIntervals(a, 1, "day")))
        else Some((a, addIntervals(a, k, unit)))
      case This(unit) =>
        val start = truncExpr(unit, a)
        Some((start, addIntervals(start, 1, unit)))
      case _ => None
    }
  }

  /** Rewrite comparisons against relative-date string literals. */
  def rewriteRelativeDates(e: Expression, anchor: Option[String]): Expression = {
    def lit2str(x: Expression): Option[String] = x match {
      case Literal(u: UTF8String, org.apache.spark.sql.types.StringType) => Some(u.toString)
      case _ => None
    }
    e.transformUp {
      case cmp @ GreaterThanOrEqual(l, r) =>
        lit2str(r).flatMap(relativeRange(_, anchor)).map { case (s, _) => GreaterThanOrEqual(l, s) }.getOrElse(cmp)
      case cmp @ GreaterThan(l, r) =>
        lit2str(r).flatMap(relativeRange(_, anchor)).map { case (_, en) => GreaterThanOrEqual(l, en) }.getOrElse(cmp)
      case cmp @ LessThan(l, r) =>
        lit2str(r).flatMap(relativeRange(_, anchor)).map { case (s, _) => LessThan(l, s) }.getOrElse(cmp)
      case cmp @ LessThanOrEqual(l, r) =>
        lit2str(r).flatMap(relativeRange(_, anchor)).map { case (_, en) => LessThan(l, en) }.getOrElse(cmp)
      case cmp @ EqualTo(l, r) =>
        lit2str(r).flatMap(relativeRange(_, anchor)).map { case (s, en) =>
          And(GreaterThanOrEqual(l, s), LessThan(l, en)) }.getOrElse(cmp)
    }
  }

  /** Template rendering + `{{ param }}` interpolation (reference:
    * core/parameter.py:49-100, core/template.py): `{# comments #}` and
    * `{% if %}` chains resolve first, then variables substitute. Value
    * formatting (quoting, validation) is the caller's concern — see
    * [[Params.format]] and Generator.mergedParams. */
  def interpolate(sql: String, params: Map[String, String]): String =
    Params.render(sql, params)

  /** Render a user attribute value as an escaped type-correct SQL literal
    * (core/security.py value safety): bare numerics/booleans, NULL for
    * missing is an error (StrictUndefined analog), quoted+escaped strings
    * otherwise — so a value like "1 OR 1=1" cannot escape its predicate. */
  def userLiteral(v: String): String = {
    val isNum = v.nonEmpty && raw"-?\d+(\.\d+)?".r.matches(v)
    val isBool = v.equalsIgnoreCase("true") || v.equalsIgnoreCase("false")
    if (isNum || isBool) v
    // backslashes double too: Spark's parser treats backslash as an escape
    // inside string literals (escapedStringLiterals=false default), so
    // quote-doubling alone would let a value like  \' OR 1=1 --  escape
    else "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
  }

  /** `{{user.attr}}` rendering for security filters (core/security.py:201).
    * PAIRED author quotes around the placeholder are stripped before
    * rendering ('{{user.x}}' and {{user.x}} are equivalent, the reference's
    * _HUGGING_QUOTES); an unpaired quote adjacent to a placeholder belongs
    * to the surrounding SQL and is preserved. A referenced attribute the
    * caller did not supply raises rather than rendering empty
    * (StrictUndefined). */
  def renderUser(sql: String, user: Map[String, String]): String = {
    def lookup(k: String): String = user.getOrElse(k,
      throw new IllegalArgumentException(
        s"Row filter references user attribute '$k' not supplied by the caller"))
    val hugged = raw"""(['"])\s*\{\{\s*user\.([A-Za-z0-9_]+)\s*\}\}\s*\1""".r
    val bare = raw"\{\{\s*user\.([A-Za-z0-9_]+)\s*\}\}".r
    val pass1 = hugged.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(userLiteral(lookup(m.group(2)))))
    bare.replaceAllIn(pass1, m =>
      java.util.regex.Matcher.quoteReplacement(userLiteral(lookup(m.group(1)))))
  }

  /** Rewrite `user.attr` references in an access-gate expression to typed
    * literals; also accepts bracket list syntax (`in ['a','b']`) for
    * compatibility with reference-style gates. Bracket lists rewrite in
    * list context only, BEFORE value substitution, so brackets inside
    * rendered values (e.g. role "ops[eu]") survive untouched. */
  def renderUserExpr(sqlExpr: String, user: Map[String, String]): String = {
    val listified = raw"(?i)(\bin\s*)\[((?:'[^']*'|[^\[\]'])*)\]".r.replaceAllIn(sqlExpr,
      m => java.util.regex.Matcher.quoteReplacement(
        m.group(1) + "(" + m.group(2) + ")"))
    val ref = raw"\buser\.([A-Za-z0-9_]+)".r
    ref.replaceAllIn(listified, m => {
      val k = m.group(1)
      java.util.regex.Matcher.quoteReplacement(
        user.get(k).map(userLiteral).getOrElse("NULL"))
    })
  }
}
