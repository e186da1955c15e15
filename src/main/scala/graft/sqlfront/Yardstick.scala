package graft.sqlfront

import graft.model.{Catalog, Metric, Model}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Expression, Literal, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}

/** Yardstick AS MEASURE query mode (reference:
  * sql/query_rewriter.py:3186-4530 — the "Measures in SQL" surface).
  *
  * Queries over a [[graft.adapters.YardstickAdapter]]-imported model:
  *
  * {{{
  * SEMANTIC SELECT year, region, AGGREGATE(revenue) FROM sales_v
  * SELECT year, AGGREGATE(revenue) AT (ALL region) AS total FROM sales_v
  * SELECT year, AGGREGATE(revenue) AT (SET year = year - 1) FROM sales_v
  * }}}
  *
  *   - `AGGREGATE(m)` expands to the measure's declared aggregation; the
  *     grouping context is the explicit GROUP BY or every non-measure
  *     select item (implicit grouping)
  *   - `AT (ALL dim, …)` removes dims from the context: one extra
  *     aggregation at the coarser grain joined back on the remaining keys
  *     (broadcast-sized — group cardinality, not row count)
  *   - `AT (ALL)` / `AT (WHERE pred)` aggregate the whole (respectively
  *     predicate-matched) relation → scalar, broadcast cross-joined
  *   - `AT (SET dim = expr)` is context transfer: the aggregate at the
  *     same grain joined on `shifted.dim = expr(current row)`; `CURRENT
  *     dim` pins the outer row's value — when the outer context does not
  *     determine it (dim not grouped, no single-valued WHERE equality)
  *     the result is NULL, matching the reference
  *   - `AT (VISIBLE)` is the explicit form of the default context
  *   - a bare measure reference behaves like `AGGREGATE(m)` (measures
  *     self-aggregate), and derived measures (`profit = revenue - cost`)
  *     expand over their component aggregates
  *
  * The `SEMANTIC` prefix is optional; `AT` clauses are pre-lowered to a
  * marker function so Spark's own parser handles everything else.
  */
final class Yardstick(spark: SparkSession, cat: Catalog) {

  /** Whether this text is yardstick-mode SQL (SEMANTIC prefix, an
    * AGGREGATE() call, or an AT modifier). */
  def handles(text: String): Boolean = {
    val t = text.trim
    t.toUpperCase.startsWith("SEMANTIC") ||
      raw"(?i)\bAGGREGATE\s*\(".r.findFirstIn(t).isDefined ||
      raw"(?i)\)\s+AT\s*\(".r.findFirstIn(t).isDefined
  }

  def sql(text: String): DataFrame = {
    val noPrefix = text.trim.replaceFirst("(?is)^SEMANTIC\\s+", "")
    val lowered = lowerAtClauses(noPrefix)
    val plan = GraftSqlBridge.parser(spark).parsePlan(lowered)
    rewrite(plan).getOrElse(throw new IllegalArgumentException(
      s"not a yardstick semantic scope: $text"))
  }

  // ------------------------------------------------------------------
  // textual AT lowering: `X AT (MOD)` → `__graft_at(X, 'MOD')`
  // ------------------------------------------------------------------

  private def maskStrings(text: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < text.length) {
      val c = text(i)
      if (c == '\'') {
        out.append(c); i += 1
        while (i < text.length && text(i) != '\'') { out.append(' '); i += 1 }
        if (i < text.length) { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def matchingClose(masked: String, open: Int): Int = {
    var depth = 0; var i = open
    while (i < masked.length) {
      if (masked(i) == '(') depth += 1
      else if (masked(i) == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private[sqlfront] def lowerAtClauses(sql: String): String = {
    val masked = maskStrings(sql)
    val at = raw"(?i)\bAT\s*\(".r.findFirstMatchIn(masked).getOrElse(return sql)
    val open = at.end - 1
    val close = matchingClose(masked, open)
    require(close > 0, s"unbalanced AT clause in: $sql")
    val modifier = sql.substring(open + 1, close)
    // the modified expression ends right before AT: a balanced call chain
    // (AGGREGATE(...)) or a (possibly qualified) measure identifier
    var end = at.start
    while (end > 0 && sql(end - 1).isWhitespace) end -= 1
    val start =
      if (end > 0 && sql(end - 1) == ')') {
        var depth = 0; var i = end - 1; var s = -1
        while (i >= 0 && s < 0) {
          if (masked(i) == ')') depth += 1
          else if (masked(i) == '(') { depth -= 1; if (depth == 0) s = i }
          i -= 1
        }
        require(s >= 0, s"unbalanced call before AT in: $sql")
        var j = s - 1
        while (j >= 0 && (sql(j).isLetterOrDigit || sql(j) == '_' || sql(j) == '.')) j -= 1
        j + 1
      } else {
        var j = end - 1
        while (j >= 0 && (sql(j).isLetterOrDigit || sql(j) == '_' || sql(j) == '.')) j -= 1
        j + 1
      }
    val inner = sql.substring(start, end)
    val escaped = modifier.replace("'", "''")
    lowerAtClauses(sql.substring(0, start) +
      s"__graft_at($inner, '$escaped')" + sql.substring(close + 1))
  }

  // ------------------------------------------------------------------
  // plan walking
  // ------------------------------------------------------------------

  private sealed trait AtMod
  private case object Visible extends AtMod
  private case object AllDims extends AtMod
  private final case class AllOf(dims: Seq[String]) extends AtMod
  private final case class WherePred(pred: String) extends AtMod
  private final case class SetDim(dim: String, expr: String) extends AtMod

  private def parseMod(s: String): AtMod = {
    val t = s.trim
    val up = t.toUpperCase
    if (up == "VISIBLE") Visible
    else if (up == "ALL") AllDims
    else if (up.startsWith("ALL")) AllOf(t.substring(3).trim
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    else if (up.startsWith("WHERE")) WherePred(t.substring(5).trim)
    else if (up.startsWith("SET")) {
      val body = t.substring(3).trim
      val eq = body.indexOf('=')
      require(eq > 0, s"AT (SET …) needs 'dim = expr', got: $s")
      SetDim(body.substring(0, eq).trim, body.substring(eq + 1).trim)
    } else throw new IllegalArgumentException(s"unsupported AT modifier: $s")
  }

  private final case class MeasureItem(measure: String, mod: Option[AtMod],
      out: String)

  private def rewrite(plan: LogicalPlan): Option[DataFrame] = {
    var limit: Option[Int] = None
    var sorts: Seq[SortOrder] = Nil
    var cur = plan
    var unwrapping = true
    while (unwrapping) cur match {
      case gl: GlobalLimit =>
        limit = Some(gl.limitExpr.eval().asInstanceOf[Number].intValue()); cur = gl.child
      case ll: LocalLimit => cur = ll.child
      case s: Sort if s.global => sorts = s.order; cur = s.child
      case _ => unwrapping = false
    }

    val (items, groupBy, src0) = cur match {
      case p: Project   => (p.projectList, None, p.child)
      case a: Aggregate => (a.aggregateExpressions, Some(a.groupingExpressions), a.child)
      case _ => return None
    }

    var filters = Seq.empty[String]
    var src = src0
    var alias: Option[String] = None
    var walking = true
    while (walking) src match {
      case f: Filter         => filters :+= f.condition.sql; src = f.child
      case sa: SubqueryAlias => alias = Some(sa.alias); src = sa.child
      case _ => walking = false
    }
    val modelName = src match {
      case ur: UnresolvedRelation if ur.multipartIdentifier.size == 1 =>
        ur.multipartIdentifier.head
      case _ => return None
    }
    if (!cat.models.contains(modelName)) return None
    val model = cat.model(modelName)
    val quals = Set(modelName) ++ alias

    def strip(e: String): String =
      quals.foldLeft(e)((s, q) =>
        s.replaceAll(raw"(?i)\b" + java.util.regex.Pattern.quote(q) + raw"\.", ""))

    // classify select items
    var dimItems = Vector.empty[(String, String)] // (dimension, out name)
    var measureItems = Vector.empty[MeasureItem]
    items.foreach { item =>
      val (e, aliasName) = item match {
        case UnresolvedAlias(childE, _) => (childE, None)
        case a @ Alias(childE, name)    => (childE, Some(name))
        case other                      => (other: Expression, None)
      }
      classify(e, model, quals) match {
        case Left(dim)      => dimItems :+= (dim, aliasName.getOrElse(dim))
        case Right((m, mo)) => measureItems :+= MeasureItem(m, mo,
          aliasName.getOrElse(m))
      }
    }

    val groupDims: Seq[String] = groupBy.filter(_.nonEmpty)
      .map(_.map {
        case ua: UnresolvedAttribute => ua.nameParts.last
        case other => throw new IllegalArgumentException(
          s"GROUP BY must reference dimensions, got: ${other.sql}")
      }.toSeq)
      .getOrElse(dimItems.map(_._1))

    // base = model source with dimension columns materialized
    val base0 = cat.scan(spark, model)
    val base = model.dimensions.foldLeft(base0)((df, d) =>
      d.sql.filter(_ != d.name).fold(df)(s => df.withColumn(d.name, expr(s))))
    val strippedFilters = filters.map(strip)
    val visible = strippedFilters.foldLeft(base)((df, f) => df.filter(expr(f)))

    // main grouped frame: group keys + plain/VISIBLE measures
    val plainAggs = measureItems.filter(mi =>
      mi.mod.forall(_ == Visible)).map(mi =>
      measureAgg(model, mi.measure).as(mi.out))
    var out: DataFrame =
      if (groupDims.nonEmpty) {
        if (plainAggs.nonEmpty)
          visible.groupBy(groupDims.map(col): _*).agg(plainAggs.head, plainAggs.tail: _*)
        else visible.select(groupDims.map(col): _*).distinct()
      } else {
        if (plainAggs.nonEmpty) visible.agg(plainAggs.head, plainAggs.tail: _*)
        else visible.limit(1).select()
      }

    // AT-modified measures join back onto the grouped frame
    measureItems.filterNot(_.mod.forall(_ == Visible)).foreach { mi =>
      val agg = measureAgg(model, mi.measure)
      mi.mod.get match {
        case AllDims =>
          out = out.crossJoin(broadcast(visible.agg(agg.as(mi.out))))
        case AllOf(removed) =>
          val keep = groupDims.filterNot(removed.map(strip).contains)
          if (keep.isEmpty)
            out = out.crossJoin(broadcast(visible.agg(agg.as(mi.out))))
          else {
            val sub = visible.groupBy(keep.map(col): _*).agg(agg.as(mi.out))
            out = out.join(broadcast(sub), keep, "left")
          }
        case WherePred(pred) =>
          val sub = base.filter(expr(strip(pred))).agg(agg.as(mi.out))
          out = out.crossJoin(broadcast(sub))
        case SetDim(dimQ, exprTextQ) =>
          val dim = strip(dimQ)
          val exprText = strip(exprTextQ)
          out = contextTransfer(out, base, model, mi, dim, exprText,
            groupDims, strippedFilters)
        case Visible => ()
      }
    }

    // ORDER BY / LIMIT
    sorts.foreach { so =>
      val name = so.child match {
        case ua: UnresolvedAttribute => ua.nameParts.last
        case other => throw new IllegalArgumentException(
          s"ORDER BY must reference output columns, got: ${other.sql}")
      }
      out = out.orderBy(if (so.direction == Ascending) col(name).asc
        else col(name).desc)
    }
    limit.foreach(l => out = out.limit(l))
    Some(out)
  }

  /** `AT (SET dim = expr)`: the aggregate at the same grain, joined on
    * the transferred key. The dim's own filters are dropped from the
    * shifted context (the SET replaces that predicate); other filters and
    * group keys remain. */
  private def contextTransfer(out: DataFrame, base: DataFrame, model: Model,
      mi: MeasureItem, dim: String, exprText: String,
      groupDims: Seq[String], strippedFilters: Seq[String]): DataFrame = {
    val keepFilters = strippedFilters.filterNot(f =>
      (raw"(?i)\b" + java.util.regex.Pattern.quote(dim) + raw"\b")
        .r.findFirstIn(f).isDefined)
    val ctx = keepFilters.foldLeft(base)((df, f) => df.filter(expr(f)))
    val agg = measureAgg(model, mi.measure)
    val hasCurrent = raw"(?i)\bCURRENT\s+".r.findFirstIn(exprText).isDefined
    val plainExpr = exprText.replaceAll(raw"(?i)\bCURRENT\s+", "")

    if (groupDims.contains(dim)) {
      val others = groupDims.filterNot(_ == dim)
      val sub = ctx.groupBy(groupDims.map(col): _*)
        .agg(agg.as(mi.out)).as("__ys")
      val mainA = out.as("__ym")
      // shifted.dim = expr evaluated on the CURRENT (outer) row
      val shiftedExpr = expr(groupDims.foldLeft(plainExpr)((s, d) =>
        s.replaceAll(raw"(?i)\b" + java.util.regex.Pattern.quote(d) + raw"\b",
          s"__ym.$d")))
      val cond = others.map(d => col(s"__ym.$d") === col(s"__ys.$d"))
        .foldLeft(col(s"__ys.$dim") === shiftedExpr)(_ && _)
      mainA.join(sub, cond, "left")
        .select(out.columns.map(c => col(s"__ym.$c")) :+ col(s"__ys.${mi.out}"): _*)
    } else {
      // outer context must pin the dim: a single-valued WHERE equality
      val eqRe = (raw"(?i)^\s*\(?\s*" + java.util.regex.Pattern.quote(dim) +
        raw"\s*=\s*([^)]+?)\s*\)?\s*$$").r
      strippedFilters.collectFirst { case eqRe(v) => v } match {
        case Some(value) =>
          val target = expr(plainExpr.replaceAll(
            raw"(?i)\b" + java.util.regex.Pattern.quote(dim) + raw"\b",
            s"($value)"))
          val sub = ctx.filter(col(dim) === target).agg(agg.as(mi.out))
          out.crossJoin(broadcast(sub))
        case _ =>
          // ambiguous context → NULL (reference behavior)
          out.withColumn(mi.out, lit(null).cast("double"))
      }
    }
  }

  /** Lower a measure to its aggregation Column; derived measures expand
    * over their components recursively. */
  private def measureAgg(model: Model, name: String): Column = {
    val m = model.metric(name).getOrElse(throw new IllegalArgumentException(
      s"unknown measure '$name' on '${model.name}'"))
    if (m.metricType.contains("derived")) {
      val sql = m.sql.getOrElse(throw new IllegalArgumentException(
        s"derived measure '$name' has no sql"))
      val components = model.metrics.map(_.name).filter { n =>
        n != name && (raw"(?i)\b" + java.util.regex.Pattern.quote(n) +
          raw"\b").r.findFirstIn(sql).isDefined
      }
      // parse the expression with component aggregates substituted in
      val substituted = components.foldLeft(sql)((s, n) =>
        s.replaceAll(raw"(?i)\b" + java.util.regex.Pattern.quote(n) + raw"\b",
          s"__graft_m_$n"))
      components.foldLeft(expr(substituted)) { (c, n) =>
        GraftSqlBridge.column(replaceMarker(GraftSqlBridge.expression(c),
          s"__graft_m_$n", measureAgg(model, n)))
      }
    } else {
      val inner = m.sql.map(expr).getOrElse(lit(1))
      val gated = m.filters.foldLeft(inner)((c, f) => when(expr(f), c))
      m.agg.getOrElse("sum") match {
        case "sum"            => sum(gated)
        case "avg"            => avg(gated)
        case "min"            => min(gated)
        case "max"            => max(gated)
        case "median"         => median(gated)
        case "stddev"         => stddev(gated)
        case "stddev_pop"     => stddev_pop(gated)
        case "variance"       => variance(gated)
        case "variance_pop"   => var_pop(gated)
        case "count_distinct" => count_distinct(gated)
        case "approx_count_distinct" => approx_count_distinct(gated)
        case "count" =>
          if (m.sql.isEmpty) count(lit(1))
          else if (m.filters.nonEmpty) count(gated)
          else count(inner)
        case other => throw new IllegalArgumentException(s"unsupported agg: $other")
      }
    }
  }

  private def replaceMarker(e: Expression, marker: String,
      replacement: Column): Expression = e.transformUp {
    case ua: UnresolvedAttribute if ua.nameParts.last.equalsIgnoreCase(marker) =>
      GraftSqlBridge.expression(replacement)
  }

  // ------------------------------------------------------------------

  /** (dimension name, None) or (measure, modifier). */
  private def classify(e: Expression, model: Model,
      quals: Set[String]): Either[String, (String, Option[AtMod])] = e match {
    case f: UnresolvedFunction
        if f.nameParts.last.equalsIgnoreCase("__graft_at") =>
      val mod = f.arguments(1) match {
        case Literal(v, _) => parseMod(v.toString)
        case other => throw new IllegalArgumentException(
          s"bad AT modifier: ${other.sql}")
      }
      classify(f.arguments.head, model, quals) match {
        case Right((m, None)) => Right((m, Some(mod)))
        case Right((_, Some(_))) => throw new IllegalArgumentException(
          "nested AT modifiers are not supported")
        case Left(d) => throw new IllegalArgumentException(
          s"AT applies to measures, '$d' is a dimension")
      }
    case f: UnresolvedFunction
        if f.nameParts.last.equalsIgnoreCase("aggregate") &&
          f.arguments.size == 1 =>
      f.arguments.head match {
        case ua: UnresolvedAttribute => Right((ua.nameParts.last, None))
        case other => throw new IllegalArgumentException(
          s"AGGREGATE takes a measure reference, got: ${other.sql}")
      }
    case ua: UnresolvedAttribute =>
      val name = ua.nameParts.last
      if (ua.nameParts.size > 1 && !quals.contains(ua.nameParts.head))
        throw new IllegalArgumentException(
          s"unknown qualifier '${ua.nameParts.head}' in ${ua.nameParts.mkString(".")}")
      if (model.metric(name).isDefined) Right((name, None))
      else if (model.dimension(name).isDefined) Left(name)
      else throw new IllegalArgumentException(
        s"'$name' is neither a measure nor a dimension of '${model.name}'")
    case _ => throw new IllegalArgumentException(
      s"unsupported yardstick select item: ${e.sql}")
  }
}
