package graft.load

import graft.model._

/** Typed-schema codegen from a [[Catalog]] (reference: codegen.py:1-379,
  * `sidemantic generate types` via cli.py:1862-1890).
  *
  * The reference emits a TypeScript `as const` schema module consumed by
  * its typed client. The Spark-native analogs here:
  *
  *   - [[generateSchemaJson]] — the same structured payload (per-model
  *     dimensions/metrics with kind + scalar type + grains, topMetrics),
  *     serialized as JSON for any non-JVM consumer.
  *   - [[generateScala]] — a self-contained Scala source file: one case
  *     class per model (the typed row of a full-grain query over it,
  *     aggregates typed by their lowering) plus field-name constant
  *     objects so query strings can be referenced without typos.
  *
  * Deterministic output (models and fields sorted) so the artifact is
  * diff-stable across regenerations. */
object Codegen {

  /** Default selectable grains when a time dimension declares none. */
  private val TimeGrains = Seq("second", "minute", "hour", "day", "week",
    "month", "quarter", "year")

  /** Scala scalar for a dimension (time values surface as timestamps). */
  def dimScalaType(d: Dimension): String = d.dimType match {
    case DimType.Numeric => "Double"
    case DimType.Bool    => "Boolean"
    case DimType.Time    => "java.sql.Timestamp"
    case _               => "String"
  }

  /** Scala scalar for a metric by its aggregate lowering: counts are
    * exact longs; everything else aggregates to a double-valued number
    * (ratio/derived metrics compute in double). */
  def metricScalaType(m: Metric): String = m.agg match {
    case Some("count") | Some("count_distinct") |
        Some("approx_count_distinct") => "Long"
    case _                            => "Double"
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'            => "\\\""
      case '\\'           => "\\\\"
      case '\n'           => "\\n"
      case '\r'           => "\\r"
      case '\t'           => "\\t"
      case '\b'           => "\\b"
      case '\f'           => "\\f"
      case c if c < 0x20  => f"\\u${c.toInt}%04x"
      case c              => c.toString
    } + "\""

  /** The structured schema payload (reference: build_client_schema). */
  def generateSchemaJson(cat: Catalog): String = {
    val models = cat.models.toSeq.sortBy(_._1).map { case (name, m) =>
      val dims = m.dimensions.sortBy(_.name).map { d =>
        val grains =
          if (d.dimType == DimType.Time)
            s""","grains":[${(if (d.supportedGranularities.nonEmpty)
              d.supportedGranularities else TimeGrains)
              .map(jsonStr).mkString(",")}]"""
          else ""
        s"""${jsonStr(d.name)}:{"kind":${jsonStr(kindOf(d))},"type":${
          jsonStr(dimScalaType(d))}$grains}"""
      }.mkString(",")
      val mets = m.metrics.sortBy(_.name).map { met =>
        s"""${jsonStr(met.name)}:{"agg":${met.agg.map(jsonStr)
          .getOrElse("null")},"type":${jsonStr(metricScalaType(met))}}"""
      }.mkString(",")
      s"""${jsonStr(name)}:{"dimensions":{$dims},"metrics":{$mets}}"""
    }.mkString(",")
    val top = cat.graphMetrics.keys.toSeq.sorted.map(jsonStr).mkString(",")
    s"""{"models":{$models},"topMetrics":[$top]}"""
  }

  private def kindOf(d: Dimension): String = d.dimType match {
    case DimType.Numeric     => "numeric"
    case DimType.Bool        => "boolean"
    case DimType.Time        => "time"
    case DimType.Categorical => "categorical"
  }

  /** A legal Scala identifier for a field name (`Order Date` →
    * `` `Order Date` `` via backticks when needed). Backticks and
    * control characters have no escape inside a backtick-quoted
    * identifier, so a name containing them cannot become a legal
    * identifier at all — reject rather than emit uncompilable source. */
  private def ident(n: String): String =
    if (n.matches("[A-Za-z_][A-Za-z0-9_]*") && !scalaKeywords(n)) n
    else if (n.exists(c => c == '`' || c < 0x20)) throw new IllegalArgumentException(
      s"Cannot emit a Scala identifier for name containing a backtick or " +
        s"control character: ${jsonStr(n)}")
    else s"`$n`"

  /** A Scala string literal for an arbitrary name (same escapes as JSON,
    * which Scala accepts verbatim). */
  private def scalaStr(s: String): String = jsonStr(s)

  private val scalaKeywords = Set("type", "class", "object", "def", "val",
    "var", "new", "return", "if", "else", "match", "case", "for", "while",
    "do", "yield", "true", "false", "null", "this", "super", "import",
    "package", "sealed", "trait", "extends", "with", "final", "implicit",
    "lazy", "override", "private", "protected", "abstract", "try", "catch",
    "finally", "throw")

  private def className(model: String): String =
    model.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
      .map(p => p.head.toUpper + p.tail).mkString + "Row"

  /** Self-contained Scala artifact: typed row case classes + field-name
    * constants. Pass the result of a full-grain query over a model to
    * `.as[<Model>Row]` (with the implicit Encoder in scope) for typed
    * Dataset access. */
  def generateScala(cat: Catalog, pkg: String = "graft.generated"): String = {
    val sb = new StringBuilder
    sb ++= s"/* Generated by graft.load.Codegen. Do not edit by hand. */\n"
    sb ++= s"package $pkg\n\n"
    sb ++= "// One case class per model: dimensions first (alphabetical),\n"
    sb ++= "// then metrics, all Option-typed because outer joins and\n"
    sb ++= "// fill-less aggregates can produce nulls.\n"
    cat.models.toSeq.sortBy(_._1).foreach { case (name, m) =>
      val fields =
        m.dimensions.sortBy(_.name).map(d =>
          s"    ${ident(d.name)}: Option[${dimScalaType(d)}]") ++
          m.metrics.sortBy(_.name).map(met =>
            s"    ${ident(met.name)}: Option[${metricScalaType(met)}]")
      sb ++= s"final case class ${className(name)}(\n"
      sb ++= fields.mkString(",\n")
      sb ++= ")\n\n"
    }
    sb ++= "/** Field-name constants: `Fields.orders.revenue` == \"orders.revenue\". */\n"
    sb ++= "object Fields {\n"
    cat.models.toSeq.sortBy(_._1).foreach { case (name, m) =>
      sb ++= s"  object ${ident(name)} {\n"
      (m.dimensions.map(_.name) ++ m.metrics.map(_.name)).sorted.foreach { f =>
        sb ++= s"    val ${ident(f)} = ${scalaStr(s"$name.$f")}\n"
      }
      sb ++= "  }\n"
    }
    val top = cat.graphMetrics.keys.toSeq.sorted
    if (top.nonEmpty) {
      sb ++= "  object metrics {\n"
      top.foreach(f => sb ++= s"    val ${ident(f)} = ${scalaStr(f)}\n")
      sb ++= "  }\n"
    }
    sb ++= "}\n"
    sb.toString
  }
}
