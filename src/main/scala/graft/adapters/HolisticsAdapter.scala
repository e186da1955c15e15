package graft.adapters

import graft.load.YamlLoader
import graft.model._

/** Importer for Holistics AML files (reference:
  * sidemantic/adapters/holistics.py + its AML grammar; fixtures
  * tests/fixtures/holistics/ and holistics_kitchen_sink/).
  *
  * AML is a brace-structured DSL:
  *   - `Model name { type table_name dimension{} measure{} }`;
  *     `definition: @sql … ;;` bodies with `{{ #SOURCE.col }}` /
  *     `{{ field }}` interpolation become plain SQL; `aggregation_type`
  *     maps through (stdev → stddev, custom → a derived metric over the
  *     referenced measures)
  *   - `PartialModel` blocks plus `Model x = y.extend(partial)` /
  *     `.extend({ inline })` merge field-wise, later wins
  *   - `Relationship name { type from: r(m.f) to: r(m.f) }` declares a
  *     named edge; `Dataset` blocks activate them (`relationship(name,
  *     active)`) or declare inline ones: `RelationshipConfig { rel:
  *     Relationship {…} }`, `rel(rel_expr: a.x > b.y)` (many_to_one) and
  *     `a.x - b.y` (one_to_one) shorthands; `active: false` entries are
  *     dropped
  *   - `use`/module imports resolve by loading the whole directory
  *     (modules included); constants/extensions metadata that has no
  *     engine equivalent is ignored
  */
object HolisticsAdapter {

  final case class Imported(models: Seq[Model])

  def loadDirectory(dir: String,
      resolve: YamlLoader.TableResolver = YamlLoader.defaultResolver): Imported = {
    def collect(d: java.io.File): Seq[java.io.File] = {
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
      fs.filter(f => f.isFile && f.getName.endsWith(".aml")).toSeq ++
        fs.filter(_.isDirectory).flatMap(collect)
    }
    val texts = collect(new java.io.File(dir)).sortBy(_.getName)
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    load(texts, resolve)
  }

  def load(texts: Seq[String],
      resolve: YamlLoader.TableResolver = YamlLoader.defaultResolver): Imported = {
    val blocks = texts.flatMap(topBlocks)

    // named relationships registry
    val namedRels: Map[String, RelSpec] = blocks.collect {
      case B("Relationship", name, body) => relFromBody(body).map(name -> _)
    }.flatten.toMap

    // partials for extend()
    val partials: Map[String, String] = blocks.collect {
      case B("PartialModel", name, body) => name -> body
    }.toMap

    var models: Map[String, Model] = blocks.collect {
      case B("Model", name, body) if !name.contains("=") =>
        name -> modelFromBody(name, body, resolve)
    }.toMap

    // Model x = y.extend(partial | { inline })
    val ExtendRe =
      raw"(?s)Model\s+(\w+)\s*=\s*(\w+)\.extend\(\s*(\{.*?\}|\w+)\s*\)".r
    texts.foreach { t =>
      ExtendRe.findAllMatchIn(stripComments(t)).foreach { m =>
        val (newName, baseName, arg) = (m.group(1), m.group(2), m.group(3))
        models.get(baseName).foreach { base =>
          val extBody =
            if (arg.startsWith("{")) Some(arg.substring(1, arg.length - 1))
            else partials.get(arg)
          extBody.foreach { body =>
            val ext = modelFromBody(newName, body, resolve)
            models += (newName -> mergeModels(base.copy(name = newName), ext))
          }
        }
      }
    }

    // datasets: activate/declare relationships on their from-models
    blocks.collect { case B("Dataset", _, body) => body }.foreach { body =>
      datasetRels(body, namedRels).foreach { r =>
        models.get(r.fromModel).foreach { m =>
          if (!m.relationships.exists(x => x.to == r.toModel &&
              x.foreignKey == Seq(r.fromField)))
            models += (m.name -> m.copy(relationships = m.relationships :+
              Relationship(r.toModel, r.relType,
                foreignKey = Seq(r.fromField), primaryKey = Seq(r.toField))))
        }
      }
    }

    Imported(models.values.toSeq.sortBy(_.name))
  }

  // ------------------------------------------------------------------
  // AML scanning
  // ------------------------------------------------------------------

  private final case class B(kind: String, name: String, body: String)
  private final case class RelSpec(relType: String, fromModel: String,
      fromField: String, toModel: String, toField: String)

  private def stripComments(text: String): String =
    text.split('\n').map { l =>
      val i = l.indexOf("//")
      if (i >= 0 && !l.substring(0, i).count(_ == '\'').isOdd) l.substring(0, i)
      else l
    }.mkString("\n")

  private implicit class IntOps(private val n: Int) extends AnyVal {
    def isOdd: Boolean = (n & 1) == 1
  }

  private def matchBrace(s: String, open: Int): Int = {
    var depth = 0; var i = open; var inStr = false
    while (i < s.length) {
      val c = s(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return i
        case _ => ()
      }
      i += 1
    }
    -1
  }

  /** Top-level `Kind name { body }` blocks. */
  private def topBlocks(text0: String): Seq[B] = {
    val text = stripComments(text0)
    val Head = raw"(?m)^(Model|PartialModel|Dataset|Relationship|Metric)\s+(\w+)\s*\{".r
    Head.findAllMatchIn(text).flatMap { m =>
      val open = m.end - 1
      val close = matchBrace(text, open)
      if (close > 0) Some(B(m.group(1), m.group(2),
        text.substring(open + 1, close)))
      else None
    }.toSeq
  }

  /** `key name { body }` sub-blocks of one kind inside a body. */
  private def subBlocks(body: String, kind: String): Seq[(String, String)] = {
    val Head = (raw"(?m)\b" + kind + raw"\s+(\w+)\s*\{").r
    Head.findAllMatchIn(body).flatMap { m =>
      val open = m.end - 1
      val close = matchBrace(body, open)
      if (close > 0) Some((m.group(1), body.substring(open + 1, close)))
      else None
    }.toSeq
  }

  private def prop(body: String, key: String): Option[String] = {
    // only at this block's own depth: strip nested braces first
    val flat = flatten(body)
    (raw"(?m)\b" + java.util.regex.Pattern.quote(key) + raw"\s*:\s*([^\n,}]+)").r
      .findFirstMatchIn(flat).map(_.group(1).trim)
      .map(v => v.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\""))
  }

  /** Replace nested brace bodies with blanks so property scans only see
    * this block's own level. */
  private def flatten(body: String): String = {
    val sb = new StringBuilder
    var depth = 0
    body.foreach {
      case '{' => depth += 1; sb.append(' ')
      case '}' => depth -= 1; sb.append(' ')
      case c   => sb.append(if (depth > 0) ' ' else c)
    }
    sb.toString
  }

  /** `definition: @sql … ;;` (may span lines, braces interpolated). */
  private def definitionSql(body: String): Option[String] =
    raw"(?s)definition\s*:\s*@sql\s*(.*?);;".r.findFirstMatchIn(body)
      .map(_.group(1).trim)
      .map(_.replaceAll(raw"\{\{\s*#SOURCE\.(\w+)\s*\}\}", "$1")
        .replaceAll(raw"\{\{\s*([\w.]+)\s*\}\}", "$1")
        .replaceAll(raw"\s+", " ").trim)

  // ------------------------------------------------------------------
  // model construction
  // ------------------------------------------------------------------

  private val AggMap = Map("count" -> "count", "sum" -> "sum", "avg" -> "avg",
    "min" -> "min", "max" -> "max", "stdev" -> "stddev",
    "count_distinct" -> "count_distinct", "median" -> "median")

  private def modelFromBody(name: String, body: String,
      resolve: YamlLoader.TableResolver): Model = {
    val table = prop(body, "table_name").getOrElse(name)
    var pk = Vector.empty[String]
    val dims = subBlocks(body, "dimension").map { case (dn, db) =>
      val sql = definitionSql(db)
      if (flatten(db).contains("primary_key: true")) pk :+= sql.getOrElse(dn)
      val dtype = prop(db, "type").getOrElse("text")
      Dimension(dn,
        if (Set("datetime", "date", "timestamp")(dtype)) DimType.Time
        else if (dtype == "number") DimType.Numeric
        else if (Set("truefalse", "boolean")(dtype)) DimType.Bool
        else DimType.Categorical,
        sql = sql.filter(_ != dn),
        granularity = if (dtype == "date") Some("day")
          else if (Set("datetime", "timestamp")(dtype)) Some("second") else None,
        label = prop(db, "label"))
    }
    val mets = subBlocks(body, "measure").flatMap { case (mn, mb) =>
      val sql = definitionSql(mb)
      prop(mb, "aggregation_type").getOrElse("custom") match {
        case "custom" =>
          // definition references other measures by name → derived
          sql.map(s => Metric(mn, metricType = Some("derived"), sql = Some(s),
            label = prop(mb, "label")))
        case agg => AggMap.get(agg).map(a =>
          Metric(mn, agg = Some(a), sql = sql, label = prop(mb, "label")))
      }
    }
    Model(name = name, source = resolve(table), primaryKey = pk,
      dimensions = dims, metrics = mets)
  }

  /** Field-wise merge for extend(): the extension's fields win. */
  private def mergeModels(base: Model, ext: Model): Model = {
    def merge[T](bs: Seq[T], es: Seq[T])(key: T => String): Seq[T] = {
      val eNames = es.map(key).toSet
      bs.filterNot(x => eNames(key(x))) ++ es
    }
    base.copy(
      dimensions = merge(base.dimensions, ext.dimensions)(_.name),
      metrics = merge(base.metrics, ext.metrics)(_.name),
      primaryKey = if (ext.primaryKey.nonEmpty) ext.primaryKey else base.primaryKey)
  }

  // ------------------------------------------------------------------
  // relationships
  // ------------------------------------------------------------------

  private val RRef = raw"r\(\s*(\w+)\.(\w+)\s*\)".r

  private def relFromBody(body: String): Option[RelSpec] = {
    val tpe = prop(body, "type").getOrElse("many_to_one")
    for {
      f <- raw"from\s*:\s*r\(\s*(\w+)\.(\w+)\s*\)".r.findFirstMatchIn(body)
      t <- raw"to\s*:\s*r\(\s*(\w+)\.(\w+)\s*\)".r.findFirstMatchIn(body)
    } yield RelSpec(tpe, f.group(1), f.group(2), t.group(1), t.group(2))
  }

  private def datasetRels(body: String,
      named: Map[String, RelSpec]): Seq[RelSpec] = {
    var out = Vector.empty[RelSpec]
    // inline Relationship blocks (inside RelationshipConfig or bare);
    // an enclosing `active: false` config drops the edge
    val RelBlock = raw"(?s)RelationshipConfig\s*\{".r
    RelBlock.findAllMatchIn(body).foreach { m =>
      val close = matchBrace(body, m.end - 1)
      if (close > 0) {
        val cfg = body.substring(m.end, close)
        val active = !flatten(cfg).contains("active: false")
        if (active)
          raw"(?s)Relationship\s*\{".r.findFirstMatchIn(cfg).foreach { rm =>
            val rclose = matchBrace(cfg, rm.end - 1)
            if (rclose > 0) out ++= relFromBody(cfg.substring(rm.end, rclose))
          }
      }
    }
    // relationship(name, active) references
    raw"relationship\(\s*(\w+)\s*(?:,\s*(\w+))?\s*\)".r.findAllMatchIn(body)
      .foreach { m =>
        val active = m.group(2) == null || m.group(2) == "true"
        if (active) named.get(m.group(1)).foreach(out :+= _)
      }
    // rel(rel_expr: a.x OP b.y, active: bool): `>` many_to_one, `-` one_to_one
    raw"rel\(\s*rel_expr\s*:\s*(\w+)\.(\w+)\s*([->])\s*(\w+)\.(\w+)\s*(?:,\s*active\s*:\s*(\w+))?\s*\)".r
      .findAllMatchIn(body).foreach { m =>
        val active = m.group(6) == null || m.group(6) == "true"
        if (active)
          out :+= RelSpec(if (m.group(3) == ">") "many_to_one" else "one_to_one",
            m.group(1), m.group(2), m.group(4), m.group(5))
      }
    out
  }
}
