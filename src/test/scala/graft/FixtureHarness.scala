package graft

import graft.gen.Generator
import graft.load.YamlLoader
import graft.model.{Catalog, ModelSource}
import graft.plan.SemanticQuery
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, SparkSession}
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
import scala.jdk.CollectionConverters._

/** Generic runner for the reference's native-fixture contract: parse
  * seed/duckdb.sql into temp views, load model YAML through YamlLoader,
  * run each query YAML files, compare against expected/result.json.
  */
object FixtureHarness {

  private val root = "/root/reference/tests/native-fixtures"

  def run(spark: SparkSession, fixture: String,
      baseModel: Option[String] = None): Unit = {
    val dir = s"$root/$fixture"
    seed(spark, s"$dir/seed/duckdb.sql", fixture)
    val cat = YamlLoader.loadDirectory(s"$dir/models",
      name => ModelSource.Table(s"fx_${fixture}_$name"))
    val gen = new Generator(spark, cat)

    val queryFiles = new java.io.File(s"$dir/queries").listFiles()
      .filter(_.getName.endsWith(".query.yml")).sortBy(_.getName)

    queryFiles.foreach { qf =>
      // expected file convention: <name>_by_<tail>.query.yml pairs with
      // expected/<tail>_result.json when present, else the default
      // expected/result.json
      val tail = qf.getName.stripSuffix(".query.yml").split("_by_").last
      val candidate = new java.io.File(s"$dir/expected/${tail}_result.json")
      val expFile = if (candidate.exists()) candidate.getPath
        else s"$dir/expected/result.json"
      val expected = parseJsonish(read(expFile))
        .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
      val q = parseQuery(read(qf.getPath)).copy(baseModel = baseModel)
      val got = gen.plan(q).collect().toSeq
      val cols = gen.plan(q).columns.toSeq
      compare(s"$fixture/${qf.getName}", cols, got, expected)
    }
  }

  // ---- seed/duckdb.sql → temp views --------------------------------

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  private def seed(spark: SparkSession, path: String, fixture: String): Unit = {
    val stmts = read(path).split(";").map(_.trim).filter(_.nonEmpty)
    val creates = raw"(?is)create\s+table\s+(\w+)\s*\((.*)\)".r
    val inserts = raw"(?is)insert\s+into\s+(\w+)\s+values\s*(.*)".r
    val schemas = scala.collection.mutable.Map[String, StructType]()
    stmts.foreach {
      case creates(table, colsDef) =>
        val fields = colsDef.split(",").map(_.trim).filter(_.nonEmpty).map { c =>
          val parts = c.split("\\s+", 2)
          StructField(parts(0), sqlType(parts(1)))
        }
        schemas(table) = StructType(fields.toIndexedSeq)
      case inserts(table, values) =>
        val schema = schemas(table)
        val rows = splitTuples(values).map(t => Row.fromSeq(
          splitValues(t).zip(schema.fields).map { case (v, f) => literal(v, f.dataType) }))
        spark.createDataFrame(rows.asJava, schema)
          .createOrReplaceTempView(s"fx_${fixture}_$table")
      case other => throw new IllegalArgumentException(s"Unparsed seed stmt: $other")
    }
  }

  private def sqlType(t: String): DataType = t.trim.toLowerCase match {
    case s if s.startsWith("int")     => IntegerType
    case s if s.startsWith("bigint")  => LongType
    case s if s.startsWith("varchar") => StringType
    case s if s.startsWith("text")    => StringType
    case s if s.startsWith("timestamp") => TimestampType
    case s if s.startsWith("date")    => DateType
    case s if s.startsWith("decimal") || s.startsWith("numeric") =>
      DecimalType(18, 2)
    case s if s.startsWith("double") || s.startsWith("float") => DoubleType
    case s if s.startsWith("bool")    => BooleanType
    case other => throw new IllegalArgumentException(s"Unmapped seed type '$other'")
  }

  /** Split "( … ), ( … )" into tuple bodies (quotes respected). */
  private def splitTuples(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var depth = 0; var inQ = false; val cur = new StringBuilder
    s.foreach {
      case '\'' => inQ = !inQ; cur += '\''
      case '(' if !inQ => depth += 1; if (depth > 1) cur += '('
      case ')' if !inQ =>
        depth -= 1
        if (depth == 0) { out += cur.toString; cur.clear() } else cur += ')'
      case c => if (depth > 0) cur += c
    }
    out.toList
  }

  private def splitValues(t: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var inQ = false; val cur = new StringBuilder
    t.foreach {
      case '\'' => inQ = !inQ; cur += '\''
      case ',' if !inQ => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    out += cur.toString.trim
    out.toList
  }

  private def literal(v: String, dt: DataType): Any = {
    val ts = raw"(?i)timestamp\s*'(.*)'".r
    val dl = raw"(?i)date\s*'(.*)'".r
    val str = raw"'(.*)'".r
    v match {
      case "null" | "NULL" => null
      case ts(x) => java.sql.Timestamp.valueOf(x)
      case dl(x) => java.sql.Date.valueOf(x)
      case str(x) => dt match {
        case TimestampType => java.sql.Timestamp.valueOf(x)
        case DateType      => java.sql.Date.valueOf(x)
        case _             => x
      }
      case n => dt match {
        case IntegerType      => n.toInt
        case LongType         => n.toLong
        case DoubleType       => n.toDouble
        case _: DecimalType   => new java.math.BigDecimal(n).setScale(2)
        case BooleanType      => n.toBoolean
        case _                => n
      }
    }
  }

  // ---- query YAML files → SemanticQuery -------------------------

  private def parseQuery(yaml: String): SemanticQuery = {
    val m = parseJsonish(yaml).asInstanceOf[Map[String, Any]]
    def list(k: String): Seq[String] = m.get(k) match {
      case Some(l: Seq[_]) => l.map(_.toString)
      case _ => Nil
    }
    val params = m.get("parameter_values").map(_.asInstanceOf[Map[String, Any]])
      .getOrElse(Map.empty)
      .map { case (k, v) => k -> formatParam(v) }
    SemanticQuery(
      metrics = list("metrics"),
      dimensions = list("dimensions"),
      filters = list("filters"),
      segments = list("segments"),
      orderBy = list("order_by").map(outName),
      parameters = params)
  }

  /** Typed parameter formatting (reference: parameter.py format_value). */
  private def formatParam(v: Any): String = v match {
    case s: String => s"'${s.replace("'", "''")}'"
    case other     => other.toString
  }

  /** order_by entries reference fields; output columns use short names. */
  private def outName(ref: String): String = {
    val desc = ref.startsWith("-")
    val name = ref.stripPrefix("-").split('.').last
    if (desc) s"-$name" else name
  }

  // ---- expected/result.json comparison -----------------------------

  private def parseJsonish(s: String): Any = anyToScala(
    new Yaml(new SafeConstructor(new LoaderOptions())).load[Object](s))

  private def anyToScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> anyToScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(anyToScala).toSeq
    case other => other
  }

  private def compare(fixture: String, cols: Seq[String], got: Seq[Row],
      expected: Seq[Map[String, Any]]): Unit = {
    assert(got.size == expected.size,
      s"$fixture: row count ${got.size} != expected ${expected.size}\n" +
        s"got: ${got.mkString("; ")}\nexpected: ${expected.mkString("; ")}")
    got.zip(expected).zipWithIndex.foreach { case ((row, exp), i) =>
      exp.foreach { case (col, want) =>
        require(cols.contains(col),
          s"$fixture: expected column '$col' missing from ${cols.mkString(",")}")
        val g = row.get(cols.indexOf(col))
        assert(valueMatches(g, want),
          s"$fixture row $i col $col: got '$g' want '$want'")
      }
    }
  }

  private def valueMatches(got: Any, want: Any): Boolean = (got, want) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (g: java.sql.Timestamp, w: String) =>
      val s = g.toString
      s == w || s.startsWith(w) || s.take(10) == w
    case (g: java.sql.Timestamp, w: java.util.Date) =>
      g.getTime == w.getTime
    case (g: Number, w: Number) =>
      math.abs(g.doubleValue() - w.doubleValue()) <=
        1e-6 * math.max(1.0, math.abs(w.doubleValue()))
    case (g: java.math.BigDecimal, w: Number) =>
      math.abs(g.doubleValue() - w.doubleValue()) <= 1e-6
    case (g, w) => g.toString == w.toString
  }
}
