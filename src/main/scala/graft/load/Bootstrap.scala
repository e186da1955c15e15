package graft.load

import graft.model._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Data-file bootstrap: introspect parquet/CSV files into semantic models
  * (reference: sidemantic/bootstrap.py + datafiles.py — the `init --from
  * data` CLI flow). Column dtypes map to dimension types the same way the
  * reference's auto_dimensions introspection does
  * (semantic_layer.py:563 `_map_db_type`); numeric columns also get a
  * sum metric, and every model gets a row count.
  */
object Bootstrap {

  /** One model per parquet file in `dir`, named after the file. Schema
    * introspection fans out across files (each `spark.read...schema` is
    * an independent driver-side listing + footer read costing tens of
    * ms — a 10-table directory serialized them into the bootstrap's
    * dominant cost); models still register in name order, so the
    * catalog is deterministic. */
  def fromParquetDir(spark: SparkSession, dir: String): Catalog = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val schemas = Await.result(
      Future.sequence(files.toSeq.map(f =>
        Future((f, spark.read.parquet(f.getPath).schema)))),
      Duration.Inf)
    schemas.foldLeft(Catalog(dataDir = dir)) { case (cat, (f, schema)) =>
      val name = f.getName.stripSuffix(".parquet")
      cat.add(fromSchema(name,
        ModelSource.Parquet(s"{dir}/${f.getName}"), schema))
    }
  }

  /** Derive a model from a schema: semantic dimension types from physical
    * dtypes, a primary-key guess from conventional id column names. */
  def fromSchema(name: String, source: ModelSource, schema: StructType): Model = {
    val dims = schema.fields.map { f =>
      val t = f.dataType match {
        case TimestampType | DateType | TimestampNTZType => DimType.Time
        case BooleanType                                 => DimType.Bool
        case _: NumericType                              => DimType.Numeric
        case _                                           => DimType.Categorical
      }
      Dimension(f.name, t,
        granularity = if (t == DimType.Time) Some("day") else None)
    }
    val pk = schema.fields.map(_.name).find(n =>
      n == s"${name}_id" || n == "id" || n.endsWith("_id") || n.endsWith("key"))
    val sumMetrics = schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] &&
          !pk.contains(f.name) && !f.name.endsWith("_id") && !f.name.endsWith("key") =>
        Metric(s"total_${f.name}", agg = Some("sum"), sql = Some(f.name))
    }
    Model(
      name = name,
      source = source,
      primaryKey = pk.toSeq,
      dimensions = dims.toSeq,
      metrics = Metric("row_count", agg = Some("count")) +: sumMetrics.toSeq,
      defaultTimeDimension = dims.find(_.dimType == DimType.Time).map(_.name))
  }
}
