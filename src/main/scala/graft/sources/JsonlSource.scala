package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL document ingestion with schema enforcement and corrupt-line
  * quarantine — the raw-crawl entry point of a training-data pipeline
  * (crawls arrive as json-lines; a malformed line must land in a
  * quarantine for triage, never silently vanish and never kill the job).
  *
  * Reads PERMISSIVE with an explicit schema (never inferSchema on a
  * large corpus — inference is a full extra pass over the data) and a
  * `_corrupt_record` capture column, then splits good rows from
  * quarantined raw lines. Spark's json reader requires the corrupt
  * column in a cache-or-filter-safe way: the split filters run on a
  * materialized projection, not the raw scan, per SPARK-38523 rules. */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** (good rows in `schema`, quarantined raw lines). */
  def readDocuments(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val withCorrupt = schema.add(CorruptCol, "string")
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // Spark refuses to filter directly on the corrupt column of a raw
      // json scan (SPARK-38523); a cached/shuffled projection is the
      // supported shape. localCheckpoint keeps it one pass.
      .localCheckpoint(true)
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantine = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (good, quarantine)
  }
}
