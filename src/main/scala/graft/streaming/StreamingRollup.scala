package graft.streaming

import graft.model.{Catalog, PreAggregation}
import graft.preagg.PreAggStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Structured-Streaming maintenance of pre-aggregations — beyond the
  * reference (which only has batch incremental refresh,
  * pre_aggregation.py:718-879): a file stream over the model's source
  * keeps the rollup continuously fresh.
  *
  * Each micro-batch aggregates to rollup grain, merges ADDITIVELY with the
  * affected stored partitions (Σsum/Σcount/min/max — exact because every
  * stored measure is decomposable), and rewrites only those partitions via
  * dynamic partition overwrite. State lives in the rollup itself, so the
  * stream needs no Spark aggregation state store and restarts are cheap
  * (checkpoint tracks file offsets only).
  */
final class StreamingRollup(spark: SparkSession, cat: Catalog,
    store: PreAggStore) {

  /** Start maintaining `pa` from new files appearing under `sourceDir`.
    * Default trigger AvailableNow processes the backlog then stops —
    * callers wanting continuous refresh pass a ProcessingTime trigger. */
  def maintain(modelName: String, pa: PreAggregation, sourceDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val m = cat.model(modelName)
    require(pa.partitionGranularity.isDefined,
      "Streaming maintenance needs partition_granularity")
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val path = store.rollupPath(modelName, pa)

    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val batchRollup = store.rollupOf(m, pa, batch)
        val affected = batchRollup.select("__part").distinct()
          .collect().map(_.getString(0))
        if (affected.nonEmpty) {
          val existing =
            if (store.rollupExists(path))
              spark.read.parquet(path)
                .filter(col("__part").isin(affected.toSeq: _*))
                // partition column comes back typed by the reader
                .withColumn("__part", col("__part").cast("string"))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], batchRollup.schema)
          val merged = store.mergeComponents(pa, m,
            existing.unionByName(batchRollup, allowMissingColumns = true))
          merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__part").parquet(path)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
