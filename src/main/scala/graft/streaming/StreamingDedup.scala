package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous content dedup over an unbounded document stream — the
  * streaming counterpart of `ops.Dedup.incrementalNew`: where the batch
  * op answers "which rows of today's delta are new", this keeps a live
  * stream emitting only each content's FIRST arrival.
  *
  * State is the seen-content hash set in the state store, keyed by
  * xxhash64(text) — 8 bytes per distinct document, partitioned by the
  * (uniform) hash, so state scales with DISTINCT content, never with
  * replay volume, and rocksdb state stores carry it at corpus scale.
  *
  * Two variants, because state lifetime is a real product decision:
  *   - [[distinctContent]]: exact forever-dedup; state never expires.
  *     Right for bounded-vocabulary streams (model registries, schema
  *     events); on an open crawl the state grows with the corpus.
  *   - [[distinctContentWithin]]: watermark-bounded dedup
  *     (`dropDuplicatesWithinWatermark`): replays are only suppressed
  *     inside the event-time horizon, and state expires with the
  *     watermark. Right for open-ended ingest where a replay storm is
  *     hours long, not months — pair with a periodic batch
  *     `incrementalNew` sweep for the long tail.
  */
object StreamingDedup {

  def distinctContent(stream: DataFrame, textCol: String): DataFrame =
    stream.withColumn("__content_hash", xxhash64(col(textCol)))
      .dropDuplicates("__content_hash")
      .drop("__content_hash")

  def distinctContentWithin(stream: DataFrame, textCol: String,
      tsCol: String, delay: String): DataFrame =
    stream.withColumn("__content_hash", xxhash64(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
