package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous content dedup over an unbounded document stream — the
  * streaming counterpart of `ops.Dedup.incrementalNew`: where the batch
  * op answers "which rows of today's delta are new", this keeps a live
  * stream emitting one row per distinct content (the first-processed
  * arrival; when replays land in the SAME microbatch, which of them
  * wins is partition order, not wall-clock order — cross-batch, the
  * earlier batch always wins via state).
  *
  * State is the seen-content hash set in the state store, keyed by
  * xxhash64(text) — 8 bytes per distinct document, partitioned by the
  * (uniform) hash, so state scales with DISTINCT content, never with
  * replay volume, and rocksdb state stores carry it at corpus scale.
  * The hash key is the scale trade: a 64-bit collision (birthday
  * pressure ~n²/2⁶⁵) silently suppresses one distinct document; pass
  * `exact = true` to key on the text itself (state grows with document
  * bytes) when that loss is unacceptable and the stream is bounded.
  *
  * Two variants, because state lifetime is a real product decision:
  *   - [[distinctContent]]: forever-dedup; state never expires.
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

  def distinctContent(stream: DataFrame, textCol: String,
      exact: Boolean = false): DataFrame =
    stream.withColumn("__content_hash", xxhash64(col(textCol)))
      .dropDuplicates(dedupCols(textCol, exact))
      .drop("__content_hash")

  def distinctContentWithin(stream: DataFrame, textCol: String,
      tsCol: String, delay: String, exact: Boolean = false): DataFrame =
    stream.withColumn("__content_hash", xxhash64(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(dedupCols(textCol, exact))
      .drop("__content_hash")

  private def dedupCols(textCol: String, exact: Boolean): Seq[String] =
    if (exact) Seq("__content_hash", textCol) else Seq("__content_hash")
}
