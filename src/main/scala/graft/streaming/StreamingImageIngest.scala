package graft.streaming

import graft.ops.ImageIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous image dedupe-and-append: slices of (id, image bytes)
  * arriving on a stream are folded into a persisted
  * [[graft.ops.ImageIndex]] micro-batch by micro-batch — the multimodal
  * member of the streaming-ingest family ([[StreamingDedupIngest]] for
  * text LSH, [[StreamingIvfIngest]]/[[StreamingPqIngest]] for vectors,
  * [[StreamingTextIngest]] for keywords). Each batch decodes ONCE
  * (the imageLumaGrid pixel pass), is matched against the indexed
  * corpus by perceptual hash (partition-pruned — corpus I/O ∝ batch),
  * self-deduplicated, and its fresh fingerprints appended so the next
  * micro-batch sees them within a trigger interval. Per-image verdicts
  * (`fresh` | `corpus_dup` | `batch_dup` | `undecodable`) land in the
  * index's `last_ingest/` receipt — most recent slice only; stream a
  * copy elsewhere from foreachBatch if the full audit trail matters.
  *
  * Delivery is foreachBatch's: at-least-once into an append sink. A
  * replayed batch re-appends fingerprints the index already holds —
  * space, not correctness, degrades (matching is idempotent on
  * signatures), and a periodic [[ImageIndex.build]] rebuild is the
  * cleanup path, exactly as for the text and vector streams. */
object StreamingImageIngest {

  def maintain(stream: DataFrame, idCol: String, binCol: String,
      path: String, checkpoint: String, maxDistance: Int = 6,
      gridSize: Int = 8, method: String = "ahash"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          ImageIndex.ingest(batch.sparkSession, path, batch, idCol,
            binCol, maxDistance, gridSize, method)
          ()
        }
      }
      .start()
}
