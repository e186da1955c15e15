package graft.streaming

import graft.ops.DedupIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous dedupe-and-append: crawl slices arriving on a stream are
  * folded into a persisted [[graft.ops.DedupIndex]] micro-batch by
  * micro-batch — the streaming counterpart of [[DedupIndex.ingest]]'s
  * slice-arrival loop, and the LSH twin of [[StreamingIvfIngest]].
  * Each batch is matched against the indexed corpus (partition-pruned,
  * I/O ∝ batch), deduplicated within itself, and its survivors' band
  * keys appended, so the next micro-batch sees them within a trigger
  * interval. The per-batch verdicts land in the index's `last_ingest/`
  * receipt (most recent slice only — stream a copy elsewhere from
  * foreachBatch if the full audit trail matters).
  *
  * Delivery is foreachBatch's: at-least-once into an append sink. A
  * batch REPLAYED after a failure re-ingests ids the index already
  * holds — [[DedupIndex.ingest]]'s fresh-id contract — so its docs
  * re-append rather than self-match (the index stores rows, not a
  * keyed map). Space, not correctness, degrades; the periodic
  * [[DedupIndex.build]] rebuild (or [[DedupIndex.compact]] for
  * layout-only maintenance) is the cleanup path, exactly as for the
  * IVF stream. */
object StreamingDedupIngest {

  def maintain(stream: DataFrame, idCol: String, textCol: String,
      path: String, checkpoint: String,
      threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          DedupIndex.ingest(batch.sparkSession, path, batch, idCol,
            textCol, threshold)
          ()
        }
      }
      .start()
}
