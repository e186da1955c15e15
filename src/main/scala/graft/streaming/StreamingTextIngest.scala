package graft.streaming

import graft.ops.TextIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous search-index maintenance: documents arriving on a stream
  * are folded into a persisted [[graft.ops.TextIndex]] micro-batch by
  * micro-batch — the third leg of the per-index streaming trio
  * ([[StreamingIvfIngest]] for vectors, [[StreamingDedupIngest]] for
  * near-dup state). Each batch's postings are keyed with the index's
  * own persisted bucket count and appended into the partitioned
  * layout, and corpus stats update with the batch, so BM25 queries see
  * new documents within a trigger interval through the same
  * bucket-pruned scan.
  *
  * Delivery is foreachBatch's: at-least-once into an append sink — a
  * replayed batch re-appends its postings (duplicate rows inflate tf
  * groupings for those docs until maintenance), and [[TextIndex.append]]'s
  * df-staleness trade applies per slice. The periodic
  * [[TextIndex.build]] rebuild restores exact global df and compacts;
  * [[TextIndex.compact]] handles the file tail alone. */
object StreamingTextIngest {

  def maintain(stream: DataFrame, idCol: String, textCol: String,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          TextIndex.append(batch, idCol, textCol, path)
      }
      .start()
}
