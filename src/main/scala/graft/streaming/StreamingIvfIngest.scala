package graft.streaming

import graft.ops.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous ANN-index maintenance: embeddings arriving on a stream
  * are folded into a persisted [[graft.ops.IvfIndex]] micro-batch by
  * micro-batch — the streaming counterpart of [[IvfIndex.append]]'s
  * shard-arrival path. Each batch is assigned to the index's FROZEN
  * centroids and appended into the partitioned cell layout, so queries
  * running against the index see new vectors within a trigger interval
  * and [[IvfIndex.topK]]'s partition pruning covers them immediately
  * (shared layout, no retrain, ingest cost ∝ batch).
  *
  * Delivery is foreachBatch's: at-least-once into an append sink. A
  * batch REPLAYED after a failure appends its rows twice (the index
  * stores rows, not a keyed map) — duplicated entries do not corrupt
  * retrieval (the twin rows tie and dedupe at ranking is the caller's
  * concern) but they waste space; the scheduled [[IvfIndex.build]]
  * rebuild that re-trains drifted centroids also compacts them away.
  * Centroid drift itself is the documented [[IvfIndex.append]] trade:
  * the stream never retrains, rebuilds happen offline.
  */
object StreamingIvfIngest {

  def maintain(stream: DataFrame, idCol: String, vecCol: String,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          IvfIndex.append(batch, idCol, vecCol, path)
      }
      .start()
}
