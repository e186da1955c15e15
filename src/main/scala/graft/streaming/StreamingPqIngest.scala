package graft.streaming

import graft.ops.PqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous IVFADC-index maintenance: embeddings arriving on a stream
  * are folded into a persisted [[graft.ops.PqIndex]] micro-batch by
  * micro-batch — the streaming counterpart of [[PqIndex.append]]. Each
  * batch is assigned to the index's FROZEN centroids, encoded with its
  * FROZEN codebooks (one [[graft.functions.VectorExprs.PqEncode]]
  * projection), and appended into the cell layout, so
  * [[PqIndex.topK]]'s pruned ADC scan covers new vectors within a
  * trigger interval (shared layout, no retrain, ingest cost ∝ batch).
  *
  * Delivery is foreachBatch's: at-least-once into an append sink. A
  * replayed batch appends its rows twice — wasted space, not corrupted
  * retrieval; the scheduled [[PqIndex.build]] rebuild (which also
  * re-trains drifted centroids/codebooks) compacts them away, and
  * [[PqIndex.compact]] restores the one-sorted-file-per-cell layout
  * between rebuilds. Codebook drift matches the [[PqIndex.append]]
  * trade: quantization error of streamed rows grows as the corpus
  * distribution moves; [[graft.ops.Pq.reconstructionError]] is the
  * dial that says when to rebuild.
  */
object StreamingPqIngest {

  def maintain(stream: DataFrame, idCol: String, vecCol: String,
      path: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          PqIndex.append(batch, idCol, vecCol, path)
      }
      .start()
}
