package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Hybrid-retrieval rank fusion: combine per-query rankings from
  * heterogeneous retrievers — lexical ([[TextIndex]] BM25) and vector
  * ([[Similarity]] / [[IvfIndex]] ANN) being the production pair — into
  * one list without score calibration. Reciprocal Rank Fusion (Cormack
  * et al., SIGIR 2009): each list contributes 1 / (k + rank) per doc,
  * summed; `k` (default 60, the paper's setting) damps the head so one
  * retriever's rank-1 cannot drown the other's consensus. RRF uses only
  * RANKS, which is the point — BM25 scores and cosine similarities live
  * on incomparable scales, and score normalization is corpus- and
  * query-dependent where rank fusion is not.
  *
  * Plan shape: union of the (narrow) ranking frames, one partial-
  * aggregated groupBy on (query_id, doc_id), one rank window per query
  * — each input list is top-k-bounded by its retriever, so the fused
  * frame is rows ≈ queries × k × lists regardless of corpus size; the
  * heavy lifting stayed in the retrievers. A doc absent from one list
  * simply receives no contribution from it (the standard convention). */
object Fusion {

  /** @param rankings frames of (query_id, doc_id, rank) — rank 1-based
    *                 within each (frame, query); extra columns ignored
    * @return (query_id, doc_id, rrf_score rounded to 6, fused_rank),
    *         fused_rank tie-broken by doc_id ascending */
  def rrf(rankings: Seq[DataFrame], queryIdCol: String = "query_id",
      docIdCol: String = "doc_id", rankCol: String = "rank",
      k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k > 0 && topK > 0, "k and topK must be positive")
    val contrib = rankings
      .map(_.select(col(queryIdCol).as("query_id"),
        col(docIdCol).as("doc_id"),
        (lit(1.0) / (lit(k) + col(rankCol))).as("__c")))
      .reduce(_ unionByName _)
    val fused = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("__s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("doc_id").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
      .select(col("query_id"), col("doc_id"),
        round(col("__s"), 6).as("rrf_score"), col("fused_rank"))
  }
}
