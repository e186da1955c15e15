package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Document chunking for RAG / training-example preparation: split each
  * document into fixed-size token windows with optional overlap, keeping
  * provenance (doc id, chunk index, token offsets) so a chunk can always
  * be traced back to its source span.
  *
  * Everything is pure column expressions over the tokenized array —
  * `split` once, then `explode(sequence(...))` + `slice` per window — so
  * the whole operator is one whole-stage-codegen'd projection with NO
  * shuffle and NO UDF: at 100 TB it runs at parquet scan speed and
  * parallelism is per-file, exactly like any other map-side transform.
  * Memory per row is bounded by the document's own token array (the
  * windows are slices, not copies of the whole array per chunk, because
  * the explode happens on the index sequence, not on materialized
  * chunks).
  */
object Chunking {

  private def wsTokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

  /** One row per (doc, window): `chunk_idx` (0-based), `chunk_text`
    * (tokens re-joined with single spaces), `n_tokens` (window size —
    * `chunkTokens` except possibly the last window), and `start_token`
    * (0-based offset of the window's first token in the document).
    *
    * Windows advance by `chunkTokens - overlapTokens`; a document with
    * fewer tokens than one window still yields exactly one (short)
    * chunk, so no document is silently dropped — a chunker that loses
    * short documents biases the corpus it feeds.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    val toks = df.select(col(idCol), wsTokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // number of windows: ceil((n - overlap) / stride), min 1
      .withColumn("__nc", greatest(lit(1),
        ceil((col("__n") - lit(overlapTokens)).cast("double") / stride)
          .cast("int")))
    toks
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_idx"))
      .withColumn("start_token", col("chunk_idx") * stride)
      .withColumn("__w",
        slice(col("__toks"), col("start_token") + 1, lit(chunkTokens)))
      .select(col(idCol), col("chunk_idx"), col("start_token"),
        array_join(col("__w"), " ").as("chunk_text"),
        size(col("__w")).as("n_tokens"))
  }

  /** Per-document chunking summary (windows, covered tokens) — the
    * sanity aggregate a pipeline runs after chunking a corpus. */
  def chunkStats(chunks: DataFrame, idCol: String): DataFrame =
    chunks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("sum_tokens"),
        max(col("start_token") + col("n_tokens")).as("doc_tokens"))
}
