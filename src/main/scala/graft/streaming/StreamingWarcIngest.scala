package graft.streaming

import graft.functions.WarcExprs
import graft.ops.{TextAnalysis, UrlOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{Column, DataFrame}

/** Continuous CommonCrawl-style corpus ingestion: a stream of WARC
  * archive blobs becomes analysis-ready corpus rows — record split →
  * response filter → WET text extraction → URL canonicalization →
  * language id → size features — landing micro-batch by micro-batch in
  * an idempotent per-batch parquet layout. This is the front door of
  * the training-data pipeline: everything downstream (dedup, quality
  * gates, token counting, indexing) consumes what this emits.
  *
  * [[extract]] is the batch core and runs identically inside or outside
  * the stream — one declarative plan over the compiled kernels
  * ([[WarcExprs.warcRecords]], [[WarcExprs.gunzipText]],
  * [[TextAnalysis.htmlToText]]) and pure column functions, no UDFs, so
  * a 100 TB backfill and the live stream share one code path.
  *
  * Landing mirrors [[StreamingRollup]]'s exactly-once arrangement: each
  * micro-batch overwrites its own `__batch=<id>` directory, so a batch
  * replayed after a failure between write and checkpoint commit rewrites
  * identical content instead of appending duplicates; readers take
  * `corpusDir` whole and see every batch as plain rows. */
object StreamingWarcIngest {

  /** Archive blobs → corpus rows. One row per well-formed `response`
    * record: `(doc_id, target_uri, url, host, text, lang, n_chars,
    * n_tokens)` where `doc_id = xxhash64(canonical url)` (stable across
    * refetches of the same page), `url` is the canonical form, `text`
    * is the WET extraction. Binary blob columns are gunzipped first
    * (`.warc.gz`, one member per record); string blobs parse directly.
    * Corrupt gzip members or blobs with no well-formed record simply
    * contribute no rows — a poisoned archive must not kill the scan. */
  def extract(archives: DataFrame, blobCol: String): DataFrame = {
    val blob = archives.schema(blobCol).dataType match {
      case BinaryType => WarcExprs.gunzipText(col(blobCol))
      case _ => col(blobCol)
    }
    val canonical: Column = UrlOps.canonicalizeUrl(col("r.target_uri"))
    archives
      .select(explode(WarcExprs.warcRecords(blob)).as("r"))
      .filter(col("r.rec_type") === "response" &&
        col("r.target_uri").isNotNull)
      .select(canonical.as("url"), col("r.payload").as("__raw"))
      .select(xxhash64(col("url")).as("doc_id"), col("url"),
        UrlOps.urlHost(col("url")).as("host"),
        TextAnalysis.htmlToText(col("__raw")).as("text"))
      .withColumn("lang", TextAnalysis.langId(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col("text")).cast("long"))
  }

  /** Start folding a stream of archive blobs into `corpusDir`. The
    * stream's `blobCol` is binary for `.warc.gz` members, string for
    * uncompressed archives. Partitioning: each batch repartitions to the
    * session default before the write so extraction parallelizes across
    * the cluster even when one trigger delivers few large archives
    * (a single CommonCrawl segment is ~1 GB compressed — one input row,
    * hours of work for one task otherwise). */
  def maintain(stream: DataFrame, blobCol: String, corpusDir: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val rows = extract(
          batch.repartition(spark.sparkContext.defaultParallelism), blobCol)
        rows.write.mode("overwrite").parquet(s"$corpusDir/__batch=$batchId")
        ()
      }
      .start()
}
