package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted MinHash-LSH dedup index: the corpus's band keys and
  * signatures stored PARTITIONED BY a hash bucket of the band key, so
  * deduplicating a NEW batch against a 100 TB corpus reads only the
  * partitions the batch's own keys land in — the near-dup twin of
  * [[IvfIndex]] (vectors) and [[TextIndex]] (keywords). Without an
  * index, every incoming crawl slice pays a full-corpus LSH pass
  * ([[Dedup.crossCorpusNearDups]]); with it, per-batch cost is
  * proportional to the batch.
  *
  * The index stores SIGNATURES, not text (storage ∝ docs × numHashes
  * ints, not corpus bytes), so matches carry the standard signature
  * estimate of Jaccard — component agreement of the two signatures,
  * unbiased with σ ≈ 1/√numHashes (~0.125 at 64 hashes). Callers
  * wanting exact similarity join the matched pairs back to text and
  * use [[Dedup.ngramJaccardWithinBlocks]]-style verification; for a
  * drop/keep gate at threshold ≥ 0.5 the estimate is what production
  * dedup services act on.
  *
  * Layout under `path`:
  *   - `keys/__pb=<b>/…` — (id, band, bucket, sig) rows, the signature
  *     denormalized onto each of the doc's `bands` keys (≈ bands ×
  *     numHashes ints per doc) so candidate scoring needs no second,
  *     unpruned signature fetch — same trade as [[TextIndex]]'s
  *     df/doc_len denormalization
  *   - `meta.txt` — `shingleSize,numHashes,bands,nBuckets,nDroppedBuckets`
  *
  * Skew contract (same as [[Dedup.minHashLSH]]): band buckets holding
  * more than `maxBucketSize` docs (boilerplate/empty-doc clusters) are
  * dropped AT BUILD from candidate generation — a batch doc landing
  * only in dropped buckets reports no near-dups even if some exist;
  * exact copies of such docs are [[Dedup.exactDuplicates]]'s job. The
  * drop count is recorded in `meta.txt` (no silent caps).
  */
object DedupIndex {

  private def partBucket(nBuckets: Int) =
    pmod(col("bucket"), lit(nBuckets.toLong)).cast("int").as("__pb")

  /** Signature + band-key computation shared verbatim with
    * [[Dedup.minHashLSH]] — index and live pass can never drift. */
  private def sigKeys(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, numHashes: Int, bands: Int): DataFrame = {
    val sigs = Dedup.minhashSigRows(
      Dedup.shingleHashes(df, idCol, textCol, shingleSize), numHashes)
    val sigArr = sigs.select(col("id"),
      array((0 until numHashes).map(i => col(s"__m$i")): _*).as("sig"))
    Dedup.bandedSigKeys(sigs, numHashes, bands).join(sigArr, "id")
  }

  def build(corpus: DataFrame, idCol: String, textCol: String,
      path: String, shingleSize: Int = 3, numHashes: Int = 64,
      bands: Int = 16, nBuckets: Int = 64,
      maxBucketSize: Int = 1000): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = corpus.sparkSession
    val keys = sigKeys(corpus, idCol, textCol, shingleSize, numHashes,
      bands)
    // build-time skew cap: count docs per band bucket on the already-
    // keyed frame (one window over the write shuffle's own exchange)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket"))
    val sized = keys.withColumn("__bc", count(lit(1)).over(w))
    val kept = sized.filter(col("__bc") <= maxBucketSize)
    val dropped = sized.filter(col("__bc") > maxBucketSize)
      .select(col("band"), col("bucket")).distinct().count()
    kept.select(col("id"), col("band"), col("bucket"), col("sig"),
        partBucket(nBuckets))
      .repartition(col("__pb"))
      .write.mode("overwrite").partitionBy("__pb")
      .parquet(s"$path/keys")
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(s"$path/meta.txt"), true)
    try out.write(s"$shingleSize,$numHashes,$bands,$nBuckets,$dropped"
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** `(shingleSize, numHashes, bands, nBuckets, nDroppedBuckets)`. */
  def loadMeta(spark: SparkSession, path: String): (Int, Int, Int, Int, Long) = {
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$path/meta.txt"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val p = text.trim.split(",")
    (p(0).toInt, p(1).toInt, p(2).toInt, p(3).toInt, p(4).toLong)
  }

  /** Near-duplicate matches of `batch` against the indexed corpus:
    * (batch_id, corpus_id, est_jaccard ≥ threshold). The batch's band
    * keys are broadcast and joined on (__pb, band, bucket), so dynamic
    * partition pruning restricts the keys scan to the batch's own
    * partition buckets — corpus I/O ∝ batch keys, not corpus size. The
    * signature-agreement estimate runs only on candidate pairs (already
    * bucket-filtered), where the interpreted zip_with is microseconds
    * against the join's row count. LSH parameters come from `meta.txt`
    * — a batch can never be keyed differently than the index it
    * queries. */
  def query(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val (shingleSize, numHashes, bands, nBuckets, _) = loadMeta(spark, path)
    val probes = sigKeys(batch, idCol, textCol, shingleSize, numHashes,
        bands)
      .select(col("id").as("batch_id"), col("band"), col("bucket"),
        partBucket(nBuckets), col("sig").as("__bsig"))
    // a corpus whose every bucket crossed the build cap writes an empty
    // dataset (no parquet footers to infer from) — that index matches
    // nothing, which is exactly what an empty result says
    val index = try spark.read.parquet(s"$path/keys")
      .select(col("id").as("corpus_id"), col("band"), col("bucket"),
        col("__pb"), col("sig").as("__csig"))
    catch { case _: org.apache.spark.sql.AnalysisException =>
      return probes.limit(0)
        .select(col("batch_id"), col("batch_id").as("corpus_id"),
          lit(0.0).as("est_jaccard"))
    }
    index.join(broadcast(probes), Seq("__pb", "band", "bucket"))
      .filter(col("corpus_id") =!= col("batch_id"))
      // a pair colliding in several bands is one candidate; signatures
      // are identical across its copies so any row represents the pair
      .dropDuplicates("batch_id", "corpus_id")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("__bsig"), col("__csig"),
            (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("est_jaccard"))
  }
}
