package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Document deduplication operators for training-data pipelines.
  *
  * Every operator is a pure DataFrame transform: shuffles are keyed on
  * content hashes / LSH buckets (uniformly distributed), no driver-side
  * collection, no O(n²) candidate generation — all designed to survive a
  * 100 TB corpus on a real cluster.
  */
object Dedup {

  /** Exact dedup on a content hash. Keeps the lowest `idCol` per group —
    * one shuffle on the (uniform) hash key. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(idCol))
    df.withColumn("__h", sha2(col(textCol), 256))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** Groups of exact duplicates (size > 1), for auditing. */
  def exactDuplicateGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(count(lit(1)).as("copies"), min(col(idCol)).as("keeper_id"))
      .filter(col("copies") > 1)

  /** MinHash signature: for each of `numHashes` seeded hash functions, the
    * minimum hash over the shingle set (shingle→minhash stage of the
    * shingle→minhash→band→bucket-join pipeline). */
  def minHashSignature(shinglesCol: String, numHashes: Int): Column =
    expr(s"transform(sequence(0, ${numHashes - 1}), " +
      s"seed -> array_min(transform($shinglesCol, s -> xxhash64(s, seed))))")

  /** Near-duplicate pairs via MinHash + LSH banding.
    *
    * Signature rows are split into `bands`; docs sharing any band bucket
    * become candidates (bucket join — shuffle keyed on band hash, never a
    * cross join); candidates are verified with exact Jaccard over shingle
    * sets. Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥
    * `threshold`.
    */
  def minHashLSH(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands

    val prepared = df
      .select(col(idCol).as("id"),
        expr(s"array_distinct(transform(sequence(1, greatest(size(split(lower($textCol), '\\\\s+')) - ${shingleSize - 1}, 1)), " +
          s"i -> concat_ws(' ', slice(split(lower($textCol), '\\\\s+'), i, $shingleSize))))")
          .as("sh"))
      .withColumn("sig", minHashSignature("sh", numHashes))

    val banded = prepared.select(col("id"), col("sh"),
      explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> named_struct(" +
          s"'band', b, 'bucket', xxhash64(cast(slice(sig, b * $rows + 1, $rows) as string))))"))
        .as("lsh"))
      .select(col("id"), col("sh"), col("lsh.band"), col("lsh.bucket"))

    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b") // same pair can collide in many bands

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over word hashes: bit b of the fingerprint is set when
    * the population of tokens with bit b set outweighs those without. */
  def simHash(textCol: String): Column =
    expr(s"""
      aggregate(
        sequence(0, 63),
        0L,
        (acc, b) -> acc + shiftleft(
          CASE WHEN aggregate(
            transform(split(lower($textCol), '\\\\s+'), t -> xxhash64(t)),
            0L,
            (s, h) -> s + CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END
          ) > 0 THEN 1L ELSE 0L END, b))
    """)

  /** Near-duplicate pairs by SimHash Hamming distance ≤ `maxDistance`.
    *
    * Pigeonhole blocking: the 64-bit fingerprint splits into
    * `maxDistance + 1` chunks; any pair within distance shares at least one
    * identical chunk, so candidates come from equi-joins on (chunkIdx,
    * chunkValue) — shuffle-friendly, no cross join. Verified with
    * bit_count(xor). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val width = 64 / chunks
    val withSig = df.select(col(idCol).as("id"), simHash(textCol).as("sig"))
    val chunked = withSig.select(col("id"), col("sig"),
      explode(expr(s"transform(sequence(0, ${chunks - 1}), c -> named_struct(" +
        s"'c', c, 'v', (sig >> (c * $width)) & ${(1L << width) - 1}))")).as("ch"))
      .select(col("id"), col("sig"), col("ch.c"), col("ch.v"))
    val l = chunked.select(col("c"), col("v"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("c"), col("v"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("c", "v"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxDistance)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact character-n-gram Jaccard similarity for pairs within a blocking
    * key (e.g. source/language). Block sizes must be bounded — this is the
    * verify-stage primitive, not the candidate generator; use
    * [[minHashLSH]] to generate candidates at corpus scale. */
  def ngramJaccardWithinBlocks(df: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int = 4, threshold: Double = 0.3): DataFrame = {
    val grams = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      expr(s"array_distinct(transform(sequence(1, greatest(length($textCol) - ${n - 1}, 1)), " +
        s"i -> substring($textCol, i, $n)))").as("g"))
    val l = grams.select(col("block"), col("id").as("id_a"), col("g").as("g_a"))
    val r = grams.select(col("block"), col("id").as("id_b"), col("g").as("g_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))))
      .filter(col("jaccard") >= threshold)
      .select("block", "id_a", "id_b", "jaccard")
  }
}
