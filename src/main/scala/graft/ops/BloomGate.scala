package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed Bloom pre-gate for incremental dedup: a compact,
  * JOIN-FREE-ish membership summary of a corpus key column that lets an
  * arriving batch skip the expensive exact-dedup machinery for rows the
  * corpus has definitely never seen.
  *
  * The filter is not driver state and not a sketch blob: it is a plain
  * DataFrame of bit words, (bucket, word, bits), built with ordinary
  * hash/bit expressions and a `bit_or` aggregate — so it scales by
  * partitioning like any other table (total bits ∝ corpus size spread
  * over `nBuckets`), persists as parquet, unions incrementally
  * (bit_or is idempotent and order-free), and — because the k probe
  * hashes are the repo's engine-portable md5 convention — the ENTIRE
  * filter replays bit-for-bit in the DuckDB oracle. No opaque binary,
  * no UDF, no driver collect.
  *
  * Contract: [[probe]]'s `maybe_dup = false` is definitive (the row's
  * key cannot be in the corpus); `true` is "check me" — false-positive
  * rate follows the standard (1−e^(−kn/m))^k. Route the `false` rows
  * straight to ingest and only the `true` rows through
  * [[DedupIndex.ingest]] / an exact anti-join: at a 1% FP rate the
  * exact path sees 1% of a mostly-fresh batch instead of all of it.
  *
  * Sizing at 100 TB: bits are ~10 per corpus key at 1% FP with k=5 —
  * 10B keys ≈ 12.5 GB of words, far too big for one broadcast, which is
  * exactly why the words live in (bucket, word) rows: the probe joins
  * on (bucket, word) pairs, so Spark shuffles or broadcasts PER-BUCKET
  * slices as statistics dictate, and a probe batch only touches the
  * word rows its keys hash to (k rows per key).
  */
object BloomGate {

  /** Engine-portable 32-bit hash of `key` under seed `i`:
    * Spark `conv(substring(md5(i:key),1,8),16,10)` ==
    * DuckDB `('0x'||substr(md5(i||':'||key),1,8))::BIGINT`. */
  private def h(i: Column, key: Column): Column =
    conv(substring(md5(concat(i.cast("string"), lit(":"),
      key.cast("string")).cast("binary")), 1, 8), 16, 10).cast("long")

  /** Build the word table: (__bucket, __word, __bits), one row per
    * word that has at least one bit set. Words pack 63 bits, not 64:
    * bit 63 of a signed long is only reachable through an
    * overflow-checked `1 << 63` in DuckDB, so capping the shift at 62
    * keeps every mask positive and the table replayable in both
    * engines (one bit of density traded for portability). One
    * projection + one `bit_or` aggregate over corpus × k — the only
    * exchange is the aggregation's. Re-running over new rows and
    * unioning (or `bit_or`-merging) word tables composes: the OR of
    * two filters IS the filter of the union. */
  def build(corpus: DataFrame, keyCol: String, mBitsPerBucket: Int = 1 << 14,
      kHashes: Int = 5, nBuckets: Int = 32): DataFrame = {
    require(mBitsPerBucket >= 63,
      s"mBitsPerBucket must be >= 63, got $mBitsPerBucket")
    require(kHashes >= 1, s"kHashes must be >= 1, got $kHashes")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val key = col(keyCol)
    corpus.filter(key.isNotNull)
      .select(pmod(h(lit("b"), key), lit(nBuckets)).as("__bucket"),
        explode(array((0 until kHashes).map(i =>
          pmod(h(lit(i), key), lit(mBitsPerBucket))): _*)).as("__pos"))
      .select(col("__bucket"), (col("__pos") / 63).cast("int").as("__word"),
        expr("shiftleft(cast(1 as bigint), cast(__pos % 63 as int))")
          .as("__mask"))
      .groupBy(col("__bucket"), col("__word"))
      .agg(expr("bit_or(__mask)").as("__bits"))
  }

  /** Gate a batch against a word table built with the SAME
    * (mBitsPerBucket, kHashes, nBuckets): one row per batch row,
    * (idCol, maybe_dup). A key is `maybe_dup` only if ALL k of its bits
    * are set; any missing word row is an unset bit. Null-keyed rows are
    * `maybe_dup = false`: [[build]] never inserts null keys, so a null
    * key is definitively absent — callers routing false→ingest /
    * true→exact path see every batch row on exactly one side. The join
    * is k rows per key against the word table — partition-prunable by
    * bucket and broadcastable when the filter is small. */
  def probe(bloom: DataFrame, batch: DataFrame, idCol: String,
      keyCol: String, mBitsPerBucket: Int = 1 << 14, kHashes: Int = 5,
      nBuckets: Int = 32): DataFrame = {
    val key = col(keyCol)
    val probes = batch.filter(key.isNotNull)
      .select(col(idCol),
        pmod(h(lit("b"), key), lit(nBuckets)).as("__bucket"),
        posexplode(array((0 until kHashes).map(i =>
          pmod(h(lit(i), key), lit(mBitsPerBucket))): _*))
          .as(Seq("__i", "__pos")))
      .select(col(idCol), col("__bucket"),
        (col("__pos") / 63).cast("int").as("__word"),
        expr("shiftleft(cast(1 as bigint), cast(__pos % 63 as int))")
          .as("__mask"))
    val gated = probes.join(bloom, Seq("__bucket", "__word"), "left")
      .select(col(idCol),
        (coalesce(col("__bits"), lit(0L)).bitwiseAND(col("__mask"))
          =!= lit(0L)).as("__hit"))
      .groupBy(col(idCol))
      .agg((count(lit(1)) === sum(when(col("__hit"), 1).otherwise(0)))
        .as("maybe_dup"))
    // one row per batch row: null keys are definitively absent (build
    // never inserts them). The union branch is a second batch scan, so
    // it is skipped when the schema proves no nulls can exist.
    val keyNullable = batch.schema.find(_.name == keyCol).forall(_.nullable)
    if (!keyNullable) gated
    else gated.unionByName(batch.filter(key.isNull)
      .select(col(idCol), lit(false).as("maybe_dup")))
  }

  /** Occupancy report of a word table: (buckets, words, set_bits,
    * fill_ratio) — the "is m big enough" dial (FP rate ≈ fill^k).
    * `mBitsPerBucket`/`nBuckets` must match the build. */
  def occupancy(bloom: DataFrame, mBitsPerBucket: Int,
      nBuckets: Int): DataFrame =
    bloom.agg(
        countDistinct(col("__bucket")).as("buckets"),
        count(lit(1)).as("words"),
        sum(bit_count(col("__bits"))).as("set_bits"))
      .select(col("buckets"), col("words"), col("set_bits"),
        round(col("set_bits") /
          (lit(mBitsPerBucket.toLong) * nBuckets), 6).as("fill_ratio"))
}
