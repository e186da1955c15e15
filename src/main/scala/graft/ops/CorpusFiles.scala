package graft.ops

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-level file-layout maintenance — the small-file compactor every
  * drip-ingested 100 TB corpus needs as a scheduled job.
  *
  * Continuous ingest (micro-batch appends, per-source slices, CDC drops)
  * leaves a parquet directory with thousands of KB-sized files; every
  * downstream scan then pays per-file open + footer-parse overhead and
  * object-store LIST throttling, and the small row groups defeat
  * column-chunk statistics pruning. Compaction rewrites the directory
  * into size-targeted files and swaps it live with the same crash-safe
  * rename-aside protocol as the index compactors ([[IndexFiles]]): a
  * complete copy of the corpus exists on disk at every instant, and
  * [[recover]] heals the one no-live-directory window.
  *
  * Output file count = ceil(currentBytes / targetBytes), derived from the
  * file listing — no data pass before the rewrite. Two layouts:
  *
  *   - unsorted (`sortCols` empty): round-robin `repartition(n)` —
  *     size-balanced output regardless of input skew (a `coalesce`
  *     would avoid the shuffle but can only merge neighbors: it
  *     inherits ingest-order imbalance and cannot split a fat file);
  *   - sorted (`sortCols` given): `repartitionByRange` + in-partition
  *     sort — the compactor doubles as a layout job, giving each output
  *     file a tight min/max range on the sort key so downstream
  *     point/range scans skip whole files off parquet column statistics.
  *
  * Single-writer contract: don't compact concurrently with an append.
  */
object CorpusFiles {

  /** Compact `<dir>` to ~`targetBytes` files and swap live; returns a
    * one-row receipt (rows, files_before, files_after). */
  def compactBySize(spark: SparkSession, dir: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val p = new org.apache.hadoop.fs.Path(dir)
    val parent = p.getParent
    require(parent != null, s"cannot compact a filesystem root: $dir")
    val bytes = IndexFiles.parquetBytes(spark, dir)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    require(n <= Int.MaxValue, s"$dir: $bytes bytes / $targetBytes per file " +
      "needs more than Int.MaxValue output files")
    IndexFiles.compactWith(spark, parent.toString, p.getName) { df =>
      val shaped =
        if (sortCols.isEmpty) df.repartition(n.toInt)
        else df.repartitionByRange(n.toInt, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      shaped.write.mode("overwrite")
    }
  }

  /** Heal a compaction swap interrupted in its no-live-directory window
    * (see [[IndexFiles.recover]]); idempotent, rename-only. */
  def recover(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    IndexFiles.recover(spark, p.getParent.toString, p.getName)
  }
}
