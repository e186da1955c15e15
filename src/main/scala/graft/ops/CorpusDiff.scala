package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two corpus versions — the audit step between
  * "yesterday's training set" and "today's": which documents were
  * added, removed, changed in place, or untouched.
  *
  * One full-outer join keyed on the document id (both sides shuffle on
  * the same key — co-partitioned, no broadcast needed at any scale) over
  * content HASHES, so the join rows carry 16 bytes of content instead of
  * whole documents. Equal text always hashes equal; a changed document
  * is misreported as unchanged only on an xxhash64 collision (~2^-64
  * per pair) — the standard trade for not shuffling 100 TB of text. */
object CorpusDiff {

  /** Per-document status: (id, status ∈ added|removed|changed|unchanged). */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), xxhash64(col(textCol)).as("__old_h"))
    val n = newDf.select(col(idCol), xxhash64(col(textCol)).as("__new_h"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__old_h").isNull, "added")
          .when(col("__new_h").isNull, "removed")
          .when(col("__old_h") =!= col("__new_h"), "changed")
          .otherwise("unchanged"))
      .select(col(idCol), col("status"))
  }

  /** Rollup of [[diff]]: one row per status with document counts. */
  def summary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
