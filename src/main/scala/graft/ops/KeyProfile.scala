package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Key-distribution profiler: the diagnostic you run BEFORE picking a
  * partitioning/salting strategy for a 100 TB join or aggregation.
  *
  * For each requested key column it reports row count, distinct count,
  * the hottest key with its absolute count and share, the skew ratio
  * (hot-key count over the mean per-key count — 1.0 for uniform keys,
  * large for zipfian), and the Shannon entropy of the key distribution
  * in bits (log2(n_distinct) for uniform; the gap to that ceiling is
  * how concentrated the column is). A skew ratio in the hundreds says
  * an unsalted shuffle on this key will straggler; entropy near zero
  * says even AQE splitting won't help and the key is effectively a
  * constant.
  *
  * Plan shape: ONE groupBy-count per column (the minimal shuffle — a
  * key histogram cannot be computed without shuffling the keys), then a
  * single-row aggregate per column unioned on the driver side of the
  * plan (the union is over one-row frames, not data). Entropy folds
  * into the same aggregate via H = log2(n) − Σ c·log2(c) / n, so no
  * second pass over the counts. The hottest key ties deterministically
  * to the lexicographically largest key via max over a (count, key)
  * struct. Keys are profiled as strings so heterogeneous columns share
  * one output schema; null keys group like any other value and surface
  * as a null top_key when hottest.
  */
object KeyProfile {

  def keyProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyProfile needs at least one key column")
    keyCols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("__key"))
        .agg(count(lit(1)).as("__cnt"))
      counts.agg(
          sum(col("__cnt")).as("__n"),
          count(lit(1)).as("__d"),
          max(struct(col("__cnt"), col("__key"))).as("__top"),
          sum(col("__cnt").cast("double") * log(2.0, col("__cnt")))
            .as("__slc"))
        .select(
          lit(c).as("column"),
          col("__n").as("n_rows"),
          col("__d").as("n_distinct"),
          col("__top.__key").as("top_key"),
          col("__top.__cnt").as("top_count"),
          round(col("__top.__cnt") / col("__n"), 6).as("top_share"),
          round(col("__top.__cnt") / (col("__n") / col("__d")), 6)
            .as("skew_ratio"),
          round(log(2.0, col("__n")) - col("__slc") / col("__n"), 6)
            .as("entropy_bits"))
    }.reduce(_ unionByName _)
  }
}
