package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Explicit hot-key salting for shuffle joins — the manual escape hatch
  * for skew AQE can't reach (AQE splits oversized shuffle REDUCE
  * partitions of sort-merge joins, but not a hot build side that must
  * co-locate, not shuffle-hash joins it didn't pick, and nothing when a
  * downstream stage pins the partitioning). [[KeyProfile.keyProfile]]
  * is the diagnostic that says whether you need this and what
  * `hotThreshold` should be.
  *
  * The classic split-join: keys whose left-side row count exceeds
  * `hotThreshold` take the salted path — each hot LEFT row gets one of
  * `salts` deterministic salt values, the matching RIGHT rows are
  * replicated once per salt, and the join key widens to (key, salt) so
  * one hot key spreads over `salts` shuffle partitions. Cold keys join
  * plainly. The union of the two paths is ROW-IDENTICAL to the plain
  * join — salting only changes physical placement.
  *
  * Cost model: the hot-key histogram is one aggregate over the left
  * keys; the hot-key set is broadcast (it is small by definition — a
  * key is only hot when it repeats beyond `hotThreshold`, so there can
  * be at most n/hotThreshold of them); replication cost is salts ×
  * (right rows under hot keys), which is exactly the data that was
  * causing the straggler. Catalyst's exchange reuse executes the
  * histogram subtree once even though both split sides reference it.
  *
  * Equi-join on one or more key columns, `inner` / `left` / `right` /
  * `full` (left/right column names must be disjoint apart from the
  * keys, same as a plain `join(right, keys)`). Left-join correctness
  * falls out of the split: each hot LEFT row carries exactly one salt,
  * so an unmatched hot row null-fills exactly once, and null-keyed
  * left rows never semi-match the hot set (null ≠ null) — they take
  * the cold path, where the plain left join preserves them.
  *
  * Right/full outer ride one extra invariant: hot keys come from the
  * LEFT histogram, so every hot-key RIGHT row has a key-level left
  * match and can never null-fill. The hot path therefore joins
  * `inner` (for right) / `left` (for full) on (key, salt) — a salted
  * (key, salt) outer join would be WRONG, spuriously null-filling
  * right replicas whose salt bucket happens to be empty on the left.
  * What right/full DO need is the right side split like the left: the
  * cold path must exclude hot-key right rows (they already joined in
  * the hot path; a right/full cold join against the unsplit right
  * side would null-fill each of them a second time). Null-keyed right
  * rows never semi-match the hot set and null-fill once in the cold
  * path.
  *
  * The salt is `pmod` over a per-row monotonic id — layout-dependent,
  * which is admissible here because the RESULT is salt-invariant (any
  * spreading of a hot key's rows is correct); only physical placement
  * varies.
  */
object Skew {

  /** Single-key convenience overload. */
  def skewAwareJoin(left: DataFrame, right: DataFrame, key: String,
      hotThreshold: Long, salts: Int): DataFrame =
    skewAwareJoin(left, right, Seq(key), hotThreshold, salts)

  def skewAwareJoin(left: DataFrame, right: DataFrame, key: String,
      hotThreshold: Long): DataFrame =
    skewAwareJoin(left, right, Seq(key), hotThreshold)

  def skewAwareJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      hotThreshold: Long, salts: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(hotThreshold > 0, s"hotThreshold must be positive")
    require(keys.nonEmpty, "skewAwareJoin needs at least one key column")
    val jt = joinType.toLowerCase.replace("outer", "").stripSuffix("_")
    require(Set("inner", "left", "right", "full")(jt),
      s"skewAwareJoin supports inner, left, right and full joins, got $joinType")
    val keyCols = keys.map(col)
    // the hot-key set feeds multiple consumers (two semi joins, one or
    // two anti joins), but they all broadcast the IDENTICAL subplan —
    // Spark's exchange reuse materializes the detection aggregation
    // once and shares the broadcast (verified: an eager localCheckpoint
    // here only added a job)
    val hot = left.groupBy(keyCols: _*).agg(count(lit(1)).as("__hc"))
      .filter(col("__hc") > hotThreshold)
      .select(keyCols: _*)
    val leftHot = left.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val rightHot = right.join(broadcast(hot), keys, "left_semi")
      .withColumn("__salt",
        explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    // hot keys have >= hotThreshold left rows by construction, so the
    // hot partition never null-fills a right row: right collapses to
    // inner there, full collapses to left (see the scaladoc — an outer
    // join keyed on (key, salt) would null-fill empty salt buckets)
    val hotJt = jt match {
      case "right" => "inner"
      case "full" => "left"
      case other => other
    }
    val cond = keys.map(k => leftHot(k) === rightHot(k))
      .reduce(_ && _) && leftHot("__salt") === rightHot("__salt")
    val hotJoined = keys.foldLeft(
        leftHot.join(rightHot, cond, hotJt)
          .drop(leftHot("__salt")).drop(rightHot("__salt"))) {
        (acc, k) => acc.drop(rightHot(k))
      }
    // right/full preserve unmatched RIGHT rows, so their cold path must
    // not see hot-key right rows again (they joined in the hot path);
    // inner/left keep the unsplit right side (hot-key right rows cannot
    // match the anti-joined cold left, and skipping the split saves a
    // broadcast anti-join on the big side)
    val rightCold =
      if (jt == "right" || jt == "full")
        right.join(broadcast(hot), keys, "left_anti")
      else right
    val coldJoined = left.join(broadcast(hot), keys, "left_anti")
      .join(rightCold, keys, jt)
    coldJoined.unionByName(hotJoined.select(coldJoined.columns.map(col): _*))
  }

  /** Pre-flight join sizing: the EXACT row count an inner equi-join
    * would produce, plus its hot-key concentration, computed from the
    * two key histograms — shuffle cost ∝ distinct keys — without
    * running the join, whose output can be quadratically larger (a
    * self-join on a zipfian key). This is the check you run BEFORE
    * committing a 100 TB join: `join_rows` says whether the output is
    * even storable, `top_share` says whether one key produces most of
    * it (→ [[skewAwareJoin]] or a broadcast of that key's slice), and
    * the histograms already ARE [[KeyProfile.keyProfile]]'s shuffle, so
    * the diagnosis costs one aggregation per side.
    *
    * `join_rows = Σ_k cnt_left(k) · cnt_right(k)` exactly, with the
    * per-key product ALREADY in decimal(38,0) — two multi-billion-row
    * sides of one key overflow int64 at the multiply, before any sum,
    * precisely in the cases this check exists to catch — so the
    * product, the hottest-key struct, and the sum are all
    * overflow-safe.
    * Keys compare as strings for the hottest-key tie-break (largest
    * contribution, then largest key string — same rule both engines).
    * Returns one row: (n_left, n_right, n_join_keys, join_rows,
    * top_key, top_key_rows, top_share); an empty key intersection
    * reports zero rows and a null top key. */
  def joinCardinality(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("__nl"))
    val rc = right.groupBy(col(rightKey).cast("string").as("__k"))
      .agg(count(lit(1)).as("__nr"))
    val contrib = lc.join(rc, Seq("__k"))
      .select(col("__k"),
        (col("__nl").cast("decimal(38,0)")
          * col("__nr").cast("decimal(38,0)")).cast("decimal(38,0)")
          .as("__c"))
    val totals = left.agg(count(lit(1)).as("n_left"))
      .crossJoin(right.agg(count(lit(1)).as("n_right")))
    contrib
      .agg(count(lit(1)).as("n_join_keys"),
        coalesce(sum(col("__c")),
          lit(0).cast("decimal(38,0)")).as("join_rows"),
        max(struct(col("__c"), col("__k"))).as("__top"))
      .crossJoin(broadcast(totals))
      .select(col("n_left"), col("n_right"), col("n_join_keys"),
        col("join_rows"),
        col("__top.__k").as("top_key"),
        col("__top.__c").as("top_key_rows"),
        when(col("join_rows") > 0,
          round(col("__top.__c") / col("join_rows").cast("double"), 6))
          .as("top_share"))
  }
}
