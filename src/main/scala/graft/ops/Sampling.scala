package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * Everything here is a pure function of the row's id — no RNG, no
  * `rand()`, no monotonically_increasing_id. That is the property a
  * 100 TB pipeline actually needs: the train/val/test assignment of a
  * document never changes across reruns, executors, partition counts, or
  * engines, so splits are reproducible and leakage-auditable. The hash
  * is the first 8 hex chars of md5 of the id rendered as a string —
  * chosen over Spark's xxhash64/Murmur3 because md5 is engine-portable
  * (the DuckDB oracles recompute the exact bucket, making the split
  * itself oracle-gated, not just its row counts).
  *
  * All expressions are built-ins (md5/conv/substring) — whole-stage
  * codegen, evaluated at scan speed, no shuffle added by bucketing
  * itself. Only [[stratifiedTopN]] shuffles (one window per stratum).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the id column. */
  def hashBucket(idCol: Column, buckets: Int): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Named split from per-mille weights, e.g.
    * `Seq("train" -> 800, "val" -> 100, "test" -> 100)`. Weights must sum
    * to 1000; assignment is by consecutive bucket ranges of a 1000-way
    * [[hashBucket]], so enlarging a tail split later keeps every
    * previously-assigned row in its old split (the standard stable-split
    * contract). */
  def split(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 1000,
      s"split weights must sum to 1000 per-mille, got $weights")
    val b = hashBucket(col(idCol), 1000)
    val bounds = weights.scanLeft(0)(_ + _._2).tail
    // when-chain resolves the first matching range, innermost = last split
    val chained = weights.zip(bounds).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, ((name, _), hi)) =>
        when(b < hi, name).otherwise(acc)
      }
    df.withColumn("split", chained)
  }

  /** Deterministic n-per-stratum sample: rank rows inside each stratum
    * by (hash, id) and keep the first n. Equivalent to a uniform random
    * sample per stratum, but reproducible and engine-portable.
    *
    * One shuffle on the stratum key; rank is a window per stratum, so a
    * hot stratum costs one sorted reducer (spill-safe). For heavily
    * skewed strata at extreme scale, pre-filter with
    * `hashBucket(id, k) == 0` to cut the sorted volume by k before
    * ranking — the filter is sargable and composes with this. */
  def stratifiedTopN(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Mixture sampling — the data-mixing dial: take the first `n_s` rows
    * of each stratum by deterministic (hash, id) rank, with per-stratum
    * targets; strata absent from `targets` are dropped. Same machinery
    * as [[stratifiedTopN]] but with a per-stratum quota, which is how
    * source re-weighting is actually expressed in a training-data
    * pipeline ("200B tokens web, 40B code, 10B reference"). The quota
    * lookup is a when-chain literal (targets are few) — no extra join. */
  def mixtureSample(df: DataFrame, stratumCol: String, idCol: String,
      targets: Seq[(String, Int)]): DataFrame = {
    require(targets.nonEmpty, "at least one stratum target")
    val quota = targets.foldLeft(lit(null).cast("int")) {
      case (acc, (s, n)) => when(col(stratumCol) === s, lit(n)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), 1000000), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota) // null quota ⇒ stratum dropped
  }

  /** Greedy token-budget packing (training-batch construction): within
    * each group, rows in `orderCol` order fill bins of capacity
    * `budget`; a row that would overflow the current bin starts the next
    * one (a single over-budget row gets a bin of its own). Returns
    * (group, order, size, bin) with 0-based bins per group.
    *
    * Bin assignment is path-dependent (each decision depends on the
    * running fill), which no window function expresses — this is the
    * rare operator that is legitimately imperative. The shape keeps it
    * scalable anyway: one shuffle on the group key, an EXTERNAL sort
    * (spills, any group size), then a single streaming pass per
    * partition — no group is ever buffered in memory. Groups are the
    * parallelism unit: at corpus scale, pre-shard giant groups (e.g.
    * `hashBucket(id, shards)` as part of the group key) — packing is
    * per-shard-local anyway in a distributed trainer. */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("__g"),
        col(orderCol).cast("long").as("__o"),
        col(sizeCol).cast("long").as("__s"))
      .repartition(col("__g"))
      .sortWithinPartitions(col("__g"), col("__o"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var g: String = null
        var fill = 0L
        var bin = 0L
        it.map { case (gg, o, s) =>
          if (gg != g) { g = gg; fill = 0L; bin = 0L }
          if (fill > 0 && fill + s <= budget) fill += s
          else {
            if (fill > 0) bin += 1
            fill = s
          }
          (gg, o, s, bin)
        }
      }
      .toDF(groupCol, orderCol, sizeCol, "bin")
  }

  /** Deterministic training-order shuffle: a reproducible pseudo-random
    * permutation via md5(seed:id) — the global sort that fixes example
    * order before sharding a training set. md5 (not xxhash64) for the
    * same reason as [[split]]: every mainstream engine computes the
    * identical digest, so the permutation is portable and oracle-
    * checkable. Changing `seed` re-deals the whole order.
    *
    * `train_pos` (0-based position in the new order) comes from
    * [[graft.gen.TableCalcs.rowNumberBy]]'s distributed global ordinal —
    * range-partitioned local row numbers plus broadcast prefix offsets,
    * never a single-partition window; the sort is Spark's TeraSort
    * shape, fine at any corpus size. */
  def deterministicShuffle(df: DataFrame, idCol: String,
      seed: String): DataFrame = {
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    graft.gen.TableCalcs.rowNumberBy(
        df.withColumn("__sk", key), Seq("__sk", idCol), "train_pos")
      .withColumn("train_pos", (col("train_pos") - 1).cast("long"))
      .drop("__sk")
  }

  /** Leakage-safe split: like [[split]], but all copies of the same
    * text are co-assigned to one split. A per-document hash split puts
    * two copies of a duplicated document in train AND test with high
    * probability (the classic eval-inflation bug); here the split key
    * is the duplicate GROUP's id (min doc id over identical text), so
    * a group lands wholly in one split. Output adds `group_id`.
    *
    * One shuffle keyed on xxhash64(text) (8-byte key, not document
    * bytes) to label groups via a window min; the split itself stays a
    * pure function of md5(group_id) — engine-portable, and stable
    * under weight changes like [[split]]. For NEAR-duplicate safety,
    * feed [[Dedup.duplicateClusters]] labels in as the id column of a
    * plain [[split]] instead — same co-assignment mechanics, cluster-
    * grade grouping. */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Int)]): DataFrame = {
    val grp = Window.partitionBy(col("__gh"))
    val g = df.withColumn("__gh", xxhash64(col(textCol)))
      .withColumn("group_id", min(col(idCol)).over(grp))
      .drop("__gh")
    split(g, "group_id", weights)
  }

  /** Token-budget mixture sampling: per stratum, keep a deterministic
    * uniform sample of documents until the stratum's TOKEN budget is
    * reached — the data-mixing dial when recipes are written in tokens
    * per source ("50B web, 10B code, 5B books"), not document counts
    * ([[mixtureSample]]'s unit). Documents are ranked inside each
    * stratum by (md5, id) — an unbiased draw, reproducible anywhere —
    * and kept while the tokens BEFORE them are under budget, so the
    * budget is always reached (one overshoot doc) rather than
    * undershot. Strata without a budget are dropped.
    *
    * One shuffle on the stratum key; the per-stratum running sum is a
    * window per stratum (hot strata: one sorted spill-safe reducer —
    * same contract as [[stratifiedTopN]], same `hashBucket` pre-filter
    * escape hatch). */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
      tokensCol: String, budgets: Seq[(String, Long)]): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample needs at least one budget")
    val key = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col(stratumCol)).orderBy(key, col(idCol))
    val budget = budgets.tail.foldLeft(
        when(col(stratumCol) === budgets.head._1, budgets.head._2)) {
      case (acc, (s, b)) => acc.when(col(stratumCol) === s, b)
    }
    df.withColumn("__budget", budget)
      .filter(col("__budget").isNotNull)
      .withColumn("__cum", sum(col(tokensCol).cast("long")).over(w))
      .filter(col("__cum") - col(tokensCol) < col("__budget"))
      .withColumn("stratum_tokens", col("__cum"))
      .drop("__budget", "__cum")
  }

  /** Deterministic sharded training-data export: every row is assigned
    * a shard by a seed-keyed md5 of its id and written under
    * `data/__shard=<i>/`, plus a `manifest/` table of per-shard row
    * counts and id checksums — the artifact a downstream loader uses to
    * verify it received every shard intact (count alone misses a
    * swapped row; the order-independent id checksum does not).
    *
    * Everything is a pure function of (seed, id): re-exporting the same
    * corpus reproduces byte-identical shard membership on any cluster
    * layout, and the manifest is engine-portable (md5, not xxhash64) so
    * an external system can recompute it. One shuffle (the shard
    * repartition that also becomes the write layout); the manifest
    * groupBy reuses the same key. Rows within a shard file are ordered
    * by id — deterministic file content, and the natural layout for a
    * loader that wants its own [[deterministicShuffle]] downstream. */
  def exportShards(df: DataFrame, idCol: String, path: String,
      nShards: Int, seed: String): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = conv(substring(
      md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val withShard = df.withColumn("__shard",
      pmod(key, lit(nShards.toLong)).cast("int"))
    withShard
      // explicit count: tasks own whole shard dirs (parallel writers,
      // one file per shard) and AQE can't re-coalesce the tiny shuffle
      // into one task that serializes the per-dir writer churn
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col(idCol))
      .write.mode("overwrite").partitionBy("__shard")
      .parquet(s"$path/data")
    val idsum = conv(substring(
      md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    val manifest = withShard
      .groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(idsum).as("id_checksum"))
    manifest.write.mode("overwrite").parquet(s"$path/manifest")
    // hand back the PERSISTED manifest — the receipt a loader will
    // actually read — rather than a plan that re-scans the corpus
    spark(df).read.parquet(s"$path/manifest")
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row draws a uniform u and keeps key = u^(1/w); the n largest
    * keys are exactly a weighted sample without replacement. Rows with
    * non-positive weight never qualify (their key is null → filtered).
    *
    * u is derived from the md5 of the row id — not a `rand()` — so the
    * sample is a pure function of (id, weight): reproducible across
    * runs, partition layouts, and engines (the oracle twin computes the
    * identical keys in SQL). The n-largest selection is
    * `orderBy(key desc, id).limit(n)` — TakeOrderedAndProject, so a
    * per-partition top-n heap and n rows to the driver, never a global
    * sort; the final `sample_rank` window runs over exactly n rows.
    * Weights change ⇒ keys change only through the exponent, so a row's
    * u is stable and weight tweaks re-rank rather than re-deal. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    // u in (0, 1): first 8 md5 hex digits as a 32-bit uniform, +0.5 to
    // dodge the exact-zero draw (pow(0, x) would always win/lose)
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
    val w = col(weightCol).cast("double")
    val key = when(w > 0, pow(u, lit(1.0) / w))
    val rw = Window.orderBy(col("__wk").desc, col(idCol))
    df.withColumn("__wk", key)
      .filter(col("__wk").isNotNull)
      .orderBy(col("__wk").desc, col(idCol))
      .limit(n)
      .withColumn("sample_rank", row_number().over(rw))
      .drop("__wk")
  }

  /** Concat-and-split sequence index — the standard LLM-pretraining
    * packing where documents are concatenated in a fixed order and the
    * token stream is cut into `seqLen`-token training sequences. For
    * each document: its absolute `start_offset` in the stream and the
    * `first_seq`/`last_seq` ids it lands in (a doc spanning a cut
    * contributes to both neighbors — `last_seq > first_seq` is the
    * boundary-crossing signal a loader needs for attention masking).
    *
    * The offsets are one global cumulative sum over (id order), computed
    * with [[graft.gen.TableCalcs.runningTotal]]'s distributed plan:
    * range-partition by id, local running sums, broadcast per-partition
    * prefix offsets — never a single-partition window, so the index
    * builds at any corpus size. Zero-token documents are dropped (they
    * occupy no stream positions; keeping them would emit an inverted
    * `last_seq < first_seq` range). */
  def sequenceIndex(df: DataFrame, idCol: String, nTokensCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = df.select(col(idCol),
        col(nTokensCol).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    graft.gen.TableCalcs.runningTotal(base, "n_tokens", Seq(idCol), "__cum")
      .withColumn("start_offset", col("__cum") - col("n_tokens"))
      .withColumn("first_seq", floor(col("start_offset") / seqLen))
      .withColumn("last_seq", floor((col("__cum") - 1) / seqLen))
      .drop("__cum")
  }

  /** Split-balance audit: the check you run AFTER [[split]] (or
    * [[leakageSafeSplit]]) — per (split, stratum), the stratum's share
    * WITHIN the split against its share of the whole corpus. A hash
    * split is distribution-free in expectation, but a correlated id
    * space (ids assigned by crawl source), a skewed stratum, or a buggy
    * bucket function all show up here as deltas — and a model trained
    * on a language-skewed train split evaluates on a val split that no
    * longer measures the same distribution. Two aggregations (per-cell
    * and per-stratum) joined on broadcast-sized frames (splits ×
    * strata rows); corpus cost is the histogram shuffle.
    *
    * Returns (split, stratum, n, share_in_split, share_overall, delta
    * rounded to `decimals`), every (split, stratum) pair present with
    * zero counts so a stratum MISSING from a split is a visible row,
    * not an absent one. */
  def splitBalance(df: DataFrame, splitCol: String, stratumCol: String,
      decimals: Int = 6): DataFrame = {
    val cells = df.groupBy(col(splitCol).as("split"),
        col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n"))
    val splits = cells.groupBy(col("split")).agg(sum(col("n")).as("__ns"))
    val strata = cells.groupBy(col("stratum")).agg(sum(col("n")).as("__nt"))
    val total = cells.agg(sum(col("n")).as("__tot"))
    val scaffold = splits.select(col("split"))
      .crossJoin(strata.select(col("stratum")))
    scaffold
      .join(cells, Seq("split", "stratum"), "left")
      .join(broadcast(splits), Seq("split"))
      .join(broadcast(strata), Seq("stratum"))
      .crossJoin(broadcast(total))
      .select(col("split"), col("stratum"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)) / col("__ns"), decimals)
          .as("share_in_split"),
        round(col("__nt") / col("__tot"), decimals).as("share_overall"),
        round(coalesce(col("n"), lit(0L)) / col("__ns")
          - col("__nt") / col("__tot"), decimals).as("delta"))
  }

  /** Curriculum ordering for pretraining: rank the corpus by a
    * difficulty/quality score, cut it into `nBuckets` equal-count bins
    * (easy → hard), deterministically shuffle WITHIN each bin
    * (md5-keyed, engine-portable like [[deterministicShuffle]]), and
    * emit the global feed position — the order a curriculum data
    * loader consumes. Bin membership uses the replayable formula
    * `bucket = min(floor(rank · nBuckets / n), nBuckets − 1)` over the
    * 0-based score rank (ties broken by id), not `ntile`, so any
    * engine reproduces the same cut.
    *
    * Both global orderings are [[graft.gen.TableCalcs.rowNumberBy]]'s
    * distributed plan (range partition + broadcast prefix offsets —
    * never a single-partition window); the corpus row count rides a
    * broadcast one-row aggregate, no driver collect. Returns
    * (id, score rank, bucket, position). */
  def curriculum(df: DataFrame, idCol: String, scoreCol: String,
      nBuckets: Int, seed: String): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val base = df.select(col(idCol), col(scoreCol).cast("double").as("__s"))
    val ranked = graft.gen.TableCalcs.rowNumberBy(
        base, Seq("__s", idCol), "score_rank")
      .withColumn("score_rank", (col("score_rank") - 1).cast("long"))
    val n = base.agg(count(lit(1)).as("__n"))
    val bucketed = ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        least(floor(col("score_rank") * nBuckets / col("__n")),
          lit(nBuckets - 1L)).cast("long"))
      .drop("__n", "__s")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    graft.gen.TableCalcs.rowNumberBy(
        bucketed.withColumn("__ck", key),
        Seq("bucket", "__ck", idCol), "position")
      .withColumn("position", (col("position") - 1).cast("long"))
      .drop("__ck")
  }
}
