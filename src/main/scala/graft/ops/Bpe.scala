package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed byte-pair-encoding merge learning — the vocabulary-
  * induction step of training-corpus tokenizer construction.
  *
  * The scale trick is classic BPE's own: training never touches the
  * corpus again after one pass. The corpus collapses into a (distinct
  * word, count) table — Zipf says that table is tiny relative to any
  * corpus (a 100 TB crawl has billions of rows but a 10^7-ish word-type
  * vocabulary) — and every merge iteration runs one weighted pair
  * aggregate over it. Only the single argmax pair row reaches the
  * driver per iteration; words/symbols never do.
  *
  * Words are held as separator-WRAPPED symbol strings (U+0001 around
  * every symbol, including the ends: "low" → ␁l␁o␁w␁), so applying a
  * merge (l, r) is one regex replace of `(?<=␁)l␁r(?=␁)` with `lr` —
  * the lookarounds anchor both symbols to their boundaries (a bare
  * literal replace would merge across symbols whose text merely ends
  * with `l` or starts with `r`, e.g. pair (e,r) corrupting
  * [the,r,e] → [ther,e]), and leaving the boundary separators
  * unconsumed lets consecutive disjoint occurrences all merge in one
  * pass ("abab" + (a,b) → [ab,ab]) while overlaps still resolve
  * left-to-right, which IS the BPE merge rule ("aaa" + (a,a) → [aa,a]).
  */
object Bpe {

  private[ops] val Sep = "\u0001"

  private def tokens(textCol: Column): Column =
    split(lower(textCol), "\\s+")

  /** (word, cnt, sym) frame: distinct lowercase whitespace words with
    * corpus counts; `sym` is the word as separator-wrapped characters
    * (leading + trailing separator too — the merge lookarounds need a
    * boundary on every side). Words containing the separator (never in
    * real text) are dropped rather than corrupting the encoding. */
  private[ops] def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(tokens(col(textCol)), t => length(t) > 0))
        .as("word"))
      .filter(!col("word").contains(Sep))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        concat(lit(Sep), regexp_replace(col("word"), "(.)", "$1" + Sep)))

  /** Per-run accounting for the frequency-floor trim (web-scale word
    * tables): `trimmedPairMass` is T = Σ cnt·(symbols−1) over the
    * dropped words — an upper bound on how much ANY pair's count can be
    * under-reported, at any point of the merge loop (merging only
    * shrinks a word's pair count, so the initial mass bounds every later
    * state too). `minArgmaxGap` is the smallest winner-vs-runner-up
    * margin the driver loop observed; when `minArgmaxGap > T` (and the
    * trimmed table sustained all requested merges) the learned sequence
    * is PROVABLY the full-table sequence: trimming only removes mass, so
    * each winner's true count is ≥ its trimmed count while every rival's
    * true count is ≤ trimmed + T — a gap > T at every step means no
    * argmax (or tie-break) can flip. `proven` records that check. */
  private[graft] final case class TrimInfo(keptWords: Long,
      trimmedWords: Long, trimmedPairMass: Long, minArgmaxGap: Long,
      proven: Boolean)

  /** Learn the top `numMerges` BPE merges. Returns (merge_rank, left,
    * right, pair_count) with merge_rank 1-based in learn order.
    *
    * HYBRID execution (the classic BPE trainer split): the corpus is
    * touched exactly once — one distributed pass collapses it into the
    * (distinct word, count) table, which Zipf keeps tiny relative to
    * any corpus (a 100 TB crawl has billions of rows but a ~10^7 word-
    * type vocabulary). If that table's estimated heap footprint fits
    * `maxDriverBytes`, the merge loop itself runs DRIVER-SIDE with
    * incremental pair-count maintenance (only words containing the
    * merged pair are rescanned; argmax via a lazy-deletion heap) — a
    * real 32k-merge vocabulary is seconds of CPU instead of 32k
    * sequential Spark jobs, each paying the cluster scheduling floor
    * regardless of cluster size.
    *
    * When the full table exceeds the budget (a web crawl's 10^7+ word
    * types), a FREQUENCY-FLOOR TRIM keeps the driver path engaged: one
    * histogram aggregate groups the table by corpus count, the driver
    * picks the largest count-descending prefix of buckets whose
    * estimated footprint fits, and the merge loop runs on that head.
    * The trim is a documented bounded approximation with a runtime
    * proof obligation (see [[TrimInfo]]): every pair count is exact-or-
    * under-reported by at most T = the dropped words' total pair mass,
    * and whenever every argmax wins by MORE than T the sequence is
    * provably identical to the untrimmed one (Zipf head counts dwarf
    * hapax mass, so real corpora usually prove). Only when not even the
    * hottest count bucket fits (no natural language gets there) does
    * the loop fall back to one distributed weighted pair aggregate per
    * merge, checkpointed every few rounds to keep the nested-replace
    * plan shallow.
    *
    * All paths learn the same merge sequence over the table they see:
    * same weighted counts, same argmax tie-break (pair_count desc, then
    * left/right ascending in UTF-8 byte order — the driver comparator
    * matches Spark's binary string ordering), and the driver's in-place
    * merge reproduces the regex form's left-to-right overlap rule
    * ("aaa" + (a,a) → [aa, a]); spec-pinned by forced-path parity
    * tests (exact fallback and proven-trim). */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int,
      maxDriverBytes: Long = 256L << 20): DataFrame =
    learnMergesInfo(df, textCol, numMerges, maxDriverBytes)._1

  private[graft] def learnMergesInfo(df: DataFrame, textCol: String,
      numMerges: Int, maxDriverBytes: Long): (DataFrame, Option[TrimInfo]) = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = wordTable(df, textCol).localCheckpoint(true)
    val spark = df.sparkSession
    import spark.implicits._
    // one cheap profile over the checkpointed table decides the path:
    // ~96 bytes/symbol + ~96/word covers String/array/index overhead
    val prof = words.agg(count(lit(1)).as("n"),
      coalesce(sum(length(col("sym"))), lit(0L)).as("symchars")).head()
    val (nWords, symChars) = (prof.getLong(0), prof.getLong(1))
    def est(n: Long, chars: Long): Long = (chars / 2) * 96L + n * 96L
    if (nWords > 0 && est(nWords, symChars) <= maxDriverBytes)
      return (learnMergesDriver(words, numMerges)._1
        .toDF("merge_rank", "left", "right", "pair_count"), None)

    if (nWords > 0 && maxDriverBytes > 0) {
      // frequency-floor trim: bucket the table by corpus count (Zipf
      // keeps distinct counts ~√mass — collectable), walk buckets in
      // descending count accumulating the footprint estimate, keep the
      // prefix that fits. Whole buckets only: the floor is a pure
      // function of the histogram, so the trim is deterministic.
      val hist = words.groupBy(col("cnt"))
        .agg(count(lit(1)).as("n"), sum(length(col("sym"))).as("chars"),
          // pairs per word = symbols − 1; wrapped sym has 2k+1 chars
          sum(((length(col("sym")) - 3) / 2).cast("long")).as("pairsyms"))
        .orderBy(col("cnt").desc).collect()
      var acc = 0L
      var floor = -1L
      hist.foreach { r =>
        if (floor < 0) {
          val next = acc + est(r.getLong(1), r.getLong(2))
          if (next <= maxDriverBytes) acc = next else floor = r.getLong(0)
        }
      }
      if (floor != hist.headOption.map(_.getLong(0)).getOrElse(-1L)) {
        // at least the hottest bucket fits; T = dropped pair mass
        val trimmedMass = hist.filter(_.getLong(0) <= floor)
          .map(r => r.getLong(0) * r.getLong(3)).sum
        val trimmedWords = hist.filter(_.getLong(0) <= floor)
          .map(_.getLong(1)).sum
        val kept = words.filter(col("cnt") > floor)
        val (learned, minGap) = learnMergesDriver(kept, numMerges)
        val proven = learned.size == numMerges && minGap > trimmedMass
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          s"BPE frequency-floor trim: kept ${nWords - trimmedWords} of " +
            s"$nWords words (floor cnt > $floor), trimmed pair mass " +
            s"$trimmedMass, min argmax gap $minGap, " +
            (if (proven) "sequence PROVEN identical to untrimmed"
             else "sequence within the documented count bound, not proven"))
        return (learned
          .toDF("merge_rank", "left", "right", "pair_count"),
          Some(TrimInfo(nWords - trimmedWords, trimmedWords, trimmedMass,
            minGap, proven)))
      }
    }

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getAs[String]("left"),
          top(0).getAs[String]("right"), top(0).getAs[Long]("pair_count"))
        learned += ((rank, l, r, c))
        words = words.withColumn("sym",
          regexp_replace(col("sym"), mergePattern(l, r),
            java.util.regex.Matcher.quoteReplacement(l + r)))
        // lazy: the next rank's pairCounts argmax is the first consumer
        // and materializes the checkpoint inside its own job — eager
        // paid a separate barrier job per truncation
        if (rank % 4 == 0) words = words.localCheckpoint(false)
        rank += 1
      }
    }
    (learned.toSeq.toDF("merge_rank", "left", "right", "pair_count"), None)
  }

  /** Spark's string sort is binary UTF-8; match it exactly so both
    * learn paths break count ties identically. */
  private def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Driver-side merge loop over a collected word table: incremental
    * pair counts (a merge rescans ONLY the words that contain its pair)
    * with a lazy-deletion max-heap for the argmax. A merged-away pair
    * can legitimately reappear later (a subsequent merge can create its
    * left symbol adjacent to its right); stale heap entries are skipped
    * by re-checking the live count at poll time.
    *
    * Also returns the minimum winner-vs-runner-up margin across all
    * argmax steps (Long.MaxValue when no step had a rival) — the trim
    * path's proof obligation. The runner-up probe pops stale entries
    * (and the winner's own duplicates) off the heap until it sees a
    * live DIFFERENT pair, then pushes that one entry back: amortized
    * O(log) against the same lazy-deletion budget the poll loop pays. */
  private def learnMergesDriver(words: DataFrame,
      numMerges: Int): (Seq[(Int, String, String, Long)], Long) = {
    val rows = words.select(col("sym"), col("cnt")).collect()
    val syms: Array[Array[String]] =
      rows.map(_.getString(0).split(Sep).filter(_.nonEmpty))
    val cnts: Array[Long] = rows.map(_.getLong(1))

    val counts = new java.util.HashMap[(String, String), Long]
    val index = new java.util.HashMap[(String, String), java.util.HashSet[Int]]
    val touched = new java.util.HashSet[(String, String)]
    def bump(p: (String, String), by: Long, w: Int): Unit = {
      val nc = counts.getOrDefault(p, 0L) + by
      if (nc == 0L) counts.remove(p) else counts.put(p, nc)
      if (by > 0)
        index.computeIfAbsent(p, _ => new java.util.HashSet[Int]).add(w)
      touched.add(p)
    }
    def scan(w: Int, sign: Long): Unit = {
      val a = syms(w); var i = 0
      while (i < a.length - 1) {
        bump((a(i), a(i + 1)), sign * cnts(w), w); i += 1
      }
    }
    syms.indices.foreach(scan(_, 1L))

    // max-heap: count desc, then (left, right) ascending in UTF-8 order
    val pq = new java.util.PriorityQueue[(Long, String, String)](
      math.max(counts.size, 11),
      (x: (Long, String, String), y: (Long, String, String)) => {
        val c = java.lang.Long.compare(y._1, x._1)
        if (c != 0) c else {
          val lc = utf8Compare(x._2, y._2)
          if (lc != 0) lc else utf8Compare(x._3, y._3)
        }
      })
    counts.forEach((p, c) => pq.add((c, p._1, p._2)))
    touched.clear()

    def mergeWord(a: Array[String], l: String, r: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < a.length) {
        if (i < a.length - 1 && a(i) == l && a(i + 1) == r) {
          out += (l + r); i += 2 // left-to-right: the merged token does
                                  // not re-pair with what it consumed
        } else { out += a(i); i += 1 }
      }
      out.toArray
    }

    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var minGap = Long.MaxValue
    var rank = 1
    while (rank <= numMerges && !pq.isEmpty) {
      val (c, l, r) = pq.poll()
      val live = counts.getOrDefault((l, r), 0L)
      if (live != c) {
        // stale entry — the pair's count changed since this was pushed;
        // its refreshed entry (if any) is already in the heap
      } else {
        // runner-up margin: next live entry for a pair other than the
        // winner (stale entries and winner duplicates are discarded —
        // every live pair still has a fresh entry in the heap)
        var runnerUp = 0L
        var probing = true
        while (probing && !pq.isEmpty) {
          val e = pq.poll()
          val p = (e._2, e._3)
          if (p != (l, r) && counts.getOrDefault(p, 0L) == e._1) {
            runnerUp = e._1; pq.add(e); probing = false
          }
        }
        if (c - runnerUp < minGap) minGap = c - runnerUp
        learned += ((rank, l, r, c))
        val ws = index.get((l, r))
        if (ws != null) {
          val snapshot = ws.toArray(new Array[Integer](0))
          snapshot.foreach { wi =>
            val w = wi.intValue
            val a = syms(w)
            var has = false; var i = 0
            while (!has && i < a.length - 1) {
              has = a(i) == l && a(i + 1) == r; i += 1
            }
            if (has) { // stale index entries (word changed) are skipped
              scan(w, -1L)
              syms(w) = mergeWord(a, l, r)
              scan(w, 1L)
            }
          }
        }
        index.remove((l, r))
        // re-push every pair whose count moved; stale heap entries are
        // filtered at poll time
        touched.forEach { p =>
          val nc = counts.getOrDefault(p, 0L)
          if (nc > 0L) pq.add((nc, p._1, p._2))
        }
        touched.clear()
        rank += 1
      }
    }
    (learned.toSeq, minGap)
  }

  /** Boundary-anchored merge pattern: both symbols must sit exactly
    * between separators (the lookarounds leave the boundary separators
    * unconsumed so consecutive disjoint occurrences all merge in one
    * left-to-right pass). */
  private def mergePattern(l: String, r: String): String =
    "(?<=" + Sep + ")" + java.util.regex.Pattern.quote(l) + Sep +
      java.util.regex.Pattern.quote(r) + "(?=" + Sep + ")"

  /** Weighted adjacent-pair counts over the current symbol table: one
    * partial-agg shuffle keyed on the (uniform) pair. The empty-array
    * guard matters — `sequence(1, 0)` would count DESCENDING, not
    * empty, on single-symbol words. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      // the wrapped encoding splits with empty strings at both ends
      .withColumn("__arr", expr(s"filter(split(sym, '$Sep'), x -> x != '')"))
      .withColumn("__pairs", expr(
        """CASE WHEN size(__arr) < 2 THEN array()
          |ELSE transform(sequence(1, size(__arr) - 1),
          |  i -> struct(element_at(__arr, i) AS left,
          |              element_at(__arr, i + 1) AS right))
          |END""".stripMargin.replace('\n', ' ')))
      .select(col("cnt"), explode(col("__pairs")).as("__p"))
      .select(col("cnt"), col("__p.left").as("left"),
        col("__p.right").as("right"))
      .groupBy(col("left"), col("right"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Apply an ordered merge list to new text: per-document BPE token
    * count (symbols remaining after all merges). The merge chain is a
    * driver-known constant, so it compiles to `numMerges` nested
    * literal replaces — pure codegen'd projection, no shuffle beyond
    * the word explode + per-doc count. */
  def encodeTokenCount(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val sym0 = concat(lit(Sep), regexp_replace(col("__w"), "(.)", "$1" + Sep))
    val merged = merges.foldLeft(sym0) { case (acc, (l, r)) =>
      regexp_replace(acc, mergePattern(l, r),
        java.util.regex.Matcher.quoteReplacement(l + r))
    }
    df.select(col(idCol),
        explode(filter(tokens(col(textCol)), t => length(t) > 0)).as("__w"))
      .filter(!col("__w").contains(Sep))
      // wrapped encoding: split yields empties at both ends -> size - 2
      .withColumn("__k", size(split(merged, Sep)) - 2)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__k")).as("n_bpe_tokens"))
  }
}
