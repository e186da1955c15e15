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

  /** Learn the top `numMerges` BPE merges. Returns (merge_rank, left,
    * right, pair_count) with merge_rank 1-based in learn order.
    *
    * Each iteration: adjacent symbol pairs of every distinct word,
    * weighted by word count, one partial-agg shuffle, `limit 1` argmax
    * (ties break on the pair string so the learned vocabulary is
    * deterministic), then a literal replace bakes the merge into the
    * symbol column for the next round. The word table is checkpointed
    * every few rounds to keep the nested-replace plan shallow. */
  def learnMerges(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = wordTable(df, textCol).localCheckpoint(true)
    val spark = df.sparkSession
    import spark.implicits._
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
        if (rank % 4 == 0) words = words.localCheckpoint(true)
        rank += 1
      }
    }
    learned.toSeq.toDF("merge_rank", "left", "right", "pair_count")
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
