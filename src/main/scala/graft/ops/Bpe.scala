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
  * Words are held as separator-joined symbol strings (U+0001 between
  * symbols), so applying a merge is one literal `replace` of
  * "a SEP b" with "ab" — string replace scans left-to-right without
  * overlap, which IS the BPE merge rule ("aaa" + (a,a) → "(aa)a").
  * Everything stays codegen'd (no higher-order-function lambdas in the
  * loop).
  */
object Bpe {

  private[ops] val Sep = "\u0001"

  private def tokens(textCol: Column): Column =
    split(lower(textCol), "\\s+")

  /** (word, cnt, sym) frame: distinct lowercase whitespace words with
    * corpus counts; `sym` is the word as separator-joined characters.
    * Words containing the separator (never in real text) are dropped
    * rather than corrupting the symbol encoding. */
  private[ops] def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(filter(tokens(col(textCol)), t => length(t) > 0))
        .as("word"))
      .filter(!col("word").contains(Sep))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("sym",
        rtrim(regexp_replace(col("word"), "(.)", "$1" + Sep), Sep))

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
          regexp_replace(col("sym"),
            java.util.regex.Pattern.quote(l + Sep + r),
            java.util.regex.Matcher.quoteReplacement(l + r)))
        if (rank % 4 == 0) words = words.localCheckpoint(true)
        rank += 1
      }
    }
    learned.toSeq.toDF("merge_rank", "left", "right", "pair_count")
  }

  /** Weighted adjacent-pair counts over the current symbol table: one
    * partial-agg shuffle keyed on the (uniform) pair. The empty-array
    * guard matters — `sequence(1, 0)` would count DESCENDING, not
    * empty, on single-symbol words. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .withColumn("__arr", split(col("sym"), Sep))
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
    val sym0 = rtrim(regexp_replace(col("__w"), "(.)", "$1" + Sep), Sep)
    val merged = merges.foldLeft(sym0) { case (acc, (l, r)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(l + Sep + r),
        java.util.regex.Matcher.quoteReplacement(l + r))
    }
    df.select(col(idCol),
        explode(filter(tokens(col(textCol)), t => length(t) > 0)).as("__w"))
      .filter(!col("__w").contains(Sep))
      .withColumn("__k", size(split(merged, Sep)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__k")).as("n_bpe_tokens"))
  }
}
