package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** One-row corpus health summary — the triage report a pipeline runs
  * before committing a crawl slice to training: volume, exact-dup
  * pressure, token mass, language mix, PII surface.
  *
  * Everything lands in ONE full-corpus aggregation pass (per-doc
  * features are projections feeding partial aggs) plus one Zipf-small
  * language rollup for the modal language (TakeOrderedAndProject, then
  * a 1-row broadcast). Distinct-text counting hashes first —
  * `count(DISTINCT xxhash64(text))` shuffles 8-byte rows where
  * `count(DISTINCT text)` would shuffle whole documents; at 100 TB that
  * is the difference between a report and an outage. */
object CorpusReport {

  def summarize(df: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val feats = df.select(col(idCol).as("__id"), col(textCol).as("__t"),
        col(langCol).as("__lang"))
      .withColumn("__toks", TextAnalysis.wsTokenCount(col("__t")))
      .withColumn("__pii",
        (TextAnalysis.emailCount(col("__t"))
          + TextAnalysis.urlCount(col("__t"))) > 0)
    val global = feats.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(xxhash64(col("__t"))).as("n_distinct_texts"),
      sum(col("__toks")).as("total_ws_tokens"),
      round(avg(length(col("__t"))), 4).as("avg_chars"),
      countDistinct(col("__lang")).as("n_langs"),
      sum(when(col("__pii"), 1L).otherwise(0L)).as("n_pii_docs"))
    val top = feats.groupBy(col("__lang")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__lang")).limit(1)
      .select(col("__lang").as("top_lang"), col("__c").as("top_lang_docs"))
    // left join (not crossJoin): an empty corpus still reports its
    // n_docs=0 row, with null modal language, instead of zero rows
    global.join(broadcast(top), lit(true), "left")
      .withColumn("exact_dup_ratio",
        round(lit(1.0)
          - col("n_distinct_texts").cast("double") / col("n_docs"), 6))
  }

  /** Staged filter-funnel audit: how many documents enter, fail, and
    * survive each curation stage, applied in order (a doc dropped at
    * stage i is never counted against stage i+1 — the funnel a pipeline
    * publishes, not independent filter rates). The publishable answer
    * to "where did 60% of the crawl go?".
    *
    * ONE corpus pass: the cumulative pass/fail flags are projections,
    * the per-stage totals are a single aggregate row, and the per-stage
    * output rows explode from that one row — no per-stage scan, no
    * shuffle of the corpus at any stage count. Cost at 100 TB: exactly
    * one scan, regardless of how many stages the funnel has. */
  def filterFunnel(df: DataFrame,
      stages: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(stages.nonEmpty, "filterFunnel needs at least one stage")
    val flagged = stages.zipWithIndex.foldLeft(
        df.withColumn("__p0", lit(true))) { case (acc, ((_, pred), i)) =>
      acc.withColumn(s"__p${i + 1}",
        col(s"__p$i") && coalesce(pred, lit(false)))
    }
    val agg = flagged.agg(
      sum(when(col("__p0"), 1L).otherwise(0L)).as("__s0"),
      stages.indices.map(i =>
        sum(when(col(s"__p${i + 1}"), 1L).otherwise(0L)).as(s"__s${i + 1}")): _*)
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        col(s"__s$i").as("n_in"),
        (col(s"__s$i") - col(s"__s${i + 1}")).as("n_dropped"),
        col(s"__s${i + 1}").as("n_out"))
    }
    agg.select(explode(array(rows: _*)).as("f")).select(col("f.*"))
  }
}
