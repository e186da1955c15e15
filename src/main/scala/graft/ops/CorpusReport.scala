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
}
