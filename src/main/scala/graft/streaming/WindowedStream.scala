package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Watermarked event-time windowed aggregation — the canonical
  * Structured Streaming rollup (`readStream → withWatermark →
  * groupBy(window(ts), dims) → agg`, Append mode). Complements the two
  * other streaming routes in this engine:
  *
  *   - [[StreamingRollup]] — file-granular foreachBatch merge into a
  *     pre-agg store (readers re-aggregate, so windows never finalize);
  *   - [[graft.ops.Sessionize.streamingSessions]] — data-dependent
  *     (gap-closed) windows via custom state.
  *
  * This path is for CLOCK-ALIGNED windows, where the built-in watermark
  * machinery already does everything: state is bounded to windows newer
  * than the watermark, each window is emitted exactly once when it
  * finalizes, and late rows inside the allowed delay revise their
  * window in state (not downstream). Nothing here needs custom state —
  * per the engine's rule, the declarative form wins.
  *
  * At scale: state size = open windows × dim cardinality, independent of
  * stream length; the aggregation is a normal partial/final HashAggregate
  * pair, so map-side combine happens before the shuffle.
  */
object WindowedStream {

  /** Tumbling event-time rollup. `aggs` are named aggregate expressions
    * (additive ones make the result mergeable downstream). Emits
    * `window_start`, `window_end`, the dims, and the aggregates; in a
    * streaming query with Append mode each row is a FINALIZED window. */
  def tumbling(events: DataFrame, tsCol: String, windowDur: String,
      delay: String, dims: Seq[String],
      aggs: Seq[(String, Column)]): DataFrame =
    windowAgg(events.withWatermark(tsCol, delay), tsCol, windowDur, dims,
      aggs)

  /** Tumbling rollup over an at-least-once source: duplicate event ids
    * inside the watermark horizon are dropped before aggregation
    * (`dropDuplicatesWithinWatermark` — dedup state expires with the
    * watermark instead of growing forever, which is what makes streaming
    * dedup admissible at all). Exactly-once counts from a replaying
    * source, with state bounded by (delay window × event rate). The
    * watermark is set ONCE, upstream of both stateful operators —
    * redefining it between them is disallowed. */
  def dedupedTumbling(events: DataFrame, idCol: String, tsCol: String,
      windowDur: String, delay: String, dims: Seq[String],
      aggs: Seq[(String, Column)]): DataFrame =
    windowAgg(
      events.withWatermark(tsCol, delay)
        .dropDuplicatesWithinWatermark(idCol),
      tsCol, windowDur, dims, aggs)

  private def windowAgg(watermarked: DataFrame, tsCol: String,
      windowDur: String, dims: Seq[String],
      aggs: Seq[(String, Column)]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate")
    val aggCols = aggs.map { case (n, c) => c.as(n) }
    watermarked
      .groupBy(window(col(tsCol), windowDur) +: dims.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .select(Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ dims.map(col) ++
        aggs.map { case (n, _) => col(n) }: _*)
  }
}
