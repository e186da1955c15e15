package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Adaptive parallelism pins for the CPU-dense candidate-pair stages of
  * the text dedup family ([[Dedup.minHashLSH]], [[Dedup.simHashPairs]]).
  *
  * Why a pin exists at all: candidate-pair rows there are BYTE-small
  * (two longs) but CPU-dense downstream (per-pair array intersects /
  * hamming), so AQE's byte-based partition coalescing packs millions of
  * pairs into a handful of reducers and serializes the verify CPU
  * (measured 27 CPU·s in 6 tasks on a replica-dense corpus; pinning cut
  * the sf10 minhash battery 155 s → 86 s).
  *
  * Why the pin must be CONDITIONAL: each `repartition(n, keys)` is a
  * REPARTITION_BY_NUM exchange that AQE may not coalesce, so on a small
  * corpus the pinned stages pay ~fixed scheduling/codegen cost that
  * dwarfs the pair work they spread. A/B at sf0.1 on the identical
  * corpus (round 15): unpinned 0.90–1.46 s vs pinned 2.08–2.76 s per
  * query. The decision rides the optimizer's OWN size estimate for the
  * input plan — plan-time, no job — so below [[DefaultMinBytes]] the
  * operators keep their r13 shape (plain join-demanded exchanges, AQE
  * free to coalesce) and above it the pins engage.
  *
  * The EMBEDDING pair family ([[Similarity.cosineNearDupPairs]] /
  * `cosineVerify`) deliberately has no pin at all: its pair rows carry
  * the bucket-signature array and dim-wide vectors, so bytes track CPU
  * and AQE already sizes those stages correctly (sf10 A/B: pin-neutral
  * 65.3 vs 66.8 s; pinned cost 2–3x at sf0.1/sf1).
  */
private[graft] object PairPins {

  /** Input-plan size below which the pair stages cannot accumulate
    * enough CPU work to beat the pinned exchanges' fixed cost. 4 MiB of
    * source bytes is ~tens of thousands of documents — even a fully
    * replica-dense corpus that size generates bucket-capped pair CPU in
    * the low seconds, which AQE's shape handles fine. */
  val DefaultMinBytes: Long = 4L << 20

  /** The pin width when engaged: 2x the cluster's core count — scales
    * with the CLUSTER, not the data, which is right for CPU-dense
    * byte-small stages. Returns 0 (= no pin) when the optimizer's size
    * estimate for `df` is below `minBytes`. Plan-time only — this NEVER
    * runs a job, so the direct pair paths and the collapsed twins stay
    * zero-overhead; the routing wrappers use [[routePar]], which may
    * pay one small job to see what bytes cannot. */
  def pairPar(df: DataFrame, minBytes: Long): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(minBytes))
      2 * df.sparkSession.sparkContext.defaultParallelism
    else 0
  }

  /** The ROUTING gate for the collapse-routed pair-formers. Engages
    * like [[pairPar]] on the byte estimate — but a file source's
    * estimate is the COMPRESSED size, and compression ratio correlates
    * with duplication, the exact signal routing exists for: the zipfian
    * skew fixture packs 50k documents at ~17 copies each into a 3.8 MB
    * parquet, under the 4 MiB gate, which silently sent the whole
    * corpus down the direct path — 3.5x slower AND 400 pairs short (the
    * block cap's recall loss that routing avoids). So inside the byte
    * window [minBytes/1024, minBytes) ONE cheap aggregate over the
    * ≤minBytes source decides on the real signals:
    *   - rows ≥ minBytes/64 — the ≥64 content bytes/row break-even the
    *     byte gate already assumes (CPU-dense regardless of dups), or
    *   - rows ≥ minBytes/256 AND ≥4 copies per distinct content — the
    *     dup density at which the family collapse beats the direct
    *     pass.
    * Above the window bytes decide alone — the 100 TB path never pays a
    * gate job; below it no plausible density reaches either gate; gates
    * above 1 TiB mean "never engage" and skip the job too. The wrappers
    * call this ONCE and thread the decision into their direct pass as a
    * sentinel `pinMinBytes`, so no construction pays two gate jobs.
    *
    * The in-window aggregate is MEMOIZED per (session, canonicalized
    * input plan, content column, byte estimate) in a session-scoped LRU
    * (the [[graft.gen.Generator]] planCache pattern): a layer that
    * constructs several routed wrappers over the same source — a
    * decontamination pass gating suspects then spanning them, a bench
    * loop rebuilding the query per iteration — pays the gate job ONCE,
    * not per construction (measured ~0.18 s each at sub-gate scale).
    * The byte estimate rides in the key on purpose: an incremental
    * source whose files grew re-resolves to a different estimate and
    * takes a fresh gate job rather than a stale density verdict. */
  def routePar(df: DataFrame, minBytes: Long, contentCol: String): Int =
    routeAndPin(df, minBytes, contentCol)._1

  /** (routePar, pinPar): the collapse-routing decision AND the
    * parallelism pin the routed rep-side stages should carry (0 = let
    * AQE size them). They are SEPARATE decisions on purpose: routing
    * asks "is the corpus dup-dense or row-heavy enough that collapsing
    * first wins", pinning asks "is the DISTINCT side big enough that
    * the CPU-dense pair stages need cluster-width exchanges". A zipfian
    * corpus answers yes/no — 50k rows in 3k families routes (17 copies
    * each), but pinning its ~12k chunk rows across 64-task stages paid
    * ~35 CPU·s of per-task fixed cost where the AQE-sized plan did the
    * same work in 4 (measured on the committed skew battery). Above the
    * byte window both engage — a ≥minBytes DISTINCT side is what the
    * byte estimate evidences there; inside it the gate aggregate's
    * approx-distinct decides the pin with the same ≥minBytes/64
    * break-even the row gate uses. */
  def routeAndPin(df: DataFrame, minBytes: Long,
      contentCol: String): (Int, Int) = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val par = 2 * df.sparkSession.sparkContext.defaultParallelism
    if (bytes >= BigInt(minBytes)) return (par, par)
    if (minBytes > (1L << 40) || bytes < BigInt(minBytes >> 10)) return (0, 0)
    val key = (df.sparkSession, df.queryExecution.optimizedPlan.canonicalized,
      contentCol, bytes)
    val (n, d) = gateMemo.synchronized(Option(gateMemo.get(key))) match {
      case Some(hit) => hit
      case None =>
        gateJobs.incrementAndGet()
        val r = df.agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.approx_count_distinct(
            org.apache.spark.sql.functions.col(contentCol))).head()
        val v = (r.getLong(0), math.max(r.getLong(1), 1L))
        gateMemo.synchronized(gateMemo.put(key, v))
        v
    }
    val routed = n >= (minBytes >> 6) || (n >= (minBytes >> 8) && n >= 4 * d)
    (if (routed) par else 0, if (routed && d >= (minBytes >> 6)) par else 0)
  }

  /** Gate-job count, for specs pinning the memo contract (one job per
    * distinct (source, column, size) — never per wrapper construction). */
  private[graft] val gateJobs = new AtomicLong(0L)

  // Bounded LRU (access-order) of in-window gate aggregates. 128 entries
  // of four pointers + two longs — bytes, not plans' worth of memory:
  // LogicalPlan keys are references into plans the session already holds.
  private val gateMemo =
    new java.util.LinkedHashMap[(SparkSession, LogicalPlan, String, BigInt),
        (Long, Long)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, LogicalPlan, String, BigInt),
            (Long, Long)]): Boolean = size > 128
    }

  /** `repartition(n, keys)` when the pin is engaged, identity when not
    * (the join's own required distribution then provides the exchange
    * and AQE sizes it). */
  def spread(df: DataFrame, n: Int, keys: Column*): DataFrame =
    if (n > 0) df.repartition(n, keys: _*) else df
}
