package graft

import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions for the pipeline operators' scale claims —
  * each scaladoc promise about shuffles/broadcasts is asserted against
  * the actual physical plan of the driver query, so a refactor that
  * silently degrades the plan (a broadcast falling back to a shuffle
  * join, a window losing its partitioning) turns a test red instead of
  * a 100 TB job black. */
class OpsPlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def sparkPlan(df: DataFrame) =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.sparkPlan

  /** The FINAL adaptive physical plan, materialized — exchanges are
    * inserted by EnsureRequirements (after `sparkPlan`), so shuffle
    * counting must look here; AQE's treeString repeats the pre-run tree
    * under "== Initial Plan ==", which is cut off. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.asInstanceOf[classic.Dataset[Row]].queryExecution
      .executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def shuffleCount(plan: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(plan).size

  test("line dedup broadcasts the offender set (corpus never shuffled by line)") {
    val df = SparkEntry.queries("q_line_dedup")(spark, dir)
    val plan = sparkPlan(df)
    val bcJoins = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bcJoins.nonEmpty, s"expected a broadcast offender join:\n$plan")
    // shuffles allowed: offender count agg, doc-id reassembly agg, final
    // sort — NOT a join-keyed shuffle of the exploded corpus lines
    val fp = finalPlan(df)
    assert(shuffleCount(fp) <= 3,
      s"unexpected extra shuffles (corpus lines shuffled by content?):\n$fp")
  }

  test("bloom incremental dedup keeps the corpus shuffle-free") {
    val df = SparkEntry.queries("q_incremental_new")(spark, dir)
    val plan = sparkPlan(df)
    val bcJoins = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bcJoins.size >= 2,
      s"expected broadcast semi + anti joins around the corpus scan:\n$plan")
    // the final orderBy range-partitions the (small) result; the corpus
    // itself must never be exchange-partitioned
    val fp = finalPlan(df)
    assert(shuffleCount(fp) <= 1,
      s"corpus side should not shuffle in the bloom path:\n$fp")
  }

  test("per-doc windows stay partitioned in tfidf and LM scoring") {
    Seq("q_tfidf", "q_lm_score").foreach { name =>
      val bad = sparkPlan(SparkEntry.queries(name)(spark, dir)).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans a partition-less window")
    }
  }

  test("corpus report's modal-language lookup broadcasts") {
    val plan = sparkPlan(SparkEntry.queries("q_corpus_report")(spark, dir))
    assert(plan.toString.contains("Broadcast"),
      s"top-language 1-row join should broadcast:\n$plan")
  }

  test("bm25 never shuffles the corpus: stats broadcast + top-k heap") {
    val df = SparkEntry.queries("q_bm25")(spark, dir)
    val plan = sparkPlan(df)
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k must plan as a per-partition heap, not a global sort:\n$plan")
    val fp = finalPlan(df)
    assert(shuffleCount(fp) == 0,
      s"literal-term scoring is map-side; no exchange belongs here:\n$fp")
    assert(plan.toString.contains("Broadcast"),
      s"the 1-row stats frame should broadcast:\n$plan")
  }

  test("sequence index cumsum stays distributed (no partition-less window)") {
    // above the TableCalcs size gate (forced shut here) the cumsum must
    // keep the range-partition + offsets plan; at test SF the frame is
    // result-sized and legitimately takes the gated single window
    spark.conf.set("spark.graft.tablecalc.globalWindowMaxBytes", "0")
    try {
      val plan = sparkPlan(SparkEntry.queries("q_seq_pack")(spark, dir))
      val bad = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"global cumsum must use the range-partition + offsets plan:\n$plan")
    } finally
      spark.conf.unset("spark.graft.tablecalc.globalWindowMaxBytes")
  }

  test("weighted sample plans the n-largest as a top-k heap over the scan") {
    // the pre-rank selection must be TakeOrderedAndProject (per-partition
    // heap, n rows to the driver) — the only WindowExec allowed is the
    // post-limit sample_rank over exactly n rows
    val plan = sparkPlan(SparkEntry.queries("q_weighted_sample")(spark, dir))
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"selection must not globally sort the corpus:\n$plan")
  }

  test("key profile shuffles each column's histogram exactly once") {
    // exchanges are inserted by EnsureRequirements, so pin the EXECUTED
    // plan: 3 profiled columns → exactly 3 hash exchanges (the per-
    // column key histograms); everything downstream is single-row
    // aggregation (SinglePartition) plus the 3-row output sort
    val df = SparkEntry.queries("q_key_profile")(spark, dir)
    df.collect()
    val finalPlan = df.asInstanceOf[classic.Dataset[Row]].queryExecution
      .executedPlan.toString.split("== Initial Plan ==")(0)
    val hashEx = "Exchange hashpartitioning".r
      .findAllIn(finalPlan).size
    assert(hashEx == 3,
      s"expected 3 histogram shuffles, got $hashEx:\n${finalPlan.take(4000)}")
    assert(!finalPlan.contains("Window"),
      s"profile must aggregate, not window:\n${finalPlan.take(4000)}")
  }

  test("curriculum's two global orderings stay distributed") {
    // same gate discipline as the cumsum pin above: the distributed
    // shape is the above-gate contract, so force the gate shut
    spark.conf.set("spark.graft.tablecalc.globalWindowMaxBytes", "0")
    try {
      val plan = sparkPlan(SparkEntry.queries("q_curriculum")(spark, dir))
      val bad = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty,
        s"rank/position must use range-partition + offsets, not a global window:\n$plan")
    } finally
      spark.conf.unset("spark.graft.tablecalc.globalWindowMaxBytes")
  }

  test("skew join broadcasts the hot-key set on every split path") {
    val plan = sparkPlan(SparkEntry.queries("q_skew_join")(spark, dir))
    // two semi joins + one anti join against the hot-key histogram, all
    // broadcast — a shuffled split would re-partition the fact table
    // three times before the real join even starts
    val bc = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bc.size >= 3,
      s"hot/cold split must broadcast the hot-key set (got ${bc.size}):\n$plan")
  }

  test("semdedup verifies via equi-joins, never a cartesian product") {
    val plan = sparkPlan(SparkEntry.queries("q_semdedup")(spark, dir))
    val s = plan.toString
    assert(!s.contains("CartesianProduct"),
      s"within-cell pairing must be the __cell equi-join:\n$plan")
    val bad = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"cell-size audit window lost its partitioning:\n$plan")
  }

  // ---- zero-exchange kernel fronts (the DedupExprsSpec minhash pin's
  // siblings): each front is claimed to be a pure per-row projection, so
  // any exchange before the first candidate join is a regression ----

  test("the simhash chunk front plan has zero exchanges") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val front = graft.ops.Dedup.simHashChunks(docs, "doc_id", "text", 3)
    val fp = finalPlan(front)
    assert(shuffleCount(fp) == 0,
      s"simhash front must be a projection (explode is not an exchange):\n$fp")
  }

  test("the LSH banded-key front plan has zero exchanges") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding").as("v"))
    val front = graft.ops.Similarity.bandedKeys(emb, "id", "v",
      bands = 8, planesPerBand = 3, dim = 64, seed = 42)
    val fp = finalPlan(front)
    assert(shuffleCount(fp) == 0,
      s"banded keys must be sign-bucket projection + posexplode:\n$fp")
  }

  test("the IVF cell-assignment plan has zero exchanges") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("__id"),
        col("embedding").cast("array<double>").as("__v"))
    val cents = (0 until 4).map(i =>
      (0 until 64).map(j => ((i * 31 + j) % 7).toDouble).toSeq).toSeq
    val assigned = graft.ops.Similarity.assignCells(emb, "__id", cents)
    val fp = finalPlan(assigned)
    assert(shuffleCount(fp) == 0,
      s"cell assignment must be a MatVecDots projection + least():\n$fp")
  }

  test("the collapse-first cosine front adds exactly one exchange " +
      "(the vector-keyed collapse), banding stays a projection") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val reps = emb.groupBy(col("embedding"))
      .agg(org.apache.spark.sql.functions.min(col("vec_id")).as("id"))
    val front = graft.ops.Similarity.bandedKeys(
      reps.select(col("id"), col("embedding").as("v")), "id", "v",
      bands = 8, planesPerBand = 3, dim = 64, seed = 42)
    val fp = finalPlan(front)
    assert(shuffleCount(fp) == 1,
      s"vector collapse is one exchange; sign-bucket banding must add " +
        s"none:\n$fp")
  }

  test("the collapse-first minhash front adds exactly one exchange " +
      "(the content-keyed collapse), two-phase aggregated") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val reps = graft.ops.Dedup.collapseExact(docs, "doc_id", "text")
    val front = graft.ops.Dedup.minhashFront(
      reps.select(col("doc_id"), col("text")), "doc_id", "text", 3, 16)
    val fp = finalPlan(front)
    assert(shuffleCount(fp) == 1,
      s"collapse is one content-keyed exchange; the minhash projection " +
        s"must add none:\n$fp")
    // partial + final HashAggregate = map-side combine dedupes co-located
    // copies BEFORE the exchange (the property that bounds shuffle volume
    // by distinct-per-partition content, not raw rows)
    assert("HashAggregate".r.findAllIn(fp).size >= 2,
      s"collapse must be a two-phase aggregate:\n$fp")
  }

  test("pair stages keep their explicit parallelism pins above the " +
      "size gate (AQE must not re-coalesce the CPU-dense pair work)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(400)
    val pairPar = 2 * spark.sparkContext.defaultParallelism
    // pinMinBytes = 0 forces the large-corpus branch regardless of the
    // test slice's size; REPARTITION_BY_NUM exchanges carry the pinned
    // width through the final adaptive plan — byte-derived coalescing
    // would show smaller partition counts on these exchanges
    val sim = finalPlan(graft.ops.Dedup.simHashPairs(
      docs, "doc_id", "text", maxDistance = 8, pinMinBytes = 0L))
    assert(s"REPARTITION_BY_NUM".r.findAllIn(sim).size >= 2,
      s"simHashPairs lost its parallelism pins:\n$sim")
    val mh = finalPlan(graft.ops.Dedup.minHashLSH(
      docs, "doc_id", "text", shingleSize = 3, numHashes = 16, bands = 4,
      threshold = 0.2, pinMinBytes = 0L))
    assert(s"REPARTITION_BY_NUM".r.findAllIn(mh).size >= 3,
      s"minHashLSH lost its parallelism pins:\n$mh")
    assert(mh.contains(s"$pairPar)") || mh.contains(s", $pairPar"),
      s"minHashLSH pin width is not 2x parallelism:\n$mh")
  }

  test("pair-stage pins stay OFF below the size gate — a small corpus " +
      "must keep the r13 shape (no REPARTITION_BY_NUM fixed cost)") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(400)
    // the 400-row slice sits far below PairPins.DefaultMinBytes, so the
    // default arguments must plan WITHOUT pinned exchanges (measured
    // 2-3x slower pinned at this scale; the joins' own required
    // distributions still provide the shuffles, AQE free to size them)
    val mh = finalPlan(graft.ops.Dedup.minHashLSH(
      docs, "doc_id", "text", shingleSize = 3, numHashes = 16, bands = 4,
      threshold = 0.2))
    assert(!mh.contains("REPARTITION_BY_NUM"),
      s"minHashLSH pinned a small corpus:\n$mh")
    val sim = finalPlan(graft.ops.Dedup.simHashPairs(
      docs, "doc_id", "text", maxDistance = 8))
    assert(!sim.contains("REPARTITION_BY_NUM"),
      s"simHashPairs pinned a small corpus:\n$sim")
  }

  test("the embedding pair family pins adaptively: OFF below the size " +
      "gate, ON above it (both failure modes are measured — see " +
      "PairPins)") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(400)
    // tiny input → the pins' fixed exchange cost must NOT be paid
    // (2-3x at sf0.1 on the identical corpus)
    val small = finalPlan(graft.ops.Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.8))
    assert(!small.contains("REPARTITION_BY_NUM"),
      s"cosineNearDupPairs pinned a small corpus:\n$small")
    // forced-pin branch → the candidate/gate/verify stages must carry
    // the pinned width (sf10 unpinned melted down 65 s → 354 s)
    val pinned = finalPlan(graft.ops.Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.8, pinMinBytes = 0L))
    assert("REPARTITION_BY_NUM".r.findAllIn(pinned).size >= 3,
      s"cosineNearDupPairs lost its above-gate pins:\n$pinned")
  }
}
