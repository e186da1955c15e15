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

  test("line dedup broadcasts the offender set (corpus never shuffled by line)") {
    val plan = sparkPlan(SparkEntry.queries("q_line_dedup")(spark, dir))
    val bcJoins = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bcJoins.nonEmpty, s"expected a broadcast offender join:\n$plan")
    // shuffles allowed: offender count agg, doc-id reassembly agg, final
    // sort — NOT a join-keyed shuffle of the exploded corpus lines
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 3,
      s"unexpected extra shuffles (corpus lines shuffled by content?):\n$plan")
  }

  test("bloom incremental dedup keeps the corpus shuffle-free") {
    val plan = sparkPlan(SparkEntry.queries("q_incremental_new")(spark, dir))
    val bcJoins = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bcJoins.size >= 2,
      s"expected broadcast semi + anti joins around the corpus scan:\n$plan")
    // the final orderBy range-partitions the (small) result; the corpus
    // itself must never be exchange-partitioned
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 1,
      s"corpus side should not shuffle in the bloom path:\n$plan")
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
    val plan = sparkPlan(SparkEntry.queries("q_bm25")(spark, dir))
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k must plan as a per-partition heap, not a global sort:\n$plan")
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"literal-term scoring is map-side; no exchange belongs here:\n$plan")
    assert(plan.toString.contains("Broadcast"),
      s"the 1-row stats frame should broadcast:\n$plan")
  }

  test("sequence index cumsum stays distributed (no partition-less window)") {
    val plan = sparkPlan(SparkEntry.queries("q_seq_pack")(spark, dir))
    val bad = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty,
      s"global cumsum must use the range-partition + offsets plan:\n$plan")
  }

  test("weighted sample plans the n-largest as a top-k heap over the scan") {
    // the pre-rank selection must be TakeOrderedAndProject (per-partition
    // heap, n rows to the driver) — the only WindowExec allowed is the
    // post-limit sample_rank over exactly n rows
    val plan = sparkPlan(SparkEntry.queries("q_weighted_sample")(spark, dir))
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"selection must not globally sort the corpus:\n$plan")
  }
}
