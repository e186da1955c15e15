package graft

import graft.ops.{Sampling, Sessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def events = spark.read
    .parquet(s"${TestSpark.sfDir}/events.parquet")
    .withColumn("ts_t", expr("cast(ts as timestamp)"))

  private val GapSec = 43200
  private val GapUs = GapSec * 1000000L

  test("session_window summarize agrees with lag/cumsum assign") {
    // two independent implementations of the same session semantics —
    // the declarative route must produce exactly the sessions the
    // per-event labeling implies
    val viaWindow = Sessionize.summarize(events, "user_id", "ts_t",
      GapSec, Some("value"))
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val viaAssign = Sessionize.assign(events, "user_id", "ts_t", "event_id",
      GapUs)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts_t")).as("session_start"),
        max(col("ts_t")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    assert(viaWindow == viaAssign)
    assert(viaWindow.nonEmpty)
  }

  test("a gap of exactly `gap` merges; only a strictly larger gap splits") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, 1.0), (1L, GapUs, 1.0), // merges: touching windows
      (2L, 0L, 1.0), (2L, GapUs + 1, 1.0) // splits: > gap
    ).toDF("user_id", "us", "value")
      .withColumn("ts_t", timestamp_micros(col("us")))
    val sess = Sessionize.summarize(df, "user_id", "ts_t", GapSec, None)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess == Map(1L -> 1L, 2L -> 2L))
  }

  test("streaming sessions converge to batch, including a late merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val HourUs = 3600000000L

    // base offset keeps every event strictly above the initial watermark
    // (epoch 0): the stateful operator drops rows at/below the watermark
    val T0 = 100 * HourUs
    // user 7: two events 20h apart (separate sessions at a 12h gap) —
    // then a LATE event lands 10h after the first, bridging them into
    // one session. Emitting on first sight of the gap would get this
    // wrong; the state-held design must merge.
    val batch1 = Seq(
      Sessionize.Ev(7L, T0, 1.0),
      Sessionize.Ev(7L, T0 + 20 * HourUs, 1.0),
      Sessionize.Ev(8L, T0, 2.0))
    val batch2 = Seq(Sessionize.Ev(7L, T0 + 10 * HourUs, 1.0))
    // watermark pusher: far-future event closes everything above
    val batch3 = Seq(Sessionize.Ev(99L, T0 + 1000 * HourUs, 0.0))

    // the watermark delay must cover the lateness: after batch 1 the max
    // event time is 20h, so an 11h delay keeps wm = 9h < the 10h arrival
    val in = MemoryStream[Sessionize.Ev]
    val out = Sessionize.streamingSessions(in.toDS(), GapSec,
      delaySec = 11 * 3600)
    val q = out.writeStream.format("memory").queryName("sess_test")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      in.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sess_test")
      .select("user_id", "session_start_us", "session_end_us", "n_events",
        "total_value")
      .collect().map(_.toSeq).toSet
    // batch truth over the union of all batches (user 99 still open —
    // only closed sessions are emitted, so exclude it)
    val all = (batch1 ++ batch2).toDS()
      .withColumn("ts_t", timestamp_micros(col("tsUs")))
    val want = Sessionize.summarize(all.toDF(), "user", "ts_t", GapSec,
      Some("value"))
      .select(col("user").as("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"), col("total_value").cast("double"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // the late-merge actually exercised: user 7 ended with ONE session
    assert(got.count(_.head == 7L) == 1)
  }

  test("md5 split is stable under tail-weight changes") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val a = Sampling.split(docs, "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.split(docs, "doc_id",
      Seq("train" -> 800, "val" -> 150, "test" -> 50))
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // re-splitting the tail never moves a row out of train
    assert(a == b)
    assert(a.nonEmpty)
    val n = docs.count()
    // 80% ± 6 pp at this corpus size
    assert(math.abs(a.size.toDouble / n - 0.8) < 0.06)
  }

  test("split rejects weights that do not sum to 1000") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    intercept[IllegalArgumentException] {
      Sampling.split(docs, "doc_id", Seq("train" -> 900, "val" -> 90))
    }
  }

  test("greedy packing respects the budget and is layout-invariant") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 200L), ("a", 2L, 200L), ("a", 3L, 200L), // 200+200 | 200
      ("a", 4L, 900L), // over-budget row gets its own bin
      ("a", 5L, 10L),
      ("b", 1L, 512L), ("b", 2L, 1L)) // exact fit, then next bin
    val df = rows.toDF("g", "o", "s")
    val packed = Sampling.packGreedy(df, "g", "o", "s", budget = 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(packed == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("a", 4L, 2L), ("a", 5L, 3L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
    // identical under arbitrary physical layout (order is re-established
    // by the group shuffle + within-partition sort)
    val again = Sampling.packGreedy(df.repartition(7), "g", "o", "s", 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(again == packed)
    // real-corpus invariant: every multi-row bin's total fits the budget
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("source"), col("doc_id"), length(col("text")).as("sz"))
    val bins = Sampling.packGreedy(docs, "source", "doc_id", "sz", 1000)
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n"), sum(col("sz")).as("tot"))
    assert(bins.filter(col("n") > 1 && col("tot") > 1000).count() == 0)
    assert(bins.count() > 0)
  }

  test("mixture sample honors per-stratum quotas and drops unlisted strata") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length >= 3, "fixture needs several languages")
    val targets = Seq(langs(0) -> 2, langs(1) -> 4)
    val got = Sampling.mixtureSample(docs, "lang", "doc_id", targets)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(langs(0), langs(1))) // others dropped
    assert(got(langs(0)) <= 2 && got(langs(1)) <= 4)
    // the quota-2 stratum's picks are a prefix of the quota-4 ranking —
    // shrinking a quota never changes WHICH rows fill the smaller budget
    val wide = Sampling.mixtureSample(docs, "lang", "doc_id",
      Seq(langs(0) -> 4)).select("doc_id").collect().map(_.getLong(0)).toSet
    val narrow = Sampling.mixtureSample(docs, "lang", "doc_id",
      Seq(langs(0) -> 2)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(narrow.subsetOf(wide))
  }

  test("stratified sample is deterministic and bounded per stratum") {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val s1 = Sampling.stratifiedTopN(docs, "lang", "doc_id", 3)
      .select("lang", "doc_id", "sample_rank").collect().map(_.toSeq).toSet
    val s2 = Sampling.stratifiedTopN(
      docs.repartition(13), "lang", "doc_id", 3)
      .select("lang", "doc_id", "sample_rank").collect().map(_.toSeq).toSet
    // identical under arbitrary physical layout
    assert(s1 == s2)
    val perStratum = s1.groupBy(_.head).view.mapValues(_.size)
    assert(perStratum.values.forall(_ <= 3))
    assert(perStratum.values.exists(_ == 3))
  }
}
