package graft

import graft.cache.ResultCache
import graft.gen.Generator
import graft.plan.SemanticQuery
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Result cache semantics (reference: core/result_cache.py:90): LRU + TTL
  * over persisted result DataFrames, eviction releases executor storage. */
class ResultCacheSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val gen = new Generator(spark, TpchCatalog.build(TestSpark.sfDir))

  private val q1 = SemanticQuery(metrics = Seq("orders.revenue"),
    dimensions = Seq("orders.orderstatus"))
  private val q2 = SemanticQuery(metrics = Seq("orders.order_count"))

  test("repeat queries hit the persisted result; TTL expires entries") {
    var now = 0L
    val cache = new ResultCache(maxEntries = 8, ttlMillis = 1000L, clock = () => now)
    var computes = 0
    def run() = cache.cached(q1) { computes += 1; gen.plan(q1) }
    val first = run()
    assert(computes == 1)
    assert(first.storageLevel != StorageLevel.NONE, "result must be persisted")
    val second = run()
    assert(computes == 1, "second call must be served from cache")
    assert(second eq first)
    now = 2000L // past the TTL
    run()
    assert(computes == 2, "expired entry must recompute")
    cache.invalidateAll()
    assert(cache.size == 0)
    assert(first.storageLevel == StorageLevel.NONE, "invalidate must unpersist")
  }

  test("LRU eviction unpersists the eldest result") {
    val cache = new ResultCache(maxEntries = 1, ttlMillis = Long.MaxValue)
    val a = cache.cached(q1)(gen.plan(q1))
    val b = cache.cached(q2)(gen.plan(q2))
    assert(cache.size == 1)
    assert(a.storageLevel == StorageLevel.NONE, "evicted entry must unpersist")
    assert(b.storageLevel != StorageLevel.NONE)
    cache.invalidateAll()
  }
}
