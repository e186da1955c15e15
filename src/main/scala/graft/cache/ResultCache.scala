package graft.cache

import graft.plan.SemanticQuery
import org.apache.spark.sql.DataFrame

/** LRU + TTL cache of query RESULTS (reference: core/result_cache.py:90 —
  * an Arrow-table LRU there). The Spark-native analog caches the
  * MATERIALIZED DataFrame via `persist`: the result stays distributed
  * across executor storage (never collected to the driver — at 100 TB a
  * result can itself be large), repeat queries become a cache-read plan,
  * and eviction unpersists so storage is bounded by `maxEntries` results.
  */
final class ResultCache(maxEntries: Int = 32, ttlMillis: Long = 10 * 60 * 1000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, at: Long)

  private val entries =
    new java.util.LinkedHashMap[SemanticQuery, Entry](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SemanticQuery, Entry]): Boolean = {
        val evict = this.size() > maxEntries
        if (evict) e.getValue.df.unpersist(false)
        evict
      }
    }

  /** Serve `q` from cache, or compute+persist+materialize it. */
  def cached(q: SemanticQuery)(compute: => DataFrame): DataFrame =
    entries.synchronized {
      val hit = entries.get(q)
      if (hit != null && clock() - hit.at <= ttlMillis) hit.df
      else {
        if (hit != null) { hit.df.unpersist(false); entries.remove(q) }
        val df = compute
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize now so every consumer reads the cache
        entries.put(q, Entry(df, clock()))
        df
      }
    }

  def size: Int = entries.synchronized(entries.size)

  /** Drop everything and release the executor storage. */
  def invalidateAll(): Unit = entries.synchronized {
    entries.values.forEach(e => e.df.unpersist(false))
    entries.clear()
  }
}
