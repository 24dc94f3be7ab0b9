package graft.index.rules

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.index.{GraftConf, IndexLogEntry, IndexManager, IndexState}

/**
 * Driver-side cache of ACTIVE index log entries per system path
 * (reference: index/CachingIndexCollectionManager.scala). Entries expire
 * after a TTL so external writers are picked up; in-JVM mutations
 * invalidate eagerly so a freshly created index is visible to the very
 * next query.
 *
 * Scale note: the metadata log is tiny (one JSON doc per index), so the
 * cache exists to avoid per-query remote-FS round trips, not memory
 * pressure. On a 1000-executor cluster this is driver-only state.
 */
object IndexCatalog {
  private final case class Cached(fetchedAt: Long, entries: Seq[IndexLogEntry])
  private val cache = new ConcurrentHashMap[String, Cached]()

  def activeIndexes(spark: SparkSession): Seq[IndexLogEntry] = {
    val sysPath = GraftConf.systemPath(spark)
    val now = System.currentTimeMillis()
    val hit = cache.get(sysPath)
    if (hit != null && now - hit.fetchedAt < GraftConf.cacheTtlMs(spark)) {
      hit.entries
    } else {
      val entries = new IndexManager(spark).getIndexes(Set(IndexState.Active))
      cache.put(sysPath, Cached(now, entries))
      entries
    }
  }

  def invalidate(spark: SparkSession): Unit =
    cache.remove(GraftConf.systemPath(spark))
}
