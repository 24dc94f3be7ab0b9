package graft.index.rules

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/**
 * Per-session cache of immutable planning artifacts derived from an index
 * log entry — parsed schemas, resolved file indexes, resolved index-data
 * relations. Rewrite rules run on EVERY query plan (several times per
 * query under multi-pass benchmarks), and re-deriving these per
 * invocation (a JSON schema parse + an `InMemoryFileIndex` construction
 * or a full `spark.read` relation resolution) was the dominant
 * planning-time cost (measured: FilterIndexRule 2.5 s + DataSkippingRule
 * 1.2 s over a 10-query profile, nearly all artifact re-derivation).
 *
 * Safety: keys embed the entry's LOG ID — every FSM transition (refresh,
 * optimize, delete...) writes a new id, so a stale artifact can never be
 * served for changed content; the values themselves are immutable
 * (Spark's own catalog shares `FileIndex` instances across queries the
 * same way). Sessions are weak keys so stopped test sessions unpin.
 */
private[graft] object PlanArtifacts {
  private val cache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, AnyRef]]()

  private def mapFor(spark: SparkSession): ConcurrentHashMap[String, AnyRef] =
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new ConcurrentHashMap[String, AnyRef]()
        cache.put(spark, m)
      }
      m
    }

  def getOrCompute[T <: AnyRef](spark: SparkSession, key: String)(f: => T): T =
    mapFor(spark).computeIfAbsent(key, _ => f).asInstanceOf[T]

  /** Strong content hash for cache keys: SHA-256 over the parts, NUL
    * separated. Int `hashCode`s alias at ~2^16 entries (birthday bound) —
    * with a 256-bit digest aliasing is structurally impossible rather
    * than merely unlikely, and the file LIST (not just its hash) is what
    * distinguishes two fixtures reusing an index name at the same log id. */
  def contentKey(parts: Iterable[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach { p => md.update(p.getBytes("UTF-8")); md.update(0.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }
}
