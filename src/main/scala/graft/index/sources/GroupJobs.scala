package graft.index.sources

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/**
 * Bounded-pool fan-out for maintenance rewrites (OPTIMIZE / binpack
 * compaction). Each rewrite group is an independent Spark job writing
 * its own staging directory, so groups can run CONCURRENTLY — Spark's
 * scheduler interleaves jobs submitted from different threads on one
 * session. Without this, a fragmented 100 TB table with thousands of
 * bin groups serializes into wall time = Σ(groups); with it, wall time
 * ≈ Σ(groups) / maxThreads (the delta-spark `optimize.maxThreads`
 * posture; Iceberg's rewriteDataFiles uses the same bounded-pool
 * shape — reference analogue: neither, this is a beyond-reference
 * scale fix for the lake surface).
 *
 * Results are returned in INPUT ORDER regardless of completion order;
 * the first failure is rethrown after the pool drains (remaining tasks
 * are cancelled best-effort).
 */
object GroupJobs {

  /** Session knob: max concurrent group jobs (default 8, min 1). */
  val MaxThreadsKey = "spark.graft.optimize.maxThreads"

  /** Test seam: invoked on the worker thread just before each group's
    * body runs, with the group index. Specs install a barrier here to
    * PROVE two groups are in flight at once; production never sets it. */
  @volatile private[graft] var beforeGroup: Int => Unit = _ => ()

  private val poolSeq = new AtomicInteger()

  def maxThreads(spark: SparkSession): Int =
    math.max(1, spark.conf.getOption(MaxThreadsKey).map(_.toInt).getOrElse(8))

  /**
   * Run `fn(item, index)` for every item, at most `maxThreads(spark)`
   * concurrently, returning results in input order. Single-item (or
   * single-thread) inputs run inline on the caller thread — no pool,
   * no reordering hazard, identical stack traces.
   */
  def mapConcurrently[A, B](spark: SparkSession, items: Seq[A])(
      fn: (A, Int) => B): Seq[B] = {
    val threads = math.min(maxThreads(spark), items.size)
    if (items.size <= 1 || threads <= 1) {
      items.zipWithIndex.map { case (a, i) => beforeGroup(i); fn(a, i) }
    } else {
      val poolId = poolSeq.incrementAndGet()
      val pool = Executors.newFixedThreadPool(threads, new ThreadFactory {
        private val seq = new AtomicInteger()
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r,
            s"graft-optimize-$poolId-${seq.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
      try {
        val futures = items.zipWithIndex.map { case (a, i) =>
          pool.submit(new java.util.concurrent.Callable[B] {
            override def call(): B = { beforeGroup(i); fn(a, i) }
          })
        }
        val results = new Array[Any](items.size)
        var firstFailure: Option[Throwable] = None
        futures.zipWithIndex.foreach { case (f, i) =>
          try results(i) = f.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              if (firstFailure.isEmpty) {
                firstFailure = Some(Option(e.getCause).getOrElse(e))
                futures.foreach(_.cancel(true))
              }
            case NonFatal(e) =>
              if (firstFailure.isEmpty) {
                firstFailure = Some(e)
                futures.foreach(_.cancel(true))
              }
          }
        }
        firstFailure.foreach(throw _)
        results.toSeq.asInstanceOf[Seq[B]]
      } finally {
        pool.shutdownNow()
        pool.awaitTermination(60, TimeUnit.SECONDS)
      }
    }
  }
}
