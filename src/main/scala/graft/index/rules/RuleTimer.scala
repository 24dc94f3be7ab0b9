package graft.index.rules

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Cumulative wall-nanos per named planning phase, for the optimization
  * harness ([[graft.QueryProfile]]): the engine injects four rules into
  * every query's planning pipeline, and at 175 bench queries x 4 plans
  * each their latency is a direct bench cost. Two nanoTime calls per
  * rule invocation; no behavior change. */
object RuleTimer {
  private val timers = new ConcurrentHashMap[String, AtomicLong]()

  @inline def timed[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally timers.computeIfAbsent(name, _ => new AtomicLong)
      .addAndGet(System.nanoTime() - t0)
  }

  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    timers.asScala.map { case (k, v) => k -> v.get }.toMap
  }
}
