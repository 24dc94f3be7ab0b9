package graft.telemetry

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession

/**
 * Pluggable event-logger SPI (reference:
 * telemetry/HyperspaceEventLogging.scala:30-40, re-derived without the
 * process-global lazy singleton: the reference resolves the logger
 * class from whichever session happens to be active FIRST and caches it
 * forever; here the class name is read from the CALLING session's conf
 * on every emission, so two sessions in one JVM can run different
 * loggers and a conf change takes effect on the next event).
 *
 * Implementations need a public no-arg constructor. Instances are
 * cached per class name (one instance per JVM per class); resolution
 * failures throw [[IllegalArgumentException]] — a misconfigured audit
 * hook should fail loudly at the action, not silently drop the trail
 * (reference behavior, HyperspaceEventLogging.scala:49-56). Query-time
 * usage emission sits inside ApplyGraft's fail-safe, so a bad logger
 * class degrades query ACCELERATION gracefully while index ACTIONS
 * still surface the error.
 */
trait GraftEventLogger {
  def logEvent(event: GraftEvent): Unit
}

/** Default: drop everything (reference: NoOpEventLogger). */
object NoOpEventLogger extends GraftEventLogger {
  override def logEvent(event: GraftEvent): Unit = ()
}

object GraftEventLogging extends Logging {

  /** Session conf key naming the [[GraftEventLogger]] implementation. */
  val LoggerClassKey = "spark.graft.eventLogger.class"

  private val instances = new ConcurrentHashMap[String, GraftEventLogger]()

  /** The session's configured logger, or [[NoOpEventLogger]]. */
  def loggerFor(spark: SparkSession): GraftEventLogger = {
    val className =
      spark.sessionState.conf.getConfString(LoggerClassKey, "")
    if (className.isEmpty) NoOpEventLogger
    else instances.computeIfAbsent(className, instantiate)
  }

  /** Emit `event` to the session's logger. The payload is by-name: when
    * no logger is configured, nothing (plan strings included) is built. */
  def emit(spark: SparkSession)(event: => GraftEvent): Unit = {
    val logger = loggerFor(spark)
    if (logger ne NoOpEventLogger) logger.logEvent(event)
  }

  def appInfo(spark: SparkSession): AppInfo = {
    val sc = spark.sparkContext
    AppInfo(sc.sparkUser, sc.applicationId, sc.appName)
  }

  private def instantiate(className: String): GraftEventLogger =
    try {
      Class.forName(className).getDeclaredConstructor().newInstance() match {
        case logger: GraftEventLogger =>
          logInfo(s"graft: event logger set to $className")
          logger
        case other => throw new IllegalArgumentException(
          s"Configured event logger '$className' is not a " +
            s"graft.telemetry.GraftEventLogger (got ${other.getClass.getName})")
      }
    } catch {
      case e: ReflectiveOperationException =>
        throw new IllegalArgumentException(
          s"Unable to instantiate event logger '$className'", e)
    }
}
