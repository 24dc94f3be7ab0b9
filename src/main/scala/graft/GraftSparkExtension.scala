package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.index.rules.ApplyGraft

/**
 * Session extension entry point: registered via
 * `spark.sql.extensions=graft.GraftSparkExtension`.
 *
 * Injects the index-acceleration optimizer rule (mirrors the reference's
 * HyperspaceSparkSessionExtension.scala:44-68, but injects the real rule
 * gated on conf instead of a swapped dummy rule). The pre-CBO slot runs
 * the rule exactly once per query on the operator-optimized plan.
 */
class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPreCBORule(spark => new ApplyGraft(spark))
    extensions.injectPlannerStrategy(spark =>
      new graft.execution.BucketUnionStrategy(spark))
  }
}
