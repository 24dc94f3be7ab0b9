package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.{IndexConfig, IndexManager, IndexState}

/**
 * Public API facade (reference: Hyperspace.scala:27-193). Usage:
 *
 * {{{
 *   val g = new Graft(spark)
 *   g.createIndex(df, CoveringIndexConfig("idx", Seq("k"), Seq("v")))
 *   g.indexes.show()
 *   // queries over df's source are now accelerated transparently when
 *   // graft.GraftSparkExtension is installed
 * }}}
 */
class Graft(spark: SparkSession) {
  private val manager = new IndexManager(spark)

  /** Catalog view of all indexes. */
  def indexes: DataFrame = manager.indexes

  def createIndex(df: DataFrame, config: IndexConfig): Unit =
    manager.create(df, config)

  /** Soft delete — optimizer stops using the index; data retained. */
  def deleteIndex(name: String): Unit = manager.delete(name)

  /** Undo a soft delete. */
  def restoreIndex(name: String): Unit = manager.restore(name)

  /** Hard delete of a soft-deleted index, or outdated-version cleanup of
    * an active one. */
  def vacuumIndex(name: String): Unit = manager.vacuum(name)

  /** Rebuild index data against current source files.
    * Modes: "full" (complete rebuild). Incremental/quick land with the
    * refresh milestone. */
  def refreshIndex(name: String, mode: String = "full"): Unit = mode match {
    case "full" => manager.refreshFull(name)
    case m => throw new IllegalArgumentException(s"Unknown refresh mode '$m'")
  }

  private[graft] def indexManager: IndexManager = manager
}

object Graft {
  /** SparkSession convenience syntax. */
  implicit class GraftSparkSessionOps(val spark: SparkSession) extends AnyVal {
    def enableGraft(): SparkSession = {
      spark.conf.set(graft.index.GraftConf.ApplyEnabledKey, "true"); spark
    }
    def disableGraft(): SparkSession = {
      spark.conf.set(graft.index.GraftConf.ApplyEnabledKey, "false"); spark
    }
    def isGraftEnabled: Boolean =
      graft.index.GraftConf.applyEnabled(spark)
  }
}
