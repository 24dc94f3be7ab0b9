package graft.index

import org.apache.spark.sql.DataFrame

import graft.index.sources.{SourceLeaf, SourceProviders}

/**
 * Captures the indexable source relation(s) under a DataFrame, routed
 * through the pluggable provider SPI (reference:
 * index/sources/FileBasedSourceProviderManager.scala; default provider
 * analogue: index/sources/default/DefaultFileBasedSource.scala:76-86).
 */
object SourceRelation {

  /** All provider-recognized leaves of the plan. */
  def collectLeaves(df: DataFrame): Seq[SourceLeaf] = {
    val spark = df.sparkSession
    df.queryExecution.analyzed.collectLeaves()
      .flatMap(SourceProviders.asSourceLeaf(spark, _))
  }

  /** Capture metadata for one leaf, registering files in the tracker. */
  def capture(leaf: SourceLeaf, tracker: FileIdTracker): RelationMeta = {
    val files = leaf.listFiles().map { case (path, size, mtime) =>
      FileMeta(path, size, mtime, tracker.addOrGet(path, size, mtime))
    }
    RelationMeta(
      rootPaths = leaf.rootPaths,
      schemaJson = leaf.schemaJson,
      format = leaf.format,
      options = leaf.options,
      files = files,
      signature = leaf.signature(files))
  }

  /** Capture every provider-recognized relation under the DataFrame.
    * Fails if the plan has no indexable leaf (nothing to index). */
  def captureAll(df: DataFrame, tracker: FileIdTracker): Seq[RelationMeta] = {
    val leaves = collectLeaves(df)
    require(leaves.nonEmpty,
      "DataFrame has no file-based relation to index (expected a " +
        "spark.read.<format> source)")
    leaves.map(capture(_, tracker))
  }
}
