package graft.index.dataskipping

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, Expression, Literal}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.index.GraftRuleGuard

/**
 * `FileIndex` decorator that hides source files the translated sketch
 * predicate proves empty (reference:
 * index/dataskipping/execution/DataSkippingFileIndex.scala:40-61).
 *
 * The pruning query runs once per query plan, over index data that has one
 * row per source file — a small Spark job launched during planning, the
 * same boundary the reference accepts. Files with no index row (e.g.
 * appended after a quick refresh) are always kept: skipping must be
 * provable, never assumed.
 */
final class DataSkippingFileIndex(
    spark: SparkSession,
    base: FileIndex,
    indexData: DataFrame,
    translatedPredicate: Expression,
    fileIdByPath: Map[String, Long]) extends FileIndex {

  /** Ids of files the sketch predicate evaluates to FALSE for — provably
    * no matching rows. NULL (unknown) keeps the file. */
  private lazy val prunedIds: Set[Long] = GraftRuleGuard.withRuleDisabled {
    // runs lazily at SCAN time, outside ApplyGraft's try/catch: any
    // failure (index data vacuumed between planning and execution, ...)
    // must degrade to "no pruning", never fail the user query
    try {
      // the predicate was translated against standalone schema attributes
      // (so planning never pays for an index relation it may not use);
      // bind them to THIS DataFrame's output by name before filtering
      val out = indexData.queryExecution.analyzed.output
      val bound = translatedPredicate.transformUp {
        case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
          out.find(_.name == a.name).getOrElse(a)
      }
      indexData
        .filter(GraftBridge.column(
          EqualNullSafe(bound, Literal.FalseLiteral)))
        .select(Sketches.FileIdColumn)
        .collect()
        .map(_.getLong(0))
        .toSet
    } catch {
      case scala.util.control.NonFatal(_) => Set.empty
    }
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    if (prunedIds.isEmpty) return base.listFiles(partitionFilters, dataFilters)
    base.listFiles(partitionFilters, dataFilters)
      .map { pd =>
        pd.copy(files = pd.files.filter { f =>
          fileIdByPath.get(f.getPath.toString)
            .forall(id => !prunedIds.contains(id))
        })
      }
      .filter(_.files.nonEmpty)
  }

  override def rootPaths: Seq[Path] = base.rootPaths
  override def inputFiles: Array[String] = base.inputFiles
  override def refresh(): Unit = base.refresh()
  override def sizeInBytes: Long = base.sizeInBytes
  override def partitionSchema: StructType = base.partitionSchema
}
