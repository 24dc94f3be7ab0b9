package graft.index.rules

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}

import graft.index.IndexLogEntry
import graft.index.covering.CoveringIndexDescriptor

/**
 * The actual rewrite mechanics: swap a source `LogicalRelation` for one
 * reading index data (reference:
 * index/covering/CoveringIndexRuleUtils.scala:98-130
 * `transformPlanToUseIndexOnlyScan`).
 *
 * Attribute identity is preserved: columns present in the original
 * relation keep their exprIds so Project/Filter nodes above the swapped
 * scan stay valid; index-only columns (e.g. lineage) get fresh attributes.
 *
 * Scale notes: the substituted scan is ordinary bucketed parquet — filter
 * pushdown / column pruning happen in `FileSourceStrategy` exactly as for
 * any parquet scan, and `outputPartitioning = HashPartitioning(keys,
 * numBuckets)` lets `EnsureRequirements` elide shuffles for joins and
 * aggregations on the indexed columns.
 */
object ScanSubstitution {

  /** Build a LogicalRelation scanning covering-style index data
    * (covering or z-order descriptor). */
  def indexScan(
      spark: SparkSession,
      original: LogicalRelation,
      entry: IndexLogEntry,
      useBucketSpec: Boolean): LogicalRelation = {
    val (schemaJson, bucketSpec) = entry.descriptor match {
      case d: CoveringIndexDescriptor =>
        (d.schemaJson,
          if (useBucketSpec)
            Some(BucketSpec(d.numBuckets, d.indexedColumns, d.indexedColumns))
          else None)
      case d: graft.index.zorder.ZOrderIndexDescriptor => (d.schemaJson, None)
      case d => throw new IllegalArgumentException(
        s"not a covering-style index: ${d.kind}")
    }
    val indexSchema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val location = new InMemoryFileIndex(
      spark,
      entry.content.filePaths.map(new Path(_)),
      Map.empty[String, String],
      Some(indexSchema),
      FileStatusCache.getOrCreate(spark),
      None,
      None)
    val relation = HadoopFsRelation(
      location,
      partitionSchema = StructType(Nil),
      dataSchema = indexSchema,
      bucketSpec = bucketSpec,
      fileFormat = new ParquetFileFormat,
      options = Map(IndexCandidates.IndexRelationMarker -> entry.name))(spark)

    val resolver = spark.sessionState.conf.resolver
    val output = indexSchema.fields.toIndexedSeq.map { f =>
      original.output
        .find(a => resolver(a.name, f.name))
        .getOrElse(AttributeReference(f.name, f.dataType, f.nullable)())
    }
    new LogicalRelation(relation, output, None, false, None)
  }
}
