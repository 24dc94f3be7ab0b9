package graft.index.dataskipping

import org.apache.spark.sql.DataFrame

import graft.index.{IndexBuildContext, IndexDescriptor}

/**
 * Data-skipping index descriptor: one row per source file with per-file
 * sketch values (reference: index/dataskipping/DataSkippingIndex.scala:44-128).
 * Placeholder — build lands with the data-skipping milestone.
 */
final case class DataSkippingIndexDescriptor(
    sketches: Seq[SketchSpec],
    schemaJson: String) extends IndexDescriptor {

  override def kind: String = "DataSkippingIndex"
  override def kindAbbr: String = "DS"
  override def indexedColumns: Seq[String] = sketches.flatMap(_.columns).distinct
  override def referencedColumns: Seq[String] = indexedColumns
  /** Data-skipping indexes never substitute for the source scan. */
  override def covers(columns: Seq[String]): Boolean = false

  override def build(ctx: IndexBuildContext, source: DataFrame): IndexDescriptor =
    DataSkippingBuild.build(ctx, source, this)
}

/** Serializable sketch definition: kind ∈ {minmax, bloom, valuelist, partition}. */
final case class SketchSpec(
    sketchKind: String,
    expr: String,
    params: Map[String, String] = Map.empty) {
  def columns: Seq[String] = Seq(expr)
}
