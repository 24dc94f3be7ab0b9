package graft.index.zorder

import org.apache.spark.sql.DataFrame

import graft.index.{IndexBuildContext, IndexDescriptor}

/**
 * Z-order covering index descriptor (reference:
 * index/zordercovering/ZOrderCoveringIndex.scala:32-189). Placeholder —
 * build lands with the z-order milestone.
 */
final case class ZOrderIndexDescriptor(
    indexedColumns: Seq[String],
    includedColumns: Seq[String],
    numPartitions: Int,
    schemaJson: String) extends IndexDescriptor {

  override def kind: String = "ZOrderCoveringIndex"
  override def kindAbbr: String = "ZCI"
  override def referencedColumns: Seq[String] = indexedColumns ++ includedColumns
  override def covers(columns: Seq[String]): Boolean =
    columns.forall(c => referencedColumns.exists(_.equalsIgnoreCase(c)))

  override def build(ctx: IndexBuildContext, source: DataFrame): IndexDescriptor =
    ZOrderBuild.build(ctx, source, this)
}
