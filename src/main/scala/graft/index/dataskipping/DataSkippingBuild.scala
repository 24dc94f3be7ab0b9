package graft.index.dataskipping

import org.apache.spark.sql.DataFrame

import graft.index.{IndexBuildContext, IndexDescriptor}

object DataSkippingBuild {
  def build(ctx: IndexBuildContext, source: DataFrame,
      d: DataSkippingIndexDescriptor): IndexDescriptor =
    throw new UnsupportedOperationException(
      "data-skipping build lands with the data-skipping milestone")
}
