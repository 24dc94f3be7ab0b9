package graft.index.zorder

import org.apache.spark.sql.DataFrame

import graft.index.{IndexBuildContext, IndexDescriptor}

object ZOrderBuild {
  def build(ctx: IndexBuildContext, source: DataFrame,
      d: ZOrderIndexDescriptor): IndexDescriptor =
    throw new UnsupportedOperationException(
      "z-order build lands with the z-order milestone")
}
