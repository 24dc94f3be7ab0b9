package graft.index.dataskipping

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.{IndexBuildContext, IndexDescriptor}

/**
 * Data-skipping index build: one row per source file holding the sketch
 * aggregates (reference: index/dataskipping/DataSkippingIndex.scala:291-317).
 *
 * Shape: `groupBy(input_file_name())` — a single shuffle with #files
 * groups, partial aggregation on the scan side — then a broadcast join of
 * the tiny (path → fileId) mapping. Output is repartitioned by row count
 * so index files stay bounded (~100k file-rows per output file) at any
 * source scale.
 */
object DataSkippingBuild {

  val PathColumn = "_graft_path"

  def build(ctx: IndexBuildContext, source: DataFrame,
      d: DataSkippingIndexDescriptor): IndexDescriptor = {
    val spark = ctx.spark
    import spark.implicits._

    val sketches = Sketches.fromSpecs(d.sketches)
    val aggs = sketches.flatMap(_.aggregates(source))
    val normalize = udf((s: String) => new org.apache.hadoop.fs.Path(s).toString)

    val grouped = source
      .groupBy(normalize(input_file_name()).as(PathColumn))
      .agg(aggs.head, aggs.tail: _*)

    val mapping = ctx.tracker.all.toSeq
      .map { case ((p, _, _), id) => (p, id) }
      .toDF(PathColumn, Sketches.FileIdColumn)

    val joined = grouped
      .join(broadcast(mapping), PathColumn)
      .drop(PathColumn)
      .select(col(Sketches.FileIdColumn) +:
        sketches.flatMap(_.outputColumns).map(col): _*)

    val numFiles = ctx.tracker.all.size
    val outParts = math.max(1, numFiles / 100000)
    joined.repartition(outParts).write.mode("overwrite").parquet(ctx.dataPath)

    val schema = spark.read.parquet(ctx.dataPath).schema
    d.copy(schemaJson = schema.json)
  }
}
