package graft.index.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.IndexLogEntry

/**
 * Min-max distribution analysis of an index's data files for one column
 * (reference: util/MinMaxAnalysisUtil.scala): per data file, the column's
 * [min,max] envelope plus how many other files overlap it. A
 * well-clustered index (z-order / sorted buckets) shows few overlaps —
 * i.e. point/range queries touch few files; heavy overlap means filters
 * can't skip anything.
 */
object MinMaxAnalysis {

  /** One row per index data file: (file, min, max, n_overlaps). */
  def analyzeIndexFiles(spark: SparkSession, entry: IndexLogEntry,
      column: String): DataFrame = {
    val data = spark.read.parquet(entry.content.filePaths: _*)
    require(data.columns.exists(_.equalsIgnoreCase(column)),
      s"column '$column' not in index '${entry.name}' " +
        s"(has ${data.columns.mkString(",")})")
    val perFile = data
      .groupBy(input_file_name().as("file"))
      .agg(min(col(column)).as("min_value"), max(col(column)).as("max_value"))
    perFile.as("a")
      .join(perFile.as("b"),
        col("a.file") =!= col("b.file") &&
          col("a.min_value") <= col("b.max_value") &&
          col("b.min_value") <= col("a.max_value"),
        "left_outer")
      .groupBy(col("a.file").as("file"),
        col("a.min_value").as("min_value"),
        col("a.max_value").as("max_value"))
      .agg(count(col("b.file")).as("n_overlaps"))
      .orderBy(col("min_value"), col("file"))
  }
}
