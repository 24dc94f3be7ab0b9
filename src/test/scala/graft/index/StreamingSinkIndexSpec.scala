package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

/**
 * Indexes over a Structured Streaming FILE SINK — the "index the ingest
 * directory" integration a streaming pipeline needs. A parquet stream
 * sink lists its files through `_spark_metadata` (MetadataLogFileIndex,
 * a different FileIndex than a plain directory scan), so this pins:
 *
 *  1. the default source provider recognizes the sink relation and the
 *     index build sees exactly the committed files;
 *  2. new micro-batches = drift; the query hybrid-serves (appended
 *     files folded in) while still scanning the index;
 *  3. incremental refresh folds the new batches and the plan returns to
 *     a pure index scan.
 */
class StreamingSinkIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def usesIndex(df: DataFrame, indexName: String): Boolean =
    graft.index.analysis.PlanAnalysis.appliedIndexes(spark, df)
      .contains(indexName)

  private def runBatch(srcDir: String, sinkDir: String, ckpt: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("l_quantity",
        org.apache.spark.sql.types.DoubleType)))
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("index a streaming parquet sink; drift hybrid-serves; refresh catches up") {
    val sys = Files.createTempDirectory("graft-ssink-sys-").toString
    val srcDir = Files.createTempDirectory("graft-ssink-src-").toString
    val sinkDir = Files.createTempDirectory("graft-ssink-out-").toString
    val ckpt = Files.createTempDirectory("graft-ssink-ckpt-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    try {
      val base = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      // batch 1 into the stream's source dir, drain into the sink
      base.limit(2000).coalesce(2).write.mode("overwrite").parquet(srcDir)
      runBatch(srcDir, sinkDir, ckpt)

      val g = new Graft(spark)
      def sink = spark.read.parquet(sinkDir)
      g.createIndex(sink, CoveringIndexConfig(
        "ssink_idx", Seq("l_orderkey"), Seq("l_quantity")))
      def q = sink.filter(col("l_orderkey") <= 100L)
        .select(col("l_orderkey"), col("l_quantity"))
      assert(usesIndex(q, "ssink_idx"), "sink query should use the index")
      val before = q.count()

      // micro-batch 2 through the SAME checkpoint (a fresh checkpoint
      // would restart at batchId 0, which the sink's exactly-once
      // metadata already holds — the write would be skipped): new source
      // files arrive, AvailableNow drains them as the next batch
      base.limit(200).coalesce(1).write.mode("append").parquet(srcDir)
      runBatch(srcDir, sinkDir, ckpt)

      assert(usesIndex(q, "ssink_idx"),
        "drifted sink should hybrid-serve the index")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q.collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(actual == expected && expected.nonEmpty && q.count() > before)

      // incremental refresh folds the new batch
      g.refreshIndex("ssink_idx", "incremental")
      assert(usesIndex(q, "ssink_idx"))
      assert(q.collect().groupBy(identity).view.mapValues(_.length).toMap
        == expected)
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }
}
