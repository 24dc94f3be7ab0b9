package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable}

/**
 * ANALYZE (stats backfill): a table whose log carries no `add.stats`
 * (minimal external writers) gains them in one dataChange=false
 * commit — footer reads only, no row scans — and filtered reads start
 * pruning files.
 */
class DeltaAnalyzeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten.map(_.metrics("numFiles").value).sum
  }

  /** A Delta table written the way a MINIMAL external writer would:
    * parquet files + a hand-written v0 commit with stat-less adds. */
  private def statlessTable(): String = {
    val dir = Files.createTempDirectory("graft-analyze-").toString
    customer.repartition(4).sortWithinPartitions("c_custkey")
      .write.mode("overwrite").parquet(dir)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val adds = files.map { st =>
      s"""{"add":{"path":"${st.getPath.getName}","partitionValues":{},""" +
        s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
        s""""dataChange":true}}"""
    }
    val schemaJson = customer.schema.json
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val log =
      (s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""" ::
        (s"""{"metaData":{"id":"t","format":{"provider":"parquet",""" +
          s""""options":{}},"schemaString":"$schemaJson",""" +
          s""""partitionColumns":[],"configuration":{}}}""") ::
        adds.toList).mkString("", "\n", "\n")
    fs.mkdirs(new Path(dir, "_delta_log"))
    val out = fs.create(new Path(dir, "_delta_log/00000000000000000000.json"), false)
    try out.write(log.getBytes(StandardCharsets.UTF_8)) finally out.close()
    dir
  }

  test("computeStats backfills footer stats; point reads then prune") {
    val dir = statlessTable()
    assert(DeltaLog.snapshot(spark, dir).files.forall(_.stats.isEmpty))
    assert(DeltaTable.read(spark, dir).count() == customer.count())
    val key = customer.agg(min("c_custkey")).head.getLong(0)
    val total = scannedFiles(DeltaTable.read(spark, dir))
    assert(total == 4)
    // no stats → no pruning
    assert(scannedFiles(
      DeltaTable.read(spark, dir).filter(col("c_custkey") === key)) == total)

    val v = DeltaTable.computeStats(spark, dir)
    assert(v == 1L)
    val s = DeltaLog.snapshot(spark, dir)
    assert(s.files.forall(_.stats.nonEmpty))
    assert(s.files.size == 4)
    // content unchanged, feed-silent (dataChange=false), pruning live
    assert(DeltaTable.read(spark, dir).count() == customer.count())
    assert(scannedFiles(
      DeltaTable.read(spark, dir).filter(col("c_custkey") === key)) < total)
    // idempotent: nothing lacks stats now
    assert(DeltaTable.computeStats(spark, dir) == 1L)
  }
}
