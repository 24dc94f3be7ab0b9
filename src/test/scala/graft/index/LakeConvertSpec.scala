package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, IcebergMeta, IcebergTable}

/**
 * IN-PLACE CONVERSION of plain parquet directories — CONVERT TO DELTA
 * and the Iceberg `migrate` procedure shape: no data moves, one
 * metadata commit, footer stats collected so filtered reads prune from
 * day one, and every table verb works afterwards.
 */
class LakeConvertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten.map(_.metrics("numFiles").value).sum
  }

  test("convert flat parquet dir to Delta: stats skip, DML works, files stay") {
    val dir = tmp("graft-convert-flat-")
    customer.repartition(4).sortWithinPartitions("c_custkey")
      .write.mode("overwrite").parquet(dir)
    // pre-conversion file listing
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val before = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).toSet

    DeltaTable.convert(spark, dir)
    assert(DeltaLog.isDeltaTable(spark, dir))
    assert(DeltaTable.read(spark, dir).count() == customer.count())
    // no files moved or rewritten
    val after = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getPath.getName).toSet
    assert(after == before)
    // footer stats landed → a point read prunes files
    val total = scannedFiles(DeltaTable.read(spark, dir))
    val key = customer.agg(min("c_custkey")).head.getLong(0)
    assert(total == 4)
    assert(scannedFiles(
      DeltaTable.read(spark, dir).filter(col("c_custkey") === key)) < total)
    // the converted table takes DML
    DeltaTable.deleteWhere(spark, dir, col("c_acctbal") < 0)
    assert(DeltaTable.read(spark, dir).count() ==
      customer.filter(col("c_acctbal") >= 0).count())
    // double-convert refuses
    intercept[IllegalArgumentException] { DeltaTable.convert(spark, dir) }
  }

  test("convert hive-partitioned dir to Delta: partition values from paths") {
    val dir = tmp("graft-convert-part-")
    customer.write.mode("overwrite")
      .partitionBy("c_mktsegment").parquet(dir)
    DeltaTable.convert(spark, dir, partitionBy = Seq("c_mktsegment"))
    val back = DeltaTable.read(spark, dir)
    assert(back.count() == customer.count())
    val segs = customer.select("c_mktsegment").distinct.collect().map(_.getString(0))
    segs.foreach { s =>
      assert(back.filter(col("c_mktsegment") === s).count() ==
        customer.filter(col("c_mktsegment") === s).count())
    }
    // partition-scoped optimize works on the converted table
    DeltaTable.optimizeCompact(spark, dir,
      where = Some(col("c_mktsegment") === segs.head))
    assert(DeltaTable.read(spark, dir).count() == customer.count())
  }

  test("iceberg migrate: flat dir in place, appends land beside, hive refuses") {
    val dir = tmp("graft-migrate-")
    customer.repartition(3).write.mode("overwrite").parquet(dir)
    IcebergTable.migrate(spark, dir)
    assert(IcebergMeta.isIcebergTable(spark, dir))
    assert(IcebergTable.read(spark, dir).count() == customer.count())
    // stats collected at migrate time → bounds prune
    val s = IcebergMeta.snapshot(spark, dir)
    assert(s.files.forall(_.stats.nonEmpty))
    // appends land under data/ and the mixed file set reads fine
    IcebergTable.append(customer.limit(30), dir)
    assert(IcebergTable.read(spark, dir).count() == customer.count() + 30)
    // MOR delete over the migrated files
    IcebergTable.deleteWhere(spark, dir, col("c_acctbal") < 0)
    val negatives = customer.filter(col("c_acctbal") < 0).count() +
      customer.limit(30).filter(col("c_acctbal") < 0).count()
    assert(IcebergTable.read(spark, dir).count() ==
      customer.count() + 30 - negatives)

    val hdir = tmp("graft-migrate-hive-")
    customer.write.mode("overwrite").partitionBy("c_mktsegment").parquet(hdir)
    val e = intercept[IllegalArgumentException] {
      IcebergTable.migrate(spark, hdir)
    }
    assert(e.getMessage.contains("hive"))
  }
}
