package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig
import graft.index.dataskipping.{DataSkippingIndexConfig, PartitionSketch, SketchSpec, Sketches}

class PartitionedSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
      .map(_.metrics("numFiles").value).sum
  }

  private def withGraft[T](body: (Graft, String) => T): T = {
    val sys = Files.createTempDirectory("graft-part-sys-").toString
    val src = Files.createTempDirectory("graft-part-src-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    // partitioned by l_returnflag (3 values), 2 files per partition,
    // range-ish on l_orderkey via repartitionByRange within partitions
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .repartitionByRange(2, col("l_orderkey"))
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(src)
    try body(new Graft(spark), src)
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  test("partition sketch is auto-added and translates mixed disjunctions") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, DataSkippingIndexConfig("p_ds",
        Seq(SketchSpec.minMax("l_orderkey"))))
      val d = g.indexManager.getIndexes().head.descriptor
        .asInstanceOf[graft.index.dataskipping.DataSkippingIndexDescriptor]
      assert(d.sketches.exists(s =>
        s.sketchKind == "partition" && s.expr == "l_returnflag"),
        s"partition sketch not auto-added: ${d.sketches}")

      val total = spark.read.parquet(src).inputFiles.length.toLong
      assert(total >= 6)

      // OR mixing partition column and data column: translatable only
      // because the partition sketch covers the left leg
      def mixed = spark.read.parquet(src)
        .filter(col("l_returnflag") === "R" || col("l_orderkey") < 10L)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      assert(scannedFiles(mixed) < total,
        "mixed disjunction should prune files")

      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = mixed.collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(mixed.collect().map(_.toString).sorted.toSeq == expected)
      assert(expected.nonEmpty)
    }
  }

  test("covering index over a partitioned source (exact match)") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, CoveringIndexConfig("p_ci",
        Seq("l_orderkey"), Seq("l_quantity", "l_returnflag")))
      val q = spark.read.parquet(src)
        .filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      assert(graft.index.analysis.PlanAnalysis.appliedIndexes(spark, q)
        .contains("p_ci"))
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.collect().map(_.toString).sorted.toSeq == expected)
      assert(expected.nonEmpty)
    }
  }

  test("hybrid scan over a PARTITIONED source recovers partition values") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, CoveringIndexConfig("p_hyb",
        Seq("l_orderkey"), Seq("l_quantity", "l_returnflag")))

      // append new rows into one partition dir (a new file under
      // l_returnflag=R) — within the 30% hybrid threshold
      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .filter(col("l_returnflag") === "R").limit(200)
        .drop("l_returnflag")
        .coalesce(1).write.mode("append").parquet(s"$src/l_returnflag=R")

      def q = spark.read.parquet(src)
        .filter(col("l_orderkey") <= 100L)
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      assert(graft.index.analysis.PlanAnalysis.appliedIndexes(spark, q)
        .contains("p_hyb"),
        "hybrid scan should apply to the partitioned source after append")

      // partition values of appended rows must be recovered from paths
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.collect().map(_.toString).sorted.toSeq == expected)
      assert(expected.nonEmpty)
      // sanity: some of the appended rows are inside the filter range
      assert(expected.exists(_.contains("R")))
    }
  }
}
