package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig
import graft.index.dataskipping.{DataSkippingIndexConfig, SketchSpec}

/** Hybrid scan + incremental refresh + optimize (reference analogue:
  * index/HybridScanSuite.scala, actions/RefreshActionTest.scala,
  * actions/OptimizeActionTest.scala). */
class RefreshHybridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def indexScanPaths(df: DataFrame): Seq[String] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  private def withGraft[T](body: (Graft, String) => T): T = {
    val sys = Files.createTempDirectory("graft-rh-sys-").toString
    val src = Files.createTempDirectory("graft-rh-src-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .limit(2000).repartition(4)
      .write.mode("overwrite").parquet(src)
    try body(new Graft(spark), src)
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def q(src: String) = spark.read.parquet(src)
    .filter(col("l_orderkey") <= 50L)
    .select(col("l_orderkey"), col("l_quantity"))

  test("hybrid scan: appended files are unioned in, results stay correct") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("h_app", Seq("l_orderkey"), Seq("l_quantity")))
      assert(indexScanPaths(q(src)).exists(_.contains("/h_app/")))

      // append a small slice (< 30% of bytes)
      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .limit(100).select(col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
        .coalesce(1).write.mode("append").parquet(src)

      val paths = indexScanPaths(q(src))
      assert(paths.exists(_.contains("/h_app/")),
        s"hybrid scan should still use the index; scanned: $paths")

      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(actual == expected && expected.nonEmpty)
    }
  }

  test("hybrid scan with deleted files uses lineage filter") {
    withGraft { (g, src) =>
      spark.conf.set(GraftConf.LineageKey, "true")
      try {
        g.createIndex(spark.read.parquet(src),
          CoveringIndexConfig("h_del", Seq("l_orderkey"), Seq("l_quantity")))

        // delete one of the 4 source files (< 20% of bytes is not
        // guaranteed with 4 equal files → raise the threshold)
        spark.conf.set(GraftConf.HybridMaxDeletedKey, "0.3")
        val fs = new org.apache.hadoop.fs.Path(src)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val dataFile = fs.listStatus(new org.apache.hadoop.fs.Path(src))
          .map(_.getPath).filter(_.getName.startsWith("part-")).head
        fs.delete(dataFile, false)

        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
        spark.conf.set(GraftConf.ApplyEnabledKey, "true")
        val paths = indexScanPaths(q(src))
        assert(paths.exists(_.contains("/h_del/")),
          s"hybrid scan should use the index after delete; scanned: $paths")
        val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
        assert(actual == expected && expected.nonEmpty)
      } finally {
        spark.conf.unset(GraftConf.LineageKey)
        spark.conf.unset(GraftConf.HybridMaxDeletedKey)
      }
    }
  }

  test("z-order hybrid scan with deleted files uses lineage filter") {
    withGraft { (g, src) =>
      spark.conf.set(GraftConf.LineageKey, "true")
      spark.conf.set("spark.graft.index.zorder.numPartitions", "4")
      try {
        g.createIndex(spark.read.parquet(src),
          graft.index.zorder.ZOrderIndexConfig(
            "zh_del", Seq("l_orderkey"), Seq("l_quantity")))
        assert(indexScanPaths(q(src)).exists(_.contains("/zh_del/")))

        // delete one of the 4 source files, no refresh
        spark.conf.set(GraftConf.HybridMaxDeletedKey, "0.3")
        val fs = new org.apache.hadoop.fs.Path(src)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val dataFile = fs.listStatus(new org.apache.hadoop.fs.Path(src))
          .map(_.getPath).filter(_.getName.startsWith("part-")).head
        fs.delete(dataFile, false)

        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
        spark.conf.set(GraftConf.ApplyEnabledKey, "true")
        val paths = indexScanPaths(q(src))
        assert(paths.exists(_.contains("/zh_del/")),
          s"z-order hybrid scan should use the index after delete; scanned: $paths")
        val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
        assert(actual == expected && expected.nonEmpty)
      } finally {
        spark.conf.unset(GraftConf.LineageKey)
        spark.conf.unset(GraftConf.HybridMaxDeletedKey)
        spark.conf.unset("spark.graft.index.zorder.numPartitions")
      }
    }
  }

  test("incremental refresh folds appended and deleted files into the index") {
    withGraft { (g, src) =>
      spark.conf.set(GraftConf.LineageKey, "true")
      try {
        g.createIndex(spark.read.parquet(src),
          CoveringIndexConfig("r_inc", Seq("l_orderkey"), Seq("l_quantity")))
        val v0 = g.indexManager.getIndexes().head.content.root

        // mutate source: drop one file, append new rows
        val fs = new org.apache.hadoop.fs.Path(src)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val dataFile = fs.listStatus(new org.apache.hadoop.fs.Path(src))
          .map(_.getPath).filter(_.getName.startsWith("part-")).head
        fs.delete(dataFile, false)
        spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
          .limit(500).select(spark.read.parquet(src).columns.map(col): _*)
          .coalesce(1).write.mode("append").parquet(src)

        g.refreshIndex("r_inc", "incremental")
        val e = g.indexManager.getIndexes().head
        assert(e.content.root != v0)

        // index matches the new source exactly → plain index scan again
        val paths = indexScanPaths(q(src))
        assert(paths.exists(_.contains("/r_inc/")))
        // index row count equals current source row count
        val idxCount = spark.read.parquet(e.content.root).count()
        assert(idxCount == spark.read.parquet(src).count())

        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
        spark.conf.set(GraftConf.ApplyEnabledKey, "true")
        val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
        assert(actual == expected && expected.nonEmpty)
      } finally spark.conf.unset(GraftConf.LineageKey)
    }
  }

  test("incremental refresh of data-skipping index") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        DataSkippingIndexConfig("r_ds", Seq(SketchSpec.minMax("l_orderkey"))))
      val before = g.indexManager.getIndexes().head

      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .limit(300).select(spark.read.parquet(src).columns.map(col): _*)
        .coalesce(1).write.mode("append").parquet(src)

      g.refreshIndex("r_ds", "incremental")
      val after = g.indexManager.getIndexes().head
      // append-only refresh runs in merge mode: content spans version dirs
      val rows = spark.read.parquet(after.content.filePaths: _*).count()
      // one sketch row per current source file
      assert(rows == spark.read.parquet(src).inputFiles.length)
      assert(rows == before.relations.head.files.size + 1)
    }
  }

  test("optimize compacts covering index to one file per bucket") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("opt_ci", Seq("l_orderkey"), Seq("l_quantity")))
      g.optimizeIndex("opt_ci")
      val e = g.indexManager.getIndexes().head
      val buckets = e.descriptor
        .asInstanceOf[graft.index.covering.CoveringIndexDescriptor].numBuckets
      assert(e.content.files.size <= buckets)
      assert(spark.read.parquet(e.content.root).count() ==
        spark.read.parquet(src).count())
      // still usable by the optimizer
      assert(indexScanPaths(q(src)).exists(_.contains("/opt_ci/")))
    }
  }
}
