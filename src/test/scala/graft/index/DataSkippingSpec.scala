package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.dataskipping.{DataSkippingIndexConfig, SketchSpec}

class DataSkippingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  /** (files actually scanned, total rows) for an executed query. */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    scans.map(_.metrics("numFiles").value).sum
  }

  private def withGraft[T](body: (Graft, String) => T): T = {
    val sys = Files.createTempDirectory("graft-ds-sys-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    val src = Files.createTempDirectory("graft-ds-src-").toString
    // 8 range-partitioned files on l_orderkey so minmax pruning bites
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .repartitionByRange(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(src)
    try body(new Graft(spark), src)
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  test("minmax sketch prunes files for point and range filters") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, DataSkippingIndexConfig("ds_mm",
        Seq(SketchSpec.minMax("l_orderkey"))))

      val total = spark.read.parquet(src).inputFiles.length.toLong
      assert(total == 8, s"expected 8 source files, got $total")

      val point = spark.read.parquet(src)
        .filter(col("l_orderkey") === 1L)
      assert(scannedFiles(point) < total,
        "point filter should scan fewer files than total")

      // parity with non-indexed run
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(src)
        .filter(col("l_orderkey") === 1L).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(point.count() == expected && expected > 0)

      val range = spark.read.parquet(src)
        .filter(col("l_orderkey") < 100L)
      assert(scannedFiles(range) < total)
    }
  }

  test("bloom sketch prunes files for equality and IN filters") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, DataSkippingIndexConfig("ds_bf",
        Seq(SketchSpec.bloom("l_orderkey", expectedItems = 10000))))

      val total = spark.read.parquet(src).inputFiles.length.toLong
      val q = spark.read.parquet(src).filter(col("l_orderkey") === 1L)
      assert(scannedFiles(q) < total)

      val qIn = spark.read.parquet(src)
        .filter(col("l_orderkey").isin(1L, 2L, 3L))
      assert(scannedFiles(qIn) < total)

      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(src)
        .filter(col("l_orderkey").isin(1L, 2L, 3L)).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(qIn.count() == expected && expected > 0)
    }
  }

  test("conjunction with untranslatable leg still prunes; disjunction needs both") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, DataSkippingIndexConfig("ds_mix",
        Seq(SketchSpec.minMax("l_orderkey"))))
      val total = spark.read.parquet(src).inputFiles.length.toLong

      // AND: l_orderkey translatable, l_comment-ish leg not → still prunes
      val qAnd = spark.read.parquet(src)
        .filter(col("l_orderkey") === 1L && col("l_quantity") > 0.0)
      assert(scannedFiles(qAnd) < total)

      // OR with untranslatable side → no pruning, but still correct
      val qOr = spark.read.parquet(src)
        .filter(col("l_orderkey") === 1L || col("l_quantity") < 0.0)
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(src)
        .filter(col("l_orderkey") === 1L || col("l_quantity") < 0.0).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(qOr.count() == expected)
    }
  }

  test("large IN list uses sorted lower-bound translation correctly") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, DataSkippingIndexConfig("ds_inset",
        Seq(SketchSpec.minMax("l_orderkey"))))
      val keys = (1L to 20L) ++ Seq(100000L)
      val q = spark.read.parquet(src).filter(col("l_orderkey").isin(keys: _*))
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(src)
        .filter(col("l_orderkey").isin(keys: _*)).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.count() == expected && expected > 0)
      val total = spark.read.parquet(src).inputFiles.length.toLong
      assert(scannedFiles(
        spark.read.parquet(src).filter(col("l_orderkey").isin(keys: _*))) < total)
    }
  }

  test("string minmax sketch works") {
    withGraft { (g, src) =>
      val sys2 = Files.createTempDirectory("graft-ds-str-").toString
      spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
        .repartitionByRange(4, col("o_orderpriority"))
        .write.mode("overwrite").parquet(sys2)
      val df = spark.read.parquet(sys2)
      g.createIndex(df, DataSkippingIndexConfig("ds_str",
        Seq(SketchSpec.minMax("o_orderpriority"))))
      val q = spark.read.parquet(sys2)
        .filter(col("o_orderpriority") === "1-URGENT")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(sys2)
        .filter(col("o_orderpriority") === "1-URGENT").count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.count() == expected && expected > 0)
      assert(scannedFiles(
        spark.read.parquet(sys2).filter(col("o_orderpriority") === "1-URGENT")) < 4)
    }
  }

  test("valuelist sketch prunes equality, IN, and range filters") {
    withGraft { (g, src) =>
      val df = spark.read.parquet(src)
      g.createIndex(df, DataSkippingIndexConfig("ds_vl",
        Seq(SketchSpec.valueList("l_returnflag", maxValues = 10),
          SketchSpec.valueList("l_orderkey", maxValues = 100))))
      val total = spark.read.parquet(src).inputFiles.length.toLong

      // l_orderkey has >100 distinct per file → sketch null → no pruning
      // but still correct; l_returnflag has 3 values → exact list
      val q = spark.read.parquet(src)
        .filter(col("l_returnflag") === "ZZZ") // matches nothing anywhere
      assert(scannedFiles(q) == 0 || q.count() == 0)

      val qRange = spark.read.parquet(src).filter(col("l_orderkey") < 100L)
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(src)
        .filter(col("l_orderkey") < 100L).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(qRange.count() == expected && expected > 0)

      val qIn = spark.read.parquet(src)
        .filter(col("l_returnflag").isin("R", "A"))
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expectedIn = spark.read.parquet(src)
        .filter(col("l_returnflag").isin("R", "A")).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(qIn.count() == expectedIn && expectedIn > 0)
    }
  }

  test("SortedArrayLowerBound expression: eval and codegen agree") {
    import graft.index.dataskipping.expressions.SortedArrayUtils
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.LongType
    val arr = new GenericArrayData(Array[Any](10L, 20L, 30L))
    assert(SortedArrayUtils.lowerBound(arr, 5L, LongType) == 0)
    assert(SortedArrayUtils.lowerBound(arr, 10L, LongType) == 0)
    assert(SortedArrayUtils.lowerBound(arr, 11L, LongType) == 1)
    assert(SortedArrayUtils.lowerBound(arr, 30L, LongType) == 2)
    assert(SortedArrayUtils.lowerBound(arr, 31L, LongType) == -1)
  }

  test("valuelist range filter survives ANSI mode over an all-null file") {
    // An all-null sketched column yields an EMPTY value list for that
    // file; ElementAt on it would throw under spark.sql.ansi.enabled
    // during the (lazy, scan-time) pruning query. The CaseWhen guard must
    // instead prune the file (provably no non-null values).
    val sys = Files.createTempDirectory("graft-ds-ansi-sys-").toString
    val src = Files.createTempDirectory("graft-ds-ansi-src-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      import spark.implicits._
      // file A: values 1..100; file B: all nulls
      (1L to 100L).map(i => (i, Some(i))).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(src)
      Seq.fill(50L.toInt)((0L, None: Option[Long]))
        .zipWithIndex.map { case ((_, v), i) => (200L + i, v) }
        .toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(src)

      val g = new Graft(spark)
      g.createIndex(spark.read.parquet(src),
        DataSkippingIndexConfig("ds_ansi",
          Seq(SketchSpec.valueList("v", maxValues = 1000))))

      val q = spark.read.parquet(src).filter(col("v") < 10L)
      // must not throw, must prune the all-null file, must be correct
      assert(scannedFiles(q) == 1L, "all-null file should be pruned")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.parquet(src).filter(col("v") < 10L).count()
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.count() == expected && expected == 9L)
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }
}
