package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

/** Nested-column (struct-field path) indexing: flatten at build, resolve
  * `a.b.c` in configs, rewrite filters over struct fields to the flat
  * index columns (reference analogue: util/ResolverUtils.scala:44-104 +
  * SampleNestedData-based covering tests). */
class NestedColumnSpec extends AnyFunSuite {
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

  /** Nested source: (id, meta: struct(geo: struct(country), kind), v). */
  private def withNested[T](body: (Graft, String) => T): T = {
    val sys = Files.createTempDirectory("graft-nc-sys-").toString
    val src = Files.createTempDirectory("graft-nc-src-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    spark.range(0, 1000).toDF("id")
      .withColumn("meta", struct(
        struct(concat(lit("C"), col("id") % 7).as("country")).as("geo"),
        (col("id") % 3).cast("int").as("kind")))
      .withColumn("v", col("id") * 2)
      .repartition(2)
      .write.mode("overwrite").parquet(src)
    try body(new Graft(spark), src)
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  test("config resolution canonicalizes nested paths, case-insensitively") {
    withNested { (_, src) =>
      val df = spark.read.parquet(src)
      val resolved = ColumnResolver.resolveAll(df,
        Seq("META.geo.COUNTRY", "id"))
      assert(resolved == Seq("meta.geo.country", "id"))
      intercept[IllegalArgumentException] {
        ColumnResolver.resolveAll(df, Seq("meta.geo.nope"))
      }
    }
  }

  test("covering index over a nested path: build flattens, filter rewrites") {
    withNested { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("nc_idx", Seq("meta.geo.country"), Seq("v")))
      val e = g.indexManager.getIndexes().head
      assert(e.descriptor.indexedColumns == Seq("meta.geo.country"))
      // physical index schema is flat
      val idxSchema = spark.read.parquet(e.content.filePaths: _*).schema
      assert(idxSchema.fieldNames.contains("__graft_nested__meta__geo__country"),
        idxSchema.treeString)

      val q = spark.read.parquet(src)
        .filter(col("meta.geo.country") === "C3")
        .select(col("v"))
      val paths = indexScanPaths(q)
      assert(paths.exists(_.contains("/nc_idx/")),
        s"nested filter should scan the index; scanned: $paths")

      // results identical with the rule off
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(_.getLong(0)).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q.collect().map(_.getLong(0)).sorted.toSeq
      assert(actual == expected && expected.nonEmpty)
    }
  }

  test("query needing the whole struct is not rewritten") {
    withNested { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("nc_whole", Seq("meta.geo.country"), Seq("v")))
      val q = spark.read.parquet(src)
        .filter(col("meta.geo.country") === "C1")
        .select(col("meta"), col("v")) // whole struct: index can't cover
      assert(!indexScanPaths(q).exists(_.contains("/nc_whole/")))
    }
  }

  test("mixed nested + top-level coverage, nested in the project list") {
    withNested { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("nc_mix", Seq("meta.kind"), Seq("meta.geo.country", "id")))
      val q = spark.read.parquet(src)
        .filter(col("meta.kind") === 1)
        .select(col("meta.geo.country").as("country"), col("id"))
      val paths = indexScanPaths(q)
      assert(paths.exists(_.contains("/nc_mix/")), s"scanned: $paths")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(actual == expected && expected.nonEmpty)
    }
  }

  test("nested index hybrid scan: appended leg computes flattened struct paths") {
    withNested { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("nc_hyb", Seq("meta.geo.country"), Seq("v")))

      // append a small slice with the same nested shape, no refresh
      spark.range(5000, 5100).toDF("id")
        .withColumn("meta", struct(
          struct(concat(lit("C"), col("id") % 7).as("country")).as("geo"),
          (col("id") % 3).cast("int").as("kind")))
        .withColumn("v", col("id") * 2)
        .coalesce(1).write.mode("append").parquet(src)

      val q = spark.read.parquet(src)
        .filter(col("meta.geo.country") === "C3")
        .select(col("v"))
      val paths = indexScanPaths(q)
      assert(paths.exists(_.contains("/nc_hyb/")),
        s"nested hybrid scan should still use the index; scanned: $paths")

      // appended rows (id >= 5000 → v >= 10000) must appear in the result
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(_.getLong(0)).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q.collect().map(_.getLong(0)).sorted.toSeq
      assert(actual == expected && expected.nonEmpty)
      assert(actual.exists(_ >= 10000L),
        "appended rows missing from nested hybrid scan")
    }
  }

  test("whole-struct included column still covers leaf accesses") {
    withNested { (g, src) =>
      // index materializes the ENTIRE struct column; a filter/projection
      // touching meta.kind must still be covered (no flattening needed —
      // the scan outputs the struct attr and GetStructField stays valid)
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("nc_struct", Seq("id"), Seq("meta")))
      val q = spark.read.parquet(src)
        .filter(col("id") < 100L)
        .select(col("meta.kind").as("kind"), col("id"))
      val paths = indexScanPaths(q)
      assert(paths.exists(_.contains("/nc_struct/")),
        s"whole-struct coverage regressed; scanned: $paths")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q.collect().map(r => (r.getInt(0), r.getLong(1))).sorted.toSeq
      assert(actual == expected && expected.nonEmpty)
    }
  }
}
