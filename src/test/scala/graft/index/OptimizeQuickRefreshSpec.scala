package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

/** Quick-optimize file-size threshold + quick-refresh metadata delta
  * (reference analogue: actions/OptimizeAction.scala:57-148,
  * actions/RefreshQuickAction.scala:37-80). */
class OptimizeQuickRefreshSpec extends AnyFunSuite {
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
    val sys = Files.createTempDirectory("graft-oq-sys-").toString
    val src = Files.createTempDirectory("graft-oq-src-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .limit(2000).repartition(4)
      .write.mode("overwrite").parquet(src)
    try body(new Graft(spark), src)
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      spark.conf.unset(GraftConf.OptimizeFileSizeThresholdKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def q(src: String) = spark.read.parquet(src)
    .filter(col("l_orderkey") <= 50L)
    .select(col("l_orderkey"), col("l_quantity"))

  test("quick optimize is a no-op when no file is under the threshold") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("oq_noop", Seq("l_orderkey"), Seq("l_quantity")))
      val before = g.indexManager.getIndexes().head
      spark.conf.set(GraftConf.OptimizeFileSizeThresholdKey, "1")
      g.optimizeIndex("oq_noop") // quick is the default mode
      val after = g.indexManager.getIndexes().head
      assert(after.content == before.content,
        "no file under threshold -> content must be untouched")
      assert(after.properties.get("dataVersion") ==
        before.properties.get("dataVersion"))
    }
  }

  test("quick optimize compacts only small files; large files stay in place") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("oq_part", Seq("l_orderkey"), Seq("l_quantity")))
      val before = g.indexManager.getIndexes().head
      val sizes = before.content.files.map(_.size).sorted
      assert(sizes.size > 2, s"need several bucket files, got ${sizes.size}")
      // threshold between the smallest and largest file sizes: some files
      // compact, some must remain untouched at their original paths
      val threshold = sizes(sizes.size / 2)
      val expectKept = before.content.files.filter(_.size >= threshold)
      val expectSmall = before.content.files.filter(_.size < threshold)
      assert(expectKept.nonEmpty && expectSmall.nonEmpty,
        s"degenerate size split: $sizes, threshold $threshold")

      spark.conf.set(GraftConf.OptimizeFileSizeThresholdKey, threshold.toString)
      g.optimizeIndex("oq_part")
      val after = g.indexManager.getIndexes().head

      // untouched large files are still referenced at their old paths
      val afterPaths = after.content.filePaths.toSet
      assert(expectKept.forall(f => afterPaths.contains(f.path)),
        "large files must remain in content at their original paths")
      // compacted replacements live in a NEW version dir
      assert(expectSmall.forall(f => !afterPaths.contains(f.path)),
        "small files must have been rewritten")
      assert(after.content.root != before.content.root)

      // no rows lost, index still applied, results still correct
      assert(spark.read.parquet(after.content.filePaths: _*).count() ==
        spark.read.parquet(src).count())
      assert(indexScanPaths(q(src)).exists(_.contains("/oq_part/")))
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(actual == expected && expected.nonEmpty)
    }
  }

  test("full optimize rewrites everything regardless of threshold") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("oq_full", Seq("l_orderkey"), Seq("l_quantity")))
      val before = g.indexManager.getIndexes().head
      spark.conf.set(GraftConf.OptimizeFileSizeThresholdKey, "1")
      g.optimizeIndex("oq_full", "full")
      val after = g.indexManager.getIndexes().head
      assert(after.content.root != before.content.root)
      assert(after.content.filePaths.forall(_.contains(after.content.root)))
    }
  }

  test("quick refresh re-baselines the hybrid-scan staleness thresholds") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("qr_idx", Seq("l_orderkey"), Seq("l_quantity")))
      assert(indexScanPaths(q(src)).exists(_.contains("/qr_idx/")))

      // append ~100% more bytes — far beyond maxAppendedRatio (0.3):
      // the index must stop being applied
      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .limit(2000).select(spark.read.parquet(src).columns.map(col): _*)
        .coalesce(2).write.mode("append").parquet(src)
      assert(!indexScanPaths(q(src)).exists(_.contains("/qr_idx/")),
        "index should be rejected: appended drift exceeds the threshold")

      // quick refresh: metadata-only blessing of the delta
      g.refreshIndex("qr_idx", "quick")
      val e = g.indexManager.getIndexes().head
      assert(e.update.exists(_.appended.nonEmpty), "delta must be recorded")

      // hybrid scan applies again (index + appended files), results exact
      val paths = indexScanPaths(q(src))
      assert(paths.exists(_.contains("/qr_idx/")),
        s"index should be applied after quick refresh; scanned: $paths")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(actual == expected && expected.nonEmpty)

      // a further SMALL append stays within the re-baselined threshold
      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .limit(100).select(spark.read.parquet(src).columns.map(col): _*)
        .coalesce(1).write.mode("append").parquet(src)
      assert(indexScanPaths(q(src)).exists(_.contains("/qr_idx/")),
        "small post-blessing drift must still be within thresholds")
    }
  }

  test("vacuum keeps version dirs referenced by spanning content") {
    withGraft { (g, src) =>
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("oq_vac", Seq("l_orderkey"), Seq("l_quantity")))
      val before = g.indexManager.getIndexes().head
      val sizes = before.content.files.map(_.size).sorted
      spark.conf.set(GraftConf.OptimizeFileSizeThresholdKey,
        sizes(sizes.size / 2).toString)
      g.optimizeIndex("oq_vac") // quick: content now spans v__0 and v__1
      val spanning = g.indexManager.getIndexes().head
      val dirs = spanning.content.filePaths
        .map(p => new org.apache.hadoop.fs.Path(p).getParent.getName).toSet
      assert(dirs.size == 2, s"expected spanning content, got $dirs")

      g.vacuumIndex("oq_vac") // must NOT delete the still-referenced old dir
      val fs = g.indexManager.indexRoot("oq_vac")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val live = fs.listStatus(g.indexManager.indexRoot("oq_vac"))
        .map(_.getPath.getName).filter(_.startsWith("v__")).toSet
      assert(dirs.subsetOf(live), s"vacuum deleted referenced dirs: $live")
      // ...but the compacted-away small files inside the kept dir must be
      // physically reclaimed (file-granular cleanup, no storage leak)
      val v0Files = fs.listStatus(new org.apache.hadoop.fs.Path(
          g.indexManager.indexRoot("oq_vac"), "v__0"))
        .map(_.getPath.toString)
        .filterNot(p => p.contains("/_") || p.contains("/."))
        .toSet
      assert(v0Files.subsetOf(spanning.content.filePaths.toSet),
        s"superseded small files leaked in v__0: " +
          s"${v0Files.diff(spanning.content.filePaths.toSet)}")
      assert(indexScanPaths(q(src)).exists(_.contains("/oq_vac/")))

      // full optimize consolidates; vacuum now drops the old dirs
      g.optimizeIndex("oq_vac", "full")
      g.vacuumIndex("oq_vac")
      val after = fs.listStatus(g.indexManager.indexRoot("oq_vac"))
        .map(_.getPath.getName).filter(_.startsWith("v__")).toSet
      assert(after.size == 1, s"expected one live dir, got $after")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q(src).collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(actual == expected && expected.nonEmpty)
    }
  }
}
