package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.zorder.ZOrderIndexConfig

class MinMaxAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("z-order index shows bounded per-file envelopes") {
    val dir = Files.createTempDirectory("graft-mma-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    spark.conf.set("spark.graft.index.zorder.numPartitions", "4")
    try {
      val g = new Graft(spark)
      val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      g.createIndex(li, ZOrderIndexConfig("mma_zo", Seq("l_orderkey")))
      val report = g.analyzeIndexDistribution("mma_zo").collect()
      assert(report.length > 1, "expected multiple data files")
      assert(report.forall(_.schema.fieldNames.toSeq ==
        Seq("file", "min_value", "max_value", "n_overlaps")))
      // 1-dim z-order == range sort: files should barely overlap
      val overlaps = report.map(_.getAs[Long]("n_overlaps"))
      assert(overlaps.sum <= report.length.toLong,
        s"1-dim z-order should have ~disjoint files, overlaps=${overlaps.toSeq}")
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      spark.conf.unset("spark.graft.index.zorder.numPartitions")
      rules.IndexCatalog.invalidate(spark)
    }
  }
}
