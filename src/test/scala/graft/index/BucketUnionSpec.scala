package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.execution.BucketUnionExec
import graft.index.covering.CoveringIndexConfig

class BucketUnionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def executed(df: DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
  }

  test("join hybrid scan: appended slice via BucketUnion, index side unshuffled") {
    val sys = Files.createTempDirectory("graft-bu-sys-").toString
    val srcLi = Files.createTempDirectory("graft-bu-li-").toString
    val srcOrd = Files.createTempDirectory("graft-bu-ord-").toString
    spark.conf.set(GraftConf.SystemPathKey, sys)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .write.mode("overwrite").parquet(srcLi)
      spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
        .write.mode("overwrite").parquet(srcOrd)

      val g = new Graft(spark)
      g.createIndex(spark.read.parquet(srcLi),
        CoveringIndexConfig("bu_li", Seq("l_orderkey"), Seq("l_quantity")))
      g.createIndex(spark.read.parquet(srcOrd),
        CoveringIndexConfig("bu_ord", Seq("o_orderkey"), Seq("o_totalprice")))

      // append a small slice to lineitem → left side goes hybrid
      val liCols = spark.read.parquet(srcLi).columns
      spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .limit(200).select(liCols.map(col): _*)
        .coalesce(1).write.mode("append").parquet(srcLi)

      val li = spark.read.parquet(srcLi)
      val ord = spark.read.parquet(srcOrd)
      def query = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))

      val nodes = executed(query)
      assert(nodes.exists(_.isInstanceOf[BucketUnionExec]),
        "expected BucketUnionExec in plan:\n" + query.queryExecution.executedPlan)
      // exactly one shuffle: the appended slice repartition; neither
      // join input is fully re-shuffled
      val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(shuffles == 1,
        s"expected 1 shuffle (appended slice), got $shuffles:\n" +
          query.queryExecution.executedPlan)

      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = query.collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = query.collect().map(_.toString).sorted.toSeq
      assert(actual == expected && expected.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }
}
