package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

class AggIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    allNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("groupBy on bucketed index key aggregates without shuffle") {
    val dir = Files.createTempDirectory("graft-agg-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try {
      val g = new Graft(spark)
      val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      g.createIndex(li, CoveringIndexConfig("agg_ci",
        Seq("l_orderkey"), Seq("l_quantity")))

      def q = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))

      assert(graft.index.analysis.PlanAnalysis.appliedIndexes(spark, q)
        .contains("agg_ci"), "agg rewrite did not fire:\n" +
        q.queryExecution.optimizedPlan)
      assert(shuffles(q) == 0,
        "expected shuffle-free bucketed aggregation:\n" +
          q.queryExecution.executedPlan)

      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.collect().map(_.toString).sorted.toSeq == expected)
      assert(expected.nonEmpty)

      // grouping on a superset of bucket keys also avoids the shuffle
      def q2 = li.filter(col("l_quantity") > 0)
        .groupBy(col("l_orderkey"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      assert(shuffles(q2) == 0, q2.queryExecution.executedPlan.toString)

      // grouping on a non-indexed column must NOT claim the rewrite win
      def q3 = li.groupBy(col("l_quantity")).agg(count(lit(1)).as("n"))
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val e3 = q3.collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q3.collect().map(_.toString).sorted.toSeq == e3)
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }
}
