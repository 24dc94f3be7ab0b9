package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Sorted bucketed-scan ordering claims: covering indexes are written
 * bucketed AND sorted with one file per bucket, so with
 * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (set by
 * GraftSession) the swapped-in scans report their sort order and the
 * per-leg SortExec under a bucketed sort-merge join disappears — at
 * 100 TB that is a full sort pass of the fact per join leg. Spark
 * itself verifies the ≤1-file-per-bucket invariant before claiming, so
 * multi-file legs (post-refresh, hybrid) keep their Sort.
 */
class SortedIndexScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def bucketedJoin(): DataFrame = {
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val ord = graft.Tables.load(spark, TestSpark.sfDir, "orders")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("o_totalprice"))
  }

  test("bucketed SMJ legs carry NO SortExec: the sorted index layout " +
      "satisfies the join's ordering straight off the scan") {
    graft.queries.IndexAccel.ensureCorpus(spark, TestSpark.sfDir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = bucketedJoin().queryExecution.executedPlan
      val smj = allNodes(p).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a bucketed sort-merge join:\n$p")
      assert(!allNodes(p).exists(_.isInstanceOf[SortExec]),
        s"a SortExec survived over the sorted bucketed scans:\n$p")
      // and the result is still correctly joined
      assert(bucketedJoin().count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("the claim degrades safely: with the legacy flag off, the Sort " +
      "returns and results are identical") {
    graft.queries.IndexAccel.ensureCorpus(spark, TestSpark.sfDir)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val expected = try {
      val withClaim = bucketedJoin()
        .orderBy(col("l_orderkey"), col("l_extendedprice")).collect()
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        "false")
      val p = bucketedJoin().queryExecution.executedPlan
      assert(allNodes(p).exists(_.isInstanceOf[SortExec]),
        s"expected the explicit Sort with the claim disabled:\n$p")
      val without = bucketedJoin()
        .orderBy(col("l_orderkey"), col("l_extendedprice")).collect()
      (withClaim.toSeq, without.toSeq)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
        "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    assert(expected._1 == expected._2)
  }
}
