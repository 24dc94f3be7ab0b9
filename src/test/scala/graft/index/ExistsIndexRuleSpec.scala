package graft.index

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * ExistsIndexRule edges the qds35 audit doesn't reach: the IN-subquery
 * path, NOT EXISTS (→ LeftAnti), and partial eligibility (inner-only
 * swap when no outer index covers). Every leg also asserts RESULT
 * equality with the rule disabled — the swap must never change rows.
 */
class ExistsIndexRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val corpusReady: Boolean = {
    graft.queries.IndexAccel.ensureCorpus(spark, TestSpark.sfDir)
    graft.Tables.load(spark, TestSpark.sfDir, "customer")
      .createOrReplaceTempView("eir_customer")
    graft.Tables.load(spark, TestSpark.sfDir, "orders")
      .createOrReplaceTempView("eir_orders")
    true
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def indexScans(p: SparkPlan): Seq[String] =
    allNodes(p).collect { case s: FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
      .filter(_.contains("graft_accel"))

  private def zeroShuffleJoins(p: SparkPlan): Seq[SortMergeJoinExec] =
    allNodes(p).collect {
      case j: SortMergeJoinExec
          if j.children.forall(c =>
            !allNodes(c).exists(_.isInstanceOf[ShuffleExchangeExec])) => j
    }

  private def planAndRows(sql: String): (SparkPlan, Seq[org.apache.spark.sql.Row]) = {
    assert(corpusReady)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(sql)
      val plan = df.queryExecution.executedPlan
      val accel = df.collect().toSeq
      val plain =
        try {
          spark.conf.set(GraftConf.ApplyEnabledKey, "false")
          spark.sql(sql).collect().toSeq
        } finally spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(accel == plain, "the subquery swap changed the result")
      (plan, accel)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IN (SELECT ...) pairs positionally and both sides ride the buckets") {
    val (p, rows) = planAndRows(
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM eir_customer
        |WHERE c_custkey IN (SELECT o_custkey FROM eir_orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(rows.nonEmpty)
    val idx = indexScans(p)
    assert(idx.exists(_.contains("accel_ci_cust_full")),
      s"outer not index-served: $idx\n$p")
    assert(idx.exists(_.contains("accel_ci_ord_prio")),
      s"IN probe not index-served: $idx\n$p")
    assert(zeroShuffleJoins(p).nonEmpty, s"IN semi join re-shuffled:\n$p")
  }

  test("NOT EXISTS becomes a bucketed zero-shuffle anti join") {
    val (p, rows) = planAndRows(
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
        |FROM eir_customer
        |WHERE NOT EXISTS (SELECT 1 FROM eir_orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(rows.nonEmpty)
    val anti = allNodes(p).collect {
      case j: SortMergeJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty, s"expected a LeftAnti:\n$p")
    assert(zeroShuffleJoins(p).nonEmpty, s"anti join re-shuffled:\n$p")
    assert(indexScans(p).exists(_.contains("accel_ci_ord_prio")),
      s"probe not index-served:\n$p")
  }

  test("partial eligibility: an uncoverable outer still gets the inner swap") {
    assert(corpusReady)
    // a computed outer column no covering index can serve — the outer
    // stays raw, but the probe side must still serve from its index
    // (that side's exchange hashes bucketed data, halving the IO)
    val (p, rows) = planAndRows(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT c_custkey, c_acctbal * 2 AS doubled FROM eir_customer) t
        |WHERE c_custkey IN (SELECT o_custkey FROM eir_orders
        |                    WHERE o_orderpriority = '5-LOW')
        |  AND doubled > 0""".stripMargin)
    assert(rows.head.getLong(0) > 0)
    assert(indexScans(p).exists(_.contains("accel_ci_ord_prio")),
      s"inner-only swap missing:\n$p")
  }
}
