package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

/** End-to-end tests of the transparent query-rewrite rules (reference
  * analogue: index/E2EHyperspaceRulesTest.scala). */
class RewriteRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-rules-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def lineitem =
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  /** Flatten the executed plan, descending into AQE query stages (which
    * are leaf nodes hiding their subtree behind `plan`). */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def executedNodes(df: DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect() // force execution so AQE finalizes the plan
    allNodes(df.queryExecution.executedPlan)
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    executedNodes(df).collect { case s: FileSourceScanExec => s }

  private def usesIndex(df: DataFrame, indexName: String): Boolean =
    scans(df).exists(_.relation.location.rootPaths.exists(
      _.toString.contains(s"/$indexName/")))

  private def shuffleCount(df: DataFrame): Int =
    executedNodes(df).count(_.isInstanceOf[ShuffleExchangeExec])

  test("filter query is rewritten to scan the covering index") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_filter", Seq("l_orderkey"), Seq("l_quantity")))

      def query = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"))

      assert(usesIndex(query, "ci_filter"), "expected index scan in plan:\n" +
        query.queryExecution.executedPlan)

      // result parity with the non-indexed run
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = query.collect().toSet
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(query.collect().toSet == expected)
      assert(expected.nonEmpty)
    }
  }

  test("filter rule requires head indexed column in the filter") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_head", Seq("l_orderkey"), Seq("l_quantity")))
      // filter on a non-head (included) column → no rewrite
      val q = lineitem.filter(col("l_quantity") === 10.0)
        .select(col("l_orderkey"))
      assert(!usesIndex(q, "ci_head"))
    }
  }

  test("filter rule skips when index does not cover projection") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_cover", Seq("l_orderkey"), Seq("l_quantity")))
      val q = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_extendedprice"))
      assert(!usesIndex(q, "ci_cover"))
    }
  }

  test("source data change invalidates the index (signature mismatch)") {
    withGraft { g =>
      val src = Files.createTempDirectory("graft-src-").toString
      lineitem.limit(100).write.mode("overwrite").parquet(src)
      val df = spark.read.parquet(src)
      g.createIndex(df, CoveringIndexConfig("ci_sig", Seq("l_orderkey"), Seq("l_quantity")))
      assert(usesIndex(
        spark.read.parquet(src).filter(col("l_orderkey") === 1L)
          .select(col("l_orderkey"), col("l_quantity")), "ci_sig"))

      // append more rows → file set changes → index must NOT apply
      lineitem.limit(10).write.mode("append").parquet(src)
      val q2 = spark.read.parquet(src).filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"))
      assert(!usesIndex(q2, "ci_sig"))
    }
  }

  test("deleted index is not applied; restore re-applies") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_del", Seq("l_orderkey"), Seq("l_quantity")))
      def q = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"))
      assert(usesIndex(q, "ci_del"))
      g.deleteIndex("ci_del")
      assert(!usesIndex(q, "ci_del"))
      g.restoreIndex("ci_del")
      assert(usesIndex(q, "ci_del"))
    }
  }

  test("equi-join on indexed keys scans both indexes without shuffle") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_li_join", Seq("l_orderkey"), Seq("l_quantity")))
      g.createIndex(orders,
        CoveringIndexConfig("ci_ord_join", Seq("o_orderkey"), Seq("o_totalprice")))

      // disable broadcast so the join would otherwise be a shuffled SMJ
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = lineitem
        val ord = orders
        def query = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))

        assert(usesIndex(query, "ci_li_join") && usesIndex(query, "ci_ord_join"),
          "expected both index scans in plan:\n" +
            query.queryExecution.executedPlan)
        assert(shuffleCount(query) == 0,
          "expected shuffle-free bucketed join:\n" +
            query.queryExecution.executedPlan)

        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        val expected = query.collect()
        spark.conf.set(GraftConf.ApplyEnabledKey, "true")
        val actual = query.collect()
        assert(actual.length == expected.length && expected.nonEmpty)
        assert(actual.map(_.toString).sorted.sameElements(
          expected.map(_.toString).sorted))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    }
  }

  test("one-sided join: an index on a single side halves the exchanges") {
    withGraft { g =>
      // only LINEITEM is indexed — the reference's pair rule would bail;
      // the one-sided rule swaps the indexed side for its bucketed scan
      // and lets EnsureRequirements shuffle just the orders side
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_li_one", Seq("l_orderkey"), Seq("l_quantity")))
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = lineitem
        val ord = orders
        def query = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
        assert(usesIndex(query, "ci_li_one"),
          "one-sided index scan missing:\n" + query.queryExecution.executedPlan)
        assert(shuffleCount(query) == 1,
          "expected exactly the orders-side exchange:\n" +
            query.queryExecution.executedPlan)
        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        val expected = query.collect()
        spark.conf.set(GraftConf.ApplyEnabledKey, "true")
        val actual = query.collect()
        assert(actual.length == expected.length && expected.nonEmpty)
        assert(actual.map(_.toString).sorted.sameElements(
          expected.map(_.toString).sorted))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    }
  }

  test("equi-join with UNEQUAL bucket counts shuffles only one side") {
    withGraft { g =>
      // reference JoinIndexRanker.scala:34-38: mismatched bucket counts
      // are still a win — Spark repartitions just the losing side
      spark.conf.set(GraftConf.NumBucketsKey, "4")
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_li_ub", Seq("l_orderkey"), Seq("l_quantity")))
      spark.conf.set(GraftConf.NumBucketsKey, "8")
      g.createIndex(orders,
        CoveringIndexConfig("ci_ord_ub", Seq("o_orderkey"), Seq("o_totalprice")))
      spark.conf.unset(GraftConf.NumBucketsKey)

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = lineitem
        val ord = orders
        def query = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))

        assert(usesIndex(query, "ci_li_ub") && usesIndex(query, "ci_ord_ub"),
          "expected both index scans in plan:\n" +
            query.queryExecution.executedPlan)
        // one side re-buckets, the other rides its HashPartitioning
        assert(shuffleCount(query) == 1,
          "expected exactly one exchange (losing side only):\n" +
            query.queryExecution.executedPlan)

        spark.conf.set(GraftConf.ApplyEnabledKey, "false")
        val expected = query.collect()
        spark.conf.set(GraftConf.ApplyEnabledKey, "true")
        val actual = query.collect()
        assert(actual.length == expected.length && expected.nonEmpty)
        assert(actual.map(_.toString).sorted.sameElements(
          expected.map(_.toString).sorted))
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    }
  }

  test("disableGraft turns rewriting off") {
    import graft.Graft._
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_off", Seq("l_orderkey"), Seq("l_quantity")))
      def q = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"))
      spark.disableGraft()
      try assert(!usesIndex(q, "ci_off"))
      finally spark.enableGraft()
      assert(usesIndex(q, "ci_off"))
    }
  }
}
