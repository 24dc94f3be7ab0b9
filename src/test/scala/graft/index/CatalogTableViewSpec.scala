package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

/**
 * Index resolution through CATALOG tables and VIEWS (reference:
 * E2EHyperspaceRulesTest.scala table/view scenarios): the rewrite rule
 * runs pre-CBO, after `FindDataSourceTable` resolves a saved table to a
 * `LogicalRelation` and after view inlining — so an index created over
 * `spark.table(...)` must apply to queries phrased through the table
 * name, a temp view, a persistent view, and a global temp view alike.
 */
class CatalogTableViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-cat-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def usesIndex(df: DataFrame, indexName: String): Boolean = {
    df.collect()
    df.queryExecution.executedPlan.collectWithSubqueries {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(
          _.toString.contains(s"/$indexName/")) => s
    }.nonEmpty
  }

  test("index on a saveAsTable table applies via table, temp view, persistent view") {
    withGraft { g =>
      spark.sql("DROP VIEW IF EXISTS graft_sup_v")
      spark.sql("DROP TABLE IF EXISTS graft_sup_t")
      try {
        spark.read.parquet(s"${TestSpark.sfDir}/supplier.parquet")
          .write.mode("overwrite").saveAsTable("graft_sup_t")

        g.createIndex(spark.table("graft_sup_t"),
          CoveringIndexConfig("ci_cat", Seq("s_nationkey"), Seq("s_acctbal")))

        // by-name: a DataFrame memoizes its QueryExecution on first use,
        // so each probe needs a freshly-built plan
        def check(q: => DataFrame, label: String): Unit = {
          spark.conf.set(GraftConf.ApplyEnabledKey, "false")
          val expected = q.collect().toSet
          spark.conf.set(GraftConf.ApplyEnabledKey, "true")
          val probe = q
          assert(usesIndex(probe, "ci_cat"),
            s"index not applied via $label:\n${probe.queryExecution.executedPlan}")
          assert(q.collect().toSet == expected && expected.nonEmpty,
            s"result mismatch via $label")
        }

        // 1. the table name itself
        check(spark.table("graft_sup_t")
          .filter(col("s_nationkey") === 3)
          .select(col("s_nationkey"), col("s_acctbal")), "spark.table")

        // 2. a temp view over the table
        spark.sql("""CREATE OR REPLACE TEMP VIEW graft_sup_tv AS
                     SELECT s_nationkey, s_acctbal FROM graft_sup_t""")
        check(spark.sql(
          "SELECT s_nationkey, s_acctbal FROM graft_sup_tv WHERE s_nationkey = 3"),
          "temp view")

        // 3. a persistent catalog view
        spark.sql("""CREATE VIEW graft_sup_v AS
                     SELECT s_nationkey, s_acctbal FROM graft_sup_t""")
        check(spark.sql(
          "SELECT s_nationkey, s_acctbal FROM graft_sup_v WHERE s_nationkey = 3"),
          "persistent view")

        // 4. a global temp view
        spark.sql("""CREATE OR REPLACE GLOBAL TEMP VIEW graft_sup_gv AS
                     SELECT s_nationkey, s_acctbal FROM graft_sup_t""")
        check(spark.sql(
          "SELECT s_nationkey, s_acctbal FROM global_temp.graft_sup_gv " +
            "WHERE s_nationkey = 3"),
          "global temp view")
      } finally {
        spark.sql("DROP VIEW IF EXISTS graft_sup_v")
        spark.sql("DROP VIEW IF EXISTS graft_sup_tv")
        spark.sql("DROP VIEW IF EXISTS global_temp.graft_sup_gv")
        spark.sql("DROP TABLE IF EXISTS graft_sup_t")
      }
    }
  }

  test("DataFrame written via saveAsTable but indexed via path still applies to table reads") {
    withGraft { g =>
      spark.sql("DROP TABLE IF EXISTS graft_ord_t")
      try {
        spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
          .write.mode("overwrite").saveAsTable("graft_ord_t")
        // index built from the table's WAREHOUSE PATH read — the catalog
        // read and the path read list the same files, so the captured
        // file set matches either way
        val loc = spark.sql("DESCRIBE TABLE EXTENDED graft_ord_t")
          .filter(col("col_name") === "Location")
          .select(col("data_type")).head().getString(0)
        g.createIndex(spark.read.parquet(loc),
          CoveringIndexConfig("ci_loc", Seq("o_custkey"), Seq("o_totalprice")))
        val q = spark.table("graft_ord_t")
          .filter(col("o_custkey") === 7L)
          .select(col("o_custkey"), col("o_totalprice"))
        assert(usesIndex(q, "ci_loc"),
          s"path-built index not applied to catalog read:\n" +
            q.queryExecution.executedPlan)
      } finally spark.sql("DROP TABLE IF EXISTS graft_ord_t")
    }
  }
}
