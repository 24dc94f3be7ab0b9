package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

class PlanAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-pa-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def lineitem =
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")

  test("explain shows applied index and both plans") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("pa_ci", Seq("l_orderkey"), Seq("l_quantity")))
      val q = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"))
      val out = g.explain(q)
      assert(out.contains("pa_ci"))
      assert(out.contains("Plan with indexes"))
      assert(out.contains("Plan without indexes"))
    }
  }

  test("whyNot reports APPLIED for used index") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("pa_used", Seq("l_orderkey"), Seq("l_quantity")))
      val q = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_orderkey"), col("l_quantity"))
      assert(g.whyNot(q).contains("'pa_used' [CI]: APPLIED"))
    }
  }

  test("whyNot explains head-column and covering failures") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("pa_head", Seq("l_orderkey"), Seq("l_quantity")))
      // filter on included (non-head) column
      val q1 = lineitem.filter(col("l_quantity") === 10.0)
        .select(col("l_orderkey"))
      assert(g.whyNot(q1).contains("HEAD_COLUMN_NOT_IN_FILTER"))
      // projection outside the index
      val q2 = lineitem.filter(col("l_orderkey") === 1L)
        .select(col("l_extendedprice"))
      val out2 = g.whyNot(q2)
      assert(out2.contains("NOT_COVERING") || out2.contains("COLUMN_MISMATCH"),
        out2)
    }
  }

  test("whyNot labels API-served kinds instead of misleading rewrite reasons") {
    withGraft { g =>
      val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      g.createIndex(docs,
        graft.index.minhash.MinHashIndexConfig("pa_mh", "doc_id", "text"))
      val out = g.whyNot(docs.filter(col("doc_id") > 5))
      assert(out.contains("pa_mh") && out.contains("API_SERVED"),
        s"expected API_SERVED label, got: $out")
    }
  }

  test("whyNot reports column mismatch against unrelated table") {
    withGraft { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("pa_col", Seq("l_orderkey"), Seq("l_quantity")))
      val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      val q = orders.filter(col("o_orderkey") === 1L).select(col("o_totalprice"))
      assert(g.whyNot(q).contains("COLUMN_MISMATCH"))
    }
  }
}
