package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables, TestSpark}
import graft.index.covering.CoveringIndexConfig
import graft.index.rules.PlanArtifacts

/**
 * Round-17 optimization pins: the planning-artifact caches must be
 * (a) actually caching — one computation per key — and (b) structurally
 * incapable of serving stale content: every key embeds the thing whose
 * change would invalidate it (an index's LOG ID, a source file's
 * (mtime, length)).
 */
class PlanArtifactsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("getOrCompute computes once per key and per session") {
    var n = 0
    def inc(): Integer = { n += 1; Integer.valueOf(n) }
    val k = "spec#" + java.util.UUID.randomUUID()
    assert(PlanArtifacts.getOrCompute(spark, k)(inc()) == 1)
    assert(PlanArtifacts.getOrCompute(spark, k)(inc()) == 1) // cached
    assert(n == 1)
    assert(PlanArtifacts.getOrCompute(spark, k + "/other")(inc()) == 2)
  }

  test("index-scan artifacts roll over with the log id: a refreshed " +
      "index serves the appended rows, never the cached old content") {
    val sys = Files.createTempDirectory("graft-pa-sys-").toString
    val src = Files.createTempDirectory("graft-pa-src-").toString + "/t"
    spark.conf.set(GraftConf.SystemPathKey, sys)
    try {
      val g = new Graft(spark)
      spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 2).as("v")).write.parquet(src)
      g.createIndex(spark.read.parquet(src),
        CoveringIndexConfig("pa_ci", Seq("k"), Seq("v")))
      def served(): Long = {
        val df = spark.read.parquet(src).filter(col("k") >= 0)
          .groupBy().agg(sum(col("v"))).as("s")
        val applied = graft.index.rules.IndexCandidates
          .appliedIn(df.queryExecution.optimizedPlan)
        assert(applied.contains("pa_ci"),
          s"index must serve; applied=$applied\n" +
            df.queryExecution.optimizedPlan)
        df.collect()(0).getLong(0)
      }
      assert(served() == (0L until 100L).map(_ * 2).sum)
      // append + refresh: new log id => new artifact keys; the query must
      // see the appended rows through the refreshed index
      spark.range(100, 150).select(col("id").as("k"),
        (col("id") * 2).as("v")).write.mode("append").parquet(src)
      g.refreshIndex("pa_ci", "incremental")
      assert(served() == (0L until 150L).map(_ * 2).sum)
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      graft.index.rules.IndexCatalog.invalidate(spark)
    }
  }

  test("Tables.load relation cache re-resolves when the file changes") {
    val dir = Files.createTempDirectory("graft-pa-tbl-").toString
    val p = Tables.path(dir, "orders")
    spark.range(0, 10).toDF("o_orderkey").coalesce(1).write
      .mode("overwrite").parquet("/tmp/__pa_tmp1")
    val f1 = new java.io.File("/tmp/__pa_tmp1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(f1.toPath, java.nio.file.Paths.get(p))
    assert(Tables.load(spark, dir, "orders").count() == 10)
    assert(Tables.load(spark, dir, "orders").count() == 10) // cached plan
    // replace the file with different content (different length => the
    // (mtime, length) stamp misses even within mtime granularity)
    spark.range(0, 25).toDF("o_orderkey").coalesce(1).write
      .mode("overwrite").parquet("/tmp/__pa_tmp2")
    val f2 = new java.io.File("/tmp/__pa_tmp2").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(f2.toPath, java.nio.file.Paths.get(p),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(Tables.load(spark, dir, "orders").count() == 25)
  }
}
