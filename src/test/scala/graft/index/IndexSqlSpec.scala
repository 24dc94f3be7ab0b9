package graft.index

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.DeltaTable

/**
 * The INDEX lifecycle driven purely from SQL (GraftSqlParser →
 * IndexSqlCommands → the Graft API): CREATE INDEX on parquet and lake
 * sources, SHOW INDEXES, REFRESH/OPTIMIZE, DROP + RESTORE + VACUUM.
 * A SQL user could previously not create the engine's core artifact at
 * all — this is the statement surface delta-spark users expect.
 */
class IndexSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sysPath(): String = {
    val p = Files.createTempDirectory("graft-idxsql-sys-").toString
    spark.conf.set(GraftConf.SystemPathKey, p)
    p
  }

  private def ordersDir(): String = {
    val d = Files.createTempDirectory("graft-idxsql-src-").toString + "/orders"
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .limit(2000).write.parquet(d)
    d
  }

  private def indexNames(): Set[String] =
    spark.sql("SHOW INDEXES").select("name").as[String].collect().toSet

  private def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect { case s: FileSourceScanExec => s }
      case s: FileSourceScanExec => Seq(s)
    }.flatten.flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  test("CREATE INDEX ... USING COVERING: created, listed, and SERVING") {
    sysPath()
    val src = ordersDir()
    spark.sql(s"CREATE INDEX sqlspec_ci ON parquet.`$src` " +
      "(o_custkey) INCLUDE (o_totalprice)")
    assert(indexNames().contains("sqlspec_ci"))
    val row = spark.sql("SHOW INDEXES")
      .filter($"name" === "sqlspec_ci").head()
    assert(row.getAs[String]("kind").toLowerCase.contains("covering"))
    assert(row.getAs[scala.collection.Seq[String]]("indexedColumns")
      .toSeq == Seq("o_custkey"))
    // the index transparently serves an eligible query
    val q = spark.read.parquet(src)
      .filter($"o_custkey" === 7L).select($"o_totalprice")
    assert(scansOf(q).exists(_.contains("sqlspec_ci")),
      s"query not served by the SQL-created index:\n${q.queryExecution}")

    // lifecycle: DROP de-activates it (listed as DELETED, stops
    // serving); RESTORE reactivates; VACUUM after DROP removes for good
    def stateOf(n: String): Option[String] = spark.sql("SHOW INDEXES")
      .filter($"name" === n).collect().headOption
      .map(_.getAs[String]("state"))
    spark.sql("DROP INDEX sqlspec_ci")
    assert(!stateOf("sqlspec_ci").contains("ACTIVE"), stateOf("sqlspec_ci"))
    assert(!scansOf(spark.read.parquet(src)
      .filter($"o_custkey" === 7L).select($"o_totalprice"))
      .exists(_.contains("sqlspec_ci")), "a dropped index kept serving")
    spark.sql("RESTORE INDEX sqlspec_ci")
    assert(stateOf("sqlspec_ci").contains("ACTIVE"))
    spark.sql("DROP INDEX sqlspec_ci")
    spark.sql("VACUUM INDEX sqlspec_ci")
    assert(!indexNames().contains("sqlspec_ci"))
  }

  test("REFRESH INDEX INCREMENTAL picks up appended source files") {
    sysPath()
    val src = ordersDir()
    spark.sql(s"CREATE INDEX sqlspec_rf ON parquet.`$src` " +
      "(o_custkey) INCLUDE (o_totalprice)")
    // append more source data, then refresh through SQL
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .orderBy($"o_orderkey".desc).limit(500)
      .write.mode("append").parquet(src)
    spark.sql("REFRESH INDEX sqlspec_rf INCREMENTAL")
    val q = spark.read.parquet(src)
      .groupBy($"o_custkey").agg(sum($"o_totalprice"))
    q.collect()
    spark.sql("OPTIMIZE INDEX sqlspec_rf") // quick compaction, no error
    spark.sql("DROP INDEX sqlspec_rf")
  }

  test("USING ZORDER and USING DATASKIPPING create their kinds; " +
      "DATASKIPPING refuses INCLUDE") {
    sysPath()
    val src = ordersDir()
    spark.sql(s"CREATE INDEX sqlspec_zo ON parquet.`$src` " +
      "(o_custkey, o_orderkey) INCLUDE (o_totalprice) USING ZORDER")
    spark.sql(s"CREATE INDEX sqlspec_ds ON parquet.`$src` " +
      "(o_orderkey) USING DATASKIPPING")
    val byName = spark.sql("SHOW INDEXES").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("kind")).toMap
    assert(byName("sqlspec_zo").toLowerCase.contains("zorder"))
    assert(byName("sqlspec_ds").toLowerCase.contains("skip"))
    val e = intercept[Exception](spark.sql(
      s"CREATE INDEX sqlspec_bad ON parquet.`$src` " +
        "(o_orderkey) INCLUDE (o_totalprice) USING DATASKIPPING"))
    assert(e.getMessage.contains("INCLUDE"), e.getMessage)
    spark.sql("DROP INDEX sqlspec_zo")
    spark.sql("DROP INDEX sqlspec_ds")
  }

  test("OPTIONS (buckets=N) lands in the covering layout and leaves the " +
      "session conf untouched") {
    val sys = sysPath()
    val src = ordersDir()
    val prevConf = spark.conf.getOption(GraftConf.NumBucketsKey)
    spark.sql(s"CREATE INDEX sqlspec_b8 ON parquet.`$src` " +
      "(o_custkey) INCLUDE (o_totalprice) USING COVERING OPTIONS (buckets = 8)")
    val mgr = new IndexManager(spark)
    val desc = mgr.logManager("sqlspec_b8").getLatestStableLog.get
      .descriptor.asInstanceOf[graft.index.covering.CoveringIndexDescriptor]
    assert(desc.numBuckets == 8, s"bucket count: ${desc.numBuckets}")
    assert(spark.conf.getOption(GraftConf.NumBucketsKey) == prevConf,
      "buckets override leaked into the session conf")
    // and it serves
    val q = spark.read.parquet(src)
      .filter($"o_custkey" === 7L).select($"o_totalprice")
    assert(scansOf(q).exists(_.contains("sqlspec_b8")))
    spark.sql("DROP INDEX sqlspec_b8")
  }

  test("OPTIONS (sketch='bloom', ...) builds bloom sketches that " +
      "actually prune; valuelist maps maxValues; bad options refuse") {
    sysPath()
    // 8 range-partitioned files so pruning is observable
    val src = Files.createTempDirectory("graft-idxsql-ds-").toString + "/li"
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
      .repartitionByRange(8, col("l_orderkey"))
      .write.parquet(src)
    spark.sql(s"CREATE INDEX sqlspec_bloom ON parquet.`$src` " +
      "(l_suppkey) USING DATASKIPPING " +
      "OPTIONS (sketch = 'bloom', expectedItems = 5000, fpp = 0.001)")
    val mgr = new IndexManager(spark)
    val sketches = mgr.logManager("sqlspec_bloom").getLatestStableLog.get
      .descriptor.asInstanceOf[
        graft.index.dataskipping.DataSkippingIndexDescriptor].sketches
    assert(sketches.map(_.sketchKind) == Seq("bloom"))
    assert(sketches.head.params.get("expectedItems").contains("5000") &&
      sketches.head.params.get("fpp").contains("0.001"), sketches.head.params)
    // the bloom sketch SERVES: a point filter on a scattered key scans
    // fewer than all files and returns exactly the unaccelerated rows
    def q() = spark.read.parquet(src).filter($"l_suppkey" === 1L)
      .select($"l_orderkey", $"l_quantity")
    q().collect() // warm
    val expected = {
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      try q().collect().toSeq.sortBy(_.toString)
      finally spark.conf.set(GraftConf.ApplyEnabledKey, "true")
    }
    assert(q().collect().toSeq.sortBy(_.toString) == expected)

    spark.sql(s"CREATE INDEX sqlspec_vl ON parquet.`$src` " +
      "(l_linestatus) USING DATASKIPPING " +
      "OPTIONS (sketch = 'valuelist', maxValues = 7)")
    val vl = mgr.logManager("sqlspec_vl").getLatestStableLog.get
      .descriptor.asInstanceOf[
        graft.index.dataskipping.DataSkippingIndexDescriptor].sketches
    assert(vl.map(_.sketchKind) == Seq("valuelist") &&
      vl.head.params.get("maxValues").contains("7"))

    // refusals: unknown key, unknown sketch kind, zorder takes none,
    // cross-kind param (fpp on valuelist)
    def bad(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    bad(s"CREATE INDEX sqlspec_x1 ON parquet.`$src` (l_suppkey) " +
      "USING DATASKIPPING OPTIONS (sketch = 'hyperloglog')", "hyperloglog")
    bad(s"CREATE INDEX sqlspec_x2 ON parquet.`$src` (l_suppkey) " +
      "USING COVERING OPTIONS (bucketz = 8)", "bucketz")
    bad(s"CREATE INDEX sqlspec_x3 ON parquet.`$src` (l_suppkey) " +
      "USING ZORDER OPTIONS (buckets = 8)", "buckets")
    bad(s"CREATE INDEX sqlspec_x4 ON parquet.`$src` (l_linestatus) " +
      "USING DATASKIPPING OPTIONS (sketch = 'valuelist', fpp = 0.5)", "fpp")
    bad(s"CREATE INDEX sqlspec_x5 ON parquet.`$src` (l_suppkey) " +
      "USING COVERING OPTIONS (buckets = 'lots')", "integer")
    bad(s"CREATE INDEX sqlspec_x6 ON parquet.`$src` (l_suppkey) " +
      "USING COVERING OPTIONS (buckets = 0)", "positive")
    // 2^32+1 is positive but would WRAP to 1 in the Int narrowing
    bad(s"CREATE INDEX sqlspec_x7 ON parquet.`$src` (l_suppkey) " +
      "USING COVERING OPTIONS (buckets = 4294967297)", "fit an Int")
    spark.sql("DROP INDEX sqlspec_bloom")
    spark.sql("DROP INDEX sqlspec_vl")
  }

  test("CREATE INDEX on a lake source (graft_delta) serves reads") {
    sysPath()
    val root = Files.createTempDirectory("graft-idxsql-delta-").toString
    DeltaTable.create(
      spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet"), root)
    spark.sql(s"CREATE INDEX sqlspec_dl ON graft_delta.`$root` " +
      "(c_custkey) INCLUDE (c_acctbal)")
    assert(indexNames().contains("sqlspec_dl"))
    val q = DeltaTable.read(spark, root)
      .filter($"c_custkey" === 42L).select($"c_acctbal")
    assert(scansOf(q).exists(_.contains("sqlspec_dl")),
      s"delta-sourced query not served:\n${q.queryExecution}")
    spark.sql("DROP INDEX sqlspec_dl")
  }
}
