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
