package graft.index

import java.nio.file.Files

import org.apache.iceberg.spark.source.{FakeIcebergTable, SparkTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.covering.CoveringIndexConfig
import graft.index.rules.IndexCandidates
import graft.index.sources.{IcebergSource, SourceProviders}

/**
 * Drives the Iceberg provider end-to-end against in-package fakes (see
 * FakeIceberg.scala): recognition of DSv2 leaves, snapshot-id signature,
 * manifest-based file listing, covering-index build THROUGH the DSv2
 * read, exact-match scan substitution, and the hybrid appended leg that
 * reads appended data files as parquet from logged metadata (an Iceberg
 * leaf has no HadoopFsRelation to clone).
 */
class IcebergSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSpark.spark

  private val dir = Files.createTempDirectory("graft_ice_src")
    .resolve("tbl").toFile.getAbsolutePath
  private val sysPath = Files.createTempDirectory("graft_ice_sys").toFile.getAbsolutePath
  private var savedProviders: Option[String] = None
  private var savedSysPath: Option[String] = None

  override def beforeAll(): Unit = {
    savedProviders = spark.conf.getOption(SourceProviders.ProvidersKey)
    savedSysPath = spark.conf.getOption(GraftConf.SystemPathKey)
    spark.conf.set(SourceProviders.ProvidersKey,
      classOf[IcebergSource].getName + "," +
        classOf[graft.index.sources.DefaultFileBasedSource].getName)
    spark.conf.set(GraftConf.SystemPathKey, sysPath)
    graft.index.rules.IndexCatalog.invalidate(spark)
  }

  override def afterAll(): Unit = {
    def restore(key: String, v: Option[String]): Unit =
      v.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    restore(SourceProviders.ProvidersKey, savedProviders)
    restore(GraftConf.SystemPathKey, savedSysPath)
    graft.index.rules.IndexCatalog.invalidate(spark)
  }

  private def listParquet(): Seq[(String, Long)] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getAbsolutePath, f.length)).toSeq.sortBy(_._1)
  }

  private def dsv2(table: SparkTable): DataFrame = {
    val rel = DataSourceV2Relation.create(
      table, None, None, CaseInsensitiveStringMap.empty())
    GraftBridge.ofRows(spark, rel)
  }

  private lazy val table: SparkTable = {
    import spark.implicits._
    // big enough that a one-file append stays under the 30% hybrid ratio
    (1L to 20000L).map(i => (i, i * 2L)).toDF("id", "v")
      .coalesce(1).write.parquet(dir)
    val t = SparkTable.overParquetDir(spark, dir)
    t.table().files = listParquet()
    t
  }

  test("provider recognizes a DSv2 Iceberg leaf and fingerprints by snapshot") {
    val df = dsv2(table)
    val leaves = SourceRelation.collectLeaves(df)
    assert(leaves.size == 1)
    val leaf = leaves.head
    assert(leaf.format == "iceberg")
    assert(leaf.rootPaths == Seq(dir))
    assert(leaf.listFiles().map(f => (f._1, f._2)) == table.table().files)
    assert(leaf.listFiles().forall(_._3 == 0L), "mtime must be constant 0")
    assert(table.table().lastScan.closed, "planFiles iterable must be closed")
    val sig1 = leaf.signature(Nil)
    table.table().snapId = 7L
    val sig2 = SourceRelation.collectLeaves(dsv2(table)).head.signature(Nil)
    table.table().snapId = 1L
    assert(sig1 != sig2, "signature must track the snapshot id")
  }

  test("provider declines non-iceberg leaves") {
    val plain = graft.Tables.load(spark, TestSpark.sfDir, "nation")
    val leaves = SourceRelation.collectLeaves(plain)
    assert(leaves.forall(_.format != "iceberg"))
  }

  test("covering index builds through the DSv2 read and substitutes exactly") {
    val mgr = new IndexManager(spark)
    mgr.create(dsv2(table), CoveringIndexConfig("ice_ci", Seq("id"), Seq("v")))

    val q = dsv2(table).filter(col("id") <= 5000L)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val usedIndex = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation if IndexCandidates.isIndexRelation(l) => l
    }
    assert(usedIndex.nonEmpty, "exact-match rewrite must scan the index:\n" +
      q.queryExecution.optimizedPlan.toString)
    val row = q.head()
    assert(row.getLong(0) == 5000L)
    assert(row.getLong(1) == (1L to 5000L).map(_ * 2).sum)
  }

  test("appended snapshot rides hybrid scan, appended leg read as parquet") {
    import spark.implicits._
    // new data files in a new snapshot (≈1% of bytes — well inside hybrid)
    (20001L to 20200L).map(i => (i, i * 2L)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(dir)
    table.table().files = listParquet()
    table.table().snapId = 2L

    val q = dsv2(table).filter(col("id") > 0L)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val plan = q.queryExecution.optimizedPlan
    val usedIndex = plan.collect {
      case l: LogicalRelation if IndexCandidates.isIndexRelation(l) => l
    }
    // index leg + appended leg (both carry the marker option)
    assert(usedIndex.size >= 2,
      s"hybrid rewrite expected (index + appended legs):\n$plan")
    val row = q.head()
    assert(row.getLong(0) == 20200L)
    assert(row.getLong(1) == (1L to 20200L).map(_ * 2).sum)
  }
}
