package graft.index

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DefaultFileBasedSource, SourceLeaf, SourceProvider, SourceProviders}

/** A provider that tags every leaf it recognizes (delegating to the
  * default mechanics) — stands in for a Delta/Iceberg provider wired via
  * conf. */
class TaggingTestProvider extends SourceProvider {
  override def asSourceLeaf(leaf: LogicalPlan): Option[SourceLeaf] = {
    TaggingTestProvider.hits += 1
    None // recognize nothing: defer to the next provider in the chain
  }
}
object TaggingTestProvider { @volatile var hits: Int = 0 }

class SourceProviderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("default provider recognizes parquet relations") {
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    val leaves = SourceRelation.collectLeaves(df)
    assert(leaves.size == 1)
    val leaf = leaves.head
    assert(leaf.format == "parquet")
    assert(leaf.listFiles().nonEmpty)
    assert(leaf.rootPaths.exists(_.contains("nation.parquet")))
  }

  test("default provider rejects non-file leaves") {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k", "v")
    assert(SourceRelation.collectLeaves(df).isEmpty)
    intercept[IllegalArgumentException] {
      SourceRelation.captureAll(df, new FileIdTracker)
    }
  }

  test("DeltaLakeSource ignores non-Delta relations (reflection gate)") {
    // offline-runnable half of the Delta story: the provider must defer
    // on plain file scans so it can sit FIRST in the provider chain
    val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    val leaf = df.queryExecution.analyzed.collectLeaves().head
    assert(new graft.index.sources.DeltaLakeSource().asSourceLeaf(leaf).isEmpty)
    // and chained before the default provider it is transparent
    val key = SourceProviders.ProvidersKey
    spark.conf.set(key,
      classOf[graft.index.sources.DeltaLakeSource].getName + "," +
        classOf[DefaultFileBasedSource].getName)
    try {
      val leaves = SourceRelation.collectLeaves(df)
      assert(leaves.size == 1 && leaves.head.format == "parquet")
    } finally spark.conf.unset(key)
  }

  test("DeltaLakeSource recognizes a Delta table scan (needs delta jar)") {
    // activation path, runnable only where delta-spark is on the
    // classpath (absent in this offline build -> cancelled): a Delta
    // batch read surfaces LogicalRelation(HadoopFsRelation(Tahoe*)),
    // which the provider fingerprints by table version + path
    assume(
      try { Class.forName("org.apache.spark.sql.delta.DeltaLog"); true }
      catch { case _: ClassNotFoundException => false },
      "delta-spark jar not on classpath")
    val dir = java.nio.file.Files.createTempDirectory("graft-delta-").toString
    spark.range(10).write.format("delta").save(dir)
    val df = spark.read.format("delta").load(dir)
    val leaf = df.queryExecution.analyzed.collectLeaves().head
    val recognized = new graft.index.sources.DeltaLakeSource().asSourceLeaf(leaf)
    assert(recognized.nonEmpty)
    assert(recognized.get.format == "delta")
    assert(recognized.get.listFiles().nonEmpty)
    // version-pinned signature: stable across identical captures
    val files = Nil
    assert(recognized.get.signature(files) == recognized.get.signature(files))
  }

  test("conf-registered providers are consulted in order") {
    val key = SourceProviders.ProvidersKey
    spark.conf.set(key,
      classOf[TaggingTestProvider].getName + "," +
        classOf[DefaultFileBasedSource].getName)
    try {
      TaggingTestProvider.hits = 0
      val df = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
      val leaves = SourceRelation.collectLeaves(df)
      // custom provider was asked first, deferred; default still resolved
      assert(TaggingTestProvider.hits > 0)
      assert(leaves.size == 1 && leaves.head.format == "parquet")
    } finally spark.conf.unset(key)
  }
}
