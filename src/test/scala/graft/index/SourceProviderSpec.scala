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
