package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig

/** Index support across file formats (reference: the default provider
  * covers avro,csv,json,orc,parquet,text — HyperspaceConf.scala:110-115)
  * plus the cancel lifecycle API. */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-fmt-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def usesIndex(df: DataFrame, indexName: String): Boolean = {
    val applied = graft.index.analysis.PlanAnalysis.appliedIndexes(spark, df)
    applied.contains(indexName)
  }

  private def sample = spark.read
    .parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    .limit(1000)

  private def roundTrip(format: String, options: Map[String, String]): Unit = {
    withGraft { g =>
      val src = Files.createTempDirectory(s"graft-fmt-$format-").toString
      sample.write.mode("overwrite").format(format).options(options).save(src)
      val df = spark.read.format(format).options(options)
        .schema(sample.schema).load(src)
      g.createIndex(df, CoveringIndexConfig(
        s"fmt_$format", Seq("l_orderkey"), Seq("l_quantity")))
      val e = g.indexManager.getIndexes().head
      assert(e.relations.head.format == format)

      val q = spark.read.format(format).options(options)
        .schema(sample.schema).load(src)
        .filter(col("l_orderkey") <= 100L)
        .select(col("l_orderkey"), col("l_quantity"))
      assert(usesIndex(q, s"fmt_$format"), s"$format query not rewritten")

      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = spark.read.format(format).options(options)
        .schema(sample.schema).load(src)
        .filter(col("l_orderkey") <= 100L)
        .select(col("l_orderkey"), col("l_quantity"))
        .collect().map(_.toString).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.collect().map(_.toString).sorted.toSeq == expected)
      assert(expected.nonEmpty)

      // refresh reconstructs the source from logged format + options
      g.refreshIndex(s"fmt_$format", "full")
      assert(g.indexManager.getIndexes().head.state == IndexState.Active)
    }
  }

  test("covering index over csv source") { roundTrip("csv", Map("header" -> "true")) }
  test("covering index over json source") { roundTrip("json", Map.empty) }
  test("covering index over orc source") { roundTrip("orc", Map.empty) }

  test("covering index over avro source (in-repo jarless avro format)") {
    // spark-avro is a separate module jar, absent in this offline build;
    // graft.sources.avro.AvroFileFormat implements the container format on
    // the avro CORE jars and registers the `avro` short name, so this is
    // the same generic HadoopFsRelation round trip as csv/json/orc.
    assume(
      try {
        org.apache.spark.sql.execution.datasources.DataSource
          .lookupDataSource("avro", spark.sessionState.conf)
        true
      } catch { case _: Exception => false },
      "avro data source not resolvable")
    roundTrip("avro", Map.empty)
  }

  test("covering index over text source (single value column)") {
    withGraft { g =>
      val src = Files.createTempDirectory("graft-fmt-text-").toString
      sample.select(concat_ws("|", col("l_orderkey"), col("l_returnflag"))
          .as("value"))
        .write.mode("overwrite").format("text").save(src)
      def read = spark.read.format("text").load(src)
      g.createIndex(read, CoveringIndexConfig("fmt_text", Seq("value")))
      assert(g.indexManager.getIndexes().head.relations.head.format == "text")

      val q = read.filter(col("value").startsWith("1|"))
      assert(usesIndex(q, "fmt_text"), "text query not rewritten")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = read.filter(col("value").startsWith("1|"))
        .collect().map(_.getString(0)).sorted.toSeq
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(q.collect().map(_.getString(0)).sorted.toSeq == expected)
      assert(expected.nonEmpty)
    }
  }
  test("hybrid scan folds appended avro files (non-parquet append leg)") {
    // the append leg clones the source's HadoopFsRelation, so the union
    // must read the appended slice through the AVRO format, not parquet
    withGraft { g =>
      val src = Files.createTempDirectory("graft-fmt-avro-hyb-").toString
      val base = spark.read
        .parquet(s"${TestSpark.sfDir}/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      base.limit(1000).write.mode("overwrite").format("avro").save(src)
      def read = spark.read.format("avro")
        .schema(base.schema).load(src)
      g.createIndex(read, CoveringIndexConfig(
        "fmt_avro_hyb", Seq("l_orderkey"), Seq("l_quantity")))

      // append a small avro slice (within the hybrid byte-ratio bounds)
      base.limit(100).coalesce(1)
        .write.mode("append").format("avro").save(src)

      def q = read.filter(col("l_orderkey") <= 100L)
        .select(col("l_orderkey"), col("l_quantity"))
      assert(usesIndex(q, "fmt_avro_hyb"),
        "drifted avro source should still hybrid-serve the index")
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().groupBy(identity).view.mapValues(_.length).toMap
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val actual = q.collect().groupBy(identity).view.mapValues(_.length).toMap
      assert(actual == expected && expected.nonEmpty)
    }
  }

  test("cancel rolls an in-flight action back to the last stable state") {
    withGraft { g =>
      g.createIndex(sample, CoveringIndexConfig("c_ok", Seq("l_orderkey")))
      val log = g.indexManager.logManager("c_ok")
      val latest = log.getLatestStableLog.get
      // simulate a crashed refresh: in-flight entry at the head
      assert(log.writeLog(latest.id + 1,
        latest.copy(state = IndexState.Refreshing, id = latest.id + 1)))
      rules.IndexCatalog.invalidate(spark)

      g.cancel("c_ok")
      val after = g.indexManager.logManager("c_ok").getLatestLog.get
      assert(after.state == IndexState.Active)
      assert(g.indexManager.getIndexes().map(_.name) == Seq("c_ok"))
    }
  }

  test("cancel on a never-completed create leaves DOESNOTEXIST") {
    withGraft { g =>
      // hand-craft a CREATING-only log (crash before first completion)
      val mgr = g.indexManager
      val log = mgr.logManager("c_broken")
      val d = graft.index.covering.CoveringIndexDescriptor(
        Seq("x"), Nil, 4, "{}", hasLineage = false)
      val creating = IndexLogEntry("c_broken", d,
        ContentMeta("/tmp/none", Nil), Nil, IndexState.Creating, 0, 0L)
      assert(log.writeLog(0, creating))
      g.cancel("c_broken")
      assert(log.getLatestLog.get.state == IndexState.DoesNotExist)
      assert(mgr.getIndexes(Set(IndexState.Active)).isEmpty)
    }
  }
}
