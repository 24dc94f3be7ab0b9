package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable}

/**
 * Delta `domainMetadata` + liquid clustering (`delta.clustering`):
 * domains replay latest-wins, tombstones stick, everything survives a
 * checkpoint (including after log cleanup erases the JSON commits that
 * carried the actions), foreign tables carrying the features stay
 * writable, and a clustered table's plain OPTIMIZE reclusters by the
 * declared columns.
 */
class DeltaDomainMetadataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def fresh(): String = {
    val root = Files.createTempDirectory("graft-delta-domain-").toString
    DeltaTable.create(customer.limit(100), root)
    root
  }

  test("setDomainMetadata round-trips; latest wins; remove tombstones") {
    val root = fresh()
    DeltaTable.setDomainMetadata(spark, root, "app.audit", """{"v":1}""")
    assert(DeltaLog.snapshot(spark, root).liveDomains("app.audit") == """{"v":1}""")
    DeltaTable.setDomainMetadata(spark, root, "app.audit", """{"v":2}""")
    val s = DeltaLog.snapshot(spark, root)
    assert(s.liveDomains("app.audit") == """{"v":2}""")
    DeltaTable.removeDomainMetadata(spark, root, "app.audit")
    val s2 = DeltaLog.snapshot(spark, root)
    assert(!s2.liveDomains.contains("app.audit"))
    // the tombstone itself is retained for checkpoint restatement
    assert(s2.domains("app.audit").removed)
    // removing an absent domain is a no-op, not a commit
    val v = DeltaLog.snapshot(spark, root).version
    assert(DeltaTable.removeDomainMetadata(spark, root, "app.audit") == v)
  }

  test("system domains are refused on the raw verb") {
    val root = fresh()
    intercept[IllegalArgumentException] {
      DeltaTable.setDomainMetadata(spark, root, "delta.clustering", "{}")
    }
  }

  test("the domain commit upgrades a legacy protocol to table features, " +
      "restating the implied legacy features") {
    val root = fresh()
    DeltaTable.setDomainMetadata(spark, root, "app.x", "cfg")
    val s = DeltaLog.snapshot(spark, root)
    assert(s.minWriterVersion == 7)
    assert(s.writerFeatures.contains("domainMetadata"))
    // the (1,2)-implied legacy bundle must be restated on upgrade
    assert(Set("appendOnly", "invariants").subsetOf(s.writerFeatures))
    // reader protocol untouched: domains are writer-side state
    assert(s.minReaderVersion == 1)
    // and the table still reads + appends under the new protocol
    DeltaTable.append(customer.limit(10), root)
    assert(DeltaTable.read(spark, root).count() == 110)
  }

  test("domains (and tombstones) survive checkpoint + log cleanup") {
    val root = fresh()
    DeltaTable.setDomainMetadata(spark, root, "app.keep", """{"keep":true}""")
    DeltaTable.setDomainMetadata(spark, root, "app.gone", "x")
    DeltaTable.removeDomainMetadata(spark, root, "app.gone")
    DeltaTable.checkpoint(spark, root)
    // erase every JSON commit below the checkpoint — replay must now
    // reconstruct the domains from the checkpoint alone
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ckptV = DeltaLog.snapshot(spark, root).version
    fs.listStatus(DeltaLog.logDir(new org.apache.hadoop.fs.Path(root)))
      .filter(_.getPath.getName.matches("""\d{20}\.json"""))
      .filter(_.getPath.getName.stripSuffix(".json").toLong < ckptV)
      .foreach(st => fs.delete(st.getPath, false))
    val s = DeltaLog.snapshot(spark, root)
    assert(s.liveDomains("app.keep") == """{"keep":true}""")
    assert(s.domains("app.gone").removed && !s.liveDomains.contains("app.gone"))
  }

  test("clusterBy publishes delta.clustering + features; appends stay " +
      "writable; OPTIMIZE reclusters by the declared columns") {
    val root = fresh()
    DeltaTable.clusterBy(spark, root, Seq("c_custkey", "c_nationkey"))
    val s = DeltaLog.snapshot(spark, root)
    assert(s.clusteringColumns == Seq(Seq("c_custkey"), Seq("c_nationkey")))
    assert(Set("clustering", "domainMetadata").subsetOf(s.writerFeatures))
    // a foreign writer's table with these features is accepted too
    // (same gate), and appends need not be clustered
    DeltaTable.append(customer.limit(20), root)
    DeltaTable.append(customer.limit(20), root)
    val before = DeltaLog.snapshot(spark, root)
    // plain OPTIMIZE (no explicit ZORDER BY) must recluster: every
    // candidate file rewrites, and the commit records the zOrderBy
    val v = DeltaTable.optimizeCompact(spark, root)
    assert(v > before.version, "OPTIMIZE on a clustered table was a no-op")
    val logPath = new org.apache.hadoop.fs.Path(
      DeltaLog.logDir(new org.apache.hadoop.fs.Path(root)), f"$v%020d.json")
    val fs = logPath.getFileSystem(spark.sessionState.newHadoopConf())
    val body = scala.io.Source.fromInputStream(fs.open(logPath), "UTF-8")
      .getLines().mkString("\n")
    assert(body.contains(""""zOrderBy":"c_custkey,c_nationkey""""),
      s"OPTIMIZE commit did not recluster:\n$body")
    // rows intact
    assert(DeltaTable.read(spark, root).count() == 140)
    // CLUSTER BY NONE drops clustering; OPTIMIZE falls back to binpack
    DeltaTable.clusterBy(spark, root, Nil)
    assert(DeltaLog.snapshot(spark, root).clusteringColumns.isEmpty)
  }

  test("clusterBy validates columns and rejects hive-partition overlap") {
    val root = fresh()
    intercept[IllegalArgumentException] {
      DeltaTable.clusterBy(spark, root, Seq("nope"))
    }
    val partRoot = Files.createTempDirectory("graft-delta-domain-p-").toString
    DeltaTable.create(customer.limit(100), partRoot,
      partitionBy = Seq("c_mktsegment"))
    intercept[IllegalArgumentException] {
      DeltaTable.clusterBy(spark, partRoot, Seq("c_mktsegment"))
    }
  }

  test("a v2-checkpoint table restates domains through the manifest too") {
    val root = Files.createTempDirectory("graft-delta-domain-v2-").toString
    DeltaTable.create(customer.limit(100), root,
      configuration = Map("delta.checkpointPolicy" -> "v2"))
    DeltaTable.setDomainMetadata(spark, root, "app.v2", "cfg2")
    DeltaTable.checkpoint(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ckptV = DeltaLog.snapshot(spark, root).version
    fs.listStatus(DeltaLog.logDir(new org.apache.hadoop.fs.Path(root)))
      .filter(_.getPath.getName.matches("""\d{20}\.json"""))
      .filter(_.getPath.getName.stripSuffix(".json").toLong < ckptV)
      .foreach(st => fs.delete(st.getPath, false))
    assert(DeltaLog.snapshot(spark, root).liveDomains("app.v2") == "cfg2")
  }
}
