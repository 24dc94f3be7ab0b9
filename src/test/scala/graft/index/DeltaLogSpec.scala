package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig
import graft.index.SourceRelation
import graft.index.sources.{DeltaLog, DeltaTable, LakeTable, UnsupportedDeltaProtocolException}

/**
 * Jarless Delta Lake support: log replay (commits, checkpoints,
 * hand-authored logs), snapshot-pinned reads, the minimal writer, and
 * the full index lifecycle (build → rewrite → hybrid drift → refresh)
 * over a Delta table. Reference semantics:
 * sources/delta/DeltaLakeRelation.scala:34-45 (signature = version+path,
 * files from the log).
 */
class DeltaLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("create + append: versions advance, read sees the union") {
    val root = tmp("graft-delta-")
    val a = customer.filter(col("c_custkey") % 2 === 0)
    val b = customer.filter(col("c_custkey") % 2 === 1)
    assert(DeltaTable.create(a, root) == 0L)
    assert(DeltaLog.snapshot(spark, root).version == 0L)
    assert(DeltaTable.read(spark, root).count() == a.count())

    assert(DeltaTable.append(b, root) == 1L)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.version == 1L)
    val got = DeltaTable.read(spark, root)
    assert(got.count() == customer.count())
    assert(got.select(sum(col("c_custkey"))).head().getLong(0) ==
      customer.select(sum(col("c_custkey"))).head().getLong(0))
  }

  test("timestampAsOf resolves the latest commit at-or-before the timestamp") {
    val root = tmp("graft-delta-ts-")
    val a = customer.filter(col("c_custkey") % 2 === 0)
    val b = customer.filter(col("c_custkey") % 2 === 1)
    DeltaTable.create(a, root)
    DeltaTable.append(b, root)
    // pin deterministic commit mtimes (same-millisecond commits would
    // make the cut ambiguous)
    val dir = DeltaLog.logDir(new org.apache.hadoop.fs.Path(root))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val t0 = 1700000000000L
    val t1 = t0 + 60000L
    fs.setTimes(new org.apache.hadoop.fs.Path(dir,
      f"${0L}%020d.json"), t0, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(dir,
      f"${1L}%020d.json"), t1, -1)

    assert(DeltaTable.readTimestampAsOf(spark, root, t0).count() == a.count())
    assert(DeltaTable.readTimestampAsOf(spark, root, t1 - 1).count() == a.count())
    assert(DeltaTable.readTimestampAsOf(spark, root, t1).count() ==
      customer.count())
    assert(DeltaTable.readTimestampAsOf(spark, root,
      System.currentTimeMillis() + 1000000L).count() == customer.count())
    val err = intercept[IllegalArgumentException] {
      DeltaTable.readTimestampAsOf(spark, root, t0 - 1)
    }
    assert(err.getMessage.contains("precedes the first commit"))
  }

  test("overwrite: old files removed from the snapshot, data replaced") {
    val root = tmp("graft-delta-ow-")
    DeltaTable.create(customer, root)
    val replacement = customer.filter(col("c_custkey") <= 10)
    DeltaTable.create(replacement, root) // version 1, full overwrite
    val s = DeltaLog.snapshot(spark, root)
    assert(s.version == 1L)
    assert(DeltaTable.read(spark, root).count() == replacement.count())
    // removed files are gone from the LOG even though still on disk
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .count(f => f.getPath.getName.endsWith(".parquet"))
    assert(onDisk > s.files.size, "overwrite should leave unreferenced files")
  }

  test("replays a hand-authored log it did not write") {
    val root = tmp("graft-delta-raw-")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    // data file written directly, no writer involvement
    customer.limit(25).coalesce(1).write.mode("overwrite")
      .parquet(s"$root/staging")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/staging"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/data%20file.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/staging"), true)
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/data%20file.parquet"))
    // NOTE: add.path is URL-encoded per the protocol ("%2520" decodes to
    // the literal "%20" in the on-disk name), exercising the decode path
    val schemaJson = customer.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val commit =
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}
         |{"metaData":{"id":"raw-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$schemaJson","partitionColumns":[],"configuration":{},"createdTime":1}}
         |{"add":{"path":"data%2520file.parquet","partitionValues":{},"size":${st.getLen},"modificationTime":${st.getModificationTime},"dataChange":true}}
         |{"commitInfo":{"operation":"WRITE"}}
         |""".stripMargin
    fs.mkdirs(DeltaLog.logDir(rootPath))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      DeltaLog.logDir(rootPath), "00000000000000000000.json"), false)
    out.write(commit.getBytes("UTF-8")); out.close()

    val s = DeltaLog.snapshot(spark, root)
    assert(s.version == 0L && s.files.size == 1)
    assert(s.files.head.path.endsWith("data%20file.parquet"))
    assert(DeltaTable.read(spark, root).count() == 25)
  }

  test("checkpoint bounds replay: snapshot survives pre-checkpoint log cleanup") {
    val root = tmp("graft-delta-ck-")
    DeltaTable.create(customer.filter(col("c_custkey") <= 50), root)
    DeltaTable.append(customer.filter(
      col("c_custkey") > 50 && col("c_custkey") <= 100), root)
    DeltaTable.append(customer.filter(col("c_custkey") > 100), root)
    assert(DeltaTable.checkpoint(spark, root) == 2L)
    DeltaTable.append(customer.limit(0), root) // empty commit, version 3

    // delete the JSON commits the checkpoint covers (log retention)
    val logDir = DeltaLog.logDir(new org.apache.hadoop.fs.Path(root))
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    (0L to 2L).foreach(v => assert(fs.delete(
      new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"), false)))

    val s = DeltaLog.snapshot(spark, root)
    assert(s.version == 3L)
    assert(DeltaTable.read(spark, root).count() == customer.count())
  }

  test("auto-checkpoint: the delta.checkpointInterval cadence fires on commits") {
    val fsp = (root: String) => DeltaLog.logDir(new org.apache.hadoop.fs.Path(root))
    def ckpts(root: String): Seq[String] = {
      val d = fsp(root)
      val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(d).map(_.getPath.getName).filter(_.contains(".checkpoint."))
        .toSeq.sorted
    }
    // explicit interval 3: versions 3 and 6 checkpoint, nothing else
    val a = tmp("graft-delta-autock-")
    DeltaTable.create(customer.limit(10), a,
      configuration = Map("delta.checkpointInterval" -> "3"))
    (1 to 6).foreach(_ => DeltaTable.append(customer.limit(2), a))
    assert(ckpts(a) == Seq(
      f"${3L}%020d.checkpoint.parquet", f"${6L}%020d.checkpoint.parquet"))
    assert(DeltaTable.read(spark, a).count() == 22)
    // disabled: no checkpoints however many commits land
    val b = tmp("graft-delta-autock-off-")
    DeltaTable.create(customer.limit(5), b,
      configuration = Map("delta.checkpointInterval" -> "-1"))
    (1 to 4).foreach(_ => DeltaTable.append(customer.limit(1), b))
    assert(ckpts(b).isEmpty)
  }

  test("banded classic checkpoint: past the part threshold the state " +
      "writes as a multi-part group that replays") {
    val root = tmp("graft-delta-mpck-")
    DeltaTable.create(customer.filter(col("c_custkey") <= 50), root)
    DeltaTable.append(customer.filter(
      col("c_custkey") > 50 && col("c_custkey") <= 100), root)
    DeltaTable.append(customer.filter(col("c_custkey") > 100), root)
    spark.conf.set("spark.graft.delta.checkpoint.partSize", "1")
    try assert(DeltaTable.checkpoint(spark, root) == 2L)
    finally spark.conf.unset("spark.graft.delta.checkpoint.partSize")
    val logDir = DeltaLog.logDir(new org.apache.hadoop.fs.Path(root))
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val MultiRe = """(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet""".r
    val parts = fs.listStatus(logDir).map(_.getPath.getName).collect {
      case n @ MultiRe(_, o, p) => (n, o.toInt, p.toInt)
    }.toSeq.sortBy(_._2)
    assert(parts.size >= 2, s"expected a multi-part checkpoint, got $parts")
    assert(parts.map(_._3).distinct == Seq(parts.size),
      s"declared part count wrong: $parts")
    assert(parts.map(_._2) == (1 to parts.size),
      s"part ordinals not 1..n: $parts")
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(root, "_delta_log", "_last_checkpoint")))
    assert(hint.contains("\"parts\":" + parts.size), hint)
    // the group is the ONLY replay source once the commits it covers go
    DeltaTable.append(customer.limit(0), root) // version anchor on top
    (0L to 2L).foreach(v => assert(fs.delete(
      new org.apache.hadoop.fs.Path(logDir, f"$v%020d.json"), false)))
    assert(DeltaTable.read(spark, root).count() == customer.count())
    assert(DeltaTable.read(spark, root)
      .select(sum(col("c_custkey"))).head().getLong(0) ==
      customer.select(sum(col("c_custkey"))).head().getLong(0))
  }

  test("metaData.id is stable across the table's life (appends, " +
      "metadata commits, restore, checkpoint restatement)") {
    val root = tmp("graft-delta-id-")
    DeltaTable.create(customer.filter(col("c_custkey") <= 50), root)
    val id = DeltaLog.snapshot(spark, root).tableId
    assert(id.nonEmpty, "create minted no metaData.id")
    DeltaTable.append(customer.filter(col("c_custkey") > 50), root)
    DeltaTable.enableChangeDataFeed(spark, root) // commitMetadata path
    DeltaTable.restore(spark, root, 1L)
    assert(DeltaTable.checkpoint(spark, root) >= 0L)
    DeltaTable.create(customer.limit(7), root) // overwrite, same table
    val s = DeltaLog.snapshot(spark, root)
    assert(s.tableId == id,
      s"table identity drifted: created as $id, now ${s.tableId}")
  }

  test("checkpoint-time metadata cleanup honors delta.logRetentionDuration") {
    def logNames(root: String): Seq[String] = {
      val d = DeltaLog.logDir(new org.apache.hadoop.fs.Path(root))
      val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(d).map(_.getPath.getName).toSeq.sorted
    }
    // zero retention: pre-checkpoint commits vanish at checkpoint time
    val a = tmp("graft-delta-logclean-")
    DeltaTable.create(customer.limit(10), a,
      configuration = Map("delta.logRetentionDuration" -> "interval 0 seconds"))
    DeltaTable.append(customer.limit(2), a)
    DeltaTable.append(customer.limit(2), a)
    DeltaTable.checkpoint(spark, a)
    val after = logNames(a)
    assert(!after.exists(_.matches("""^0{19}0\.json$""")))
    assert(!after.exists(_.matches("""^0{19}1\.json$""")))
    assert(after.contains(f"${2L}%020d.json")) // the anchor survives
    assert(DeltaTable.read(spark, a).count() == 14)
    // cleanup off: everything stays
    val b = tmp("graft-delta-logclean-off-")
    DeltaTable.create(customer.limit(5), b,
      configuration = Map(
        "delta.logRetentionDuration" -> "interval 0 seconds",
        "delta.enableExpiredLogCleanup" -> "false"))
    DeltaTable.append(customer.limit(1), b)
    DeltaTable.checkpoint(spark, b)
    assert(logNames(b).count(_.endsWith(".json")) == 2)
  }

  test("time travel: versionAsOf replays to the historic snapshot") {
    val root = tmp("graft-delta-tt-")
    val v0data = customer.filter(col("c_custkey") <= 30)
    DeltaTable.create(v0data, root)                       // v0
    DeltaTable.append(customer.filter(
      col("c_custkey") > 30 && col("c_custkey") <= 60), root) // v1
    DeltaTable.create(customer.filter(col("c_custkey") > 140), root) // v2 overwrite
    assert(DeltaTable.read(spark, root, Some(0L)).count() == v0data.count())
    assert(DeltaTable.read(spark, root, Some(1L)).count() ==
      customer.filter(col("c_custkey") <= 60).count())
    // latest (v2) is the overwritten slice
    assert(DeltaTable.read(spark, root).count() ==
      customer.filter(col("c_custkey") > 140).count())
    // out-of-range version is a loud error
    val ex = intercept[IllegalArgumentException](
      DeltaTable.read(spark, root, Some(9L)))
    assert(ex.getMessage.contains("out of range"))
  }

  test("data-skipping index composes over a Delta table") {
    val sys = tmp("graft-delta-ds-sys-")
    val root = tmp("graft-delta-ds-")
    spark.conf.set(GraftConf.SystemPathKey, sys)
    try {
      val g = new Graft(spark)
      // several RANGE-DISJOINT commits -> min/max sketches can prune
      (0 until 4).foreach { i =>
        val slice = customer.filter(
          col("c_custkey") > i * 40L && col("c_custkey") <= (i + 1) * 40L)
          .coalesce(1)
        if (i == 0) DeltaTable.create(slice, root)
        else DeltaTable.append(slice, root)
      }
      g.createIndex(DeltaTable.read(spark, root),
        graft.index.dataskipping.DataSkippingIndexConfig("ds_delta",
          Seq(graft.index.dataskipping.SketchSpec.minMax("c_custkey"))))
      val q = DeltaTable.read(spark, root)
        .filter(col("c_custkey") <= 3)
        .select(col("c_custkey"), col("c_acctbal"))
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = q.collect().toSet
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      val probe = DeltaTable.read(spark, root)
        .filter(col("c_custkey") <= 3)
        .select(col("c_custkey"), col("c_acctbal"))
      assert(probe.collect().toSet == expected && expected.nonEmpty)
      // the skipping file index pruned at least one of the 4 commit files
      val scans = probe.queryExecution.executedPlan.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      val scanned = scans.map(_.relation.location)
        .collectFirst {
          case d: graft.index.dataskipping.DataSkippingFileIndex =>
            d.listFiles(Nil, Nil).map(_.files.size).sum }
      assert(scanned.exists(_ < 4),
        s"data-skipping pruned nothing over the delta table: $scanned")
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  test("partitioned create: hive layout + partition values recovered") {
    val root = tmp("graft-delta-part-")
    DeltaTable.create(customer.select(col("c_custkey"), col("c_mktsegment")),
      root, partitionBy = Seq("c_mktsegment"))
    val got = DeltaTable.read(spark, root)
    assert(got.columns.toSet == Set("c_custkey", "c_mktsegment"))
    val perSeg = got.groupBy(col("c_mktsegment")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = customer.groupBy(col("c_mktsegment")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSeg == expected)
    // the log's add actions carry the partition values
    val s = DeltaLog.snapshot(spark, root)
    assert(s.partitionColumns == Seq("c_mktsegment"))
    assert(s.files.forall(_.path.contains("c_mktsegment=")))
  }

  test("provider: delta leaf recognized, version-based signature") {
    val root = tmp("graft-delta-sig-")
    DeltaTable.create(customer, root)
    def leaf = SourceRelation.collectLeaves(DeltaTable.read(spark, root)).head
    val l0 = leaf
    assert(l0.format == "delta")
    assert(l0.rootPaths == Seq(root))
    val tracker = new FileIdTracker
    val sig0 = SourceRelation.capture(l0, tracker).signature
    // stable across re-reads of the same version
    assert(SourceRelation.capture(leaf, new FileIdTracker).signature == sig0)
    // version bump changes the signature
    DeltaTable.append(customer.limit(3), root)
    assert(SourceRelation.capture(leaf, new FileIdTracker).signature != sig0)
  }

  test("index lifecycle on a Delta table: rewrite, hybrid drift, refresh") {
    val sys = tmp("graft-delta-sys-")
    val root = tmp("graft-delta-idx-")
    spark.conf.set(GraftConf.SystemPathKey, sys)
    try {
      val g = new Graft(spark)
      DeltaTable.create(customer, root)
      g.createIndex(DeltaTable.read(spark, root),
        CoveringIndexConfig("ci_delta", Seq("c_nationkey"), Seq("c_acctbal")))
      val e = g.indexManager.getIndexes().head
      assert(e.relations.head.format == "delta")

      def query = DeltaTable.read(spark, root)
        .filter(col("c_nationkey") === 5L)
        .select(col("c_nationkey"), col("c_acctbal"))
      def usesIndex(df: org.apache.spark.sql.DataFrame): Boolean = {
        df.collect()
        df.queryExecution.executedPlan.collectWithSubqueries {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(
              _.toString.contains("/ci_delta/")) => s
        }.nonEmpty
      }
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = query.collect().toSet
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(usesIndex(query), "covering index not applied to delta scan:\n" +
        query.queryExecution.executedPlan)
      assert(query.collect().toSet == expected && expected.nonEmpty)

      // drift: commit an append (small, within hybrid ratio) — the index
      // still applies via hybrid scan and the NEW rows are served
      val extra = customer.filter(col("c_nationkey") === 5L).limit(2)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
      DeltaTable.append(extra, root)
      val afterDrift = query
      assert(usesIndex(afterDrift), "hybrid scan did not keep the index:\n" +
        afterDrift.queryExecution.executedPlan)
      assert(afterDrift.collect().length == expected.size + 2,
        "hybrid scan lost the appended delta commit")

      // incremental refresh re-baselines: exact match again
      g.refreshIndex("ci_delta", "incremental")
      assert(usesIndex(query))
      assert(query.collect().length == expected.size + 2)
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  // --- protocol gate: tables demanding reader capabilities this replay
  // --- does not implement must refuse loudly, never serve wrong rows

  /** Hand-author a v0 commit with the given action lines. */
  private def writeRawCommit(root: String, version: Long,
      lines: Seq[String]): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(DeltaLog.logDir(rootPath))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      DeltaLog.logDir(rootPath), f"$version%020d.json"), false)
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8")); out.close()
  }

  private def escapedSchemaJson: String =
    customer.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")

  private def metaDataLine(config: String = "{}"): String =
    s"""{"metaData":{"id":"gate-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$escapedSchemaJson","partitionColumns":[],"configuration":$config,"createdTime":1}}"""

  test("protocol gate: v3 + deletionVectors is now implemented and reads; " +
      "collations still refuses") {
    val root = tmp("graft-delta-dv-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
      metaDataLine(),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true}}"""))
    assert(DeltaLog.snapshot(spark, root).readerFeatures.contains("deletionVectors"))

    val root2 = tmp("graft-delta-tw-")
    writeRawCommit(root2, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations"],"writerFeatures":["collations"]}}""",
      metaDataLine()))
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaLog.snapshot(spark, root2)
    }
    assert(err.getMessage.contains("collations"))
  }

  test("protocol gate: minReaderVersion 2 reads (column mapping implemented); " +
      "a declared mapping without physicalNames still refuses") {
    // (2,5) with NO mapping in force: replays as plain — readable
    val root = tmp("graft-delta-v2-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataLine()))
    assert(DeltaLog.snapshot(spark, root).minReaderVersion == 2)
    // (2,5) + mode=name but an UNMAPPED schema: non-conforming, refuse
    val root2 = tmp("graft-delta-v2bad-")
    writeRawCommit(root2, 0L, Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaDataLine("""{"delta.columnMapping.mode":"name"}""")))
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaLog.snapshot(spark, root2)
    }
    assert(err.getMessage.contains("physicalName"))
  }

  test("protocol gate: columnMapping config refuses even without protocol bump") {
    val root = tmp("graft-delta-cm-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataLine("""{"delta.columnMapping.mode":"name"}""")))
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaLog.snapshot(spark, root)
    }
    assert(err.getMessage.contains("column mapping"))
  }

  test("add action carrying a deletionVector replays into the snapshot") {
    val root = tmp("graft-delta-dvadd-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataLine(),
      """{"add":{"path":"f1.parquet","partitionValues":{},"size":10,"modificationTime":1,"dataChange":true,"deletionVector":{"storageType":"u","pathOrInlineDv":"x","offset":1,"sizeInBytes":40,"cardinality":3}}}"""))
    val s = DeltaLog.snapshot(spark, root)
    val dv = s.files.head.dv
    assert(dv.contains(graft.index.sources.DvDescriptor("u", "x", Some(1), 40, 3L)))
  }

  test("protocol gate: later-commit protocol upgrade refuses a previously readable table") {
    val root = tmp("graft-delta-upg-")
    DeltaTable.create(customer.limit(5), root) // version 0, protocol 1
    assert(DeltaTable.read(spark, root).count() == 5)
    writeRawCommit(root, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations"]}}"""))
    intercept[UnsupportedDeltaProtocolException] {
      DeltaLog.snapshot(spark, root)
    }
    // time travel to the pre-upgrade version still reads
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L)).count() == 5)
  }

  test("protocol gate: v3 table with EMPTY readerFeatures is spec-legal and reads") {
    val root = tmp("graft-delta-v3empty-")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    customer.limit(4).coalesce(1).write.mode("overwrite").parquet(s"$root/staging")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/staging"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/d.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/staging"), true)
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/d.parquet"))
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":[],"writerFeatures":[]}}""",
      metaDataLine(),
      s"""{"add":{"path":"d.parquet","partitionValues":{},"size":${st.getLen},"modificationTime":${st.getModificationTime},"dataChange":true}}"""))
    assert(DeltaTable.read(spark, root).count() == 4)
  }

  // --- writer gate: protocol/config-demanded writer capabilities we
  // --- don't implement must refuse the WRITE, not just the read

  test("writer gate: legacy versions write when no feature is in use; " +
      "in-use capabilities and unknown versions refuse") {
    // minWriterVersion 5, nothing in use → append is legal now
    val root = tmp("graft-delta-wv-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":5}}""",
      metaDataLine()))
    assert(DeltaTable.append(customer.limit(2), root) == 1L)
    // an unknown future version still refuses
    val root2 = tmp("graft-delta-wv8-")
    writeRawCommit(root2, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":8}}""",
      metaDataLine()))
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.append(customer.limit(2), root2)
    }
    assert(err.getMessage.contains("minWriterVersion 8"))
    // a GENERATED column no longer refuses: a conforming explicit
    // value lands, a mismatching one refuses naming the column
    // (DeltaGeneratedIdentitySpec owns derivation/identity semantics;
    // this pins the GATE behavior)
    val genSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.LongType, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "a + 1").build())))
    val root3 = tmp("graft-delta-gen-")
    val escaped = genSchema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeRawCommit(root3, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      s"""{"metaData":{"id":"g","format":{"provider":"parquet","options":{}},"schemaString":"$escaped","partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    assert(DeltaTable.append(
      spark.range(2).selectExpr("id as a", "id+1 as b"), root3) == 1L)
    val err3 = intercept[IllegalArgumentException] {
      DeltaTable.append(spark.range(2).selectExpr("id as a", "id+2 as b"), root3)
    }
    assert(err3.getMessage.contains("generated column 'b'"))
    // CDF: append permitted, and since round 9 row deletes are too —
    // the delete records its victims as cdc files (DeltaCdfSpec owns
    // the feed semantics; this pins that the GATE no longer refuses)
    val root4 = tmp("graft-delta-cdf-")
    writeRawCommit(root4, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":4}}""",
      metaDataLine("""{"delta.enableChangeDataFeed":"true"}""")))
    assert(DeltaTable.append(customer.limit(2), root4) == 1L)
    assert(DeltaTable.deleteWhere(spark, root4,
      org.apache.spark.sql.functions.col("c_custkey") === 1L) == 2L)
    val fs4 = new org.apache.hadoop.fs.Path(root4)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs4.exists(new org.apache.hadoop.fs.Path(root4, "_change_data")))
  }

  test("writer gate: unsupported writerFeatures refuse; the appendOnly " +
      "FEATURE alone locks nothing (only the property does)") {
    val rootBad = tmp("graft-delta-wf-")
    writeRawCommit(rootBad, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["icebergCompatV2"]}}""",
      metaDataLine()))
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.append(customer.limit(2), rootBad)
    }
    assert(err.getMessage.contains("icebergCompatV2"))

    // every features-protocol table lists appendOnly — the feature means
    // "honor delta.appendOnly when set", it is NOT the switch itself
    val rootAo = tmp("graft-delta-wfao-")
    writeRawCommit(rootAo, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,"writerFeatures":["appendOnly"]}}""",
      metaDataLine()))
    assert(DeltaTable.append(customer.limit(2), rootAo) == 1L)
    assert(DeltaTable.create(customer.limit(2), rootAo) == 2L)
    assert(DeltaTable.deleteWhere(spark, rootAo,
      org.apache.spark.sql.functions.lit(false)) >= 2L)
  }

  test("writer gate: delta.appendOnly config refuses overwrite, permits append") {
    val root = tmp("graft-delta-ao-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataLine("""{"delta.appendOnly":"true"}""")))
    assert(DeltaTable.append(customer.limit(3), root) == 1L)
    assert(DeltaTable.read(spark, root).count() == 3)
    intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.create(customer.limit(3), root)
    }
    // append preserves the configuration for later replayers
    assert(DeltaLog.snapshot(spark, root)
      .configuration.get("delta.appendOnly").contains("true"))
  }

  test("CHECK constraints are ENFORCED: clean writes land, violating " +
      "append/update/merge refuse naming the constraint") {
    val root = tmp("graft-delta-ck-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":3}}""",
      metaDataLine("""{"delta.constraints.posbal":"c_acctbal >= 0"}""")))
    // conforming append lands (the r11 posture refused ALL writes here)
    val clean = customer.filter(col("c_acctbal") >= 0)
    assert(DeltaTable.append(clean.limit(20), root) == 1L)
    assert(DeltaTable.read(spark, root).count() == 20)
    // violating append refuses, names the constraint and count, and
    // leaves the table unchanged
    val dirty = customer.limit(20)
      .withColumn("c_acctbal", col("c_acctbal") - lit(1e9))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.append(dirty, root)
    }
    assert(e.getMessage.contains("posbal") &&
      e.getMessage.contains("c_acctbal >= 0"), e.getMessage)
    assert(DeltaLog.snapshot(spark, root).version == 1L)
    // UPDATE whose SET violates refuses; a conforming SET applies
    val e2 = intercept[IllegalArgumentException] {
      DeltaTable.update(spark, root, col("c_custkey") >= 0,
        Map("c_acctbal" -> (col("c_acctbal") - lit(1e9))))
    }
    assert(e2.getMessage.contains("posbal"))
    DeltaTable.update(spark, root, col("c_custkey") >= 0,
      Map("c_acctbal" -> org.apache.spark.sql.functions.abs(col("c_acctbal"))))
    assert(DeltaTable.read(spark, root)
      .filter(col("c_acctbal") < 0).count() == 0)
    // MERGE: violating upsert rows refuse; delete markers need no check
    val e3 = intercept[IllegalArgumentException] {
      LakeTable.merge(spark, root, dirty, Seq("c_custkey"))
    }
    assert(e3.getMessage.contains("posbal"))
    LakeTable.merge(spark, root, clean.limit(30), Seq("c_custkey"))
    assert(DeltaTable.read(spark, root).count() == 30)
  }

  test("column invariants (delta.invariants field metadata) are " +
      "enforced on write; unparsable invariants refuse") {
    import org.apache.spark.sql.types._
    val root = tmp("graft-delta-inv-")
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_nationkey", IntegerType, nullable = true,
        new MetadataBuilder().putString("delta.invariants",
          """{"expression":{"expression":"c_nationkey < 1000"}}""").build())))
    val escaped = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"inv","format":{"provider":"parquet","options":{}},"schemaString":"$escaped","partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    val ok = customer.select(col("c_custkey"), col("c_nationkey"))
    assert(DeltaTable.append(ok.limit(10), root) == 1L)
    val e = intercept[IllegalArgumentException] {
      DeltaTable.append(ok.limit(5)
        .withColumn("c_nationkey", col("c_nationkey") + 5000), root)
    }
    assert(e.getMessage.contains("invariant") &&
      e.getMessage.contains("c_nationkey"), e.getMessage)
  }

  test("overwrite carries the table configuration forward (no erasure)") {
    val root = tmp("graft-delta-cfg-")
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaDataLine("""{"custom.owner":"graft-spec"}""")))
    DeltaTable.create(customer.limit(5), root) // overwrite commit, v1
    val s = DeltaLog.snapshot(spark, root)
    assert(s.version == 1L)
    assert(s.configuration.get("custom.owner").contains("graft-spec"))
  }

  // --- commit staging: the add set is exactly this writer's files

  /** Run `append` while a watcher thread interferes as soon as the
    * writer's stage dir appears. The slow column widens the staging
    * window so the interference lands mid-commit deterministically. */
  private def appendWithInterference(root: String, rows: Int)(
      interfere: () => Unit): Either[Throwable, Long] = {
    val slow = udf((i: Long) => { Thread.sleep(15); i })
    val df = customer.limit(rows).repartition(1)
      .withColumn("c_slow", slow(col("c_custkey")))
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    @volatile var fired = false
    val watcher = new Thread(() => {
      val deadline = System.currentTimeMillis() + 30000
      while (!fired && System.currentTimeMillis() < deadline) {
        val staging = fs.exists(rootPath) && fs.listStatus(rootPath)
          .exists(_.getPath.getName.startsWith(".graft-stage-"))
        if (staging) { interfere(); fired = true }
        else Thread.sleep(5)
      }
    })
    watcher.start()
    val out = try Right(DeltaTable.append(df, root))
      catch { case t: Throwable => Left(t) }
    fired = true
    watcher.join()
    out
  }

  test("commit race: a concurrent writer's data file is never absorbed into this commit") {
    val root = tmp("graft-delta-race1-")
    val base = customer.limit(10).repartition(1)
      .withColumn("c_slow", col("c_custkey"))
    DeltaTable.create(base, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    // a foreign parquet landing in the table dir mid-commit (another
    // writer's in-flight data file)
    val res = appendWithInterference(root, 5) { () =>
      base.limit(3).coalesce(1).write.mode("overwrite").parquet(s"$root/.foreign")
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/.foreign"))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/foreign-inflight.parquet"))
    }
    assert(res.isRight, s"append failed: $res")
    val dir = DeltaLog.logDir(rootPath)
    val logText = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".json"))
      .map { st =>
        val in = fs.open(st.getPath)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      }.mkString("\n")
    assert(!logText.contains("foreign-inflight"),
      "a concurrent writer's file was absorbed into the commit log")
    assert(DeltaTable.read(spark, root).count() == 15)
  }

  test("commit race: the fence loser removes its staged files and retries cleanly") {
    val root = tmp("graft-delta-race2-")
    val base = customer.limit(10).repartition(1)
      .withColumn("c_slow", col("c_custkey"))
    DeltaTable.create(base, root)
    // a concurrent writer wins version 1 while this writer is staging
    val res = appendWithInterference(root, 5) { () =>
      writeRawCommit(root, 1L, Seq("""{"commitInfo":{"operation":"WRITE"}}"""))
    }
    // the fence loser AUTO-RETRIES against the winner's state and lands
    // at version 2 — never a silent double-commit of version 1
    assert(res == Right(2L), s"expected retried commit at v2, got $res")
    // no orphans: on-disk parquet == logged snapshot
    val s = DeltaLog.snapshot(spark, root)
    assert(s.version == 2L)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    def diskParquet(dir: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory) { if (n != "_delta_log" && !n.startsWith(".")) diskParquet(st.getPath) else Nil }
        else if (n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")) Seq(st.getPath.toString)
        else Nil
      }
    def bare(p: String): String = p.stripPrefix("file:")
    assert(diskParquet(rootPath).map(bare).toSet == s.files.map(f => bare(f.path)).toSet,
      "fence loser left orphan staged files in the table dir")
    // exactly once: the retried append's rows appear once
    assert(DeltaTable.read(spark, root).count() == 15)
    assert(DeltaTable.append(base.limit(5), root) == 3L)
    assert(DeltaTable.read(spark, root).count() == 20)
  }

  // --- checkpoint fidelity: protocol/config survive checkpointing

  test("checkpoint persists the table's real protocol and configuration") {
    val root = tmp("graft-delta-ckproto-")
    DeltaTable.create(customer.limit(6), root)
    writeRawCommit(root, 1L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"],"writerFeatures":["appendOnly"]}}""",
      metaDataLine("""{"delta.appendOnly":"true"}""")))
    DeltaTable.checkpoint(spark, root)
    // drop the JSON commits: replay must reconstruct protocol + config
    // from the checkpoint alone
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    writeRawCommit(root, 2L, Seq("""{"commitInfo":{"operation":"NOOP"}}"""))
    fs.delete(new org.apache.hadoop.fs.Path(DeltaLog.logDir(rootPath), f"${0L}%020d.json"), false)
    fs.delete(new org.apache.hadoop.fs.Path(DeltaLog.logDir(rootPath), f"${1L}%020d.json"), false)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.minReaderVersion == 3)
    assert(s.minWriterVersion == 7)
    assert(s.readerFeatures == Set("timestampNtz"))
    assert(s.writerFeatures == Set("appendOnly"))
    assert(s.configuration.get("delta.appendOnly").contains("true"))
    // and the writer gate keeps enforcing append-only from the checkpoint
    intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.create(customer.limit(2), root)
    }
  }

  test("checkpoint carries partition values for a partitioned table") {
    val root = tmp("graft-delta-ckpv-")
    val df = customer.limit(50).withColumn("seg", col("c_mktsegment"))
    DeltaTable.create(df, root, partitionBy = Seq("seg"))
    DeltaTable.checkpoint(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val ck = spark.read.parquet(
      new org.apache.hadoop.fs.Path(DeltaLog.logDir(rootPath),
        f"${0L}%020d.checkpoint.parquet").toString)
    val pvals = ck.where("add.path is not null")
      .selectExpr("add.partitionValues['seg'] as seg").collect().map(_.getString(0))
    assert(pvals.nonEmpty && pvals.forall(v => v != null && v.nonEmpty),
      "checkpoint add rows must carry hive-layout partition values")
  }

  /** Hand-write a single-part checkpoint parquet with an arbitrary row
    * shape (to exercise the checkpoint REPLAY path with protocols our
    * own writer will not produce). */
  private def writeRawCheckpoint(root: String, version: Long,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = DeltaLog.logDir(rootPath)
    val tmpDir = new org.apache.hadoop.fs.Path(dir, ".raw-ckpt-tmp")
    df.repartition(1).write.mode("overwrite").parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(dir,
      f"$version%020d.checkpoint.parquet"))
    fs.delete(tmpDir, true)
  }

  test("protocol gate fires on the checkpoint replay path (unsupported readerFeatures)") {
    val root = tmp("graft-delta-ckgate1-")
    DeltaTable.create(customer.limit(5), root)
    writeRawCheckpoint(root, 0L, spark.sql(
      s"""select named_struct('minReaderVersion', 3, 'minWriterVersion', 7,
         |  'readerFeatures', array('collations')) as protocol,
         |  cast(null as struct<schemaString:string,
         |    partitionColumns:array<string>,
         |    configuration:map<string,string>>) as metaData,
         |  cast(null as struct<path:string, size:bigint,
         |    modificationTime:bigint>) as add
         |union all
         |select null, named_struct('schemaString', '${customer.schema.json}',
         |  'partitionColumns', cast(array() as array<string>),
         |  'configuration', cast(map() as map<string,string>)), null
         |""".stripMargin))
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaLog.snapshot(spark, root)
    }
    assert(err.getMessage.contains("collations"))
  }

  test("checkpoint replay refuses a DV struct it cannot fully decode") {
    val root = tmp("graft-delta-ckgate2-")
    DeltaTable.create(customer.limit(5), root)
    writeRawCheckpoint(root, 0L, spark.sql(
      s"""select named_struct('minReaderVersion', 1, 'minWriterVersion', 2) as protocol,
         |  cast(null as struct<schemaString:string,
         |    partitionColumns:array<string>,
         |    configuration:map<string,string>>) as metaData,
         |  cast(null as struct<path:string, size:bigint, modificationTime:bigint,
         |    deletionVector:struct<storageType:string,cardinality:bigint>>) as add
         |union all
         |select null, named_struct('schemaString', '${customer.schema.json}',
         |  'partitionColumns', cast(array() as array<string>),
         |  'configuration', cast(map() as map<string,string>)), null
         |union all
         |select null, null, named_struct('path', 'f1.parquet',
         |  'size', cast(10 as bigint), 'modificationTime', cast(1 as bigint),
         |  'deletionVector', named_struct('storageType', 'u',
         |    'cardinality', cast(3 as bigint)))
         |""".stripMargin))
    // the checkpoint's DV struct carries only (storageType, cardinality):
    // decoding is impossible, and guessing would resurrect deleted rows
    val err = intercept[UnsupportedDeltaProtocolException] {
      DeltaLog.snapshot(spark, root)
    }
    assert(err.getMessage.contains("deletionVector structs missing"))
  }

  test("protocol gate: v3 table whose only reader feature is timestampNtz reads") {
    val root = tmp("graft-delta-ntz-")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    customer.limit(7).coalesce(1).write.mode("overwrite").parquet(s"$root/staging")
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/staging"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.rename(part, new org.apache.hadoop.fs.Path(s"$root/d.parquet"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/staging"), true)
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/d.parquet"))
    writeRawCommit(root, 0L, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["timestampNtz"]}}""",
      metaDataLine(),
      s"""{"add":{"path":"d.parquet","partitionValues":{},"size":${st.getLen},"modificationTime":${st.getModificationTime},"dataChange":true}}"""))
    assert(DeltaTable.read(spark, root).count() == 7)
  }
}
