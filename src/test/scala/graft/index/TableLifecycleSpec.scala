package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, IcebergMeta, IcebergTable}

/**
 * Table LIFECYCLE operations: Delta commitInfo provenance + `history`,
 * `vacuum` (unreferenced-file cleanup honoring retention and liveness),
 * and Iceberg `expireSnapshots` (metadata trim + only-expired-referenced
 * file deletion) — the maintenance every long-lived 100 TB table needs.
 */
class TableLifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  // --------------------------------------------------------- history

  test("history lists every commit newest-first with operations") {
    val root = Files.createTempDirectory("graft-hist-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)
    DeltaTable.append(customer.filter(col("c_custkey") >= 100), root)
    DeltaTable.deleteWhere(spark, root, col("c_custkey") === 5L)
    val h = DeltaTable.history(spark, root).collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("DELETE", "WRITE", "CREATE TABLE AS SELECT"))
    assert(h.forall(!_.isNullAt(1)))
  }

  test("history tolerates commits without commitInfo (falls back to mtime)") {
    val root = Files.createTempDirectory("graft-hist-legacy-").toString
    DeltaTable.create(customer.limit(5), root)
    // strip the commitInfo line from v0, as a legacy writer's log would be
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val p = new Path(root, "_delta_log/00000000000000000000.json")
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(_.contains("commitInfo")).toList
    finally in.close()
    val out = fs.create(p, true)
    try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val h = DeltaTable.history(spark, root).collect()
    assert(h.length == 1 && h.head.isNullAt(2) && !h.head.isNullAt(1))
  }

  // ---------------------------------------------------------- vacuum

  test("vacuum removes only unreferenced files past retention; reads survive") {
    val root = Files.createTempDirectory("graft-vac-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)   // v0 files
    DeltaTable.create(customer.filter(col("c_custkey") >= 100), root)  // v1 overwrite
    val expect = customer.filter(col("c_custkey") >= 100).count()

    // within retention nothing is eligible (the overwritten files are young)
    assert(DeltaTable.vacuum(spark, root, retentionMs = 3600 * 1000L).isEmpty)
    // dry run lists the v0 files without touching them
    val listed = DeltaTable.vacuum(spark, root, retentionMs = 0L, dryRun = true)
    assert(listed.nonEmpty)
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L)).count() ==
      customer.filter(col("c_custkey") < 100).count())
    // real vacuum: current reads fine, time travel to v0 is gone
    val deleted = DeltaTable.vacuum(spark, root, retentionMs = 0L)
    assert(deleted.toSet == listed.toSet)
    assert(DeltaTable.read(spark, root).count() == expect)
    intercept[Exception] {
      DeltaTable.read(spark, root, versionAsOf = Some(0L)).collect()
    }
  }

  test("vacuum keeps live DV files and cleans aged cdc files") {
    val root = Files.createTempDirectory("graft-vac-dv-").toString
    DeltaTable.create(customer, root,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaTable.deleteWhere(spark, root, col("c_custkey") < 10)
    val expect = customer.filter(col("c_custkey") >= 10).count()
    val deleted = DeltaTable.vacuum(spark, root, retentionMs = 0L)
    // the cdc file ages out (it only serves CDF reads within retention);
    // the DV file and every data file stay — they serve the head version
    assert(deleted.nonEmpty && deleted.forall(_.contains("_change_data")))
    assert(DeltaTable.read(spark, root).count() == expect)
  }

  test("vacuum keys retention off the tombstone, not the file's mtime") {
    val root = Files.createTempDirectory("graft-vac-ts-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)   // v0
    // age the v0 DATA files far past any retention window
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(root))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .foreach(st => fs.setTimes(st.getPath, 1000L, -1))
    DeltaTable.create(customer.filter(col("c_custkey") >= 100), root)  // v1: tombstones v0 NOW
    // files written long ago but removed minutes ago must survive the
    // window — time travel and concurrent snapshot readers depend on it
    assert(DeltaTable.vacuum(spark, root, retentionMs = 3600 * 1000L).isEmpty)
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L)).count() ==
      customer.filter(col("c_custkey") < 100).count())
    // once the TOMBSTONE ages out they go
    assert(DeltaTable.vacuum(spark, root, retentionMs = 0L).nonEmpty)
    intercept[Exception] {
      DeltaTable.read(spark, root, versionAsOf = Some(0L)).collect()
    }
  }

  // ---------------------------------------------- in-commit timestamps

  test("ICT: time travel resolves by the table clock, not file mtimes") {
    val root = Files.createTempDirectory("graft-ict-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)  // v0
    DeltaTable.enableInCommitTimestamps(spark, root)                  // v1
    DeltaTable.append(customer.filter(col("c_custkey") >= 100), root) // v2

    val s = DeltaLog.snapshot(spark, root)
    assert(s.writerFeatures.contains("inCommitTimestamp"))
    assert(s.configuration.get("delta.inCommitTimestampEnablementVersion")
      .contains("1"))

    // sabotage every commit file's mtime: a restore/copy would do this
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val dir = new Path(root, "_delta_log")
    (0L to 2L).foreach { v =>
      fs.setTimes(new Path(dir, f"$v%020d.json"), 1000L + v, -1)
    }
    // the ICT commits (v1, v2) still resolve by their in-commit clock:
    // a timestamp far in the future lands on the head version with all
    // rows — under mtime resolution the same query would also pick the
    // head, so pin the mixed boundary instead: just BEFORE v2's ICT
    // must serve v1's content (the pre-append table)
    val h = DeltaTable.history(spark, root).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(h(2L) > h(1L), "ICTs must be strictly increasing")
    assert(DeltaTable.readTimestampAsOf(spark, root, h(2L)).count() ==
      customer.count())
    assert(DeltaTable.readTimestampAsOf(spark, root, h(2L) - 1).count() ==
      customer.filter(col("c_custkey") < 100).count())
  }

  test("ICT: monotone even when the wall clock repeats a millisecond") {
    val root = Files.createTempDirectory("graft-ict-mono-").toString
    DeltaTable.create(customer.limit(10), root)
    DeltaTable.enableInCommitTimestamps(spark, root)
    // commits faster than the clock ticks: ICTs must still be strict
    (1 to 3).foreach(_ => DeltaTable.append(customer.limit(1), root))
    val ts = DeltaTable.history(spark, root).collect()
      .sortBy(_.getLong(0)).drop(1).map(_.getTimestamp(1).getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b },
      s"ICTs not strictly increasing: ${ts.mkString(",")}")
  }

  // ------------------------------------------------- expireSnapshots

  test("expireSnapshots trims history and deletes only-expired files") {
    val loc = Files.createTempDirectory("graft-exp-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 100), loc)   // 1
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") < 10)         // 2
    IcebergTable.compact(spark, loc)                                    // 3 replace
    val expect = customer
      .filter(col("c_custkey") >= 10 && col("c_custkey") < 100).count()
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    val preFiles = fs.listStatus(new Path(loc, "data")).length

    val doomed = IcebergTable.expireSnapshots(spark, loc, keepLast = 1)
    assert(doomed.nonEmpty)
    // current read unaffected; pre-compaction files + delete files gone
    assert(IcebergTable.read(spark, loc).count() == expect)
    assert(fs.listStatus(new Path(loc, "data")).length < preFiles)
    // expired snapshots no longer time-travelable
    intercept[IllegalArgumentException] {
      IcebergTable.read(spark, loc, snapshotAsOf = Some(1L)).collect()
    }
    // incremental scan into the expired range fails loudly, not wrongly
    intercept[IllegalArgumentException] {
      IcebergTable.incrementalAppends(spark, loc, 1L)
    }
    // nothing further to expire: a second call is a no-op
    assert(IcebergTable.expireSnapshots(spark, loc, keepLast = 1).isEmpty)
  }

  test("expireSnapshots keepLast retains recent lineage for incremental reads") {
    val loc = Files.createTempDirectory("graft-exp-keep-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 50), loc)    // 1
    IcebergTable.append(customer.filter(col("c_custkey").between(50, 99)), loc) // 2
    val late = customer.filter(col("c_custkey") >= 100)
    IcebergTable.append(late, loc)                                      // 3
    IcebergTable.expireSnapshots(spark, loc, keepLast = 2)
    // snapshots 2 and 3 retained: since-2 incremental still serves
    assert(IcebergTable.incrementalAppends(spark, loc, 2L).count() == late.count())
    // appends share every earlier file, so nothing was only-expired
    assert(IcebergTable.read(spark, loc).count() == customer.count())
    intercept[IllegalArgumentException] {
      IcebergTable.read(spark, loc, snapshotAsOf = Some(1L)).collect()
    }
  }
}
