package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, LakeTable}

/**
 * Delta orphan sweep: [[DeltaTable.removeOrphans]] must delete ONLY
 * files no retained log state references — crash-leftover staging
 * junk — and NEVER a file a historical version still references, so
 * time travel inside the retention window keeps working. (Routing the
 * sweep to VACUUM would delete tombstoned historical files too and
 * silently truncate time travel — the failure mode this spec pins.)
 */
class DeltaOrphanFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  test("orphans sweep; historical files survive; time travel intact") {
    val root = Files.createTempDirectory("graft-orphan-d-").toString
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val v0Rows = orders.limit(100)
    DeltaTable.create(v0Rows, root)
    // v1 OVERWRITES v0: v0's files become tombstoned history — still
    // referenced by the retained log, still time-travelable
    DeltaTable.create(orders.limit(40), root)

    // plant orphan junk: a stray parquet at the root and one in a
    // staging-style subdirectory, both never mentioned by the log
    orders.limit(3).coalesce(1).write
      .parquet(s"$root/.graft-tmp-stage/x")
    val stray = fs.globStatus(new Path(s"$root/.graft-tmp-stage/x/*.parquet"))
      .head.getPath
    fs.rename(stray, new Path(root, "stray-junk.parquet"))
    fs.delete(new Path(s"$root/.graft-tmp-stage"), true)
    val strayDir = new Path(root, "junkdir")
    fs.mkdirs(strayDir)
    orders.limit(2).coalesce(1).write.parquet(s"$root/junkdir/inner")

    val before = DeltaTable.read(spark, root, versionAsOf = Some(0L))
      .agg(sum($"o_orderkey")).head().getLong(0)

    // dry run reports, deletes nothing
    val wouldRemove = LakeTable.removeOrphans(spark, root,
      System.currentTimeMillis() + 1000, dryRun = true)
    assert(wouldRemove.exists(_.contains("stray-junk")), wouldRemove.toString)
    assert(fs.exists(new Path(root, "stray-junk.parquet")))

    val removed = LakeTable.removeOrphans(spark, root,
      System.currentTimeMillis() + 1000)
    assert(removed.exists(_.contains("stray-junk")))
    assert(removed.exists(_.contains("junkdir")))
    assert(!fs.exists(new Path(root, "stray-junk.parquet")))

    // the table head still reads, and — the point — v0 time travel
    // still serves from its (tombstoned but referenced) files
    assert(DeltaTable.read(spark, root).count() == 40)
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L))
      .agg(sum($"o_orderkey")).head().getLong(0) == before,
      "removeOrphans must not truncate time travel (that is VACUUM's " +
        "documented trade)")

    // the age gate: a FRESH orphan (mtime after the cutoff) survives
    orders.limit(1).coalesce(1).write.parquet(s"$root/fresh-stage")
    val removed2 = LakeTable.removeOrphans(spark, root,
      System.currentTimeMillis() - 3600 * 1000)
    assert(removed2.isEmpty)
    assert(fs.exists(new Path(root, "fresh-stage")))
  }

  test("crash-leftover .graft-* staging dirs ARE swept; foreign dot-dirs stay") {
    val root = Files.createTempDirectory("graft-orphan-stage-").toString
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    DeltaTable.create(orders.limit(20), root)
    // a crashed OPTIMIZE leaves its staging dir behind
    orders.limit(3).coalesce(1).write
      .parquet(s"$root/.graft-optimize-deadbeef/0")
    // a foreign tool's dot-dir must NOT be touched
    orders.limit(2).coalesce(1).write.parquet(s"$root/.foreign-tool/x")

    val removed = LakeTable.removeOrphans(spark, root,
      System.currentTimeMillis() + 1000)
    assert(removed.exists(_.contains(".graft-optimize-deadbeef")),
      s"staging leftovers not swept: $removed")
    assert(!fs.exists(new Path(root, ".graft-optimize-deadbeef")),
      "emptied staging dir should be pruned")
    assert(fs.exists(new Path(root, ".foreign-tool")),
      "foreign dot-dirs are not ours to delete")
    assert(DeltaTable.read(spark, root).count() == 20)
  }

  test("a refused DROP COLUMN leaves the table unmutated (no premature " +
      "column-mapping commit)") {
    val root = Files.createTempDirectory("graft-drop-atomic-").toString
    DeltaTable.create(orders.limit(10)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.col("o_totalprice")), root)
    val before = DeltaLog.snapshot(spark, root)
    assert(!before.configuration.contains("delta.columnMapping.mode"))
    // refusals: unknown column, and (after adding none) the would-be
    // only-column guard — all must throw BEFORE any commit
    intercept[Exception] {
      DeltaTable.dropColumn(spark, root, "nope")
    }
    val after = DeltaLog.snapshot(spark, root)
    assert(after.version == before.version,
      "a refused drop must not commit anything")
    assert(!after.configuration.contains("delta.columnMapping.mode"),
      "a refused drop must not enable column mapping")
    // case-insensitive resolution (Spark's default): dropping by a
    // different case works and drops the REAL column
    DeltaTable.dropColumn(spark, root, "O_TOTALPRICE")
    assert(DeltaTable.read(spark, root).schema.fieldNames.toSeq ==
      Seq("o_orderkey"))
  }

  test("orphan sweep respects checkpoint-only references after log cleanup") {
    val root = Files.createTempDirectory("graft-orphan-ck-").toString
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    DeltaTable.create(orders.limit(50), root)
    DeltaTable.append(orders.limit(10), root)
    DeltaTable.checkpoint(spark, root)
    // drop commit 0 from the log: the checkpoint is now the only
    // record referencing version-0 files
    fs.delete(new Path(root, "_delta_log/00000000000000000000.json"), false)

    val removed = DeltaTable.removeOrphans(spark, root,
      System.currentTimeMillis() + 1000)
    assert(removed.isEmpty,
      s"files referenced only by the checkpoint were swept: $removed")
    assert(DeltaTable.read(spark, root).count() == 60)
  }
}
