package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable}

/**
 * Delta ROW TRACKING (`rowTracking` writer feature): every
 * file-adding commit assigns fresh disjoint [base, base+numRecords)
 * row-id ranges past the `delta.rowTracking` watermark; re-adds (DV
 * deletes, restore, clone) carry ids unchanged, so `_row_id` is a
 * stable row identity under append/delete/undo — and rewrites
 * (OPTIMIZE) re-identify, the documented non-materializing posture.
 */
class DeltaRowTrackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(): String =
    Files.createTempDirectory("graft-delta-rt-").toString

  private def idsByKey(root: String): Map[Long, Long] =
    DeltaTable.readWithRowIds(spark, root)
      .select($"c_custkey", $"_row_id").as[(Long, Long)]
      .collect().toMap

  test("tracked create + appends: disjoint fresh ranges, unique ids, " +
      "watermark domain and features published") {
    val root = tmp()
    DeltaTable.create(customer.filter($"c_custkey" <= 60), root,
      configuration = Map("delta.enableRowTracking" -> "true"))
    DeltaTable.append(customer.filter($"c_custkey" > 60), root)
    val s = DeltaLog.snapshot(spark, root)
    assert(Set("rowTracking", "domainMetadata").subsetOf(s.writerFeatures))
    assert(s.files.forall(_.baseRowId.isDefined))
    val df = DeltaTable.readWithRowIds(spark, root)
    val ids = df.select($"_row_id").as[Long].collect().toSeq
    assert(ids.size == ids.distinct.size, "row ids collide across files")
    val n = df.count()
    assert(DeltaTable.rowIdHighWaterMark(s) == n - 1,
      s"watermark ${DeltaTable.rowIdHighWaterMark(s)} != ${n - 1}")
    // commit-version stamps: every row carries the version that added
    // its file
    val dcvs = df.select($"_row_commit_version").distinct()
      .as[Long].collect().toSet
    assert(dcvs == Set(0L, 1L), s"commit versions: $dcvs")
  }

  test("ids are STABLE under DV delete and restore; appends never " +
      "reuse retired ranges") {
    val root = tmp()
    DeltaTable.create(customer.filter($"c_custkey" <= 100), root,
      configuration = Map("delta.enableRowTracking" -> "true"))
    val before = idsByKey(root)
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 5 === 0)
    val after = idsByKey(root)
    // survivors keep their exact ids (the DV re-add carries them)
    after.foreach { case (k, id) => assert(before(k) == id,
      s"row $k changed id across a DV delete: ${before(k)} -> $id") }
    // new rows continue past the watermark — deleted ids never recycle
    val hwmBefore = DeltaTable.rowIdHighWaterMark(DeltaLog.snapshot(spark, root))
    DeltaTable.append(customer.filter($"c_custkey" > 100), root)
    val fresh = idsByKey(root).filterNot { case (k, _) => after.contains(k) }
    assert(fresh.values.forall(_ > hwmBefore),
      s"appended ids dipped below the watermark $hwmBefore")
    // restore rewinds content AND identities
    DeltaTable.restore(spark, root, 1L)
    assert(idsByKey(root) == after, "restore did not restore row ids")
  }

  test("enableRowTracking backfills an existing table from its stats") {
    val root = tmp()
    DeltaTable.create(customer.filter($"c_custkey" <= 80), root)
    DeltaTable.append(customer.filter($"c_custkey" > 80), root)
    intercept[IllegalArgumentException] {
      DeltaTable.readWithRowIds(spark, root)
    }
    DeltaTable.enableRowTracking(spark, root)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.forall(_.baseRowId.isDefined))
    val ids = DeltaTable.readWithRowIds(spark, root)
      .select($"_row_id").as[Long].collect().toSeq
    assert(ids.size == 150 && ids.distinct.size == 150)
    assert(ids.max == DeltaTable.rowIdHighWaterMark(s))
  }

  test("ids survive checkpoint replay (after log cleanup) and clone; " +
      "a clone's appends start past the carried watermark") {
    val root = tmp()
    DeltaTable.create(customer.filter($"c_custkey" <= 60), root,
      configuration = Map("delta.enableRowTracking" -> "true"))
    DeltaTable.append(
      customer.filter($"c_custkey" > 60 && $"c_custkey" <= 100), root)
    val orig = idsByKey(root)
    DeltaTable.checkpoint(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val ckptV = DeltaLog.snapshot(spark, root).version
    fs.listStatus(DeltaLog.logDir(new org.apache.hadoop.fs.Path(root)))
      .filter(_.getPath.getName.matches("""\d{20}\.json"""))
      .filter(_.getPath.getName.stripSuffix(".json").toLong < ckptV)
      .foreach(st => fs.delete(st.getPath, false))
    assert(idsByKey(root) == orig, "checkpoint did not carry row ids")
    val cloneRoot = tmp()
    DeltaTable.clone(spark, root, cloneRoot)
    assert(idsByKey(cloneRoot) == orig, "clone did not carry row ids")
    val hwm = DeltaTable.rowIdHighWaterMark(DeltaLog.snapshot(spark, cloneRoot))
    assert(hwm == orig.values.max, "clone lost the watermark domain")
    DeltaTable.append(customer.filter($"c_custkey" > 100), cloneRoot)
    val fresh = idsByKey(cloneRoot).filterNot { case (k, _) => orig.contains(k) }
    assert(fresh.values.forall(_ > hwm),
      "clone append re-assigned ids overlapping the carried files")
  }

  test("OPTIMIZE re-identifies the rows it rewrites (non-materializing " +
      "writer posture); ids stay unique and the watermark only grows") {
    val root = tmp()
    DeltaTable.create(customer.filter($"c_custkey" <= 50), root,
      configuration = Map("delta.enableRowTracking" -> "true"))
    DeltaTable.append(
      customer.filter($"c_custkey" > 50 && $"c_custkey" <= 100), root)
    val hwmBefore = DeltaTable.rowIdHighWaterMark(DeltaLog.snapshot(spark, root))
    val v = DeltaTable.optimizeCompact(spark, root)
    assert(v > 1L, "optimize was a no-op; fixture needs 2+ small files")
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.forall(_.baseRowId.isDefined))
    val ids = DeltaTable.readWithRowIds(spark, root)
      .select($"_row_id").as[Long].collect().toSeq
    assert(ids.size == ids.distinct.size)
    assert(DeltaTable.rowIdHighWaterMark(s) > hwmBefore)
    assert(ids.forall(_ > hwmBefore), "rewritten files kept stale ids")
  }

  test("a foreign materialized-row-id table refuses readWithRowIds") {
    val root = tmp()
    DeltaTable.create(customer.limit(50), root,
      configuration = Map(
        "delta.enableRowTracking" -> "true",
        "delta.rowTracking.materializedRowIdColumnName" -> "_rid_phys"))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.readWithRowIds(spark, root)
    }
    assert(e.getMessage.contains("materializes row ids"))
  }
}
