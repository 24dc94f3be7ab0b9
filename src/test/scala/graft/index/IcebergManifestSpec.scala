package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable, LakeTable}

/**
 * Iceberg FAST APPENDS and MANIFEST COMPACTION. Every append used to
 * rewrite a manifest holding the table's ENTIRE live file set —
 * O(total files) commit metadata, a driver-side funnel that turns a
 * streaming ingest into a quadratic metadata writer at 100 TB. Fast
 * appends reuse the prior snapshot's manifests verbatim and write one
 * O(batch) manifest; `rewriteManifests` (Iceberg's `rewrite_manifests`
 * procedure) compacts the accumulated list back to one data manifest
 * in a row-transparent `replace` snapshot; and past
 * `commit.manifest.min-count-to-merge` data manifests an append merges
 * automatically (Iceberg's manifest-merge behavior).
 */
class IcebergManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def manifests(loc: String): Seq[(String, String, Option[Long])] =
    LakeTable.inspect(spark, loc, "manifests")
      .select("manifest_path", "content", "added_snapshot_id")
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))

  private def dataManifests(loc: String) = manifests(loc).filter(_._2 == "data")

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten.map(_.metrics("numFiles").value).sum
  }

  test("appends are fast: one new manifest per commit, priors reused verbatim") {
    val loc = tmp("graft-ice-fastapp-")
    val slices = (0 until 4).map(i =>
      customer.filter($"c_custkey" % 4 === i))
    IcebergTable.create(slices(0), loc)                            // snap 1
    slices.drop(1).foreach(s => IcebergTable.append(s, loc))       // snaps 2-4

    val dm = dataManifests(loc)
    assert(dm.size == 4, s"expected 4 data manifests, got ${dm.size}")
    // each manifest was added by a distinct commit — nothing rewritten
    assert(dm.flatMap(_._3).sorted == Seq(1L, 2L, 3L, 4L),
      s"added_snapshot_id per manifest: ${dm.flatMap(_._3).sorted}")
    // the create's manifest file is the SAME file still referenced (byte
    // identity via name): fast appends never rewrote it
    assert(dm.exists(_._1.contains("manifest-00001")),
      s"snapshot 1's manifest no longer referenced: ${dm.map(_._1)}")

    // read correctness across the reused manifests, now and back in time
    assert(IcebergTable.read(spark, loc).count() == customer.count())
    assert(IcebergTable.read(spark, loc, snapshotAsOf = Some(2L)).count() ==
      slices(0).count() + slices(1).count())
    // no entry duplication: manifest entries == live files
    val snap = IcebergMeta.snapshot(spark, loc)
    assert(snap.files.map(_.path).distinct.size == snap.files.size)
  }

  test("per-manifest partition summaries keep pruning across fast appends") {
    val loc = tmp("graft-ice-fastapp-prune-")
    val segs = customer.select("c_mktsegment").distinct()
      .as[String].collect().sorted
    assert(segs.size >= 3)
    IcebergTable.create(
      customer.filter($"c_mktsegment" === segs(0)), loc,
      partitionColumns = Seq("c_mktsegment"))
    IcebergTable.append(customer.filter($"c_mktsegment" === segs(1)), loc)
    IcebergTable.append(customer.filter($"c_mktsegment" === segs(2)), loc)
    assert(dataManifests(loc).size == 3)

    val total = scannedFiles(IcebergTable.read(spark, loc)
      .filter($"c_mktsegment".isin(segs.take(3): _*)))
    val pruned = scannedFiles(IcebergTable.read(spark, loc)
      .filter($"c_mktsegment" === segs(1)))
    assert(pruned < total, s"pruning lost: $pruned of $total files")
    assert(IcebergTable.read(spark, loc)
      .filter($"c_mktsegment" === segs(1)).count() ==
      customer.filter($"c_mktsegment" === segs(1)).count())
  }

  test("rewriteManifests compacts to one data manifest, row-transparently") {
    val loc = tmp("graft-ice-rewriteman-")
    IcebergTable.create(customer.filter($"c_custkey" % 3 === 0), loc)
    IcebergTable.append(customer.filter($"c_custkey" % 3 === 1), loc)
    IcebergTable.append(customer.filter($"c_custkey" % 3 === 2), loc)
    assert(dataManifests(loc).size == 3)
    val before = IcebergTable.read(spark, loc)
      .orderBy("c_custkey").collect()

    val sid = IcebergTable.rewriteManifests(spark, loc)
    assert(sid == 4L, s"rewriteManifests published snapshot $sid")
    assert(dataManifests(loc).size == 1,
      s"still ${dataManifests(loc).size} data manifests after rewrite")
    // rows identical, and the snapshot is a row-transparent `replace`:
    // the incremental feed sees NOTHING from it
    assert(IcebergTable.read(spark, loc)
      .orderBy("c_custkey").collect().toSeq == before.toSeq)
    val ops = IcebergTable.history(spark, loc)
      .orderBy("snapshot_id").select("operation")
      .as[String].collect().toSeq
    assert(ops == Seq("append", "append", "append", "replace"), ops.toString)
    assert(IcebergTable.incrementalAppends(spark, loc,
      fromSnapshotId = 3L).count() == 0,
      "a manifest rewrite leaked rows into the incremental feed")

    // rewriting an ALREADY-compact list is a no-op: same snapshot id,
    // no spurious history entry
    assert(IcebergTable.rewriteManifests(spark, loc) == sid)
    assert(IcebergTable.history(spark, loc).count() == 4)

    // an EMPTY fast append (idle micro-batch) reuses the prior list —
    // no zero-entry manifest accumulates; a real append then stacks one
    IcebergTable.append(customer.limit(0), loc)
    assert(dataManifests(loc).size == 1,
      s"an idle append grew the manifest list: ${dataManifests(loc)}")
    val extra = customer.filter($"c_custkey" <= 5)
      .withColumn("c_custkey", $"c_custkey" + 1000000L)
    IcebergTable.append(extra, loc)
    assert(dataManifests(loc).size == 2)
    assert(IcebergTable.read(spark, loc).count() ==
      customer.count() + extra.count())
  }

  test("past commit.manifest.min-count-to-merge an append merges the list") {
    val loc = tmp("graft-ice-mergemin-")
    spark.conf.set("spark.graft.iceberg.manifestMergeMinCount", "3")
    try {
      IcebergTable.create(customer.filter($"c_custkey" % 4 === 0), loc)
      IcebergTable.append(customer.filter($"c_custkey" % 4 === 1), loc)
      IcebergTable.append(customer.filter($"c_custkey" % 4 === 2), loc)
      assert(dataManifests(loc).size == 3)
      // 3 + 1 > 3: this append takes the merge path — ONE manifest out
      IcebergTable.append(customer.filter($"c_custkey" % 4 === 3), loc)
      assert(dataManifests(loc).size == 1,
        s"merge did not trigger: ${dataManifests(loc).size} manifests")
      assert(IcebergTable.read(spark, loc).count() == customer.count())
    } finally spark.conf.unset("spark.graft.iceberg.manifestMergeMinCount")
  }

  test("equality-delete ordering survives manifest reuse") {
    val loc = tmp("graft-ice-fastapp-eqdel-")
    val rows = customer.filter($"c_custkey" <= 50)
    val doomedKeys = rows.filter($"c_custkey" <= 25)
    val reAdded = rows.filter($"c_custkey" <= 10)
    IcebergTable.create(rows, loc)                                 // seq 1
    // equality-delete part of the keys (delete file at seq 2)
    IcebergTable.deleteWhereEquality(spark, loc,
      doomedKeys.select("c_custkey"))
    val survivors = rows.count() - doomedKeys.count()
    assert(IcebergTable.read(spark, loc).count() == survivors)
    // fast-append rows REUSING deleted keys: their seq (3) is past the
    // delete's (2), so they must SURVIVE the reused delete manifest
    IcebergTable.append(reAdded, loc)
    val dm = manifests(loc)
    assert(dm.count(_._2 == "deletes") == 1, dm.toString)
    val got = IcebergTable.read(spark, loc)
    assert(got.count() == survivors + reAdded.count(),
      s"expected $survivors survivors + ${reAdded.count()} re-added")
    assert(got.filter($"c_custkey" <= 10).count() == reAdded.count(),
      "re-appended keys were eaten by an older equality delete")
  }

  test("expiration never deletes a manifest shared with a retained snapshot") {
    val loc = tmp("graft-ice-fastapp-expire-")
    IcebergTable.create(customer.filter($"c_custkey" % 2 === 0), loc)
    IcebergTable.append(customer.filter($"c_custkey" % 2 === 1), loc)
    val shared = dataManifests(loc)
    assert(shared.size == 2)
    // snapshot 1's manifest is referenced by BOTH snapshots: expiring
    // snapshot 1 must not delete it
    val doomed = IcebergTable.expireSnapshots(spark, loc, keepLast = 1,
      deleteFiles = true)
    assert(!doomed.exists(_.contains("manifest-00001")),
      s"shared manifest deleted: $doomed")
    assert(IcebergTable.read(spark, loc).count() == customer.count())
  }
}
