package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.IcebergTable

/**
 * Iceberg INCREMENTAL APPEND scan: parent-snapshot-id lineage walk,
 * per-snapshot added-file diffing, `replace` (compaction) transparency,
 * strict refusal vs upstream-style skipping of row-deleting snapshots,
 * and range-boundary semantics (from exclusive, to inclusive).
 */
class IcebergIncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  test("append chain: per-snapshot slices, boundaries exclusive/inclusive") {
    val loc = Files.createTempDirectory("graft-ice-inc-").toString
    val s1 = customer.filter(col("c_custkey") < 50)
    val s2 = customer.filter(col("c_custkey").between(50, 99))
    val s3 = customer.filter(col("c_custkey") >= 100)
    IcebergTable.create(s1, loc)   // snapshot 1
    IcebergTable.append(s2, loc)   // snapshot 2
    IcebergTable.append(s3, loc)   // snapshot 3

    val all = IcebergTable.incrementalAppends(spark, loc, 0L)
    assert(all.count() == customer.count())
    val bysnap = all.groupBy("_commit_snapshot_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bysnap == Map(1L -> s1.count(), 2L -> s2.count(), 3L -> s3.count()))
    assert(all.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("insert"))
    assert(all.filter(col("_commit_timestamp").isNull).count() == 0)

    // from is EXCLUSIVE: since snapshot 1 → only snapshots 2 and 3
    val since1 = IcebergTable.incrementalAppends(spark, loc, 1L)
    assert(since1.count() == s2.count() + s3.count())
    // to is INCLUSIVE and pins the upper end
    val only2 = IcebergTable.incrementalAppends(spark, loc, 1L, Some(2L))
    assert(only2.count() == s2.count())
    assert(only2.select("_commit_snapshot_id").distinct()
      .head().getLong(0) == 2L)
    // empty range: from == to
    assert(IcebergTable.incrementalAppends(spark, loc, 3L).count() == 0)
  }

  test("compaction (replace) in range contributes no rows, appends still do") {
    val loc = Files.createTempDirectory("graft-ice-inc-compact-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 100), loc)  // 1
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") < 10)        // 2
    IcebergTable.compact(spark, loc)                                   // 3 replace
    val late = customer.filter(col("c_custkey") >= 100)
    IcebergTable.append(late, loc)                                     // 4

    // since the compaction: only the real append shows, not the rewrite
    val sinceCompact = IcebergTable.incrementalAppends(spark, loc, 3L)
    assert(sinceCompact.count() == late.count())
    assert(sinceCompact.select("_commit_snapshot_id").distinct()
      .head().getLong(0) == 4L)
  }

  test("strict refuses delete snapshots; strict=false skips them") {
    val loc = Files.createTempDirectory("graft-ice-inc-del-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 100), loc)  // 1
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") < 10)        // 2
    val late = customer.filter(col("c_custkey") >= 100)
    IcebergTable.append(late, loc)                                     // 3

    val e = intercept[UnsupportedOperationException] {
      IcebergTable.incrementalAppends(spark, loc, 1L).collect()
    }
    assert(e.getMessage.contains("'delete' operation"))
    // upstream appends-between semantics on request
    val relaxed = IcebergTable.incrementalAppends(spark, loc, 1L, strict = false)
    assert(relaxed.count() == late.count())
  }

  test("unknown or non-ancestor fromSnapshotId fails loudly") {
    val loc = Files.createTempDirectory("graft-ice-inc-bad-").toString
    IcebergTable.create(customer.limit(10), loc)
    intercept[IllegalArgumentException] {
      IcebergTable.incrementalAppends(spark, loc, 99L)
    }
  }
}
