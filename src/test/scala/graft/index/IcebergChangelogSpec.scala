package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.IcebergTable

/**
 * Iceberg CHANGELOG scan: inserts from append snapshots, delete rows
 * recovered from newly-added positional delete files by the inverse
 * (semi-join) of the MOR anti-join, replace snapshots transparent,
 * equality-delete snapshots refused — and the streaming source's
 * `readChangeFeed=true` CDC mode over the same machinery.
 */
class IcebergChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  test("changelog: append inserts + positional-delete victims, exact rows") {
    val loc = Files.createTempDirectory("graft-ichg-").toString
    val first = customer.filter(col("c_custkey") < 100)
    IcebergTable.create(first, loc)                               // 1 append
    IcebergTable.append(customer.filter(col("c_custkey") >= 100), loc) // 2
    IcebergTable.deleteWhere(spark, loc, col("c_nationkey") < 5)  // 3 delete

    val feed = IcebergTable.incrementalChanges(spark, loc, 0L)
    val byType = feed.groupBy("_change_type", "_commit_snapshot_id").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byType(("insert", 1L)) == first.count())
    assert(byType(("insert", 2L)) ==
      customer.filter(col("c_custkey") >= 100).count())
    assert(byType(("delete", 3L)) ==
      customer.filter(col("c_nationkey") < 5).count())
    // the delete rows are exactly the predicate's victims
    val victims = feed.filter(col("_change_type") === "delete")
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    val expect = customer.filter(col("c_nationkey") < 5)
      .select("c_custkey").collect().map(_.getLong(0)).sorted
    assert(victims.sameElements(expect))

    // a second delete: only NEW victims appear for its snapshot
    IcebergTable.deleteWhere(spark, loc, col("c_nationkey") < 8)  // 4
    val v4 = IcebergTable.incrementalChanges(spark, loc, 3L)
      .filter(col("_change_type") === "delete")
    assert(v4.count() ==
      customer.filter(col("c_nationkey") >= 5 && col("c_nationkey") < 8).count())
  }

  test("changelog: compaction transparent; equality-delete victims replay") {
    val loc = Files.createTempDirectory("graft-ichg-eq-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 100), loc) // 1
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") < 10)       // 2
    IcebergTable.compact(spark, loc)                                  // 3 replace
    val late = customer.filter(col("c_custkey") >= 100)
    IcebergTable.append(late, loc)                                    // 4
    // since the compaction: only the append shows
    assert(IcebergTable.incrementalChanges(spark, loc, 3L).count() == late.count())

    // equality-delete snapshots serve their victims against the parent
    // LIVE state (here: one key, present, alive → exactly one delete row)
    IcebergTable.deleteWhereEquality(spark, loc,
      customer.filter(col("c_custkey") === 120).select("c_custkey")) // 5
    val feed = IcebergTable.incrementalChanges(spark, loc, 4L)
    val rows = feed.select("_change_type", "c_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows == Seq(("delete", 120L)))
    // a key an earlier delete already removed is NOT a victim again
    IcebergTable.deleteWhereEquality(spark, loc,
      customer.filter(col("c_custkey").isin(5L, 121L)).select("c_custkey")) // 6
    val feed2 = IcebergTable.incrementalChanges(spark, loc, 5L)
      .select("c_custkey").collect().map(_.getLong(0)).toSeq
    assert(feed2 == Seq(121L)) // key 5 was deleted in snapshot 2
  }

  test("graft-iceberg readChangeFeed: deletes stream as change rows") {
    val loc = Files.createTempDirectory("graft-ichg-stream-").toString
    val out = Files.createTempDirectory("graft-ichg-out-").toString
    val ckpt = Files.createTempDirectory("graft-ichg-ck-").toString
    IcebergTable.create(customer, loc)
    def drain(): Long = {
      val q = spark.readStream.format("graft-iceberg")
        .option("readChangeFeed", "true").load(loc)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    assert(drain() == customer.count())
    IcebergTable.deleteWhere(spark, loc, col("c_nationkey") < 5)
    val nDel = customer.filter(col("c_nationkey") < 5).count()
    assert(drain() == customer.count() + nDel)
    val byType = spark.read.parquet(out)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") == customer.count())
    assert(byType("delete") == nDel)
  }
}
