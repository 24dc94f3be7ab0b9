package graft.index

import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, GroupJobs, IcebergMeta, IcebergTable}

/**
 * OPTIMIZE rewrite groups must run CONCURRENTLY from the bounded pool,
 * not group-by-group on the driver — at 100 TB a fragmented table has
 * thousands of bin groups and a sequential loop turns maintenance into
 * wall = Σ(groups).
 *
 * The proof uses [[GroupJobs.beforeGroup]], a test seam invoked on the
 * worker thread as each group starts: a 2-party CyclicBarrier there can
 * only release if TWO groups are in flight at the same instant. A
 * sequential implementation deadlocks the barrier and the await(timeout)
 * throws — deterministic, no listener timing races.
 */
class OptimizeConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  private def withBarrier[T](parties: Int)(body: => T): T = {
    val barrier = new CyclicBarrier(parties)
    val hits = new AtomicInteger()
    GroupJobs.beforeGroup = { _ =>
      // only the first `parties` arrivals rendezvous; later groups
      // (or re-runs on the same thread) pass straight through
      if (hits.incrementAndGet() <= parties) {
        barrier.await(30, TimeUnit.SECONDS)
      }
    }
    try body finally GroupJobs.beforeGroup = _ => ()
  }

  test("GroupJobs runs groups concurrently, keeps input order, bounds the pool") {
    val barrier = new CyclicBarrier(2)
    val out = GroupJobs.mapConcurrently(spark, Seq(10, 20, 30, 40)) { (v, i) =>
      if (i < 2) barrier.await(30, TimeUnit.SECONDS)
      v + i
    }
    assert(out == Seq(10, 21, 32, 43), "results must keep input order")
  }

  test("GroupJobs propagates the first failure and cancels the rest") {
    val e = intercept[IllegalStateException] {
      GroupJobs.mapConcurrently(spark, Seq(1, 2, 3, 4)) { (v, _) =>
        if (v == 2) throw new IllegalStateException("group 2 failed")
        v
      }
    }
    assert(e.getMessage == "group 2 failed")
  }

  test("GroupJobs honors spark.graft.optimize.maxThreads=1 (inline, no pool)") {
    spark.conf.set(GroupJobs.MaxThreadsKey, "1")
    try {
      val caller = Thread.currentThread()
      val threads = GroupJobs.mapConcurrently(spark, Seq(1, 2, 3)) { (_, _) =>
        Thread.currentThread()
      }
      assert(threads.forall(_ eq caller),
        "maxThreads=1 must run every group inline on the caller thread")
    } finally spark.conf.unset(GroupJobs.MaxThreadsKey)
  }

  test("Delta OPTIMIZE bin-pack rewrites >=2 groups concurrently") {
    val root = Files.createTempDirectory("graft-opt-conc-").toString
    // two hive partitions x 4 small files each -> two bin groups
    DeltaTable.create(
      orders.withColumn("bucket", col("o_orderkey") % 2).repartition(8),
      root, partitionBy = Seq("bucket"))
    val before = DeltaTable.read(spark, root)
      .agg(sum(col("o_totalprice")).cast("decimal(28,6)")).head().getDecimal(0)

    withBarrier(2) { DeltaTable.optimizeCompact(spark, root) }

    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.size == 2, "each partition packs to one file")
    assert(DeltaTable.read(spark, root)
      .agg(sum(col("o_totalprice")).cast("decimal(28,6)")).head()
      .getDecimal(0) == before)
  }

  test("Iceberg compactSmall rewrites >=2 bins concurrently") {
    val root = Files.createTempDirectory("graft-ice-conc-").toString
    IcebergTable.create(
      orders.withColumn("bucket", col("o_orderkey") % 2).repartition(8),
      root, partitionColumns = Seq("bucket"))
    val before = IcebergTable.read(spark, root)
      .agg(sum(col("o_totalprice")).cast("decimal(28,6)")).head().getDecimal(0)

    withBarrier(2) { IcebergTable.compactSmall(spark, root) }

    val s = IcebergMeta.snapshot(spark, root)
    assert(s.files.size == 2, "each partition packs to one file")
    assert(IcebergTable.read(spark, root)
      .agg(sum(col("o_totalprice")).cast("decimal(28,6)")).head()
      .getDecimal(0) == before)
  }
}
