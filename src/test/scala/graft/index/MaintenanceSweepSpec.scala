package graft.index

import java.nio.file.Files
import java.util.concurrent.{CyclicBarrier, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, FsSweep, IcebergTable}

/**
 * The maintenance sweeps (VACUUM / removeOrphans) must LIST and DELETE
 * in parallel — at a 100 TB table the old driver-serial recursive walk
 * plus one-at-a-time deletes is hours of filesystem RPC (delta-spark
 * distributes its VACUUM listing for the same reason). Concurrency is
 * proved with the [[FsSweep]] test seams and a 2-party barrier that can
 * only release if two workers are in flight at once (the
 * OptimizeConcurrencySpec pattern — deterministic, no timing races).
 *
 * Also pinned here: the orphan sweep's DISTRIBUTED ANTI-JOIN leg (past
 * `spark.graft.maintenance.antiJoinBytes` of checkpoint parquet the
 * driver membership set is replaced by a left-anti join) must agree
 * exactly with the driver-set leg; and directory pruning must touch
 * ONLY directories the sweep itself emptied — a pre-existing empty dir
 * may be an in-flight writer's fresh stage (the race a blanket
 * empty-dir delete invites).
 */
class MaintenanceSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def hadoopFs(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Rendezvous the first two POOL-thread arrivals; inline (caller-
    * thread) seam hits pass through so single-item levels can't
    * deadlock the barrier. */
  private def poolBarrier(install: (Int => Unit) => Unit,
      uninstall: () => Unit)(body: => Unit): Unit = {
    val barrier = new CyclicBarrier(2)
    val hits = new AtomicInteger()
    install { _ =>
      if (Thread.currentThread().getName.startsWith("graft-sweep") &&
          hits.incrementAndGet() <= 2) {
        barrier.await(30, TimeUnit.SECONDS)
      }
    }
    try body finally uninstall()
  }

  test("vacuum deletes run on >=2 concurrent workers") {
    val root = tmp("graft-sweep-del-")
    DeltaTable.create(orders.limit(2000).repartition(16), root) // v0: 16 files
    DeltaTable.create(orders.limit(10), root)                   // v1 overwrite
    poolBarrier(f => FsSweep.beforeDeleteBatch = f,
        () => FsSweep.beforeDeleteBatch = _ => ()) {
      val deleted = DeltaTable.vacuum(spark, root, retentionMs = 0L)
      assert(deleted.size >= 16, s"expected >=16 vacuumed files: $deleted")
    }
    assert(DeltaTable.read(spark, root).count() == 10)
  }

  test("the walk lists sibling directories concurrently") {
    val root = tmp("graft-sweep-list-")
    // 4 hive partition dirs -> the walk's level-2 frontier has 4 dirs
    DeltaTable.create(
      orders.limit(400).withColumn("b", col("o_orderkey") % 4),
      root, partitionBy = Seq("b"))
    poolBarrier(f => FsSweep.beforeListDir = f,
        () => FsSweep.beforeListDir = _ => ()) {
      // dryRun: pure walk, no deletes
      val listed = DeltaTable.vacuum(spark, root,
        retentionMs = 0L, dryRun = true)
      assert(listed.isEmpty, "nothing is unreferenced yet")
    }
  }

  test("a level past the fan-out threshold escalates to a Spark job " +
      "(listener-observed) and lists exactly what the pool walk lists; " +
      "the threshold defaults sanely") {
    assert(FsSweep.distributedListDirs(spark) == 10000, "default threshold")
    val root = tmp("graft-sweep-dist-")
    val fs = hadoopFs(root)
    (0 until 6).foreach { i =>
      orders.limit(10).coalesce(1).write.parquet(s"$root/part_$i")
    }
    def walkAll(): Seq[(String, Long, Long)] =
      FsSweep.walk(spark, fs, new Path(root), ())((_, _) => Some(()))
        .map(f => (f._1.getPath.toString, f._1.getLen,
          f._1.getModificationTime)).sorted
    val viaPool = walkAll() // default threshold: driver pool
    assert(viaPool.nonEmpty)

    val jobs = new AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (Option(js.properties).exists(p =>
            p.getProperty("spark.job.description") ==
              FsSweep.DistributedListJobDescription))
          jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    spark.conf.set(FsSweep.DistributedListDirsKey, "4")
    val viaJob =
      try walkAll() // 6-dir level >= 4: the job path
      finally spark.conf.unset(FsSweep.DistributedListDirsKey)
    // byte-identical listing incl. the sizes and mtimes the age gates
    // read — the job path must be a drop-in for the pool path
    assert(viaJob == viaPool, s"job listing diverged:\n$viaJob\nvs\n$viaPool")
    val deadline = System.currentTimeMillis() + 15000
    while (jobs.get() == 0 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() >= 1, "no distributed listing job observed")
  }

  test("anti-join membership agrees with the driver set (checkpoint + DV)") {
    val root = tmp("graft-sweep-aj-")
    val fs = hadoopFs(root)
    DeltaTable.create(orders.limit(50), root)
    DeltaTable.deleteWhere(spark, root, col("o_orderkey") % 7 === 0) // DV
    DeltaTable.append(orders.limit(10), root)
    DeltaTable.checkpoint(spark, root)
    // checkpoint-only references: drop the early commits from the log
    fs.delete(new Path(root, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new Path(root, "_delta_log/00000000000000000001.json"), false)
    // plant one true orphan
    orders.limit(2).coalesce(1).write.parquet(s"$root/junk")
    val cutoff = System.currentTimeMillis() + 1000

    val viaSet = DeltaTable.removeOrphans(spark, root, cutoff, dryRun = true)
    spark.conf.set(FsSweep.AntiJoinBytesKey, "1") // force the anti-join leg
    val viaJoin =
      try DeltaTable.removeOrphans(spark, root, cutoff, dryRun = true)
      finally spark.conf.unset(FsSweep.AntiJoinBytesKey)
    assert(viaSet.toSet == viaJoin.toSet,
      s"anti-join and driver-set legs diverged:\n set=$viaSet\njoin=$viaJoin")
    assert(viaJoin.exists(_.contains("junk")), viaJoin.toString)
    // every checkpoint-referenced file (incl. the DV) survives the
    // anti-join leg for real
    spark.conf.set(FsSweep.AntiJoinBytesKey, "1")
    try DeltaTable.removeOrphans(spark, root, cutoff)
    finally spark.conf.unset(FsSweep.AntiJoinBytesKey)
    assert(DeltaTable.read(spark, root).count() ==
      50 - orders.limit(50).filter(col("o_orderkey") % 7 === 0).count() + 10)
  }

  test("only directories the sweep itself emptied are pruned") {
    val root = tmp("graft-sweep-prune-")
    val fs = hadoopFs(root)
    DeltaTable.create(orders.limit(20), root)
    // a pre-existing EMPTY dir (e.g. a writer's fresh stage, or a
    // foreign tool's mkdir) must survive the sweep
    fs.mkdirs(new Path(root, "emptydir"))
    fs.mkdirs(new Path(root, ".graft-inflight")) // fresh: in-flight writer
    // an OLD empty staging dir (crashed before staging a file) goes —
    // under the age gate
    fs.mkdirs(new Path(root, ".graft-dead"))
    fs.setTimes(new Path(root, ".graft-dead"), 1000L, -1)
    // an old orphan chain: junk/inner/<file> — swept, chain pruned
    // (written via fs directly so no _SUCCESS marker blocks the prune)
    val junkFile = new Path(root, "junk/inner/file.bin")
    val out = fs.create(junkFile)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    fs.setTimes(junkFile, 1000L, -1)

    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    val removed = DeltaTable.removeOrphans(spark, root, cutoff)
    assert(removed.exists(_.contains("junk/inner")), removed.toString)
    assert(!fs.exists(new Path(root, "junk")),
      "the sweep emptied junk/inner, so the chain must be pruned")
    assert(fs.exists(new Path(root, "emptydir")),
      "a pre-existing empty dir was pruned — the in-flight-writer race")
    assert(fs.exists(new Path(root, ".graft-inflight")),
      "a FRESH empty staging dir was deleted under the age gate")
    assert(!fs.exists(new Path(root, ".graft-dead")),
      "an aged-out empty staging dir must be removed")
    assert(DeltaTable.read(spark, root).count() == 20)
  }

  test("iceberg orphan deletes run on >=2 concurrent workers") {
    val root = tmp("graft-sweep-ice-")
    val fs = hadoopFs(root)
    IcebergTable.create(orders.limit(100), root)
    // plant 16 orphan files under data/
    (0 until 4).foreach(i =>
      orders.limit(2).repartition(4).write.parquet(s"$root/data/orph$i"))
    FsSweep.walk(spark, fs, new Path(s"$root/data"), ())((_, _) => Some(()))
      .foreach { case (st, _) =>
        if (st.getPath.toString.contains("orph"))
          fs.setTimes(st.getPath, 1000L, -1)
      }
    poolBarrier(f => FsSweep.beforeDeleteBatch = f,
        () => FsSweep.beforeDeleteBatch = _ => ()) {
      val removed = IcebergTable.removeOrphanFiles(spark, root)
      assert(removed.size >= 8, s"expected >=8 orphans removed: $removed")
    }
    assert(IcebergTable.read(spark, root).count() == 100)
  }
}
