package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable}

/**
 * Delta OPTIMIZE: bin-packed small-file compaction (per partition,
 * dataChange=false so change feeds and append streams serve nothing),
 * OPTIMIZE ZORDER BY clustering that tightens per-file stats for
 * multi-column pruning, and the no-op/refusal edges.
 */
class DeltaOptimizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def dataFileCount(root: String): Int =
    DeltaLog.snapshot(spark, root).files.size

  test("bin-pack: many small files collapse, content identical, feeds silent") {
    val root = Files.createTempDirectory("graft-opt-").toString
    DeltaTable.create(orders.repartition(8), root,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    assert(dataFileCount(root) == 8)
    val before = DeltaTable.read(spark, root)
      .select(sum(col("o_orderkey"))).head().getLong(0)

    val v = DeltaTable.optimizeCompact(spark, root)
    assert(v == 1L)
    assert(dataFileCount(root) < 8, "small files should have been packed")
    assert(DeltaTable.read(spark, root)
      .select(sum(col("o_orderkey"))).head().getLong(0) == before)
    // dataChange=false: the CDF serves NOTHING for the optimize commit
    assert(DeltaTable.changes(spark, root, 1L).count() == 0)
    // a second optimize finds nothing to do
    assert(DeltaTable.optimizeCompact(spark, root) <=
      DeltaLog.snapshot(spark, root).version)
    // history names the operation
    assert(DeltaTable.history(spark, root).collect()
      .map(_.getString(2)).contains("OPTIMIZE"))
  }

  test("bin-pack respects hive partitions (no cross-partition packing)") {
    val root = Files.createTempDirectory("graft-opt-part-").toString
    DeltaTable.create(
      orders.withColumn("bucket", col("o_orderkey") % 2).repartition(6),
      root, partitionBy = Seq("bucket"))
    val before = dataFileCount(root)
    DeltaTable.optimizeCompact(spark, root)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.size < before)
    // every packed file still lives under a single bucket dir
    s.files.foreach { f =>
      assert(f.path.contains("bucket="), s"file outside partition dirs: ${f.path}")
    }
    assert(DeltaTable.read(spark, root).count() == orders.count())
  }

  test("zorder: clustered rewrite tightens per-file key ranges") {
    val root = Files.createTempDirectory("graft-opt-z-").toString
    // shuffled layout: every file spans nearly the whole key range
    DeltaTable.create(orders.repartition(6), root)
    def spans(): Seq[(Long, Long)] =
      DeltaLog.snapshot(spark, root).files.flatMap(_.stats)
        .flatMap(graft.index.sources.DeltaStats.parse(_, orders.schema))
        .flatMap { fsx =>
          for {
            c <- fsx.cols.get("o_orderkey")
            lo <- c.min.collect { case n: Long => n }
            hi <- c.max.collect { case n: Long => n }
          } yield (lo, hi)
        }
    val wideBefore = spans().map { case (lo, hi) => hi - lo }.max

    DeltaTable.optimizeCompact(spark, root,
      targetSizeBytes = 8L << 10, zorderBy = Seq("o_orderkey"))
    val after = spans()
    assert(after.size > 1, "zorder should have produced multiple files")
    // clustered files cover disjoint-ish, much tighter ranges
    assert(after.map { case (lo, hi) => hi - lo }.max < wideBefore / 2,
      s"ranges not tightened: before width $wideBefore, after $after")
    assert(DeltaTable.read(spark, root).count() == orders.count())
  }

  test("iceberg compactSort (zorder): per-file bounds tighten and " +
      "filtered scans prune more files") {
    import graft.index.sources.{IcebergMeta, IcebergTable, LakeTable}
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val loc = Files.createTempDirectory("graft-iopt-z-").toString
    // shuffled layout: every file spans nearly the whole key range
    IcebergTable.create(orders.repartition(6), loc)
    def spans(): Seq[(Long, Long)] =
      IcebergMeta.snapshot(spark, loc).files.flatMap(_.stats)
        .flatMap(graft.index.sources.DeltaStats.parse(_, orders.schema))
        .flatMap { fsx =>
          for {
            c <- fsx.cols.get("o_orderkey")
            lo <- c.min.collect { case n: Long => n }
            hi <- c.max.collect { case n: Long => n }
          } yield (lo, hi)
        }
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        case f: FileSourceScanExec => Seq(f)
      }.flatten.map(_.metrics("numFiles").value).sum
    }
    val wideBefore = spans().map { case (lo, hi) => hi - lo }.max
    val lo = orders.select(min(col("o_orderkey"))).head().getLong(0)
    def narrowScan() = IcebergTable.read(spark, loc)
      .filter(col("o_orderkey") < lo + 100)
    val scannedBefore = scanned(narrowScan())

    LakeTable.optimize(spark, loc, targetSizeBytes = 8L << 10,
      zorderBy = Seq("o_orderkey"))
    val after = spans()
    assert(after.size > 1, "zorder should have produced multiple files")
    assert(after.map { case (lo2, hi) => hi - lo2 }.max < wideBefore / 2,
      s"ranges not tightened: before width $wideBefore, after $after")
    // the replace is row-transparent and the narrow scan prunes harder
    assert(IcebergTable.read(spark, loc).count() == orders.count())
    assert(scanned(narrowScan()) < scannedBefore,
      "the clustered layout should prune the narrow scan harder")
    // guards: deletes-in-force and partitioned tables refuse
    IcebergTable.deleteWhere(spark, loc, col("o_orderkey") === lo)
    intercept[IllegalArgumentException] {
      IcebergTable.compactSort(spark, loc, Seq("o_orderkey"))
    }
  }

  test("iceberg compactSort z-orders WITHIN partitions; layout and tuples survive") {
    import graft.index.sources.{IcebergMeta, IcebergTable}
    val loc = Files.createTempDirectory("graft-iopt-zpart-").toString
    // partitioned + shuffled: several wide-span files per partition
    IcebergTable.create(orders.repartition(6), loc,
      partitionColumns = Seq("o_orderstatus"))
    (1 to 2).foreach(_ => IcebergTable.append(orders.limit(500), loc))
    val before = IcebergTable.read(spark, loc)
      .agg(sum(col("o_orderkey"))).head().getLong(0)

    // z-ordering BY the partition column is refused (constant per file)
    intercept[IllegalArgumentException] {
      IcebergTable.compactSort(spark, loc, Seq("o_orderstatus"))
    }
    IcebergTable.compactSort(spark, loc, Seq("o_orderkey", "o_totalprice"),
      targetSizeBytes = 64L << 10)

    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.partitionFields.map(_.transform) == Seq("identity"))
    assert(s.deleteFiles.isEmpty)
    // every rewritten file still lives under its partition directory
    assert(s.files.nonEmpty &&
      s.files.forall(_.path.contains("o_orderstatus=")))
    // content identical
    assert(IcebergTable.read(spark, loc)
      .agg(sum(col("o_orderkey"))).head().getLong(0) == before)
    // partition pruning still prunes after the rewrite
    val statuses = orders.select("o_orderstatus").distinct
      .collect().map(_.getString(0))
    statuses.foreach { st =>
      val expected = orders.filter(col("o_orderstatus") === st).count() +
        2 * orders.limit(500).filter(col("o_orderstatus") === st).count()
      assert(IcebergTable.read(spark, loc)
        .filter(col("o_orderstatus") === st).count() == expected)
    }
    // z-clustering tightened o_orderkey spans within each partition:
    // each partition's files are near-disjoint in key ranges
    val spansByPart = s.files.groupBy(f =>
      f.path.split('/').find(_.startsWith("o_orderstatus=")).get)
      .view.mapValues(_.flatMap(_.stats)
        .flatMap(graft.index.sources.DeltaStats.parse(_, s.schema))
        .flatMap(fsx => for {
          c <- fsx.cols.get("o_orderkey")
          lo <- c.min.collect { case n: Long => n }
          hi <- c.max.collect { case n: Long => n }
        } yield (lo, hi)))
    spansByPart.filter(_._2.size > 1).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._1)
      val overlaps = sorted.zip(sorted.tail).count {
        case ((_, hi1), (lo2, _)) => lo2 < hi1
      }
      // z-order on 2 cols is not a total key sort; require MOSTLY
      // disjoint (shuffled layout would overlap everywhere)
      assert(overlaps <= sorted.size / 2,
        s"expected near-disjoint spans, got $sorted")
    }
  }

  test("OPTIMIZE ... WHERE scopes the rewrite to matching partitions (both formats)") {
    import graft.index.sources.{IcebergMeta, IcebergTable, LakeTable}
    // Delta: two partitions, many smalls each; scope to one segment
    val d = Files.createTempDirectory("graft-opt-where-d-").toString
    val twoSeg = customer.filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    DeltaTable.create(twoSeg.repartition(4), d, partitionBy = Seq("c_mktsegment"))
    (1 to 2).foreach(_ =>
      DeltaTable.append(twoSeg.limit(40), d, partitionBy = Seq("c_mktsegment")))
    def filesIn(seg: String): Int =
      DeltaLog.snapshot(spark, d).files.count(_.path.contains(s"c_mktsegment=$seg"))
    val (bBefore, mBefore) = (filesIn("BUILDING"), filesIn("MACHINERY"))
    assert(bBefore >= 3 && mBefore >= 3)
    DeltaTable.optimizeCompact(spark, d,
      where = Some(col("c_mktsegment") === "BUILDING"))
    assert(filesIn("BUILDING") < bBefore, "scoped partition should compact")
    assert(filesIn("MACHINERY") == mBefore, "out-of-scope partition untouched")
    assert(DeltaTable.read(spark, d).count() ==
      twoSeg.count() + 2 * twoSeg.limit(40).count())
    // predicate on a non-partition column is refused loudly
    intercept[IllegalArgumentException] {
      DeltaTable.optimizeCompact(spark, d, where = Some(col("c_acctbal") > 0))
    }

    // Iceberg: hidden-partitioned; scope compactSmall by the derived field
    val i = Files.createTempDirectory("graft-opt-where-i-").toString
    IcebergTable.create(customer.limit(200), i,
      partitionColumns = Seq("bucket(2, c_custkey)"))
    (1 to 2).foreach(_ => IcebergTable.append(customer.limit(50), i))
    def iFilesIn(b: Int): Int =
      IcebergMeta.snapshot(spark, i).files.count(_.path.contains(s"c_custkey_bucket=$b"))
    val (i0, i1) = (iFilesIn(0), iFilesIn(1))
    assert(i0 >= 3 && i1 >= 3)
    val expected = customer.limit(200).count() + 2 * customer.limit(50).count()
    assert(IcebergTable.read(spark, i).count() == expected)
    LakeTable.optimize(spark, i,
      where = Some(col("c_custkey_bucket") === 0))
    assert(iFilesIn(0) < i0)
    assert(iFilesIn(1) == i1)
    assert(IcebergTable.read(spark, i).count() == expected)
  }

  test("iceberg compactSmall: bins collapse, deletes-in-force refuse") {
    import graft.index.sources.{IcebergMeta, IcebergTable, LakeTable}
    val loc = Files.createTempDirectory("graft-iopt-").toString
    IcebergTable.create(orders.repartition(8), loc)
    assert(IcebergMeta.snapshot(spark, loc).files.size == 8)
    val before = IcebergTable.read(spark, loc)
      .select(sum(col("o_orderkey"))).head().getLong(0)

    LakeTable.optimize(spark, loc) // facade routes to compactSmall
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.files.size < 8, "small files should have been packed")
    assert(IcebergTable.read(spark, loc)
      .select(sum(col("o_orderkey"))).head().getLong(0) == before)
    // the replace snapshot is row-transparent to incremental scans
    assert(IcebergTable.incrementalAppends(
      spark, loc, s.snapshotId - 1).count() == 0)

    // MOR state in force: compactSmall refuses, compact() is the route
    val loc2 = Files.createTempDirectory("graft-iopt-dv-").toString
    IcebergTable.create(orders.repartition(4), loc2)
    IcebergTable.deleteWhere(spark, loc2, col("o_orderkey") % 10 === 0)
    val e = intercept[IllegalArgumentException] {
      IcebergTable.compactSmall(spark, loc2)
    }
    assert(e.getMessage.contains("compact() first"))
  }

  test("zorder on a partitioned table clusters WITHIN partitions; DV files are left to purge") {
    val root = Files.createTempDirectory("graft-opt-zpart-").toString
    DeltaTable.create(
      orders.repartition(4).withColumn("bucket", col("o_orderkey") % 2),
      root, partitionBy = Seq("bucket"))
    // z-ordering BY the partition column itself is refused
    intercept[IllegalArgumentException] {
      DeltaTable.optimizeCompact(spark, root, zorderBy = Seq("bucket"))
    }
    val before = DeltaTable.read(spark, root)
      .agg(sum(col("o_totalprice"))).head().getDouble(0)
    DeltaTable.optimizeCompact(spark, root,
      zorderBy = Seq("o_orderkey"), targetSizeBytes = 64L << 10)
    val s = DeltaLog.snapshot(spark, root)
    // rewritten files still live under their partition directories
    assert(s.files.nonEmpty && s.files.forall(_.path.contains("bucket=")))
    assert(math.abs(DeltaTable.read(spark, root)
      .agg(sum(col("o_totalprice"))).head().getDouble(0) - before) < 1e-6)
    // partition values reconstruct on read
    assert(DeltaTable.read(spark, root).filter(col("bucket") === 0).count() ==
      orders.filter(col("o_orderkey") % 2 === 0).count())

    val root2 = Files.createTempDirectory("graft-opt-dv-").toString
    DeltaTable.create(orders.repartition(4), root2)
    DeltaTable.deleteWhere(spark, root2, col("o_orderkey") % 10 === 0)
    val withDv = DeltaLog.snapshot(spark, root2).files
      .count(_.dv.exists(_.cardinality > 0))
    assert(withDv > 0)
    DeltaTable.optimizeCompact(spark, root2)
    // DV-carrying files were not touched by optimize
    assert(DeltaLog.snapshot(spark, root2).files
      .count(_.dv.exists(_.cardinality > 0)) == withDv)
    assert(DeltaTable.read(spark, root2).count() ==
      orders.filter(!(col("o_orderkey") % 10 === 0)).count())
  }
}
