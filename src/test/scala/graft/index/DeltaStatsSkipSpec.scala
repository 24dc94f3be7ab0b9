package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaStats, DeltaTable, FileColStats, FileStats, StatsPredicate}

/**
 * Delta `add.stats` file skipping: the writer embeds per-file
 * min/max/nullCount JSON in every add action (from the parquet footers,
 * never a data re-read), replay carries it through commits AND
 * checkpoints, and filtered reads prune provably-empty files at listing
 * time. The predicate evaluator is unit-tested for soundness: every
 * unknown keeps the file.
 */
class DeltaStatsSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Files actually opened by the scan of `df` (post-execution metric). */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    scans.map(_.metrics("numFiles").value).sum
  }

  /** A 4-file table with DISJOINT o_orderkey ranges per file. */
  private def rangedTable(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft-delta-stats-").toString
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
    DeltaTable.create(orders, root)
    (root, orders)
  }

  test("writer embeds stats; replay parses min/max/nullCount per file") {
    val (root, _) = rangedTable()
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.size == 4)
    assert(s.files.forall(_.stats.isDefined))
    val parsed = s.files.map(f => DeltaStats.parse(f.stats.get, s.schema).get)
    assert(parsed.forall(_.numRecords.exists(_ > 0L)))
    // disjoint ranges: the per-file [min,max] intervals don't all overlap
    val ranges = parsed.map(p => p.cols("o_orderkey"))
      .map(c => (c.min.get.asInstanceOf[Long], c.max.get.asInstanceOf[Long]))
    assert(ranges.map(_._1).distinct.size == 4)
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach { case Seq(a, b) => assert(a._2 < b._1) }
    // numRecords sums to the table count
    val total = DeltaTable.read(spark, root).count()
    assert(parsed.flatMap(_.numRecords).sum == total)
  }

  test("filtered read skips files outside the predicate's range") {
    val (root, orders) = rangedTable()
    val keys = orders.select(min("o_orderkey"), max("o_orderkey"))
      .as[(Long, Long)].first()
    val probe = keys._1 // falls in exactly one file's range
    val filtered = DeltaTable.read(spark, root)
      .filter(col("o_orderkey") === probe)
    assert(filtered.count() == 1L)
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("o_orderkey") === probe)) == 1L)
    // an unfiltered read still scans everything
    assert(scannedFiles(DeltaTable.read(spark, root)) == 4L)
    // a range predicate spanning two files scans exactly those two
    val s = DeltaLog.snapshot(spark, root)
    val bounds = s.files.map(f => DeltaStats.parse(f.stats.get, s.schema).get)
      .map(_.cols("o_orderkey")).map(c =>
        (c.min.get.asInstanceOf[Long], c.max.get.asInstanceOf[Long]))
      .sortBy(_._1)
    val span = col("o_orderkey").between(bounds(1)._1, bounds(2)._2)
    assert(scannedFiles(DeltaTable.read(spark, root).filter(span)) == 2L)
  }

  test("stats survive a checkpoint and keep skipping after it") {
    val (root, _) = rangedTable()
    DeltaTable.checkpoint(spark, root)
    // append once so replay goes checkpoint + JSON tail
    DeltaTable.append(
      spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet").limit(1), root)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.count(_.stats.isDefined) == s.files.size)
    val probeDf = DeltaTable.read(spark, root).filter(col("o_orderkey") === -1L)
    assert(scannedFiles(probeDf) == 0L)
  }

  test("deleteWhere keeps stats on re-added files (physical-row semantics)") {
    val (root, orders) = rangedTable()
    val victim = orders.select(min("o_orderkey")).as[Long].first()
    DeltaTable.deleteWhere(spark, root, col("o_orderkey") === victim)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.forall(_.stats.isDefined))
    // the deleted key's file still lists (stats are physical) but the
    // row is DV-filtered; other files still prune
    val df = DeltaTable.read(spark, root).filter(col("o_orderkey") === victim)
    assert(df.count() == 0L)
  }

  test("string, date and null stats round-trip through the JSON codec") {
    val root = Files.createTempDirectory("graft-delta-stats-t-").toString
    val df = Seq(
      ("alpha", java.sql.Date.valueOf("2024-01-10"), Some(1.5)),
      ("omega", java.sql.Date.valueOf("2024-03-20"), None))
      .toDF("name", "d", "x").coalesce(1)
    DeltaTable.create(df, root)
    val s = DeltaLog.snapshot(spark, root)
    val fs = DeltaStats.parse(s.files.head.stats.get, s.schema).get
    assert(fs.cols("name") == FileColStats(Some("alpha"), Some("omega"), Some(0L)))
    assert(fs.cols("d").min.get ==
      java.time.LocalDate.parse("2024-01-10").toEpochDay)
    assert(fs.cols("x").nullCount.contains(1L))
    // IS NULL keeps the file; a value outside the range prunes it
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("x").isNull)) == 1L)
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("name") === "zz")) == 0L)
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("name").startsWith("om"))) == 1L)
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("name").startsWith("zz"))) == 0L)
  }

  test("predicate evaluator is sound: unknowns keep the file") {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val a = AttributeReference("a", LongType)()
    val stats = FileStats(Some(10L),
      Map("a" -> FileColStats(Some(5L), Some(20L), Some(0L))))
    def may(e: Expression) = StatsPredicate.mayMatch(stats, e)
    assert(may(EqualTo(a, Literal(5L))))
    assert(!may(EqualTo(a, Literal(4L))))
    assert(!may(EqualTo(a, Literal(21L))))
    assert(may(LessThan(a, Literal(6L))))
    assert(!may(LessThan(a, Literal(5L))))
    assert(may(LessThanOrEqual(a, Literal(5L))))
    assert(may(GreaterThan(a, Literal(19L))))
    assert(!may(GreaterThan(a, Literal(20L))))
    assert(may(GreaterThanOrEqual(a, Literal(20L))))
    // literal-on-the-left flips
    assert(!may(GreaterThan(Literal(4L), a)))
    assert(may(GreaterThan(Literal(6L), a)))
    // And prunes when either side does; Or only when both do
    assert(!may(And(EqualTo(a, Literal(4L)), EqualTo(a, Literal(5L)))))
    assert(may(Or(EqualTo(a, Literal(4L)), EqualTo(a, Literal(5L)))))
    assert(!may(Or(EqualTo(a, Literal(4L)), EqualTo(a, Literal(30L)))))
    // In: any member in range keeps
    assert(may(In(a, Seq(Literal(4L), Literal(7L)))))
    assert(!may(In(a, Seq(Literal(4L), Literal(30L)))))
    // IsNull prunes on zero nulls; IsNotNull prunes all-null files
    assert(!may(IsNull(a)))
    val allNull = FileStats(Some(10L),
      Map("a" -> FileColStats(None, None, Some(10L))))
    assert(!StatsPredicate.mayMatch(allNull, IsNotNull(a)))
    assert(StatsPredicate.mayMatch(allNull, IsNull(a)))
    // a column with NO stats keeps everything
    val b = AttributeReference("b", LongType)()
    assert(may(EqualTo(b, Literal(999L))))
    // an unmodeled expression keeps the file
    assert(may(EqualTo(Abs(a), Literal(999L))))
    // != prunes only a constant file
    val constFile = FileStats(Some(3L),
      Map("a" -> FileColStats(Some(7L), Some(7L), Some(0L))))
    assert(!StatsPredicate.mayMatch(constFile, Not(EqualTo(a, Literal(7L)))))
    assert(may(Not(EqualTo(a, Literal(7L)))))
  }

  test("a log without stats never prunes (older-writer tables)") {
    val (root, _) = rangedTable()
    // strip stats from every commit line, simulating a stats-less writer
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new org.apache.hadoop.fs.Path(root, "_delta_log")
    fs.listStatus(logDir).filter(_.getPath.getName.endsWith(".json")).foreach { st =>
      val src = scala.io.Source.fromInputStream(fs.open(st.getPath), "UTF-8")
      val stripped = try src.getLines().map { line =>
        val j = org.json4s.jackson.JsonMethods.parse(line)
        org.json4s.jackson.JsonMethods.compact(
          j.removeField { case (k, _) => k == "stats" })
      }.toList finally src.close()
      val out = fs.create(st.getPath, true)
      try out.write((stripped.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
    }
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.forall(_.stats.isEmpty))
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("o_orderkey") === -1L)) == 4L)
  }
}
