package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaStats, IceSingleValue, IcebergMeta, IcebergTable}

/**
 * Iceberg manifest-bounds file skipping: the writer serializes per-field
 * `lower_bounds`/`upper_bounds`/`null_value_counts`/`record_count` into
 * data manifests (spec single-value serialization), replay decodes them
 * into the shared stats dialect, existing entries re-publish losslessly
 * across commits, and filtered reads prune provably-empty files —
 * composing soundly with merge-on-read deletes.
 */
class IcebergStatsSkipSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten.map(_.metrics("numFiles").value).sum
  }

  private def rangedTable(): (String, DataFrame) = {
    val root = Files.createTempDirectory("graft-ice-stats-").toString
    val orders = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
      .repartitionByRange(4, col("o_orderkey"))
    IcebergTable.create(orders, root)
    (root, orders)
  }

  test("single-value codec round-trips every domain type") {
    val cases: Seq[(Any, DataType)] = Seq(
      (42L, IntegerType), (-7L, IntegerType),
      (Long.MaxValue - 3L, LongType),
      (19876L, DateType), (1700000000123456L, TimestampType),
      (math.Pi, DoubleType), (1.5d, FloatType),
      ("héllo wörld", StringType), (true, BooleanType), (false, BooleanType),
      (new java.math.BigDecimal("12345.67"), DecimalType(10, 2)),
      (new java.math.BigDecimal("-0.03"), DecimalType(5, 2)))
    cases.foreach { case (v, dt) =>
      val bytes = IceSingleValue.serialize(v, dt).get
      assert(IceSingleValue.deserialize(bytes, dt).get == v, s"$v: $dt")
    }
    // spec widths: int/date 4 bytes LE, long/timestamp 8 bytes LE
    assert(IceSingleValue.serialize(1L, IntegerType).get.length == 4)
    assert(IceSingleValue.serialize(1L, TimestampType).get.length == 8)
    assert(IceSingleValue.serialize(258L, IntegerType).get
      .sameElements(Array[Byte](2, 1, 0, 0)))
  }

  test("writer embeds bounds; replay decodes disjoint per-file ranges") {
    val (root, _) = rangedTable()
    val s = IcebergMeta.snapshot(spark, root)
    assert(s.files.size == 4)
    assert(s.files.forall(_.stats.isDefined))
    val parsed = s.files.map(f => DeltaStats.parse(f.stats.get, s.schema).get)
    assert(parsed.forall(_.numRecords.exists(_ > 0L)))
    val ranges = parsed.map(_.cols("o_orderkey"))
      .map(c => (c.min.get.asInstanceOf[Long], c.max.get.asInstanceOf[Long]))
      .sortBy(_._1)
    ranges.sliding(2).foreach { case Seq(a, b) => assert(a._2 < b._1) }
  }

  test("filtered read skips files outside the bounds") {
    val (root, orders) = rangedTable()
    val probe = orders.select(min("o_orderkey")).as[Long].first()
    assert(scannedFiles(IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === probe)) == 1L)
    assert(scannedFiles(IcebergTable.read(spark, root)) == 4L)
    assert(scannedFiles(IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === -5L)) == 0L)
  }

  test("bounds survive an append (existing entries re-publish losslessly)") {
    val (root, _) = rangedTable()
    val one = spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet").limit(1)
    IcebergTable.append(one, root)
    val s = IcebergMeta.snapshot(spark, root)
    assert(s.files.size >= 5)
    assert(s.files.forall(_.stats.isDefined))
    assert(scannedFiles(IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === -5L)) == 0L)
  }

  test("skipping composes with merge-on-read deletes") {
    val (root, orders) = rangedTable()
    val victim = orders.select(min("o_orderkey")).as[Long].first()
    IcebergTable.deleteWhere(spark, root, col("o_orderkey") === victim)
    // the victim's row is MOR-dropped; other files' pruning still works
    val df = IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === victim)
    assert(df.count() == 0L)
    assert(scannedFiles(IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === -5L)) == 0L)
    // equality delete on top: still correct under pruning
    IcebergTable.deleteWhereEquality(spark, root,
      orders.select(col("o_orderkey")).orderBy(col("o_orderkey").desc).limit(1))
    val maxKey = orders.select(max("o_orderkey")).as[Long].first()
    assert(IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === maxKey).count() == 0L)
  }

  test("a manifest without bounds never prunes (legacy writers)") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val (root, _) = rangedTable()
    // rewrite every data manifest with the PRE-STATS schema (exact shape
    // this writer produced before bounds existed) — replay must degrade
    // to no-stats, and reads must keep every file
    val legacySchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |  {"name":"status","type":"int"},
        |  {"name":"snapshot_id","type":["null","long"],"default":null},
        |  {"name":"sequence_number","type":["null","long"],"default":null},
        |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |    {"name":"file_path","type":"string"},
        |    {"name":"file_format","type":"string"},
        |    {"name":"record_count","type":"long"},
        |    {"name":"file_size_in_bytes","type":"long"}
        |  ]}}
        |]}""".stripMargin)
    val s = IcebergMeta.snapshot(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new org.apache.hadoop.fs.Path(root, "metadata")
    fs.listStatus(metaDir).map(_.getPath)
      .filter(p => p.getName.startsWith("manifest-") && p.getName.endsWith(".avro"))
      .foreach { mp =>
        val out = new java.io.ByteArrayOutputStream()
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](legacySchema))
        w.create(legacySchema, out)
        s.files.foreach { f =>
          val dfr = new GenericData.Record(
            legacySchema.getField("data_file").schema())
          dfr.put("file_path", f.path)
          dfr.put("file_format", "PARQUET")
          dfr.put("record_count", -1L)
          dfr.put("file_size_in_bytes", f.size)
          val r = new GenericData.Record(legacySchema)
          r.put("status", 1)
          r.put("snapshot_id", s.snapshotId)
          r.put("sequence_number", 0L)
          r.put("data_file", dfr)
          w.append(r)
        }
        w.close()
        val os = fs.create(mp, true)
        try os.write(out.toByteArray) finally os.close()
      }
    val s2 = IcebergMeta.snapshot(spark, root)
    assert(s2.files.forall(_.stats.isEmpty))
    assert(scannedFiles(IcebergTable.read(spark, root)
      .filter(col("o_orderkey") === -5L)) == 4L)
  }
}
