package graft.index

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IceMurmur3, IcebergMeta, IcebergTable}

/**
 * HIDDEN PARTITIONING end to end: tables partitioned by bucket[N],
 * truncate[W] and the time transforms round-trip create/append/read,
 * publish a spec-compliant partition spec + per-entry partition
 * tuples, and — the point — filtered reads PRUNE files through the
 * transform: `custkey = k` opens one bucket, `orderdate >= d` opens
 * only the matching months. That pruning is exactly what survives a
 * 100 TB scale-up; data-file min/max can't prune a bucket transform
 * (the hash scrambles ranges), so the partition tuple is the only
 * evidence, and these tests pin that it is used.
 */
class IcebergHiddenPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      case f: FileSourceScanExec => Seq(f)
    }.flatten.map(_.metrics("numFiles").value).sum
  }

  private def readAvro(path: Path): Seq[GenericRecord] = {
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val len = fs.getFileStatus(path).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(path)
    try in.readFully(0, bytes) finally in.close()
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  test("bucket table: spec JSON, layout, tuple, round-trip, equality pruning") {
    val loc = tmp("graft-ice-bucket-")
    val src = customer.limit(400).cache()
    IcebergTable.create(src, loc, partitionColumns = Seq("bucket(8, c_custkey)"))

    // published spec carries the transform verbatim
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    val metaFile = new java.io.File(s"$loc/metadata").listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val j = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath),
      java.nio.charset.StandardCharsets.UTF_8))
    val specField = (j \ "partition-specs")(0) \ "fields"
    assert((specField(0) \ "transform") === JString("bucket[8]"))
    assert((specField(0) \ "name") === JString("c_custkey_bucket"))

    // hive layout by the DERIVED value; source column stays in the files
    val dirs = fs.listStatus(new Path(loc, "data")).toSeq
      .map(_.getPath.getName).filter(_.contains("="))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("c_custkey_bucket=")))

    // snapshot model: fields + per-file tuples
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.partitionFields.map(_.transform) === Seq("bucket[8]"))
    assert(s.partitionColumns.isEmpty) // no identity fields
    assert(s.partitionValues.nonEmpty &&
      s.partitionValues.values.forall(_.keySet == Set("c_custkey_bucket")))

    // round trip: schema unchanged (no derived column), full content
    val back = IcebergTable.read(spark, loc)
    assert(back.schema.fieldNames.toSeq === src.schema.fieldNames.toSeq)
    assert(back.count() === src.count())
    assert(math.abs(back.agg(sum("c_acctbal")).head.getDouble(0) -
      src.agg(sum("c_acctbal")).head.getDouble(0)) < 1e-6)

    // equality pruning: one key → only its bucket's files
    val key = src.select("c_custkey").head.getLong(0)
    val total = scannedFiles(IcebergTable.read(spark, loc))
    val pruned = scannedFiles(
      IcebergTable.read(spark, loc).filter(col("c_custkey") === key))
    assert(total >= 4, s"expected multiple bucket files, got $total")
    assert(pruned < total,
      s"bucket pruning: $pruned of $total files should be < total")
    assert(IcebergTable.read(spark, loc).filter(col("c_custkey") === key)
      .count() === src.filter(col("c_custkey") === key).count())

    // manifest entry carries the expected bucket value
    val manifest = fs.listStatus(new Path(loc, "metadata")).toSeq
      .map(_.getPath).filter(_.getName.startsWith("manifest-")).head
    val entries = readAvro(manifest)
    val tuples = entries.map(e => e.get("data_file").asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord])
    assert(tuples.nonEmpty)
    tuples.foreach { t =>
      val b = t.get("c_custkey_bucket").asInstanceOf[Int]
      assert(b >= 0 && b < 8)
    }
  }

  test("days/months transforms: range predicates prune through the transform") {
    val loc = tmp("graft-ice-days-")
    val src = orders.limit(2000)
      .withColumn("o_orderdate", to_date(col("o_orderdate"))).cache()
    IcebergTable.create(src, loc, partitionColumns = Seq("months(o_orderdate)"))

    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.partitionFields.map(_.transform) === Seq("month"))

    val back = IcebergTable.read(spark, loc)
    assert(back.count() === src.count())

    // pick the max month in the data; filter to it — earlier months prune
    val maxDate = src.agg(max("o_orderdate")).head.getDate(0)
    val total = scannedFiles(IcebergTable.read(spark, loc))
    val lateOnly = IcebergTable.read(spark, loc)
      .filter(col("o_orderdate") >= lit(maxDate))
    val pruned = scannedFiles(lateOnly)
    assert(total > 1, s"expected multiple month files, got $total")
    assert(pruned < total, s"month pruning: $pruned should be < $total")
    assert(lateOnly.count() ===
      src.filter(col("o_orderdate") >= lit(maxDate)).count())

    // correctness across the boundary both ways
    val midDate = src.selectExpr("date_add(min(o_orderdate), 200)").head.getDate(0)
    assert(IcebergTable.read(spark, loc)
      .filter(col("o_orderdate") < lit(midDate)).count() ===
      src.filter(col("o_orderdate") < lit(midDate)).count())
  }

  test("timestamp days + truncate(string): mixed spec with identity") {
    val loc = tmp("graft-ice-mixed-")
    val src = orders.limit(1200).cache()
    // mixed: identity + transform over a timestamp + string truncate
    IcebergTable.create(src, loc, partitionColumns =
      Seq("o_orderstatus", "days(o_orderdate)"))

    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.partitionFields.map(_.transform) === Seq("identity", "day"))
    assert(s.partitionColumns === Seq("o_orderstatus"))

    val back = IcebergTable.read(spark, loc)
    assert(back.schema.fieldNames.toSeq === src.schema.fieldNames.toSeq)
    assert(back.count() === src.count())
    // identity value reconstructed; both prune paths compose
    val statuses = src.select("o_orderstatus").distinct.as[String].collect()
    statuses.foreach { st =>
      assert(back.filter(col("o_orderstatus") === st).count() ===
        src.filter(col("o_orderstatus") === st).count())
    }

    val total = scannedFiles(IcebergTable.read(spark, loc))
    // o_orderdate is timestamp_ntz in the fixture — externalize as Any
    // (LocalDateTime) and let lit() re-literalize it
    val maxTs = src.agg(max("o_orderdate")).head.get(0)
    val prunedDf = IcebergTable.read(spark, loc)
      .filter(col("o_orderdate") >= lit(maxTs))
    assert(scannedFiles(prunedDf) < total)
    assert(prunedDf.count() ===
      src.filter(col("o_orderdate") >= lit(maxTs)).count())
  }

  test("truncate(1, c_mktsegment): prefix buckets, append conforms, mismatch refused") {
    val loc = tmp("graft-ice-trunc-")
    val a = customer.limit(200).cache()
    val b = customer.orderBy(desc("c_custkey")).limit(100).cache()
    IcebergTable.create(a, loc, partitionColumns = Seq("truncate(1, c_mktsegment)"))
    // conforming append: same spec string accepted; empty spec accepted
    IcebergTable.append(b, loc, partitionColumns = Seq("truncate(1, c_mktsegment)"))
    IcebergTable.append(b.limit(10), loc)
    // mismatched spec refused
    val e = intercept[IllegalArgumentException] {
      IcebergTable.append(b, loc, partitionColumns = Seq("truncate(2, c_mktsegment)"))
    }
    assert(e.getMessage.contains("fixed"))

    val back = IcebergTable.read(spark, loc)
    assert(back.count() === a.count() + b.count() + 10)
    // equality on the source prunes via the truncated prefix
    val total = scannedFiles(IcebergTable.read(spark, loc))
    val seg = a.select("c_mktsegment").head.getString(0)
    val prunedDf = IcebergTable.read(spark, loc)
      .filter(col("c_mktsegment") === seg)
    assert(scannedFiles(prunedDf) < total)
    assert(prunedDf.count() ===
      a.filter(col("c_mktsegment") === seg).count() +
      b.filter(col("c_mktsegment") === seg).count() +
      b.limit(10).filter(col("c_mktsegment") === seg).count())
  }

  test("row-level ops on a bucket-partitioned table: deleteWhere, update, compact") {
    val loc = tmp("graft-ice-bucket-dml-")
    val src = customer.limit(300).cache()
    IcebergTable.create(src, loc, partitionColumns = Seq("bucket(4, c_custkey)"))

    // MOR delete
    IcebergTable.deleteWhere(spark, loc, col("c_acctbal") < 0)
    val afterDel = IcebergTable.read(spark, loc)
    assert(afterDel.count() === src.filter(col("c_acctbal") >= 0).count())

    // update rewrites surviving rows under the SAME hidden layout
    IcebergTable.update(spark, loc, col("c_nationkey") === 3,
      Map("c_name" -> lit("updated")))
    val upd = IcebergTable.read(spark, loc)
    assert(upd.filter(col("c_name") === "updated").count() ===
      src.filter(col("c_acctbal") >= 0 && col("c_nationkey") === 3).count())

    // compaction materializes MOR → plain files, still bucket-laid-out
    IcebergTable.compact(spark, loc)
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.deleteFiles.isEmpty)
    assert(s.partitionValues.nonEmpty) // tuples preserved through rewrite
    val back = IcebergTable.read(spark, loc)
    assert(back.count() === src.filter(col("c_acctbal") >= 0).count())
    // pruning still works post-compaction
    val key = src.filter(col("c_acctbal") >= 0).select("c_custkey").head.getLong(0)
    val total = scannedFiles(IcebergTable.read(spark, loc))
    if (total > 1) {
      assert(scannedFiles(
        IcebergTable.read(spark, loc).filter(col("c_custkey") === key)) < total)
    }
    assert(IcebergTable.read(spark, loc).filter(col("c_custkey") === key)
      .count() === 1)
  }

  test("time travel across hidden-partition snapshots") {
    val loc = tmp("graft-ice-bucket-tt-")
    val a = customer.limit(100).cache()
    val b = customer.orderBy(desc("c_custkey")).limit(50).cache()
    val s1 = IcebergTable.create(a, loc, partitionColumns = Seq("bucket(4, c_custkey)"))
    IcebergTable.append(b, loc)
    assert(IcebergTable.read(spark, loc).count() === a.count() + b.count())
    assert(IcebergTable.read(spark, loc, snapshotAsOf = Some(s1)).count() === a.count())
  }

  test("derived field name collision with a data column is refused at create") {
    val loc = tmp("graft-ice-collide-")
    val bad = customer.limit(10).withColumn("c_custkey_bucket", lit(1))
    val e = intercept[IllegalArgumentException] {
      IcebergTable.create(bad, loc, partitionColumns = Seq("bucket(4, c_custkey)"))
    }
    assert(e.getMessage.contains("collides"))
  }

  test("graft-iceberg sink partitionSpec option lands a transform spec") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = tmp("graft-ice-hsink-src-")
    val dst = tmp("graft-ice-hsink-dst-") + "/t"
    val ckpt = tmp("graft-ice-hsink-ck-")
    val cust = customer.limit(300)
    cust.write.parquet(srcDir + "/b0")
    // partitionBy can't carry transforms (the engine validates the
    // names against the schema first) — the partitionSpec option can
    val q = spark.readStream.schema(cust.schema).parquet(srcDir + "/*")
      .writeStream.format("graft-iceberg")
      .option("partitionSpec", "bucket(4, c_custkey)")
      .option("path", dst)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val s = IcebergMeta.snapshot(spark, dst)
    assert(s.partitionFields.map(_.transform) === Seq("bucket[4]"))
    assert(IcebergTable.read(spark, dst).count() === cust.count())
    // the hidden layout landed (bucket dirs, source column in files)
    val fs = new Path(dst).getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(new Path(dst, "data")).toSeq
      .map(_.getPath.getName).filter(_.contains("="))
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("c_custkey_bucket=")))
  }

  test("bucket values in the layout match the spec hash") {
    val loc = tmp("graft-ice-bucket-hash-")
    val src = customer.limit(50).cache()
    IcebergTable.create(src, loc, partitionColumns = Seq("bucket(8, c_custkey)"))
    // reread WITHOUT the library: group raw files by dir and check every
    // row's key hashes into its directory's bucket
    val fsc = new Path(loc, "data")
    val fs = fsc.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(fsc).toSeq.filter(_.isDirectory).foreach { d =>
      val bucket = d.getPath.getName.split("=")(1).toInt
      val rows = spark.read.parquet(d.getPath.toString)
        .select("c_custkey").as[Long].collect()
      rows.foreach(k => assert(IceMurmur3.bucketLong(k, 8) === bucket,
        s"key $k landed in bucket dir $bucket"))
    }
  }
}
