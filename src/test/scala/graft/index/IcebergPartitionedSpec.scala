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
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable}

/**
 * Identity-partitioned Iceberg tables, end to end: the writer publishes
 * a real partition spec (spec-id 0, identity fields with source-ids),
 * lands data files hive-laid-out under `data/<col>=<val>/…` with the
 * partition columns dropped from the files, and every manifest entry
 * carries the spec's partition tuple plus min=max partition bounds —
 * so reads reconstruct partition values from the path (basePath, the
 * layout Spark's own partitioned sources use) and filtered reads prune
 * partitioned files from metadata alone. Reference behavior matched:
 * sources/iceberg/IcebergRelation.scala:77-86 (partitioned tables serve
 * through the same relation as unpartitioned ones).
 */
class IcebergPartitionedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def orders =
    spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")

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

  private def metaFiles(loc: String, prefix: String): Seq[Path] = {
    val dir = new Path(loc, "metadata")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(prefix) && p.getName.endsWith(".avro"))
  }

  test("create: spec published, hive layout, round-trip read") {
    val loc = tmp("graft-ice-part-")
    IcebergTable.create(customer, loc, partitionColumns = Seq("c_mktsegment"))

    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.partitionColumns == Seq("c_mktsegment"))
    // hive layout: every data file sits under a c_mktsegment=… dir
    assert(s.files.nonEmpty)
    assert(s.files.forall(_.path.contains("/c_mktsegment=")))

    // full round trip, partition column reconstructed from the path
    val got = IcebergTable.read(spark, loc)
    assert(got.schema.fieldNames.sorted.toSeq ==
      customer.schema.fieldNames.sorted.toSeq)
    assert(got.count() == customer.count())
    val exp = customer.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("s"))
      .orderBy("c_mktsegment").collect().toSeq
    val act = got.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("c_custkey").as("s"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(act == exp)
  }

  test("append conforms to the spec; a mismatched partitionBy refuses") {
    val loc = tmp("graft-ice-part-app-")
    val a = customer.filter(col("c_custkey") % 2 === 0)
    val b = customer.filter(col("c_custkey") % 2 === 1)
    IcebergTable.create(a, loc, partitionColumns = Seq("c_mktsegment"))
    // plain append inherits the table's spec
    IcebergTable.append(b, loc)
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.files.forall(_.path.contains("/c_mktsegment=")))
    assert(IcebergTable.read(spark, loc).count() == customer.count())
    // naming the spec explicitly is fine; naming a different one refuses
    IcebergTable.append(b.limit(1), loc, partitionColumns = Seq("c_mktsegment"))
    val e = intercept[IllegalArgumentException] {
      IcebergTable.append(b.limit(1), loc, partitionColumns = Seq("c_nationkey"))
    }
    assert(e.getMessage.contains("fixed at create"))
  }

  test("time travel pins the partitioned file set") {
    val loc = tmp("graft-ice-part-tt-")
    val a = customer.filter(col("c_custkey") % 2 === 0)
    IcebergTable.create(a, loc, partitionColumns = Seq("c_mktsegment"))
    IcebergTable.append(customer.filter(col("c_custkey") % 2 === 1), loc)
    val pinned = IcebergTable.read(spark, loc, snapshotAsOf = Some(1L))
    assert(pinned.count() == a.count())
    assert(pinned.filter(col("c_mktsegment") === "BUILDING").count() ==
      a.filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("partition-filtered read scans only the partition's files") {
    val loc = tmp("graft-ice-part-prune-")
    IcebergTable.create(customer, loc, partitionColumns = Seq("c_mktsegment"))
    val s = IcebergMeta.snapshot(spark, loc)
    val total = s.files.size
    val inPart = s.files.count(_.path.contains("/c_mktsegment=BUILDING/"))
    assert(inPart > 0 && inPart < total)
    val filtered = IcebergTable.read(spark, loc)
      .filter(col("c_mktsegment") === "BUILDING")
    assert(scannedFiles(filtered) == inPart)
    // correctness alongside the pruning
    assert(filtered.count() ==
      customer.filter(col("c_mktsegment") === "BUILDING").count())
  }

  test("manifest entries carry the partition tuple; list carries summaries") {
    val loc = tmp("graft-ice-part-manifest-")
    IcebergTable.create(customer, loc, partitionColumns = Seq("c_mktsegment"))
    // data manifest: every entry's data_file.partition names the segment
    val manifest = metaFiles(loc, "manifest-").head
    val entries = readAvro(manifest)
    assert(entries.nonEmpty)
    entries.foreach { r =>
      val df = r.get("data_file").asInstanceOf[GenericRecord]
      val part = df.get("partition").asInstanceOf[GenericRecord]
      val seg = part.get("c_mktsegment")
      assert(seg != null)
      assert(df.get("file_path").toString
        .contains(s"/c_mktsegment=${seg.toString.replace(" ", "%20")}"))
    }
    // manifest list: the data manifest's field summary brackets the segments
    val snap = metaFiles(loc, "snap-").head
    val ml = readAvro(snap).find(r =>
      r.get("content").toString.toInt == 0).get
    val summaries = ml.get("partitions").asInstanceOf[java.util.List[_]]
    assert(summaries != null && summaries.size() == 1)
    val fsum = summaries.get(0).asInstanceOf[GenericRecord]
    assert(fsum.get("contains_null").toString.toBoolean == false)
    def str(b: Any): String = {
      val bb = b.asInstanceOf[java.nio.ByteBuffer].duplicate()
      val arr = new Array[Byte](bb.remaining()); bb.get(arr)
      new String(arr, java.nio.charset.StandardCharsets.UTF_8)
    }
    val segs = customer.select("c_mktsegment").distinct()
      .as[String].collect().sorted
    assert(str(fsum.get("lower_bound")) == segs.head)
    assert(str(fsum.get("upper_bound")) == segs.last)
    // metadata.json publishes the identity spec with a real source-id
    val metaDir = new java.io.File(loc, "metadata")
    val metaFile = metaDir.listFiles()
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val metaJson = new String(
      java.nio.file.Files.readAllBytes(metaFile.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(metaJson.contains("identity"))
    assert(metaJson.contains("source-id"))
  }

  test("int and date partition columns round-trip; null partition reads null") {
    val loc = tmp("graft-ice-part-typed-")
    val df = orders.limit(2000)
      .withColumn("o_orderdate", col("o_orderdate").cast("date"))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 97 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
    IcebergTable.create(df, loc,
      partitionColumns = Seq("o_orderpriority", "o_orderdate"))
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.partitionColumns == Seq("o_orderpriority", "o_orderdate"))
    val got = IcebergTable.read(spark, loc)
    assert(got.count() == df.count())
    assert(got.filter(col("o_orderpriority").isNull).count() ==
      df.filter(col("o_orderpriority").isNull).count())
    val exp = df.groupBy("o_orderdate").count().orderBy("o_orderdate")
      .collect().toSeq
    assert(got.groupBy("o_orderdate").count().orderBy("o_orderdate")
      .collect().toSeq == exp)
  }

  test("deleteWhere + merge keep the partitioned layout") {
    val loc = tmp("graft-ice-part-dml-")
    IcebergTable.create(customer, loc, partitionColumns = Seq("c_mktsegment"))
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") % 10 === 3)
    val afterDelete = IcebergTable.read(spark, loc)
    assert(afterDelete.count() ==
      customer.filter(!(col("c_custkey") % 10 === 3)).count())

    // upsert: bump balances of every 7th customer, delete nation>=20
    val source = customer.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 500)
    IcebergTable.merge(spark, loc, source, Seq("c_custkey"),
      deleteCondition = Some(col("c_nationkey") >= 20))
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.files.forall(_.path.contains("/c_mktsegment=")))
    val got = IcebergTable.read(spark, loc)
    val expected = customer
      .filter(!(col("c_custkey") % 10 === 3) || col("c_custkey") % 7 === 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 500)
          .otherwise(col("c_acctbal")))
      .filter(!(col("c_custkey") % 7 === 0 && col("c_nationkey") >= 20))
    assert(got.count() == expected.count())
    assert(got.select(round(sum("c_acctbal"), 2)).head().getDouble(0) ==
      expected.select(round(sum("c_acctbal"), 2)).head().getDouble(0))
  }

  test("compactSmall never packs across partitions") {
    val loc = tmp("graft-ice-part-binpack-")
    // several appends → several small files per partition
    val parts = customer.randomSplit(Array(0.25, 0.25, 0.25, 0.25), seed = 7)
    IcebergTable.create(parts(0).coalesce(1), loc,
      partitionColumns = Seq("c_mktsegment"))
    parts.drop(1).foreach(p => IcebergTable.append(p.coalesce(1), loc))
    val before = IcebergMeta.snapshot(spark, loc)
    IcebergTable.compactSmall(spark, loc)
    val after = IcebergMeta.snapshot(spark, loc)
    assert(after.files.size < before.files.size)
    // every packed file still lives in exactly one partition dir
    assert(after.files.forall(_.path.contains("/c_mktsegment=")))
    assert(IcebergTable.read(spark, loc).count() == customer.count())
    val exp = customer.groupBy("c_mktsegment").count()
      .orderBy("c_mktsegment").collect().toSeq
    assert(IcebergTable.read(spark, loc).groupBy("c_mktsegment").count()
      .orderBy("c_mktsegment").collect().toSeq == exp)
  }

  test("schema evolution refuses to drop or rename a partition column " +
      "(the spec would dangle / hive dirs would orphan)") {
    val loc = tmp("graft-ice-part-evo-")
    IcebergTable.create(customer, loc, partitionColumns = Seq("c_mktsegment"))
    val e1 = intercept[IllegalArgumentException] {
      IcebergTable.dropColumn(spark, loc, "c_mktsegment")
    }
    assert(e1.getMessage.contains("partition source column"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergTable.renameColumn(spark, loc, "c_mktsegment", "segment")
    }
    assert(e2.getMessage.contains("partition source column"))
    // non-partition columns still evolve, and the table stays readable
    IcebergTable.renameColumn(spark, loc, "c_name", "customer_name")
    val got = IcebergTable.read(spark, loc)
    assert(got.columns.contains("customer_name"))
    assert(got.count() == customer.count())
  }

  test("graft-iceberg sink accepts partitionBy and lands the spec") {
    val src = Files.createTempDirectory("graft-ice-psink-src-").toString
    val dst = Files.createTempDirectory("graft-ice-psink-dst-").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-ice-psink-ck-").toString
    customer.write.parquet(src + "/b0")
    val q = spark.readStream.schema(customer.schema).parquet(src + "/*")
      .writeStream.format("graft-iceberg")
      .partitionBy("c_mktsegment")
      .option("path", dst)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val s = IcebergMeta.snapshot(spark, dst)
    assert(s.partitionColumns == Seq("c_mktsegment"))
    assert(IcebergTable.read(spark, dst).count() == customer.count())
  }
}
