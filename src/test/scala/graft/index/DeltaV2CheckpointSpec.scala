package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, UnsupportedDeltaProtocolException}

/**
 * Delta V2 SPEC CHECKPOINTS (uuid-named manifest + `_sidecars/`
 * add-files — the format modern Databricks writers default to): replay
 * of sidecar-backed and inline-add v2 checkpoints, the protocol gate's
 * acceptance of the `v2Checkpoint` reader feature, layered JSON-commit
 * replay on top, and the classic-checkpoint writer's refusal on tables
 * whose writer features demand v2.
 */
class DeltaV2CheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  /** Write `df` as exactly one parquet file at `target`. */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame, target: Path): Unit = {
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new Path(target.getParent,
      s".stage-${java.util.UUID.randomUUID().toString}")
    df.repartition(1).write.parquet(stage.toString)
    val part = fs.listStatus(stage)
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    fs.mkdirs(target.getParent)
    assert(fs.rename(part, target))
    fs.delete(stage, true)
  }

  private val protocolType = StructType(Seq(
    StructField("minReaderVersion", IntegerType),
    StructField("minWriterVersion", IntegerType),
    StructField("readerFeatures", ArrayType(StringType)),
    StructField("writerFeatures", ArrayType(StringType))))
  private val metaDataType = StructType(Seq(
    StructField("id", StringType),
    StructField("format", StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))),
    StructField("schemaString", StringType),
    StructField("partitionColumns", ArrayType(StringType)),
    StructField("configuration", MapType(StringType, StringType)),
    StructField("createdTime", LongType)))
  private val addType = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("dataChange", BooleanType),
    StructField("stats", StringType)))
  private val sidecarType = StructType(Seq(
    StructField("path", StringType),
    StructField("sizeInBytes", LongType),
    StructField("modificationTime", LongType)))
  private val ckptMetaType = StructType(Seq(
    StructField("version", LongType)))

  private def protoRow = Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint"))
  private def metaRow(schemaJson: String) = Row(
    java.util.UUID.randomUUID().toString, Row("parquet", Map.empty[String, String]),
    schemaJson, Seq.empty[String], Map.empty[String, String], 1L)

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)

  /** The adds of the CURRENT snapshot as v2-spec add rows (relative paths). */
  private def addRowsOf(root: String): Seq[Row] = {
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val rootUri = fs.makeQualified(new Path(root)).toUri
    DeltaLog.snapshot(spark, root).files.map { f =>
      val rel = rootUri.relativize(
        fs.makeQualified(new Path(f.path)).toUri).getPath
      Row(rel, Map.empty[String, String], f.size, f.modificationTime, true,
        f.stats.orNull)
    }
  }

  test("v2 checkpoint with sidecars replays; commits layer on top") {
    val root = Files.createTempDirectory("graft-v2ck-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)   // v0
    DeltaTable.append(
      customer.filter(col("c_custkey").between(100, 129)), root)       // v1
    val schemaJson = DeltaLog.snapshot(spark, root).schemaString
    val adds = addRowsOf(root)
    assert(adds.size >= 2)

    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(root, "_delta_log")
    // split adds across TWO sidecars to prove multi-sidecar union
    val (aHalf, bHalf) = adds.splitAt(adds.size / 2)
    val sidecars = Seq(aHalf, bHalf).zipWithIndex.map { case (half, i) =>
      val name = s"${java.util.UUID.randomUUID()}.parquet"
      writeOneFile(
        df(StructType(Seq(StructField("add", addType))), half.map(Row(_)): _*),
        new Path(logDir, s"_sidecars/$name"))
      name
    }
    val ckRows =
      Seq(Row(protoRow, null, null, null),
        Row(null, metaRow(schemaJson), null, null),
        Row(null, null, Row(1L), null)) ++
        sidecars.map(n => Row(null, null, null, Row(n, 1L, 1L)))
    writeOneFile(
      df(StructType(Seq(
        StructField("protocol", protocolType),
        StructField("metaData", metaDataType),
        StructField("checkpointMetadata", ckptMetaType),
        StructField("sidecar", sidecarType))), ckRows: _*),
      new Path(logDir,
        f"${1L}%020d.checkpoint.${java.util.UUID.randomUUID()}%s.parquet"))
    // force checkpoint-based replay: drop commit 0 entirely
    assert(fs.delete(new Path(logDir, f"${0L}%020d.json"), false))

    val viaCkpt = DeltaTable.read(spark, root)
    assert(viaCkpt.count() == customer.filter(col("c_custkey") < 130).count())

    // a JSON commit after the checkpoint still layers on top — and the
    // writer gate accepts the v2Checkpoint writer feature for commits
    DeltaTable.append(customer.filter(col("c_custkey") >= 130), root)  // v2
    assert(DeltaTable.read(spark, root).count() == customer.count())
  }

  test("uuid-named checkpoint with inline adds (no sidecars) replays") {
    val root = Files.createTempDirectory("graft-v2ck-inline-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)   // v0
    val schemaJson = DeltaLog.snapshot(spark, root).schemaString
    val adds = addRowsOf(root)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(root, "_delta_log")
    val rows =
      Seq(Row(protoRow, null, null),
        Row(null, metaRow(schemaJson), null)) ++
        adds.map(a => Row(null, null, a))
    writeOneFile(
      df(StructType(Seq(
        StructField("protocol", protocolType),
        StructField("metaData", metaDataType),
        StructField("add", addType))), rows: _*),
      new Path(logDir,
        f"${0L}%020d.checkpoint.${java.util.UUID.randomUUID()}%s.parquet"))
    // the checkpoint alone must reconstruct v0 (commit 0 stays for the
    // latest-version pointer; its actions are not needed)
    assert(DeltaTable.read(spark, root).count() ==
      customer.filter(col("c_custkey") < 100).count())
  }

  test("classic + uuid checkpoints at one version: a complete instance serves") {
    // both are legal at the same version (e.g. racing writers, or a
    // connector writing classic alongside another's v2); pooling their
    // files as "parts of one group" would judge the version incomplete
    // and fail outright once older commits are cleaned up
    val root = Files.createTempDirectory("graft-ck-dual-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)   // v0
    DeltaTable.append(customer.filter(col("c_custkey") >= 100), root)  // v1
    DeltaTable.checkpoint(spark, root)                                 // classic @ v1
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(root, "_delta_log")
    val classic = new Path(logDir, f"${1L}%020d.checkpoint.parquet")
    val uuidTwin = new Path(logDir,
      f"${1L}%020d.checkpoint.${java.util.UUID.randomUUID()}%s.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, classic, fs, uuidTwin, false,
      spark.sessionState.newHadoopConf())
    // log cleanup: the checkpoint is now the only route to v0
    assert(fs.delete(new Path(logDir, f"${0L}%020d.json"), false))
    assert(DeltaTable.read(spark, root).count() == customer.count())
  }

  test("checkpoint writer emits the V2 FORMAT on v2Checkpoint-feature tables") {
    val root = Files.createTempDirectory("graft-v2ck-write-").toString
    DeltaTable.create(customer.limit(10), root)
    // upgrade the protocol to demand v2 checkpoints
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(root, "_delta_log/00000000000000000001.json"), false)
    try out.write(
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""" + "\n")
        .getBytes("UTF-8"))
    finally out.close()
    DeltaTable.append(customer.limit(5), root)
    DeltaTable.checkpoint(spark, root)

    // a uuid-named v2 manifest landed (NOT the classic name), carrying
    // the spec's mandatory checkpointMetadata action at the version
    val logDir = new Path(root, "_delta_log")
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val v2Re = """^(\d{20})\.checkpoint\.[0-9a-f-]{36}\.parquet$""".r
    val v2Name = names.collectFirst { case n @ v2Re(_) => n }
    assert(v2Name.isDefined, s"no uuid v2 checkpoint among ${names.mkString(", ")}")
    assert(!names.exists(_.matches("""^\d{20}\.checkpoint\.parquet$""")))
    val ckf = spark.read.parquet(new Path(logDir, v2Name.get).toString)
    assert(ckf.schema.fieldNames.contains("checkpointMetadata"))
    val ckMetaVersions = ckf
      .where("checkpointMetadata is not null")
      .selectExpr("checkpointMetadata.version").collect().map(_.getLong(0))
    assert(ckMetaVersions.toSeq == Seq(2L))

    // the checkpoint reconstructs the snapshot: drop the commits BELOW
    // it (what metadata cleanup deletes — replay starts after the
    // checkpoint version, so only the latest commit must survive as the
    // version anchor) and replay still serves every row
    (0L to 1L).foreach { v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false)
    }
    assert(DeltaTable.read(spark, root).count() == 15)
    // and commits layered on top keep working
    DeltaTable.append(customer.limit(3), root)
    assert(DeltaTable.read(spark, root).count() == 18)
  }

  test("banded v2 checkpoint: adds fan out to executor-written sidecars " +
      "behind a pointer manifest, and the manifest replays them") {
    val root = Files.createTempDirectory("graft-v2ck-band-").toString
    DeltaTable.create(customer.filter(col("c_custkey") <= 40), root,
      configuration = Map("delta.checkpointPolicy" -> "v2"))
    DeltaTable.append(customer.filter(
      col("c_custkey") > 40 && col("c_custkey") <= 90), root)
    DeltaTable.append(customer.filter(col("c_custkey") > 90), root)
    spark.conf.set("spark.graft.delta.checkpoint.partSize", "1")
    try DeltaTable.checkpoint(spark, root)
    finally spark.conf.unset("spark.graft.delta.checkpoint.partSize")
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new Path(root, "_delta_log")
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val v2Name = names.find(
      _.matches("""^\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet$"""))
    assert(v2Name.isDefined, s"no v2 manifest among ${names.mkString(", ")}")
    val sidecarFiles = fs.listStatus(new Path(logDir, "_sidecars"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(sidecarFiles.length >= 2,
      s"expected sidecar fan-out, got ${sidecarFiles.toSeq}")
    // the manifest carries NO inline adds — only pointers + metadata
    val ckf = spark.read.parquet(new Path(logDir, v2Name.get).toString)
    assert(ckf.where("add is not null").count() == 0)
    val pointed = ckf.where("sidecar is not null")
      .selectExpr("sidecar.path").collect().map(_.getString(0)).sorted
    assert(pointed.toSeq == sidecarFiles.toSeq.sorted)
    // replay from manifest + sidecars alone
    (0L to 1L).foreach(v =>
      fs.delete(new Path(logDir, f"$v%020d.json"), false))
    assert(DeltaTable.read(spark, root).count() == customer.count())
  }

  test("delta.checkpointPolicy=v2 property also selects the v2 format") {
    val root = Files.createTempDirectory("graft-v2ck-policy-").toString
    DeltaTable.create(customer.limit(8), root,
      configuration = Map("delta.checkpointPolicy" -> "v2"))
    DeltaTable.checkpoint(spark, root)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new Path(root, "_delta_log")).map(_.getPath.getName)
    assert(names.exists(_.matches("""^\d{20}\.checkpoint\.[0-9a-f-]{36}\.parquet$""")))
    assert(DeltaTable.read(spark, root).count() == 8)
  }
}
