package graft.index

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaColumnMapping => Cm, DeltaLog, DeltaTable, UnsupportedDeltaProtocolException}

/**
 * Delta COLUMN MAPPING: `renameColumn` is a metadata-only commit (no
 * data file moves), mapped tables read back under logical names, file
 * skipping keeps working (stats are keyed by physical name on both
 * sides), appends write physical names, deletion vectors compose, time
 * travel to pre-rename versions shows the old names, and non-conforming
 * mappings are refused.
 */
class DeltaColumnMappingSpec extends AnyFunSuite {
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

  private def dataFilesOf(root: String): Set[String] =
    DeltaLog.snapshot(spark, root).files.map(_.path).toSet

  private def freshOrders(): String = {
    val root = Files.createTempDirectory("graft-delta-cm-").toString
    DeltaTable.create(
      spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
        .repartitionByRange(4, col("o_orderkey")), root)
    root
  }

  test("renameColumn is metadata-only and reads back under the new name") {
    val root = freshOrders()
    val before = dataFilesOf(root)
    val sumBefore = DeltaTable.read(spark, root)
      .agg(sum(col("o_orderkey"))).as[Long].first()
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    assert(dataFilesOf(root) == before) // zero files rewritten
    val s = DeltaLog.snapshot(spark, root)
    assert(Cm.mode(s.configuration) == "name")
    assert(s.schema.fieldNames.contains("order_id"))
    assert(!s.schema.fieldNames.contains("o_orderkey"))
    assert(Cm.physicalName(s.schema("order_id")) == "o_orderkey")
    val df = DeltaTable.read(spark, root)
    assert(df.columns.contains("order_id"))
    assert(df.agg(sum(col("order_id"))).as[Long].first() == sumBefore)
    // legacy protocol upgraded to the column-mapping one
    assert(s.minReaderVersion == 2 && s.minWriterVersion == 5)
  }

  test("file skipping keeps working across a rename") {
    val root = freshOrders()
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val probe = DeltaTable.read(spark, root)
      .agg(min(col("order_id"))).as[Long].first()
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("order_id") === probe)) == 1L)
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("order_id") === -1L)) == 0L)
  }

  test("append after a rename writes physical names; read unifies") {
    val root = freshOrders()
    val n0 = DeltaTable.read(spark, root).count()
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val extra = DeltaTable.read(spark, root).limit(5)
    val before = dataFilesOf(root)
    DeltaTable.append(extra, root)
    assert(DeltaTable.read(spark, root).count() == n0 + 5)
    // the appended files spell the PHYSICAL name on disk
    val newFiles = (dataFilesOf(root) -- before).toSeq
    assert(newFiles.nonEmpty)
    val physSchema = spark.read.parquet(newFiles: _*).schema
    assert(physSchema.fieldNames.contains("o_orderkey"))
    assert(!physSchema.fieldNames.contains("order_id"))
    // and carry stats that still prune under the logical name
    assert(scannedFiles(DeltaTable.read(spark, root)
      .filter(col("order_id") === -1L)) == 0L)
  }

  test("deleteWhere (DV merge-on-read) works on a mapped table") {
    val root = freshOrders()
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val victim = DeltaTable.read(spark, root)
      .agg(min(col("order_id"))).as[Long].first()
    DeltaTable.deleteWhere(spark, root, col("order_id") === victim)
    val s = DeltaLog.snapshot(spark, root)
    // features protocol now carries BOTH capabilities
    assert(s.readerFeatures.contains("deletionVectors"))
    assert(DeltaTable.read(spark, root)
      .filter(col("order_id") === victim).count() == 0L)
  }

  test("a DV table gains columnMapping as a feature on rename") {
    val root = freshOrders()
    DeltaTable.deleteWhere(spark, root, col("o_orderkey") % 97 === 3)
    DeltaTable.renameColumn(spark, root, "o_totalprice", "price")
    val s = DeltaLog.snapshot(spark, root)
    assert(s.minReaderVersion == 3 && s.minWriterVersion == 7)
    assert(s.readerFeatures.contains("columnMapping"))
    assert(s.writerFeatures.contains("columnMapping"))
    assert(DeltaTable.read(spark, root).columns.contains("price"))
  }

  test("partition-column rename keeps partition recovery working") {
    val root = Files.createTempDirectory("graft-delta-cm-part-").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "grp")
    DeltaTable.create(df, root, partitionBy = Seq("grp"))
    DeltaTable.renameColumn(spark, root, "grp", "bucket")
    val s = DeltaLog.snapshot(spark, root)
    assert(s.partitionColumns == Seq("bucket"))
    val out = DeltaTable.read(spark, root)
    assert(out.filter(col("bucket") === "a").count() == 2L)
    // append into the renamed partition column
    DeltaTable.append(Seq((4L, "c")).toDF("id", "bucket"), root,
      partitionBy = Seq("bucket"))
    assert(DeltaTable.read(spark, root)
      .filter(col("bucket") === "c").count() == 1L)
  }

  test("time travel to a pre-rename version shows the old names") {
    val root = freshOrders()
    val v0 = DeltaLog.snapshot(spark, root).version
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val old = DeltaTable.read(spark, root, versionAsOf = Some(v0))
    assert(old.columns.contains("o_orderkey"))
    assert(!old.columns.contains("order_id"))
  }

  test("checkpoint + purge keep a mapped table mapped") {
    val root = freshOrders()
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    DeltaTable.checkpoint(spark, root)
    DeltaTable.append(DeltaTable.read(spark, root).limit(1), root)
    assert(Cm.mode(DeltaLog.snapshot(spark, root).configuration) == "name")
    DeltaTable.deleteWhere(spark, root, col("order_id") % 13 === 1)
    DeltaTable.purge(spark, root)
    val s = DeltaLog.snapshot(spark, root)
    assert(Cm.mode(s.configuration) == "name")
    assert(s.files.forall(_.dv.isEmpty))
    assert(DeltaTable.read(spark, root).columns.contains("order_id"))
  }

  test("uuid-style physical names round-trip through toLogical/toPhysical") {
    val physId = "col-8d3a77c1"
    val md = new MetadataBuilder()
      .putString(Cm.PhysicalNameKey, physId).putLong(Cm.IdKey, 1L).build()
    val logical = StructType(Seq(StructField("amount", LongType, true, md)))
    val physFrame = Seq(7L, 9L).toDF(physId)
    val logFrame = Cm.toLogical(physFrame, logical)
    assert(logFrame.columns.toSeq == Seq("amount"))
    assert(logFrame.as[Long].collect().sorted.toSeq == Seq(7L, 9L))
    val back = Cm.toPhysical(logFrame, logical)
    assert(back.columns.toSeq == Seq(physId))
  }

  test("a declared mapping without physicalNames is refused") {
    val root = freshOrders()
    // corrupt: set the mode without mapping the schema
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val s = DeltaLog.snapshot(spark, root)
    val commit = new org.apache.hadoop.fs.Path(root,
      f"_delta_log/${s.version + 1}%020d.json")
    val line = org.json4s.jackson.JsonMethods.compact(
      org.json4s.JsonDSL.pair2jvalue("metaData" -> org.json4s.JObject(
        "id" -> org.json4s.JString("x"),
        "format" -> org.json4s.JObject(
          "provider" -> org.json4s.JString("parquet"),
          "options" -> org.json4s.JObject()),
        "schemaString" -> org.json4s.JString(s.schemaString),
        "partitionColumns" -> org.json4s.JArray(Nil),
        "configuration" -> org.json4s.JObject(
          Cm.ModeKey -> org.json4s.JString("name")))))
    val out = fs.create(commit, false)
    try out.write((line + "\n").getBytes("UTF-8")) finally out.close()
    val e = intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.read(spark, root)
    }
    assert(e.getMessage.contains("physicalName"))
  }

  test("addColumn without maxColumnId derives fresh ids from the schema") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = freshOrders()
    DeltaTable.renameColumn(spark, root, "o_orderkey", "order_id")
    // forge a foreign writer's commit: the SAME metaData, with the
    // maxColumnId counter dropped from configuration
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val s0 = DeltaLog.snapshot(spark, root)
    val head = new org.apache.hadoop.fs.Path(root,
      f"_delta_log/${s0.version}%020d.json")
    val mdLine = scala.io.Source.fromInputStream(fs.open(head))
      .getLines().find(_.contains("\"metaData\"")).get
    val stripped = JsonMethods.parse(mdLine).transformField {
      case ("configuration", JObject(fields)) =>
        ("configuration", JObject(fields.filterNot(_._1 == Cm.MaxIdKey)))
    }
    val commit = new org.apache.hadoop.fs.Path(root,
      f"_delta_log/${s0.version + 1}%020d.json")
    val out = fs.create(commit, false)
    try out.write((JsonMethods.compact(stripped) + "\n").getBytes("UTF-8"))
    finally out.close()

    val before = DeltaLog.snapshot(spark, root)
    assert(!before.configuration.contains(Cm.MaxIdKey))
    val schemaMax = Cm.maxFieldId(before.schema)
    assert(schemaMax >= before.schema.length,
      "mapping enablement assigns one id per field")
    DeltaTable.addColumn(spark, root, "flag", IntegerType)
    val s = DeltaLog.snapshot(spark, root)
    // the fresh id continues past the schema's own max — no collision
    assert(s.schema("flag").metadata.getLong(Cm.IdKey) == schemaMax + 1)
    val ids = s.schema.fields.filter(_.metadata.contains(Cm.IdKey))
      .map(_.metadata.getLong(Cm.IdKey)).toSeq
    assert(ids.distinct.size == ids.size, s"field-id collision: $ids")
    assert(s.configuration(Cm.MaxIdKey).toLong == schemaMax + 1)
    // the evolved table still reads (new column null everywhere)
    val df = DeltaTable.read(spark, root)
    assert(df.filter(col("flag").isNotNull).count() == 0)
  }
}
