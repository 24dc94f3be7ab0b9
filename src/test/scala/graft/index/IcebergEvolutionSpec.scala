package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable}

/**
 * Iceberg SCHEMA EVOLUTION, metadata-only and id-resolved: every data
 * file this writer produces carries parquet field ids, so renames keep
 * serving every historical file under its original spelling, added
 * columns read as null from older files, and a dropped-then-readded
 * name gets a fresh id — old values never resurrect (the spec's core
 * evolution invariant). schemas[] grows a new schema-id per change;
 * the snapshot tree is untouched.
 */
class IcebergEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft-ice-evo-").toString
    IcebergTable.create(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("id", "name", "score"), root)
    root
  }

  test("written data files carry parquet field ids; property is set") {
    val root = freshTable()
    val s = IcebergMeta.snapshot(spark, root)
    assert(s.properties.get("graft.field-ids").contains("true"))
    val footer = spark.read.parquet(s.files.map(_.path): _*).schema
    // ids live in the parquet footer, not the plain-read schema; verify
    // through an id-keyed read resolving a DIFFERENT name to the file
    val probe = StructType(Seq(StructField("renamed_id", LongType, true,
      new MetadataBuilder().putLong("parquet.field.id", 1L).build())))
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val got = spark.read.schema(probe).parquet(s.files.map(_.path): _*)
      .agg(sum(col("renamed_id"))).as[Long].first()
    assert(got == 6L)
    assert(footer.fieldNames.toSeq == Seq("id", "name", "score"))
  }

  test("rename is metadata-only; old and new files both serve the new name") {
    val root = freshTable()
    val filesBefore = IcebergMeta.snapshot(spark, root).files.map(_.path).toSet
    IcebergTable.renameColumn(spark, root, "score", "rating")
    assert(IcebergMeta.snapshot(spark, root).files.map(_.path).toSet
      == filesBefore) // zero rewrites
    // append under the NEW name, then read everything
    IcebergTable.append(Seq((4L, "d", 40.0)).toDF("id", "name", "rating"), root)
    val df = IcebergTable.read(spark, root)
    assert(df.columns.toSeq == Seq("id", "name", "rating"))
    assert(df.agg(sum(col("rating"))).as[Double].first() == 100.0)
    // schemas[] kept the history; current-schema-id repointed
    val s = IcebergMeta.snapshot(spark, root)
    assert(s.schema.fieldNames.contains("rating"))
  }

  test("manifest bounds keep pruning across a rename") {
    val root = Files.createTempDirectory("graft-ice-evo-b-").toString
    IcebergTable.create(
      spark.read.parquet(s"${TestSpark.sfDir}/orders.parquet")
        .repartitionByRange(4, col("o_orderkey")), root)
    IcebergTable.renameColumn(spark, root, "o_orderkey", "order_id")
    val df = IcebergTable.read(spark, root).filter(col("order_id") === -5L)
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.map(_.metrics("numFiles").value).sum == 0L)
  }

  test("addColumn: null from old files, filled by new appends") {
    val root = freshTable()
    IcebergTable.addColumn(spark, root, "lang", StringType)
    IcebergTable.append(
      Seq((9L, "z", 90.0, "en")).toDF("id", "name", "score", "lang"), root)
    val df = IcebergTable.read(spark, root)
    assert(df.filter(col("lang").isNull).count() == 3L)
    assert(df.filter(col("lang") === "en").count() == 1L)
  }

  test("drop then re-add the same name does NOT resurrect old values") {
    val root = freshTable()
    IcebergTable.dropColumn(spark, root, "score")
    assert(IcebergTable.read(spark, root).columns.toSeq == Seq("id", "name"))
    IcebergTable.addColumn(spark, root, "score", DoubleType)
    val df = IcebergTable.read(spark, root)
    // the original files HOLD score values under the retired id — they
    // must all read as null under the fresh id
    assert(df.filter(col("score").isNotNull).count() == 0L)
    // and new appends fill the new id
    IcebergTable.append(
      Seq((5L, "e", 55.5)).toDF("id", "name", "score"), root)
    assert(IcebergTable.read(spark, root)
      .agg(sum(col("score"))).as[Double].first() == 55.5)
  }

  test("equality delete written before a rename still applies after it") {
    val root = freshTable()
    IcebergTable.deleteWhereEquality(spark, root, Seq(2L).toDF("id"))
    IcebergTable.renameColumn(spark, root, "id", "doc_id")
    val df = IcebergTable.read(spark, root)
    assert(df.columns.contains("doc_id"))
    assert(df.filter(col("doc_id") === 2L).count() == 0L)
    assert(df.count() == 2L)
  }

  test("dropColumn refuses while an equality delete references it") {
    val root = freshTable()
    IcebergTable.deleteWhereEquality(spark, root, Seq(1L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      IcebergTable.dropColumn(spark, root, "id")
    }
    assert(e.getMessage.contains("equality delete"))
    // compact folds the delete in; then the drop is legal
    IcebergTable.compact(spark, root)
    IcebergTable.dropColumn(spark, root, "id")
    assert(IcebergTable.read(spark, root).columns.toSeq == Seq("name", "score"))
  }

  test("renameColumn refuses without the field-id guarantee") {
    val root = freshTable()
    // simulate a legacy table: strip the property from metadata.json
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val metaDir = new org.apache.hadoop.fs.Path(root, "metadata")
    val metaFile = fs.listStatus(metaDir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
      .maxBy(_.getName)
    val txt = {
      val in = fs.open(metaFile)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val stripped = txt.replace("\"graft.field-ids\"", "\"graft.field-ids-off\"")
    val out = fs.create(metaFile, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] {
      IcebergTable.renameColumn(spark, root, "id", "doc_id")
    }
    assert(e.getMessage.contains("graft.field-ids"))
  }

  test("snapshot tree is untouched by evolution: time travel still works") {
    val root = freshTable()
    val snap1 = IcebergMeta.snapshot(spark, root).snapshotId
    IcebergTable.append(Seq((4L, "d", 40.0)).toDF("id", "name", "score"), root)
    IcebergTable.renameColumn(spark, root, "score", "rating")
    // pinned old snapshot: 3 rows (current schema names apply)
    assert(IcebergTable.read(spark, root, snapshotAsOf = Some(snap1))
      .count() == 3L)
    assert(IcebergTable.read(spark, root).count() == 4L)
  }
}
