package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, LakeTable, UnsupportedDeltaProtocolException}

/**
 * GENERATED and IDENTITY column support on the jarless Delta writer:
 * absent generated columns derive from their declared expression,
 * provided ones are enforced against it, UPDATE re-derives after SET;
 * absent identity columns are assigned contiguous values past the high
 * watermark (distributed two-pass assignment, no single-task funnel),
 * GENERATED ALWAYS refuses explicit values, and syncIdentity re-aligns
 * the watermark after explicit inserts. Reference counterpart: the
 * reference delegates all of this to the delta-spark connector jars
 * (sources/delta/DeltaLakeRelation.scala); jarless writes must honor
 * the same spec obligations or refuse.
 */
class DeltaGeneratedIdentitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeRawCommit(root: String, version: Long,
      lines: Seq[String]): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(DeltaLog.logDir(rootPath))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      DeltaLog.logDir(rootPath), f"$version%020d.json"), false)
    out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8")); out.close()
  }

  private def tableFixture(prefix: String, schema: StructType,
      minWriterVersion: Int): String = {
    val root = tmp(prefix)
    val escaped = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    writeRawCommit(root, 0L, Seq(
      s"""{"protocol":{"minReaderVersion":1,"minWriterVersion":$minWriterVersion}}""",
      s"""{"metaData":{"id":"genid-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$escaped","partitionColumns":[],"configuration":{},"createdTime":1}}"""))
    root
  }

  private def identitySchema(allowExplicit: Boolean, start: Long = 100L,
      step: Long = 3L, hwm: Option[Long] = None): StructType = {
    val mb = new MetadataBuilder()
      .putLong("delta.identity.start", start)
      .putLong("delta.identity.step", step)
      .putBoolean("delta.identity.allowExplicitInsert", allowExplicit)
    hwm.foreach(mb.putLong("delta.identity.highWaterMark", _))
    StructType(Seq(
      StructField("id", LongType, nullable = true, mb.build()),
      StructField("v", LongType)))
  }

  private def genSchema: StructType = StructType(Seq(
    StructField("a", LongType),
    StructField("b", LongType, nullable = true, new MetadataBuilder()
      .putString("delta.generationExpression", "a * 10").build())))

  private def hwmOf(root: String, col: String): Option[Long] = {
    val f = DeltaLog.snapshot(spark, root).schema(col)
    if (f.metadata.contains("delta.identity.highWaterMark"))
      Some(f.metadata.getLong("delta.identity.highWaterMark"))
    else None
  }

  // ---- generated columns ----

  test("generated column derives when absent, on append and overwrite, " +
      "and the declared metadata survives both") {
    val root = tableFixture("graft-gen-derive-", genSchema, 4)
    assert(DeltaTable.append(spark.range(5).selectExpr("id as a"), root) == 1L)
    val got = DeltaTable.read(spark, root).orderBy("a")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (0L until 5L).map(i => (i, i * 10)))
    // overwrite lacking the column: derives, and the generation
    // expression metadata carries onto the republished schema
    assert(DeltaTable.create(
      spark.range(3).selectExpr("id + 100 as a"), root) == 2L)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema("b").metadata.contains("delta.generationExpression"))
    assert(DeltaTable.read(spark, root).selectExpr("sum(b)").head().getLong(0)
      == (100L + 101L + 102L) * 10)
  }

  test("UPDATE re-derives generated columns after SET; SET on the " +
      "generated column itself refuses") {
    val root = tableFixture("graft-gen-upd-", genSchema, 4)
    DeltaTable.append(spark.range(4).selectExpr("id as a"), root)
    DeltaTable.update(spark, root, col("a") === 2L,
      Map("a" -> lit(7L)))
    val rows = DeltaTable.read(spark, root).orderBy("a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.contains((7L, 70L)), s"generated column must re-derive: $rows")
    assert(!rows.exists(_._2 == 20L))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.update(spark, root, col("a") === 0L, Map("b" -> lit(5L)))
    }
    assert(e.getMessage.contains("GENERATED"))
  }

  test("merge enforces provided generated values against the expression") {
    val root = tableFixture("graft-gen-merge-", genSchema, 4)
    DeltaTable.append(spark.range(4).selectExpr("id as a"), root)
    // conforming full-row source upserts
    LakeTable.merge(spark, root,
      spark.range(2, 6).selectExpr("id as a", "id * 10 as b"), Seq("a"))
    assert(DeltaTable.read(spark, root).count() == 6)
    // a source whose generated value contradicts the expression refuses
    val e = intercept[IllegalArgumentException] {
      LakeTable.merge(spark, root,
        spark.range(1).selectExpr("id as a", "id * 11 + 1 as b"), Seq("a"))
    }
    assert(e.getMessage.contains("generated column 'b'"))
  }

  // ---- identity columns ----

  test("identity assignment: contiguous values from start across a " +
      "multi-partition frame, watermark republishes, a second append " +
      "continues past it") {
    val root = tableFixture("graft-id-assign-",
      identitySchema(allowExplicit = false), 6)
    // 100 rows over 7 partitions: values must be exactly the arithmetic
    // sequence start, start+step, ... (collision-free AND gap-free)
    assert(DeltaTable.append(
      spark.range(100).repartition(7).selectExpr("id as v"), root) == 1L)
    val ids = DeltaTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 100L).map(100L + 3L * _))
    assert(hwmOf(root, "id").contains(100L + 3L * 99L))
    // second append continues from the watermark, no collisions
    DeltaTable.append(spark.range(10).selectExpr("id as v"), root)
    val all = DeltaTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(all.distinct.size == 110)
    assert(all.max == 100L + 3L * 109L)
    assert(hwmOf(root, "id").contains(100L + 3L * 109L))
  }

  test("GENERATED ALWAYS refuses explicit values on append and merge; " +
      "BY DEFAULT accepts them without moving the watermark") {
    val always = tableFixture("graft-id-always-",
      identitySchema(allowExplicit = false), 6)
    val e = intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.append(
        spark.range(3).selectExpr("id as id", "id as v"), always)
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    val e2 = intercept[UnsupportedDeltaProtocolException] {
      LakeTable.merge(spark, always,
        spark.range(3).selectExpr("id as id", "id as v"), Seq("id"))
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"))

    val byDefault = tableFixture("graft-id-bydef-",
      identitySchema(allowExplicit = true), 6)
    assert(DeltaTable.append(
      spark.range(3).selectExpr("id + 5000 as id", "id as v"),
      byDefault) == 1L)
    assert(hwmOf(byDefault, "id").isEmpty,
      "explicit values must not move the high watermark")
  }

  test("UPDATE refuses SET on an identity column; assigned values " +
      "survive an update to other columns") {
    val root = tableFixture("graft-id-upd-",
      identitySchema(allowExplicit = false), 6)
    DeltaTable.append(spark.range(5).selectExpr("id as v"), root)
    val e = intercept[IllegalArgumentException] {
      DeltaTable.update(spark, root, col("v") === 1L, Map("id" -> lit(9L)))
    }
    assert(e.getMessage.contains("IDENTITY"))
    val before = DeltaTable.read(spark, root)
      .filter(col("v") === 1L).select("id").head().getLong(0)
    DeltaTable.update(spark, root, col("v") === 1L, Map("v" -> lit(42L)))
    val after = DeltaTable.read(spark, root)
      .filter(col("v") === 42L).select("id").head().getLong(0)
    assert(after == before, "identity values must carry through UPDATE")
  }

  test("syncIdentity re-aligns the watermark after explicit inserts so " +
      "subsequent assignment cannot collide") {
    val root = tableFixture("graft-id-sync-",
      identitySchema(allowExplicit = true, start = 1L, step = 1L), 6)
    // explicit rows land beyond where assignment would start
    DeltaTable.append(
      spark.range(3).selectExpr("id + 50 as id", "id as v"), root)
    DeltaTable.syncIdentity(spark, root)
    assert(hwmOf(root, "id").contains(52L))
    DeltaTable.append(spark.range(2).selectExpr("id + 100 as v"), root)
    val ids = DeltaTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == 5)
    assert(ids.sorted.takeRight(2) == Seq(53L, 54L))
  }

  test("negative step descends from start and the watermark tracks the " +
      "minimum") {
    val root = tableFixture("graft-id-neg-",
      identitySchema(allowExplicit = false, start = 0L, step = -2L), 6)
    DeltaTable.append(spark.range(4).selectExpr("id as v"), root)
    val ids = DeltaTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(-6L, -4L, -2L, 0L))
    assert(hwmOf(root, "id").contains(-6L))
  }

  test("overwrite on an identity table carries the declared metadata " +
      "and keeps assigning monotonically") {
    val root = tableFixture("graft-id-ow-",
      identitySchema(allowExplicit = false, start = 10L, step = 1L), 6)
    DeltaTable.append(spark.range(5).selectExpr("id as v"), root)
    assert(hwmOf(root, "id").contains(14L))
    // overwrite lacking the identity column: assignment continues past
    // the watermark (never resets — the spec's monotone contract)
    DeltaTable.create(spark.range(3).selectExpr("id + 100 as v"), root)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema("id").metadata.contains("delta.identity.start"),
      "overwrite must not strip identity metadata")
    val ids = DeltaTable.read(spark, root).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(15L, 16L, 17L))
    assert(hwmOf(root, "id").contains(17L))
  }

  test("created tables declare the writer floor their schema demands") {
    val root = tmp("graft-id-create-")
    // create from a frame whose schema carries the generation expression
    val framed = spark.createDataFrame(
      spark.range(3).selectExpr("id as a", "id * 10 as b").rdd,
      genSchema)
    DeltaTable.create(framed, root)
    assert(DeltaLog.snapshot(spark, root).minWriterVersion == 4)
    // and appends to the created table derive the column
    DeltaTable.append(spark.range(5, 7).selectExpr("id as a"), root)
    assert(DeltaTable.read(spark, root).filter(col("a") === 5L)
      .select("b").head().getLong(0) == 50L)
  }
}
