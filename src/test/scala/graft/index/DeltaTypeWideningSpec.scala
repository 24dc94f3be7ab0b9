package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, UnsupportedDeltaProtocolException}

/**
 * Delta `typeWidening` READ support: widening is additive metadata — an
 * ALTER widens the declared schema (int→long, float→double, …) while
 * files written before it keep the narrower physical type, and readers
 * upcast at scan time. The jarless reader accepts the feature in its
 * protocol gate and reads with the CURRENT schema; Spark 4's parquet
 * readers perform the physical upcast. The minimal WRITER keeps
 * refusing widened tables (writerFeatures gate): appending without
 * maintaining `delta.typeChanges` metadata would be non-conforming.
 */
class DeltaTypeWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  /** Create a table with narrow types, then publish a widening commit
    * (protocol upgrade + metaData with the widened schema), the shape
    * delta-spark's ALTER TABLE … TYPE WIDENING produces. */
  private def widenedFixture(): String = {
    val root = Files.createTempDirectory("graft-delta-widen-").toString
    val narrow = customer
      .select(
        col("c_custkey").cast("int").as("c_custkey"),
        col("c_acctbal").cast("float").as("c_acctbal"),
        col("c_mktsegment"))
    DeltaTable.create(narrow, root)

    val widened = StructType(Seq(
      StructField("c_custkey", LongType, nullable = true,
        new MetadataBuilder().putString("delta.typeChanges",
          """[{"fromType":"integer","toType":"long"}]""").build()),
      StructField("c_acctbal", DoubleType, nullable = true,
        new MetadataBuilder().putString("delta.typeChanges",
          """[{"fromType":"float","toType":"double"}]""").build()),
      StructField("c_mktsegment", StringType)))
    def esc(s: String): String = s
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val lines = Seq(
      """{"commitInfo":{"timestamp":0,"operation":"CHANGE COLUMN"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],""" +
        """"writerFeatures":["typeWidening"]}}""",
      s"""{"metaData":{"id":"widen-fixture","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"${esc(widened.json)}",""" +
        s""""partitionColumns":[],"configuration":{}}}""")
    Files.write(
      Paths.get(root, "_delta_log", f"${1L}%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    root
  }

  test("widened table reads: current schema, old narrow files upcast") {
    val root = widenedFixture()
    val got = DeltaTable.read(spark, root)
    // the declared schema is the WIDENED one
    assert(got.schema("c_custkey").dataType == LongType)
    assert(got.schema("c_acctbal").dataType == DoubleType)
    // every row still reads, values upcast losslessly
    assert(got.count() == customer.count())
    val wantKeys = customer.select(sum(col("c_custkey").cast("long")))
      .head().getLong(0)
    assert(got.select(sum(col("c_custkey"))).head().getLong(0) == wantKeys)
    val wantBal = customer
      .select(sum(col("c_acctbal").cast("float").cast("double")))
      .head().getDouble(0)
    val gotBal = got.select(sum(col("c_acctbal"))).head().getDouble(0)
    assert(math.abs(gotBal - wantBal) < 1e-6)
  }

  test("time travel BEFORE the widening still reads the narrow schema") {
    val root = widenedFixture()
    val pinned = DeltaTable.read(spark, root, versionAsOf = Some(0L))
    assert(pinned.schema("c_custkey").dataType == IntegerType)
    assert(pinned.schema("c_acctbal").dataType == FloatType)
    assert(pinned.count() == customer.count())
  }

  test("the preview feature name is accepted too") {
    val root = widenedFixture()
    // rewrite the protocol line to the preview name
    val commit = Paths.get(root, "_delta_log", f"${1L}%020d.json")
    val txt = new String(Files.readAllBytes(commit), StandardCharsets.UTF_8)
      .replace("\"typeWidening\"", "\"typeWidening-preview\"")
    Files.write(commit, txt.getBytes(StandardCharsets.UTF_8))
    assert(DeltaTable.read(spark, root).count() == customer.count())
  }

  test("append to a widened table works and preserves the type-change history") {
    val root = widenedFixture()
    val before = DeltaTable.read(spark, root).count()
    // wide-typed rows (the read shape) append directly
    DeltaTable.append(DeltaTable.read(spark, root).limit(5), root)
    assert(DeltaTable.read(spark, root).count() == before + 5)
    // NARROWER incoming data (the pre-widening shape) upcasts at write
    val narrow = customer.limit(3).select(
      col("c_custkey").cast("int").as("c_custkey"),
      col("c_acctbal").cast("float").as("c_acctbal"),
      col("c_mktsegment"))
    DeltaTable.append(narrow, root)
    val got = DeltaTable.read(spark, root)
    assert(got.count() == before + 8)
    assert(got.schema("c_custkey").dataType == LongType)
    // the standing metaData still carries delta.typeChanges
    val sch = DeltaLog.snapshot(spark, root).schema
    assert(sch("c_custkey").metadata.contains("delta.typeChanges"))
    assert(sch("c_acctbal").metadata.contains("delta.typeChanges"))
  }

  test("merge on a widened table works (writer gate accepts the feature)") {
    val root = widenedFixture()
    val source = DeltaTable.read(spark, root)
      .filter(col("c_custkey") <= 10)
      .withColumn("c_acctbal", lit(0.0))
    DeltaTable.merge(spark, root, source, Seq("c_custkey"))
    val got = DeltaTable.read(spark, root)
    assert(got.filter(col("c_custkey") <= 10 &&
      col("c_acctbal") =!= 0.0).count() == 0)
    assert(got.count() == customer.count())
  }

  test("widenColumnTypes: ALTER-style widening, then appends keep working") {
    val root = Files.createTempDirectory("graft-delta-widen-alter-").toString
    val narrow = customer.select(
      col("c_custkey").cast("int").as("c_custkey"),
      col("c_acctbal").cast("float").as("c_acctbal"),
      col("c_mktsegment"))
    DeltaTable.create(narrow, root)
    DeltaTable.widenColumnTypes(spark, root,
      Map("c_custkey" -> LongType, "c_acctbal" -> DoubleType))
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema("c_custkey").dataType == LongType)
    assert(s.schema("c_acctbal").dataType == DoubleType)
    assert(s.readerFeatures.contains("typeWidening"))
    assert(s.writerFeatures.contains("typeWidening"))
    // the recorded change history
    val tc = s.schema("c_custkey").metadata
      .getMetadataArray("delta.typeChanges").toSeq
    assert(tc.map(m => (m.getString("fromType"), m.getString("toType"))) ==
      Seq(("integer", "long")))
    // old narrow files upcast; new wide rows append
    assert(DeltaTable.read(spark, root).count() == customer.count())
    DeltaTable.append(customer.limit(4).select(
      col("c_custkey"), col("c_acctbal"), col("c_mktsegment")), root)
    assert(DeltaTable.read(spark, root).count() == customer.count() + 4)

    // a SECOND widening would append to the history; int->long again is
    // no longer eligible (already long) and narrowing refuses
    val e = intercept[IllegalArgumentException] {
      DeltaTable.widenColumnTypes(spark, root, Map("c_custkey" -> IntegerType))
    }
    assert(e.getMessage.contains("narrowing is refused"))
  }

  test("mergeSchema append widens a declared type and records the change") {
    val root = Files.createTempDirectory("graft-delta-widen-ms-").toString
    val narrow = customer.select(
      col("c_custkey").cast("int").as("c_custkey"),
      col("c_acctbal").cast("float").as("c_acctbal"),
      col("c_mktsegment"))
    DeltaTable.create(narrow, root)
    val wide = customer.limit(5).select(
      col("c_custkey").cast("int").as("c_custkey"),
      col("c_acctbal"), // double — wider than the declared float
      col("c_mktsegment"))
    // a plain minWriter=2 table refuses type changes exactly as before
    val e0 = intercept[IllegalArgumentException] {
      DeltaTable.append(wide, root, mergeSchema = true)
    }
    assert(e0.getMessage.contains("cast it or overwrite"))
    // enable the feature (any eligible widening upgrades the protocol)
    DeltaTable.widenColumnTypes(spark, root, Map("c_custkey" -> LongType))
    // now the mergeSchema append widens float -> double in-place
    DeltaTable.append(wide, root, mergeSchema = true)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema("c_acctbal").dataType == DoubleType)
    val tc = s.schema("c_acctbal").metadata
      .getMetadataArray("delta.typeChanges").toSeq
    assert(tc.map(m => (m.getString("fromType"), m.getString("toType"))) ==
      Seq(("float", "double")))
    // without mergeSchema the same wide frame still refuses
    val e1 = intercept[IllegalArgumentException] {
      DeltaTable.append(customer.limit(2).select(
        col("c_custkey").cast("int").as("c_custkey"),
        col("c_acctbal").cast("decimal(12,2)").as("c_acctbal"),
        col("c_mktsegment")), root)
    }
    assert(e1.getMessage.contains("cast it or overwrite"))
    // everything still reads, old narrow files upcast twice over
    val got = DeltaTable.read(spark, root)
    assert(got.count() == customer.count() + 5)
    assert(got.schema("c_custkey").dataType == LongType)
    assert(got.schema("c_acctbal").dataType == DoubleType)
  }

  test("a column with delta.invariants metadata ENFORCES on write " +
      "(was a blanket usage-gate refusal before r12)") {
    val root = Files.createTempDirectory("graft-delta-inv-").toString
    DeltaTable.create(customer.limit(10)
      .select(col("c_custkey"), col("c_mktsegment")), root)
    // hand-publish a metaData whose field carries an invariant
    val invSchema = StructType(Seq(
      StructField("c_custkey", LongType, nullable = true,
        new MetadataBuilder().putString("delta.invariants",
          """{"expression":{"expression":"c_custkey > 0"}}""").build()),
      StructField("c_mktsegment", StringType)))
    def esc(s: String): String = s
      .replace("\\", "\\\\").replace("\"", "\\\"")
    val lines = Seq(
      """{"commitInfo":{"timestamp":0,"operation":"CHANGE COLUMN"}}""",
      s"""{"metaData":{"id":"inv-fixture","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"${esc(invSchema.json)}",""" +
        s""""partitionColumns":[],"configuration":{}}}""")
    Files.write(
      Paths.get(root, "_delta_log", f"${1L}%020d.json"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    // conforming rows append; a violating row refuses naming the column
    assert(DeltaTable.append(DeltaTable.read(spark, root)
      .filter(col("c_custkey") > 0).limit(1), root) == 2L)
    val e = intercept[IllegalArgumentException] {
      DeltaTable.append(DeltaTable.read(spark, root).limit(1)
        .withColumn("c_custkey", col("c_custkey") * -1), root)
    }
    assert(e.getMessage.contains("invariant") &&
      e.getMessage.contains("c_custkey"), e.getMessage)
  }

  test("an UNKNOWN reader feature alongside typeWidening still refuses") {
    val root = widenedFixture()
    val commit = Paths.get(root, "_delta_log", f"${1L}%020d.json")
    val txt = new String(Files.readAllBytes(commit), StandardCharsets.UTF_8)
      .replace("""["typeWidening"]""", """["typeWidening","futureFeature"]""")
    Files.write(commit, txt.getBytes(StandardCharsets.UTF_8))
    val e = intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.read(spark, root).count()
    }
    assert(e.getMessage.contains("futureFeature"))
  }

  test("SQL ALTER COLUMN TYPE on an UNMAPPED table: widens without " +
      "inventing column mapping (modern writers enable typeWidening " +
      "alone); a narrow SQL INSERT upcasts; time travel before the " +
      "widening reads narrow") {
    val root = Files.createTempDirectory("graft-delta-widen-um-").toString
    val narrow = customer.select(
      col("c_custkey").cast("int").as("c_custkey"),
      col("c_acctbal").cast("float").as("c_acctbal"),
      col("c_mktsegment"))
    DeltaTable.create(narrow, root)
    spark.sql(s"ALTER TABLE graft_delta.`$root` " +
      "ALTER COLUMN c_custkey TYPE BIGINT")
    spark.sql(s"ALTER TABLE graft_delta.`$root` " +
      "ALTER COLUMN c_acctbal TYPE DOUBLE")
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema("c_custkey").dataType == LongType)
    assert(s.schema("c_acctbal").dataType == DoubleType)
    // the widening must NOT drag column mapping in: no physical names
    // in the widened fields, no mapping mode, no mapping features
    assert(!s.schema("c_custkey").metadata.contains(
      "delta.columnMapping.physicalName"))
    assert(!s.configuration.get("delta.columnMapping.mode")
      .exists(_ != "none"))
    assert(s.readerFeatures.contains("typeWidening") &&
      !s.readerFeatures.contains("columnMapping"))
    // old narrow files upcast at scan
    val wide = DeltaTable.read(spark, root)
    assert(wide.schema("c_custkey").dataType == LongType &&
      wide.count() == customer.count())
    // a SQL INSERT whose literals are NARROW upcasts through the ANSI
    // runtime casts (the r14 INSERT-cast path, now under widening)
    spark.sql(s"INSERT INTO graft_delta.`$root` " +
      "SELECT CAST(9000001 AS INT), CAST(1.5 AS FLOAT), 'TEST'")
    assert(DeltaTable.read(spark, root)
      .filter(col("c_custkey") === 9000001L).count() == 1)
    // pre-widening version still reads the narrow schema
    val pinned = DeltaTable.read(spark, root, versionAsOf = Some(0L))
    assert(pinned.schema("c_custkey").dataType == IntegerType &&
      pinned.schema("c_acctbal").dataType == FloatType)
  }

  test("widening a COLUMN-MAPPED table: physical names survive, old " +
      "narrow files upcast, appends land at the wide type") {
    val root = Files.createTempDirectory("graft-delta-widen-cm-").toString
    val narrow = customer.select(
      col("c_custkey").cast("int").as("c_custkey"),
      col("c_acctbal").cast("float").as("c_acctbal"),
      col("c_mktsegment"))
    DeltaTable.create(narrow, root)
    // enable mapping the user way: a rename
    DeltaTable.renameColumn(spark, root, "c_acctbal", "balance")
    DeltaTable.widenColumnTypes(spark, root, Map(
      "c_custkey" -> LongType, "balance" -> DoubleType))
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema("c_custkey").dataType == LongType)
    assert(s.schema("balance").dataType == DoubleType)
    import graft.index.sources.{DeltaColumnMapping => Cm}
    // the widened fields keep their physical names AND the change log
    assert(Cm.physicalName(s.schema("balance")) == "c_acctbal")
    assert(s.schema("balance").metadata
      .getMetadataArray("delta.typeChanges").nonEmpty)
    // old narrow physical files upcast through the mapping
    val before = DeltaTable.read(spark, root)
    assert(before.schema("balance").dataType == DoubleType)
    assert(before.count() == customer.count())
    // a post-widening append at the wide type reads back united
    DeltaTable.append(
      before.limit(3).withColumn("c_custkey", col("c_custkey") + 1000000L),
      root)
    assert(DeltaTable.read(spark, root).count() == customer.count() + 3)
    assert(DeltaTable.read(spark, root)
      .filter(col("c_custkey") > 999999L).count() == 3)
  }
}
