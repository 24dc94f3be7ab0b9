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

  test("the minimal writer refuses a widened table (writer gate)") {
    val root = widenedFixture()
    val e = intercept[UnsupportedDeltaProtocolException] {
      DeltaTable.append(
        DeltaTable.read(spark, root).limit(1), root)
    }
    assert(e.getMessage.contains("typeWidening"))
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
}
