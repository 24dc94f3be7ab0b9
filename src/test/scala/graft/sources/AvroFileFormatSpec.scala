package graft.sources

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The jarless avro source (graft.sources.avro.AvroFileFormat): type
  * coverage, split reads, pruning, schema evolution. */
class AvroFileFormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("short name `avro` resolves to the in-repo format") {
    val cls = org.apache.spark.sql.execution.datasources.DataSource
      .lookupDataSource("avro", spark.sessionState.conf)
    assert(cls == classOf[graft.sources.avro.AvroFileFormat])
  }

  test("all supported types round trip, including nulls") {
    val schema = StructType(Seq(
      StructField("b", BooleanType),
      StructField("i", IntegerType),
      StructField("l", LongType),
      StructField("f", FloatType),
      StructField("d", DoubleType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(12, 3)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("st", StructType(Seq(
        StructField("x", IntegerType), StructField("y", StringType))))))
    val rows = Seq(
      Row(true, 7, 42L, 1.5f, 2.25, "héllo", Array[Byte](1, 2, 3),
        Date.valueOf("2024-06-01"), Timestamp.valueOf("2024-06-01 12:34:56.789"),
        new java.math.BigDecimal("12345.678"), Seq(1L, 2L, 3L),
        Map("a" -> 1.0, "b" -> 2.0), Row(9, "nested")),
      Row(null, null, null, null, null, null, null, null, null, null,
        null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmp("graft-avro-types-")
    df.write.mode("overwrite").format("avro").save(dir)

    val back = spark.read.format("avro").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(r => Option(r.getAs[java.lang.Boolean]("b"))
      .map(_.toString).getOrElse(""))
    val exp = rows.sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    assert(got.length == 2)
    // binary needs element-wise compare; the rest compare structurally
    assert(got.zip(exp).forall { case (g, e) =>
      (0 until schema.length).forall { i =>
        (g.get(i), e.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => a.sameElements(b)
          case (a, b) => a == b
        }
      }
    })
  }

  test("splittable: one large file reads correctly across many partitions") {
    val dir = tmp("graft-avro-split-")
    spark.range(0, 200000).select($"id", ($"id" % 97).as("k"),
        concat(lit("row-"), $"id").as("s"))
      .coalesce(1)
      .write.mode("overwrite").format("avro").save(dir)

    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val df = spark.read.format("avro").load(dir)
      assert(df.rdd.getNumPartitions > 4, "expected the file to split")
      assert(df.count() == 200000)
      assert(df.agg(sum($"id")).as[Long].head() == 199999L * 200000 / 2)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("column pruning and filters still answer correctly") {
    val dir = tmp("graft-avro-prune-")
    spark.range(0, 1000).select($"id", ($"id" * 2).as("v"),
        lit("pad").as("pad"))
      .write.mode("overwrite").format("avro").save(dir)
    val out = spark.read.format("avro").load(dir)
      .filter($"id" < 10).select($"v").as[Long].collect().sorted
    assert(out.toSeq == (0L until 10L).map(_ * 2))
  }

  test("schema evolution: a column absent from the file reads as null") {
    val dir = tmp("graft-avro-evolve-")
    spark.range(0, 5).select($"id").write.mode("overwrite")
      .format("avro").save(dir)
    val widened = StructType(Seq(
      StructField("id", LongType), StructField("extra", StringType)))
    val back = spark.read.format("avro").schema(widened).load(dir)
    assert(back.count() == 5)
    assert(back.filter($"extra".isNull).count() == 5)
  }

  test("partitioned layout: directory partition columns come back") {
    val dir = tmp("graft-avro-part-")
    spark.range(0, 100).select($"id", ($"id" % 4).as("p"))
      .write.mode("overwrite").format("avro").partitionBy("p").save(dir)
    val back = spark.read.format("avro").load(dir)
    assert(back.count() == 100)
    assert(back.filter($"p" === 2).count() == 25)
    assert(back.select($"p").distinct().as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }
}
