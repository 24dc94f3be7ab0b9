package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaTable, IcebergTable}

/**
 * Batch reader syntax — `spark.read.format("graft-delta" |
 * "graft-iceberg").load(path)` with time-travel options — wrapping the
 * optimized reads (stats skipping, MOR, hidden-partition pruning all
 * apply inside the relation).
 */
class LakeBatchReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("graft-delta batch read: content, filters, projection, time travel") {
    val root = tmp("graft-batch-delta-")
    DeltaTable.create(customer.limit(80), root) // v0
    DeltaTable.append(customer.orderBy(desc("c_custkey")).limit(40), root) // v1
    DeltaTable.deleteWhere(spark, root, col("c_acctbal") < 0) // v2, DVs

    val df = spark.read.format("graft-delta").load(root)
    val want = DeltaTable.read(spark, root)
    assert(df.count() == want.count())
    assert(df.schema == want.schema)
    // filters (incl. MOR correctness) and projection through the relation
    assert(df.filter(col("c_nationkey") < 10).count() ==
      want.filter(col("c_nationkey") < 10).count())
    assert(df.select("c_custkey").agg(sum("c_custkey")).head.getLong(0) ==
      want.agg(sum("c_custkey")).head.getLong(0))
    // zero-column scans (count(*)) work
    assert(df.groupBy().count().head.getLong(0) == want.count())

    // time travel options
    assert(spark.read.format("graft-delta").option("versionAsOf", "0")
      .load(root).count() == 80)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-delta").option("versionAsOf", "0")
        .option("timestampAsOf", "2030-01-01").load(root)
    }
  }

  test("graft-iceberg batch read: hidden-partition table + snapshotAsOf") {
    val root = tmp("graft-batch-ice-")
    val s1 = IcebergTable.create(customer.limit(100), root,
      partitionColumns = Seq("bucket(4, c_custkey)"))
    IcebergTable.append(customer.orderBy(desc("c_custkey")).limit(30), root)

    val df = spark.read.format("graft-iceberg").load(root)
    val want = IcebergTable.read(spark, root)
    assert(df.count() == want.count())
    val key = customer.agg(min("c_custkey")).head.getLong(0)
    assert(df.filter(col("c_custkey") === key).count() ==
      want.filter(col("c_custkey") === key).count())
    assert(spark.read.format("graft-iceberg")
      .option("snapshotAsOf", s1.toString).load(root).count() == 100)
  }
}
