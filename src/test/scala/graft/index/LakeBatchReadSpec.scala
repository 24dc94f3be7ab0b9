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

  test("batch writer syntax: save modes on both formats, partitionBy option") {
    val d = tmp("graft-batchw-delta-")
    customer.limit(50).write.format("graft-delta")
      .option("partitionBy", "c_mktsegment").save(d)
    assert(DeltaTable.read(spark, d).count() == 50)
    customer.orderBy(desc("c_custkey")).limit(20).write.format("graft-delta")
      .mode("append").save(d)
    assert(DeltaTable.read(spark, d).count() == 70)
    intercept[IllegalArgumentException] {
      customer.limit(5).write.format("graft-delta")
        .mode("errorifexists").save(d)
    }
    customer.limit(5).write.format("graft-delta").mode("ignore").save(d)
    assert(DeltaTable.read(spark, d).count() == 70)
    customer.limit(30).write.format("graft-delta").mode("overwrite").save(d)
    assert(DeltaTable.read(spark, d).count() == 30)

    val i = tmp("graft-batchw-ice-")
    customer.limit(40).write.format("graft-iceberg")
      .option("partitionBy", "bucket(4, c_custkey)").save(i)
    assert(IcebergTable.read(spark, i).count() == 40)
    assert(graft.index.sources.IcebergMeta.snapshot(spark, i)
      .partitionFields.map(_.transform) == Seq("bucket[4]"))
    customer.orderBy(desc("c_custkey")).limit(10).write
      .format("graft-iceberg").mode("append").save(i)
    assert(IcebergTable.read(spark, i).count() == 50)
    // true overwrite: data replaced, table history (time travel) kept
    val preOverwrite = graft.index.sources.IcebergMeta.snapshot(spark, i).snapshotId
    customer.limit(15).write.format("graft-iceberg").mode("overwrite").save(i)
    assert(IcebergTable.read(spark, i).count() == 15)
    assert(IcebergTable.read(spark, i,
      snapshotAsOf = Some(preOverwrite)).count() == 50)
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
