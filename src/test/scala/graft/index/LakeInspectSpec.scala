package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaTable, IcebergTable, LakeTable}

/**
 * Table inspection (`DESCRIBE DETAIL` + metadata tables) over both
 * lake formats: counts reconcile with the snapshot, partition tuples
 * surface (hidden transforms included), and everything is metadata —
 * no data scan.
 */
class LakeInspectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("detail: one-row summary on both formats; refuses non-lake paths") {
    val d = tmp("graft-inspect-delta-")
    DeltaTable.create(customer.limit(100), d, partitionBy = Seq("c_mktsegment"))
    val dd = LakeTable.detail(spark, d).collect()
    assert(dd.length == 1)
    val r = dd.head
    assert(r.getAs[String]("format") == "delta")
    assert(r.getAs[Long]("num_files") > 0)
    assert(r.getAs[Long]("size_in_bytes") > 0)
    assert(r.getAs[scala.collection.Seq[String]]("partition_columns")
      .toSeq == Seq("c_mktsegment"))
    assert(!r.isNullAt(r.fieldIndex("min_reader_version")))

    val i = tmp("graft-inspect-ice-")
    IcebergTable.create(customer.limit(100), i,
      partitionColumns = Seq("bucket(4, c_custkey)"))
    val di = LakeTable.detail(spark, i).collect().head
    assert(di.getAs[String]("format") == "iceberg")
    assert(di.getAs[scala.collection.Seq[String]]("partition_columns")
      .exists(_.contains("bucket[4]")))

    intercept[IllegalArgumentException] {
      LakeTable.detail(spark, tmp("graft-inspect-none-"))
    }
  }

  test("files + partitions reconcile with the snapshot on a hidden-partitioned table") {
    val i = tmp("graft-inspect-files-")
    IcebergTable.create(customer.limit(200), i,
      partitionColumns = Seq("bucket(4, c_custkey)"))
    IcebergTable.append(customer.orderBy(desc("c_custkey")).limit(50), i)
    val s = graft.index.sources.IcebergMeta.snapshot(spark, i)

    val files = LakeTable.inspect(spark, i, "files")
    assert(files.count() == s.files.size)
    // every file row carries its bucket tuple
    val tuples = files.select($"partition").as[Map[String, String]].collect()
    assert(tuples.forall(t => t.get("c_custkey_bucket").exists(v =>
      v.toInt >= 0 && v.toInt < 4)))

    val parts = LakeTable.inspect(spark, i, "partitions")
    val rows = parts.collect()
    assert(rows.length <= 4 && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("file_count")).sum == s.files.size)
    assert(rows.map(_.getAs[Long]("total_size_in_bytes")).sum ==
      s.files.map(_.size).sum)

    // delete files surface after a MOR delete
    IcebergTable.deleteWhere(spark, i, col("c_acctbal") < 0)
    val dels = LakeTable.inspect(spark, i, "delete_files").collect()
    assert(dels.nonEmpty)
    assert(dels.forall(_.getAs[String]("content") == "position"))

    intercept[IllegalArgumentException] {
      LakeTable.inspect(spark, i, "nope")
    }
  }

  test("delta files: DV flag and partition values surface") {
    val d = tmp("graft-inspect-ddv-")
    DeltaTable.create(customer.limit(100), d, partitionBy = Seq("c_mktsegment"))
    DeltaTable.deleteWhere(spark, d, col("c_custkey") % 7 === 0)
    val files = LakeTable.inspect(spark, d, "files").collect()
    assert(files.nonEmpty)
    assert(files.exists(_.getAs[Boolean]("has_deletion_vector")))
    assert(files.forall(_.getAs[Map[String, String]]("partition")
      .contains("c_mktsegment")))
    // unpartitioned table: one all-files partitions row, empty tuple
    val u = tmp("graft-inspect-up-")
    DeltaTable.create(customer.limit(30), u)
    val parts = LakeTable.inspect(spark, u, "partitions").collect()
    assert(parts.length == 1 &&
      parts.head.getAs[Map[String, String]]("partition").isEmpty)
  }
}
