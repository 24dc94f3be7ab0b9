package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable, LakeTable}

/**
 * Iceberg ZERO-COPY CLONE (the `snapshot` procedure shape): the
 * clone's first snapshot references source files by absolute path —
 * no bytes move — preserving the source schema JSON (field ids) and
 * per-file sequence numbers, so MOR delete state replays exactly.
 */
class IcebergCloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def parquetCountUnder(root: String): Int = {
    val p = new Path(root, "data")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  test("clone is metadata-only; MOR delete state and field ids survive") {
    val src = tmp("graft-iclone-src-")
    IcebergTable.create(customer.limit(100), src)
    IcebergTable.append(customer.orderBy(desc("c_custkey")).limit(40), src)
    // positional MOR delete state must carry into the clone
    IcebergTable.deleteWhere(spark, src, col("c_acctbal") < 0)
    // schema evolution: renamed column resolves by field id in the clone
    IcebergTable.renameColumn(spark, src, "c_name", "customer_name")
    val expect = IcebergTable.read(spark, src).count()

    val dst = tmp("graft-iclone-dst-") + "/t"
    LakeTable.clone(spark, src, dst)
    assert(parquetCountUnder(dst) == 0, "clone moved data bytes")
    val back = IcebergTable.read(spark, dst)
    assert(back.count() == expect)
    assert(back.schema.fieldNames.contains("customer_name"))
    assert(back.agg(sum("c_custkey")).head.getLong(0) ==
      IcebergTable.read(spark, src).agg(sum("c_custkey")).head.getLong(0))
  }

  test("clone and source evolve independently; clone compact stays local") {
    val src = tmp("graft-iclone-div-src-")
    IcebergTable.create(customer.limit(60), src)
    val atClone = IcebergTable.read(spark, src).count()
    val dst = tmp("graft-iclone-div-dst-") + "/t"
    IcebergTable.cloneFrom(spark, src, dst)

    IcebergTable.append(customer.limit(25), src)
    assert(IcebergTable.read(spark, dst).count() == atClone)

    IcebergTable.append(customer.limit(10), dst)
    assert(IcebergTable.read(spark, dst).count() == atClone + 10)
    assert(IcebergTable.read(spark, src).count() == atClone + 25)

    // clone-side MOR delete leaves the source untouched
    IcebergTable.deleteWhere(spark, dst, col("c_nationkey") === 5)
    assert(IcebergTable.read(spark, dst)
      .filter(col("c_nationkey") === 5).count() == 0)
    assert(IcebergTable.read(spark, src)
      .filter(col("c_nationkey") === 5).count() > 0)

    // compacting the clone rewrites into the CLONE root and the source
    // data files all remain on disk
    val preCompact = IcebergTable.read(spark, dst).count()
    val srcFiles = parquetCountUnder(src)
    IcebergTable.compact(spark, dst)
    assert(parquetCountUnder(src) == srcFiles)
    assert(parquetCountUnder(dst) > 0, "compaction materializes under the clone")
    assert(IcebergTable.read(spark, dst).count() == preCompact)
  }

  test("historic clone via snapshotAsOf; partitioned sources refuse") {
    val src = tmp("graft-iclone-tt-src-")
    val s1 = IcebergTable.create(customer.limit(50), src)
    IcebergTable.append(customer.limit(20), src)
    val dst = tmp("graft-iclone-tt-dst-") + "/t"
    LakeTable.clone(spark, src, dst, asOf = Some(s1))
    assert(IcebergTable.read(spark, dst).count() == 50)

    val psrc = tmp("graft-iclone-part-src-")
    IcebergTable.create(customer.limit(30), psrc,
      partitionColumns = Seq("bucket(2, c_custkey)"))
    val e = intercept[IllegalArgumentException] {
      IcebergTable.cloneFrom(spark, psrc, tmp("graft-iclone-part-dst-") + "/t")
    }
    assert(e.getMessage.contains("partitioned"))
  }
}
