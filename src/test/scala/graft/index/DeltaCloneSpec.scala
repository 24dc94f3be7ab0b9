package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable}

/**
 * SHALLOW CLONE: zero-copy table copies whose v0 commit references the
 * source's files by absolute path. Clone cost is one metadata write —
 * the property that makes dev/test copies of a 100 TB table instant —
 * and the two tables evolve independently afterwards.
 */
class DeltaCloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private def parquetCountUnder(root: String): Int = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(d: Path): Int =
      if (!fs.exists(d)) 0
      else fs.listStatus(d).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.toString.contains("_delta_log")) 1
        else 0
      }.sum
    walk(p)
  }

  test("clone is metadata-only; content matches the source at the clone point") {
    val src = tmp("graft-clone-src-")
    DeltaTable.create(customer.limit(80), src)
    DeltaTable.append(customer.orderBy(desc("c_custkey")).limit(40), src)
    // DV state survives the clone
    DeltaTable.deleteWhere(spark, src, col("c_acctbal") < 0)
    val expect = DeltaTable.read(spark, src).count()

    val dst = tmp("graft-clone-dst-") + "/t"
    DeltaTable.clone(spark, src, dst)
    assert(parquetCountUnder(dst) == 0, "clone moved data bytes")
    assert(DeltaTable.read(spark, dst).count() == expect)
    assert(DeltaTable.read(spark, dst).agg(sum("c_custkey")).head.getLong(0) ==
      DeltaTable.read(spark, src).agg(sum("c_custkey")).head.getLong(0))
    // provenance in history
    val op = DeltaTable.history(spark, dst)
      .orderBy(col("version")).head.getAs[String]("operation")
    assert(op == "CLONE")
  }

  test("clone and source evolve independently") {
    val src = tmp("graft-clone-div-src-")
    DeltaTable.create(customer.limit(60), src)
    val atClone = DeltaTable.read(spark, src).count()
    val dst = tmp("graft-clone-div-dst-") + "/t"
    DeltaTable.clone(spark, src, dst)

    // source moves on — the clone is pinned to the clone point
    DeltaTable.append(customer.limit(25), src)
    assert(DeltaTable.read(spark, dst).count() == atClone)

    // clone writes never touch the source
    DeltaTable.append(customer.limit(10), dst)
    assert(DeltaTable.read(spark, dst).count() == atClone + 10)
    assert(DeltaTable.read(spark, src).count() == atClone + 25)

    // UPDATE on a clone must REPLACE the referenced file's entry, not
    // duplicate it (regression: an add spelled `file:/x` and a remove
    // spelled `/x` must cancel in replay — scheme-normalized keying)
    val preUpdate = DeltaTable.read(spark, dst).count()
    DeltaTable.update(spark, dst, col("c_nationkey") === 9,
      Map("c_acctbal" -> (col("c_acctbal") + 1)))
    assert(DeltaTable.read(spark, dst).count() == preUpdate)

    // a clone-side delete lays DVs over source-referenced files without
    // changing the source
    DeltaTable.deleteWhere(spark, dst, col("c_nationkey") === 5)
    val srcN5 = DeltaTable.read(spark, src)
      .filter(col("c_nationkey") === 5).count()
    assert(srcN5 > 0, "fixture should have nation 5 rows")
    assert(DeltaTable.read(spark, dst)
      .filter(col("c_nationkey") === 5).count() == 0)
    assert(DeltaTable.read(spark, src)
      .filter(col("c_nationkey") === 5).count() == srcN5)
  }

  test("clone vacuum never deletes source files; versionAsOf clones history") {
    val src = tmp("graft-clone-vac-src-")
    DeltaTable.create(customer.limit(50), src) // v0
    DeltaTable.append(customer.limit(20), src) // v1
    val dst = tmp("graft-clone-vac-dst-") + "/t"
    // historic clone: only v0's rows
    DeltaTable.clone(spark, src, dst, versionAsOf = Some(0L))
    assert(DeltaTable.read(spark, dst).count() == 50)

    // vacuum the clone with zero retention: source files stay
    val before = parquetCountUnder(src)
    DeltaTable.vacuum(spark, dst, retentionMs = 0L)
    assert(parquetCountUnder(src) == before)
    assert(DeltaTable.read(spark, dst).count() == 50)
    assert(DeltaTable.read(spark, src).count() == 70)
  }

  test("clone of a COLUMN-MAPPED table: physical-name resolution carries over") {
    val src = tmp("graft-clone-cm-src-")
    DeltaTable.create(customer.limit(40), src)
    DeltaTable.enableColumnMapping(spark, src)
    DeltaTable.renameColumn(spark, src, "c_name", "customer_name")
    val dst = tmp("graft-clone-cm-dst-") + "/t"
    DeltaTable.clone(spark, src, dst)
    val back = DeltaTable.read(spark, dst)
    // the clone inherits the mapping config + schema: logical names
    // resolve against the source files' physical columns
    assert(back.schema.fieldNames.contains("customer_name"))
    assert(back.count() == 40)
    assert(back.agg(sum("c_custkey")).head.getLong(0) ==
      DeltaTable.read(spark, src).agg(sum("c_custkey")).head.getLong(0))
  }

  test("partitioned source and existing target refuse") {
    val src = tmp("graft-clone-part-src-")
    DeltaTable.create(customer.limit(40), src, partitionBy = Seq("c_mktsegment"))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.clone(spark, src, tmp("graft-clone-part-dst-") + "/t")
    }
    assert(e.getMessage.contains("partitioned"))

    val src2 = tmp("graft-clone-e-src-")
    DeltaTable.create(customer.limit(10), src2)
    val dst2 = tmp("graft-clone-e-dst-")
    DeltaTable.create(customer.limit(5), dst2)
    intercept[IllegalArgumentException] {
      DeltaTable.clone(spark, src2, dst2)
    }
  }
}
