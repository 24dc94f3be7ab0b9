package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable}

/**
 * Iceberg v2 EQUALITY deletes (content=2): match-by-key deletion with
 * the spec's sequence-number ordering rule, composing with positional
 * deletes (content=1) on the same table.
 */
class IcebergEqualityDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def freshTable(): String = {
    val loc = Files.createTempDirectory("graft-ice-eq-").toString
    IcebergTable.create(customer, loc)
    loc
  }

  test("equality delete drops every row matching the key set") {
    val loc = freshTable()
    val keys = customer.filter(col("c_custkey") % 7 === 3)
      .select(col("c_custkey"))
    IcebergTable.deleteWhereEquality(spark, loc, keys)
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.deleteFiles.exists(_.content == 2))
    assert(s.deleteFiles.filter(_.content == 2).forall(_.equalityIds.nonEmpty))
    val expected = customer.filter(col("c_custkey") % 7 =!= 3).count()
    assert(IcebergTable.read(spark, loc).count() == expected)
    // value-level parity, not just counts
    val got = IcebergTable.read(spark, loc)
      .agg(sum(col("c_acctbal")).cast("decimal(28,6)")).head().getDecimal(0)
    val want = customer.filter(col("c_custkey") % 7 =!= 3)
      .agg(sum(col("c_acctbal")).cast("decimal(28,6)")).head().getDecimal(0)
    assert(got == want)
  }

  test("sequence rule: keys re-inserted AFTER the delete survive") {
    val loc = freshTable()
    val doomedKeys = customer.filter(col("c_custkey") <= 10L)
      .select(col("c_custkey"))
    IcebergTable.deleteWhereEquality(spark, loc, doomedKeys)
    // re-insert some of the deleted keys in a LATER commit (higher seq):
    // the equality delete must not touch them
    val reinserted = customer.filter(col("c_custkey") <= 5L)
    IcebergTable.append(reinserted, loc)
    val expected =
      customer.filter(col("c_custkey") > 10L).count() + reinserted.count()
    assert(IcebergTable.read(spark, loc).count() == expected)
    // and the survivors below the cut are exactly the re-inserted keys
    val lowKeys = IcebergTable.read(spark, loc)
      .filter(col("c_custkey") <= 10L)
      .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
    val wantKeys = reinserted.select(col("c_custkey"))
      .collect().map(_.getLong(0)).sorted
    assert(lowKeys.toSeq == wantKeys.toSeq)
  }

  test("multi-column equality keys match on all columns (null-safe)") {
    val loc = freshTable()
    val keys = customer.filter(col("c_custkey") % 11 === 2)
      .select(col("c_custkey"), col("c_nationkey"))
    IcebergTable.deleteWhereEquality(spark, loc, keys)
    val expected = customer.filter(col("c_custkey") % 11 =!= 2).count()
    assert(IcebergTable.read(spark, loc).count() == expected)
  }

  test("positional and equality deletes compose on one table") {
    val loc = freshTable()
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") % 7 === 3)
    IcebergTable.deleteWhereEquality(spark, loc,
      customer.filter(col("c_custkey") % 5 === 1).select(col("c_custkey")))
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.deleteFiles.map(_.content).toSet == Set(1, 2))
    val expected = customer
      .filter(col("c_custkey") % 7 =!= 3 && col("c_custkey") % 5 =!= 1)
      .count()
    assert(IcebergTable.read(spark, loc).count() == expected)
    // time travel to the first delete sees only the positional one
    val expectedV2 = customer.filter(col("c_custkey") % 7 =!= 3).count()
    assert(IcebergTable.read(spark, loc, snapshotAsOf = Some(2L)).count()
      == expectedV2)
  }

  test("repeat equality deletes union (two generations, one column set)") {
    val loc = freshTable()
    IcebergTable.deleteWhereEquality(spark, loc,
      customer.filter(col("c_custkey") % 7 === 3).select(col("c_custkey")))
    IcebergTable.deleteWhereEquality(spark, loc,
      customer.filter(col("c_custkey") % 5 === 1).select(col("c_custkey")))
    val expected = customer
      .filter(col("c_custkey") % 7 =!= 3 && col("c_custkey") % 5 =!= 1)
      .count()
    assert(IcebergTable.read(spark, loc).count() == expected)
  }

  test("compact rewrites merge-on-read state into plain data files") {
    val loc = freshTable()
    IcebergTable.deleteWhere(spark, loc, col("c_custkey") % 7 === 3)
    IcebergTable.deleteWhereEquality(spark, loc,
      customer.filter(col("c_custkey") % 5 === 1).select(col("c_custkey")))
    val expected = customer
      .filter(col("c_custkey") % 7 =!= 3 && col("c_custkey") % 5 =!= 1)
      .count()
    val snap = IcebergTable.compact(spark, loc)
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.snapshotId == snap && s.deleteFiles.isEmpty,
      "compact left delete files in force")
    assert(IcebergTable.read(spark, loc).count() == expected)
    // plain scan again: no anti-join in the compacted read
    assert(!IcebergTable.read(spark, loc).queryExecution.executedPlan
      .toString.contains("LeftAnti"))
    // time travel: the pre-compact snapshot still applies both deletes
    assert(IcebergTable.read(spark, loc, snapshotAsOf = Some(3L)).count()
      == expected)
    // idempotent no-op without deletes
    assert(IcebergTable.compact(spark, loc) == snap)
  }

  test("unknown equality column is refused loudly") {
    val loc = freshTable()
    val e = intercept[IllegalArgumentException](
      IcebergTable.deleteWhereEquality(spark, loc,
        customer.select(col("c_custkey").as("not_a_column"))))
    assert(e.getMessage.contains("not_a_column"))
  }
}
