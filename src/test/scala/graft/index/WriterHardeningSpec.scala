package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, LakeTable}

/**
 * Hardening of the Delta writer surface, pinned from an adversarial
 * review: rules enforce against the MATERIALIZED write (a
 * non-deterministic source can never pass a pre-check yet publish
 * violating rows); writer-only features never bump the reader
 * protocol; and a column-mapped overwrite keeps the table's declared
 * rule metadata.
 */
class WriterHardeningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CHECK constraints judge the materialized write: a rand() source " +
      "can never land violating rows, and a refusal leaves no stage") {
    val root = tmp("graft-hard-ndet-")
    DeltaTable.create(Seq(0.1).toDF("x"), root)
    LakeTable.addConstraint(spark, root, "halfcap", "x < 0.5")
    // 200 uniform draws: all-below-0.5 has probability ~2^-200 — every
    // attempt must refuse; if one ever passed, the MATERIALIZED rows
    // must all conform (the old pre-write check sampled a DIFFERENT
    // rand() evaluation than the one the write landed)
    (1 to 3).foreach { _ =>
      try {
        DeltaTable.append(
          spark.range(200).select(rand().as("x")), root)
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("halfcap"), e.getMessage)
      }
      assert(DeltaTable.read(spark, root)
        .filter($"x" >= 0.5).count() == 0,
        "a violating row slipped past enforcement")
    }
    // refusals clean their staging dirs
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .exists(_.getPath.getName.startsWith(".graft-stage-")),
      "a refused write left its staging dir behind")
  }

  test("ADD CONSTRAINT is writer-only: the reader protocol of a " +
      "features table stays put") {
    val root = tmp("graft-hard-proto-")
    DeltaTable.create(Seq((1L, 2L)).toDF("a", "b"), root,
      configuration = Map("delta.enableRowTracking" -> "true"))
    val before = DeltaLog.snapshot(spark, root)
    assert(before.minWriterVersion == 7)
    LakeTable.addConstraint(spark, root, "pos", "a >= 0")
    val after = DeltaLog.snapshot(spark, root)
    assert(after.minReaderVersion == before.minReaderVersion,
      s"ADD CONSTRAINT bumped the reader protocol " +
        s"${before.minReaderVersion} -> ${after.minReaderVersion}, " +
        "locking out readers for a writer-only feature")
    assert(after.writerFeatures.contains("checkConstraints"))
    // the constraint is armed
    intercept[IllegalArgumentException](
      DeltaTable.append(Seq((-1L, 0L)).toDF("a", "b"), root))
  }

  test("overwriting a COLUMN-MAPPED table keeps declared generated-" +
      "column rules (derivation still fires after the overwrite)") {
    val root = tmp("graft-hard-cmgen-")
    val schema = StructType(Seq(
      StructField("x", LongType),
      StructField("g", LongType, nullable = true, new MetadataBuilder()
        .putString("delta.generationExpression", "x * 10").build())))
    val framed = spark.createDataFrame(
      spark.range(3).selectExpr("id as x", "id * 10 as g").rdd, schema)
    DeltaTable.create(framed, root)
    DeltaTable.enableColumnMapping(spark, root)
    // overwrite with a PLAIN frame (no metadata): the rule must carry
    DeltaTable.create(
      spark.range(5).selectExpr("id as x", "id * 10 as g"), root)
    // an append missing g derives it from the carried expression
    DeltaTable.append(spark.range(100, 103).selectExpr("id as x"), root)
    val got = DeltaTable.read(spark, root)
      .filter($"x" >= 100).select("g").as[Long].collect().sorted
    assert(got.toSeq == Seq(1000L, 1010L, 1020L),
      s"generation rule lost through the mapped overwrite: ${got.toSeq}")
    // and a provided MISMATCHED value refuses against the carried rule
    intercept[IllegalArgumentException](DeltaTable.append(
      Seq((200L, 1L)).toDF("x", "g"), root))
  }
}
