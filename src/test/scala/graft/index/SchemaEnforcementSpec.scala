package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, IcebergTable}

/**
 * Append-time schema enforcement: mismatched frames refuse loudly
 * instead of writing columns no reader would see (Delta) or silently
 * republishing the table schema with fresh field ids (Iceberg);
 * additive evolution is explicit — `mergeSchema` on Delta appends, the
 * addColumn/renameColumn metadata operations on Iceberg.
 */
class SchemaEnforcementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  test("delta: extra column refuses without mergeSchema, evolves with it") {
    val root = Files.createTempDirectory("graft-schema-d-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 75), root)
    val widened = customer.filter(col("c_custkey") >= 75)
      .withColumn("loyalty", col("c_acctbal") > 0)

    val e = intercept[IllegalArgumentException] {
      DeltaTable.append(widened, root)
    }
    assert(e.getMessage.contains("mergeSchema"))
    // nothing was committed by the refused append
    assert(DeltaLog.snapshot(spark, root).version == 0L)

    DeltaTable.append(widened, root, mergeSchema = true)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.schema.fieldNames.contains("loyalty"))
    val all = DeltaTable.read(spark, root)
    assert(all.count() == customer.count())
    // pre-evolution rows read the new column as null
    assert(all.filter(col("loyalty").isNull).count() ==
      customer.filter(col("c_custkey") < 75).count())
  }

  test("delta: conflicting column type refuses; missing column reads null") {
    val root = Files.createTempDirectory("graft-schema-d2-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 75), root)
    val retyped = customer.filter(col("c_custkey") >= 75)
      .withColumn("c_acctbal", col("c_acctbal").cast("string"))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.append(retyped, root)
    }
    assert(e.getMessage.contains("c_acctbal"))

    // a SUBSET frame appends fine: absent columns read as null
    DeltaTable.append(customer.filter(col("c_custkey") >= 75)
      .drop("c_mktsegment"), root)
    val all = DeltaTable.read(spark, root)
    assert(all.count() == customer.count())
    assert(all.filter(col("c_mktsegment").isNull).count() ==
      customer.filter(col("c_custkey") >= 75).count())
  }

  test("iceberg: shape-mismatched append refuses; metadata evolution unlocks") {
    val loc = Files.createTempDirectory("graft-schema-i-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 75), loc)
    val widened = customer.filter(col("c_custkey") >= 75)
      .withColumn("loyalty", col("c_acctbal") > 0)
    val e = intercept[IllegalArgumentException] {
      IcebergTable.append(widened, loc)
    }
    assert(e.getMessage.contains("addColumn"))

    // the explicit evolution path: declare the column, then append
    IcebergTable.addColumn(spark, loc, "loyalty",
      org.apache.spark.sql.types.BooleanType)
    IcebergTable.append(widened, loc)
    val all = IcebergTable.read(spark, loc)
    assert(all.count() == customer.count())
    assert(all.filter(col("loyalty").isNull).count() ==
      customer.filter(col("c_custkey") < 75).count())
  }
}
