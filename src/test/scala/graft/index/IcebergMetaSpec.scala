package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig
import graft.index.sources.{IcebergMeta, IcebergTable}

/**
 * Jarless Iceberg support: metadata.json + avro manifest-list/manifest
 * replay, snapshot-pinned reads, the fixture writer, schema conversion,
 * and the index lifecycle over an Iceberg table (reference semantics:
 * sources/iceberg/IcebergRelation.scala — signature = snapshot id +
 * location, files from the metadata walk).
 */
class IcebergMetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("create + append: snapshots advance, read sees the union") {
    val loc = tmp("graft-ice-")
    val a = customer.filter(col("c_custkey") % 2 === 0)
    val b = customer.filter(col("c_custkey") % 2 === 1)
    assert(IcebergTable.create(a, loc) == 1L)
    assert(IcebergMeta.snapshot(spark, loc).snapshotId == 1L)
    assert(IcebergTable.read(spark, loc).count() == a.count())

    assert(IcebergTable.append(b, loc) == 2L)
    val s = IcebergMeta.snapshot(spark, loc)
    assert(s.snapshotId == 2L)
    val got = IcebergTable.read(spark, loc)
    assert(got.count() == customer.count())
    assert(got.select(sum(col("c_custkey"))).head().getLong(0) ==
      customer.select(sum(col("c_custkey"))).head().getLong(0))
    // the spark schema round-trips through the iceberg schema json
    assert(s.schema == customer.schema)
  }

  test("time travel: snapshotAsOf pins a retained snapshot's file set") {
    val loc = tmp("graft-ice-tt-")
    val a = customer.filter(col("c_custkey") % 2 === 0)
    val b = customer.filter(col("c_custkey") % 2 === 1)
    IcebergTable.create(a, loc)
    IcebergTable.append(b, loc)

    // latest sees both commits; snapshot 1 sees only the first
    assert(IcebergTable.read(spark, loc).count() == customer.count())
    val pinned = IcebergTable.read(spark, loc, snapshotAsOf = Some(1L))
    assert(pinned.count() == a.count())
    assert(pinned.select(sum(col("c_custkey"))).head().getLong(0) ==
      a.select(sum(col("c_custkey"))).head().getLong(0))
    // pinned frames stay pinned across further commits
    IcebergTable.append(customer.limit(5), loc)
    assert(pinned.count() == a.count())

    val err = intercept[IllegalArgumentException] {
      IcebergTable.read(spark, loc, snapshotAsOf = Some(99L)).count()
    }
    assert(err.getMessage.contains("snapshotAsOf 99"))
  }

  test("schema conversion round-trips primitives, decimals, and nesting") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("dt", DateType), StructField("ts", TimestampType),
      StructField("bin", BinaryType),
      StructField("dec", DecimalType(12, 3)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, DoubleType)),
      StructField("nested", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val rt = IcebergMeta.icebergSchemaToSpark(
      IcebergMeta.sparkSchemaToIceberg(schema))
    assert(rt == schema)
  }

  test("delete manifests (v2 content=1) are rejected, not silently ignored") {
    val loc = tmp("graft-ice-del-")
    IcebergTable.create(customer.limit(10), loc)
    // flip the manifest list's content flag to 1 by rewriting the avro
    import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableFileInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    val mlPath = new java.io.File(s"$loc/metadata/snap-00001.avro")
    val rd = new DataFileReader[GenericRecord](
      new SeekableFileInput(mlPath), new GenericDatumReader[GenericRecord]())
    val schema = rd.getSchema
    val recs = new java.util.ArrayList[GenericRecord]()
    while (rd.hasNext) { val r = rd.next(); r.put("content", 1); recs.add(r) }
    rd.close()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, mlPath)
    recs.forEach(r => w.append(r))
    w.close()
    // the raw rewrite bypassed ChecksumFileSystem — drop the stale .crc
    new java.io.File(s"$loc/metadata/.snap-00001.avro.crc").delete()
    val ex = intercept[IllegalArgumentException](
      IcebergMeta.snapshot(spark, loc))
    assert(ex.getMessage.contains("DELETE manifest"))
  }

  test("provider: iceberg leaf recognized, snapshot-based signature") {
    val loc = tmp("graft-ice-sig-")
    IcebergTable.create(customer, loc)
    def leaf = SourceRelation.collectLeaves(IcebergTable.read(spark, loc)).head
    val l0 = leaf
    assert(l0.format == "iceberg")
    assert(l0.rootPaths == Seq(loc))
    val sig0 = SourceRelation.capture(l0, new FileIdTracker).signature
    assert(SourceRelation.capture(leaf, new FileIdTracker).signature == sig0)
    IcebergTable.append(customer.limit(3), loc)
    assert(SourceRelation.capture(leaf, new FileIdTracker).signature != sig0)
  }

  test("index lifecycle on an Iceberg table: rewrite, hybrid drift, refresh") {
    val sys = tmp("graft-ice-sys-")
    val loc = tmp("graft-ice-idx-")
    spark.conf.set(GraftConf.SystemPathKey, sys)
    try {
      val g = new Graft(spark)
      IcebergTable.create(customer, loc)
      g.createIndex(IcebergTable.read(spark, loc),
        CoveringIndexConfig("ci_ice", Seq("c_nationkey"), Seq("c_acctbal")))
      val e = g.indexManager.getIndexes().head
      assert(e.relations.head.format == "iceberg")

      def query = IcebergTable.read(spark, loc)
        .filter(col("c_nationkey") === 5L)
        .select(col("c_nationkey"), col("c_acctbal"))
      def usesIndex(df: org.apache.spark.sql.DataFrame): Boolean = {
        df.collect()
        df.queryExecution.executedPlan.collectWithSubqueries {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(
              _.toString.contains("/ci_ice/")) => s
        }.nonEmpty
      }
      spark.conf.set(GraftConf.ApplyEnabledKey, "false")
      val expected = query.collect().toSet
      spark.conf.set(GraftConf.ApplyEnabledKey, "true")
      assert(usesIndex(query), "covering index not applied to iceberg scan:\n" +
        query.queryExecution.executedPlan)
      assert(query.collect().toSet == expected && expected.nonEmpty)

      // drift: a new snapshot appends rows — hybrid scan serves them
      val extra = customer.filter(col("c_nationkey") === 5L).limit(2)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
      IcebergTable.append(extra, loc)
      val afterDrift = query
      assert(usesIndex(afterDrift), "hybrid scan did not keep the index:\n" +
        afterDrift.queryExecution.executedPlan)
      assert(afterDrift.collect().length == expected.size + 2,
        "hybrid scan lost the appended iceberg snapshot")

      // incremental refresh re-baselines: exact match again
      g.refreshIndex("ci_ice", "incremental")
      assert(usesIndex(query))
      assert(query.collect().length == expected.size + 2)
    } finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }
}
