package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaLog, DeltaTable, IcebergMeta, IcebergTable, LakeTable}

/**
 * SQL-statement surface for the lake verbs (GraftSqlParser +
 * LakeDmlResolution): every statement must be the SAME code path as
 * the API verb it routes to — MERGE/UPDATE/DELETE through Spark's own
 * DML grammar, OPTIMIZE/VACUUM/DESCRIBE DETAIL|HISTORY through the
 * delegating parser. delta-spark's SQL surface is the model; the
 * reference is API-only, so this is parity-plus.
 */
class LakeSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("MERGE INTO graft_delta hashes identically to the API verb") {
    val sqlRoot = tmp("graft-sql-merge-d-")
    val apiRoot = tmp("graft-api-merge-d-")
    val target = customer.filter($"c_custkey" % 2 === 0)
    DeltaTable.create(target, sqlRoot)
    DeltaTable.create(target, apiRoot)
    val source = customer.filter($"c_custkey" % 3 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1000)
    source.createOrReplaceTempView("merge_src")

    val res = spark.sql(
      s"""MERGE INTO graft_delta.`$sqlRoot` t USING merge_src s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED AND s.c_nationkey >= 20 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(res.columns.toSeq == Seq("id"))
    assert(res.head().getLong(0) == 1L)

    LakeTable.merge(spark, apiRoot, source, Seq("c_custkey"),
      deleteCondition = Some($"c_nationkey" >= 20))

    val a = DeltaTable.read(spark, sqlRoot).orderBy("c_custkey").collect().toSeq
    val b = DeltaTable.read(spark, apiRoot).orderBy("c_custkey").collect().toSeq
    assert(a == b, "SQL merge and API merge diverged")
  }

  test("MERGE INTO graft_iceberg routes to the equality-delete merge") {
    val root = tmp("graft-sql-merge-i-")
    IcebergTable.create(customer.filter($"c_custkey" <= 100), root)
    customer.filter($"c_custkey" > 90 && $"c_custkey" <= 110)
      .withColumn("c_acctbal", lit(0.0))
      .createOrReplaceTempView("merge_src_i")
    spark.sql(
      s"""MERGE INTO graft_iceberg.`$root` t USING merge_src_i s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = IcebergTable.read(spark, root)
    val targetKeys = customer.filter($"c_custkey" <= 100)
      .select("c_custkey").as[Long].collect().toSet
    val srcKeys = customer.filter($"c_custkey" > 90 && $"c_custkey" <= 110)
      .select("c_custkey").as[Long].collect().toSet
    assert(got.count() == (targetKeys ++ srcKeys).size)
    assert(got.filter($"c_custkey".isin(srcKeys.toSeq: _*) &&
      $"c_acctbal" =!= 0.0).count() == 0)
    // one commit, equality-delete file present
    val snap = IcebergMeta.snapshot(spark, root)
    assert(snap.snapshotId == 2L)
    assert(snap.deleteFiles.exists(_.content == 2))
  }

  test("unsupported MERGE shapes are refused loudly") {
    val root = tmp("graft-sql-merge-bad-")
    DeltaTable.create(customer.limit(10), root)
    customer.limit(5).createOrReplaceTempView("merge_src_bad")
    def refused(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected refusal mentioning '$frag', got: ${msgs(e).mkString(" | ")}")
    }
    // non-equi ON
    refused(
      s"""MERGE INTO graft_delta.`$root` t USING merge_src_bad s
         |ON t.c_custkey < s.c_custkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "ON clause")
    // column-list update instead of SET *
    refused(
      s"""MERGE INTO graft_delta.`$root` t USING merge_src_bad s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED THEN UPDATE SET c_name = s.c_name
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "UPDATE SET *")
    // matched-delete after the unconditional update never fires —
    // Spark's own grammar already rejects this ordering
    refused(
      s"""MERGE INTO graft_delta.`$root` t USING merge_src_bad s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN MATCHED AND s.c_nationkey > 5 THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "only the last MATCHED clause")
    // delete condition over target columns
    refused(
      s"""MERGE INTO graft_delta.`$root` t USING merge_src_bad s
         |ON t.c_custkey = s.c_custkey
         |WHEN MATCHED AND t.c_nationkey > 5 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "source columns")
  }

  test("SET keys and ON operands must be plain target/source columns " +
      "(wrong aliases and nested fields refuse, valid aliases strip)") {
    val root = tmp("graft-sql-setkey-")
    DeltaTable.create(customer.limit(20), root)
    customer.limit(5).createOrReplaceTempView("setkey_src")
    def refused(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)),
        s"expected refusal mentioning '$frag', got: ${msgs(e).mkString(" | ")}")
    }
    // a qualifier that is NOT the target alias must not silently resolve
    // to the bare trailing column
    refused(s"UPDATE graft_delta.`$root` t SET x.c_acctbal = 0 " +
      "WHERE c_custkey = 1", "plain top-level column")
    // nested-field syntax would also strip to the last segment
    refused(s"UPDATE graft_delta.`$root` SET address.city = 'x' " +
      "WHERE c_custkey = 1", "plain top-level column")
    // ON qualifying both operands with one alias is a self-equality,
    // not a join condition
    refused(
      s"""MERGE INTO graft_delta.`$root` t USING setkey_src s
         |ON t.c_custkey = t.c_custkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin,
      "same alias")
    // a correctly alias-qualified SET strips and applies
    spark.sql(s"UPDATE graft_delta.`$root` t SET t.c_acctbal = CAST(0 AS DOUBLE) " +
      "WHERE t.c_custkey = 1")
    assert(DeltaTable.read(spark, root).filter($"c_custkey" === 1)
      .select($"c_acctbal").head().getDouble(0) == 0.0)
  }

  test("UPDATE and DELETE FROM route to the row-level verbs (both formats)") {
    val droot = tmp("graft-sql-upd-d-")
    val iroot = tmp("graft-sql-upd-i-")
    DeltaTable.create(customer.limit(100), droot)
    IcebergTable.create(customer.limit(100), iroot)

    for ((tag, root, read) <- Seq(
        ("graft_delta", droot, () => DeltaTable.read(spark, droot)),
        ("graft_iceberg", iroot, () => IcebergTable.read(spark, iroot)))) {
      val r1 = spark.sql(
        s"UPDATE $tag.`$root` SET c_acctbal = c_acctbal + 100 " +
          "WHERE c_nationkey = 3")
      assert(r1.columns.toSeq == Seq("id"))
      val bumped = read().filter($"c_nationkey" === 3)
      assert(bumped.count() > 0)
      val base = customer.limit(100).filter($"c_nationkey" === 3)
        .select($"c_custkey", ($"c_acctbal" + 100).as("b"))
        .as[(Long, Double)].collect().toMap
      bumped.select($"c_custkey", $"c_acctbal").as[(Long, Double)]
        .collect().foreach { case (k, b) =>
          assert(math.abs(b - base(k)) < 1e-6, s"$tag key $k not updated")
        }
      spark.sql(s"DELETE FROM $tag.`$root` WHERE c_nationkey = 3")
      assert(read().filter($"c_nationkey" === 3).count() == 0)
      assert(read().count() == 100 - base.size)
    }
  }

  test("SELECT over graft paths: head read, VERSION AS OF, and " +
      "TIMESTAMP AS OF resolve through the lake readers") {
    val droot = tmp("graft-sql-tt-d-")
    val iroot = tmp("graft-sql-tt-i-")
    DeltaTable.create(customer.filter($"c_custkey" <= 50), droot)   // v0
    DeltaTable.append(customer.filter($"c_custkey" > 50), droot)    // v1
    IcebergTable.create(customer.filter($"c_custkey" <= 50), iroot) // snap 1
    IcebergTable.append(customer.filter($"c_custkey" > 50), iroot)  // snap 2

    // head read, plain SELECT
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_delta.`$droot`")
      .head().getLong(0) == customer.count())
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_iceberg.`$iroot`")
      .head().getLong(0) == customer.count())
    // joins/aliases over a graft relation work like any table
    assert(spark.sql(s"SELECT max(t.c_custkey) FROM graft_lake.`$droot` t " +
      "WHERE t.c_custkey <= 10").head().getLong(0) == 10L)

    // VERSION AS OF ≡ the API's versioned read, row-identical
    val sqlV0 = spark.sql(
      s"SELECT * FROM graft_delta.`$droot` VERSION AS OF 0")
      .orderBy("c_custkey").collect().toSeq
    val apiV0 = DeltaTable.read(spark, droot, versionAsOf = Some(0L))
      .orderBy("c_custkey").collect().toSeq
    assert(sqlV0 == apiV0 && sqlV0.size == 51,
      s"SQL time travel diverged from API (${sqlV0.size} rows)")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM graft_iceberg.`$iroot` VERSION AS OF 1")
      .head().getLong(0) == 51)

    // TIMESTAMP AS OF: future → head; before the first commit → loud
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_delta.`$droot` " +
      "TIMESTAMP AS OF '2099-01-01'").head().getLong(0) == customer.count())
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_iceberg.`$iroot` " +
      "TIMESTAMP AS OF '2099-01-01'").head().getLong(0) == customer.count())
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_delta.`$droot` TIMESTAMP AS OF '1990-01-01'")
      .collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("precedes the first commit")))
  }

  test("INSERT INTO appends, INSERT OVERWRITE replaces, column lists refuse") {
    val droot = tmp("graft-sql-ins-d-")
    val iroot = tmp("graft-sql-ins-i-")
    DeltaTable.create(customer.filter($"c_custkey" <= 50), droot)
    IcebergTable.create(customer.filter($"c_custkey" <= 50), iroot)
    customer.filter($"c_custkey" > 50).createOrReplaceTempView("ins_src")

    spark.sql(s"INSERT INTO graft_delta.`$droot` SELECT * FROM ins_src")
    assert(DeltaTable.read(spark, droot).count() == customer.count())
    spark.sql(s"INSERT INTO graft_iceberg.`$iroot` SELECT * FROM ins_src")
    assert(IcebergTable.read(spark, iroot).count() == customer.count())

    spark.sql(s"INSERT OVERWRITE graft_delta.`$droot` " +
      "SELECT * FROM ins_src WHERE c_custkey > 140")
    val kept = customer.filter($"c_custkey" > 140).count()
    assert(DeltaTable.read(spark, droot).count() == kept)

    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft_delta.`$droot` (c_custkey) SELECT c_custkey FROM ins_src"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("column list")), msgs(e).mkString("|"))
  }

  test("INSERT binds positionally and OVERWRITE keeps the table's " +
      "partitioning and schema") {
    val root = tmp("graft-sql-insover-")
    DeltaTable.create(customer.limit(60).select($"c_custkey", $"c_mktsegment"),
      root, partitionBy = Seq("c_mktsegment"))
    // the query's aliases and types differ: INSERT binds by POSITION,
    // casting onto the table's names/types
    spark.sql(s"INSERT OVERWRITE graft_delta.`$root` " +
      "SELECT CAST(c_custkey AS INT) AS k, c_mktsegment AS seg " +
      s"FROM parquet.`${TestSpark.sfDir}/customer.parquet` " +
      "WHERE c_custkey < 30")
    val snap = DeltaLog.snapshot(spark, root)
    assert(snap.partitionColumns == Seq("c_mktsegment"),
      s"OVERWRITE dropped the table's partitioning: ${snap.partitionColumns}")
    assert(snap.schema.fieldNames.toSeq == Seq("c_custkey", "c_mktsegment"),
      s"OVERWRITE replaced the table's schema: ${snap.schema.fieldNames.toSeq}")
    assert(snap.schema("c_custkey").dataType.simpleString == "bigint",
      "positional INSERT did not cast to the table's type")
    assert(DeltaTable.read(spark, root).count() == 30)
    // arity mismatch refuses
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft_delta.`$root` SELECT 1"))
    assert(e.getMessage.contains("column"), e.getMessage)
  }

  test("RESTORE TABLE ... TO VERSION AS OF rewinds both formats") {
    val droot = tmp("graft-sql-restore-d-")
    DeltaTable.create(customer.filter($"c_custkey" <= 40), droot)  // v0
    DeltaTable.append(customer.filter($"c_custkey" > 40), droot)   // v1
    val r = spark.sql(
      s"RESTORE TABLE graft_delta.`$droot` TO VERSION AS OF 0")
    assert(r.columns.toSeq == Seq("id"))
    assert(DeltaTable.read(spark, droot).count() == 41)
    // timestamp form: far future resolves to the CURRENT head (v2, the
    // restore commit) — a no-op restore — and far past refuses
    spark.sql(s"RESTORE TABLE graft_delta.`$droot` " +
      "TO TIMESTAMP AS OF '2099-01-01'")
    assert(DeltaTable.read(spark, droot).count() == 41)
    val e = intercept[Exception](spark.sql(
      s"RESTORE TABLE graft_delta.`$droot` TO TIMESTAMP AS OF '1990-01-01'"))
    assert(e.getMessage.contains("no commit at or before"))
  }

  test("CONVERT TO DELTA / ICEBERG adopt a parquet directory; ANALYZE " +
      "computes Delta stats") {
    val d = tmp("graft-sql-conv-d-")
    val i = tmp("graft-sql-conv-i-")
    customer.limit(30).write.mode("overwrite").parquet(d)
    customer.limit(30).write.mode("overwrite").parquet(i)
    spark.sql(s"CONVERT TO DELTA parquet.`$d`")
    assert(DeltaTable.read(spark, d).count() == 30)
    spark.sql(s"CONVERT TO ICEBERG parquet.`$i`")
    assert(IcebergTable.read(spark, i).count() == 30)
    val r = spark.sql(s"ANALYZE TABLE graft_delta.`$d` COMPUTE STATISTICS")
    assert(r.columns.toSeq == Seq("id"))
    val e = intercept[Exception](spark.sql(
      s"ANALYZE TABLE graft_iceberg.`$i` COMPUTE STATISTICS"))
    assert(e.getMessage.contains("graft_delta tables only"))
  }

  test("CREATE TABLE ... AS SELECT writes a new lake table by path") {
    val d = tmp("graft-sql-ctas-d-") + "/t"
    val i = tmp("graft-sql-ctas-i-") + "/t"
    customer.createOrReplaceTempView("ctas_src")
    spark.sql(s"CREATE TABLE graft_delta.`$d` AS " +
      "SELECT * FROM ctas_src WHERE c_custkey <= 25")
    assert(DeltaTable.read(spark, d).count() == 26)
    spark.sql(s"CREATE TABLE graft_iceberg.`$i` PARTITIONED BY " +
      "(c_mktsegment) AS SELECT * FROM ctas_src WHERE c_custkey <= 25")
    assert(IcebergTable.read(spark, i).count() == 26)
    // CREATE refuses an existing table; graft_lake has no format to detect
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft_delta.`$d` AS SELECT * FROM ctas_src"))
    assert(e1.getMessage.contains("already exists"))
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE graft_lake.`${tmp("graft-sql-ctas-l-")}/t` AS " +
        "SELECT * FROM ctas_src"))
    assert(e2.getMessage.contains("explicit format"))
  }

  test("graft_lake auto-detects the format") {
    val root = tmp("graft-sql-lake-")
    IcebergTable.create(customer.filter($"c_custkey" <= 30), root)
    spark.sql(s"DELETE FROM graft_lake.`$root` WHERE c_custkey <= 10")
    assert(IcebergTable.read(spark, root).count() == 20)
    val detail = spark.sql(s"DESCRIBE DETAIL graft_lake.`$root`")
    assert(detail.select("format").head().getString(0) == "iceberg")
  }

  test("OPTIMIZE bin-packs; ZORDER BY and WHERE parse and apply") {
    val root = tmp("graft-sql-opt-")
    DeltaTable.create(customer.limit(60).repartition(6), root)
    assert(DeltaLog.snapshot(spark, root).files.size == 6)
    val r = spark.sql(s"OPTIMIZE graft_delta.`$root`")
    assert(r.columns.toSeq == Seq("id"))
    assert(DeltaLog.snapshot(spark, root).files.size < 6)
    assert(DeltaTable.read(spark, root).count() == 60)

    // zorder form (clustered rewrite, row-transparent)
    val zroot = tmp("graft-sql-optz-")
    DeltaTable.create(customer.limit(60).repartition(4), zroot)
    spark.sql(
      s"OPTIMIZE graft_delta.`$zroot` ZORDER BY (c_nationkey, c_custkey)")
    assert(DeltaTable.read(spark, zroot).count() == 60)

    // WHERE scope on a partitioned table: only the matching partition
    // is rewritten
    val proot = tmp("graft-sql-optw-")
    DeltaTable.create(customer.limit(60).repartition(3), proot,
      partitionBy = Seq("c_mktsegment"))
    val before = DeltaLog.snapshot(spark, proot).files
      .filterNot(_.path.contains("c_mktsegment=BUILDING")).map(_.path).toSet
    spark.sql(
      s"OPTIMIZE graft_delta.`$proot` WHERE c_mktsegment = 'BUILDING'")
    val after = DeltaLog.snapshot(spark, proot).files
      .filterNot(_.path.contains("c_mktsegment=BUILDING")).map(_.path).toSet
    assert(before == after, "OPTIMIZE WHERE rewrote out-of-scope partitions")
    assert(DeltaTable.read(spark, proot).count() == 60)
  }

  test("VACUUM RETAIN 0 HOURS returns the removed paths") {
    val root = tmp("graft-sql-vac-")
    DeltaTable.create(customer.limit(40), root)
    // orphan the original files behind a full overwrite
    DeltaTable.create(customer.limit(20), root) // overwrite commit
    val removed = spark.sql(s"VACUUM graft_delta.`$root` RETAIN 0 HOURS")
    assert(removed.columns.toSeq == Seq("removed_path"))
    assert(removed.count() > 0, "expected orphaned files vacuumed")
    assert(DeltaTable.read(spark, root).count() == 20)
  }

  test("DESCRIBE DETAIL and DESCRIBE HISTORY surface the metadata") {
    val root = tmp("graft-sql-desc-")
    DeltaTable.create(customer.limit(30), root)
    DeltaTable.append(customer.limit(10), root)
    val detail = spark.sql(s"DESCRIBE DETAIL graft_delta.`$root`")
    val d = detail.head()
    assert(d.getAs[String]("format") == "delta")
    assert(d.getAs[Long]("num_files") >= 1L)
    val hist = spark.sql(s"DESC HISTORY graft_delta.`$root`")
    assert(hist.columns.toSeq == Seq("id", "timestamp", "operation"))
    val ids = hist.select("id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 0L), s"history not newest-first: $ids")
  }

  test("ADD CONSTRAINT validates existing rows and arms write " +
      "enforcement; DROP CONSTRAINT disarms it") {
    val root = tmp("graft-sql-ck-")
    DeltaTable.create(customer.filter($"c_acctbal" >= 0).limit(20), root)
    assert(spark.sql(s"ALTER TABLE graft_delta.`$root` ADD CONSTRAINT " +
      "posbal CHECK (c_acctbal >= 0)").head().getLong(0) == 1L)
    // armed: a violating append refuses naming the constraint
    val dirty = customer.limit(5)
      .withColumn("c_acctbal", $"c_acctbal" - lit(1e9))
    val e = intercept[IllegalArgumentException] {
      DeltaTable.append(dirty, root)
    }
    assert(e.getMessage.contains("posbal"))
    // a second constraint over violating existing data refuses
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_delta.`$root` ADD CONSTRAINT " +
        "negbal CHECK (c_acctbal < 0)")
    }
    assert(e2.getMessage.contains("existing row"))
    // disarm: the formerly violating append lands
    spark.sql(s"ALTER TABLE graft_delta.`$root` DROP CONSTRAINT posbal")
    assert(DeltaTable.append(dirty, root) > 1L)
    val e3 = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_delta.`$root` DROP CONSTRAINT nope")
    }
    assert(e3.getMessage.contains("no constraint named 'nope'"))
    // Iceberg has no CHECK constraints in its spec
    val iroot = tmp("graft-sql-ck-ice-")
    IcebergTable.create(customer.limit(5), iroot)
    val e4 = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` ADD CONSTRAINT " +
        "x CHECK (c_custkey > 0)")
    }
    assert(e4.getMessage.contains("Delta table feature"))
  }

  test("ALTER COLUMN TYPE widens on both legs; unsafe changes refuse") {
    // Delta: int -> bigint through the typeWidening chain
    val droot = tmp("graft-sql-wide-d-")
    DeltaTable.create(customer.limit(20), droot)
    spark.sql(s"ALTER TABLE graft_delta.`$droot` ALTER COLUMN " +
      "c_nationkey TYPE BIGINT")
    val ds = DeltaLog.snapshot(spark, droot)
    assert(ds.schema("c_nationkey").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(DeltaTable.read(spark, droot)
      .select(sum($"c_nationkey")).head().get(0) != null)
    // Iceberg: the spec's safe promotion, old int32 files still serve
    val iroot = tmp("graft-sql-wide-i-")
    IcebergTable.create(customer.limit(20), iroot)
    val before = IcebergTable.read(spark, iroot)
      .select(sum($"c_nationkey")).head().getLong(0)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` ALTER COLUMN " +
      "c_nationkey TYPE BIGINT")
    val got = IcebergTable.read(spark, iroot)
    assert(got.schema("c_nationkey").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(got.select(sum($"c_nationkey")).head().getLong(0) == before)
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` ALTER COLUMN " +
        "c_custkey TYPE INT")
    }
    assert(e.getMessage.contains("not a spec-safe promotion"))
  }

  test("SYNC IDENTITY re-aligns the watermark through SQL") {
    import org.apache.spark.sql.types._
    val root = tmp("graft-sql-sync-")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, new MetadataBuilder()
        .putLong("delta.identity.start", 1L)
        .putLong("delta.identity.step", 1L)
        .putBoolean("delta.identity.allowExplicitInsert", true).build()),
      StructField("v", LongType)))
    val framed = spark.createDataFrame(
      spark.range(3).selectExpr("id + 10 as id", "id as v").rdd, schema)
    DeltaTable.create(framed, root)
    spark.sql(s"ALTER TABLE graft_delta.`$root` SYNC IDENTITY")
    val f = DeltaLog.snapshot(spark, root).schema("id")
    assert(f.metadata.getLong("delta.identity.highWaterMark") == 12L)
    // assignment continues past the synced watermark
    DeltaTable.append(spark.range(2).selectExpr("id as v"), root)
    val ids = DeltaTable.read(spark, root).select("id")
      .as[Long].collect().toSeq
    assert(ids.sorted == Seq(10L, 11L, 12L, 13L, 14L))
  }

  test("SET / UNSET TBLPROPERTIES route to the property verbs on both " +
      "formats; managed Delta feature keys refuse with the verb's name") {
    // delta leg
    val droot = tmp("graft-sql-props-d-")
    DeltaTable.create(customer.limit(30), droot)
    spark.sql(s"ALTER TABLE graft_delta.`$droot` SET TBLPROPERTIES " +
      "('delta.logRetentionDuration' = 'interval 30 days', 'owner' = 'etl')")
    val dcfg = DeltaLog.snapshot(spark, droot).configuration
    assert(dcfg.get("owner").contains("etl"))
    assert(dcfg.get("delta.logRetentionDuration")
      .contains("interval 30 days"))
    spark.sql(
      s"ALTER TABLE graft_delta.`$droot` UNSET TBLPROPERTIES ('owner')")
    assert(!DeltaLog.snapshot(spark, droot).configuration.contains("owner"))
    // a feature key with a dedicated verb refuses, naming the verb
    val err = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` SET TBLPROPERTIES " +
        "('delta.enableChangeDataFeed' = 'true')"))
    assert(err.getMessage.contains("enableChangeDataFeed"),
      err.getMessage)

    // iceberg leg: the property immediately drives writer behavior
    val iroot = tmp("graft-sql-props-i-")
    IcebergTable.create(customer.filter($"c_custkey" % 3 === 0), iroot)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` SET TBLPROPERTIES " +
      "('commit.manifest.min-count-to-merge' = '2')")
    assert(IcebergMeta.snapshot(spark, iroot).properties
      .get("commit.manifest.min-count-to-merge").contains("2"))
    IcebergTable.append(customer.filter($"c_custkey" % 3 === 1), iroot)
    IcebergTable.append(customer.filter($"c_custkey" % 3 === 2), iroot)
    assert(LakeTable.inspect(spark, iroot, "manifests")
      .where(col("content") === "data").count() == 1,
      "the SQL-set merge cap did not reach the writer")
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` UNSET TBLPROPERTIES " +
      "('commit.manifest.min-count-to-merge')")
    assert(!IcebergMeta.snapshot(spark, iroot).properties
      .contains("commit.manifest.min-count-to-merge"))
    assert(IcebergTable.read(spark, iroot).count() == customer.count())

    // a malformed entry refuses loudly instead of being silently
    // dropped (an ignored 'delta.appendOnly' would be a silent
    // enforcement gap), and a ')' inside a quoted value parses
    val bad = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` SET TBLPROPERTIES " +
        "('owner' = 'etl', delta.appendOnly = 'true')"))
    assert(bad.getMessage.contains("expected a quoted"), bad.getMessage)
    spark.sql(s"ALTER TABLE graft_delta.`$droot` SET TBLPROPERTIES " +
      "('comment' = 'see (docs)')")
    assert(DeltaLog.snapshot(spark, droot).configuration
      .get("comment").contains("see (docs)"))

    // SHOW TBLPROPERTIES surfaces the map, both formats
    val shown = spark.sql(s"SHOW TBLPROPERTIES graft_delta.`$droot`")
    assert(shown.columns.toSeq == Seq("key", "value"))
    assert(shown.where(col("key") === "delta.logRetentionDuration")
      .select("value").head().getString(0) == "interval 30 days")
    assert(spark.sql(s"SHOW TBLPROPERTIES graft_iceberg.`$iroot`")
      .count() >= 1) // graft.field-ids at least
  }

  test("ALTER TABLE ... CLUSTER BY declares liquid clustering; NONE " +
      "drops it; iceberg refuses with the compactSort hint") {
    val root = tmp("graft-sql-cluster-")
    DeltaTable.create(customer.limit(100), root)
    spark.sql(s"ALTER TABLE graft_delta.`$root` CLUSTER BY " +
      "(c_custkey, c_nationkey)")
    assert(DeltaLog.snapshot(spark, root).clusteringColumns ==
      Seq(Seq("c_custkey"), Seq("c_nationkey")))
    spark.sql(s"ALTER TABLE graft_delta.`$root` CLUSTER BY NONE")
    assert(DeltaLog.snapshot(spark, root).clusteringColumns.isEmpty)
    val iroot = tmp("graft-sql-cluster-i-")
    graft.index.sources.IcebergTable.create(customer.limit(50), iroot)
    val e = intercept[UnsupportedOperationException] {
      spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` CLUSTER BY (c_custkey)")
    }
    assert(e.getMessage.contains("compactSort"))
  }

  test("ALTER TABLE ... ADD COLUMN appends a nullable column, both formats") {
    val droot = tmp("graft-sql-addcol-d-")
    DeltaTable.create(customer.limit(50)
      .select($"c_custkey", $"c_name"), droot)
    val r = spark.sql(
      s"ALTER TABLE graft_delta.`$droot` ADD COLUMN score DOUBLE")
    assert(r.columns.toSeq == Seq("id") && r.head().getLong(0) == 1L)
    val d = DeltaTable.read(spark, droot)
    assert(d.schema.fieldNames.toSeq ==
      Seq("c_custkey", "c_name", "score"))
    // existing rows read null for the new column; new appends carry it
    assert(d.filter($"score".isNotNull).count() == 0)
    DeltaTable.append(d.limit(5).withColumn("score", lit(1.5)), droot)
    assert(DeltaTable.read(spark, droot)
      .filter($"score" === 1.5).count() == 5)
    // decimal types survive the paren-form grammar
    spark.sql(
      s"ALTER TABLE graft_delta.`$droot` ADD COLUMNS (bal DECIMAL(10,2))")
    assert(DeltaTable.read(spark, droot).schema("bal").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    // duplicate refuses
    val dup = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` ADD COLUMN score DOUBLE"))
    assert(dup.getMessage.contains("already exists"))
    // a garbled definition refuses with the grammar contract (not an
    // opaque delegate catalog error); decimal commas inside parens pass
    val multi = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` ADD COLUMNS (INT x, STRING)"))
    assert(multi.getMessage.contains("cannot parse") ||
      multi.getMessage.toLowerCase.contains("datatype"), multi.getMessage)

    val iroot = tmp("graft-sql-addcol-i-")
    IcebergTable.create(customer.limit(50)
      .select($"c_custkey", $"c_name"), iroot)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` ADD COLUMN score DOUBLE")
    val i = IcebergTable.read(spark, iroot)
    assert(i.schema.fieldNames.contains("score"))
    assert(i.filter($"score".isNotNull).count() == 0)

    // COLUMN-MAPPED table: the added field gets a fresh physical name
    // and the next column id; pre-add files read null, appends land
    // under the physical name and read back
    val mroot = tmp("graft-sql-addcol-m-")
    DeltaTable.create(customer.limit(30)
      .select($"c_custkey", $"c_acctbal"), mroot)
    spark.sql(
      s"ALTER TABLE graft_delta.`$mroot` RENAME COLUMN c_acctbal TO bal")
    spark.sql(s"ALTER TABLE graft_delta.`$mroot` ADD COLUMN score DOUBLE")
    val ms = DeltaLog.snapshot(spark, mroot)
    val scoreField = ms.schema("score")
    assert(scoreField.metadata.contains("delta.columnMapping.physicalName"))
    val phys = scoreField.metadata.getString("delta.columnMapping.physicalName")
    assert(phys.startsWith("col-"), s"expected a fresh physical name, got $phys")
    assert(ms.configuration("delta.columnMapping.maxColumnId").toLong >= 3)
    val m0 = DeltaTable.read(spark, mroot)
    assert(m0.schema.fieldNames.toSeq == Seq("c_custkey", "bal", "score"))
    assert(m0.filter($"score".isNotNull).count() == 0)
    DeltaTable.append(m0.limit(4).withColumn("score", lit(9.0)), mroot)
    assert(DeltaTable.read(spark, mroot)
      .filter($"score" === 9.0).count() == 4)
    // and the mapped column drops logically like any other
    spark.sql(s"ALTER TABLE graft_delta.`$mroot` DROP COLUMN score")
    assert(DeltaTable.read(spark, mroot).schema.fieldNames.toSeq ==
      Seq("c_custkey", "bal"))
  }

  test("ALTER TABLE ... RENAME COLUMN renames logically, both formats") {
    val droot = tmp("graft-sql-rncol-d-")
    DeltaTable.create(customer.limit(50)
      .select($"c_custkey", $"c_acctbal"), droot)
    val before = DeltaTable.read(spark, droot)
      .agg(sum($"c_acctbal").cast("decimal(28,6)")).head().getDecimal(0)
    spark.sql(
      s"ALTER TABLE graft_delta.`$droot` RENAME COLUMN c_acctbal TO balance")
    val d = DeltaTable.read(spark, droot)
    assert(d.schema.fieldNames.toSeq == Seq("c_custkey", "balance"))
    assert(d.agg(sum($"balance").cast("decimal(28,6)")).head()
      .getDecimal(0) == before, "rename must not touch data")

    val iroot = tmp("graft-sql-rncol-i-")
    IcebergTable.create(customer.limit(50)
      .select($"c_custkey", $"c_acctbal"), iroot)
    spark.sql(
      s"ALTER TABLE graft_iceberg.`$iroot` RENAME COLUMN c_acctbal TO balance")
    assert(IcebergTable.read(spark, iroot).schema.fieldNames.toSeq ==
      Seq("c_custkey", "balance"))
  }

  test("ALTER TABLE ... DROP COLUMN removes logically; guards refuse") {
    val droot = tmp("graft-sql-drcol-d-")
    DeltaTable.create(customer.limit(50)
      .select($"c_custkey", $"c_name", $"c_acctbal"), droot)
    spark.sql(s"ALTER TABLE graft_delta.`$droot` DROP COLUMN c_name")
    val d = DeltaTable.read(spark, droot)
    assert(d.schema.fieldNames.toSeq == Seq("c_custkey", "c_acctbal"))
    assert(d.count() == 50, "rows survive a logical drop")
    // a column referenced by a CHECK constraint refuses to drop
    DeltaTable.addCheckConstraint(spark, droot, "bal_nn",
      "c_acctbal IS NOT NULL")
    val guarded = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` DROP COLUMN c_acctbal"))
    assert(guarded.getMessage.contains("CHECK constraint"))

    val iroot = tmp("graft-sql-drcol-i-")
    IcebergTable.create(customer.limit(50)
      .select($"c_custkey", $"c_name", $"c_acctbal"), iroot)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` DROP COLUMN c_name")
    assert(IcebergTable.read(spark, iroot).schema.fieldNames.toSeq ==
      Seq("c_custkey", "c_acctbal"))
  }

  test("TBLPROPERTIES grammar: missing comma / missing = refuse; '' escapes") {
    val root = tmp("graft-sql-propgrammar-")
    DeltaTable.create(customer.limit(10), root)
    // the r12 escape: a missing comma between two well-formed entries
    // was silently swallowed by the residue check
    val noComma = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$root` SET TBLPROPERTIES " +
        "('a'='b' 'c'='d')"))
    assert(noComma.getMessage.contains("','"), noComma.getMessage)
    val noEq = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$root` SET TBLPROPERTIES ('a' 'b')"))
    assert(noEq.getMessage.contains("'='"), noEq.getMessage)
    val trailing = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$root` SET TBLPROPERTIES ('a'='b',)"))
    assert(trailing.getMessage.contains("entry after"), trailing.getMessage)
    // '' escaping makes quoted values expressible
    spark.sql(s"ALTER TABLE graft_delta.`$root` SET TBLPROPERTIES " +
      "('motto'='it''s fine', 'owner'='etl')")
    val cfg = DeltaLog.snapshot(spark, root).configuration
    assert(cfg.get("motto").contains("it's fine"))
    assert(cfg.get("owner").contains("etl"))
    // UNSET tokenizes with the same grammar
    val unsetBad = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$root` UNSET TBLPROPERTIES ('a' 'b')"))
    assert(unsetBad.getMessage.contains("','"), unsetBad.getMessage)
    spark.sql(s"ALTER TABLE graft_delta.`$root` UNSET TBLPROPERTIES " +
      "('motto', 'owner')")
    val cfg2 = DeltaLog.snapshot(spark, root).configuration
    assert(!cfg2.contains("motto") && !cfg2.contains("owner"))
  }

  test("Iceberg branch/tag DDL: full WAP round-trip purely from SQL") {
    val root = tmp("graft-sql-wap-")
    // custkey 0..100 -> 101 base rows
    IcebergTable.create(customer.filter($"c_custkey" <= 100)
      .select($"c_custkey", $"c_acctbal"), root)

    // act 1: CREATE BRANCH pins the audit line at main's head
    val r = spark.sql(s"ALTER TABLE graft_iceberg.`$root` CREATE BRANCH audit")
    assert(r.columns.toSeq == Seq("id"))
    // plus a TAG pinning the pre-WAP state forever
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` CREATE TAG before_wap")

    // act 2: audit writes land on the BRANCH; main does not move
    spark.sql(s"INSERT INTO graft_iceberg.`$root@audit` " +
      "SELECT CAST(9001 AS BIGINT), CAST(1.0 AS DOUBLE)")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft_iceberg.`$root`")
      .head().getLong(0) == 101, "main must not see unpublished writes")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft_iceberg.`$root` " +
      "VERSION AS OF 'audit'").head().getLong(0) == 102,
      "the branch read must serve the audit write")

    // act 3: FAST FORWARD publishes the audited head
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` FAST FORWARD audit")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft_iceberg.`$root`")
      .head().getLong(0) == 102)
    // the tag still serves the pre-WAP state
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft_iceberg.`$root` " +
      "VERSION AS OF 'before_wap'").head().getLong(0) == 101)

    // cleanup DDL: type-checked drops
    val mismatch = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_iceberg.`$root` DROP BRANCH before_wap"))
    assert(mismatch.getMessage.contains("is a tag"))
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` DROP BRANCH audit")
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` DROP TAG before_wap")
    val gone = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_iceberg.`$root` DROP TAG before_wap"))
    assert(gone.getMessage.contains("IF EXISTS"))
    // IF EXISTS tolerates the unknown name
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` DROP TAG IF EXISTS before_wap")

    // refs are Iceberg-only: Delta refuses with the feature name
    val droot = tmp("graft-sql-wap-d-")
    DeltaTable.create(customer.limit(10), droot)
    val e = intercept[UnsupportedOperationException](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` CREATE BRANCH audit"))
    assert(e.getMessage.contains("Iceberg feature"))
  }

  test("CREATE OR REPLACE + RETAIN / WITH SNAPSHOT RETENTION ref DDL") {
    val root = tmp("graft-sql-refret-")
    IcebergTable.create(customer.limit(10).select($"c_custkey"), root)
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` CREATE BRANCH dev " +
      "RETAIN 7 DAYS WITH SNAPSHOT RETENTION 3 SNAPSHOTS 2 DAYS")
    val dev = IcebergMeta.snapshot(spark, root).refs("dev")
    assert(dev.maxRefAgeMs.contains(7L * 24 * 3600 * 1000))
    assert(dev.minSnapshotsToKeep.contains(3))
    assert(dev.maxSnapshotAgeMs.contains(2L * 24 * 3600 * 1000))
    // the days-only snapshot-retention form
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` CREATE BRANCH aged " +
      "WITH SNAPSHOT RETENTION 5 DAYS")
    assert(IcebergMeta.snapshot(spark, root).refs("aged")
      .maxSnapshotAgeMs.contains(5L * 24 * 3600 * 1000))
    // tags: plain re-CREATE refuses, OR REPLACE moves deliberately
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` CREATE TAG v1")
    val dup = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_iceberg.`$root` CREATE TAG v1"))
    assert(dup.getMessage.contains("OR REPLACE"), dup.getMessage)
    spark.sql(s"ALTER TABLE graft_iceberg.`$root` " +
      "CREATE OR REPLACE TAG v1 RETAIN 30 DAYS")
    assert(IcebergMeta.snapshot(spark, root).refs("v1")
      .maxRefAgeMs.contains(30L * 24 * 3600 * 1000))
  }

  test("CREATE TABLE with explicit schema makes an empty table, both formats") {
    val droot = tmp("graft-sql-create-d-")
    val r = spark.sql(
      s"""CREATE TABLE graft_delta.`$droot`
         |(id BIGINT, name STRING, bal DECIMAL(10,2), region INT)
         |PARTITIONED BY (region)""".stripMargin)
    assert(r.columns.toSeq == Seq("id"))
    val d = DeltaTable.read(spark, droot)
    assert(d.count() == 0)
    assert(d.schema.fieldNames.toSeq ==
      Seq("id", "name", "bal", "region"))
    assert(DeltaLog.snapshot(spark, droot).partitionColumns == Seq("region"))
    // the empty table accepts a first INSERT with the declared layout
    spark.sql(s"INSERT INTO graft_delta.`$droot` " +
      "SELECT 1L, 'a', CAST(2.50 AS DECIMAL(10,2)), 7")
    assert(DeltaTable.read(spark, droot).count() == 1)

    val iroot = tmp("graft-sql-create-i-")
    spark.sql(
      s"CREATE TABLE graft_iceberg.`$iroot` (id BIGINT, name STRING)")
    assert(IcebergTable.read(spark, iroot).count() == 0)
    assert(IcebergTable.read(spark, iroot).schema.fieldNames.toSeq ==
      Seq("id", "name"))

    // an unknown partition column refuses at declaration
    val bad = intercept[Exception](spark.sql(
      s"CREATE TABLE graft_delta.`${tmp("graft-sql-create-bad-")}` " +
        "(id BIGINT) PARTITIONED BY (nope)"))
    assert(bad.getMessage.contains("partition column"))
    // graft_lake has no format to create under
    val lake = intercept[Exception](spark.sql(
      s"CREATE TABLE graft_lake.`${tmp("graft-sql-create-lake-")}` (id BIGINT)"))
    assert(lake.getMessage.contains("explicit format"))
  }

  test("ADD COLUMNS list form: one commit, both formats, nested types OK") {
    import org.apache.spark.sql.types._
    val droot = tmp("graft-sql-addcols-d-")
    DeltaTable.create(customer.limit(10).select($"c_custkey"), droot)
    val v0 = DeltaLog.snapshot(spark, droot).version
    spark.sql(s"ALTER TABLE graft_delta.`$droot` ADD COLUMNS " +
      "(bonus DOUBLE, tags ARRAY<STRING>, score DECIMAL(10,2))")
    val s = DeltaLog.snapshot(spark, droot)
    assert(s.version == v0 + 1, "the whole list must land in ONE commit")
    assert(s.schema.fieldNames.toSeq ==
      Seq("c_custkey", "bonus", "tags", "score"))
    assert(s.schema("tags").dataType == ArrayType(StringType))
    assert(s.schema("score").dataType == DecimalType(10, 2))

    val iroot = tmp("graft-sql-addcols-i-")
    IcebergTable.create(customer.limit(10).select($"c_custkey"), iroot)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` ADD COLUMNS " +
      "(bonus DOUBLE, tags ARRAY<STRING>)")
    val ischema = IcebergTable.read(spark, iroot).schema
    assert(ischema.fieldNames.toSeq == Seq("c_custkey", "bonus", "tags"))
    assert(ischema("tags").dataType == ArrayType(StringType))
    // the array's element-id was allocated, not zero/colliding: append
    // and read back
    spark.sql(s"INSERT INTO graft_iceberg.`$iroot` " +
      "SELECT CAST(9001 AS BIGINT), 1.5, array('a','b')")
    assert(IcebergTable.read(spark, iroot)
      .where($"c_custkey" === 9001).select("tags").head()
      .getSeq[String](0) == Seq("a", "b"))
  }

  test("nested-target column DDL: add / rename / drop under a struct") {
    import org.apache.spark.sql.types._
    // ---- Delta: nested adds get physical names on a mapped table
    val droot = tmp("graft-sql-nested-d-")
    DeltaTable.create(customer.limit(20)
      .select($"c_custkey", struct($"c_nationkey".as("nk")).as("info")),
      droot)
    // enable mapping via a rename first, so the nested add must assign
    // physical names per leaf
    spark.sql(s"ALTER TABLE graft_delta.`$droot` RENAME COLUMN " +
      "c_custkey TO cust_id")
    spark.sql(s"ALTER TABLE graft_delta.`$droot` ADD COLUMNS " +
      "(info.bonus DOUBLE, extra STRUCT<a: INT, b: STRING>)")
    val s = DeltaLog.snapshot(spark, droot)
    val info = s.schema("info").dataType.asInstanceOf[StructType]
    assert(info.fieldNames.toSeq == Seq("nk", "bonus"))
    import graft.index.sources.{DeltaColumnMapping => Cm}
    assert(info("bonus").metadata.getString(Cm.PhysicalNameKey)
      .startsWith("col-"), "nested add on a mapped table needs a uuid " +
      "physical name")
    val extra = s.schema("extra").dataType.asInstanceOf[StructType]
    assert(extra.fields.forall(_.metadata.contains(Cm.PhysicalNameKey)),
      "every leaf of a struct-typed addition must be mapped")
    val ids = {
      def of(st: StructType): Seq[Long] = st.fields.toSeq.flatMap { f =>
        (if (f.metadata.contains(Cm.IdKey)) Seq(f.metadata.getLong(Cm.IdKey))
        else Nil) ++ (f.dataType match {
          case n: StructType => of(n)
          case _ => Nil
        })
      }
      of(s.schema)
    }
    assert(ids.distinct.size == ids.size, s"field-id collision: $ids")
    // old files read null for the new nested field; rename + drop legs
    assert(DeltaTable.read(spark, droot)
      .filter($"info.bonus".isNotNull).count() == 0)
    spark.sql(s"ALTER TABLE graft_delta.`$droot` RENAME COLUMN " +
      "info.bonus TO bonus2")
    assert(DeltaTable.read(spark, droot).select($"info.bonus2").count() == 20)
    spark.sql(s"ALTER TABLE graft_delta.`$droot` DROP COLUMN info.bonus2")
    val afterDrop = DeltaLog.snapshot(spark, droot)
      .schema("info").dataType.asInstanceOf[StructType]
    assert(afterDrop.fieldNames.toSeq == Seq("nk"))
    // dropping the struct's only field refuses
    val only = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` DROP COLUMN info.nk"))
    assert(only.getMessage.contains("only field"))

    // ---- Iceberg: same verbs over the JSON schema
    val iroot = tmp("graft-sql-nested-i-")
    IcebergTable.create(customer.limit(20)
      .select($"c_custkey", struct($"c_nationkey".as("nk")).as("info")),
      iroot)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` ADD COLUMN " +
      "info.bonus DOUBLE")
    assert(IcebergTable.read(spark, iroot)
      .filter($"info.bonus".isNotNull).count() == 0)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` RENAME COLUMN " +
      "info.bonus TO bonus2")
    assert(IcebergTable.read(spark, iroot).select($"info.bonus2")
      .count() == 20)
    spark.sql(s"ALTER TABLE graft_iceberg.`$iroot` DROP COLUMN info.bonus2")
    val ischema = IcebergTable.read(spark, iroot)
      .schema("info").dataType.asInstanceOf[StructType]
    assert(ischema.fieldNames.toSeq == Seq("nk"))
    // a non-struct parent refuses loudly
    val notStruct = intercept[Exception](spark.sql(
      s"ALTER TABLE graft_iceberg.`$iroot` ADD COLUMN c_custkey.x INT"))
    assert(notStruct.getMessage.contains("not a struct"))
  }

  test("column-DDL grammar edges: unbalanced parens refuse; drop list works") {
    val droot = tmp("graft-sql-ddl-edge-")
    DeltaTable.create(customer.limit(5)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal", $"c_mktsegment"),
      droot)
    // unbalanced paren must refuse, not silently fall through to the
    // delegate's catalog error
    intercept[Exception](spark.sql(
      s"ALTER TABLE graft_delta.`$droot` DROP COLUMN (c_acctbal"))
    assert(DeltaLog.snapshot(spark, droot).schema.fieldNames.length == 4,
      "a refused DROP must not commit")
    // DROP COLUMNS (a, b) list form
    spark.sql(s"ALTER TABLE graft_delta.`$droot` DROP COLUMNS " +
      "(c_acctbal, c_mktsegment)")
    assert(DeltaLog.snapshot(spark, droot).schema.fieldNames.toSeq ==
      Seq("c_custkey", "c_nationkey"))
  }

  test("INSERT into a table whose path contains '@' appends; no branch split") {
    // an existing table at /…/t@v2 must keep working as a plain INSERT
    // target — the `path@branch` split applies only when the prefix is
    // the recognized table
    val root = tmp("graft-sql-at-") + "/t@v2"
    DeltaTable.create(customer.limit(10).select($"c_custkey"), root)
    spark.sql(s"INSERT INTO graft_delta.`$root` SELECT CAST(9001 AS BIGINT)")
    assert(DeltaTable.read(spark, root).count() == 11)
  }

  test("INSERT casts ANSI at runtime: an overflowing value refuses, not nulls") {
    val root = tmp("graft-sql-ansi-")
    spark.sql(s"CREATE TABLE graft_delta.`$root` (k INT, v STRING)")
    // in-range narrowing (bigint literal -> int column) binds and writes
    spark.sql(s"INSERT INTO graft_delta.`$root` " +
      "SELECT CAST(1 AS BIGINT), 'ok'")
    // out-of-range must FAIL the job (ANSI), never silently wrap to an int
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft_delta.`$root` " +
        "SELECT CAST(9223372036854775807 AS BIGINT), 'boom'"))
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(t => t.isInstanceOf[ArithmeticException] ||
      Option(t.getMessage).exists(_.contains("CAST_OVERFLOW"))),
      s"expected an ANSI overflow failure, got: $chain")
    val got = DeltaTable.read(spark, root)
    assert(got.count() == 1 && got.select("k").head().getInt(0) == 1)
  }
}
