package graft.index

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaDeletionVectors => Dv, DeltaLog, DeltaTable, DvDescriptor, UnsupportedDeltaProtocolException}

/**
 * Delta deletion-vector merge-on-read: the codec (RFC 1924 base85,
 * portable RoaringBitmapArray, DV file framing), the `deleteWhere`
 * writer, the anti-join read, DV survival across checkpoints and
 * appends, time travel to pre-delete versions, and the writer gate's
 * refusal of row deletes on append-only tables.
 */
class DeltaDvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft-delta-dv-").toString
    DeltaTable.create(customer, root)
    root
  }

  // ------------------------------------------------------------- codec

  test("base85: byte and UUID roundtrips match RFC 1924 alphabet") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val bytes = Array.fill[Byte](4 * (1 + rnd.nextInt(8)))(rnd.nextInt().toByte)
      assert(Dv.base85Decode(Dv.base85Encode(bytes)).sameElements(bytes))
    }
    val uuid = java.util.UUID.randomUUID()
    val enc = Dv.encodeUUID(uuid)
    assert(enc.length == Dv.EncodedUuidLength)
    assert(Dv.decodeUUID(enc) == uuid)
    // the RFC 1924 alphabet starts at '0' for zero (Z85 would use '.')
    assert(Dv.base85Encode(Array[Byte](0, 0, 0, 0)) == "00000")
  }

  test("portable bitmap: positions roundtrip incl. >32-bit and cardinality") {
    val positions = Seq(0L, 1L, 2L, 63L, 100000L, (1L << 32) + 5L, (3L << 32))
    val (bytes, card) = Dv.serializePositions(positions.iterator)
    assert(card == positions.size)
    assert(Dv.deserializePositions(bytes).toSeq == positions.sorted)
    // duplicate adds collapse (bitmap semantics)
    val (b2, c2) = Dv.serializePositions((positions ++ positions).iterator)
    assert(c2 == positions.size)
    assert(Dv.deserializePositions(b2).toSeq == positions.sorted)
  }

  test("DV file framing: slice verifies size and CRC, rejects bad version") {
    val fs = new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())
    val dir = new Path(Files.createTempDirectory("graft-dv-frame-").toString)
    val (bytes, card) = Dv.serializePositions(Iterator(1L, 5L, 9L))
    val (dvPath, descs) = Dv.writeDvFile(fs, dir, Seq(("f1", bytes, card)))
    val len = fs.getFileStatus(dvPath).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(dvPath); try in.readFully(0, buf) finally in.close()
    assert(buf(0) == Dv.FileFormatVersion)
    val d = descs("f1")
    assert(Dv.positionsOf(d, Some(buf)).toSeq == Seq(1L, 5L, 9L))
    // corrupt one data byte → CRC failure
    val corrupt = buf.clone(); corrupt(6) = (corrupt(6) ^ 0x1).toByte
    intercept[IllegalArgumentException](Dv.slice(corrupt, d))
    // wrong format version byte
    val badVer = buf.clone(); badVer(0) = 2
    intercept[IllegalArgumentException](Dv.slice(badVer, d))
  }

  test("inline DVs decode from the descriptor itself") {
    // 3-value array container: serialized size is NOT 4-byte aligned, so
    // this exercises the encoder's zero-padding + sizeInBytes truncation
    val (bytes, card) = Dv.serializePositions(Iterator(2L, 4L, 8L))
    val d = DvDescriptor("i", Dv.base85Encode(bytes), None, bytes.length, card)
    assert(Dv.positionsOf(d, None).toSeq == Seq(2L, 4L, 8L))
  }

  // ------------------------------------------------- deleteWhere + read

  test("deleteWhere drops matching rows without rewriting data files") {
    val root = freshTable()
    val before = DeltaLog.snapshot(spark, root).files.map(_.path).toSet
    val v = DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    assert(v == 1L)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.map(_.path).toSet == before, "data files must not be rewritten")
    assert(s.files.exists(_.dv.exists(_.cardinality > 0)))
    assert(s.minReaderVersion == 3 && s.readerFeatures.contains("deletionVectors"))
    assert(s.minWriterVersion == 7 && s.writerFeatures.contains("deletionVectors"))
    val expected = customer.filter(col("c_custkey") % 7 =!= 3).count()
    assert(DeltaTable.read(spark, root).count() == expected)
    // aggregate parity, not just counts
    val got = DeltaTable.read(spark, root)
      .agg(sum(col("c_custkey")).cast("long")).head().getLong(0)
    val want = customer.filter(col("c_custkey") % 7 =!= 3)
      .agg(sum(col("c_custkey")).cast("long")).head().getLong(0)
    assert(got == want)
  }

  test("repeat deleteWhere unions into the existing DV") {
    val root = freshTable()
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 5 === 1)
    val expected = customer
      .filter(col("c_custkey") % 7 =!= 3 && col("c_custkey") % 5 =!= 1).count()
    assert(DeltaTable.read(spark, root).count() == expected)
    // overlapping re-delete is a no-op
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    assert(DeltaTable.read(spark, root).count() == expected)
  }

  test("descriptors spanning MULTIPLE DV files decode together") {
    // two appends → (at least) two data-file sets; two disjoint deletes
    // each touching ONE set → the snapshot's descriptors point into TWO
    // different DV files, and the read must decode both
    val root = Files.createTempDirectory("graft-delta-dv2-").toString
    val lowHalf = customer.filter(col("c_custkey") < 75L)
    val highHalf = customer.filter(col("c_custkey") >= 75L)
    DeltaTable.create(lowHalf, root)
    DeltaTable.append(highHalf, root)
    DeltaTable.deleteWhere(spark, root, col("c_custkey") === 10L)
    DeltaTable.deleteWhere(spark, root, col("c_custkey") === 100L)
    val dvFiles = DeltaLog.snapshot(spark, root).files
      .flatMap(_.dv).map(_.pathOrInlineDv).distinct
    assert(dvFiles.size == 2,
      s"expected descriptors into two DV files, got $dvFiles")
    assert(DeltaTable.read(spark, root).count() == customer.count() - 2)
    assert(DeltaTable.read(spark, root)
      .filter(col("c_custkey").isin(10L, 100L)).count() == 0)
  }

  test("deleteWhere matching nothing commits nothing") {
    val root = freshTable()
    val v = DeltaTable.deleteWhere(spark, root, col("c_custkey") === -1L)
    assert(v == 0L)
    assert(DeltaLog.snapshot(spark, root).version == 0L)
  }

  test("time travel to the pre-delete version sees every row") {
    val root = freshTable()
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L)).count() ==
      customer.count())
  }

  test("append after delete keeps the DV and adds the new rows") {
    val root = freshTable()
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    val extra = customer.limit(10).withColumn("c_custkey",
      col("c_custkey") + 1000000L)
    DeltaTable.append(extra, root)
    val expected = customer.filter(col("c_custkey") % 7 =!= 3).count() + 10
    assert(DeltaTable.read(spark, root).count() == expected)
  }

  test("checkpoint persists DV descriptors for later replays") {
    val root = freshTable()
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    DeltaTable.checkpoint(spark, root)
    // force a checkpoint-based replay: add a commit after it so the JSON
    // tail alone cannot reconstruct the adds
    DeltaTable.append(customer.limit(5)
      .withColumn("c_custkey", col("c_custkey") + 2000000L), root)
    val s = DeltaLog.snapshot(spark, root)
    assert(s.files.exists(_.dv.exists(_.cardinality > 0)),
      "checkpoint replay lost the deletion vectors")
    val expected = customer.filter(col("c_custkey") % 7 =!= 3).count() + 5
    assert(DeltaTable.read(spark, root).count() == expected)
  }

  test("purge compacts DVs away; history keeps the MOR snapshots") {
    val root = freshTable()
    DeltaTable.deleteWhere(spark, root, col("c_custkey") % 7 === 3)
    val expected = customer.filter(col("c_custkey") % 7 =!= 3).count()
    val v = DeltaTable.purge(spark, root)
    assert(v == 2L)
    val s = DeltaLog.snapshot(spark, root)
    assert(!s.files.exists(_.dv.isDefined), "purge left deletion vectors")
    assert(DeltaTable.read(spark, root).count() == expected)
    // the purged read is a plain scan — no MOR anti-join in the plan
    assert(!DeltaTable.read(spark, root).queryExecution.executedPlan
      .toString.contains("LeftAnti"))
    // time travel: v1 still applies the DV, v0 sees every row
    assert(DeltaTable.read(spark, root, versionAsOf = Some(1L)).count() == expected)
    assert(DeltaTable.read(spark, root, versionAsOf = Some(0L)).count() ==
      customer.count())
    // idempotent: no DVs → no-op, same version
    assert(DeltaTable.purge(spark, root) == 2L)
  }

  test("writer gate: append-only tables refuse deleteWhere") {
    val root = Files.createTempDirectory("graft-delta-ao-").toString
    DeltaTable.create(customer, root)
    // stamp appendOnly into the table configuration via a metaData commit
    val logDir = new Path(root, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(logDir, f"${1L}%020d.json"), false)
    try out.write(
      ("""{"metaData":{"id":"x","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":${org.json4s.jackson.JsonMethods.compact(
          org.json4s.JString(customer.schema.json))},""" +
        """"partitionColumns":[],"configuration":{"delta.appendOnly":"true"}}}""" +
        "\n").getBytes("UTF-8"))
    finally out.close()
    val e = intercept[UnsupportedDeltaProtocolException](
      DeltaTable.deleteWhere(spark, root, col("c_custkey") === 1L))
    assert(e.getMessage.contains("append-only"))
  }

  test("reader gate still refuses unimplemented features alongside DVs") {
    val root = Files.createTempDirectory("graft-delta-gate-").toString
    DeltaTable.create(customer.limit(3), root)
    val logDir = new Path(root, "_delta_log")
    val fs = logDir.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(logDir, f"${1L}%020d.json"), false)
    try out.write(
      ("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors","collations"],""" +
        """"writerFeatures":["deletionVectors","collations"]}}""" + "\n")
        .getBytes("UTF-8"))
    finally out.close()
    val e = intercept[UnsupportedDeltaProtocolException](
      DeltaTable.read(spark, root))
    assert(e.getMessage.contains("collations"))
  }
}
