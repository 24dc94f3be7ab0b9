package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{DeltaTable, IcebergTable}

/**
 * Structured Streaming over the jarless lakehouse logs: the
 * `graft-delta` / `graft-iceberg` v1 sources serve each commit's
 * appended rows as micro-batches, resume from the checkpoint without
 * re-serving, refuse row-deleting commits loudly (or skip them with
 * `skipChangeCommits=true`), and honor `startingVersion=latest`.
 */
class LakeStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  /** Drain the stream into a parquet sink with AvailableNow; returns the
    * sink's current row count. */
  private def drain(format: String, table: String, out: String, ckpt: String,
      options: Map[String, String] = Map.empty): Long = {
    var reader = spark.readStream.format(format)
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val df = reader.load(table)
    val schema = df.schema
    val q = df
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit schema: a zero-batch drain leaves the sink file-less
    spark.read.schema(schema).parquet(out).count()
  }

  test("graft-delta: per-commit batches, checkpoint resume, no re-serving") {
    val root = Files.createTempDirectory("graft-dstream-").toString
    val out = Files.createTempDirectory("graft-dstream-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-ck-").toString
    val first = customer.filter(col("c_custkey") < 100)
    DeltaTable.create(first, root)

    assert(drain("graft-delta", root, out, ckpt) == first.count())
    // nothing new: a second drain serves zero additional rows
    assert(drain("graft-delta", root, out, ckpt) == first.count())

    DeltaTable.append(customer.filter(col("c_custkey") >= 100), root)
    assert(drain("graft-delta", root, out, ckpt) == customer.count())

    // the streamed rows are exactly the table rows (no dupes, no loss)
    val got = spark.read.parquet(out).select(sum(col("c_custkey"))).head().getLong(0)
    val want = customer.select(sum(col("c_custkey"))).head().getLong(0)
    assert(got == want)
  }

  test("graft-delta: row-deleting commits refuse; skipChangeCommits skips") {
    val root = Files.createTempDirectory("graft-dstream-del-").toString
    val out = Files.createTempDirectory("graft-dstream-del-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-del-ck-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)
    assert(drain("graft-delta", root, out, ckpt) == 100)

    DeltaTable.deleteWhere(spark, root, col("c_custkey") < 10)
    val late = customer.filter(col("c_custkey") >= 100)
    DeltaTable.append(late, root)

    val e = intercept[StreamingQueryException] {
      drain("graft-delta", root, out, ckpt)
    }
    assert(e.getMessage.contains("append stream cannot represent") ||
      Option(e.getCause).exists(_.getMessage.contains("append stream cannot represent")))

    // with the skip option the delete commit is passed over, appends flow
    val out2 = Files.createTempDirectory("graft-dstream-del-out2-").toString
    val ckpt2 = Files.createTempDirectory("graft-dstream-del-ck2-").toString
    val n = drain("graft-delta", root, out2, ckpt2,
      Map("skipChangeCommits" -> "true"))
    assert(n == 100 + late.count())
  }

  test("graft-delta: startingVersion=latest serves only post-start commits") {
    val root = Files.createTempDirectory("graft-dstream-late-").toString
    val out = Files.createTempDirectory("graft-dstream-late-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-late-ck-").toString
    DeltaTable.create(customer.filter(col("c_custkey") < 100), root)
    // stream created AFTER v0: drains nothing yet
    assert(drain("graft-delta", root, out, ckpt,
      Map("startingVersion" -> "latest")) == 0L)
    val late = customer.filter(col("c_custkey") >= 100)
    DeltaTable.append(late, root)
    assert(drain("graft-delta", root, out, ckpt,
      Map("startingVersion" -> "latest")) == late.count())
  }

  test("graft-iceberg: startingSnapshotId=latest under a BRANCH pins " +
      "the branch head, not main's") {
    val root = Files.createTempDirectory("graft-istream-blate-").toString
    val out = Files.createTempDirectory("graft-istream-blate-out-").toString
    val ckpt = Files.createTempDirectory("graft-istream-blate-ck-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 100), root) // 1
    // two UNPUBLISHED branch commits main doesn't see
    IcebergTable.append(customer.filter(col("c_custkey") === 100), root,
      branch = Some("audit"))                                          // 2
    IcebergTable.append(customer.filter(col("c_custkey") === 101), root,
      branch = Some("audit"))                                          // 3
    // latest = the BRANCH head (3): the stream must NOT replay the
    // existing unpublished window the user asked to skip
    assert(drain("graft-iceberg", root, out, ckpt,
      Map("branch" -> "audit", "startingSnapshotId" -> "latest")) == 0L)
    IcebergTable.append(customer.filter(col("c_custkey") === 102), root,
      branch = Some("audit"))                                          // 4
    assert(drain("graft-iceberg", root, out, ckpt,
      Map("branch" -> "audit", "startingSnapshotId" -> "latest")) == 1L)
  }

  test("graft-delta readChangeFeed: deletes stream as first-class change rows") {
    val root = Files.createTempDirectory("graft-dstream-cdc-").toString
    val out = Files.createTempDirectory("graft-dstream-cdc-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-cdc-ck-").toString
    DeltaTable.create(customer, root,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val opts = Map("readChangeFeed" -> "true")
    assert(drain("graft-delta", root, out, ckpt, opts) == customer.count())

    DeltaTable.deleteWhere(spark, root, col("c_nationkey") < 5)
    val nDel = customer.filter(col("c_nationkey") < 5).count()
    // no refusal in CDC mode: the delete arrives as change rows
    assert(drain("graft-delta", root, out, ckpt, opts) ==
      customer.count() + nDel)
    val byType = spark.read.parquet(out)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") == customer.count())
    assert(byType("delete") == nDel)
    // stamps ride along
    assert(spark.read.parquet(out)
      .filter(col("_commit_timestamp").isNull ||
        col("_commit_version").isNull).count() == 0)
  }

  test("graft-iceberg: snapshot-id offsets, resume, strict delete refusal") {
    val loc = Files.createTempDirectory("graft-istream-").toString
    val out = Files.createTempDirectory("graft-istream-out-").toString
    val ckpt = Files.createTempDirectory("graft-istream-ck-").toString
    val first = customer.filter(col("c_custkey") < 100)
    IcebergTable.create(first, loc)

    assert(drain("graft-iceberg", loc, out, ckpt) == first.count())
    IcebergTable.append(customer.filter(col("c_custkey") >= 100), loc)
    assert(drain("graft-iceberg", loc, out, ckpt) == customer.count())
    assert(drain("graft-iceberg", loc, out, ckpt) == customer.count())

    IcebergTable.deleteWhere(spark, loc, col("c_custkey") < 10)
    IcebergTable.append(customer.limit(5), loc)
    val e = intercept[StreamingQueryException] {
      drain("graft-iceberg", loc, out, ckpt)
    }
    assert(e.getMessage.contains("appends-only") ||
      Option(e.getCause).exists(_.getMessage.contains("appends-only")))
    // skipping the delete snapshot serves the trailing append
    val n = drain("graft-iceberg", loc, out, ckpt,
      Map("skipChangeCommits" -> "true"))
    assert(n == customer.count() + 5)
  }

  test("graft-iceberg: a dropped-and-recreated table fails the checkpoint " +
      "instead of yielding empty batches forever") {
    val loc = Files.createTempDirectory("graft-istream-reset-").toString
    val out = Files.createTempDirectory("graft-istream-reset-out-").toString
    val ckpt = Files.createTempDirectory("graft-istream-reset-ck-").toString
    IcebergTable.create(customer.filter(col("c_custkey") < 50), loc)
    IcebergTable.append(customer.filter(col("c_custkey") >= 50 &&
      col("c_custkey") < 100), loc)
    IcebergTable.append(customer.filter(col("c_custkey") >= 100 &&
      col("c_custkey") < 150), loc)
    drain("graft-iceberg", loc, out, ckpt) // checkpoint now at snapshot 3

    // drop + recreate: snapshot ids restart below the checkpointed end
    def rmrf(p: java.io.File): Unit = {
      Option(p.listFiles).foreach(_.foreach(rmrf)); p.delete()
    }
    rmrf(new java.io.File(loc))
    IcebergTable.create(customer.filter(col("c_custkey") < 20), loc)

    val e = intercept[StreamingQueryException] {
      drain("graft-iceberg", loc, out, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dropped and recreated")),
      s"expected the recreation divergence error, got: ${msgs(e).mkString(" | ")}")
  }

  /** Completed micro-batches recorded in the checkpoint's offset log. */
  private def batchCount(ckpt: String): Int =
    new java.io.File(ckpt, "offsets").list()
      .count(n => n.forall(_.isDigit))

  test("graft-delta: maxFilesPerTrigger — Trigger.AvailableNow DRAINS " +
      "the whole backlog in bounded per-commit batches") {
    val root = Files.createTempDirectory("graft-dstream-rate-").toString
    val out = Files.createTempDirectory("graft-dstream-rate-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-rate-ck-").toString
    // 3 commits × 2 files each — the backlog a restart would face
    val c0 = customer.filter(col("c_custkey") < 50)
    val c1 = customer.filter(col("c_custkey") >= 50 && col("c_custkey") < 100)
    val c2 = customer.filter(col("c_custkey") >= 100)
    DeltaTable.create(c0.repartition(2), root)
    DeltaTable.append(c1.repartition(2), root)
    DeltaTable.append(c2.repartition(2), root)

    // ONE AvailableNow run drains everything — the admission-control
    // protocol paces it as one micro-batch per commit under the cap
    val opts = Map("maxFilesPerTrigger" -> "2")
    assert(drain("graft-delta", root, out, ckpt, opts) == customer.count())
    assert(batchCount(ckpt) == 3,
      s"expected 3 capped batches, got ${batchCount(ckpt)}")
    // drained: a further capped run serves nothing new
    assert(drain("graft-delta", root, out, ckpt, opts) == customer.count())
    // RESUME MID-BACKLOG: new commits drain from the checkpointed
    // offset in capped batches, never re-serving
    DeltaTable.append(customer.limit(30).repartition(2), root)
    DeltaTable.append(customer.limit(20).repartition(2), root)
    assert(drain("graft-delta", root, out, ckpt, opts) ==
      customer.count() + 50)
    assert(spark.read.parquet(out).count() == customer.count() + 50)
  }

  test("graft-delta: a wider files cap admits multiple commits per batch; " +
      "a tiny bytes cap still makes progress (at least one commit)") {
    val root = Files.createTempDirectory("graft-dstream-rate2-").toString
    val c0 = customer.filter(col("c_custkey") < 50)
    val c1 = customer.filter(col("c_custkey") >= 50 && col("c_custkey") < 100)
    val c2 = customer.filter(col("c_custkey") >= 100)
    DeltaTable.create(c0.repartition(2), root)
    DeltaTable.append(c1.repartition(2), root)
    DeltaTable.append(c2.repartition(2), root)

    // 4-file cap ⇒ batch 1 = commits 0+1, batch 2 = commit 2
    val out = Files.createTempDirectory("graft-dstream-rate2-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-rate2-ck-").toString
    assert(drain("graft-delta", root, out, ckpt,
      Map("maxFilesPerTrigger" -> "4")) == customer.count())
    assert(batchCount(ckpt) == 2)

    // 1-byte cap: every commit exceeds it, yet each batch admits one
    // commit (progress is never starved) — 3 batches, full drain
    val out2 = Files.createTempDirectory("graft-dstream-rate2b-out-").toString
    val ckpt2 = Files.createTempDirectory("graft-dstream-rate2b-ck-").toString
    assert(drain("graft-delta", root, out2, ckpt2,
      Map("maxBytesPerTrigger" -> "1")) == customer.count())
    assert(batchCount(ckpt2) == 3)
  }

  test("graft-iceberg: maxFilesPerTrigger paces the snapshot lineage " +
      "and AvailableNow drains it fully") {
    val loc = Files.createTempDirectory("graft-istream-rate-").toString
    val out = Files.createTempDirectory("graft-istream-rate-out-").toString
    val ckpt = Files.createTempDirectory("graft-istream-rate-ck-").toString
    val c0 = customer.filter(col("c_custkey") < 50)
    val c1 = customer.filter(col("c_custkey") >= 50 && col("c_custkey") < 100)
    val c2 = customer.filter(col("c_custkey") >= 100)
    IcebergTable.create(c0.repartition(2), loc)
    IcebergTable.append(c1.repartition(2), loc)
    IcebergTable.append(c2.repartition(2), loc)

    val opts = Map("maxFilesPerTrigger" -> "2")
    assert(drain("graft-iceberg", loc, out, ckpt, opts) == customer.count())
    assert(batchCount(ckpt) == 3,
      s"expected 3 capped batches, got ${batchCount(ckpt)}")
    assert(drain("graft-iceberg", loc, out, ckpt, opts) == customer.count())
    assert(spark.read.parquet(out).select(sum(col("c_custkey")))
      .head().getLong(0) ==
      customer.select(sum(col("c_custkey"))).head().getLong(0))
  }

  test("an uncapped checkpoint upgraded to caps resumes from the " +
      "committed offset — no regression, no re-serving") {
    val root = Files.createTempDirectory("graft-dstream-upg-").toString
    val out = Files.createTempDirectory("graft-dstream-upg-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-upg-ck-").toString
    val c0 = customer.filter(col("c_custkey") < 100)
    DeltaTable.create(c0.repartition(2), root)
    assert(drain("graft-delta", root, out, ckpt) == c0.count())
    DeltaTable.append(
      customer.filter(col("c_custkey") >= 100).repartition(2), root)
    // caps added on the live checkpoint: the engine hands the source
    // its committed offset, so pacing starts exactly there
    val n = drain("graft-delta", root, out, ckpt,
      Map("maxFilesPerTrigger" -> "2"))
    assert(n == customer.count())
    assert(spark.read.parquet(out).select(sum(col("c_custkey")))
      .head().getLong(0) ==
      customer.select(sum(col("c_custkey"))).head().getLong(0))
  }

  test("startingTimestamp: both sources serve only commits at/after the time") {
    // Delta: v0, pause, v1 — a timestamp between the two serves only v1
    val root = Files.createTempDirectory("graft-dstream-ts-").toString
    val a = customer.filter(col("c_custkey") < 80)
    val b = customer.filter(col("c_custkey") >= 80)
    DeltaTable.create(a, root)
    Thread.sleep(1500)
    val mid = System.currentTimeMillis()
    Thread.sleep(1500)
    DeltaTable.append(b, root)
    val out = Files.createTempDirectory("graft-dstream-ts-out-").toString
    val ckpt = Files.createTempDirectory("graft-dstream-ts-ck-").toString
    assert(drain("graft-delta", root, out, ckpt,
      Map("startingTimestamp" -> mid.toString)) == b.count())
    // a future timestamp serves nothing yet, then picks up new commits
    val out2 = Files.createTempDirectory("graft-dstream-ts2-out-").toString
    val ckpt2 = Files.createTempDirectory("graft-dstream-ts2-ck-").toString
    val future = (System.currentTimeMillis() + 3600 * 1000L).toString
    assert(drain("graft-delta", root, out2, ckpt2,
      Map("startingTimestamp" -> future)) == 0L)
    // both options together refuse
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain("graft-delta", root,
        Files.createTempDirectory("graft-dstream-ts3-out-").toString,
        Files.createTempDirectory("graft-dstream-ts3-ck-").toString,
        Map("startingTimestamp" -> mid.toString, "startingVersion" -> "0"))
    }

    // Iceberg: same shape over snapshot timestamps
    val iroot = Files.createTempDirectory("graft-istream-ts-").toString
    IcebergTable.create(a, iroot)
    Thread.sleep(1500)
    val imid = System.currentTimeMillis()
    Thread.sleep(1500)
    IcebergTable.append(b, iroot)
    val iout = Files.createTempDirectory("graft-istream-ts-out-").toString
    val ickpt = Files.createTempDirectory("graft-istream-ts-ck-").toString
    assert(drain("graft-iceberg", iroot, iout, ickpt,
      Map("startingTimestamp" -> imid.toString)) == b.count())
  }
}
