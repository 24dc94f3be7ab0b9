package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable}

/**
 * Iceberg snapshot refs — branches and tags — and the WRITE-AUDIT-
 * PUBLISH cycle modern pipelines run on them: write to a branch (main
 * untouched), audit the branch by ref, fast-forward main to the
 * audited head; non-ancestor fast-forwards refuse, tags are immutable
 * bookmarks, and expiration never drops a ref-pinned snapshot.
 * Beyond the reference (it consumes Iceberg through the connector
 * jar); semantics follow the Iceberg spec's `refs` metadata and the
 * `fast_forward` procedure.
 */
class IcebergRefsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("write-audit-publish: branch write leaves main untouched, " +
      "fastForward publishes the audited snapshot") {
    val loc = tmp("graft-ice-wap-")
    val base = customer.filter($"c_custkey" <= 100)
    val audit = customer.filter($"c_custkey" > 100 && $"c_custkey" <= 120)
    IcebergTable.create(base, loc)                                // snap 1

    // WRITE: append lands on the branch (auto-created at main's head)
    IcebergTable.append(audit, loc, branch = Some("audit"))       // snap 2
    val snap = IcebergMeta.snapshot(spark, loc)
    assert(snap.snapshotId == 1L, "branch write moved main")
    assert(snap.refs.get("audit").map(_.snapshotId).contains(2L))
    assert(IcebergTable.read(spark, loc).count() == base.count(),
      "main read sees unpublished branch rows")

    // AUDIT: the branch serves base + staged rows by ref name
    val staged = IcebergTable.readRef(spark, loc, "audit")
    assert(staged.count() == base.count() + audit.count())

    // a second branch write stacks on the BRANCH head
    IcebergTable.append(
      customer.filter($"c_custkey" > 120 && $"c_custkey" <= 125),
      loc, branch = Some("audit"))                                // snap 3
    assert(IcebergTable.readRef(spark, loc, "audit").count() ==
      base.count() + audit.count() + 5)
    assert(IcebergMeta.snapshot(spark, loc).snapshotId == 1L)

    // PUBLISH: main fast-forwards to the audited head
    val published = IcebergTable.fastForward(spark, loc, "audit")
    assert(published == 3L)
    val after = IcebergMeta.snapshot(spark, loc)
    assert(after.snapshotId == 3L)
    assert(IcebergTable.read(spark, loc).count() ==
      base.count() + audit.count() + 5)
    // idempotent: a second fast-forward is a no-op
    assert(IcebergTable.fastForward(spark, loc, "audit") == 3L)
  }

  test("non-ancestor fastForward refuses (diverged branch)") {
    val loc = tmp("graft-ice-wap-div-")
    IcebergTable.create(customer.filter($"c_custkey" <= 50), loc)  // snap 1
    IcebergTable.append(customer.filter($"c_custkey" === 51), loc,
      branch = Some("wip"))                                        // snap 2
    // main advances independently → the branch no longer contains main
    IcebergTable.append(customer.filter($"c_custkey" === 52), loc) // snap 3
    val e = intercept[IllegalArgumentException] {
      IcebergTable.fastForward(spark, loc, "wip")
    }
    assert(e.getMessage.contains("not an ancestor"))
    // main unchanged by the refusal
    assert(IcebergMeta.snapshot(spark, loc).snapshotId == 3L)
  }

  test("tags are immutable bookmarks: time travel works, writes refuse") {
    val loc = tmp("graft-ice-tag-")
    val base = customer.filter($"c_custkey" <= 40)
    IcebergTable.create(base, loc)                                 // snap 1
    IcebergTable.createRef(spark, loc, "v1.0", refType = "tag")
    IcebergTable.append(customer.filter($"c_custkey" === 41), loc) // snap 2

    assert(IcebergTable.readRef(spark, loc, "v1.0").count() == base.count())
    assert(IcebergTable.read(spark, loc).count() == base.count() + 1)

    val e1 = intercept[Exception] {
      IcebergTable.append(customer.limit(1), loc, branch = Some("v1.0"))
    }
    assert(e1.getMessage.contains("tag"))
    val e2 = intercept[Exception] {
      IcebergTable.createRef(spark, loc, "v1.0", refType = "tag", at = Some(2L))
    }
    assert(e2.getMessage.contains("cannot be repointed"))
    val e3 = intercept[Exception] {
      IcebergTable.fastForward(spark, loc, "v1.0")
    }
    assert(e3.getMessage.contains("tag"))
  }

  test("createRef pins historic snapshots; dropRef removes; expiration " +
      "retains ref-pinned snapshots") {
    val loc = tmp("graft-ice-refkeep-")
    val base = customer.filter($"c_custkey" <= 30)
    IcebergTable.create(base, loc)                                 // snap 1
    IcebergTable.append(customer.filter($"c_custkey" === 31), loc) // snap 2
    IcebergTable.append(customer.filter($"c_custkey" === 32), loc) // snap 3
    IcebergTable.createRef(spark, loc, "keep", refType = "tag", at = Some(1L))

    // expire everything but the head — the tagged snapshot must survive
    val removed = IcebergTable.expireSnapshots(spark, loc, keepLast = 1)
    assert(IcebergTable.readRef(spark, loc, "keep").count() == base.count(),
      "expiration dropped a tag-pinned snapshot")
    // snap 2 was neither head nor pinned: it expired
    val e = intercept[IllegalArgumentException] {
      IcebergTable.read(spark, loc, snapshotAsOf = Some(2L)).count()
    }
    assert(e.getMessage.contains("expired") || removed.nonEmpty)

    IcebergTable.dropRef(spark, loc, "keep")
    assert(IcebergMeta.snapshot(spark, loc).refs.isEmpty)
    val e2 = intercept[IllegalArgumentException] {
      IcebergTable.readRef(spark, loc, "keep")
    }
    assert(e2.getMessage.contains("no such ref"))
    // unknown drop is a no-op
    IcebergTable.dropRef(spark, loc, "never-existed")
  }

  test("a mid-chain TAG pin never breaks a branch's publish ancestry " +
      "through expiration") {
    val loc = tmp("graft-ice-tagchain-")
    IcebergTable.create(customer.filter($"c_custkey" <= 20), loc)  // snap 1
    // branch stacks three unpublished commits: 2 -> 3 -> 4
    IcebergTable.append(customer.filter($"c_custkey" === 21), loc,
      branch = Some("audit"))                                      // snap 2
    IcebergTable.append(customer.filter($"c_custkey" === 22), loc,
      branch = Some("audit"))                                      // snap 3
    IcebergTable.append(customer.filter($"c_custkey" === 23), loc,
      branch = Some("audit"))                                      // snap 4
    // a tag pins the MIDDLE of the branch chain: the retention walk
    // must keep snapshot 2 anyway (stopping at the tag would expire
    // it and make the cleanly-stacked branch look unverifiable)
    IcebergTable.createRef(spark, loc, "mid", refType = "tag", at = Some(3L))
    IcebergTable.expireSnapshots(spark, loc, keepLast = 1)
    val published = IcebergTable.fastForward(spark, loc, "audit")
    assert(published == 4L,
      s"fastForward failed after tag-pinned expiration: $published")
    assert(IcebergTable.read(spark, loc).count() ==
      customer.filter($"c_custkey" <= 23).count())
  }

  test("expiration retains an unpublished branch's ancestor chain so " +
      "fastForward still verifies and publishes") {
    val loc = tmp("graft-ice-refanc-")
    val base = customer.filter($"c_custkey" <= 60)
    IcebergTable.create(base, loc)                                 // snap 1
    IcebergTable.append(customer.filter($"c_custkey" === 61), loc,
      branch = Some("stage"))                                      // snap 2
    IcebergTable.append(customer.filter($"c_custkey" === 62), loc,
      branch = Some("stage"))                                      // snap 3
    // keepLast=1 would expire snap 2 (neither head nor pinned) — but it
    // sits on the stage branch's parent chain between its head and main,
    // so fastForward ancestry would become unverifiable without it
    IcebergTable.expireSnapshots(spark, loc, keepLast = 1)
    assert(IcebergTable.read(spark, loc, snapshotAsOf = Some(2L))
      .count() == base.count() + 1,
      "expiration dropped branch-intermediate snapshot 2")
    assert(IcebergTable.fastForward(spark, loc, "stage") == 3L)
    assert(IcebergTable.read(spark, loc).count() == base.count() + 2)
  }

  test("fastForward distinguishes an expired-gap chain from divergence") {
    val loc = tmp("graft-ice-refgap-")
    IcebergTable.create(customer.filter($"c_custkey" <= 10), loc)  // snap 1
    IcebergTable.append(customer.filter($"c_custkey" === 11), loc,
      branch = Some("b"))                                          // snap 2
    IcebergTable.append(customer.filter($"c_custkey" === 12), loc,
      branch = Some("b"))                                          // snap 3
    // forcibly remove snapshot 2 from metadata (what a pre-fix or
    // foreign writer's expiration could have done)
    import org.apache.hadoop.fs.Path
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    val mf = fs.listStatus(new Path(loc, "metadata")).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json")).maxBy(_.getName)
    val j = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(mf.toUri)), "UTF-8"))
    val pruned = j.transformField {
      case ("snapshots", JArray(snaps)) => ("snapshots", JArray(
        snaps.filterNot(s => (s \ "snapshot-id") == JInt(2) ||
          (s \ "snapshot-id") == JLong(2L))))
    }
    val out = fs.create(mf, true)
    try out.write(JsonMethods.pretty(JsonMethods.render(pruned))
      .getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalArgumentException] {
      IcebergTable.fastForward(spark, loc, "b")
    }
    assert(e.getMessage.contains("unverifiable"), e.getMessage)
    assert(e.getMessage.contains("expired"), e.getMessage)
  }

  test("branch survives unrelated main commits and carries across them") {
    val loc = tmp("graft-ice-refcarry-")
    val base = customer.filter($"c_custkey" <= 20)
    IcebergTable.create(base, loc)                                 // snap 1
    IcebergTable.createRef(spark, loc, "b1")                       // at 1
    IcebergTable.append(customer.filter($"c_custkey" === 21), loc) // snap 2
    val snap = IcebergMeta.snapshot(spark, loc)
    assert(snap.refs.get("b1").map(_.snapshotId).contains(1L),
      "a main commit moved or dropped an unrelated branch ref")
    assert(IcebergTable.readRef(spark, loc, "b1").count() == base.count())
  }

  test("CREATE OR REPLACE moves a tag; plain create refuses; retention " +
      "fields round-trip and survive branch repoints") {
    val loc = tmp("graft-ice-replace-")
    IcebergTable.create(customer.filter($"c_custkey" <= 20), loc)   // snap 1
    IcebergTable.append(customer.filter($"c_custkey" === 21), loc)  // snap 2
    IcebergTable.createRef(spark, loc, "t", "tag", at = Some(1L))
    // plain create on an existing tag refuses (immutable)
    val e = intercept[IllegalArgumentException](
      IcebergTable.createRef(spark, loc, "t", "tag", at = Some(2L)))
    assert(e.getMessage.contains("OR REPLACE"), e.getMessage)
    // OR REPLACE moves it deliberately
    IcebergTable.createRef(spark, loc, "t", "tag", at = Some(2L),
      orReplace = true)
    assert(IcebergMeta.snapshot(spark, loc).refs("t").snapshotId == 2L)

    // retention fields persist in the metadata and round-trip the parse
    IcebergTable.createRef(spark, loc, "b", "branch",
      maxRefAgeMs = Some(7L * 24 * 3600 * 1000),
      minSnapshotsToKeep = Some(2),
      maxSnapshotAgeMs = Some(3L * 24 * 3600 * 1000))
    val r = IcebergMeta.snapshot(spark, loc).refs("b")
    assert(r.maxRefAgeMs.contains(7L * 24 * 3600 * 1000))
    assert(r.minSnapshotsToKeep.contains(2))
    assert(r.maxSnapshotAgeMs.contains(3L * 24 * 3600 * 1000))
    // a branch WRITE repoints the pin but keeps the declared retention
    IcebergTable.append(customer.filter($"c_custkey" === 22), loc,
      branch = Some("b"))
    val r2 = IcebergMeta.snapshot(spark, loc).refs("b")
    assert(r2.snapshotId == 3L && r2.minSnapshotsToKeep.contains(2),
      s"branch repoint dropped retention: $r2")
    // OR REPLACE without retention clears the old clauses (no stale keys)
    IcebergTable.createRef(spark, loc, "b", "branch", at = Some(2L),
      orReplace = true)
    val r3 = IcebergMeta.snapshot(spark, loc).refs("b")
    assert(r3.maxRefAgeMs.isEmpty && r3.minSnapshotsToKeep.isEmpty &&
      r3.maxSnapshotAgeMs.isEmpty, s"stale retention survived replace: $r3")
    // tags refuse snapshot-retention clauses
    val bad = intercept[IllegalArgumentException](
      IcebergTable.createRef(spark, loc, "t2", "tag",
        minSnapshotsToKeep = Some(1)))
    assert(bad.getMessage.contains("branches"), bad.getMessage)
  }

  test("expireSnapshots enforces RETAIN (ref ages out) and WITH " +
      "SNAPSHOT RETENTION (bounded branch chain)") {
    val loc = tmp("graft-ice-retain-")
    IcebergTable.create(customer.filter($"c_custkey" <= 20), loc)   // snap 1
    IcebergTable.append(customer.filter($"c_custkey" === 21), loc)  // snap 2
    // a tag whose RETAIN window has already passed (1 ms)
    IcebergTable.createRef(spark, loc, "stale", "tag", at = Some(1L),
      maxRefAgeMs = Some(1L))
    // a tag with a long window survives
    IcebergTable.createRef(spark, loc, "fresh", "tag", at = Some(1L),
      maxRefAgeMs = Some(365L * 24 * 3600 * 1000))
    Thread.sleep(10)
    IcebergTable.expireSnapshots(spark, loc, keepLast = 1)
    val refs = IcebergMeta.snapshot(spark, loc).refs
    assert(!refs.contains("stale"), "aged-out ref must leave the metadata")
    assert(refs.contains("fresh"))
    // snap 1 stays: 'fresh' still pins it
    IcebergTable.read(spark, loc, snapshotAsOf = Some(1L)).count()

    // bounded branch chain: stack three branch commits, keep only the
    // newest TWO of the branch's chain (head + 1 ancestor)
    val loc2 = tmp("graft-ice-retain2-")
    IcebergTable.create(customer.filter($"c_custkey" <= 20), loc2)  // 1
    IcebergTable.append(customer.filter($"c_custkey" === 21), loc2,
      branch = Some("dev"))                                         // 2
    IcebergTable.append(customer.filter($"c_custkey" === 22), loc2,
      branch = Some("dev"))                                         // 3
    IcebergTable.append(customer.filter($"c_custkey" === 23), loc2,
      branch = Some("dev"))                                         // 4
    // declare retention on the existing branch (replace keeps the pin)
    IcebergTable.createRef(spark, loc2, "dev", "branch", at = Some(4L),
      orReplace = true, minSnapshotsToKeep = Some(2))
    IcebergTable.expireSnapshots(spark, loc2, keepLast = 1)
    // head (4) + one ancestor (3) retained; 2 expired; main (1) stays
    IcebergTable.read(spark, loc2, snapshotAsOf = Some(4L)).count()
    IcebergTable.read(spark, loc2, snapshotAsOf = Some(3L)).count()
    intercept[Exception](
      IcebergTable.read(spark, loc2, snapshotAsOf = Some(2L)).collect())
    assert(IcebergTable.read(spark, loc2).count() ==
      customer.filter($"c_custkey" <= 20).count()) // main intact
  }
}
