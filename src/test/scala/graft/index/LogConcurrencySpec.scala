package graft.index

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.covering.CoveringIndexDescriptor

/** Optimistic-concurrency contract of the metadata log (reference:
  * actions/Action.scala:77-82 + IndexLogManager create-if-absent):
  * concurrent writers racing on the same id — exactly one wins. */
class LogConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark // force session init for hadoop conf

  private def entry(id: Long): IndexLogEntry =
    IndexLogEntry("race", CoveringIndexDescriptor(
      Seq("k"), Nil, 4, "{}", hasLineage = false),
      ContentMeta("/tmp/none", Nil), Nil, IndexState.Creating, id, id)

  test("create-if-absent: exactly one of N racing writers wins per id") {
    val root = new Path(Files.createTempDirectory("graft-log-race-").toString)
    val log = new IndexLogManager(root, spark.sessionState.newHadoopConf())
    val n = 16
    val pool = Executors.newFixedThreadPool(n)
    (0L until 5L).foreach { id =>
      val start = new CountDownLatch(1)
      val results = (0 until n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = {
            start.await()
            log.writeLog(id, entry(id))
          }
        })
      }
      start.countDown()
      val wins = results.map(_.get(30, TimeUnit.SECONDS)).count(identity)
      assert(wins == 1, s"id $id: expected exactly one winner, got $wins")
      // the losers did not corrupt the entry
      assert(log.getLog(id).exists(_.name == "race"))
    }
    pool.shutdown()
  }

  test("sequential ids append; stale id is rejected") {
    val root = new Path(Files.createTempDirectory("graft-log-seq-").toString)
    val log = new IndexLogManager(root, spark.sessionState.newHadoopConf())
    assert(log.writeLog(0, entry(0)))
    assert(log.writeLog(1, entry(1).copy(state = IndexState.Active)))
    assert(!log.writeLog(1, entry(1)), "existing id must be rejected")
    assert(log.getLatestId.contains(1L))
    assert(log.getLatestStableLog.exists(_.state == IndexState.Active))
  }

  test("staged tmp files are per-writer: a loser's abort cannot touch the winner's") {
    // the shared-name regression ($id.tmp without the nonce) let a
    // stalled original writer's abort path delete — or its late write
    // truncate — a reclaimer's in-flight entry
    val root = new Path(Files.createTempDirectory("graft-log-tmp-").toString)
    val log = new IndexLogManager(root, spark.sessionState.newHadoopConf())
    val (nonceA, nonceB) = ("writer-a-nonce", "writer-b-nonce")
    val tmpA = log.stagedTmp(7L, nonceA)
    val tmpB = log.stagedTmp(7L, nonceB)
    assert(tmpA != tmpB,
      "two writers of the same id share a staging path — the reclaim race is back")
    // the loser aborting (deleting ITS tmp) must leave the winner's
    // in-flight bytes intact
    java.nio.file.Files.createDirectories(tmpB.getParent)
    java.nio.file.Files.write(tmpB, "winner-in-flight".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(tmpA) // loser's abort path
    assert(new String(java.nio.file.Files.readAllBytes(tmpB), "UTF-8")
      == "winner-in-flight")
  }

  test("log entries written before UpdateMeta existed still parse") {
    // forward-compat of the codec: the quick-refresh delta field is
    // optional with a None default — a pre-existing JSON document without
    // it must round-trip
    val noField = JsonCodec.write(entry(0))
      .replaceAll(""","update":[^,}]+""", "")
    assert(!noField.contains("\"update\""))
    val parsed = JsonCodec.read(noField)
    assert(parsed.update.isEmpty)
    // and a populated delta round-trips intact
    val withDelta = entry(1).copy(update = Some(UpdateMeta(
      Seq(FileMeta("/a", 1, 2, 3)), Seq(FileMeta("/b", 4, 5, 6)))))
    val rt = JsonCodec.read(JsonCodec.write(withDelta))
    assert(rt.update == withDelta.update)
  }
}
