package graft.index

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s.{Formats, ShortTypeHints}
import org.json4s.jackson.Serialization

import graft.index.covering.CoveringIndexDescriptor
import graft.index.dataskipping.DataSkippingIndexDescriptor
import graft.index.zorder.ZOrderIndexDescriptor

/** JSON codec for the metadata log. Polymorphic descriptors use a short
  * class-name discriminator (like the reference's Jackson `type` property,
  * index/Index.scala:31). */
object JsonCodec {
  implicit val formats: Formats = Serialization.formats(ShortTypeHints(List(
    classOf[CoveringIndexDescriptor],
    classOf[ZOrderIndexDescriptor],
    classOf[DataSkippingIndexDescriptor],
    classOf[graft.index.ivf.IvfIndexDescriptor],
    classOf[graft.index.minhash.MinHashIndexDescriptor]), "type"))

  def write(entry: IndexLogEntry): String = Serialization.write(entry)
  def read(json: String): IndexLogEntry = Serialization.read[IndexLogEntry](json)
}

/**
 * File-system-backed, optimistically-concurrent metadata log
 * (reference: index/IndexLogManager.scala:57-152).
 *
 * Layout: `<indexRoot>/_graft_log/<id>` (numbered JSON entries) plus
 * `<indexRoot>/_graft_log/latestStable`. Writes use create-no-overwrite:
 * two concurrent writers race on the same id and the loser fails — the
 * same optimistic-concurrency contract as the reference (works on any
 * Hadoop FileSystem with atomic create semantics).
 */
final class IndexLogManager(indexRoot: Path, hadoopConf: Configuration) {
  private val logDir = new Path(indexRoot, "_graft_log")
  private def fs: FileSystem = logDir.getFileSystem(hadoopConf)

  private def idPath(id: Long) = new Path(logDir, id.toString)
  private val latestStablePath = new Path(logDir, "latestStable")

  /** Per-writer staging file for entry `id`: the name must carry the
    * writer's nonce so a stalled original writer and a reclaimer never
    * share a staging path (a shared `$id.tmp` lets the loser's abort
    * delete — or its late write truncate — the winner's in-flight
    * entry). LogConcurrencySpec pins the isolation. */
  private[index] def stagedTmp(id: Long, nonce: String): java.nio.file.Path =
    java.nio.file.Paths.get(new Path(logDir, s"$id.$nonce.tmp").toUri.getPath)

  private def readPath(p: Path): Option[IndexLogEntry] = {
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    try {
      val reader = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val sb = new StringBuilder
      var line = reader.readLine()
      while (line != null) { sb.append(line).append('\n'); line = reader.readLine() }
      Some(JsonCodec.read(sb.toString))
    } finally in.close()
  }

  def getLog(id: Long): Option[IndexLogEntry] = readPath(idPath(id))

  def getLatestId: Option[Long] = {
    if (!fs.exists(logDir)) return None
    val ids = fs.listStatus(logDir).toSeq
      .map(_.getPath.getName)
      .filter(_.forall(_.isDigit))
      .map(_.toLong)
    if (ids.isEmpty) None else Some(ids.max)
  }

  def getLatestLog: Option[IndexLogEntry] = getLatestId.flatMap(getLog)

  def getLatestStableLog: Option[IndexLogEntry] = {
    val fromMarker = readPath(latestStablePath)
      .filter(e => IndexState.stable.contains(e.state))
    fromMarker.orElse {
      // fall back to scanning backwards (marker write is best-effort)
      getLatestId.flatMap { latest =>
        (latest to 0L by -1).iterator
          .flatMap(getLog(_))
          .find(e => IndexState.stable.contains(e.state))
      }
    }
  }

  /** Create-if-absent write; returns false if the id already exists
    * (optimistic concurrency loser).
    *
    * On HDFS-like filesystems `create(overwrite=false)` is atomic
    * server-side and is the whole story. On the LOCAL filesystem it is
    * check-then-act inside ChecksumFileSystem — concurrent writers can
    * all "win" — so the id is claimed first with an O_EXCL
    * `Files.createFile` on a `<id>.claim` marker, then the entry is
    * written to `<id>.tmp` and renamed into place (readers only ever see
    * complete digit-named files; getLatestId ignores suffixed names). */
  def writeLog(id: Long, entry: IndexLogEntry): Boolean = {
    if (fs.exists(idPath(id))) return false
    val isLocal = Option(fs.getUri.getScheme).contains("file")
    try {
      if (isLocal) {
        fs.mkdirs(logDir)
        val claim = java.nio.file.Paths.get(
          new Path(logDir, s"$id.claim").toUri.getPath)
        // per-writer nonce written INTO the claim ATOMICALLY with its
        // creation (CREATE_NEW: open(O_EXCL)+write in one call, no
        // separate write a stalled writer could replay later over a
        // reclaimer's nonce): the final rename is fenced on still owning
        // the claim, so a writer paused past the staleness window
        // (GC/NFS stall) that got reclaimed aborts instead of silently
        // replacing the reclaimer's entry
        val nonce = java.util.UUID.randomUUID().toString
        val nonceBytes = nonce.getBytes(StandardCharsets.UTF_8)
        def ownsClaim: Boolean =
          try new String(java.nio.file.Files.readAllBytes(claim),
            StandardCharsets.UTF_8) == nonce
          catch { case _: java.io.IOException => false }
        def claimWithNonce(): Boolean =
          try {
            java.nio.file.Files.write(claim, nonceBytes,
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            true
          } catch { case _: java.nio.file.FileAlreadyExistsException => false }
        if (!claimWithNonce()) {
          // A crashed writer (claimed, never renamed) must not wedge the
          // id forever: reclaim claims older than the staleness window
          // when no final entry exists. In-flight writers finish in
          // milliseconds; one paused longer loses the nonce fence above.
          val staleMs = 60000L
          val age =
            try System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(claim).toMillis
            catch { case _: java.io.IOException => 0L }
          if (fs.exists(idPath(id)) || age < staleMs) return false
          // retire the stale claim by ATOMIC RENAME, never delete:
          // delete+recreate would let a second reclaimer delete the
          // first one's FRESH claim and both would "win". Rename can
          // succeed for exactly one contender; everyone then races on
          // a create-no-overwrite with single-owner semantics.
          val retired = claim.resolveSibling(
            s"$id.claim.stale${System.nanoTime()}")
          try java.nio.file.Files.move(claim, retired)
          catch { case _: java.nio.file.NoSuchFileException => () }
          if (!claimWithNonce()) return false
        }
        try {
          // pure-nio tmp write: going through ChecksumFileSystem here would
          // strand a stale .crc for the tmp name after the rename. The tmp
          // name carries OUR nonce: a stalled original writer and a
          // reclaimer each stage to their own file, so neither can truncate
          // the other's in-flight entry or delete it in an abort path.
          val tmp = stagedTmp(id, nonce)
          java.nio.file.Files.write(tmp,
            JsonCodec.write(entry.copy(id = id)).getBytes(StandardCharsets.UTF_8))
          // fence: if the claim no longer carries our nonce we were
          // reclaimed mid-write — abort, the id belongs to someone else
          if (!ownsClaim) {
            java.nio.file.Files.deleteIfExists(tmp)
            return false
          }
          val dest = java.nio.file.Paths.get(idPath(id).toUri.getPath)
          try {
            // commit by hard-link: atomic AND fails if the final file
            // already exists, unlike rename (which silently replaces and
            // left a check→move window where a reclaimed writer waking
            // after the ownsClaim check could overwrite the reclaimer's
            // committed entry)
            java.nio.file.Files.createLink(dest, tmp)
            java.nio.file.Files.deleteIfExists(tmp)
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              java.nio.file.Files.deleteIfExists(tmp)
              return false
            case _: UnsupportedOperationException =>
              // no-hardlink FS: fall back to the fenced atomic rename
              if (!ownsClaim) {
                java.nio.file.Files.deleteIfExists(tmp)
                return false
              }
              java.nio.file.Files.move(tmp, dest,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
        } catch {
          case NonFatal(e) =>
            // failure BEFORE the final file exists: release the claim so a
            // retry (or cancel()) can write this id — but only if it is
            // still OURS (a reclaimer may own it now)
            if (ownsClaim) java.nio.file.Files.deleteIfExists(claim)
            throw e
        }
        // success: the claim stays as a tombstone — deleting it would
        // reopen the gate for a writer that passed the fs.exists precheck
        // before our move, and ATOMIC_MOVE silently replaces files
        writeStableMarker(id, entry)
        return true
      }
      val out = fs.create(idPath(id), /*overwrite=*/ false)
      try out.write(JsonCodec.write(entry.copy(id = id)).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      writeStableMarker(id, entry)
      true
    } catch {
      case NonFatal(_) => false
    }
  }

  /** Refresh the latestStable marker (best-effort, non-atomic is fine:
    * readers fall back to a backwards scan). */
  private def writeStableMarker(id: Long, entry: IndexLogEntry): Unit =
    if (IndexState.stable.contains(entry.state)) {
      try {
        val tmp = new Path(logDir, s".latestStable.tmp${System.nanoTime()}")
        val o = fs.create(tmp, true)
        try o.write(JsonCodec.write(entry.copy(id = id)).getBytes(StandardCharsets.UTF_8))
        finally o.close()
        fs.delete(latestStablePath, false)
        fs.rename(tmp, latestStablePath)
      } catch { case NonFatal(_) => () }
    }
}
