package graft.index

import org.apache.hadoop.fs.{FileStatus, Path}

/**
 * Metadata model for the index subsystem (re-derived from the reference's
 * IndexLogEntry.scala — see SURVEY.md §1.3; reference:
 * src/main/scala/com/microsoft/hyperspace/index/IndexLogEntry.scala:308-590).
 *
 * Simplifications vs the reference:
 *  - flat file lists instead of a recursive Directory tree (same
 *    information; prefix compression can be layered into the codec later
 *    without changing this API);
 *  - a single `signature` string per relation (md5 over sorted file
 *    metadata) instead of pluggable signature providers.
 */

/** One file (source or index data): identity is (path, size, mtime). */
final case class FileMeta(path: String, size: Long, modifiedTime: Long, id: Long)

object FileMeta {
  def apply(status: FileStatus, id: Long): FileMeta =
    FileMeta(status.getPath.toString, status.getLen,
      status.getModificationTime, id)
}

/** The indexed source relation as captured at index-creation time. */
final case class RelationMeta(
    rootPaths: Seq[String],
    schemaJson: String,
    format: String,
    options: Map[String, String],
    files: Seq[FileMeta],
    signature: String)

/** Index data files of one version. After a quick optimize the list can
  * span several `v__N` dirs (untouched large files stay in place); `root`
  * is always the newest version dir. */
final case class ContentMeta(root: String, files: Seq[FileMeta]) {
  def filePaths: Seq[String] = files.map(_.path)
  def totalSize: Long = files.map(_.size).sum
}

/** Source delta captured by a quick refresh (reference:
  * IndexLogEntry.scala:351 `Update(appendedFiles, deletedFiles)` +
  * actions/RefreshQuickAction.scala:37-80): the files that drifted from
  * the indexed snapshot, acknowledged in metadata WITHOUT rebuilding index
  * data. Query-time hybrid scan applies the delta; the staleness
  * thresholds then only count drift accumulated AFTER this point. */
final case class UpdateMeta(appended: Seq[FileMeta], deleted: Seq[FileMeta])

/** Lifecycle states (reference: actions/Constants.scala:19-35). */
object IndexState {
  val Creating = "CREATING"
  val Active = "ACTIVE"
  val Deleting = "DELETING"
  val Deleted = "DELETED"
  val Refreshing = "REFRESHING"
  val Restoring = "RESTORING"
  val Optimizing = "OPTIMIZING"
  val Vacuuming = "VACUUMING"
  val DoesNotExist = "DOESNOTEXIST"
  /** States a log can rest in; everything else marks an in-flight action. */
  val stable: Set[String] = Set(Active, Deleted, DoesNotExist)
}

/**
 * One version of one index: the full metadata document persisted to the
 * log. `descriptor` is the polymorphic index definition (covering /
 * z-order / data-skipping / ...).
 */
final case class IndexLogEntry(
    name: String,
    descriptor: IndexDescriptor,
    content: ContentMeta,
    relations: Seq[RelationMeta],
    state: String,
    id: Long,
    timestamp: Long,
    properties: Map[String, String] = Map.empty,
    update: Option[UpdateMeta] = None) {

  def signature: String = relations.map(_.signature).mkString(";")
  def sourceFiles: Set[FileMeta] = relations.flatMap(_.files).toSet
  def sourceFilesSize: Long = relations.flatMap(_.files).map(_.size).sum
  def withState(s: String): IndexLogEntry = copy(state = s)
  def indexDataSize: Long = content.totalSize
}

/**
 * Assigns stable Long ids to files keyed by (path, size, mtime) — used by
 * lineage columns and delete tracking (reference: IndexLogEntry.scala:627-703).
 */
final class FileIdTracker {
  private val ids = scala.collection.mutable.HashMap.empty[(String, Long, Long), Long]
  private var maxId: Long = -1L

  def addOrGet(path: String, size: Long, mtime: Long): Long =
    ids.getOrElseUpdate((path, size, mtime), { maxId += 1; maxId })

  def addKnown(f: FileMeta): Unit = {
    ids((f.path, f.size, f.modifiedTime)) = f.id
    maxId = math.max(maxId, f.id)
  }

  def getId(path: String, size: Long, mtime: Long): Option[Long] =
    ids.get((path, size, mtime))

  def all: Map[(String, Long, Long), Long] = ids.toMap
}

object Signatures {
  /** Order-independent fingerprint of a file set: md5 over sorted
    * (path,size,mtime) triples. Two plans reading the same files get the
    * same signature regardless of listing order. */
  def ofFiles(files: Seq[FileMeta]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.map(f => s"${f.path}|${f.size}|${f.modifiedTime}")
      .sorted
      .foreach(s => md.update(s.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }
}
