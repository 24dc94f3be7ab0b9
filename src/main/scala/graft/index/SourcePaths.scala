package graft.index

import org.apache.hadoop.fs.Path

/**
 * Groups a logged relation's files under the logged root that contains
 * them (reference behavior: refresh/hybrid-scan read appended files with
 * the enclosing root as `basePath` so directory-encoded partition VALUES
 * survive — index/sources/default/FileBasedRelation.scala).
 *
 * Matching compares scheme-stripped URI paths, not `Path` equality while
 * walking parents: Spark's file listing yields scheme-qualified paths
 * (`file:/...`) while logged rootPaths may be unqualified (`/...`), and a
 * raw `Path` comparison would never match — silently mis-assigning every
 * file to `roots.head`, which for a multi-root source picks the wrong
 * basePath and recovers wrong partition values. No-root-matches is a
 * metadata corruption, so it throws instead of defaulting.
 */
object SourcePaths {

  /** Scheme/authority-stripped, trailing-slash-free path string. */
  private def norm(p: Path): String = {
    val u = p.toUri
    val raw = Option(u.getPath).filter(_.nonEmpty).getOrElse(p.toString)
    if (raw.length > 1) raw.stripSuffix("/") else raw
  }

  /** Map each file to the (original, un-normalized) root string that
    * contains it, preserving deterministic group order. */
  def groupByRoot(roots: Seq[String], files: Seq[String]): Seq[(String, Seq[String])] = {
    val normRoots = roots.map(r => r -> norm(new Path(r)))
    files.groupBy { f =>
      val nf = norm(new Path(f))
      normRoots.collectFirst {
        case (orig, nr) if nf == nr || nf.startsWith(nr + "/") => orig
      }.getOrElse(throw new IllegalStateException(
        s"file $f is not under any logged source root " +
          s"[${roots.mkString(", ")}] — index metadata is inconsistent " +
          "with the source; run refreshIndex(mode=full)"))
    }.toSeq.sortBy(_._1)
  }
}
