package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Captures the file-based source relation(s) under a DataFrame
 * (reference: index/sources/default/DefaultFileBasedSource.scala:76-86 and
 * sources/interfaces.scala:43-163, collapsed to the parquet/orc/csv/json
 * HadoopFsRelation case — the only source kind in the offline jar set).
 */
object SourceRelation {

  /** All file-based leaves of the plan. */
  def collect(df: DataFrame): Seq[LogicalRelation] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] => l
    }

  def formatName(rel: HadoopFsRelation): String = {
    val n = rel.fileFormat.getClass.getSimpleName.toLowerCase
    n.stripSuffix("fileformat") match {
      case "" => n
      case s => s
    }
  }

  /** Capture metadata for one relation, registering files in the tracker. */
  def capture(l: LogicalRelation, tracker: FileIdTracker): RelationMeta = {
    val rel = l.relation.asInstanceOf[HadoopFsRelation]
    val statuses = rel.location.listFiles(Nil, Nil).flatMap(_.files)
    val files = statuses.map { s =>
      val id = tracker.addOrGet(s.getPath.toString, s.getLen, s.getModificationTime)
      FileMeta(s.getPath.toString, s.getLen, s.getModificationTime, id)
    }
    RelationMeta(
      rootPaths = rel.location.rootPaths.map(_.toString),
      schemaJson = rel.schema.json,
      format = formatName(rel),
      options = rel.options,
      files = files,
      signature = Signatures.ofFiles(files))
  }

  /** Capture every file-based relation under the DataFrame. Fails if the
    * plan has no file-based leaf (nothing to index). */
  def captureAll(df: DataFrame, tracker: FileIdTracker): Seq[RelationMeta] = {
    val rels = collect(df)
    require(rels.nonEmpty,
      "DataFrame has no file-based relation to index (expected a " +
        "spark.read.<format> source)")
    rels.map(capture(_, tracker))
  }
}
