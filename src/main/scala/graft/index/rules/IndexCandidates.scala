package graft.index.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation, PartitioningAwareFileIndex}

import graft.index.{FileMeta, IndexLogEntry, Signatures}

/**
 * Per-source-leaf candidate collection (reference:
 * index/rules/CandidateIndexCollector.scala:28-59 — ColumnSchemaFilter +
 * FileSignatureFilter, exact-match variant; hybrid-scan overlap matching
 * is layered on later).
 */
object IndexCandidates {

  /** Marker option set on relations we created — never re-index those. */
  val IndexRelationMarker = "graft.indexrelation"

  def isIndexRelation(l: LogicalRelation): Boolean = l.relation match {
    case h: HadoopFsRelation => h.options.contains(IndexRelationMarker)
    case _ => false
  }

  def fileBasedLeaves(plan: LogicalPlan): Seq[LogicalRelation] =
    plan.collectLeaves().collect {
      case l: LogicalRelation
          if l.relation.isInstanceOf[HadoopFsRelation] && !isIndexRelation(l) => l
    }

  def currentFiles(rel: HadoopFsRelation): Seq[FileMeta] = rel.location match {
    case p: PartitioningAwareFileIndex =>
      p.allFiles().map(s => FileMeta(s.getPath.toString, s.getLen,
        s.getModificationTime, -1L))
    case other =>
      other.listFiles(Nil, Nil).flatMap(_.files).map(s =>
        FileMeta(s.getPath.toString, s.getLen, s.getModificationTime, -1L))
  }

  /** Signature of the files a relation currently reads (same construction
    * as capture time, so unchanged sources match exactly). */
  def signatureOf(rel: HadoopFsRelation): String =
    Signatures.ofFiles(currentFiles(rel))

  /**
   * Map each file-based leaf to the ACTIVE indexes applicable to it:
   * the index's referenced columns resolve against the leaf's output
   * (schema filter) and the captured source signature matches the leaf's
   * current file set (signature filter).
   */
  def collect(
      spark: SparkSession,
      plan: LogicalPlan,
      indexes: Seq[IndexLogEntry]): Map[LogicalRelation, Seq[IndexLogEntry]] = {
    val resolver = spark.sessionState.conf.resolver
    fileBasedLeaves(plan).flatMap { leaf =>
      val rel = leaf.relation.asInstanceOf[HadoopFsRelation]
      lazy val sig = signatureOf(rel)
      val applicable = indexes.filter { e =>
        e.relations.size == 1 &&
          e.descriptor.referencedColumns.forall(c =>
            leaf.output.exists(a => resolver(a.name, c))) &&
          e.signature == sig
      }
      if (applicable.isEmpty) None else Some(leaf -> applicable)
    }.toMap
  }
}
