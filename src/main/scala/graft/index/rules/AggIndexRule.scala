package graft.index.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.index.covering.CoveringIndexDescriptor

/**
 * Beyond-reference rule: rewrites `Aggregate(groupBy keys, _, scan)` to a
 * BUCKETED covering-index scan when the index's bucket columns are a
 * subset of the grouping keys — `HashPartitioning(indexedCols, n)` then
 * satisfies the aggregation's ClusteredDistribution, so the whole
 * aggregation runs map-side with NO shuffle exchange.
 *
 * At 100 TB this turns the dominant cost of `groupBy` on a key the index
 * is bucketed on (a full-data shuffle) into a local per-bucket hash
 * aggregation.
 */
object AggIndexRule extends GraftIndexRule {

  /** Between z-order filter (60) and join (140): a whole-shuffle win. */
  val Score = 80

  override def apply(
      spark: SparkSession,
      plan: LogicalPlan,
      candidates: Map[LogicalPlan, Seq[CandidateMatch]],
      recurse: LogicalPlan => (LogicalPlan, Int)): Option[(LogicalPlan, Int)] = {
    val agg = plan match {
      case a: Aggregate => a
      case _ => return None
    }
    // grouping keys must be plain attributes
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None

    val rel = linearRelation(agg.child).getOrElse(return None)
    if (!candidates.contains(rel)) return None

    val resolver = spark.sessionState.conf.resolver
    val needed: Seq[String] =
      (agg.references ++ childReferences(agg.child)).toSeq.map(_.name).distinct

    val applicable = candidates(rel).filter { m =>
      m.isExact && (m.entry.descriptor match {
        case d: CoveringIndexDescriptor =>
          // bucket columns ⊆ grouping keys ⇒ partitioning satisfies the
          // aggregation's required distribution
          d.indexedColumns.forall(ic =>
            groupAttrs.exists(g => resolver(g.name, ic))) &&
            Coverage.covers(d.referencedColumns, needed, resolver)
        case _ => false
      })
    }
    if (applicable.isEmpty) return None

    val best = applicable.minBy(_.entry.indexDataSize).entry
    val newScan = ScanSubstitution.indexScan(spark, rel, best, useBucketSpec = true)
    val newChild = agg.child.transformUp {
      case r: LogicalRelation if r.fastEquals(rel) => newScan
    }
    Some((agg.copy(child = newChild), Score))
  }

  private def linearRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case r: LogicalRelation => Some(r)
      case p: Project => linearRelation(p.child)
      case f: Filter if f.condition.deterministic => linearRelation(f.child)
      case _ => None
    }

  private def childReferences(plan: LogicalPlan): AttributeSet =
    plan.collect { case p => p.references }.foldLeft(AttributeSet.empty)(_ ++ _)
}
