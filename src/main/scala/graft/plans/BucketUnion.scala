package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Bucket-compatible union (reference:
 * index/plans/logical/BucketUnion.scala:31-68): children are partitioned
 * identically (same hash expressions, same partition count), so the union
 * can zip same-numbered partitions instead of concatenating partition
 * lists — preserving the partitioning for downstream joins/aggregations.
 *
 * Used by hybrid scan on the join path: the bucketed index leg keeps its
 * HashPartitioning, the appended-files leg is repartitioned to match, and
 * this node lets the merge-join above consume both without a full
 * re-shuffle of the indexed data.
 */
final case class BucketUnion(
    override val children: Seq[LogicalPlan],
    bucketColumns: Seq[String],
    numBuckets: Int) extends LogicalPlan {

  require(children.nonEmpty)

  override def output: Seq[Attribute] = children.head.output
  override def maxRows: Option[Long] =
    if (children.forall(_.maxRows.isDefined)) Some(children.flatMap(_.maxRows).sum)
    else None

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[LogicalPlan]): BucketUnion =
    copy(children = newChildren)
}
