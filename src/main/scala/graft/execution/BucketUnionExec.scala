package graft.execution

import org.apache.spark.{OneToOneDependency, Partition, SparkContext, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.SparkPlan

import graft.plans.BucketUnion

/**
 * Physical zip-union (reference: index/execution/BucketUnionExec.scala:52-121
 * + BucketUnionRDD): partition i of the output is the concatenation of
 * partition i of every child, via OneToOneDependencies — no shuffle, no
 * partition-list concat. `outputPartitioning` claims the first child's
 * partitioning, which is what lets EnsureRequirements skip the exchange
 * for a join on the bucket keys.
 */
final case class BucketUnionExec(
    override val children: Seq[SparkPlan],
    bucketColumns: Seq[String],
    numBuckets: Int) extends SparkPlan {

  override def output: Seq[Attribute] = children.head.output

  override def outputPartitioning: Partitioning = children.head.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val rdds = children.map(_.execute())
    val counts = rdds.map(_.getNumPartitions).distinct
    require(counts.size == 1,
      s"BucketUnion children must have identical partition counts, got $counts " +
        "(is spark.sql.sources.bucketing.enabled on and autoBucketedScan off?)")
    new BucketUnionRDD(sparkContext, rdds)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): BucketUnionExec =
    copy(children = newChildren)
}

private final class BucketUnionPartition(
    val index: Int,
    @transient rdds: Seq[RDD[InternalRow]]) extends Partition {
  val parents: Array[Partition] = rdds.map(_.partitions(index)).toArray
}

/** Zip-union RDD: narrow (OneToOne) dependency on every parent. */
private final class BucketUnionRDD(
    sc: SparkContext,
    rdds: Seq[RDD[InternalRow]])
  extends RDD[InternalRow](sc, rdds.map(new OneToOneDependency(_))) {

  override def getPartitions: Array[Partition] =
    Array.tabulate(rdds.head.getNumPartitions)(i => new BucketUnionPartition(i, rdds))

  override def compute(split: Partition, context: TaskContext): Iterator[InternalRow] = {
    val p = split.asInstanceOf[BucketUnionPartition]
    rdds.iterator.zip(p.parents.iterator).flatMap {
      case (rdd, parent) => rdd.iterator(parent, context)
    }
  }
}

/** Plans [[BucketUnion]] (reference: index/execution/BucketUnionStrategy
  * .scala:28-36); injected via the session extension. */
final class BucketUnionStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case b: BucketUnion =>
      BucketUnionExec(b.children.map(planLater), b.bucketColumns, b.numBuckets) :: Nil
    case _ => Nil
  }
}
