package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * [[graft.index.rules.HoistSemiGate]]: a dim-keyed IN/INTERSECT gate
 * that PushDownLeftSemiAntiJoin parked on the dim scan leg must hoist
 * back above the inner join when a bucketed index pair is available —
 * the natural SQL spelling should plan like the hand-restructured one
 * (ROUNDLOG findings #6/#10).
 */
class HoistSemiGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val corpusReady: Boolean = {
    graft.queries.IndexAccel.ensureCorpus(spark, TestSpark.sfDir)
    true
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  /** The natural spelling: brand gate as a LeftSemi against the joined
    * fact — the shape Catalyst pushes onto the part leg. */
  private def naturalGate(): DataFrame = {
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    val brands = part.filter(col("p_type").startsWith("PROMO"))
      .select(col("p_brand").as("gb")).distinct()
    li.filter(year(col("l_shipdate")) === 1995)
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(brands, col("p_brand") === col("gb"), "left_semi")
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
  }

  private def planned(df: DataFrame): SparkPlan = {
    assert(corpusReady)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def withHoistOff[T](body: => T): T = {
    spark.conf.set("spark.graft.hoistSemiGate.enabled", "false")
    try body finally spark.conf.unset("spark.graft.hoistSemiGate.enabled")
  }

  test("the natural semi-gate spelling plans the bucketed fact⋈part " +
      "pair — hoisted above the join, served zero-shuffle; disabled, " +
      "the pushed-down gate un-buckets the pair") {
    val p = planned(naturalGate())
    val idxScans = allNodes(p).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
      .filter(_.contains("graft_accel"))
    // the ranker picks the narrowest partkey-bucketed li layout (liInv
    // covers this column set) — pin the PAIR property, not the name
    assert(idxScans.exists(_.contains("accel_ci_li_")) &&
      idxScans.exists(_.contains("accel_ci_part_attr")),
      s"expected the bucketed pair; served from: $idxScans\n$p")
    val zeroShuffle = allNodes(p).collect {
      case j: SortMergeJoinExec if j.children.forall(c =>
        !allNodes(c).exists(_.isInstanceOf[ShuffleExchangeExec])) => j
    }
    assert(zeroShuffle.nonEmpty, s"fact⋈part re-shuffled:\n$p")

    val off = withHoistOff(planned(naturalGate()))
    val offZero = allNodes(off).collect {
      case j: SortMergeJoinExec if j.children.forall(c =>
        !allNodes(c).exists(_.isInstanceOf[ShuffleExchangeExec])) => j
    }
    assert(offZero.isEmpty,
      s"without the hoist the pair should NOT be servable:\n$off")
  }

  test("results are identical with the hoist disabled") {
    def sorted() = naturalGate().orderBy(col("brand")).collect().toSeq
    assert(corpusReady)
    val expected = withHoistOff(sorted())
    assert(sorted() == expected && expected.nonEmpty)
  }

  test("a gate on an AGGREGATED dim leg is left where the pushdown put " +
      "it — hoisting only repairs scan pairs") {
    assert(corpusReady)
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    // dim leg = an aggregate of part (NOT a scan chain)
    val dimAgg = part.groupBy(col("p_partkey").as("pk"))
      .agg(max(col("p_brand")).as("mb"))
    val gate = part.select(col("p_brand").as("gb")).distinct()
    val q = li.join(
      dimAgg.join(gate, col("mb") === col("gb"), "left_semi"),
      col("l_partkey") === col("pk"))
    val semiUnderInner = q.queryExecution.optimizedPlan.collect {
      case j @ Join(_, Join(_, _, LeftSemi, _, _), Inner, _, _) => j
      case j @ Join(Join(_, _, LeftSemi, _, _), _, Inner, _, _) => j
    }
    assert(semiUnderInner.nonEmpty,
      s"the aggregate-leg gate must stay put:\n${q.queryExecution.optimizedPlan}")
  }
}
