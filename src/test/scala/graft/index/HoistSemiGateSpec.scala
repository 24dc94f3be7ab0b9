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

  /** The query's plan as the hoist rule would see it (rules disabled),
    * for exercising the decisions() dry-run channel. */
  private def unhoisted(df: DataFrame) =
    graft.index.GraftRuleGuard.withRuleDisabled {
      spark.sessionState.executePlan(df.queryExecution.logical).optimizedPlan
    }

  test("grain-aware placement: the hoisted gate moves ABOVE the brand " +
      "aggregate (its key is a grouping pass-through), the condition " +
      "re-keys onto the aggregate's output, and decisions() reports " +
      "the grain-aware breadcrumb") {
    assert(corpusReady)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val df = naturalGate()
    val opt = df.queryExecution.optimizedPlan
    val above = opt.collect {
      case j @ Join(_: Aggregate, _, LeftSemi, Some(cond), _) => (j, cond)
      case j @ Join(p: org.apache.spark.sql.catalyst.plans.logical.Project,
          _, LeftSemi, Some(cond), _)
          if p.child.isInstanceOf[Aggregate] => (j, cond)
    }
    assert(above.nonEmpty, s"the gate did not move above the aggregate:\n$opt")
    val (semi, cond) = above.head
    // the condition's left side references the AGGREGATE's output
    // attribute (the grouping alias `brand`), not the pre-agg p_brand
    val aggOut = semi.left.outputSet
    assert(cond.references.exists(aggOut.contains),
      s"semi condition not re-keyed onto the aggregate output: $cond")
    // the decision report (the tag-robust channel explain/whyNot use)
    // names both the hoist and the grain-aware placement
    val ds = new graft.index.rules.HoistSemiGate(spark)
      .decisions(unhoisted(df))
    assert(ds.exists(d => d.detail.contains("hoisted") &&
      d.detail.contains("above aggregate")),
      s"decision report missing the grain-aware line: $ds")
  }

  test("a gate whose key is NOT a grouping pass-through stays below " +
      "the aggregate — pull-up only fires when the semi drops whole " +
      "groups") {
    assert(corpusReady)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    val brands = part.filter(col("p_type").startsWith("PROMO"))
      .select(col("p_brand").as("gb")).distinct()
    // gate on p_brand, but the aggregate groups by p_type: the semi
    // removes ROWS of surviving groups, so it must not commute
    val q = li.filter(year(col("l_shipdate")) === 1995)
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(brands, col("p_brand") === col("gb"), "left_semi")
      .groupBy(col("p_type").as("ptype"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val opt = q.queryExecution.optimizedPlan
    val semiAboveAgg = opt.collect {
      case j @ Join(l, _, LeftSemi, _, _) if l.isInstanceOf[Aggregate] => j
    }
    assert(semiAboveAgg.isEmpty,
      s"the gate illegally commuted with a different-grain aggregate:\n$opt")
    // and the hoist itself (semi above the inner join) still happened,
    // WITHOUT the grain-aware note — through the pruning Project that
    // ColumnPruning interposed (the gate key is not needed above)
    val ds = new graft.index.rules.HoistSemiGate(spark)
      .decisions(unhoisted(q))
    assert(ds.exists(_.detail.contains("hoisted")) &&
      !ds.exists(_.detail.contains("above aggregate")),
      s"expected a plain hoist decision: $ds")
    // results parity for the through-project hoist path
    def rows() = q.orderBy(col("ptype")).collect().toSeq
    val expected = withHoistOff(rows())
    assert(rows() == expected && expected.nonEmpty)
  }

  test("the MIRRORED shape — gated dim on the LEFT of the inner join — " +
      "hoists through its pruning Project too, with identical results") {
    assert(corpusReady)
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    val brands = part.filter(col("p_type").startsWith("PROMO"))
      .select(col("p_brand").as("gb")).distinct()
    // dim (with its gate) written FIRST: the semi lands on the LEFT leg
    // of the inner join, and grouping by p_type (not the gate key)
    // makes ColumnPruning interpose the pruning Project over the semi
    val q = part.join(brands, col("p_brand") === col("gb"), "left_semi")
      .join(li.filter(year(col("l_shipdate")) === 1995),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_type").as("ptype"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val ds = new graft.index.rules.HoistSemiGate(spark)
      .decisions(unhoisted(q))
    assert(ds.exists(_.detail.contains("hoisted")),
      s"mirrored through-project shape did not hoist: $ds")
    def rows() = q.orderBy(col("ptype")).collect().toSeq
    val expected = withHoistOff(rows())
    assert(rows() == expected && expected.nonEmpty)
  }

  test("decisions() reports the kept-in-place negative when the " +
      "pushed-down semi rides the leg's own buckets (the qds23 shape)") {
    assert(corpusReady)
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    // the gate keys the PART leg on p_partkey — partAttr is bucketed on
    // exactly that key, so the semi is servable where the pushdown put
    // it and the hoist must refuse (and say why)
    val gate = li.select(col("l_partkey").as("gpk")).distinct()
    val q = li.filter(col("l_returnflag") === "R")
      .join(part.join(gate, col("p_partkey") === col("gpk"), "left_semi"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    val ds = new graft.index.rules.HoistSemiGate(spark)
      .decisions(unhoisted(q))
    assert(ds.exists(d => d.detail.contains("kept in place") &&
      d.detail.contains("p_partkey")),
      s"expected a kept-in-place decision naming the bucket key: $ds")
    assert(!ds.exists(_.detail.contains("hoisted")), s"must not also hoist: $ds")
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
