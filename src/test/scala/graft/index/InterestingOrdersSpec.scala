package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Interesting-orders index selection (ScoreBasedOptimizer): when twin
 * bucket layouts cover a query equally, ancestor demand — the
 * clustering columns downstream joins/aggregates want — must break the
 * tie, and legs that still tie must land COHERENTLY on one layout.
 *
 * The fixture corpus deliberately contains the twin pair this needs:
 * `accel_ci_li_chan` (orderkey-bucketed) and `accel_ci_li_partchan`
 * (partkey-bucketed) carry the SAME column set, so for a composite
 * (orderkey, partkey) join both are subset-key eligible and tie on
 * every pre-existing ranking criterion. Assertions check the BUCKET
 * FAMILY, not exact names: a narrower same-family index legitimately
 * wins the size tie-break once demand has picked the family.
 */
class InterestingOrdersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ordFamily = Set("accel_ci_li_chan", "accel_ci_li_qty",
    "accel_ci_li_ship", "accel_ci_li_join", "accel_ci_li",
    "accel_ci_li_rev", "accel_ci_li_wide")
  private val partFamily =
    Set("accel_ci_li_inv", "accel_ci_li_partchan", "accel_ci_li_bypart")

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

  private def liIndexNames(df: DataFrame): Seq[String] = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try allNodes(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
      .flatMap(_.relation.location.rootPaths.map(_.toString))
      .filter(_.contains("graft_accel"))
      .map(_.split("/graft_accel").last.split("/")(1)).distinct
      .filter(n => ordFamily.contains(n) || partFamily.contains(n))
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** The q78/q75-style no-return gate: sales ⟕ returns on the composite
    * (orderkey, partkey) key, misses kept — load-bearing (the IS NULL
    * filter references the returns side, so Catalyst cannot eliminate
    * the join). Both twins are subset-key eligible: a pure tie in
    * isolation. */
  private def noReturnGate(): DataFrame = {
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val rets = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("rord"), col("l_partkey").as("rpart"))
      .agg(count(lit(1)).as("rc"))
    li.join(rets, col("l_orderkey") === col("rord") &&
        col("l_partkey") === col("rpart"), "left_outer")
      .filter(col("rord").isNull)
  }

  /** Aggregate wide enough that only the full-width twins cover the
    * sales leg (quantity, money, linenumber, shipdate all referenced). */
  private def wideAgg(df: DataFrame, key: org.apache.spark.sql.Column) =
    df.groupBy(key).agg(sum(col("l_quantity")).as("q"),
      sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("m"),
      max(col("l_linenumber")).as("ln"),
      max(year(col("l_shipdate"))).as("yr"))

  test("ancestor demand flips the tie: a part join above the " +
      "composite-key gate pulls every fact leg onto PARTKEY buckets") {
    assert(corpusReady)
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    val df = wideAgg(noReturnGate()
      .join(part, col("l_partkey") === col("p_partkey")), col("p_brand"))
    val names = liIndexNames(df)
    assert(names.nonEmpty && names.forall(partFamily.contains),
      s"fact legs should all ride partkey buckets, served from: $names")
  }

  test("with an ORDERKEY consumer above, the same gate rides ORDERKEY " +
      "buckets instead") {
    assert(corpusReady)
    val ord = graft.Tables.load(spark, TestSpark.sfDir, "orders")
    val df = wideAgg(noReturnGate()
      .join(ord, col("l_orderkey") === col("o_orderkey")),
      col("o_orderpriority"))
    val names = liIndexNames(df)
    assert(names.nonEmpty && names.forall(ordFamily.contains),
      s"fact legs should all ride orderkey buckets, served from: $names")
  }

  test("whyNot explains the loss in interesting-orders terms: the " +
      "orderkey twin is ELIGIBLE but lost the ancestor-demand tie") {
    assert(corpusReady)
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    val df = wideAgg(noReturnGate()
      .join(part, col("l_partkey") === col("p_partkey")), col("p_brand"))
    val report = new graft.Graft(spark).whyNot(df, "accel_ci_li_chan")
    assert(report.contains("LOST_INTERESTING_ORDER_TIE") &&
        report.contains("l_partkey") && report.contains("l_orderkey"),
      s"expected the demand-tie explanation, got:\n$report")
  }

  test("demand dealiases through PROJECTION renames but deliberately " +
      "STOPS at aggregates (finding #13: a same-grain rename must not " +
      "kill the signal; a cross-grain one must not bias the scan)") {
    assert(corpusReady)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    // projection rename: join keys spelled through aliases
    val a = li.select(col("l_partkey").as("pk_a"), col("l_quantity"))
    val b = li.select(col("l_partkey").as("pk_b"), col("l_extendedprice"))
    val j1 = a.join(b, col("pk_a") === col("pk_b"))
      .queryExecution.optimizedPlan.collectFirst { case j: Join => j }.get
    val d1 = graft.index.rules.ScoreBasedOptimizer.derives(j1)
    assert(d1.contains("l_partkey"),
      s"projection rename must dealias to the source column: $d1")
    // aggregate rename: the key is a grouping ALIAS — the dealias must
    // STOP at the grain boundary and keep the post-aggregate spelling
    val ag = li.groupBy(col("l_partkey").as("agg_pk"))
      .agg(sum(col("l_quantity")).as("q"))
    val j2 = ag.join(b, col("agg_pk") === col("pk_b"))
      .queryExecution.optimizedPlan.collectFirst {
        case j: Join
            if j.collectFirst { case x: Aggregate => x }.isDefined => j
      }.get
    val aggKey = j2.left.output
      .collectFirst { case x if x.name == "agg_pk" =>
        x.asInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference] }
      .get
    assert(graft.index.rules.ScoreBasedOptimizer
      .dealiasToSource(j2.left, aggKey).name == "agg_pk",
      "dealias must not cross the aggregate grain boundary")
  }

  test("aggregate-born alias (finding #13, sound half): a dim join on " +
      "the RENAMED grouping key steers the aggregate onto the partner's " +
      "bucket family — translation at the chooser, not in the votes") {
    assert(corpusReady)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val part = graft.Tables.load(spark, TestSpark.sfDir, "part")
    val bp = li
      .groupBy(col("l_orderkey").as("bp_ord"), col("l_partkey").as("bp_part"))
      .agg(sum(col("l_quantity")).as("bp_qty"))
    val df = bp.join(part, col("bp_part") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(sum(col("bp_qty")).as("q"))
    val names = liIndexNames(df)
    assert(names.nonEmpty && names.forall(partFamily.contains),
      s"the coherence vote 'bp_part' must pick partkey buckets: $names")
    // and the vote's point: the (order, part)-grain aggregate output
    // reaches the dim join WITHOUT re-keying (no exchange under either
    // SMJ side — at 100 TB that exchange is the full basket stream)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = df.queryExecution.executedPlan
      val smj = allNodes(plan).collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge dim join:\n$plan")
      assert(smj.get.children.forall(c =>
        !allNodes(c).exists(_.isInstanceOf[ShuffleExchangeExec])),
        s"dim join must ride the aggregate's bucketed partitioning:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregate-born alias, control: the SAME aggregate with no " +
      "consumer vote keeps the canonical (orderkey) family — the flip " +
      "above is vote-driven, not a tie-break change") {
    assert(corpusReady)
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val bp = li
      .groupBy(col("l_orderkey").as("bp_ord"), col("l_partkey").as("bp_part"))
      .agg(sum(col("l_quantity")).as("bp_qty"))
    val names = liIndexNames(bp)
    assert(names.nonEmpty && names.forall(ordFamily.contains),
      s"voteless aggregate must keep the canonical family: $names")
  }

  test("no ancestor signal: legs still land coherently on ONE twin " +
      "(canonical bucket-column order)") {
    assert(corpusReady)
    // the select keeps the full liChan/liPartChan column width alive, so
    // the twins are the only covering candidates and tie head-to-head
    val df = noReturnGate().select(col("l_orderkey"), col("l_partkey"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_linenumber"), col("l_returnflag"), col("l_shipdate"))
    val names = liIndexNames(df)
    assert(names.nonEmpty, s"gate legs not index-served: $names")
    // coherence is the contract; the canonical order (bucket column
    // name asc: l_orderkey < l_partkey) makes it deterministic
    assert(names.contains("accel_ci_li_chan") &&
        names.forall(ordFamily.contains),
      s"legs split across bucket families: $names")
  }
}
