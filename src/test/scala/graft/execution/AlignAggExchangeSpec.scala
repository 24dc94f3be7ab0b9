package graft.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * [[AlignAggExchange]]: the groupBy(G) → Window(P ⊆ G) shape
 * should run on ONE exchange, keyed on the window's partition columns,
 * with map-side partial aggregation on the full G intact below it.
 */
class AlignAggExchangeSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  // this suite pins PURE-Spark plan shapes; another suite in the same
  // shared session may have built the index corpus, whose rewrites
  // (e.g. a bucket-served aggregate) would change the exchange counts
  // the assertions here reason about — scope the opt-out to this suite
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set(graft.index.GraftConf.ApplyEnabledKey, "false")
  }
  override def afterAll(): Unit = {
    spark.conf.unset(graft.index.GraftConf.ApplyEnabledKey)
    super.afterAll()
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
    case q: QueryStageExec => p +: allNodes(q.plan)
    case other => p +: other.children.flatMap(allNodes)
  }

  private def monthlyWindowed(): DataFrame = {
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val agg = li.groupBy(col("l_suppkey").as("sk"),
        col("l_returnflag").as("rf"), col("l_linestatus").as("ls"))
      .agg(sum(col("l_quantity")).as("q"))
    agg.withColumn("r",
      rank().over(Window.partitionBy(col("sk")).orderBy(col("q").desc)))
  }

  private def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] =
    allNodes(p).collect { case s: ShuffleExchangeExec => s }

  test("agg exchange is re-keyed on the window partition; the window " +
      "exchange disappears; partial aggregation survives below it") {
    val p = monthlyWindowed().queryExecution.executedPlan
    val ex = shuffles(p)
    assert(ex.length == 1, s"expected ONE exchange, got ${ex.length}:\n$p")
    // the surviving exchange hashes on the WINDOW key (sk), not all of G
    val keys = ex.head.outputPartitioning
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
      .expressions.map(_.asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.AttributeReference].name)
    // the exchange hashes the window key's child-side grouping attr
    assert(keys == Seq("l_suppkey"), s"exchange keys: $keys\n$p")
    // partial agg still below the exchange (map-side combine intact)
    val belowExchange = allNodes(ex.head.child)
    assert(belowExchange.exists(_.isInstanceOf[BaseAggregateExec]),
      s"partial aggregate missing below the aligned exchange:\n$p")
    // and no exchange between the window and the final aggregate
    val w = allNodes(p).collectFirst { case w: WindowExec => w }.get
    val aboveAgg = allNodes(w.child).takeWhile(!_.isInstanceOf[BaseAggregateExec])
    assert(!aboveAgg.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"window still re-shuffles the aggregated stream:\n$p")
  }

  test("AQE re-planning does not re-insert the removed exchange: the " +
      "EXECUTED final plan still has exactly one") {
    val df = monthlyWindowed()
    df.collect() // materialize every stage so AQE re-optimizes fully
    val p = df.queryExecution.executedPlan
    assert(p.toString.contains("isFinalPlan=true"), s"AQE did not run:\n$p")
    assert(shuffles(p).length == 1,
      s"AQE re-planning re-inserted an exchange:\n$p")
  }

  test("results are identical with the rule disabled") {
    val expected = {
      spark.conf.set("spark.graft.alignAggExchange.enabled", "false")
      try monthlyWindowed().orderBy(col("sk"), col("rf"), col("ls")).collect()
      finally spark.conf.unset("spark.graft.alignAggExchange.enabled")
    }
    val actual =
      monthlyWindowed().orderBy(col("sk"), col("rf"), col("ls")).collect()
    assert(actual.toSeq == expected.toSeq)
  }

  /** The TPC-DS q31 shape un-indexed: an aggregate grouped on
    * (suppkey, quarter) self-joined three ways on suppkey alone — the
    * SortMergeJoin branch under a REAL TPC-DS shape, not just the unit
    * legs below. Spark plans six exchanges (each leg: one for the
    * aggregate, one to re-key the join); the rule re-keys each leg's
    * aggregate exchange onto the join key, halving it to three. */
  private def q31Shape(): DataFrame = {
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val base = li
      .filter(year(col("l_shipdate")) === 1995 &&
        quarter(col("l_shipdate")) <= 3)
      .groupBy(col("l_suppkey").as("sk"), quarter(col("l_shipdate")).as("qoy"))
      .agg(sum(col("l_quantity")).as("q"))
    def leg(q: Int) = base.filter(col("qoy") === q)
      .select(col("sk").as(s"sk$q"), col("q").as(s"q$q"))
    leg(1).join(leg(2), col("sk1") === col("sk2"))
      .join(leg(3), col("sk1") === col("sk3"))
  }

  test("TPC-DS q31 shape: each quarter leg's aggregate exchange is " +
      "re-keyed onto the join key — three exchanges, all on l_suppkey, " +
      "instead of Spark's six") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = q31Shape().queryExecution.executedPlan
      val ex = shuffles(p)
      assert(ex.length == 3, s"expected THREE exchanges, got ${ex.length}:\n$p")
      val keys = ex.map(_.outputPartitioning
        .asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
        .expressions.map(_.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.AttributeReference].name))
      assert(keys.forall(_ == Seq("l_suppkey")), s"exchange keys: $keys\n$p")
      val unaligned = {
        spark.conf.set("spark.graft.alignAggExchange.enabled", "false")
        try shuffles(q31Shape().queryExecution.executedPlan).length
        finally spark.conf.unset("spark.graft.alignAggExchange.enabled")
      }
      assert(unaligned == 6, s"Spark's default plan changed: $unaligned")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("TPC-DS q31 shape: results identical with the rule disabled") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def sorted(df: DataFrame) = df.orderBy(col("sk1")).collect().toSeq
      val expected = {
        spark.conf.set("spark.graft.alignAggExchange.enabled", "false")
        try sorted(q31Shape())
        finally spark.conf.unset("spark.graft.alignAggExchange.enabled")
      }
      assert(sorted(q31Shape()) == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("malformed enabled-conf value degrades to the default instead of " +
      "failing every query from AQE stage prep") {
    spark.conf.set("spark.graft.alignAggExchange.enabled", "yes")
    try {
      // must neither throw nor disable: "yes" is unparseable, the rule
      // falls back to its default (on) and the aligned plan still lands
      val p = monthlyWindowed().queryExecution.executedPlan
      assert(shuffles(p).length == 1, s"expected the aligned plan:\n$p")
    } finally spark.conf.unset("spark.graft.alignAggExchange.enabled")
  }

  test("disabled conf keeps Spark's two-exchange plan") {
    spark.conf.set("spark.graft.alignAggExchange.enabled", "false")
    try {
      val p = monthlyWindowed().queryExecution.executedPlan
      assert(shuffles(p).length == 2, s"expected Spark's default plan:\n$p")
    } finally spark.conf.unset("spark.graft.alignAggExchange.enabled")
  }

  test("computed partition keys (coalesce over a rollup) are NEVER " +
      "aligned — value mapping differs from the raw column") {
    // qds67's shape: coalesce(brand, 'ALL') merges the rollup's NULL
    // grand-total rows with a real 'ALL' value; hashing the aggregate
    // exchange on the raw column would separate rows the window must
    // see together. The rule must not fire.
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val df = li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("q"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf2"),
        col("l_linestatus"), col("q"))
      .withColumn("r",
        rank().over(Window.partitionBy(col("rf2")).orderBy(col("q").desc)))
    val p = df.queryExecution.executedPlan
    // both exchanges survive: the agg's and the window's
    assert(shuffles(p).length == 2,
      s"rule fired on a computed partition key:\n$p")
    // and the result is correct (NULL and 'ALL' rows ranked together)
    assert(df.count() > 0)
  }

  test("sort-merge-join branch: two aggregates self-joined on a SUBSET " +
      "of their group keys run on one exchange per side") {
    // the q39 family without bucketing: agg by (suppkey, returnflag),
    // self-join on suppkey alone — Spark's default re-shuffles both
    // aggregated streams on the join key (4 exchanges); aligned, each
    // side's aggregate exchange is keyed on suppkey directly (2)
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    def side(rf: String, tag: String): DataFrame =
      li.filter(col("l_returnflag") === rf)
        .groupBy(col("l_suppkey").as(s"${tag}_sk"),
          col("l_linestatus").as(s"${tag}_ls"))
        .agg(sum(col("l_quantity")).as(s"${tag}_q"))
    val df = side("R", "a").join(side("N", "b"),
        col("a_sk") === col("b_sk"))
      .select(col("a_sk"), col("a_ls"), col("b_ls"), col("a_q"), col("b_q"))
    // force the sort-merge path: at sf0.001 the aggregated sides would
    // broadcast, and the rule targets the shuffle-join shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ex = try {
      val p0 = df.queryExecution.executedPlan
      shuffles(p0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    val p = ex.mkString("\n")
    assert(ex.length == 2, s"expected one exchange per side:\n$p")
    for (e <- ex) {
      val keys = e.outputPartitioning
        .asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
        .expressions.map(_.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.AttributeReference].name)
      assert(keys == Seq("l_suppkey"), s"exchange keys: $keys\n$p")
      assert(allNodes(e.child).exists(_.isInstanceOf[BaseAggregateExec]),
        s"partial aggregate missing below an aligned exchange:\n$p")
    }
    // parity against the rule-off plan
    val expected = {
      spark.conf.set("spark.graft.alignAggExchange.enabled", "false")
      try df.orderBy(col("a_sk"), col("a_ls"), col("b_ls")).collect()
      finally spark.conf.unset("spark.graft.alignAggExchange.enabled")
    }
    assert(df.orderBy(col("a_sk"), col("a_ls"), col("b_ls")).collect()
      .toSeq == expected.toSeq)
  }

  test("a threshold Filter and rename between the consumer and the " +
      "final aggregate are peeled — the chain shape real queries have") {
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    def side(rf: String, tag: String): DataFrame =
      li.filter(col("l_returnflag") === rf)
        .groupBy(col("l_suppkey").as(s"${tag}_sk"),
          col("l_linestatus").as(s"${tag}_ls"))
        .agg(count(lit(1)).as(s"${tag}_n"))
        .filter(col(s"${tag}_n") >= 1) // post-aggregate threshold
        .select(col(s"${tag}_sk").as(s"${tag}_k"), col(s"${tag}_ls"),
          col(s"${tag}_n")) // rename above the filter
    val df = side("R", "a").join(side("N", "b"), col("a_k") === col("b_k"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ex = try shuffles(df.queryExecution.executedPlan)
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert(ex.length == 2,
      s"expected one aligned exchange per side:\n${ex.mkString("\n")}")
    for (e <- ex) {
      val keys = e.outputPartitioning
        .asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
        .expressions.map(_.asInstanceOf[
          org.apache.spark.sql.catalyst.expressions.AttributeReference].name)
      assert(keys == Seq("l_suppkey"), s"exchange keys: $keys")
    }
  }

  test("window partition keys outside the grouping set leave the plan " +
      "untouched") {
    // P ⊄ G: partition by an aggregated VALUE column — never aligned
    val li = graft.Tables.load(spark, TestSpark.sfDir, "lineitem")
    val df = li.groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("q"))
      .withColumn("r",
        rank().over(Window.partitionBy(col("q")).orderBy(col("l_suppkey"))))
    val p = df.queryExecution.executedPlan
    assert(shuffles(p).length == 2, s"unsound alignment:\n$p")
  }
}
