package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, Tables, TestSpark}
import graft.index.covering.CoveringIndexConfig

/**
 * Workload-driven index advisor (IndexAdvisor / Graft.recommend): the
 * tool turns the corpus-governance checks from a guard into a DESIGN
 * tool — proposals are ranked by workload demand and each is vetted
 * against findings #11/#12a geometry before it is offered.
 */
class IndexAdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-adv-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  private def li = Tables.load(spark, TestSpark.sfDir, "lineitem")
  private def ord = Tables.load(spark, TestSpark.sfDir, "orders")
  private def supp = Tables.load(spark, TestSpark.sfDir, "supplier")
  private def part = Tables.load(spark, TestSpark.sfDir, "part")

  /** A small TPC-DS-shaped workload built RAW (no ensured indexes):
    * two orderkey joins, an orderkey exists probe, a suppkey
    * aggregation, and a partkey dim join. */
  private def workload = Seq(
    // q95-ish: join + exists on the orderkey
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(li.select(col("l_orderkey").as("pk2")).distinct(),
        col("l_orderkey") === col("pk2"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")).as("rev")),
    // q65-ish: per-supplier revenue joined to the supplier dim
    li.groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("rev")),
    // part dim join + a pushable filter on the fact
    li.filter(col("l_returnflag") === "R")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("q")))

  test("an empty catalog: the workload reproduces the hand corpus's " +
      "bucket-key choices — orderkey/suppkey/partkey layouts on " +
      "lineitem, orderkey on orders, the dim keys — all accepted, " +
      "ranked by demand votes") {
    withGraft { g =>
      val recs = g.recommend(workload)
      assert(recs.nonEmpty)
      val byKey = recs.map(r => (r.table, r.config.indexedColumns.head)).toSet
      // the hand-built corpus's (table, bucket key) axes fall out of
      // the workload demand
      assert(Set(
        ("lineitem", "l_orderkey"), ("lineitem", "l_suppkey"),
        ("lineitem", "l_partkey"), ("orders", "o_orderkey"),
        ("supplier", "s_suppkey"), ("part", "p_partkey"))
        .subsetOf(byKey), s"got: $byKey")
      val corpus = recs.filter(r => Set("l_orderkey", "l_suppkey",
        "l_partkey", "o_orderkey", "s_suppkey", "p_partkey")
        .contains(r.config.indexedColumns.head))
      assert(corpus.forall(_.accepted), s"unexpected rejection: " +
        corpus.filterNot(_.accepted).map(_.rejection).mkString("; "))
      // governance arbitrates SIBLING proposals too: the returnflag
      // filter vote carries the same column set as the partkey layout
      // with a worse key — it loses the edge check against it
      val rf = recs.find(_.config.indexedColumns == Seq("l_returnflag"))
      assert(rf.exists(r => !r.accepted &&
        r.rejection.exists(_.contains("adv_ci_lineitem_l_partkey"))),
        s"expected the sibling-edge rejection: $rf")
      // the orderkey lineitem layout has the most demand sites (join +
      // exists probes, both sides of the self-semi) and ranks first
      // among lineitem proposals
      val liRecs = recs.filter(_.table == "lineitem")
      assert(liRecs.head.config.indexedColumns == Seq("l_orderkey"),
        s"expected orderkey first: ${liRecs.map(r =>
          (r.config.indexedColumns, r.votes))}")
      assert(liRecs.head.votes > liRecs.last.votes)
      // mechanisms name the demand shapes. (Catalyst pushes the semi
      // below the inner join, so the fact side's sites read as exists
      // probes; the inner join's linear side is orders.)
      assert(liRecs.head.mechanisms.contains("exists"))
      assert(recs.exists(r => r.table == "orders" &&
        r.mechanisms.contains("join")))
      assert(recs.exists(_.mechanisms.contains("agg")))
      assert(recs.exists(_.mechanisms.contains("filter")))
      // included columns carry exactly what the workload reads: the
      // proposals are buildable as-is
      val ok = liRecs.head.config
      assert(ok.includedColumns.contains("l_extendedprice"), ok.toString)
    }
  }

  test("REJECTED BY GOVERNANCE: a proposal whose column set covers an " +
      "existing differently-keyed layout is refused, naming the edge " +
      "it would open (finding #12a — the qds65 flip class)") {
    withGraft { g =>
      g.createIndex(li, CoveringIndexConfig("adv_guard_bysupp",
        Seq("l_suppkey"), Seq("l_extendedprice")))
      // this workload's partkey proposal needs suppkey + extendedprice
      // too — its refs cover the suppkey layout's whole set
      val q = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice")).as("rev"))
      val recs = g.recommend(Seq(q))
      val pk = recs.find(_.config.indexedColumns == Seq("l_partkey"))
      assert(pk.isDefined, s"no partkey proposal in: $recs")
      assert(!pk.get.accepted)
      assert(pk.get.rejection.exists(r =>
        r.contains("adv_guard_bysupp") && r.contains("finding #12a")),
        s"rejection must name the edge: ${pk.get.rejection}")
    }
  }

  test("REJECTED BY GOVERNANCE: an equal-width same-key twin of an " +
      "existing layout is refused naming the tie (finding #11); and a " +
      "proposal already covered same-key reports 'already served'") {
    withGraft { g =>
      g.createIndex(li, CoveringIndexConfig("adv_guard_qty",
        Seq("l_orderkey"), Seq("l_quantity", "l_tax")))
      // width-3 twin with a different column set -> tie
      val twin = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          col("o_orderkey"))
      val r1 = g.recommend(Seq(twin))
        .find(_.table == "lineitem").get
      assert(!r1.accepted && r1.rejection.exists(r =>
        r.contains("adv_guard_qty") && r.contains("finding #11")),
        s"expected the tie rejection: $r1")
      // subset of the existing layout -> nothing to build
      val served = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_orderkey"))
      val r2 = g.recommend(Seq(served))
        .find(_.table == "lineitem").get
      assert(!r2.accepted &&
        r2.rejection.exists(_.contains("already served by adv_guard_qty")),
        s"expected already-served: $r2")
    }
  }

  test("accepted proposals are vetted against EACH OTHER too: within " +
      "one call, a later (lower-voted) proposal that would cover an " +
      "earlier accepted one is rejected") {
    withGraft { g =>
      // suppkey demand twice (higher votes, narrow set); partkey once
      // but needing a superset that covers the suppkey proposal
      val qs = Seq(
        li.groupBy(col("l_suppkey")).agg(sum(col("l_extendedprice")).as("r")),
        li.join(supp, col("l_suppkey") === col("s_suppkey"))
          .agg(sum(col("l_extendedprice")).as("r")),
        li.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_extendedprice")).as("r")))
      val recs = g.recommend(qs)
      val sk = recs.find(_.config.indexedColumns == Seq("l_suppkey")).get
      val pk = recs.find(_.config.indexedColumns == Seq("l_partkey")).get
      assert(sk.accepted && sk.votes > pk.votes)
      assert(!pk.accepted && pk.rejection.exists(_.contains("finding #12a")),
        s"the mutual-edge guard missed: $pk")
    }
  }

  test("LOOP CLOSURE: an accepted recommendation is buildable VERBATIM " +
      "and the workload query then plans served from it — the suppkey " +
      "aggregation collapses shuffle-free on the advised buckets and " +
      "the dim join rides the pair") {
    withGraft { g =>
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val q = li
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("rev"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("rev"))
      val recs = g.recommend(Seq(q))
      val liRec = recs.find(r => r.accepted &&
        r.config.indexedColumns == Seq("l_suppkey")).get
      val suppRec = recs.find(r => r.accepted &&
        r.config.indexedColumns == Seq("s_suppkey")).get
      g.createIndex(li, liRec.config)
      g.createIndex(supp, suppRec.config)
      rules.IndexCatalog.invalidate(spark)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val served = analysis.PlanAnalysis.appliedIndexes(spark, q)
        assert(Set(liRec.config.indexName, suppRec.config.indexName)
          .subsetOf(served.toSet),
          s"advised indexes not applied: $served")
        // the advised layout's point: the suppkey aggregation and the
        // dim join run with NO exchange anywhere in the plan
        val plan = q.queryExecution.executedPlan
        def nodes(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            p +: nodes(a.executedPlan)
          case other => p +: other.children.flatMap(nodes)
        }
        assert(!nodes(plan).exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"the advised plan still shuffles:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("tolerated-direction edges are reported, not hidden: a narrow " +
      "proposal covered by an existing WIDER cross-key layout is " +
      "accepted with the edge named (the pinned wide-fact ⊇ " +
      "narrow-probe class)") {
    withGraft { g =>
      g.createIndex(li, CoveringIndexConfig("adv_guard_wide_pk",
        Seq("l_partkey"),
        Seq("l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice")))
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val r = g.recommend(Seq(q))
        .find(_.config.indexedColumns == Seq("l_orderkey")).get
      assert(r.accepted, s"tolerated direction must accept: $r")
      assert(r.edges.exists(_.contains("adv_guard_wide_pk")),
        s"the opened edge must be reported: $r")
    }
  }
}
