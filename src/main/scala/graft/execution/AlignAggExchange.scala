package graft.execution

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Physical (AQE query-stage-prep) rule that removes the extra shuffle
 * Spark plans when an aggregate's consumer re-partitions on a SUBSET
 * of the group keys — `groupBy(G).agg(...)` under a `Window(partitionBy
 * P)` or under a sort-merge join whose keys are `P`, with `P ⊆ G`:
 *
 * {{{
 *   Window(P) / SMJ(P) ← Sort ← Exchange(hash P) ← FinalAgg(G) ← Exchange(hash G) ← PartialAgg
 * }}}
 *
 * EnsureRequirements keys the aggregate's exchange on ALL the group
 * keys, then has to re-shuffle the aggregated stream on the consumer's
 * subset keys — two full shuffles of the same data, because exchange
 * keys are chosen per-operator bottom-up with no lookahead to the
 * parent. But hashing the aggregate exchange on the SUBSET still
 * satisfies the aggregate's `ClusteredDistribution(G)` (rows agreeing
 * on G agree on P ⊆ G, so they land together), and then already
 * satisfies the consumer too:
 *
 * {{{
 *   Window(P) / SMJ(P) ← Sort ← FinalAgg(G) ← Exchange(hash P) ← PartialAgg
 * }}}
 *
 * One shuffle instead of two per aligned side, with map-side partial
 * aggregation on the full G intact below the exchange. At 100 TB the
 * removed exchange is a full pass over the aggregated fact stream; the
 * join case fires on every "aggregate per (k, month), then self-join
 * consecutive months on k" shape. The trade-off is key-width skew —
 * hashing on fewer keys concentrates data — so the rule requires a
 * non-empty P and can be disabled with
 * `spark.graft.alignAggExchange.enabled=false`.
 *
 * Safety invariants:
 *  - every consumer partition expression must be an AttributeReference
 *    that traces — directly, or through an Alias in the final
 *    aggregate's result expressions (`groupBy(col.as("k"))`
 *    materializes renames there) — to one of the aggregate exchange's
 *    own hash attributes. A computed key (e.g. `coalesce(brand,'ALL')`
 *    above a rollup, whose value mapping merges rows the raw column
 *    hashes apart) can never match.
 *  - both exchanges must be EnsureRequirements-inserted (user
 *    `repartition()` is never touched) and have the SAME partition
 *    count, so a join's other side — whose exchange or bucketed claim
 *    was sized against the removed exchange — stays co-partitioned.
 *  - the aggregate's alias-aware `outputPartitioning` then reports
 *    exactly the partitioning the removed exchange provided, so AQE
 *    re-planning (which re-runs EnsureRequirements above materialized
 *    stages) re-derives the same single-exchange plan instead of
 *    re-inserting the shuffle.
 *
 * Deliberately NOT extended to the aggregate→aggregate shape
 * (`groupBy(G)` under `groupBy(P ⊆ G)`, the two-phase distinct
 * expansion): there the upper exchange carries only the second
 * aggregate's map-side partials — O(|P|) rows per mapper, near-free —
 * while re-keying the LOWER exchange onto P would concentrate the
 * first aggregate's full dedup/merge work onto |P| partitions (a
 * 6-band expansion would run stage one on 6 cores at any scale). The
 * window/join consumers this rule does handle shuffle the ENTIRE
 * aggregated stream a second time, which is what makes the rewrite a
 * win there.
 *
 * The reference has no analogue (it plans neither windows nor
 * distributed joins); Spark's own EnsureRequirements lacks the rewrite.
 * Runs under AQE only (query-stage-prep slot, after EnsureRequirements,
 * before stage materialization).
 */
class AlignAggExchange(spark: SparkSession) extends Rule[SparkPlan] {

  private def enabled: Boolean = spark.conf
    .getOption("spark.graft.alignAggExchange.enabled")
    // a malformed value ("yes") must degrade to the default, not throw
    // from AQE stage prep and fail every query in the session — but a
    // user who typo'd an intent to DISABLE deserves a signal, so the
    // degrade logs once, naming the key and the value. Companion-object
    // CAS: rule instances are per-session/per-query on concurrent
    // threads, so an instance var would race and re-warn
    .forall(v => scala.util.Try(v.toBoolean).getOrElse {
      if (AlignAggExchange.warnedMalformed.compareAndSet(false, true)) {
        logWarning("graft: malformed value " +
          s"'$v' for spark.graft.alignAggExchange.enabled; " +
          "expected true|false — using the default (enabled)")
      }
      true
    })

  override def apply(plan: SparkPlan): SparkPlan =
    graft.index.rules.RuleTimer.timed("AlignAggExchange") {
      if (!enabled) plan
      else try applyOnce(plan)
      catch { case scala.util.control.NonFatal(_) => plan } // fail-safe: keep Spark's plan
    }

  private def applyOnce(plan: SparkPlan): SparkPlan = plan.transformUp {
    case w: WindowExec if w.partitionSpec.nonEmpty =>
      align(w.child).map(c => w.withNewChildren(Seq(c))).getOrElse(w)
    case j: SortMergeJoinExec =>
      val (l, r) = (align(j.left), align(j.right))
      if (l.isEmpty && r.isEmpty) j
      else j.withNewChildren(Seq(l.getOrElse(j.left), r.getOrElse(j.right)))
  }

  /** `Sort ← Exchange(P) ← [Project/Filter]* ← FinalAgg(G) ← Exchange(G)`
    * with P tracing into G → the same chain minus the upper exchange,
    * the lower one re-keyed on P's child-side attributes. The
    * deterministic Project/Filter chain between the consumer and the
    * final aggregate (a threshold filter over the aggregated values, a
    * rename) is partitioning-transparent: FilterExec passes its child's
    * partitioning through and ProjectExec is alias-aware, so after the
    * rewrite AQE re-derives the same single-exchange plan. */
  private def align(child: SparkPlan): Option[SparkPlan] = child match {
    case s @ SortExec(_, false,
          ShuffleExchangeExec(HashPartitioning(pExprs, pN),
            inner, ENSURE_REQUIREMENTS, _), _) if pExprs.nonEmpty =>
      peel(inner).flatMap { case (chain, agg) =>
        agg.child match {
          case low @ ShuffleExchangeExec(HashPartitioning(gExprs, gN),
                _, ENSURE_REQUIREMENTS, _) if pN == gN =>
            val gAttrs = gExprs.collect { case a: AttributeReference => a }
            val aligned = pExprs.flatMap {
              case p: AttributeReference =>
                traceThrough(chain, p)
                  .flatMap(groupingSide(agg, _))
                  .flatMap(g => gAttrs.find(_.exprId == g.exprId))
              case _ => Nil
            }
            if (gAttrs.length == gExprs.length &&
                aligned.length == pExprs.length) {
              val newLow =
                low.copy(outputPartitioning = HashPartitioning(aligned, gN))
              // breadcrumb for explain: the re-key is otherwise invisible
              // to plan text (the node renders like any other exchange)
              newLow.setTagValue(AlignAggExchange.AlignedTag,
                aligned.map(_.name))
              val rebuilt = chain.foldRight(
                agg.withNewChildren(Seq(newLow)): SparkPlan)(
                (op, acc) => op.withNewChildren(Seq(acc)))
              Some(s.withNewChildren(Seq(rebuilt)))
            } else None
          case _ => None
        }
      }
    case _ => None
  }

  /** Unwrap a (possibly empty) deterministic Project/Filter chain down
    * to a final-mode aggregate; returns the chain topmost-first. */
  private def peel(plan: SparkPlan)
      : Option[(List[SparkPlan], BaseAggregateExec)] = plan match {
    case p: ProjectExec if p.projectList.forall(_.deterministic) =>
      peel(p.child).map { case (c, a) => (p :: c, a) }
    case f: FilterExec if f.condition.deterministic =>
      peel(f.child).map { case (c, a) => (f :: c, a) }
    case a: BaseAggregateExec if isFinalMode(a) => Some((Nil, a))
    case _ => None
  }

  /** Trace a consumer attribute top-down through the Project chain to
    * the aggregate-output attribute it renames; only identity renames
    * (`Alias(attr)`) qualify — a computed column can never align. */
  private def traceThrough(
      chain: List[SparkPlan],
      attr: AttributeReference): Option[AttributeReference] =
    chain.foldLeft(Option(attr)) {
      case (Some(a), p: ProjectExec) =>
        p.projectList.collectFirst {
          case ar: AttributeReference if ar.exprId == a.exprId => ar
          case al @ Alias(c: AttributeReference, _)
              if al.exprId == a.exprId => c
        }
      case (acc, _) => acc // FilterExec: pass-through
    }

  /** A consumer key is either a grouping attr passed through the final
    * aggregate, or an Alias of one in its result expressions — anything
    * else (computed keys, aliased AGGREGATE results) fails the gAttrs
    * membership check at the call site. */
  private def groupingSide(
      agg: BaseAggregateExec,
      p: AttributeReference): Option[AttributeReference] =
    agg.resultExpressions.collectFirst {
      case a: AttributeReference if a.exprId == p.exprId => a
      case al @ Alias(c: AttributeReference, _)
          if al.exprId == p.exprId => c
    }

  /** Final-mode (or pure-distinct) aggregate: its grouping expressions
    * are the pass-through attributes the consumer keys must match. */
  private def isFinalMode(agg: BaseAggregateExec): Boolean =
    agg.aggregateExpressions.forall(
      _.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final)
}

object AlignAggExchange {
  /** Set on a re-keyed aggregate exchange (value: the new key names) so
    * explain can surface the physical decision. */
  val AlignedTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[Seq[String]] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Seq[String]](
      "graft.alignedAggExchange")

  private[execution] val warnedMalformed =
    new java.util.concurrent.atomic.AtomicBoolean(false)
}
