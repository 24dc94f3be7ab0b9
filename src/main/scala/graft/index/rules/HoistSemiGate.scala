package graft.index.rules

import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.index.{GraftConf, GraftRuleGuard}

/**
 * Hoist a dim-side LeftSemi GATE back above its parent inner join when
 * both join legs could ride a bucketed index pair (beyond-reference —
 * the reference rewrites scans only and never repairs operator order).
 *
 * The hazard this closes recurred in two independent TPC-DS ports:
 * Catalyst's PushDownLeftSemiAntiJoin pushes an `IN (subquery)` /
 * INTERSECT-lowered semi join below the fact⋈dim join onto the DIM leg
 * — locally sensible (filter early), but the dim leg stops being a
 * scan and NO covering-index pair can serve the join: at 100 TB the
 * "optimization" trades a tiny gate for a full re-shuffle of the fact
 * (qds38: INTERSECT semi-pushdown un-bucketing; qds33: the same via a
 * dim-keyed IN gate — ROUNDLOG findings #6 and #10).
 *
 * Rewrite (semantics-preserving for a DIRECT LeftSemi child of an
 * INNER join): `fact ⋈ (dim ⋉ gate)` → `(fact ⋈ dim) ⋉ gate`. A semi
 * join never duplicates or extends its left side and the gate cannot
 * reference the fact leg (it sits below the semi), so the kept row set
 * is identical — only evaluated later, on the joined stream, where the
 * tiny gate side broadcasts at runtime.
 *
 * Fires conservatively: only when the dim leg (minus the gate) is a
 * plain deterministic Project/Filter scan chain AND BOTH the dim leaf
 * and a leaf on the other join leg have candidate covering indexes —
 * i.e. exactly when the pushdown robbed an available bucketed pair.
 * Without candidates the pushed-down shape is kept (filtering the dim
 * early is the right call when nothing is bucketed). And a pushed-down
 * semi whose OWN keys ride the leg's bucket keys (subset-key
 * co-partitioning — qds23's shape, where the semi on l_partkey sits on
 * a partkey-bucketed fact) is servable exactly where it is: hoisting
 * would churn an already-optimal plan, so it stays. `transformUp`
 * handles gates at any join depth; conf-gated
 * (`spark.graft.hoistSemiGate.enabled`, default on) and fail-safe like
 * every entry rule. Runs pre-CBO immediately before [[ApplyGraft]] so
 * the index rules see the repaired scan pair.
 */
class HoistSemiGate(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper with Logging {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!GraftConf.applyEnabled(spark) || GraftRuleGuard.isDisabled ||
        !enabled) return plan
    try {
      val indexes = IndexCatalog.activeIndexes(spark)
      if (indexes.isEmpty) return plan
      // subqueries too: RewritePredicateSubquery lowers IN/EXISTS into
      // the main plan, but a gate INSIDE a remaining subquery plan
      // (scalar or nested) robs its pair just the same
      plan.transformUpWithSubqueries {
        case j @ Join(left,
              sj @ Join(dim, _, LeftSemi, semiCond, _), Inner, _, _)
            if eligible(left, dim, semiCond, indexes) =>
          sj.copy(left = j.copy(right = dim))
        case j @ Join(sj @ Join(dim, _, LeftSemi, semiCond, _),
              right, Inner, _, _)
            if eligible(right, dim, semiCond, indexes) =>
          sj.copy(left = j.copy(left = dim))
      }
    } catch {
      case NonFatal(e) =>
        logWarning(s"graft: semi-gate hoist failed, using original plan: $e")
        plan
    }
  }

  private def enabled: Boolean = spark.conf
    .getOption("spark.graft.hoistSemiGate.enabled")
    .forall(v => scala.util.Try(v.toBoolean).getOrElse(true))

  /** The dim leg must be a deterministic scan chain (the shape the
    * pushdown broke), both legs must have index candidates — the hoist
    * only pays when a bucketed pair is actually on the table — and the
    * semi must NOT already be servable in place on the leg's buckets. */
  private def eligible(other: LogicalPlan, dim: LogicalPlan,
      semiCond: Option[Expression],
      indexes: Seq[graft.index.IndexLogEntry]): Boolean = {
    if (!scanChain(dim)) return false
    val dimMatches = IndexCandidates.collect(spark, dim, indexes)
      .values.flatten.toSeq
    dimMatches.nonEmpty &&
      IndexCandidates.collect(spark, other, indexes)
        .values.exists(_.nonEmpty) &&
      !servableInPlace(dim, semiCond, dimMatches)
  }

  /** A pushed-down semi rides the leg's layout when some candidate's
    * BUCKET keys are a subset of the semi's own equi-keys on that leg
    * (the subset-key co-partitioning rule serves it without a shuffle
    * right where it sits). */
  private def servableInPlace(dim: LogicalPlan,
      semiCond: Option[Expression],
      matches: Seq[CandidateMatch]): Boolean = {
    val resolver = spark.sessionState.conf.resolver
    val dimKeys = semiCond.toSeq.flatMap(splitConjunctivePredicates).collect {
      case EqualTo(a: Attribute, _) if dim.outputSet.contains(a) => a.name
      case EqualTo(_, a: Attribute) if dim.outputSet.contains(a) => a.name
      case EqualNullSafe(a: Attribute, _) if dim.outputSet.contains(a) => a.name
      case EqualNullSafe(_, a: Attribute) if dim.outputSet.contains(a) => a.name
    }
    if (dimKeys.isEmpty) return true // no equi-keys: hoisting buys nothing
    matches.exists(_.entry.descriptor match {
      case ci: graft.index.covering.CoveringIndexDescriptor =>
        ci.indexedColumns.nonEmpty && ci.indexedColumns.forall(c =>
          dimKeys.exists(k => resolver(c, k)))
      case _ => false
    })
  }

  private def scanChain(p: LogicalPlan): Boolean = p match {
    case _: LogicalRelation => true
    case f: Filter if f.condition.deterministic => scanChain(f.child)
    case pr: Project if pr.projectList.forall(_.deterministic) =>
      scanChain(pr.child)
    case _ => false
  }
}
