package graft.index.rules

import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualNullSafe, EqualTo, Expression, IsNotNull, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.index.{GraftConf, GraftRuleGuard}

/**
 * Normalize NULL-SAFE equality join keys to plain equality where that is
 * provably equivalent — the rewrite that lets set algebra ride bucketed
 * indexes (beyond-reference; the reference rewrites scans only and never
 * touches join conditions).
 *
 * Why it matters at 100 TB: Catalyst lowers `EXCEPT` / `INTERSECT` (and
 * any `<=>` join) to anti/semi joins on `EqualNullSafe`, and physical
 * planning hashes those on `(coalesce(k, default), isnull(k))` — derived
 * keys that can NEVER match a relation bucketed on `k`, so both sides of
 * an audience subtraction re-shuffle even when every scan is served by a
 * covering index bucketed on exactly the right key. A distinct-set
 * EXCEPT over a multi-billion-row key column turns into two full
 * shuffles that the index layout already paid for.
 *
 * The equivalence: as a JOIN predicate (where NULL means no-match,
 * i.e. behaves as false), `a <=> b` and `a = b` differ ONLY on the
 * both-NULL row pair (`<=>` matches it, `=` does not). If EITHER operand
 * is provably never null — non-nullable by type, or carried as an
 * `IsNotNull` constraint from filters below — the both-null case cannot
 * occur and the conjunct can be rewritten. One-null pairs agree already:
 * `<=>` yields false, `=` yields NULL which a join treats as false.
 *
 * Scope guards:
 *  - only TOP-LEVEL conjuncts of the join condition are rewritten: under
 *    a negation the two operators also differ on one-null pairs
 *    (`NOT(a <=> b)` is true, `NOT(a = b)` is NULL → no-match), so a
 *    `<=>` nested anywhere inside another expression is left alone;
 *  - the proof uses `plan.constraints`, so it fires exactly when the
 *    user (or an upstream rule) established not-null — e.g. a
 *    `WHERE k IS NOT NULL` on either leg of an EXCEPT — and degrades to
 *    a no-op when constraint propagation is disabled.
 *
 * Runs pre-CBO immediately before [[ApplyGraft]], so the index rules see
 * plain equi-join keys and can claim the bucketed zero-shuffle plan
 * (TpcdsShapeSpec `qds87_except_channels` pins the end-to-end shape).
 * Fail-safe like the entry rule: any surprise falls back to the original
 * plan.
 */
class NormalizeNullSafeJoinKeys(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper with Logging {

  override def apply(plan: LogicalPlan): LogicalPlan =
      RuleTimer.timed("NormalizeNullSafeJoinKeys") {
    if (!GraftConf.applyEnabled(spark) || GraftRuleGuard.isDisabled) return plan
    try {
      plan.transformUp {
        case j @ Join(_, _, _, Some(cond), _)
            if cond.exists(_.isInstanceOf[EqualNullSafe]) =>
          val conjuncts = splitConjunctivePredicates(cond)
          val rewritten = conjuncts.map {
            case e @ EqualNullSafe(l, r)
                if provablyNotNull(l, j) || provablyNotNull(r, j) =>
              EqualTo(l, r)
            case other => other
          }
          if (rewritten == conjuncts) j
          else j.copy(condition = Some(rewritten.reduce(
            org.apache.spark.sql.catalyst.expressions.And)))
      }
    } catch {
      case NonFatal(e) =>
        logWarning(s"graft: null-safe join-key normalization failed, " +
          s"using original plan: $e")
        plan
    }
  }

  /** Never-null proof: non-nullable by schema, or an attribute one side
    * constrains IsNotNull (constraints are canonicalized, so `contains`
    * matches regardless of qualifier spelling). */
  private def provablyNotNull(e: Expression, j: Join): Boolean =
    !e.nullable || (e match {
      case a: Attribute =>
        (j.left.outputSet.contains(a) && j.left.constraints.contains(IsNotNull(a))) ||
          (j.right.outputSet.contains(a) && j.right.constraints.contains(IsNotNull(a)))
      case _ => false
    })
}
