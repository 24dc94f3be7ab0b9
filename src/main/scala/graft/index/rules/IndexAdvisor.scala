package graft.index.rules

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, BinaryComparison, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.index.GraftRuleGuard
import graft.index.covering.{CoveringIndexConfig, CoveringIndexDescriptor}

/**
 * Workload-driven index advisor (beyond-reference; builds on the same
 * demand analysis the interesting-orders channel and whyNot use). This
 * is the tool an ops team tuning a 100 TB corpus runs by hand today:
 * replay a workload's plans WITHOUT rewrites, collect every site a
 * bucketed covering index could have served — equi-join legs, exists
 * probes, shuffle-free-able aggregations, pushable filters — and emit
 * ranked [[CoveringIndexConfig]] proposals whose geometry the corpus
 * governance rules (ROUNDLOG findings #11/#12a, pinned by
 * CorpusGovernanceSpec) accept:
 *
 *  - a proposal that would COVER an existing differently-keyed layout's
 *    referenced set on the same table is REJECTED naming the edge — the
 *    finding-#12a hazard (the qds65 1→3-exchange flip) is exactly a new
 *    cross-key coverage edge appearing silently;
 *  - a proposal tying an existing same-key layout's width with a
 *    different column set is REJECTED naming the tie — finding #11
 *    (equal-width twins turn the narrowness race into a name race);
 *  - a proposal already covered by an existing SAME-key layout builds
 *    nothing new — rejected as served;
 *  - the tolerated edge direction (an existing wider layout covering
 *    the narrower proposal — the pinned "wide-fact ⊇ narrow-probe"
 *    class) is accepted but REPORTED, so the operator approves the
 *    geometry change consciously, like a golden-plan regen.
 *
 * Accepted proposals are themselves part of the geometry: each is
 * checked against existing indexes AND the proposals accepted before it
 * (votes-descending), so one recommend() call cannot propose its own
 * hazard pair.
 */
object IndexAdvisor {

  /** One ranked proposal. `votes` counts the demand sites it serves
    * across the workload; `mechanisms` names the shapes that voted
    * (join / exists / agg / filter); `edges` lists tolerated-direction
    * coverage edges the addition would open (existing wider layouts
    * covering this one). Rejected proposals carry the governance
    * reason, naming the exact edge or tie. */
  final case class Recommendation(
      table: String,
      config: CoveringIndexConfig,
      votes: Int,
      mechanisms: Seq[String],
      accepted: Boolean,
      rejection: Option[String],
      edges: Seq[String]) {
    def width: Int = config.referencedColumns.size
  }

  private case class Site(table: String, key: String, kind: String)
  private case class Layout(table: String, name: String, keys: Seq[String],
      refs: Set[String]) {
    def width: Int = refs.size
  }

  def recommend(
      spark: SparkSession,
      queries: Seq[DataFrame],
      maxPerTable: Int = 3): Seq[Recommendation] = {
    val sites = mutable.Buffer.empty[Site]
    // (table, key) -> union of needed relation columns across the
    // workload's voting queries
    val needed = mutable.Map.empty[(String, String), mutable.Set[String]]

    queries.foreach { df =>
      val plan = GraftRuleGuard.withRuleDisabled {
        spark.sessionState.executePlan(df.queryExecution.logical).optimizedPlan
      }
      analyzeOne(plan, sites, needed)
    }
    if (sites.isEmpty) return Nil

    val existing = activeLayouts(spark)
    val grouped = sites.groupBy(s => (s.table, s.key)).toSeq
      .map { case ((table, key), ss) =>
        val cols = needed.getOrElse((table, key), mutable.Set(key))
        // case-insensitive key removal: the set holds original-case
        // names while the grouping key is lowercased
        val included = cols.filterNot(_.equalsIgnoreCase(key)).toSeq.sorted
        val cfg = CoveringIndexConfig(s"adv_ci_${table}_${key}",
          Seq(key), included)
        (table, cfg, ss.size, ss.map(_.kind).distinct.sorted.toSeq)
      }
      // votes desc, then narrower first, then name — the same shape the
      // ranker itself prefers
      .sortBy { case (_, cfg, votes, _) =>
        (-votes, cfg.referencedColumns.size, cfg.indexName)
      }

    val accepted = mutable.Buffer.empty[Layout]
    val perTable = mutable.Map.empty[String, Int].withDefaultValue(0)
    grouped.map { case (table, cfg, votes, kinds) =>
      val refs = cfg.referencedColumns.map(_.toLowerCase).toSet
      val me = Layout(table, cfg.indexName, cfg.indexedColumns, refs)
      val against = existing.filter(_.table == table) ++
        accepted.filter(_.table == table)
      val verdictEither = govern(me, against)
      val capped = verdictEither.isRight && perTable(table) >= maxPerTable
      val (ok, rejection) = verdictEither match {
        case Left(reason) => (false, Some(reason))
        case Right(_) if capped =>
          (false, Some(s"per-table cap ($maxPerTable) reached by " +
            "higher-voted proposals"))
        case Right(_) => (true, None)
      }
      val edges = verdictEither.toOption.getOrElse(Nil)
      if (ok) { accepted += me; perTable(table) += 1 }
      Recommendation(table, cfg, votes, kinds, ok, rejection, edges)
    }
  }

  /** Governance verdict: Left(reason) to reject, Right(toleratedEdges)
    * to accept. Mirrors CorpusGovernanceSpec's geometry rules. */
  private def govern(
      me: Layout, against: Seq[Layout]): Either[String, Seq[String]] = {
    against.find(x => x.keys.map(_.toLowerCase) ==
        me.keys.map(_.toLowerCase) && me.refs.subsetOf(x.refs)) match {
      case Some(x) =>
        return Left(s"already served by ${x.name} (same bucket key, " +
          "covers every proposed column)")
      case None => ()
    }
    against.find(x => x.keys.map(_.toLowerCase) !=
        me.keys.map(_.toLowerCase) && x.refs.subsetOf(me.refs)) match {
      case Some(x) =>
        return Left(s"would cover ${x.name} across bucket keys — a new " +
          "cross-key coverage edge re-opens every ranking that set " +
          "serves (finding #12a)")
      case None => ()
    }
    against.find(x => x.keys.map(_.toLowerCase) ==
        me.keys.map(_.toLowerCase) && x.width == me.width &&
        x.refs != me.refs) match {
      case Some(x) =>
        return Left(s"equal-width twin of ${x.name} — the narrowness " +
          "race would fall to the name tie-break (finding #11)")
      case None => ()
    }
    Right(against.collect {
      case x if x.keys.map(_.toLowerCase) != me.keys.map(_.toLowerCase) &&
          me.refs.subsetOf(x.refs) =>
        s"${x.name} covers ${me.name}"
    })
  }

  // ------------------------------------------------------------------
  // demand analysis
  // ------------------------------------------------------------------

  private def analyzeOne(
      plan: LogicalPlan,
      sites: mutable.Buffer[Site],
      needed: mutable.Map[(String, String), mutable.Set[String]]): Unit = {
    // relation columns referenced ANYWHERE in the query (subqueries
    // included) plus the query's own output — a covering proposal must
    // carry what the query reads, and nothing more (a leaf's outputSet
    // would drag every unreferenced relation column into the proposal)
    val allRefs = {
      val b = mutable.Buffer.empty[AttributeSet]
      plan.foreachWithSubqueries(p => b += p.references)
      b.foldLeft(AttributeSet.empty ++ plan.outputSet)(_ ++ _)
    }
    def neededFor(rel: LogicalRelation): Seq[String] =
      allRefs.filter(rel.outputSet.contains).toSeq.map(_.name).distinct

    def vote(rel: LogicalRelation, key: AttributeReference,
        kind: String): Unit = {
      tableOf(rel).foreach { t =>
        sites += Site(t, key.name.toLowerCase, kind)
        val slot = needed.getOrElseUpdate((t, key.name.toLowerCase),
          mutable.Set(key.name))
        slot ++= neededFor(rel)
      }
    }

    plan.foreachWithSubqueries {
      case j: Join =>
        val kind = j.joinType match {
          case org.apache.spark.sql.catalyst.plans.LeftSemi |
               org.apache.spark.sql.catalyst.plans.LeftAnti => "exists"
          case _: org.apache.spark.sql.catalyst.plans.ExistenceJoin => "exists"
          case _ => "join"
        }
        val pairs = j.condition.toSeq.flatMap(c =>
          JoinIndexRule.equiJoinPairs(c, j.left.outputSet, j.right.outputSet)
            .getOrElse(Nil))
        Seq((j.left, pairs.map(_._1)), (j.right, pairs.map(_._2))).foreach {
          case (side, keys) =>
            scanOf(side).foreach { rel =>
              keys.foreach(k => JoinIndexRule.traceToRel(side, rel, k)
                .foreach(t => vote(rel, t, kind)))
            }
        }
      case a: Aggregate if a.groupingExpressions.forall(_.deterministic) =>
        scanOf(a.child).foreach { rel =>
          a.groupingExpressions.collect {
            case ar: AttributeReference => ar
            case Alias(c: AttributeReference, _) => c
          }.foreach(k => JoinIndexRule.traceToRel(a.child, rel, k)
            .foreach(t => vote(rel, t, "agg")))
        }
      case f: Filter =>
        scanOf(f.child).foreach { rel =>
          JoinIndexRule.splitConjuncts(f.condition).foreach {
            case cmp: BinaryComparison =>
              (cmp.left, cmp.right) match {
                case (a: AttributeReference, _: Literal)
                    if rel.outputSet.contains(a) => vote(rel, a, "filter")
                case (_: Literal, a: AttributeReference)
                    if rel.outputSet.contains(a) => vote(rel, a, "filter")
                case _ => ()
              }
            case In(a: AttributeReference, vs)
                if vs.forall(_.isInstanceOf[Literal]) &&
                  rel.outputSet.contains(a) => vote(rel, a, "filter")
            case InSet(a: AttributeReference, _)
                if rel.outputSet.contains(a) => vote(rel, a, "filter")
            case _ => ()
          }
        }
      case _ => ()
    }
  }

  /** The file-source relation under a linear deterministic chain —
    * never one of our own index scans. */
  private def scanOf(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case r: LogicalRelation
          if r.relation.isInstanceOf[HadoopFsRelation] &&
            !IndexCandidates.isIndexRelation(r) => Some(r)
      case p: Project => scanOf(p.child)
      case f: Filter if f.condition.deterministic => scanOf(f.child)
      case _ => None
    }

  /** Human table identity: the basename of the relation's root path,
    * minus a trailing .parquet/.orc/... extension. */
  private def tableOf(rel: LogicalRelation): Option[String] =
    rel.relation.asInstanceOf[HadoopFsRelation]
      .location.rootPaths.headOption.map { p =>
        val base = p.getName
        val dot = base.indexOf('.')
        (if (dot > 0) base.substring(0, dot) else base).toLowerCase
      }

  /** The active covering-index corpus as governance layouts. */
  private def activeLayouts(spark: SparkSession): Seq[Layout] =
    IndexCatalog.activeIndexes(spark).flatMap { e =>
      e.descriptor match {
        case d: CoveringIndexDescriptor =>
          e.relations.headOption.flatMap(_.rootPaths.headOption).map { p =>
            val base = p.split('/').last
            val dot = base.indexOf('.')
            val t = (if (dot > 0) base.substring(0, dot) else base).toLowerCase
            Layout(t, e.name, d.indexedColumns,
              d.referencedColumns.map(_.toLowerCase).toSet)
          }
        case _ => None
      }
    }
}
