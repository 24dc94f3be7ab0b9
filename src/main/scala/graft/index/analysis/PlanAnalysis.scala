package graft.index.analysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.index.{GraftConf, IndexLogEntry, IndexState, IndexManager}
import graft.index.covering.CoveringIndexDescriptor
import graft.index.dataskipping.DataSkippingIndexDescriptor
import graft.index.rules.{CandidateMatch, IndexCandidates, IndexCatalog}
import graft.index.zorder.ZOrderIndexDescriptor

/**
 * Plan introspection: `explain` (plans with/without index acceleration)
 * and `whyNot` (per-index reasons an index was not applied). Reference:
 * index/plananalysis/PlanAnalyzer.scala:48-143,
 * CandidateIndexAnalyzer.scala:29-346, FilterReason.scala:33-158.
 */
object PlanAnalysis {

  /** Names of graft indexes applied in the plan (every substituted scan
    * carries the index name in its marker option). */
  def appliedIndexes(spark: SparkSession, df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().collect {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .options.get(IndexCandidates.IndexRelationMarker)
    }.flatten.distinct

  def explain(spark: SparkSession, df: DataFrame, verbose: Boolean = false): String = {
    val withQe = df.queryExecution
    val withPlan = withQe.optimizedPlan
    val prev = spark.conf.getOption(GraftConf.ApplyEnabledKey)
    spark.conf.set(GraftConf.ApplyEnabledKey, "false")
    val withoutPlan =
      try spark.sessionState.executePlan(withQe.logical).optimizedPlan
      finally prev match {
        case Some(v) => spark.conf.set(GraftConf.ApplyEnabledKey, v)
        case None => spark.conf.unset(GraftConf.ApplyEnabledKey)
      }
    val applied = appliedIndexes(spark, df)
    val sb = new StringBuilder
    sb.append("=== Graft: applied indexes ===\n")
    sb.append(if (applied.isEmpty) "(none)\n" else applied.mkString(", ") + "\n")
    sb.append("\n=== Plan with indexes ===\n").append(withPlan.treeString)
    sb.append("\n=== Plan without indexes ===\n").append(withoutPlan.treeString)
    if (verbose) {
      sb.append("\n=== Physical plan with indexes ===\n")
        .append(withQe.executedPlan.toString)
    }
    sb.toString
  }

  /** Per-index reasons why each ACTIVE index was / was not applied. */
  def whyNot(spark: SparkSession, df: DataFrame,
      indexName: Option[String] = None): String = {
    val manager = new IndexManager(spark)
    val all = manager.getIndexes(Set(IndexState.Active))
      .filter(e => indexName.forall(_ == e.name))
    if (all.isEmpty)
      return indexName.map(n => s"Index '$n' does not exist or is not ACTIVE")
        .getOrElse("No ACTIVE indexes")

    val plan = df.queryExecution.optimizedPlan
    val applied = appliedIndexes(spark, df).toSet
    val leaves = IndexCandidates.sourceLeaves(spark, plan).map(_.plan)
    val candidates = IndexCandidates.collect(spark, plan, all)
    val resolver = spark.sessionState.conf.resolver

    val sb = new StringBuilder
    all.foreach { e =>
      sb.append(s"Index '${e.name}' [${e.descriptor.kindAbbr}]: ")
      if (applied.contains(e.name)) sb.append("APPLIED\n")
      else sb.append(notAppliedReasons(e, leaves, candidates, resolver, plan)).append('\n')
    }
    sb.toString
  }

  private def notAppliedReasons(
      e: IndexLogEntry,
      leaves: Seq[LogicalPlan],
      candidates: Map[LogicalPlan, Seq[CandidateMatch]],
      resolver: org.apache.spark.sql.catalyst.analysis.Resolver,
      plan: LogicalPlan): String = {
      e.descriptor match {
        case _: graft.index.ivf.IvfIndexDescriptor =>
          return "API_SERVED: IVF indexes do not rewrite plans; " +
            "query via Graft.annSearch"
        case _: graft.index.minhash.MinHashIndexDescriptor =>
          return "API_SERVED: MinHash indexes do not rewrite plans; " +
            "query via Graft.nearDuplicates / dedupBatch"
        case _ => ()
      }
      val reasons = scala.collection.mutable.ArrayBuffer.empty[String]
      if (leaves.isEmpty) reasons += "NO_FILE_BASED_SOURCE: plan has no file-based relation"
      leaves.foreach { leaf =>
        val schemaOk = e.descriptor.referencedColumns.forall(c =>
          graft.index.NestedColumns.resolvableIn(leaf.output, c, resolver))
        val m = candidates.get(leaf).flatMap(_.find(_.entry.name == e.name))
        if (!schemaOk) ()
        else m match {
          case None =>
            reasons += "SOURCE_MISMATCH: indexed files differ from the " +
              "relation's current files beyond hybrid-scan thresholds"
          case Some(cm) =>
            reasons ++= shapeReasons(plan, leaf, cm, resolver)
        }
      }
      if (leaves.nonEmpty &&
          leaves.forall(leaf => !e.descriptor.referencedColumns.forall(c =>
            leaf.output.exists(a => resolver(a.name, c)))))
        reasons += "COLUMN_MISMATCH: index columns not present in any scanned relation"
      if (reasons.isEmpty)
        reasons += "OUTSCORED: another index or the original plan scored higher"
      reasons.distinct.mkString("; ")
  }

  private def shapeReasons(
      plan: LogicalPlan,
      leaf: LogicalPlan,
      m: CandidateMatch,
      resolver: org.apache.spark.sql.catalyst.analysis.Resolver): Seq[String] = {
    val filters = plan.collect {
      case f @ Filter(_, r: LogicalRelation) if r.fastEquals(leaf) => f
      case p @ Project(_, Filter(_, r: LogicalRelation)) if r.fastEquals(leaf) => p
    }
    val joins = plan.collect { case j: Join => j }
    m.entry.descriptor match {
      case d: CoveringIndexDescriptor =>
        if (filters.isEmpty && joins.isEmpty)
          Seq("NO_FILTER_OR_JOIN: relation is scanned without an eligible filter/join above it")
        else {
          val fr = filters.flatMap { f =>
            val filterCond = f.collect { case Filter(c, _) => c }.head
            val filterNames = filterCond.references.toSeq.map(_.name)
            val neededNames = (f.references ++ f.outputSet).toSeq.map(_.name)
            val head = d.indexedColumns.head
            val r1 = if (!filterNames.exists(resolver(_, head)))
              Some(s"HEAD_COLUMN_NOT_IN_FILTER: filter does not reference '$head'")
            else None
            val r2 = if (!d.covers(neededNames))
              Some("NOT_COVERING: query needs columns beyond " +
                d.referencedColumns.mkString("[", ",", "]"))
            else None
            Seq(r1, r2).flatten
          }
          if (fr.isEmpty && joins.nonEmpty)
            Seq("JOIN_CRITERIA: join sides/keys/buckets did not line up " +
              "(requires exact-match indexes bucketed on both join key sets)")
          else fr
        }
      case d: ZOrderIndexDescriptor =>
        if (!m.isExact) Seq("ZORDER_REQUIRES_EXACT_MATCH: source files changed")
        else if (filters.isEmpty) Seq("NO_FILTER: z-order applies to filter queries")
        else Seq("NOT_COVERING_OR_NO_INDEXED_COLUMN_IN_FILTER")
      case _: DataSkippingIndexDescriptor =>
        if (filters.isEmpty) Seq("NO_FILTER: data skipping applies to filter queries")
        else Seq("PREDICATE_NOT_TRANSLATABLE: no sketch can evaluate the filter")
    }
  }
}
