package graft.index.rules

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.BucketSpec
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, In, Literal, Not}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, RepartitionByExpression, Union}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StructType}

import graft.index.IndexLogEntry
import graft.index.covering.CoveringIndexDescriptor

/**
 * The actual rewrite mechanics: swap a source `LogicalRelation` for one
 * reading index data (reference:
 * index/covering/CoveringIndexRuleUtils.scala:98-130
 * `transformPlanToUseIndexOnlyScan`).
 *
 * Attribute identity is preserved: columns present in the original
 * relation keep their exprIds so Project/Filter nodes above the swapped
 * scan stay valid; index-only columns (e.g. lineage) get fresh attributes.
 *
 * Scale notes: the substituted scan is ordinary bucketed parquet — filter
 * pushdown / column pruning happen in `FileSourceStrategy` exactly as for
 * any parquet scan, and `outputPartitioning = HashPartitioning(keys,
 * numBuckets)` lets `EnsureRequirements` elide shuffles for joins and
 * aggregations on the indexed columns.
 */
object ScanSubstitution {

  /** Build a LogicalRelation scanning covering-style index data
    * (covering or z-order descriptor). */
  def indexScan(
      spark: SparkSession,
      original: LogicalPlan,
      entry: IndexLogEntry,
      useBucketSpec: Boolean): LogicalRelation = {
    val (schemaJson, bucketSpec) = entry.descriptor match {
      case d: CoveringIndexDescriptor =>
        (d.schemaJson,
          if (useBucketSpec)
            Some(BucketSpec(d.numBuckets,
              d.physicalIndexedColumns, d.physicalIndexedColumns))
          else None)
      case d: graft.index.zorder.ZOrderIndexDescriptor => (d.schemaJson, None)
      case d => throw new IllegalArgumentException(
        s"not a covering-style index: ${d.kind}")
    }
    // schema parse + file-index construction are immutable per log id —
    // cache them per session (rules re-run this for every candidate
    // rewrite of every query plan; see PlanArtifacts)
    // the key is CONTENT-ADDRESSED on top of (name, id): two fixtures in
    // different system paths may reuse a name at the same early log id,
    // and the file-path hash separates them (caught by PlanArtifactsSpec
    // colliding with PlanAnalysisSpec's same-named index)
    val (indexSchema, location) = PlanArtifacts.getOrCompute[
        (StructType, InMemoryFileIndex)](
        spark, s"scan#${entry.name}#${entry.id}#" + PlanArtifacts.contentKey(
          entry.content.filePaths :+ schemaJson)) {
      val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      val loc = new InMemoryFileIndex(
        spark,
        entry.content.filePaths.map(new Path(_)),
        Map.empty[String, String],
        Some(schema),
        FileStatusCache.getOrCreate(spark),
        None,
        None)
      (schema, loc)
    }
    val relation = HadoopFsRelation(
      location,
      partitionSchema = StructType(Nil),
      dataSchema = indexSchema,
      bucketSpec = bucketSpec,
      fileFormat = new ParquetFileFormat,
      options = Map(IndexCandidates.IndexRelationMarker -> entry.name))(spark)

    val resolver = spark.sessionState.conf.resolver
    val output: Seq[AttributeReference] =
      indexSchema.fields.toIndexedSeq.map { f =>
        original.output
          .collectFirst { case a: AttributeReference if resolver(a.name, f.name) => a }
          .getOrElse(AttributeReference(f.name, f.dataType, f.nullable)())
      }
    new LogicalRelation(relation, output, None, false, None)
  }

  /**
   * Hybrid scan: the index covers the still-valid indexed files; appended
   * source files are read directly and unioned in; rows from deleted
   * files are dropped via the lineage column (reference:
   * index/covering/CoveringIndexRuleUtils.scala:146-342
   * `transformPlanToUseHybridScan` + `transformPlanToReadAppendedFiles`).
   *
   * The union's first child keeps the original attribute ids, so
   * Filter/Project nodes above the swapped scan stay valid. Partitioned
   * sources recover partition values from appended paths via basePath
   * (see [[appendedLeg]]).
   *
   * Scale: the appended slice is bounded by the hybrid thresholds (≤30%
   * of source bytes), so the union's second leg stays small relative to
   * the indexed leg; at refresh time the slice folds into the index.
   */
  def hybridScan(
      spark: SparkSession,
      original: LogicalPlan,
      m: CandidateMatch): LogicalPlan = {
    val entry = m.entry
    // covering-style descriptors only (covering or z-order); deletes need
    // the lineage column in the index data — rules gate on hasLineage
    val refCols = entry.descriptor.referencedColumns
    val indexLeg = indexLegProjected(spark, original, m, refCols,
      useBucketSpec = false)
    // deletes-only drift: nothing to union (and a zero-path spark.read on
    // a partitioned source would fail partition inference)
    if (m.appended.isEmpty) return indexLeg
    val appended =
      appendedLeg(spark, original, entry, m, refCols,
        indexLeg.output.map(_.dataType))

    Union(Seq(indexLeg, appended))
  }


  /** Index leg shared by both hybrid scans: the index scan (original
    * attribute ids preserved), minus deleted-file rows via the lineage
    * column, projected to the index's referenced columns under their
    * physical names. */
  private def indexLegProjected(
      spark: SparkSession,
      original: LogicalPlan,
      m: CandidateMatch,
      refCols: Seq[String],
      useBucketSpec: Boolean): Project = {
    val entry = m.entry
    val resolver = spark.sessionState.conf.resolver
    val indexRel = indexScan(spark, original, entry, useBucketSpec)
    val indexLeg: LogicalPlan =
      if (m.deleted.isEmpty) indexRel
      else {
        val lineage = indexRel.output
          .find(_.name == CoveringIndexDescriptor.LineageColumn)
          .getOrElse(throw new IllegalStateException(
            s"hybrid scan with deletes requires lineage in index ${entry.name}"))
        val deletedIds = m.deleted.map(f =>
          Literal(f.id): org.apache.spark.sql.catalyst.expressions.Expression)
        Filter(Not(In(lineage, deletedIds)), indexRel)
      }
    val projectedCols = refCols.map { c =>
      val phys = graft.index.NestedColumns.physicalName(c)
      indexRel.output.find(a => resolver(a.name, phys)).getOrElse(
        throw new IllegalStateException(
          s"index ${entry.name} data is missing column $phys"))
    }
    Project(projectedCols, indexLeg)
  }

  /**
   * Appended-files leg shared by both hybrid scans: a clone of the
   * original relation restricted to the appended files, projected to the
   * index's referenced columns (cast to the index leg's types so the
   * union lines up).
   *
   * Partitioned sources read through `spark.read` with the `basePath`
   * option so partition-column VALUES are recovered from the appended
   * file paths (reference: CoveringIndexRuleUtils.scala:302-342
   * `transformPlanToReadAppendedFiles`); inferred partition types can
   * differ from the logged schema (e.g. date-typed dirs), which the cast
   * normalizes.
   */
  private def appendedLeg(
      spark: SparkSession,
      original: LogicalPlan,
      entry: IndexLogEntry,
      m: CandidateMatch,
      refCols: Seq[String],
      targetTypes: Seq[org.apache.spark.sql.types.DataType]): LogicalPlan = {
    val resolver = spark.sessionState.conf.resolver
    // file-based sources clone their HadoopFsRelation; a table-format
    // leaf (DSv2 Iceberg) has none, so its appended files are read
    // directly through spark.read from the LOGGED relation metadata —
    // Iceberg/Delta data files are plain parquet underneath
    val hfsOpt = original match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => Some((l, h))
        case _ => None
      }
      case _ => None
    }
    val appendedRel: LogicalPlan =
      if (hfsOpt.exists(_._2.partitionSchema.isEmpty)) {
        val (orig, hfs) = hfsOpt.get
        val appendedLocation = new InMemoryFileIndex(
          spark,
          m.appended.map(f => new Path(f.path)),
          Map.empty[String, String],
          Some(hfs.dataSchema),
          FileStatusCache.getOrCreate(spark),
          None,
          None)
        val appendedHfs = hfs.copy(location = appendedLocation,
          options = hfs.options +
            (IndexCandidates.IndexRelationMarker -> entry.name))(spark)
        new LogicalRelation(appendedHfs,
          orig.output.map(a =>
            AttributeReference(a.name, a.dataType, a.nullable)()),
          None, false, None)
      } else {
        val rel = entry.relations.head
        val dataSchema = hfsOpt.map(_._2.dataSchema).getOrElse(
          org.apache.spark.sql.types.DataType.fromJson(rel.schemaJson)
            .asInstanceOf[org.apache.spark.sql.types.StructType])
        val readFormat = rel.format match {
          case "iceberg" | "delta" => "parquet"
          case f => f
        }
        // basePath must be an ANCESTOR of every loaded file: a multi-root
        // source (spark.read.parquet(a, b)) gets one load per root, with
        // each appended file grouped under the root that contains it
        // (qualification-tolerant match — see SourcePaths.groupByRoot)
        graft.index.SourcePaths
          .groupByRoot(rel.rootPaths, m.appended.map(_.path))
          .map { case (base, files) =>
            spark.read
              .schema(dataSchema)
              .format(readFormat)
              .options(rel.options.filter { case (k, _) => k.toLowerCase != "path" } +
                ("basePath" -> base) +
                (IndexCandidates.IndexRelationMarker -> entry.name))
              .load(files: _*)
          }.reduce(_.unionByName(_))
          .queryExecution.analyzed
      }
    val appendedCols = refCols.zip(targetTypes).map { case (c, dt) =>
      // nested paths (`a.b.c`) are computed from the source via a
      // GetStructField chain and flattened to the index's physical name —
      // the same shape the index leg carries, so the union lines up
      val expr: org.apache.spark.sql.catalyst.expressions.Expression =
        appendedRel.output.find(a => resolver(a.name, c)).getOrElse {
          val segs = c.split('.')
          val root =
            if (segs.length < 2) None
            else appendedRel.output.find(a => resolver(a.name, segs.head))
          root.map(r => segs.tail.foldLeft(
            r: org.apache.spark.sql.catalyst.expressions.Expression)((e, f) =>
              org.apache.spark.sql.catalyst.expressions.ExtractValue(
                e, org.apache.spark.sql.catalyst.expressions.Literal(f), resolver)))
            .getOrElse(throw new IllegalStateException(
              s"appended leg missing column $c for index ${entry.name}"))
        }
      val phys = graft.index.NestedColumns.physicalName(c)
      expr match {
        case a: AttributeReference if a.dataType == dt => a
        case e =>
          val cast = if (e.dataType == dt) e
            else org.apache.spark.sql.catalyst.expressions.Cast(e, dt)
          org.apache.spark.sql.catalyst.expressions.Alias(cast, phys)()
      }
    }
    Project(appendedCols, appendedRel)
  }

  /**
   * Bucketed hybrid scan for the JOIN path: index leg keeps its
   * HashPartitioning (bucketSpec claimed), the appended leg is shuffled
   * to the same bucketing, and [[graft.plans.BucketUnion]] zip-unions
   * them partition-wise — so only the (small) appended slice shuffles and
   * the join above still sees hash-clustered input (reference:
   * CoveringIndexRuleUtils.scala:357-417).
   */
  def hybridBucketedScan(
      spark: SparkSession,
      original: LogicalPlan,
      m: CandidateMatch): LogicalPlan = {
    val entry = m.entry
    val d = entry.descriptor.asInstanceOf[CoveringIndexDescriptor]
    val resolver = spark.sessionState.conf.resolver

    val indexLeg = indexLegProjected(spark, original, m, d.referencedColumns,
      useBucketSpec = true)
    if (m.appended.isEmpty) return indexLeg

    val appendedLegProj =
      appendedLeg(spark, original, entry, m, d.referencedColumns,
        indexLeg.output.map(_.dataType))
    val keyAttrs = d.physicalIndexedColumns.map(c =>
      appendedLegProj.output.find(a => resolver(a.name, c)).get
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression])
    val repartitioned = RepartitionByExpression(
      keyAttrs, appendedLegProj, Some(d.numBuckets))

    graft.plans.BucketUnion(Seq(indexLeg, repartitioned),
      d.indexedColumns, d.numBuckets)
  }
}
