package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{expr, lit}
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

import graft.index.sources.{LakeInspect, LakeTable}

/**
 * SQL-statement surface for the lakehouse verbs: each command is the
 * thinnest possible shim from a parsed statement onto the existing
 * [[LakeTable]] API, so `spark.sql("MERGE INTO graft_delta.`/p` ...")`
 * and `LakeTable.merge(...)` are the SAME code path (one oracle row,
 * `lake_sql_merge`, pins them hash-identical). Commands execute
 * eagerly on `spark.sql(...)` like every Spark command.
 *
 * delta-spark's SQL extension is the model (DeltaSqlParser routing
 * OPTIMIZE/VACUUM/DESCRIBE DETAIL to table commands); the reference
 * itself is API-only, so this is parity-plus usability.
 */
private[sql] object LakeSqlCommands {
  /** Single `id` column: the committed version / snapshot id. */
  def idOutput: Seq[Attribute] =
    Seq(AttributeReference("id", LongType, nullable = false)())
}

/** `MERGE INTO <lake> [t] USING <src> [s] ON t.k = s.k WHEN [MATCHED AND
  * c THEN DELETE] WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
  * INSERT *` — the CDC-upsert shape [[LakeTable.merge]] implements.
  * `source` is resolved at run time (temp views, subqueries, and other
  * lake paths all work). */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    keys: Seq[String], deleteCondition: Option[Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftBridge.ofRows(spark, source)
    Seq(Row(LakeTable.merge(spark, path, src, keys, deleteCondition)))
  }
}

/** `UPDATE <lake> SET c = e, ... [WHERE cond]` → [[LakeTable.update]]. */
case class GraftUpdateCommand(path: String,
    set: Seq[(String, Column)], condition: Option[Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.update(spark, path,
      condition.getOrElse(lit(true)), set.toMap)))
}

/** `DELETE FROM <lake> [WHERE cond]` → [[LakeTable.deleteWhere]]. */
case class GraftDeleteCommand(path: String, condition: Option[Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.deleteWhere(spark, path,
      condition.getOrElse(lit(true)))))
}

/** `OPTIMIZE <lake> [WHERE pred] [ZORDER BY (c, ...)]` →
  * [[LakeTable.optimize]] (bin-pack, or z-order when columns given;
  * WHERE scopes the rewrite to matching partitions). The predicate
  * text parses lazily at run so it resolves against the table. */
case class GraftOptimizeCommand(path: String, zorderBy: Seq[String],
    whereSql: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.optimize(spark, path, zorderBy = zorderBy,
      where = whereSql.map(expr))))
}

/** `VACUUM <lake> [RETAIN n HOURS]` → [[LakeTable.cleanup]]; returns
  * one row per physically removed file, like delta-spark's VACUUM
  * returns the vacuumed path. */
case class GraftVacuumCommand(path: String, retainHours: Option[Double])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("removed_path", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val retentionMs = retainHours
      .map(h => (h * 3600 * 1000).toLong)
      .getOrElse(7L * 24 * 3600 * 1000)
    LakeTable.cleanup(spark, path, retentionMs).map(Row(_))
  }
}

/** `DESCRIBE DETAIL <lake>` → [[LakeInspect.detail]] (one row). */
case class GraftDescribeDetailCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    LakeInspect.detailSchema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
  override def run(spark: SparkSession): Seq[Row] =
    LakeInspect.detail(spark, path).collect().toSeq
}

/** `DESCRIBE HISTORY <lake>` → [[LakeTable.history]], newest first.
  * The id column is the Delta version / Iceberg snapshot id, named
  * `id` uniformly (the statement can't know the format statically). */
case class GraftDescribeHistoryCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("id", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType)(),
    AttributeReference("operation", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    LakeTable.history(spark, path)
      .toDF("id", "timestamp", "operation").collect().toSeq
}

/** `INSERT [OVERWRITE] INTO <lake>[@branch] <query>` →
  * [[LakeTable.append]]. The query plan resolves at run time like the
  * MERGE source; `@branch` targets an Iceberg branch (WAP audit
  * writes — main stays put until FAST FORWARD publishes). */
case class GraftInsertCommand(path: String, query: LogicalPlan,
    overwrite: Boolean, branch: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.append(spark, path,
      GraftBridge.ofRows(spark, query), overwrite, branch)))
}

/** `RESTORE [TABLE] <lake> TO VERSION AS OF n | TO TIMESTAMP AS OF ts`
  * → [[LakeTable.undoTo]] (Delta RESTORE / Iceberg rollback). A
  * timestamp resolves to the latest id committed at or before it,
  * using the same clock as time-travel reads. */
case class GraftRestoreCommand(path: String, version: Option[Long],
    tsMillis: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, max}
    val id = version.getOrElse {
      val ts = new java.sql.Timestamp(tsMillis.get)
      LakeTable.history(spark, path).toDF("id", "timestamp", "operation")
        .filter(col("timestamp") <= lit(ts))
        .agg(max(col("id"))).head() match {
          case r if r.isNullAt(0) => throw new IllegalArgumentException(
            s"RESTORE at $path: no commit at or before $ts")
          case r => r.getLong(0)
        }
    }
    Seq(Row(LakeTable.undoTo(spark, path, id)))
  }
}

/** `CONVERT TO DELTA parquet.`/p`` / `CONVERT TO ICEBERG parquet.`/p``
  * → in-place metadata adoption of an existing parquet directory
  * ([[graft.index.sources.DeltaTable.convert]] /
  * [[graft.index.sources.IcebergTable.migrate]]). */
case class GraftConvertCommand(path: String, toFormat: String,
    partitionBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] = Seq(Row(toFormat match {
    case "delta" =>
      graft.index.sources.DeltaTable.convert(spark, path, partitionBy)
    case _ =>
      require(partitionBy.isEmpty, "CONVERT TO ICEBERG does not take " +
        "PARTITIONED BY (the migrated layout is unpartitioned adoption)")
      graft.index.sources.IcebergTable.migrate(spark, path)
  }))
}

/** `ANALYZE TABLE <lake> COMPUTE STATISTICS` → per-file stats
  * collection ([[graft.index.sources.DeltaTable.computeStats]]).
  * Iceberg tables refuse: their manifests carry the stats already. */
case class GraftAnalyzeCommand(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] = {
    require(LakeTable.formatOf(spark, path) == "delta",
      s"ANALYZE at $path: Iceberg manifests already carry per-file " +
        "stats; ANALYZE applies to graft_delta tables only")
    Seq(Row(graft.index.sources.DeltaTable.computeStats(spark, path)))
  }
}

/** `ALTER TABLE <lake> ADD CONSTRAINT n CHECK (expr)` →
  * [[LakeTable.addConstraint]] — validates existing rows, then every
  * later write enforces the rule. The expression text passes through
  * verbatim: it re-parses against the table at each write. */
case class GraftAddConstraintCommand(path: String, name: String,
    checkSql: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.addConstraint(spark, path, name, checkSql)))
}

/** `ALTER TABLE <lake> DROP CONSTRAINT n` → [[LakeTable.dropConstraint]]. */
case class GraftDropConstraintCommand(path: String, name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.dropConstraint(spark, path, name)))
}

/** `ALTER TABLE <lake> ALTER COLUMN c TYPE t` → [[LakeTable.widenColumn]]
  * (Delta typeWidening / Iceberg primitive promotion; metadata-only). */
case class GraftAlterColumnTypeCommand(path: String, column: String,
    to: org.apache.spark.sql.types.DataType) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.widenColumn(spark, path, column, to)))
}

/** `ALTER TABLE <lake> SYNC IDENTITY` → [[LakeTable.syncIdentity]]. */
case class GraftSyncIdentityCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.syncIdentity(spark, path)))
}

/** `SHOW TBLPROPERTIES <lake>` → one (key, value) row per
  * configuration entry, sorted by key. */
case class GraftShowPropertiesCommand(path: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("key", StringType, nullable = false)(),
    AttributeReference("value", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    LakeTable.properties(spark, path).toSeq.sortBy(_._1)
      .map { case (k, v) => Row(k, v) }
}

/** `ALTER TABLE <lake> SET TBLPROPERTIES ('k'='v', …)` →
  * [[LakeTable.setProperties]]. */
case class GraftSetPropertiesCommand(path: String,
    props: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.setProperties(spark, path, props)))
}

/** `ALTER TABLE <lake> UNSET TBLPROPERTIES ('k', …)` →
  * [[LakeTable.unsetProperties]]. */
case class GraftUnsetPropertiesCommand(path: String, keys: Set[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.unsetProperties(spark, path, keys)))
}

/** `ALTER TABLE <lake> CLUSTER BY (c, ...) | CLUSTER BY NONE` →
  * [[LakeTable.clusterBy]] (Delta liquid clustering). */
case class GraftClusterByCommand(path: String, columns: Seq[String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.clusterBy(spark, path, columns)))
}

/** `ALTER TABLE <lake> ADD COLUMN[S] (a T, b.c T, …)` →
  * [[LakeTable.addColumns]] (metadata-only nullable append, ONE commit;
  * nested paths target struct fields). */
case class GraftAddColumnsCommand(path: String,
    columns: Seq[(Seq[String], org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.addColumns(spark, path, columns)))
}

/** `ALTER TABLE <lake> RENAME COLUMN old[.nested] TO new` →
  * [[LakeTable.renameColumnAt]] (logical rename, data untouched). */
case class GraftRenameColumnCommand(path: String, oldPath: Seq[String],
    newName: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.renameColumnAt(spark, path, oldPath, newName)))
}

/** `ALTER TABLE <lake> DROP COLUMN[S] a[, b.c …]` →
  * [[LakeTable.dropColumnAt]] per column. */
case class GraftDropColumnCommand(path: String, columns: Seq[Seq[String]])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(columns.map(c => LakeTable.dropColumnAt(spark, path, c)).last))
}

/** `ALTER TABLE <lake> CREATE [OR REPLACE] BRANCH|TAG name [AS OF
  * VERSION n] [RETAIN n DAYS] [WITH SNAPSHOT RETENTION …]` →
  * [[LakeTable.createRefFull]] (Iceberg refs; the WAP first act). */
case class GraftCreateRefCommand(path: String, name: String,
    refType: String, at: Option[Long], orReplace: Boolean = false,
    maxRefAgeMs: Option[Long] = None,
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.createRefFull(spark, path, name, refType, at,
      orReplace, maxRefAgeMs, minSnapshotsToKeep, maxSnapshotAgeMs)))
}

/** `ALTER TABLE <lake> DROP BRANCH|TAG [IF EXISTS] name` →
  * [[LakeTable.dropRef]]. */
case class GraftDropRefCommand(path: String, name: String,
    refType: String, ifExists: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    LakeTable.dropRef(spark, path, name, refType, ifExists)
    Nil
  }
}

/** `ALTER TABLE <lake> FAST FORWARD branch` →
  * [[LakeTable.fastForward]] (the WAP publish). */
case class GraftFastForwardCommand(path: String, branch: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(LakeTable.fastForward(spark, path, branch)))
}

/** `CREATE TABLE graft_<fmt>.`/p` (<schema>) [PARTITIONED BY (...)]`
  * — explicit-schema EMPTY table (the non-CTAS DDL): version 0 holds
  * metaData only, the first append provides data. */
case class GraftCreateEmptyTableCommand(path: String, format: String,
    partitionBy: Seq[String],
    tableSchema: org.apache.spark.sql.types.StructType)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.index.sources.{DeltaLog, DeltaTable, IcebergMeta, IcebergTable}
    require(!DeltaLog.isDeltaTable(spark, path) &&
      !IcebergMeta.isIcebergTable(spark, path),
      s"CREATE TABLE at $path: a lake table already exists there")
    partitionBy.foreach(c => require(tableSchema.fieldNames.contains(c),
      s"CREATE TABLE at $path: partition column '$c' is not in the " +
        s"declared schema (${tableSchema.fieldNames.mkString(", ")})"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], tableSchema)
    Seq(Row(format match {
      case "delta" => DeltaTable.create(empty, path, partitionBy)
      case "iceberg" => IcebergTable.create(empty, path,
        partitionColumns = partitionBy)
      case other => throw new IllegalArgumentException(
        s"CREATE TABLE needs an explicit format (graft_delta or " +
          s"graft_iceberg), got graft_$other")
    }))
  }
}

/** `CREATE TABLE graft_<fmt>.`/p` [PARTITIONED BY (...)] AS <select>`
  * — path-addressed CTAS. Refuses an existing table (CREATE, not
  * REPLACE); `graft_lake` is refused because a new table has no format
  * to auto-detect. */
case class GraftCreateTableCommand(path: String, format: String,
    partitionBy: Seq[String], query: LogicalPlan)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = LakeSqlCommands.idOutput
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.index.sources.{DeltaLog, DeltaTable, IcebergMeta, IcebergTable}
    require(!DeltaLog.isDeltaTable(spark, path) &&
      !IcebergMeta.isIcebergTable(spark, path),
      s"CREATE TABLE at $path: a lake table already exists there")
    val df = GraftBridge.ofRows(spark, query)
    Seq(Row(format match {
      case "delta" => DeltaTable.create(df, path, partitionBy)
      case "iceberg" => IcebergTable.create(df, path,
        partitionColumns = partitionBy)
      case other => throw new IllegalArgumentException(
        s"CREATE TABLE needs an explicit format (graft_delta or " +
          s"graft_iceberg), got graft_$other")
    }))
  }
}
