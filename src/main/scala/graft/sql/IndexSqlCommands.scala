package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.Graft
import graft.index.covering.CoveringIndexConfig
import graft.index.dataskipping.{DataSkippingIndexConfig, SketchSpec}
import graft.index.sources.{DeltaTable, IcebergTable, LakeTable}
import graft.index.zorder.ZOrderIndexConfig

/**
 * SQL-statement surface for the INDEX lifecycle — the engine's core
 * artifact, previously creatable only through the Scala/Python API:
 *
 * {{{
 *   CREATE INDEX ci_ord ON parquet.`/data/orders` (o_orderkey)
 *     INCLUDE (o_totalprice) USING COVERING
 *   REFRESH INDEX ci_ord INCREMENTAL
 *   OPTIMIZE INDEX ci_ord FULL
 *   SHOW INDEXES
 *   DROP INDEX ci_ord
 * }}}
 *
 * Each command is the thinnest shim onto the [[graft.Graft]] API (the
 * same code path the programmatic surface uses). `USING` kinds:
 * COVERING (default), ZORDER, DATASKIPPING (the column list becomes
 * min-max sketches; INCLUDE applies to the covering kinds only).
 * Sources: `parquet.` for plain directories, `graft_delta.` /
 * `graft_iceberg.` / `graft_lake.` for lake tables.
 */
case class GraftCreateIndexCommand(name: String, provider: String,
    path: String, columns: Seq[String], include: Seq[String],
    using: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val df = provider match {
      case "parquet" => spark.read.parquet(path)
      case "graft_delta" => DeltaTable.read(spark, path)
      case "graft_iceberg" => IcebergTable.read(spark, path)
      case _ => LakeTable.read(spark, path)
    }
    val config = using match {
      case "zorder" => ZOrderIndexConfig(name, columns, include)
      case "dataskipping" =>
        require(include.isEmpty,
          "CREATE INDEX ... USING DATASKIPPING takes no INCLUDE list " +
            "(sketches summarize the indexed columns; INCLUDE applies " +
            "to COVERING/ZORDER)")
        DataSkippingIndexConfig(name, columns.map(SketchSpec.minMax))
      case _ => CoveringIndexConfig(name, columns, include)
    }
    new Graft(spark).createIndex(df, config)
    Nil
  }
}

/** `DROP INDEX name` → [[Graft.deleteIndex]] (soft delete; VACUUM INDEX
  * reclaims, RESTORE INDEX undoes). */
case class GraftDropIndexCommand(name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    new Graft(spark).deleteIndex(name)
    Nil
  }
}

/** `REFRESH INDEX name [FULL|INCREMENTAL|QUICK]` → [[Graft.refreshIndex]]. */
case class GraftRefreshIndexCommand(name: String, mode: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    new Graft(spark).refreshIndex(name, mode)
    Nil
  }
}

/** `OPTIMIZE INDEX name [QUICK|FULL]` → [[Graft.optimizeIndex]]. */
case class GraftOptimizeIndexCommand(name: String, mode: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    new Graft(spark).optimizeIndex(name, mode)
    Nil
  }
}

/** `VACUUM INDEX name` → [[Graft.vacuumIndex]]. */
case class GraftVacuumIndexCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    new Graft(spark).vacuumIndex(name)
    Nil
  }
}

/** `RESTORE INDEX name` → [[Graft.restoreIndex]]. */
case class GraftRestoreIndexCommand(name: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    new Graft(spark).restoreIndex(name)
    Nil
  }
}

/** `SHOW INDEXES` → [[Graft.indexes]] (the catalog listing, one row per
  * stable/creating index). */
case class GraftShowIndexesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType)(),
    AttributeReference("kind", StringType)(),
    AttributeReference("indexedColumns", ArrayType(StringType))(),
    AttributeReference("referencedColumns", ArrayType(StringType))(),
    AttributeReference("numIndexFiles", IntegerType)(),
    AttributeReference("indexSizeBytes", LongType)(),
    AttributeReference("state", StringType)(),
    AttributeReference("indexLocation", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    new Graft(spark).indexes.collect().toSeq
}
