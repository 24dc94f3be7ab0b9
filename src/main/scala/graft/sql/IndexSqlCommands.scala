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
 * sketches; INCLUDE applies to the covering kinds only). `OPTIONS`
 * maps onto the existing config surface per kind:
 *
 *  - COVERING: `buckets=N` (bucket count for the layout — otherwise
 *    `spark.graft.index.numBuckets`);
 *  - DATASKIPPING: `sketch='minmax'|'bloom'|'valuelist'` plus the
 *    sketch's own parameters — bloom: `expectedItems`, `fpp`;
 *    valuelist: `maxValues`;
 *  - ZORDER takes no options.
 *
 * Unknown keys refuse loudly — a typo'd option must never silently
 * build a default index. Sources: `parquet.` for plain directories,
 * `graft_delta.` / `graft_iceberg.` / `graft_lake.` for lake tables.
 */
case class GraftCreateIndexCommand(name: String, provider: String,
    path: String, columns: Seq[String], include: Seq[String],
    using: String, options: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil

  private def requireKeys(allowed: Set[String]): Unit = {
    val unknown = options.keySet -- allowed
    require(unknown.isEmpty,
      s"Unknown OPTIONS for USING $using: ${unknown.toSeq.sorted
        .mkString(", ")} (supported: ${
        if (allowed.isEmpty) "none" else allowed.toSeq.sorted.mkString(", ")})")
  }
  private def longOpt(key: String): Option[Long] = options.get(key).map { v =>
    try v.toLong catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"OPTIONS $key must be an integer, got '$v'") }
  }
  private def doubleOpt(key: String): Option[Double] = options.get(key).map { v =>
    try v.toDouble catch { case _: NumberFormatException =>
      throw new IllegalArgumentException(
        s"OPTIONS $key must be a number, got '$v'") }
  }

  override def run(spark: SparkSession): Seq[Row] = {
    val df = provider match {
      case "parquet" => spark.read.parquet(path)
      case "graft_delta" => DeltaTable.read(spark, path)
      case "graft_iceberg" => IcebergTable.read(spark, path)
      case _ => LakeTable.read(spark, path)
    }
    val config = using match {
      case "zorder" =>
        requireKeys(Set.empty)
        ZOrderIndexConfig(name, columns, include)
      case "dataskipping" =>
        require(include.isEmpty,
          "CREATE INDEX ... USING DATASKIPPING takes no INCLUDE list " +
            "(sketches summarize the indexed columns; INCLUDE applies " +
            "to COVERING/ZORDER)")
        requireKeys(Set("sketch", "expecteditems", "fpp", "maxvalues"))
        val sketches = options.getOrElse("sketch", "minmax") match {
          case "minmax" =>
            requireKeys(Set("sketch"))
            columns.map(SketchSpec.minMax)
          case "bloom" =>
            requireKeys(Set("sketch", "expecteditems", "fpp"))
            columns.map(SketchSpec.bloom(_,
              expectedItems = longOpt("expecteditems").getOrElse(10000L),
              fpp = doubleOpt("fpp").getOrElse(0.01)))
          case "valuelist" =>
            requireKeys(Set("sketch", "maxvalues"))
            columns.map(SketchSpec.valueList(_,
              maxValues = longOpt("maxvalues").getOrElse(1000L).toInt))
          case other => throw new IllegalArgumentException(
            s"Unknown sketch kind '$other' (supported: minmax, bloom, " +
              "valuelist)")
        }
        DataSkippingIndexConfig(name, sketches)
      case _ =>
        requireKeys(Set("buckets"))
        // buckets=N threads through the CONFIG (read at toDescriptor
        // time), never through the shared session conf: a concurrent
        // CREATE INDEX on another thread must not observe the override
        val bucketOverride = longOpt("buckets")
        bucketOverride.foreach(n => require(n > 0,
          s"OPTIONS buckets must be positive, got $n"))
        // guard the Long→Int narrowing: 2^32+1 is > 0 but would WRAP
        // to 1 and silently build a one-bucket layout
        bucketOverride.foreach(n => require(n <= Int.MaxValue,
          s"OPTIONS buckets must fit an Int, got $n"))
        CoveringIndexConfig(name, columns, include,
          numBuckets = bucketOverride.map(_.toInt))
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
