package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.CoveringIndexConfig
import graft.index.sources.IcebergTable

/**
 * Index rewrites must refuse any scan whose METADATA COLUMNS
 * (`_metadata.file_path` / `_metadata.row_index`) are consumed above it.
 * Merge-on-read plans (Iceberg v2 positional deletes, Delta deletion
 * vectors) anti-join on exactly those columns: substituting the scan with
 * an index relation would change file paths and row positions, and the
 * anti-join would silently resurrect deleted rows.
 *
 * The protection is structural, and this suite PINS it: when `_metadata`
 * is consumed, Spark's AddMetadataColumns materializes the attribute into
 * the relation's own `output`, so (a) bare-Filter rewrites see it in
 * `filter.output` and (b) Project-shape rewrites see `_metadata.*`
 * accesses — either way no covering/z-order index can cover the name and
 * every coverage check refuses. DataSkipping substitution is exempt AND
 * safe: it prunes files on the same relation instance (output exprIds
 * preserved), which cannot perturb (file_path, row_index) of surviving
 * rows. If a future rule bypasses coverage or rebuilds relation output,
 * the first test here fails with resurrected rows.
 */
class MetadataGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  private def withGraft[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-meta-guard-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally {
      spark.conf.unset(GraftConf.SystemPathKey)
      rules.IndexCatalog.invalidate(spark)
    }
  }

  test("MOR safety: no rewrite under a plan that consumes _metadata columns") {
    withGraft { g =>
      val loc = Files.createTempDirectory("graft-mor-idx-").toString
      IcebergTable.create(customer, loc)
      // the index covers EVERY relation column: a bare-Filter rewrite at
      // the node under the MOR projection passes the coverage check, so
      // only an explicit metadata guard can stop the substitution
      g.createIndex(IcebergTable.read(spark, loc),
        CoveringIndexConfig("ci_mor", Seq("c_nationkey"),
          customer.columns.filterNot(_ == "c_nationkey").toSeq))
      // row-level delete: data files unchanged, so the index still sees an
      // EXACT file match — only the coverage refusal on the materialized
      // _metadata attribute stands between the rewrite and resurrected rows
      IcebergTable.deleteWhere(spark, loc, col("c_custkey") % 7 === 3)

      val q = IcebergTable.read(spark, loc)
        .filter(col("c_nationkey") === 5)
        .select(col("c_acctbal"))
      val expected = customer
        .filter(col("c_custkey") % 7 =!= 3 && col("c_nationkey") === 5)
        .count()
      assert(q.count() == expected)
      assert(!q.queryExecution.executedPlan.toString.contains("ci_mor"),
        "index must not substitute a scan whose _metadata is consumed")
    }
  }

  test("MOR safety holds on the Delta deletion-vector leg too") {
    import graft.index.sources.DeltaTable
    withGraft { g =>
      val loc = Files.createTempDirectory("graft-mor-dv-").toString
      DeltaTable.create(customer, loc)
      g.createIndex(DeltaTable.read(spark, loc),
        CoveringIndexConfig("ci_mor_dv", Seq("c_nationkey"),
          customer.columns.filterNot(_ == "c_nationkey").toSeq))
      DeltaTable.deleteWhere(spark, loc, col("c_custkey") % 7 === 3)

      val q = DeltaTable.read(spark, loc)
        .filter(col("c_nationkey") === 5)
        .select(col("c_acctbal"))
      val expected = customer
        .filter(col("c_custkey") % 7 =!= 3 && col("c_nationkey") === 5)
        .count()
      assert(q.count() == expected)
      assert(!q.queryExecution.executedPlan.toString.contains("ci_mor_dv"),
        "index must not substitute a scan whose _metadata is consumed")
      // and whyNot NAMES the blocker instead of a generic schema excuse
      val why = g.whyNot(q, "ci_mor_dv")
      assert(why.contains("MERGE_ON_READ_METADATA"),
        s"whyNot should name the MOR blocker, got:\n$why")
    }
  }

  test("purge + refresh restores index acceleration after a DV delete") {
    import graft.index.sources.DeltaTable
    withGraft { g =>
      val loc = Files.createTempDirectory("graft-mor-purge-").toString
      DeltaTable.create(customer, loc)
      g.createIndex(DeltaTable.read(spark, loc),
        CoveringIndexConfig("ci_purge", Seq("c_nationkey"), Seq("c_acctbal")))
      DeltaTable.deleteWhere(spark, loc, col("c_custkey") % 7 === 3)
      // MOR read: guard blocks the rewrite (previous test pins this).
      // Purge rewrites survivors into plain files; a full refresh then
      // re-anchors the index on the DV-free snapshot and rewrites resume.
      DeltaTable.purge(spark, loc)
      g.refreshIndex("ci_purge", "full")
      val q = DeltaTable.read(spark, loc)
        .filter(col("c_nationkey") === 5)
        .select(col("c_acctbal"))
      val expected = customer
        .filter(col("c_custkey") % 7 =!= 3 && col("c_nationkey") === 5)
        .count()
      assert(q.count() == expected)
      assert(q.queryExecution.executedPlan.toString.contains("ci_purge"),
        "index must re-apply once the table is DV-free and refreshed")
    }
  }

  test("control: the same index accelerates the pre-delete (non-MOR) snapshot") {
    withGraft { g =>
      val loc = Files.createTempDirectory("graft-mor-ctl-").toString
      IcebergTable.create(customer, loc)
      g.createIndex(IcebergTable.read(spark, loc),
        CoveringIndexConfig("ci_ctl", Seq("c_nationkey"), Seq("c_acctbal")))
      IcebergTable.deleteWhere(spark, loc, col("c_custkey") % 7 === 3)

      // time travel to the pre-delete snapshot: no delete files, no
      // anti-join, no metadata consumption — the rewrite must still fire
      val q = IcebergTable.read(spark, loc, snapshotAsOf = Some(1L))
        .filter(col("c_nationkey") === 5)
        .select(col("c_acctbal"))
      assert(q.count() ==
        customer.filter(col("c_nationkey") === 5).count())
      assert(q.queryExecution.executedPlan.toString.contains("ci_ctl"),
        "guard must not over-exclude plans that never touch _metadata")
    }
  }
}
