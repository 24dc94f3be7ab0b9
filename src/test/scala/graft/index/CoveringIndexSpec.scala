package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Graft, TestSpark}
import graft.index.covering.{CoveringIndexConfig, CoveringIndexDescriptor}

class CoveringIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withSystemPath[T](body: Graft => T): T = {
    val dir = Files.createTempDirectory("graft-test-").toString
    spark.conf.set(GraftConf.SystemPathKey, dir)
    try body(new Graft(spark))
    finally spark.conf.unset(GraftConf.SystemPathKey)
  }

  private def lineitem =
    spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")

  test("create covering index end-to-end") {
    withSystemPath { g =>
      g.createIndex(lineitem,
        CoveringIndexConfig("ci_li", Seq("l_orderkey"), Seq("l_quantity")))

      val entries = g.indexManager.getIndexes()
      assert(entries.map(_.name) == Seq("ci_li"))
      val e = entries.head
      assert(e.state == IndexState.Active)
      assert(e.content.files.nonEmpty)
      assert(e.relations.head.format == "parquet")
      assert(e.relations.head.files.nonEmpty)

      // bucketed layout: file names carry bucket ids (_00000 etc.)
      assert(e.content.files.forall(_.path.contains("part-")))

      // index data is readable parquet with exactly the referenced columns
      val data = spark.read.parquet(e.content.root)
      assert(data.columns.toSet == Set("l_orderkey", "l_quantity"))
      assert(data.count() == lineitem.count())

      // and is sorted within files by the indexed column
      val firstFile = e.content.files.head.path
      val vals = spark.read.parquet(firstFile)
        .select("l_orderkey").collect().map(_.getLong(0))
      assert(vals.sameElements(vals.sorted), "bucket file not sorted")
    }
  }

  test("catalog listing, delete/restore/vacuum lifecycle") {
    withSystemPath { g =>
      g.createIndex(lineitem, CoveringIndexConfig("ci_a", Seq("l_partkey")))
      assert(g.indexes.where(col("name") === "ci_a")
        .select("state").head().getString(0) == "ACTIVE")

      g.deleteIndex("ci_a")
      assert(g.indexManager.getIndexes(Set(IndexState.Deleted)).nonEmpty)
      assert(g.indexManager.getIndexes(Set(IndexState.Active)).isEmpty)

      g.restoreIndex("ci_a")
      assert(g.indexManager.getIndexes(Set(IndexState.Active)).map(_.name) == Seq("ci_a"))

      g.deleteIndex("ci_a")
      g.vacuumIndex("ci_a")
      assert(g.indexManager.getIndexes(IndexState.stable).isEmpty)
    }
  }

  test("refresh full rebuilds into a new version") {
    withSystemPath { g =>
      g.createIndex(lineitem, CoveringIndexConfig("ci_r", Seq("l_suppkey")))
      val v0 = g.indexManager.getIndexes().head.content.root
      g.refreshIndex("ci_r")
      val e = g.indexManager.getIndexes().head
      assert(e.content.root != v0)
      assert(e.state == IndexState.Active)
      // vacuum drops the outdated version dir
      g.vacuumIndex("ci_r")
      val fs = new org.apache.hadoop.fs.Path(v0)
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(v0)))
    }
  }

  test("log entry json roundtrip") {
    val d = CoveringIndexDescriptor(Seq("a"), Seq("b"), 8, "{}", hasLineage = false)
    val entry = IndexLogEntry("x", d,
      ContentMeta("/tmp/x/v__0", Seq(FileMeta("/tmp/x/v__0/f1", 1, 2, 0))),
      Seq(RelationMeta(Seq("/data"), "{}", "parquet", Map("k" -> "v"),
        Seq(FileMeta("/data/f", 10, 20, 1)), "sig")),
      IndexState.Active, 1, 123L)
    val back = JsonCodec.read(JsonCodec.write(entry))
    assert(back == entry)
  }

  test("concurrent create detected by optimistic log") {
    withSystemPath { g =>
      g.createIndex(lineitem, CoveringIndexConfig("ci_c", Seq("l_orderkey")))
      val ex = intercept[IllegalArgumentException] {
        g.createIndex(lineitem, CoveringIndexConfig("ci_c", Seq("l_orderkey")))
      }
      assert(ex.getMessage.contains("already exists"))
    }
  }

  test("lineage column maps rows to source files") {
    withSystemPath { g =>
      spark.conf.set(GraftConf.LineageKey, "true")
      try {
        g.createIndex(lineitem,
          CoveringIndexConfig("ci_lin", Seq("l_orderkey"), Seq("l_quantity")))
        val e = g.indexManager.getIndexes().head
        val data = spark.read.parquet(e.content.root)
        assert(data.columns.contains(CoveringIndexDescriptor.LineageColumn))
        assert(data.count() == lineitem.count())
        val ids = data.select(CoveringIndexDescriptor.LineageColumn)
          .distinct().collect().map(_.getLong(0)).toSet
        val sourceIds = e.relations.head.files.map(_.id).toSet
        assert(ids.subsetOf(sourceIds))
      } finally spark.conf.unset(GraftConf.LineageKey)
    }
  }
}
