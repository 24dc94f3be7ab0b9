package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.index.sources.{IcebergMeta, IcebergTable}

/**
 * MERGE on the jarless Iceberg writer — the Flink-upsert snapshot
 * shape: one commit carrying an equality-delete file on the keys plus
 * fresh data files with the upsert rows; the sequence rule replaces
 * matched rows, inserts unmatched ones, and delete markers remove.
 * The changelog replays the merge as delete + insert rows.
 */
class IcebergMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def customer =
    spark.read.parquet(s"${TestSpark.sfDir}/customer.parquet")

  test("merge: update + insert + delete markers in ONE snapshot") {
    val loc = Files.createTempDirectory("graft-ice-merge-").toString
    IcebergTable.create(customer.filter($"c_custkey" % 2 === 0), loc)
    val source = customer.filter($"c_custkey" % 3 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1000)
    val sid = IcebergTable.merge(spark, loc, source, Seq("c_custkey"),
      deleteCondition = Some($"c_nationkey" >= 20))
    assert(sid == 2L)

    val got = IcebergTable.read(spark, loc)
      .select($"c_custkey", $"c_acctbal").as[(Long, Double)]
      .collect().toMap
    val base = customer
      .select($"c_custkey", $"c_acctbal", $"c_nationkey")
      .as[(Long, Double, Long)].collect()
    val expected = base.flatMap { case (k, bal, nat) =>
      val even = k % 2 == 0
      val inSrc = k % 3 == 0
      val isDel = nat >= 20
      if (even && inSrc && isDel) None
      else if (even && inSrc) Some(k -> (bal + 1000))
      else if (even) Some(k -> bal)
      else if (inSrc && !isDel) Some(k -> (bal + 1000))
      else None
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, bal) =>
      assert(math.abs(got(k) - bal) < 1e-6, s"key $k: ${got(k)} != $bal")
    }
    // time travel to the pre-merge snapshot still serves the old state
    assert(IcebergTable.read(spark, loc, Some(1L)).count() ==
      customer.filter($"c_custkey" % 2 === 0).count())
  }

  test("merge changelog: delete + insert rows reproduce the row-level effect") {
    val loc = Files.createTempDirectory("graft-ice-merge-chg-").toString
    IcebergTable.create(customer.filter($"c_custkey" % 2 === 0), loc)
    val source = customer.filter($"c_custkey" % 3 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1000)
    IcebergTable.merge(spark, loc, source, Seq("c_custkey"),
      deleteCondition = Some($"c_nationkey" >= 20))

    val feed = IcebergTable.incrementalChanges(spark, loc, 1L)
      .select($"_change_type", $"c_custkey").as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val base = customer.select($"c_custkey", $"c_nationkey")
      .as[(Long, Long)].collect()
    // victims: every LIVE (even) key the source named — both the delete
    // markers and the matched upserts (their old version dies)
    val expDeletes = base.collect {
      case (k, _) if k % 2 == 0 && k % 3 == 0 => k }.sorted.toSeq
    // inserts: every upsert row (matched rows re-land as new versions)
    val expInserts = base.collect {
      case (k, nat) if k % 3 == 0 && nat < 20 => k }.sorted.toSeq
    assert(feed.getOrElse("delete", Nil) == expDeletes)
    assert(feed.getOrElse("insert", Nil) == expInserts)
  }

  test("repeat merge applies over the previous one; compact materializes") {
    val loc = Files.createTempDirectory("graft-ice-merge-rep-").toString
    IcebergTable.create(customer.filter($"c_custkey" < 100), loc)
    IcebergTable.merge(spark, loc,
      customer.filter($"c_custkey" < 50)
        .withColumn("c_acctbal", $"c_acctbal" + 1), Seq("c_custkey"))
    IcebergTable.merge(spark, loc,
      customer.filter($"c_custkey".between(30L, 129L))
        .withColumn("c_acctbal", $"c_acctbal" + 2), Seq("c_custkey"))
    def check(): Unit = {
      val got = IcebergTable.read(spark, loc)
      assert(got.count() == customer.filter($"c_custkey" < 130).count())
      val bal = got.filter($"c_custkey" === 40L)
        .select($"c_acctbal").as[Double].head()
      val orig = customer.filter($"c_custkey" === 40L)
        .select($"c_acctbal").as[Double].head()
      assert(math.abs(bal - orig - 2) < 1e-6)
    }
    check()
    IcebergTable.compact(spark, loc)
    check()
    assert(IcebergMeta.snapshot(spark, loc).deleteFiles.isEmpty)
  }

  test("merge refuses duplicate source keys and mismatched schemas") {
    val loc = Files.createTempDirectory("graft-ice-merge-dup-").toString
    IcebergTable.create(customer.limit(100), loc)
    val dup = customer.limit(10).union(customer.limit(10))
    val e = intercept[IllegalArgumentException] {
      IcebergTable.merge(spark, loc, dup, Seq("c_custkey"))
    }
    assert(e.getMessage.contains("duplicate"))
    val e2 = intercept[IllegalArgumentException] {
      IcebergTable.merge(spark, loc,
        customer.limit(5).drop("c_acctbal"), Seq("c_custkey"))
    }
    assert(e2.getMessage.contains("columns"))
  }

  test("commit-fence race: a losing merge removes its data, delete " +
      "files, and manifests — a retry against the new head succeeds") {
    val loc = java.nio.file.Files
      .createTempDirectory("graft-ice-merge-race-").toString
    IcebergTable.create(customer, loc)
    val rootPath = new org.apache.hadoop.fs.Path(loc)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    def tableFiles(): Set[String] = {
      val buf = scala.collection.mutable.Buffer.empty[String]
      def walk(d: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(d).foreach { st =>
          if (st.isDirectory) walk(st.getPath) else buf += st.getPath.toString
        }
      walk(rootPath)
      buf.toSet
    }
    // a racing writer already published metadata v2 (same content as
    // v1 — a valid, readable head) → this merge's fence create fails
    val metaDir = new org.apache.hadoop.fs.Path(loc, "metadata")
    val v1 = fs.listStatus(metaDir).map(_.getPath)
      .find(_.getName.endsWith(".metadata.json")).get
    val len = fs.getFileStatus(v1).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(v1); try in.readFully(0, bytes) finally in.close()
    val v2 = new org.apache.hadoop.fs.Path(metaDir, "v00002.metadata.json")
    val out = fs.create(v2, false)
    try out.write(bytes) finally out.close()
    val before = tableFiles()

    val source = customer.filter($"c_custkey" % 3 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1)
    intercept[Throwable] {
      IcebergTable.merge(spark, loc, source, Seq("c_custkey"))
    }
    assert(tableFiles() == before,
      s"stray files after a lost race: ${(tableFiles() -- before).toSeq.sorted}")
    // once the winner's hint lands (here: hint removed → numeric-latest
    // fallback finds v2), the retry reads the advanced head and commits
    fs.delete(new org.apache.hadoop.fs.Path(metaDir, "version-hint.text"),
      false)
    IcebergTable.merge(spark, loc, source, Seq("c_custkey"))
    assert(IcebergTable.read(spark, loc).count() == customer.count())
  }
}
