package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has runnable plan at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.sfDir)
      assert(df.columns.nonEmpty, s"$name has empty schema")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("oracle keys are a subset of query keys") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet -- qs
    assert(extra.isEmpty, s"oracleSql keys without queries: $extra")
  }

  test("dedup_components: local union-find == distributed propagation") {
    // the adaptive threshold picks driver union-find on small edge lists;
    // force the distributed pointer-doubling path and assert identical
    // (doc_id, component) output
    val local = graft.queries.Dedup.qDedupComponents(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "-1")
    try {
      val dist = graft.queries.Dedup.qDedupComponents(spark, TestSpark.sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(local.nonEmpty && local == dist)
    } finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  test("cc local-edge threshold derives from the driver heap; conf overrides") {
    // default = maxMemory / 10 / 100 (~10% of heap at ~100 B/edge): the
    // budget scales with the JVM actually running, instead of a constant
    // that silently assumed one
    val expected = Runtime.getRuntime.maxMemory / 10 / 100
    assert(graft.queries.Dedup.localEdgeThreshold(spark) == expected)
    assert(expected > 0)
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "12345")
    try assert(graft.queries.Dedup.localEdgeThreshold(spark) == 12345L)
    finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  test("queries produce data (not degenerate empty results) at sf0.001") {
    // every hashed comparison is meaningless on empty results; make sure
    // the filters actually select data at the smallest SF
    val nonEmpty = Seq("q1_pricing_summary", "q3_shipping_priority",
      "q5_local_supplier", "q6_revenue_delta", "q10_returned_items",
      "q_events_daily", "q_window_top_parts")
    nonEmpty.foreach { name =>
      assert(SparkEntry.queries(name)(spark, TestSpark.sfDir).count() > 0,
        s"$name returned 0 rows at sf0.001")
    }
  }
}
