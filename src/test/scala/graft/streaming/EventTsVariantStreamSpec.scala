package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{EventTs, TestSpark}

/**
 * The STREAMING queries' schema-adaptive branches, end to end on
 * hand-written fixtures: the fixture generator has shipped `events.ts`
 * as TIMESTAMP(NANOS)-as-long in some generations and TIMESTAMP_NTZ µs
 * in others, and whichever one the current `/root/testdata` carries, the
 * OTHER branch retains coverage only through these synthetic dirs. Both
 * variants hold the SAME instants, so every query must return identical
 * rows — window counts, sessions (incl. the sentinel write path, which
 * constructs a raw-typed row per variant), and the enrich row shape.
 */
class EventTsVariantStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** (epoch-second, user, type, value) fixtures: two users, one session
    * gap larger than 30 min for user 1. */
  private val base = 1723500000L
  private val events = Seq(
    (base + 0L, 1L, "view", 1.0),
    (base + 60L, 1L, "click", 2.0),
    (base + 120L, 2L, "view", 3.0),
    (base + 60L * 60L, 1L, "view", 4.0), // > 30 min after user 1's last
    (base + 61L * 60L, 2L, "click", 5.0))

  /** Write the fixture as `<dir>/events.parquet` in the given variant. */
  private def writeFixture(variant: EventTs.Variant): String = {
    val dir = Files.createTempDirectory(
      s"graft-evts-${variant.getClass.getSimpleName.stripSuffix("$")}-").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", variant.tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = events.zipWithIndex.map { case ((sec, user, tpe, v), i) =>
      Row(i.toLong, variant.rowValue(sec * 1000000L), user, tpe, v, "{}")
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("probe picks the matching variant per fixture dir") {
    Seq(EventTs.NanosLong, EventTs.Micros, EventTs.MicrosNtz).foreach { v =>
      val dir = writeFixture(v)
      assert(EventTs.probe(spark, dir) == v, s"probe mis-typed $v fixture")
    }
  }

  test("stream_window_counts: identical rows across all ts variants") {
    val results = Seq(EventTs.NanosLong, EventTs.Micros, EventTs.MicrosNtz)
      .map { v =>
        v -> collectSorted(
          StreamingQueries.qStreamWindowCounts(spark, writeFixture(v)))
      }
    assert(results.head._2.nonEmpty)
    results.tail.foreach { case (v, rows) =>
      assert(rows == results.head._2, s"$v disagrees with ${results.head._1}")
    }
  }

  test("stream_sessions: sentinel + gap logic identical across ts variants") {
    val results = Seq(EventTs.NanosLong, EventTs.Micros, EventTs.MicrosNtz)
      .map { v =>
        v -> collectSorted(
          StreamingQueries.qStreamSessions(spark, writeFixture(v)))
      }
    // both users' event pairs straddle a > 30 min gap → 4 sessions
    assert(results.head._2.size == 4, s"got ${results.head._2}")
    results.tail.foreach { case (v, rows) =>
      assert(rows == results.head._2, s"$v disagrees with ${results.head._1}")
    }
  }
}
