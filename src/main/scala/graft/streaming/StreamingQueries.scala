package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.Tables

/**
 * Driver-gate entry for the streaming path: runs the REAL Structured
 * Streaming pipeline (file source → watermarked windowed aggregation →
 * sink) over the events table with an `AvailableNow` trigger, then
 * returns the sink contents as a batch DataFrame for the DuckDB oracle
 * compare. Complete output mode emits every window, and all files fit the
 * first micro-batch (watermark starts at 0 → nothing dropped), so the
 * result must equal the batch aggregate bit-for-bit — proving the
 * streaming operator's semantics against an engine that has no streaming
 * at all.
 *
 * The memory sink is harness-only (test scale); the operator under test
 * ([[StreamingOps.windowedEventCounts]]) is sink-agnostic and its state
 * is partitioned by (window, event_type) — executor-sharded at scale.
 */
object StreamingQueries {

  /** events.parquet physical schema under nanosAsLong (ts: bigint ns). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def qStreamWindowCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // glob, not the bare path: events.parquet is a single FILE and the
    // file stream source requires its basePath to be a directory — the
    // glob makes basePath resolve to sfDir
    val raw = spark.readStream.schema(rawSchema)
      .parquet(Tables.path(sfDir, "events") + "*")
    val events = raw
      // integer division (see Tables.load): double arithmetic is inexact
      // at nanosecond-epoch magnitude
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[StreamEvent]

    val name = "stream_win_" + UUID.randomUUID().toString.replace("-", "")
    val q = StreamingOps.windowedEventCounts(events)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // materialize off the memory sink, then drop it — repeated runs in
    // one session would otherwise each leak a full result table
    val result = spark.table(name)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
    val rows = result.collect()
    val schema = result.schema
    spark.catalog.dropTempView(name)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** DuckDB twin: hour-tumbling windows align with date_trunc('hour'). */
  val qStreamWindowCountsSql: String =
    """SELECT
      | strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      | strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
      | event_type,
      | CAST(COUNT(*) AS BIGINT) AS n_events,
      | CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 3""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "stream_window_counts" -> (qStreamWindowCounts _, qStreamWindowCountsSql))
}
