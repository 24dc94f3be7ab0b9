package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Access to the TPC-H-ish test tables (see TESTDATA.md). Every table is a
 * single parquet dataset under `<sfDir>/<name>.parquet`.
 *
 * Scale notes: readers here are plain `spark.read.parquet` scans so Catalyst
 * performs predicate pushdown / column pruning / partition pruning natively;
 * at cluster scale the same call distributes file listing + scan across
 * executors. Nothing in this layer collects to the driver.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = {
    val dir = if (sfDir.endsWith("/")) sfDir.dropRight(1) else sfDir
    s"$dir/$name.parquet"
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    // events.ts is parquet TIMESTAMP(NANOS); Spark reads it as Long when
    // spark.sql.legacy.parquet.nanosAsLong=true (set by GraftSession).
    // Truncate to microseconds — Spark's native timestamp precision.
    // integer division: floor(ts/1000) coerces to DOUBLE, and ns epochs
    // (~1.77e18) exceed 2^53, so the double path can truncate to a
    // different microsecond than an exact engine would
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views named after themselves. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
