package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Per-session resolved-relation cache. `spark.read.parquet` pays a
    * footer schema read + file listing + relation resolution on EVERY
    * call (~40-60 ms here) — per-query per-pass, that was ~40% of a
    * whole bench pass (guide §1/§6: amortize listing/metadata, exactly
    * what a catalog table does on a real cluster). The cached DataFrame
    * is an immutable logical plan; executing it re-reads the parquet
    * every time, so no data/results are cached. Staleness: keyed on the
    * source's (mtime, length) — a rewritten fixture misses and
    * re-resolves (the stat is one local fs call, ~µs). Sessions are
    * weak keys so stopped test sessions unpin their plans. */
  private val relCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, (Long, Long, DataFrame)]]()

  private def cacheFor(spark: SparkSession) = relCache.synchronized {
    var m = relCache.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, DataFrame)]()
      relCache.put(spark, m)
    }
    m
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = path(sfDir, name)
    val stamp =
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        val st = hp.getFileSystem(spark.sessionState.newHadoopConf())
          .getFileStatus(hp)
        Some((st.getModificationTime, st.getLen))
      } catch { case _: Exception => None } // missing path: let the read throw
    stamp match {
      case None => loadFresh(spark, sfDir, name)
      case Some((mt, len)) =>
        val m = cacheFor(spark)
        val hit = m.get(p)
        if (hit != null && hit._1 == mt && hit._2 == len) hit._3
        else {
          val df = loadFresh(spark, sfDir, name)
          m.put(p, (mt, len, df))
          df
        }
    }
  }

  private def loadFresh(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(sfDir, name))
    // events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
    // generations and TIMESTAMP_MICROS (NTZ) in others; normalize whatever
    // the file actually holds to the session-standard TimestampType.
    if (name == "events") EventTs.of(df.schema("ts").dataType).micros(df)
    else df
  }

  /** Register all tables as temp views named after themselves. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}

/**
 * Schema-adaptive handling of the `events.ts` column. Fixture generators
 * (and real users' writers) vary in the physical parquet timestamp they
 * produce; the engine accepts every encoding Spark can read and
 * normalizes to the session-standard `TimestampType` (session TZ is UTC,
 * so TIMESTAMP_NTZ values map to the identical instant):
 *
 *  - parquet TIMESTAMP(NANOS) → Spark reads `LongType` nanosecond epochs
 *    under `spark.sql.legacy.parquet.nanosAsLong=true`
 *  - parquet TIMESTAMP_MICROS with isAdjustedToUTC=false → `TimestampNTZType`
 *  - parquet TIMESTAMP_MICROS/MILLIS adjusted to UTC → `TimestampType`
 *
 * All arithmetic is integral (`div`, `unix_micros`): floor(ts/1000) via
 * doubles is inexact at nanosecond-epoch magnitude (~1.77e18 > 2^53).
 */
object EventTs {

  sealed trait Variant {
    /** Physical Spark type of the raw `ts` column for this variant. */
    def tsType: DataType
    /** Normalize raw `ts` → `TimestampType` at microsecond precision. */
    def micros(df: DataFrame): DataFrame
    /** Normalize raw `ts` → `TimestampType` floored to whole seconds
      * (integral gap/range arithmetic on both engines). */
    def seconds(df: DataFrame): DataFrame
    /** External (Row-encoder) value for a synthetic event at `us`
      * microseconds since epoch, typed to match `tsType`. */
    def rowValue(us: Long): Any
  }

  /** TIMESTAMP(NANOS) read as Long ns epochs (legacy nanosAsLong). */
  case object NanosLong extends Variant {
    val tsType: DataType = LongType
    def micros(df: DataFrame): DataFrame =
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    def seconds(df: DataFrame): DataFrame =
      df.withColumn("ts", timestamp_seconds(expr("ts div 1000000000")))
    def rowValue(us: Long): Any = java.lang.Long.valueOf(Math.multiplyExact(us, 1000L))
  }

  /** TIMESTAMP (with local TZ) — already the session-standard type. */
  case object Micros extends Variant {
    val tsType: DataType = TimestampType
    def micros(df: DataFrame): DataFrame = df
    def seconds(df: DataFrame): DataFrame =
      df.withColumn("ts", timestamp_seconds(expr("unix_micros(ts) div 1000000")))
    def rowValue(us: Long): Any =
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L)
  }

  /** TIMESTAMP_NTZ — identical instants under the UTC session TZ. */
  case object MicrosNtz extends Variant {
    val tsType: DataType = TimestampNTZType
    def micros(df: DataFrame): DataFrame =
      df.withColumn("ts", col("ts").cast(TimestampType))
    def seconds(df: DataFrame): DataFrame =
      df.withColumn("ts",
        timestamp_seconds(expr("unix_micros(cast(ts as timestamp)) div 1000000")))
    def rowValue(us: Long): Any =
      java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L) * 1000L),
        java.time.ZoneOffset.UTC)
  }

  def of(dt: DataType): Variant = dt match {
    case LongType          => NanosLong
    case TimestampType     => Micros
    case TimestampNTZType  => MicrosNtz
    case other => throw new IllegalStateException(
      s"events.ts has unsupported physical type $other; " +
        "expected TIMESTAMP(NANOS)-as-long, TIMESTAMP, or TIMESTAMP_NTZ")
  }

  /** Variant depends only on the file bytes, so cache per (path, mtime,
    * length) — every streaming query probed the footer again on each
    * construction (a full relation resolution, ~40-60 ms). */
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Variant)]()

  /** Probe the on-disk variant via a footer-only batch schema read. */
  def probe(spark: SparkSession, sfDir: String): Variant = {
    val p = Tables.path(sfDir, "events")
    val stamp =
      try {
        val hp = new org.apache.hadoop.fs.Path(p)
        val st = hp.getFileSystem(spark.sessionState.newHadoopConf())
          .getFileStatus(hp)
        Some((st.getModificationTime, st.getLen))
      } catch { case _: Exception => None }
    def fresh(): Variant =
      of(spark.read.parquet(p).schema("ts").dataType)
    stamp match {
      case None => fresh()
      case Some((mt, len)) =>
        val hit = probeCache.get(p)
        if (hit != null && hit._1 == mt && hit._2 == len) hit._3
        else {
          val v = fresh()
          probeCache.put(p, (mt, len, v))
          v
        }
    }
  }
}
