package graft.index.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * STRUCTURED STREAMING SOURCES over the jarless lakehouse logs — the
 * "stream the table" integration every modern Delta/Iceberg deployment
 * leans on: `spark.readStream.format("graft-delta").load(path)` (and
 * `graft-iceberg`), micro-batching exactly the rows each new commit
 * appended, with offsets = commit version / snapshot id, so a restart
 * resumes from the checkpoint without re-serving a single row.
 *
 * Both sources implement the v1 `Source` API — `getBatch(start, end]`
 * returns the appended rows as a streaming frame — the same API the
 * real Delta connector uses for its streaming source. Row-deleting
 * commits cannot be represented in an append stream: they fail loudly
 * by default, or are skipped with `skipChangeCommits=true` (the Delta
 * option of the same name).
 *
 * Scale: offset arithmetic and commit parsing are driver-side metadata;
 * each micro-batch plans a plain parquet scan of just the new files —
 * partition-parallel, pushdown intact, no state beyond the checkpoint.
 */
final class DeltaStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName: String = "graft-delta"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-delta sink supports Append output mode only, got $outputMode")
    new LakeStreamSink(sqlContext.sparkSession, pathOf(parameters),
      partitionColumns, parameters, iceberg = false)
  }

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-delta stream needs .load(<table path>)"))

  private def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = DeltaLog.snapshot(sqlContext.sparkSession, pathOf(parameters)).schema
    (shortName,
      if (!cdcMode(parameters)) base
      else DeltaStreamSource.cdcSchema(base))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext.sparkSession, pathOf(parameters), parameters)
}

object DeltaStreamSource {
  /** Change-feed schema: the data columns + the CDF stamps. */
  def cdcSchema(base: StructType): StructType = StructType(base.fields ++ Seq(
    org.apache.spark.sql.types.StructField("_change_type",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_commit_version",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("_commit_timestamp",
      org.apache.spark.sql.types.TimestampType)))
}

final class DeltaStreamSource(spark: SparkSession, rootStr: String,
    options: Map[String, String]) extends Source {

  private val root = new Path(rootStr)
  private val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
  private val initial = DeltaLog.snapshot(spark, rootStr)
  if (DeltaColumnMapping.mode(initial.configuration) != "none") {
    throw new UnsupportedDeltaProtocolException(
      s"Delta table at $rootStr uses column mapping; the graft-delta " +
        "stream source serves plain-named tables only. Stream with the " +
        "delta-spark connector instead.")
  }
  /** CDC mode: serve the CHANGE DATA FEED (inserts AND deletes, with
    * the CDF stamps) instead of an appends-only row stream — the
    * streaming twin of `DeltaTable.changes`, and the mode that needs no
    * delete refusal because deletes are first-class rows in the feed. */
  private val cdc =
    options.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))
  override val schema: StructType =
    if (cdc) DeltaStreamSource.cdcSchema(initial.schema) else initial.schema

  private val skipChanges =
    options.get("skipChangeCommits").exists(_.equalsIgnoreCase("true"))
  /** First version served: 0 (full history), a number, or "latest"
    * (only commits after stream start). */
  private val startingVersion: Long = options.get("startingVersion") match {
    case Some(v) if v.equalsIgnoreCase("latest") => initial.version + 1
    case Some(v) => v.toLong
    case None => 0L
  }

  override def getOffset: Option[Offset] =
    Some(LongOffset(DeltaLog.snapshot(spark, rootStr).version))

  private def versionOf(o: Offset): Long = o.json.toLong

  /** Paths appended by version `v` — None when the commit deletes or
    * rewrites rows (not representable in an append stream). */
  private def appendedPaths(v: Long): Option[Seq[String]] = {
    val p = new Path(DeltaLog.logDir(root), f"$v%020d.json")
    val adds = scala.collection.mutable.Buffer.empty[String]
    var removesData = false
    var addsDv = false
    DeltaLog.readLines(fs, p).foreach { line =>
      val j = JsonMethods.parse(line)
      def dataChange(kind: String): Boolean = (j \ kind \ "dataChange") match {
        case JBool(b) => b
        case _ => true
      }
      (j \ "add" \ "path") match {
        case JString(path) if dataChange("add") =>
          (j \ "add" \ "deletionVector") match {
            case JObject(_) => addsDv = true
            case _ => adds += path
          }
        case _ =>
      }
      (j \ "remove" \ "path") match {
        case JString(_) if dataChange("remove") => removesData = true
        case _ =>
      }
    }
    if (removesData || addsDv) None else Some(adds.toSeq)
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    // startingVersion gates only the FIRST batch — on restart the
    // checkpointed offset is authoritative (re-resolving "latest" here
    // would silently skip commits that arrived between runs)
    val from = start.map(versionOf(_) + 1).getOrElse(startingVersion)
    val endV = versionOf(end)
    if (cdc) {
      val batch =
        if (from > endV)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else DeltaTable.changes(spark, rootStr, from, Some(endV))
          .select(schema.fieldNames.map(col(_)).toIndexedSeq: _*)
      return graft.streaming.SparkStreamingInternals.streamingDataFrame(
        spark, batch.queryExecution.toRdd, schema)
    }
    val files = (from to endV).flatMap { v =>
      appendedPaths(v) match {
        case Some(paths) => paths.map { raw =>
          val decoded = java.net.URLDecoder.decode(raw, "UTF-8")
          val p = new Path(decoded)
          if (p.isAbsolute) decoded else new Path(root, decoded).toString
        }
        case None if skipChanges => Nil
        case None => throw new UnsupportedDeltaProtocolException(
          s"version $v at $rootStr deletes or rewrites rows; an append " +
            "stream cannot represent it. Pass skipChangeCommits=true to " +
            "skip such commits, or consume DeltaTable.changes instead.")
      }
    }
    val batch =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).option("basePath", rootStr)
        .parquet(files: _*)
        .select(schema.fieldNames.map(col(_)).toIndexedSeq: _*)
    graft.streaming.SparkStreamingInternals.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}

/** Iceberg sibling: offsets are snapshot ids, batches come from the
  * incremental append scan's lineage walk ([[IcebergTable.incrementalAppends]]). */
final class IcebergStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName: String = "graft-iceberg"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-iceberg sink supports Append output mode only, got $outputMode")
    new LakeStreamSink(sqlContext.sparkSession, pathOf(parameters),
      partitionColumns, parameters, iceberg = true)
  }

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg stream needs .load(<table location>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base =
      IcebergMeta.snapshot(sqlContext.sparkSession, pathOf(parameters)).schema
    (shortName,
      if (!parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true")))
        base
      else StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_snapshot_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_commit_timestamp",
          org.apache.spark.sql.types.TimestampType))))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, pathOf(parameters), parameters)
}

/**
 * EXACTLY-ONCE streaming SINK into a Delta or Iceberg table: each
 * micro-batch commits as an append stamped with a per-query
 * (appId, batchId) transaction watermark — Delta's `txn` action /
 * an Iceberg `graft.txn.<appId>` table property — and a replayed batch
 * (failure between sink commit and checkpoint advance) is recognized by
 * `batchId <= committed watermark` and skipped, never double-applied.
 * This is the mechanism real Delta streaming writes use for their
 * idempotence guarantee. First batch creates the table.
 */
final class LakeStreamSink(spark: SparkSession, rootStr: String,
    partitionColumns: Seq[String], options: Map[String, String],
    iceberg: Boolean) extends Sink {

  // an EXPLICIT txnAppId outranks the auto queryId (delta-spark's
  // precedence): a user pinning txnAppId keeps idempotence across a
  // checkpoint-reset restart, where the queryId changes
  private def appId: String =
    options.get("txnAppId")
      .orElse(Option(
        spark.sparkContext.getLocalProperty("sql.streaming.queryId")))
      .getOrElse(throw new IllegalStateException(
        "no streaming queryId in scope and no txnAppId option set"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val app = appId
    val exists =
      if (iceberg) IcebergMeta.isIcebergTable(spark, rootStr)
      else DeltaLog.isDeltaTable(spark, rootStr)
    if (exists) {
      val committed =
        if (iceberg) IcebergTable.transactions(spark, rootStr).get(app)
        else DeltaLog.snapshot(spark, rootStr).transactions.get(app)
      if (committed.exists(_ >= batchId)) return // replayed batch: skip
    }
    // re-anchor the engine's incremental frame as a plain batch frame
    // (ForeachBatchSink's move: the already-planned InternalRow RDD,
    // wrapped non-streaming, pushes through the ordinary writers)
    val batch = graft.streaming.SparkStreamingInternals.batchDataFrame(
      spark, data.queryExecution.toRdd, data.schema)
    val txn = Some(app -> batchId)
    // an evolving source stream widens the table additively when the
    // user opts in (Delta's sink option of the same name); without it
    // the append-time schema enforcement refuses loudly
    val merge = options.get("mergeSchema").exists(_.equalsIgnoreCase("true"))
    if (iceberg) {
      // reject rather than silently drop the option: an Iceberg schema
      // merge needs new field ids minted in table metadata, which this
      // writer does not do mid-stream
      require(!merge, "graft-iceberg sink does not support mergeSchema; " +
        "evolve the table schema before starting the stream")
      // partitionBy declares the identity spec on first-batch create;
      // later batches must name the table's spec (enforced in append)
      if (exists) IcebergTable.append(batch, rootStr, txn, partitionColumns)
      else IcebergTable.create(batch, rootStr, txn, partitionColumns)
    } else {
      if (exists) DeltaTable.append(batch, rootStr, partitionColumns, txn,
        mergeSchema = merge)
      else DeltaTable.create(batch, rootStr, partitionColumns, txn = txn)
    }
  }

  override def toString: String =
    s"LakeStreamSink[${if (iceberg) "iceberg" else "delta"}]($rootStr)"
}

final class IcebergStreamSource(spark: SparkSession, location: String,
    options: Map[String, String]) extends Source {

  private val initial = IcebergMeta.snapshot(spark, location)
  /** CDC mode: serve the full changelog (inserts AND positional-delete
    * victims, stamped) via [[IcebergTable.incrementalChanges]] — the
    * Iceberg twin of the Delta source's `readChangeFeed`. */
  private val cdc =
    options.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))
  override val schema: StructType =
    if (cdc) StructType(initial.schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_snapshot_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_commit_timestamp",
        org.apache.spark.sql.types.TimestampType)))
    else initial.schema

  private val skipChanges =
    options.get("skipChangeCommits").exists(_.equalsIgnoreCase("true"))
  private val startingSnapshot: Long = options.get("startingSnapshotId") match {
    case Some(v) if v.equalsIgnoreCase("latest") => initial.snapshotId
    case Some(v) => v.toLong
    case None => 0L
  }

  override def getOffset: Option[Offset] = {
    val cur = IcebergMeta.snapshot(spark, location).snapshotId
    if (cur < 0) None else Some(LongOffset(cur))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(_.json.toLong).getOrElse(startingSnapshot)
    val endId = end.json.toLong
    val batch =
      if (from == endId)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else if (cdc)
        IcebergTable.incrementalChanges(spark, location, from, Some(endId))
          .select(schema.fieldNames.map(col(_)).toIndexedSeq: _*)
      else IcebergTable.incrementalAppends(spark, location, from,
          Some(endId), strict = !skipChanges)
        .select(schema.fieldNames.map(col(_)).toIndexedSeq: _*)
    graft.streaming.SparkStreamingInternals.streamingDataFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()
}
