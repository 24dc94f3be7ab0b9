/*
 * TEST FAKES ONLY. graft.index.sources.IcebergSource is reflection-gated
 * on the class-name prefix `org.apache.iceberg.spark.source.` and calls
 * the iceberg Table API by method NAME — so a handful of POJOs in this
 * package exercise the entire provider + candidate + substitution path
 * offline, without the iceberg-spark runtime jar. Method signatures
 * mirror the real API surface the provider touches:
 *   SparkTable.table() -> Table
 *   Table.location()/currentSnapshot()/newScan()
 *   Snapshot.snapshotId()/timestampMillis()
 *   TableScan.planFiles() -> CloseableIterable[FileScanTask]
 *   FileScanTask.file() -> DataFile; DataFile.path()/fileSizeInBytes()
 */
package org.apache.iceberg.spark.source

import java.util.{Collections => JCollections}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

class FakeSnapshot(id: Long) {
  def snapshotId(): Long = id
  def timestampMillis(): Long = 1000L
}

class FakeDataFile(p: String, len: Long) {
  def path(): CharSequence = p
  def fileSizeInBytes(): Long = len
}

class FakeScanTask(p: String, len: Long) {
  def file(): FakeDataFile = new FakeDataFile(p, len)
}

/** Mimics CloseableIterable[FileScanTask]. */
class FakeTableScan(files: Seq[(String, Long)])
    extends java.lang.Iterable[AnyRef] with AutoCloseable {
  @volatile var closed = false
  def planFiles(): FakeTableScan = this
  override def iterator(): java.util.Iterator[AnyRef] =
    files.map(f => new FakeScanTask(f._1, f._2): AnyRef).asJava.iterator()
  override def close(): Unit = closed = true
}

/** Mimics org.apache.iceberg.Table (only what the provider touches). */
class FakeIcebergTable(loc: String) {
  @volatile var files: Seq[(String, Long)] = Nil
  @volatile var snapId: Long = 1L
  @volatile var lastScan: FakeTableScan = _
  def location(): String = loc
  def currentSnapshot(): FakeSnapshot = new FakeSnapshot(snapId)
  def newScan(): FakeTableScan = {
    lastScan = new FakeTableScan(files)
    lastScan
  }
}

/**
 * Mimics iceberg's Spark connector table. Readable through a V2
 * [[LocalScan]] so `IndexManager.create(df, ...)` can build index data
 * through the DataFrame exactly as it would against a real table.
 */
class SparkTable(ice: FakeIcebergTable, tableSchema: StructType,
    readRows: () => Array[InternalRow]) extends Table with SupportsRead {
  def table(): FakeIcebergTable = ice
  override def name(): String = "fake_iceberg"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    JCollections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = tableSchema
        override def rows(): Array[InternalRow] = readRows()
      }
    }
}

object SparkTable {
  /** A fake table over real parquet files in `dir`, read rows served from
    * the same files. */
  def overParquetDir(spark: SparkSession, dir: String): SparkTable = {
    val schema = spark.read.parquet(dir).schema
    val ice = new FakeIcebergTable(dir)
    new SparkTable(ice, schema,
      () => spark.read.schema(schema).parquet(dir)
        .queryExecution.toRdd.map(_.copy()).collect())
  }
}
