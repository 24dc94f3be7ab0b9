package graft.index.zorder

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.index.{IndexBuildContext, IndexDescriptor}

/**
 * Z-order covering index build (reference:
 * index/zordercovering/ZOrderCoveringIndex.scala:50-154 +
 * ZOrderField.scala:26-569).
 *
 * Two passes, like the reference:
 *  1. stats pass — per-column quantile boundaries via `approxQuantile`
 *     (Greenwald-Khanna, one distributed pass) for skew-resistant
 *     bucketing (the reference's percentile-based ZOrderField);
 *  2. write pass — per-row z-address (bit-interleaved per-column bucket
 *     ids) via UDF, `repartitionByRange(n, zaddr).sortWithinPartitions`,
 *     parquet write with the helper column dropped.
 *
 * The clustered layout gives every output file a tight min/max envelope
 * on EVERY indexed column, so ordinary parquet row-group stats prune scans
 * on any indexed dimension — no bespoke read path needed at any scale.
 */
object ZOrderBuild {

  /** bits per column: 2^12 = 4096 quantile buckets per dimension. */
  val BitsPerColumn = 12
  val ZAddrColumn = "_graft_zaddr"

  def build(ctx: IndexBuildContext, source: DataFrame,
      d: ZOrderIndexDescriptor): IndexDescriptor = {
    val spark = ctx.spark
    val nCols = d.indexedColumns.size
    require(nCols * BitsPerColumn <= 62,
      s"too many z-order columns (max ${62 / BitsPerColumn})")

    d.indexedColumns.foreach { c =>
      val t = source.schema(c).dataType
      require(zOrderable(t), s"z-order column '$c' has unsupported type $t")
    }

    // ---- pass 1: quantile boundaries per column (one job for all cols)
    val nBuckets = 1 << BitsPerColumn
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val asDouble = source.select(
      d.indexedColumns.map(c => toDouble(source, c).as(c)): _*)
    val boundaries: Array[Array[Double]] =
      asDouble.stat.approxQuantile(d.indexedColumns.toArray, probs, 0.001)

    // ---- pass 2: z-address + range-partitioned sorted write
    val zUdf = udf(new ZAddressFn(boundaries, BitsPerColumn))
    // optional lineage column: lets hybrid scan drop deleted files' rows
    // at query time, same machinery as covering indexes (reference shares
    // this across CI/ZCI via the common covering-index base)
    val projCols = (d.indexedColumns ++ d.includedColumns).map(col) ++
      (if (d.hasLineage)
        Seq(col(graft.index.covering.CoveringIndexDescriptor.LineageColumn))
      else Nil)
    val base =
      if (d.hasLineage)
        graft.index.covering.CoveringIndexDescriptor.attachLineage(ctx, source)
      else source
    val projected = base.select(projCols: _*)
    val withZ = projected.withColumn(ZAddrColumn,
      zUdf(array(d.indexedColumns.map(c => toDouble(source, c)): _*)))

    withZ
      .repartitionByRange(d.numPartitions, col(ZAddrColumn))
      .sortWithinPartitions(ZAddrColumn)
      .drop(ZAddrColumn)
      .write.mode("overwrite").parquet(ctx.dataPath)

    d.copy(schemaJson = projected.schema.json)
  }

  def zOrderable(t: DataType): Boolean = t match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def toDouble(source: DataFrame, c: String): Column =
    source.schema(c).dataType match {
      case DateType => col(c).cast(IntegerType).cast(DoubleType)
      case TimestampType | TimestampNTZType =>
        col(c).cast(DoubleType) // seconds since epoch
      case _ => col(c).cast(DoubleType)
    }
}

/**
 * Serializable per-row z-address: each value maps to its quantile bucket
 * (binary search over the boundary array), bucket ids are bit-interleaved
 * round-robin (Morton code). Nulls land in bucket 0 — co-located, like
 * the reference's null handling.
 */
class ZAddressFn(boundaries: Array[Array[Double]], bitsPerCol: Int)
    extends (Seq[java.lang.Double] => Long) with Serializable {

  override def apply(values: Seq[java.lang.Double]): Long = {
    val n = boundaries.length
    var z = 0L
    var c = 0
    while (c < n) {
      val v = values(c)
      val bucket = if (v == null) 0 else bucketOf(boundaries(c), v.doubleValue())
      var bit = 0
      while (bit < bitsPerCol) {
        z |= (((bucket >> bit) & 1L)) << (bit.toLong * n + c)
        bit += 1
      }
      c += 1
    }
    z
  }

  /** Index of the first boundary > v == number of boundaries <= v. */
  private def bucketOf(bounds: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
