package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Opaque multimodal blob with typed metadata. */
final case class MediaBlob(
    doc_id: Long,
    source: String,
    mime: String,
    data: Array[Byte])

/** Output of the (stubbed) decoder + feature extractor. */
final case class DecodedMedia(
    doc_id: Long,
    source: String,
    mime: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    channels: Int,
    resized_w: Int,
    resized_h: Int,
    n_frames: Long)

/**
 * Multimodal-column pipeline: treat image/audio/video as opaque `binary`
 * columns with typed metadata, and run decode / feature-extract / resize /
 * frame-sample partition-wise over a typed Dataset.
 *
 * The DECODE STEP IS A STUB: no image/audio codecs exist in this
 * environment, so `decodeStub` derives deterministic fake dimensions from
 * the bytes. Everything around it — the binary column, the case-class
 * schema, the `mapPartitions` batch shape (one iterator per partition, as
 * a real codec would amortize model/codec init per partition), the
 * partition-parallel execution — is the real plumbing a production decode
 * would use. Swap `decodeStub` for a codec call and nothing else changes.
 *
 * Scale: decode runs partition-parallel with no shuffle; the only shuffle
 * is the final per-source aggregation of tiny feature rows.
 */
object Multimodal {

  /** STUB: fake `(width, height, channels)` from the raw bytes. */
  def decodeStub(data: Array[Byte]): (Int, Int, Int) = {
    val len = data.length
    val first = if (len == 0) 0 else data(0) & 0xff
    (64 + len % 640, 48 + first % 480, 3)
  }

  /** STUB: frame sampling — one "frame" per 32-byte window. */
  def frameSampleStub(data: Array[Byte]): Long = (data.length + 31L) / 32L

  val ResizeTarget = 224

  def qMultimodalFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")

    // documents.text stands in for a fetched media payload: an opaque
    // binary column + mime metadata (the real pipeline would read
    // `binary` straight from parquet)
    val blobs = docs
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .map { case (id, src, text) =>
        MediaBlob(id, src, "image/fake",
          text.getBytes(StandardCharsets.UTF_8))
      }

    val decoded = blobs.mapPartitions { it =>
      // per-partition init point (codec / model load in a real pipeline)
      it.map { b =>
        val (w, h, c) = decodeStub(b.data)
        DecodedMedia(
          doc_id = b.doc_id,
          source = b.source,
          mime = b.mime,
          n_bytes = b.data.length.toLong,
          width = w, height = h, channels = c,
          resized_w = math.min(w, ResizeTarget),
          resized_h = math.min(h, ResizeTarget),
          n_frames = frameSampleStub(b.data))
      }
    }

    decoded.groupBy(col("source"))
      .agg(
        count(lit(1)).cast(LongType).as("n_media"),
        sum(col("n_bytes")).cast(LongType).as("sum_bytes"),
        sum(col("width")).cast(LongType).as("sum_width"),
        sum(col("height")).cast(LongType).as("sum_height"),
        sum(col("resized_w")).cast(LongType).as("sum_resized_w"),
        sum(col("resized_h")).cast(LongType).as("sum_resized_h"),
        sum(col("n_frames")).cast(LongType).as("sum_frames"))
      .orderBy(col("source"))
  }

  /** DuckDB twin: the stub's arithmetic is oracle-expressible, so the
    * whole pipeline (bytes → decode → resize → frame-sample → agg) gets
    * an exact correctness check. ASCII corpus ⇒ octet_length == length
    * and ascii(text) == first byte. */
  val qMultimodalFeaturesSql: String =
    s"""WITH m AS (
       |  SELECT source,
       |    octet_length(encode(text)) AS n_bytes,
       |    64 + octet_length(encode(text)) % 640 AS width,
       |    48 + (CASE WHEN octet_length(encode(text)) = 0 THEN 0
       |          ELSE ascii(text) END % 480) AS height,
       |    (octet_length(encode(text)) + 31) // 32 AS n_frames
       |  FROM documents)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_media,
       |  CAST(SUM(n_bytes) AS BIGINT) AS sum_bytes,
       |  CAST(SUM(width) AS BIGINT) AS sum_width,
       |  CAST(SUM(height) AS BIGINT) AS sum_height,
       |  CAST(SUM(LEAST(width, $ResizeTarget)) AS BIGINT) AS sum_resized_w,
       |  CAST(SUM(LEAST(height, $ResizeTarget)) AS BIGINT) AS sum_resized_h,
       |  CAST(SUM(n_frames) AS BIGINT) AS sum_frames
       |FROM m GROUP BY source ORDER BY source""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "multimodal_features" -> (qMultimodalFeatures _, qMultimodalFeaturesSql))
}
