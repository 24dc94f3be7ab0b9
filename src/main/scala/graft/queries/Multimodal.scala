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
 * Two decode paths exist. `multimodal_decode` (round 6) is the REAL one:
 * actual PNG encode/decode via the JDK's ImageIO and a real RIFF/WAVE
 * writer+parser ([[graft.functions.MediaCodecs]]), oracle-checked
 * end-to-end. `multimodal_features` below predates it and keeps
 * `decodeStub` (deterministic fake dimensions) to pin the original
 * mapPartitions plumbing contract — the binary column, the case-class
 * schema, the per-partition batch shape — independent of any codec.
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

  /** Per-doc output of the REAL codec round trip. All Long for oracle
    * dtype parity. */
  final case class DecodedFeatures(
      doc_id: Long,
      img_w: Long,
      img_h: Long,
      channels: Long,
      pix_sum: Long,
      resized_sum: Long,
      sample_rate: Long,
      n_samples: Long,
      wav_sum_abs: Long)

  /**
   * REAL decode path (round 6) — no stub. The JDK's own codec stack
   * (`javax.imageio`, java.desktop module) carries PNG/BMP/GIF/JPEG
   * coders, and WAV is a plain RIFF parse
   * ([[graft.functions.MediaCodecs]]); "no codecs offline" only ever
   * applied to external codec JARS.
   *
   * Each document deterministically synthesizes a media payload, then
   * the pipeline treats it exactly like fetched bytes:
   *
   *  1. render a gray pattern `v(x,y) = (3x + 5y + doc_id) mod 256` at
   *     `(16 + id mod 33) × (12 + n_chars mod 21)` and ENCODE it as a
   *     real PNG (IDAT, zlib, filters — the actual format);
   *  2. DECODE those bytes back through ImageIO and take every reported
   *     feature (dimensions, band count, channel sums) from the DECODED
   *     raster — the codec is load-bearing, a bit error anywhere in the
   *     PNG round trip breaks the oracle;
   *  3. nearest-neighbor-resize the decoded image to 32×32 and sum the
   *     resized channel (floor index mapping ⇒ closed-form);
   *  4. synthesize 16-bit PCM (`s(i) = ((31·id + 17i) mod 4097) − 2048`),
   *     ENCODE as a real RIFF/WAVE file, re-PARSE the container (chunk
   *     walk, fmt validation) and report rate/length/Σ|s| from the
   *     parsed samples.
   *
   * Every output is an exact integer with a closed form, so the DuckDB
   * twin checks the full encode→decode→extract chain bit-for-bit.
   * Decode is partition-parallel with no shuffle (`mapPartitions`, codec
   * init amortized per partition); at 100 TB the binary column streams
   * off parquet and only tiny feature rows move.
   */
  def qMultimodalDecode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaCodecs
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]

    // The codec work is ~300 µs/row of pure CPU, but the scan side is as
    // few partitions as the parquet row-group layout allows (the sf
    // fixtures are ONE row group ⇒ one task decoded everything). The
    // rows entering the map are 16 bytes each, so round-robin them
    // across the cluster before the expensive per-row compute — never
    // below the scan's own parallelism (at scale the scan is already
    // wide and this floor keeps it so).
    val par = math.max(spark.sparkContext.defaultParallelism,
      docs.rdd.getNumPartitions)
    val decoded = docs.repartition(par).mapPartitions { it =>
      // per-partition init point (codec warm-up in a real pipeline)
      it.map { case (id, nChars) =>
        val w = (16 + id % 33).toInt
        val h = (12 + nChars % 21).toInt
        val png = MediaCodecs.encodePng(w, h,
          (x, y) => ((x * 3 + y * 5 + id) % 256).toInt)
        val img = MediaCodecs.decodeImage(png)
        val resized = MediaCodecs.resizeNearest(img, 32, 32)

        val n = (200 + nChars % 100).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 31 + i * 17) % 4097) - 2048).toShort)
        val wav = MediaCodecs.encodeWavPcm16(8000, samples)
        val info = MediaCodecs.decodeWavPcm16(wav)

        DecodedFeatures(
          doc_id = id,
          img_w = img.getWidth.toLong,
          img_h = img.getHeight.toLong,
          channels = MediaCodecs.channels(img).toLong,
          pix_sum = MediaCodecs.redSum(img),
          resized_sum = MediaCodecs.redSum(resized),
          sample_rate = info.sampleRate.toLong,
          n_samples = info.nSamples,
          wav_sum_abs = info.sumAbs)
      }
    }
    decoded.toDF().orderBy(col("doc_id"))
  }

  /** DuckDB twin: closed forms of the synthesized patterns — equal to
    * the decoded-artifact stats only if the codec round trips exactly. */
  val qMultimodalDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(16 + doc_id % 33 AS BIGINT) AS w,
      |    CAST(12 + n_chars % 21 AS BIGINT) AS h,
      |    CAST(200 + n_chars % 100 AS BIGINT) AS n_samples
      |  FROM documents),
      |xs AS (SELECT g FROM generate_series(0, 47) t(g)),
      |ys AS (SELECT g FROM generate_series(0, 31) t(g)),
      |ss AS (SELECT g FROM generate_series(0, 299) t(g)),
      |pix AS (
      |  SELECT doc_id,
      |    CAST(SUM((x.g*3 + y.g*5 + doc_id) % 256) AS BIGINT) AS pix_sum
      |  FROM d JOIN xs x ON x.g < d.w JOIN ys y ON y.g < d.h
      |  GROUP BY doc_id),
      |rs AS (
      |  SELECT doc_id,
      |    CAST(SUM((((i.g*w)//32)*3 + ((j.g*h)//32)*5 + doc_id) % 256) AS BIGINT)
      |      AS resized_sum
      |  FROM d JOIN ys i ON TRUE JOIN ys j ON TRUE
      |  GROUP BY doc_id),
      |wav AS (
      |  SELECT doc_id,
      |    CAST(SUM(ABS(((doc_id*31 + i.g*17) % 4097) - 2048)) AS BIGINT)
      |      AS wav_sum_abs
      |  FROM d JOIN ss i ON i.g < d.n_samples GROUP BY doc_id)
      |SELECT d.doc_id, d.w AS img_w, d.h AS img_h, CAST(3 AS BIGINT) AS channels,
      |  pix.pix_sum, rs.resized_sum, CAST(8000 AS BIGINT) AS sample_rate,
      |  d.n_samples, wav.wav_sum_abs
      |FROM d JOIN pix USING(doc_id) JOIN rs USING(doc_id) JOIN wav USING(doc_id)
      |ORDER BY d.doc_id""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "multimodal_features" -> (qMultimodalFeatures _, qMultimodalFeaturesSql),
    "multimodal_decode" -> (qMultimodalDecode _, qMultimodalDecodeSql))
}
