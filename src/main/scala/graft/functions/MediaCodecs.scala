package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage

import javax.imageio.ImageIO

/**
 * Real media codecs on the JDK's own codec stack — no external jars.
 * `javax.imageio` (java.desktop module, present in this JVM) carries
 * PNG/BMP/GIF/JPEG coders, and WAV is a plain RIFF container parsed here
 * directly. These back the multimodal pipeline's decode step with actual
 * byte-level decoding; only exotic codecs (video, modern audio) remain
 * out of scope offline.
 *
 * Everything is executor-side and allocation-conscious: decode runs
 * inside `mapPartitions` with no shuffle, one image/clip at a time, and
 * the returned features are a handful of integers — the 100 TB shape is
 * "binary column in, tiny feature row out", bounded memory per task.
 */
object MediaCodecs {

  // ImageIO's default stream cache is DISK-backed: every write/read via
  // an OutputStream/InputStream wraps it in a FileCache image stream —
  // one temp FILE created, written, read back and deleted PER CALL.
  // Two calls per row made the decode stage filesystem-bound (and
  // immune to task parallelism — the tasks contend on tmpdir). Memory
  // caching produces byte-identical codec output; our payloads are tiny
  // (KBs), so the memory cost is nil. JVM-global, set once at class
  // load on driver and executors alike.
  ImageIO.setUseCache(false)

  // ------------------------------------------------------------ images

  /** Encode a grayscale-valued pattern as a real PNG (value replicated
    * across RGB). `pixel(x, y)` is masked to 0..255. */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = pixel(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG). */
  def decodeImage(data: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(data))
    if (img == null) {
      throw new IllegalArgumentException(
        "undecodable image payload (no ImageIO reader matched)")
    }
    img
  }

  /** Number of raster bands (3 for RGB, 4 with alpha, 1 grayscale). */
  def channels(img: BufferedImage): Int = img.getRaster.getNumBands

  /** Sum of the red channel over all pixels (our encoded patterns are
    * gray, so red == green == blue == luminance). Exact integers. */
  def redSum(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        sum += (img.getRGB(x, y) >> 16) & 0xff
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Nearest-neighbor resize by floor index mapping — deterministic and
    * closed-form (`src(i*w/W, j*h/H)`), no Graphics2D rendering. */
  def resizeNearest(img: BufferedImage, width: Int, height: Int): BufferedImage = {
    val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val sw = img.getWidth
    val sh = img.getHeight
    var j = 0
    while (j < height) {
      var i = 0
      while (i < width) {
        out.setRGB(i, j, img.getRGB(i * sw / width, j * sh / height))
        i += 1
      }
      j += 1
    }
    out
  }

  // ------------------------------------------------------------- audio

  final case class WavInfo(
      sampleRate: Int, nChannels: Int, nSamples: Long, sumAbs: Long)

  /** Encode 16-bit PCM mono as a standard RIFF/WAVE file. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE container: walks chunks (skipping unknown ones),
    * requires PCM 16-bit, returns rate/channels/length and the exact
    * integer sum of absolute sample values. */
  def decodeWavPcm16(data: Array[Byte]): WavInfo = {
    val buf = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", "not a RIFF container")
    buf.getInt // riff size
    require(fourcc() == "WAVE", "not a WAVE file")
    var sampleRate = 0
    var nChannels = 0
    var bits = 0
    var nSamples = 0L
    var sumAbs = 0L
    var sawData = false
    while (buf.remaining() >= 8) {
      val id = fourcc()
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmtStart = buf.position()
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          nChannels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort
          require(bits == 16, s"not 16-bit PCM ($bits)")
          buf.position(fmtStart + len + (len & 1))
        case "data" =>
          require(bits == 16 && nChannels > 0, "data chunk before fmt")
          val n = len / 2
          var i = 0
          while (i < n) {
            sumAbs += math.abs(buf.getShort.toLong)
            i += 1
          }
          nSamples = n.toLong / nChannels
          sawData = true
          if ((len & 1) == 1 && buf.hasRemaining) buf.get
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sawData, "no data chunk")
    WavInfo(sampleRate, nChannels, nSamples, sumAbs)
  }
}
