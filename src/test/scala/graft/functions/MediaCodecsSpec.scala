package graft.functions

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** The JDK-backed media codecs behind multimodal_decode. */
class MediaCodecsSpec extends AnyFunSuite {

  test("png encode/decode round trips pixels exactly") {
    val png = MediaCodecs.encodePng(20, 13, (x, y) => x * 7 + y * 11)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val img = MediaCodecs.decodeImage(png)
    assert(img.getWidth == 20 && img.getHeight == 13)
    assert(MediaCodecs.channels(img) == 3)
    var expected = 0L
    for (y <- 0 until 13; x <- 0 until 20) expected += (x * 7 + y * 11) & 0xff
    assert(MediaCodecs.redSum(img) == expected)
  }

  test("bmp payloads decode through the same path") {
    val img0 = MediaCodecs.decodeImage(MediaCodecs.encodePng(6, 4, (x, y) => x + y))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img0, "bmp", bos)
    val img = MediaCodecs.decodeImage(bos.toByteArray)
    assert(img.getWidth == 6 && img.getHeight == 4)
    assert(MediaCodecs.redSum(img) == MediaCodecs.redSum(img0))
  }

  test("nearest-neighbor resize uses floor index mapping") {
    val img = MediaCodecs.decodeImage(MediaCodecs.encodePng(4, 4, (x, y) => x + 4 * y))
    val up = MediaCodecs.resizeNearest(img, 8, 8)
    assert(up.getWidth == 8 && up.getHeight == 8)
    // out(i,j) = src(i*4/8, j*4/8) = src(i/2, j/2)
    for (j <- 0 until 8; i <- 0 until 8) {
      assert(((up.getRGB(i, j) >> 16) & 0xff) == (i / 2 + 4 * (j / 2)))
    }
    val down = MediaCodecs.resizeNearest(img, 2, 2)
    assert(((down.getRGB(1, 1) >> 16) & 0xff) == (2 + 4 * 2))
  }

  test("wav encode/parse round trips rate, length, and sample sum") {
    val samples = Array.tabulate(300)(i => ((i * 37) % 4001 - 2000).toShort)
    val wav = MediaCodecs.encodeWavPcm16(16000, samples)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    val info = MediaCodecs.decodeWavPcm16(wav)
    assert(info.sampleRate == 16000)
    assert(info.nChannels == 1)
    assert(info.nSamples == 300L)
    assert(info.sumAbs == samples.map(s => math.abs(s.toLong)).sum)
  }

  test("wav parser skips unknown chunks") {
    val samples = Array.tabulate(10)(i => i.toShort)
    val wav = MediaCodecs.encodeWavPcm16(8000, samples)
    // splice a LIST chunk (9 bytes payload, odd -> padded) before `data`
    val dataIdx = {
      var i = 12
      var found = -1
      while (found < 0) {
        val id = new String(wav.slice(i, i + 4), "US-ASCII")
        if (id == "data") found = i
        else {
          val len = java.nio.ByteBuffer.wrap(wav, i + 4, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
          i += 8 + len + (len & 1)
        }
      }
      found
    }
    val extra = java.nio.ByteBuffer.allocate(8 + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(9)
      .put(new Array[Byte](10)) // 9 payload + 1 pad
      .array()
    val spliced = wav.slice(0, dataIdx) ++ extra ++ wav.slice(dataIdx, wav.length)
    val info = MediaCodecs.decodeWavPcm16(spliced)
    assert(info.nSamples == 10L)
    assert(info.sumAbs == (0 until 10).sum.toLong)
  }

  test("non-PCM and non-RIFF payloads are rejected loudly") {
    val wav = MediaCodecs.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    wav(20) = 3 // audioFormat -> IEEE float
    assertThrows[IllegalArgumentException](MediaCodecs.decodeWavPcm16(wav))
    assertThrows[IllegalArgumentException](
      MediaCodecs.decodeWavPcm16("nope".getBytes ++ new Array[Byte](40)))
    assertThrows[IllegalArgumentException](
      MediaCodecs.decodeImage(new Array[Byte](16)))
  }
}
