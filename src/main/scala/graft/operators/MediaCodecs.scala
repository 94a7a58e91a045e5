package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for formats that need no native libraries: 24-bit
  * uncompressed BMP (Windows BITMAPINFOHEADER layout) and 16-bit PCM
  * RIFF/WAVE. These make the multimodal pipeline's decode step REAL for two
  * concrete formats — dimensions, channel order, row padding/flip and
  * sample values are recovered from actual container bytes — while codec-
  * dependent formats (JPEG/PNG/MP3/H.264) remain behind the documented stub
  * in [[MultimodalOps]] (this container ships no native codecs).
  *
  * Both formats are implemented from their public layouts: BMP = 14-byte
  * file header + 40-byte info header + bottom-up BGR rows padded to 4
  * bytes; WAV = RIFF chunk walk to `fmt ` (PCM, 16-bit) and `data`.
  */
object MediaCodecs {

  /** Decoded image: `rgb` is row-major TOP-DOWN, 3 bytes R,G,B per pixel. */
  final case class BmpImage(width: Int, height: Int, rgb: Array[Byte]) {
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
  }

  /** Encode as 24-bit BI_RGB: bottom-up rows, BGR byte order, rows padded
    * to a 4-byte boundary.
    */
  def encodeBmp(img: BmpImage): Array[Byte] = {
    val rowBytes = img.width * 3
    val stride = (rowBytes + 3) & ~3
    val dataSize = stride * img.height
    val out = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putShort(0).putShort(0).putInt(54)
    out.putInt(40).putInt(img.width).putInt(img.height)
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var k = 0 // storage row (bottom-up)
    while (k < img.height) {
      val y = img.height - 1 - k
      var x = 0
      while (x < img.width) {
        val o = (y * img.width + x) * 3
        out.put(img.rgb(o + 2)).put(img.rgb(o + 1)).put(img.rgb(o)) // BGR
        x += 1
      }
      var pad = rowBytes
      while (pad < stride) { out.put(0.toByte); pad += 1 }
      k += 1
    }
    out.array()
  }

  /** Decode 24-bit uncompressed BMP. Accepts any BITMAPINFOHEADER-family
    * header (40/108/124 bytes — the fields used sit at fixed offsets),
    * both bottom-up (positive height) and top-down (negative height) row
    * order; rejects palettized/compressed variants loudly.
    */
  def decodeBmp(bytes: Array[Byte]): BmpImage = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP (missing 'BM' magic)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOff = b.getInt(10)
    val hdrSize = b.getInt(14)
    require(hdrSize >= 40, s"BMP core-header (size $hdrSize) unsupported")
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val bitCount = b.getShort(28) & 0xffff
    val compression = b.getInt(30)
    require(width > 0 && rawHeight != 0, s"BMP dims ${width}x$rawHeight")
    require(bitCount == 24, s"BMP bit depth $bitCount unsupported (24-bit only)")
    require(compression == 0, s"BMP compression $compression unsupported (BI_RGB only)")
    val height = math.abs(rawHeight)
    val topDown = rawHeight < 0
    val stride = (width * 3 + 3) & ~3
    require(dataOff + stride.toLong * height <= bytes.length,
      s"BMP pixel data truncated")
    val rgb = new Array[Byte](width * height * 3)
    var k = 0 // storage row
    while (k < height) {
      val y = if (topDown) k else height - 1 - k
      var x = 0
      val ro = dataOff + k * stride
      while (x < width) {
        val o = (y * width + x) * 3
        rgb(o) = bytes(ro + x * 3 + 2)     // R (stored B,G,R)
        rgb(o + 1) = bytes(ro + x * 3 + 1) // G
        rgb(o + 2) = bytes(ro + x * 3)     // B
        x += 1
      }
      k += 1
    }
    BmpImage(width, height, rgb)
  }

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class WavAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode as canonical RIFF/WAVE: `fmt ` (PCM, 16-bit) then `data`. */
  def encodeWav(w: WavAudio): Array[Byte] = {
    val dataBytes = w.samples.length * 2
    val out = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(w.channels.toShort).putInt(w.sampleRate)
      .putInt(w.sampleRate * w.channels * 2)    // byte rate
      .putShort((w.channels * 2).toShort)       // block align
      .putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    w.samples.foreach(out.putShort)
    out.array()
  }

  /** Decode PCM 16-bit RIFF/WAVE by walking the chunk list (chunks are
    * 2-byte aligned, so odd-sized non-audio chunks between `fmt ` and
    * `data` are skipped correctly). Rejects non-PCM encodings loudly.
    */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE",
      "not a WAV (missing RIFF/WAVE magic)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var p = 12
    var rate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (p + 8 <= bytes.length && (rate < 0 || samples == null)) {
      val id = new String(bytes, p, 4, "US-ASCII")
      val size = b.getInt(p + 4)
      require(size >= 0 && p + 8 + size <= bytes.length,
        s"WAV chunk '$id' overruns file")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val fmt = b.getShort(p + 8) & 0xffff
          require(fmt == 1, s"WAV audio format $fmt unsupported (PCM only)")
          channels = b.getShort(p + 10) & 0xffff
          rate = b.getInt(p + 12)
          val bits = b.getShort(p + 22) & 0xffff
          require(bits == 16, s"WAV bit depth $bits unsupported (16-bit only)")
        case "data" =>
          require(rate >= 0, "WAV data chunk before fmt")
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = b.getShort(p + 8 + i * 2); i += 1 }
        case _ => () // skip LIST/INFO/fact/...
      }
      p += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(samples != null, "WAV has no data chunk")
    WavAudio(rate, channels, samples)
  }
}
