package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for formats that need no native libraries: 24-bit
  * uncompressed BMP (Windows BITMAPINFOHEADER layout), 16-bit PCM
  * RIFF/WAVE, and 8-bit non-interlaced PNG (ISO 15948: zlib-deflated
  * scanlines with the five per-row filters). These make the multimodal
  * pipeline's decode step REAL for three concrete formats — dimensions,
  * channel order, row padding/flip, filters and sample values are
  * recovered from actual container bytes — while truly codec-dependent
  * formats (JPEG/MP3/H.264) remain behind the documented stub in
  * [[MultimodalOps]] (this container ships no native codecs).
  *
  * The PNG reader is externally validated: the JDK's ImageIO PNG *writer*
  * produces the test inputs, so round-trips cross an independent
  * implementation, not our own encoder.
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

  /** Decoded PNG: `channels` 1 = gray, 2 = gray+alpha, 3 = RGB (incl.
    * palette expansion), 4 = RGBA; `pixels` row-major TOP-DOWN, `channels`
    * bytes per pixel.
    */
  final case class PngImage(width: Int, height: Int, channels: Int,
                            pixels: Array[Byte]) {
    require(pixels.length == width * height * channels, "pixels != w*h*ch")
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && PngSig.indices.forall(i => bytes(i) == PngSig(i))

  /** Decode an 8-bit non-interlaced PNG (ISO 15948): chunk walk with CRC32
    * verification, concatenated-IDAT zlib inflate, and the five scanline
    * filters (none/sub/up/average/paeth). Color types 0 (gray), 2 (RGB),
    * 3 (palette → RGB), 4 (gray+alpha) and 6 (RGBA). Rejected loudly:
    * other bit depths and Adam7 interlacing.
    */
  def decodePng(bytes: Array[Byte]): PngImage = {
    require(isPng(bytes), "not a PNG (bad signature)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var p = 8
    var w = -1; var h = -1; var colorType = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && p + 12 <= bytes.length) {
      val len = b.getInt(p)
      require(len >= 0 && p + 12 + len <= bytes.length, "PNG chunk overruns file")
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, p + 4, 4 + len)
      require(crc.getValue.toInt == b.getInt(p + 8 + len), s"bad CRC in $typ chunk")
      typ match {
        case "IHDR" =>
          w = b.getInt(p + 8); h = b.getInt(p + 12)
          val bitDepth = bytes(p + 16) & 0xff
          colorType = bytes(p + 17) & 0xff
          require(bitDepth == 8, s"PNG bit depth $bitDepth unsupported (8 only)")
          require(bytes(p + 18) == 0 && bytes(p + 19) == 0,
            "PNG compression/filter method")
          require((bytes(p + 20) & 0xff) == 0,
            "Adam7-interlaced PNG unsupported")
        case "PLTE" =>
          palette = java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)
        case "IDAT" => idat.write(bytes, p + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks (tEXt, gAMA, ...) are skippable
      }
      p += 12 + len
    }
    require(w > 0 && h > 0, "PNG has no IHDR")
    val srcCh = colorType match {
      case 0 => 1
      case 2 => 3
      case 3 => 1
      case 4 => 2
      case 6 => 4
      case c => throw new IllegalArgumentException(s"PNG color type $c")
    }
    // inflate the concatenated IDAT zlib stream
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val stride = w * srcCh
    val raw = new Array[Byte](h * (1 + stride))
    var got = 0
    var made = -1
    while (got < raw.length && !inf.finished() && made != 0) {
      made = inf.inflate(raw, got, raw.length - got)
      got += made
    }
    inf.end()
    require(got == raw.length, s"PNG pixel data truncated ($got of ${raw.length})")
    // unfilter scanlines in place
    def paeth(a: Int, bb: Int, c: Int): Int = {
      val pp = a + bb - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - bb); val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }
    val out = new Array[Byte](h * stride)
    var row = 0
    while (row < h) {
      val f = raw(row * (1 + stride)) & 0xff
      val base = row * (1 + stride) + 1
      var i = 0
      while (i < stride) {
        val x = raw(base + i) & 0xff
        val left = if (i >= srcCh) out(row * stride + i - srcCh) & 0xff else 0
        val up = if (row > 0) out((row - 1) * stride + i) & 0xff else 0
        val ul = if (row > 0 && i >= srcCh) out((row - 1) * stride + i - srcCh) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + ((left + up) >> 1)
          case 4 => x + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"PNG filter $other")
        }
        out(row * stride + i) = v.toByte
        i += 1
      }
      row += 1
    }
    if (colorType == 3) {
      require(palette != null, "palette PNG without PLTE")
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = out(i) & 0xff
        require(idx * 3 + 2 < palette.length, s"palette index $idx out of range")
        rgb(i * 3) = palette(idx * 3)
        rgb(i * 3 + 1) = palette(idx * 3 + 1)
        rgb(i * 3 + 2) = palette(idx * 3 + 2)
        i += 1
      }
      PngImage(w, h, 3, rgb)
    } else PngImage(w, h, srcCh, out)
  }
}
