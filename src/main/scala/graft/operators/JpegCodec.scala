package graft.operators

/** Pure-JVM baseline JPEG codec (ITU-T T.81 sequential DCT, JFIF color):
  * from-spec Huffman entropy coding (Annex F canonical decode, Annex K
  * standard tables), dequantization, separable double-precision IDCT with
  * floor(x+0.5) rounding, 4:2:0/4:2:2/4:4:4 chroma with box up/downsampling,
  * and the JFIF fixed-point YCbCr↔RGB transform (the 91881/65536-style
  * integer form, so constant regions convert EXACTLY and independently
  * reproducibly). Encoder writes baseline grayscale or 4:2:0 YCbCr with
  * IJG-scaled Annex K quantization tables.
  *
  * Determinism contract (what the oracle relies on): a block whose samples
  * are all `v` encodes to a DC-only block with coded value
  * S = sign(8(v−128))·((|8(v−128)| + Q/2) div Q) and decodes to
  * clamp(128 + floor((S·Q + 4)/8)) — both exact integer arithmetic. The
  * same shortcut holds for libjpeg-family decoders (DC-only IDCT is
  * (dc + 4) >> 3 there), so constant-block images also cross-validate
  * bit-exactly against ImageIO; general content agrees within ±2 (the
  * T.83 IDCT tolerance), which the unit tests pin.
  *
  * Rejected loudly: progressive/arithmetic/hierarchical modes, 12-bit
  * precision, 16-bit quant tables, non-interleaved multi-scan files.
  */
object JpegCodec {

  /** Decoded image: channels 1 (gray) or 3 (RGB), row-major interleaved. */
  final case class JpegImage(width: Int, height: Int, channels: Int,
                             pixels: Array[Byte]) {
    require(pixels.length == width * height * channels, "pixels != w*h*ch")
  }

  // ---- Annex K tables (public spec constants) ----

  val StdLumaQuant: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // standard Huffman tables, Annex K.3: (bits per code length 1..16, values)
  private val StdDcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdDcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdAcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val StdAcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** IJG quality scaling of a base table (quality 1..100). */
  def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"quality $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    base.map { q =>
      val v = (q * scale + 50) / 100
      math.max(1, math.min(255, v))
    }
  }

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  // ---- bit I/O ----

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def writeBits(value: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        acc = (acc << 1) | ((value >> b) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        b -= 1
      }
    }
    /** Pad to byte boundary with 1-bits (T.81 F.1.2.3). */
    def flush(): Array[Byte] = {
      while (nBits != 0) writeBits(1, 1)
      out.toByteArray
    }
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    /** Byte-align and skip an expected RSTn marker; resets bit state. */
    def syncRestart(n: Int): Unit = {
      acc = 0; nBits = 0
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xff) == (0xd0 + n),
        f"expected RST$n marker at $pos")
      pos += 2
    }
    def readBit(): Int = {
      if (nBits == 0) {
        require(pos < bytes.length, "JPEG entropy stream truncated")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "JPEG truncated after 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else if (m == 0xd9) b = 0 // EOI padding reads as zeros
          else throw new IllegalArgumentException(
            f"unexpected marker 0xFF$m%02X inside entropy stream")
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  // ---- Huffman ----

  /** Canonical table: encode lookup (code, length per value) and the
    * Annex F decode arrays (minCode/maxCode/valPtr per length). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val (codes, lengths) = {
      val c = new Array[Int](256); val l = new Array[Int](256)
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len)) {
          c(vals(k)) = code; l(vals(k)) = len
          code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      (c, l)
    }
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len); k += bits(len)
          maxCode(len) = code - 1
        } else maxCode(len) = -1
        code <<= 1
        len += 1
      }
    }
    def decode(r: BitReader): Int = {
      var code = r.readBit()
      var len = 1
      while (len < 16 && (maxCode(len) < 0 || code > maxCode(len))) {
        code = (code << 1) | r.readBit()
        len += 1
      }
      require(maxCode(len) >= 0 && code <= maxCode(len), "bad Huffman code")
      vals(valPtr(len) + code - minCode(len))
    }
  }

  /** T.81 F.12 EXTEND: map `bits`-bit magnitude v to its signed value. */
  private def extend(v: Int, bits: Int): Int =
    if (bits == 0) 0
    else if (v < (1 << (bits - 1))) v - (1 << bits) + 1
    else v

  private def magnitudeBits(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  // ---- IDCT / FDCT (separable, double precision) ----

  private val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    var k = 0
    while (k < 64) {
      val x = k / 8; val u = k % 8
      t(k) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
      k += 1
    }
    t
  }
  private val C0 = 1.0 / math.sqrt(2.0)

  /** Dequantized coefficients (natural order) → spatial samples 0..255.
    * DC-only blocks short-circuit to the exact integer form
    * clamp(128 + floor((dc + 4)/8)) — the closed form the oracle (and
    * libjpeg's DC shortcut) computes.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    var acOnly = 0
    var i = 1
    while (i < 64 && acOnly == 0) { acOnly |= coef(i); i += 1 }
    if (acOnly == 0) {
      val v = clamp255(128 + Math.floorDiv(coef(0) + 4, 8))
      java.util.Arrays.fill(out, 0, 64, v)
      return
    }
    val tmp = new Array[Double](64)
    // rows: for each output x, sum over u of C(u)/2 * coef * cos
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) C0 else 1.0
          s += cu * coef(y * 8 + u) * CosTab(x * 8 + u)
          u += 1
        }
        tmp(y * 8 + x) = s / 2.0
        x += 1
      }
      y += 1
    }
    var xx = 0
    while (xx < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) C0 else 1.0
          s += cv * tmp(v * 8 + xx) * CosTab(yy * 8 + v)
          v += 1
        }
        out(yy * 8 + xx) = clamp255(128 + Math.floor(s / 2.0 + 0.5).toInt)
        yy += 1
      }
      xx += 1
    }
  }

  /** Spatial samples (0..255, level-shift applied here) → DCT coefficients. */
  private def fdctBlock(samples: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (samples(y * 8 + x) - 128) * CosTab(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) {
      var uu = 0
      while (uu < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + uu) * CosTab(yy * 8 + v); yy += 1 }
        val cu = if (uu == 0) C0 else 1.0
        val cv = if (v == 0) C0 else 1.0
        out(v * 8 + uu) = s * cu * cv / 4.0
        uu += 1
      }
      v += 1
    }
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- JFIF fixed-point color transforms (exact integer arithmetic) ----

  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    val cb = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
    val cr = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
    (clamp255(y), clamp255(cb), clamp255(cr))
  }

  def yccToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val r = y + ((91881 * (cr - 128) + 32768) >> 16)
    val g = y - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
    val b = y + ((116130 * (cb - 128) + 32768) >> 16)
    (clamp255(r), clamp255(g), clamp255(b))
  }

  // ---- decoder ----

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Huff = null
    var acTable: Huff = null
    var pred: Int = 0
    var plane: Array[Int] = null // padded to blocksAcross*8 x blocksDown*8
    var planeW: Int = 0
    var planeH: Int = 0
  }

  /** Decode a baseline JPEG. Grayscale → channels=1; YCbCr → channels=3
    * RGB (box chroma upsampling, JFIF integer color transform). */
  def decode(bytes: Array[Byte]): JpegImage = {
    require(isJpeg(bytes), "not a JPEG (missing SOI)")
    var p = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pixels: Array[Byte] = null
    var channels = 0

    def u16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

    var done = false
    while (!done) {
      require(p + 1 < bytes.length, "JPEG truncated (no EOI)")
      require((bytes(p) & 0xff) == 0xff, f"expected marker at $p")
      val marker = bytes(p + 1) & 0xff
      p += 2
      marker match {
        case 0xd9 => done = true // EOI
        case m if m >= 0xd0 && m <= 0xd7 => () // stray RST (shouldn't happen)
        case 0xc0 | 0xc1 => // SOF0/1 baseline
          val len = u16(p)
          val prec = bytes(p + 2) & 0xff
          require(prec == 8, s"JPEG precision $prec unsupported (8-bit only)")
          height = u16(p + 3); width = u16(p + 5)
          val nc = bytes(p + 7) & 0xff
          require(nc == 1 || nc == 3, s"JPEG component count $nc unsupported")
          comps = Array.tabulate(nc) { i =>
            val o = p + 8 + i * 3
            val id = bytes(o) & 0xff
            val hv = bytes(o + 1) & 0xff
            Component(id, hv >> 4, hv & 0xf, bytes(o + 2) & 0xff)
          }
          comps.foreach { c =>
            require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
              s"sampling ${c.h}x${c.v} unsupported (1-2 only)")
          }
          p += len
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) unsupported — baseline only")
        case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
          throw new IllegalArgumentException(
            f"JPEG SOF 0x$m%02X mode unsupported — baseline only")
        case 0xc4 => // DHT
          val len = u16(p)
          var q = p + 2
          while (q < p + len) {
            val tcTh = bytes(q) & 0xff
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { bits(i) = bytes(q + i) & 0xff; total += bits(i); i += 1 }
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = bytes(q + 17 + i) & 0xff; i += 1 }
            val h = new Huff(bits, vals)
            if ((tcTh >> 4) == 0) dcTabs(tcTh & 0xf) = h else acTabs(tcTh & 0xf) = h
            q += 17 + total
          }
          p += len
        case 0xdb => // DQT
          val len = u16(p)
          var q = p + 2
          while (q < p + len) {
            val pqTq = bytes(q) & 0xff
            require((pqTq >> 4) == 0, "16-bit quant tables unsupported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(ZigZag(i)) = bytes(q + 1 + i) & 0xff; i += 1 }
            quant(pqTq & 0xf) = t
            q += 65
          }
          p += len
        case 0xdd => // DRI
          restartInterval = u16(p + 2)
          p += u16(p)
        case 0xda => // SOS
          val len = u16(p)
          val ns = bytes(p + 2) & 0xff
          require(comps != null, "SOS before SOF")
          require(ns == comps.length, "non-interleaved multi-scan unsupported")
          var i = 0
          while (i < ns) {
            val cs = bytes(p + 3 + i * 2) & 0xff
            val tt = bytes(p + 4 + i * 2) & 0xff
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"SOS references unknown component $cs"))
            c.dcTable = dcTabs(tt >> 4); c.acTable = acTabs(tt & 0xf)
            require(c.dcTable != null && c.acTable != null, "missing Huffman table")
            i += 1
          }
          p += len
          // entropy-coded segment
          val hMax = comps.map(_.h).max
          val vMax = comps.map(_.v).max
          val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
          val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
          comps.foreach { c =>
            c.planeW = mcusX * c.h * 8
            c.planeH = mcusY * c.v * 8
            c.plane = new Array[Int](c.planeW * c.planeH)
            c.pred = 0
          }
          val r = new BitReader(bytes, p)
          val coef = new Array[Int](64)
          val block = new Array[Int](64)
          var mcu = 0
          var rst = 0
          val nMcus = mcusX * mcusY
          while (mcu < nMcus) {
            if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
              r.syncRestart(rst % 8)
              rst += 1
              comps.foreach(_.pred = 0)
            }
            val mx = mcu % mcusX; val my = mcu / mcusX
            comps.foreach { c =>
              val qt = quant(c.tq)
              require(qt != null, s"component ${c.id} references missing quant table")
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  java.util.Arrays.fill(coef, 0)
                  // DC
                  val dcBits = c.dcTable.decode(r)
                  val diff = extend(r.readBits(dcBits), dcBits)
                  c.pred += diff
                  coef(0) = c.pred * qt(0)
                  // AC
                  var k = 1
                  while (k < 64) {
                    val rs = c.acTable.decode(r)
                    val run = rs >> 4; val size = rs & 0xf
                    if (size == 0) {
                      if (run == 15) k += 16 // ZRL
                      else k = 64 // EOB
                    } else {
                      k += run
                      require(k < 64, "AC run overruns block")
                      val zz = ZigZag(k)
                      coef(zz) = extend(r.readBits(size), size) * qt(zz)
                      k += 1
                    }
                  }
                  idctBlock(coef, block)
                  val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
                  var yy = 0
                  while (yy < 8) {
                    var xx = 0
                    while (xx < 8) {
                      c.plane((oy + yy) * c.planeW + ox + xx) = block(yy * 8 + xx)
                      xx += 1
                    }
                    yy += 1
                  }
                  bx += 1
                }
                by += 1
              }
            }
            mcu += 1
          }
          p = r.pos
          // assemble output
          if (comps.length == 1) {
            channels = 1
            val c = comps(0)
            pixels = new Array[Byte](width * height)
            var yy = 0
            while (yy < height) {
              var xx = 0
              while (xx < width) {
                pixels(yy * width + xx) = c.plane(yy * c.planeW + xx).toByte
                xx += 1
              }
              yy += 1
            }
          } else {
            channels = 3
            val cy = comps(0); val cb = comps(1); val cr = comps(2)
            pixels = new Array[Byte](width * height * 3)
            var yy = 0
            while (yy < height) {
              var xx = 0
              while (xx < width) {
                val yv = cy.plane((yy * cy.v / vMax) * cy.planeW + xx * cy.h / hMax)
                val bv = cb.plane((yy * cb.v / vMax) * cb.planeW + xx * cb.h / hMax)
                val rv = cr.plane((yy * cr.v / vMax) * cr.planeW + xx * cr.h / hMax)
                val (rr, gg, bb2) = yccToRgb(yv, bv, rv)
                val o = (yy * width + xx) * 3
                pixels(o) = rr.toByte; pixels(o + 1) = gg.toByte; pixels(o + 2) = bb2.toByte
                xx += 1
              }
              yy += 1
            }
          }
        case 0x01 => () // TEM, no payload
        case _ => // APPn, COM, and other length-delimited segments
          p += u16(p)
      }
    }
    require(pixels != null, "JPEG has no scan")
    JpegImage(width, height, channels, pixels)
  }

  // ---- encoder ----

  /** Quantize one coefficient: round-half-away-from-zero of c/q — for a
    * constant block this is the exact integer form the oracle mirrors. */
  private def quantize(c: Double, q: Int): Int = {
    val s = c / q
    if (s >= 0) Math.floor(s + 0.5).toInt else -Math.floor(-s + 0.5).toInt
  }

  private def writeSegment(out: java.io.ByteArrayOutputStream, marker: Int,
                           payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  private def dqtPayload(id: Int, table: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](65)
    b(0) = id.toByte
    var i = 0
    while (i < 64) { b(1 + i) = table(ZigZag(i)).toByte; i += 1 }
    b
  }

  private def dhtPayload(tcTh: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] = {
    val b = new Array[Byte](17 + vals.length)
    b(0) = tcTh.toByte
    var i = 1
    while (i <= 16) { b(i) = bits(i).toByte; i += 1 }
    i = 0
    while (i < vals.length) { b(17 + i) = vals(i).toByte; i += 1 }
    b
  }

  private def encodeBlock(w: BitWriter, samples: Array[Int], qt: Array[Int],
                          dc: Huff, ac: Huff, pred: Int): Int = {
    val coef = new Array[Double](64)
    fdctBlock(samples, coef)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) { zz(i) = quantize(coef(ZigZag(i)), qt(ZigZag(i))); i += 1 }
    // DC
    val diff = zz(0) - pred
    val dcBits = magnitudeBits(diff)
    w.writeBits(dc.codes(dcBits), dc.lengths(dcBits))
    if (dcBits > 0)
      w.writeBits(if (diff >= 0) diff else diff + (1 << dcBits) - 1, dcBits)
    // AC with run-lengths
    var run = 0
    i = 1
    while (i < 64) {
      if (zz(i) == 0) run += 1
      else {
        while (run > 15) { w.writeBits(ac.codes(0xf0), ac.lengths(0xf0)); run -= 16 }
        val size = magnitudeBits(zz(i))
        val rs = (run << 4) | size
        w.writeBits(ac.codes(rs), ac.lengths(rs))
        w.writeBits(if (zz(i) >= 0) zz(i) else zz(i) + (1 << size) - 1, size)
        run = 0
      }
      i += 1
    }
    if (run > 0) w.writeBits(ac.codes(0x00), ac.lengths(0x00)) // EOB
    zz(0)
  }

  /** Gather an 8x8 block from a padded plane (edge replication). */
  private def gather(plane: Array[Int], pw: Int, ph: Int, ox: Int, oy: Int,
                     out: Array[Int]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(oy + y, ph - 1)
      var x = 0
      while (x < 8) {
        out(y * 8 + x) = plane(sy * pw + math.min(ox + x, pw - 1))
        x += 1
      }
      y += 1
    }
  }

  /** Encode 8-bit grayscale as baseline JFIF. `restartInterval` > 0 emits
    * DRI + RSTn markers every that many MCUs (and resets the DC predictor),
    * exercising the decoder's resynchronization path. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
                 quality: Int = 90, restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == width * height, "gray length != w*h")
    val qt = scaleQuant(StdLumaQuant, quality)
    val dc = new Huff(StdDcLumaBits, StdDcLumaVals)
    val ac = new Huff(StdAcLumaBits, StdAcLumaVals)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSegment(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xdb, dqtPayload(0, qt))
    if (restartInterval > 0)
      writeSegment(out, 0xdd,
        Array[Byte]((restartInterval >> 8).toByte, restartInterval.toByte))
    writeSegment(out, 0xc0, Array[Byte](8,
      (height >> 8).toByte, height.toByte, (width >> 8).toByte, width.toByte,
      1, 1, 0x11, 0))
    writeSegment(out, 0xc4, dhtPayload(0x00, StdDcLumaBits, StdDcLumaVals))
    writeSegment(out, 0xc4, dhtPayload(0x10, StdAcLumaBits, StdAcLumaVals))
    writeSegment(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val plane = new Array[Int](width * height)
    var i = 0
    while (i < plane.length) { plane(i) = gray(i) & 0xff; i += 1 }
    var w = new BitWriter
    val block = new Array[Int](64)
    var pred = 0
    var mcu = 0
    var rst = 0
    val mcusX = (width + 7) / 8
    val nMcus = mcusX * ((height + 7) / 8)
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        val es = w.flush()
        out.write(es, 0, es.length)
        out.write(0xff); out.write(0xd0 + (rst % 8))
        rst += 1
        w = new BitWriter
        pred = 0
      }
      gather(plane, width, height, (mcu % mcusX) * 8, (mcu / mcusX) * 8, block)
      pred = encodeBlock(w, block, qt, dc, ac, pred)
      mcu += 1
    }
    val es = w.flush()
    out.write(es, 0, es.length)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Encode RGB as baseline JFIF YCbCr 4:2:0. */
  def encodeColor420(width: Int, height: Int, rgb: Array[Byte],
                     quality: Int = 90): Array[Byte] =
    encodeColor(width, height, rgb, quality, 2, 2)

  /** Encode RGB as baseline JFIF YCbCr with luma sampling (hSub, vSub):
    * (2,2) = 4:2:0, (2,1) = 4:2:2, (1,1) = 4:4:4. Box chroma downsampling
    * with +half rounding — constant sampling quads subsample exactly. */
  def encodeColor(width: Int, height: Int, rgb: Array[Byte],
                  quality: Int, hSub: Int, vSub: Int): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length != w*h*3")
    require(Seq((1, 1), (2, 1), (2, 2)).contains((hSub, vSub)),
      s"sampling ${hSub}x$vSub unsupported (4:4:4 / 4:2:2 / 4:2:0)")
    val qtL = scaleQuant(StdLumaQuant, quality)
    val qtC = scaleQuant(StdChromaQuant, quality)
    val dcL = new Huff(StdDcLumaBits, StdDcLumaVals)
    val acL = new Huff(StdAcLumaBits, StdAcLumaVals)
    val dcC = new Huff(StdDcChromaBits, StdDcChromaVals)
    val acC = new Huff(StdAcChromaBits, StdAcChromaVals)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8)
    writeSegment(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    writeSegment(out, 0xdb, dqtPayload(0, qtL))
    writeSegment(out, 0xdb, dqtPayload(1, qtC))
    val lumaHv = ((hSub << 4) | vSub).toByte
    writeSegment(out, 0xc0, Array[Byte](8,
      (height >> 8).toByte, height.toByte, (width >> 8).toByte, width.toByte,
      3, 1, lumaHv, 0, 2, 0x11, 1, 3, 0x11, 1))
    writeSegment(out, 0xc4, dhtPayload(0x00, StdDcLumaBits, StdDcLumaVals))
    writeSegment(out, 0xc4, dhtPayload(0x10, StdAcLumaBits, StdAcLumaVals))
    writeSegment(out, 0xc4, dhtPayload(0x01, StdDcChromaBits, StdDcChromaVals))
    writeSegment(out, 0xc4, dhtPayload(0x11, StdAcChromaBits, StdAcChromaVals))
    writeSegment(out, 0xda, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    // color planes (chroma downsampled by (hSub, vSub))
    val yPlane = new Array[Int](width * height)
    val cw = (width + hSub - 1) / hSub; val ch = (height + vSub - 1) / vSub
    val cbFull = new Array[Int](width * height)
    val crFull = new Array[Int](width * height)
    var i = 0
    while (i < width * height) {
      val (y, cb, cr) = rgbToYcc(rgb(i * 3) & 0xff, rgb(i * 3 + 1) & 0xff,
        rgb(i * 3 + 2) & 0xff)
      yPlane(i) = y; cbFull(i) = cb; crFull(i) = cr
      i += 1
    }
    def subsample(full: Array[Int]): Array[Int] = {
      if (hSub == 1 && vSub == 1) return full
      val s = new Array[Int](cw * ch)
      val half = hSub * vSub / 2
      var yy = 0
      while (yy < ch) {
        var xx = 0
        while (xx < cw) {
          var acc = 0
          var dy = 0
          while (dy < vSub) {
            var dx = 0
            while (dx < hSub) {
              val sx = math.min(xx * hSub + dx, width - 1)
              val sy = math.min(yy * vSub + dy, height - 1)
              acc += full(sy * width + sx)
              dx += 1
            }
            dy += 1
          }
          s(yy * cw + xx) = (acc + half) / (hSub * vSub)
          xx += 1
        }
        yy += 1
      }
      s
    }
    val cbPlane = subsample(cbFull)
    val crPlane = subsample(crFull)
    val w = new BitWriter
    val block = new Array[Int](64)
    val mcuW = 8 * hSub; val mcuH = 8 * vSub
    val mcusX = (width + mcuW - 1) / mcuW; val mcusY = (height + mcuH - 1) / mcuH
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0
    while (mcu < mcusX * mcusY) {
      val mx = mcu % mcusX; val my = mcu / mcusX
      var by = 0
      while (by < vSub) {
        var bx = 0
        while (bx < hSub) {
          gather(yPlane, width, height, mx * mcuW + bx * 8, my * mcuH + by * 8, block)
          predY = encodeBlock(w, block, qtL, dcL, acL, predY)
          bx += 1
        }
        by += 1
      }
      gather(cbPlane, cw, ch, mx * 8, my * 8, block)
      predCb = encodeBlock(w, block, qtC, dcC, acC, predCb)
      gather(crPlane, cw, ch, mx * 8, my * 8, block)
      predCr = encodeBlock(w, block, qtC, dcC, acC, predCr)
      mcu += 1
    }
    val es = w.flush()
    out.write(es, 0, es.length)
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }
}
