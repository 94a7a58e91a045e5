package graft.operators

import scala.collection.mutable

/** Pure-JVM GIF (87a/89a) codec — palette images with LZW-compressed
  * index streams (the GIF flavor of the variable-code-width LZW in the
  * public spec, CompuServe GIF89a + RFC-adjacent documentation): logical
  * screen + global/local color tables, interlaced and sequential row
  * order, extension blocks skipped. Completes the REAL multimodal decode
  * set (BMP/WAV/PNG/JPEG) with the classic palettized web format.
  *
  * The decoder is externally cross-validated in tests against the JDK's
  * ImageIO GIF implementation in BOTH directions (our decode of an
  * ImageIO-written GIF, ImageIO's decode of ours).
  *
  * Scale note: like the other codecs this is per-row partition-local CPU
  * work — no shuffle, no driver involvement; a corpus of GIFs decodes one
  * payload at a time inside the scan.
  */
object GifCodec {

  import MediaCodecs.BmpImage

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length > 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  // ------------------------------------------------------------- decode

  /** Decode the FIRST image of a GIF into top-down RGB. Transparency is
    * ignored (the palette color is emitted — the feature-extraction
    * semantics for opaque corpora); animation frames beyond the first are
    * not walked.
    */
  def decodeGif(bytes: Array[Byte]): BmpImage = {
    require(isGif(bytes), "not a GIF (missing GIF87a/GIF89a magic)")
    var p = 6
    def u16(q: Int): Int = (bytes(q) & 0xff) | ((bytes(q + 1) & 0xff) << 8)
    val sw = u16(p); val sh = u16(p + 2)
    val packed = bytes(p + 4) & 0xff
    p += 7
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 0x07) else 0
    val gct = if (gctSize > 0) {
      val t = java.util.Arrays.copyOfRange(bytes, p, p + gctSize * 3)
      p += gctSize * 3
      t
    } else Array.emptyByteArray

    while (true) {
      (bytes(p) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while ({
            require(p < bytes.length,
              "truncated GIF: extension sub-blocks run past end of file")
            (bytes(p) & 0xff) != 0
          }) p += 1 + (bytes(p) & 0xff)
          p += 1
        case 0x3b =>
          throw new IllegalArgumentException("GIF trailer before any image")
        case 0x2c =>
          val left = u16(p + 1); val top = u16(p + 3)
          val iw = u16(p + 5); val ih = u16(p + 7)
          val ipacked = bytes(p + 9) & 0xff
          p += 10
          val interlaced = (ipacked & 0x40) != 0
          val lctSize = if ((ipacked & 0x80) != 0) 2 << (ipacked & 0x07) else 0
          val pal = if (lctSize > 0) {
            val t = java.util.Arrays.copyOfRange(bytes, p, p + lctSize * 3)
            p += lctSize * 3
            t
          } else gct
          require(pal.nonEmpty, "GIF image with no color table")
          val minCode = bytes(p) & 0xff
          p += 1
          // concatenate the data sub-blocks (copyOfRange would PAD a
          // truncated final block with zeros — reject instead)
          val data = new mutable.ArrayBuilder.ofByte
          while ({
            require(p < bytes.length,
              "truncated GIF: image data sub-blocks run past end of file")
            (bytes(p) & 0xff) != 0
          }) {
            val n = bytes(p) & 0xff
            require(p + 1 + n <= bytes.length,
              s"truncated GIF: data sub-block of $n bytes at offset $p " +
                s"extends past end of file (${bytes.length} bytes)")
            data ++= java.util.Arrays.copyOfRange(bytes, p + 1, p + 1 + n)
            p += 1 + n
          }
          val indices = lzwDecode(data.result(), minCode, iw * ih)
          // row order: interlace passes 0/8, 4/8, 2/4, 1/2
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val order = new Array[Int](ih)
              var k = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until ih by step) { order(k) = y; k += 1 }
              order
            }
          // composite onto the logical screen (left/top offsets honored;
          // uncovered screen area is palette entry 0)
          val rgb = new Array[Byte](sw * sh * 3)
          if (pal.length >= 3) {
            var i = 0
            while (i < sw * sh) {
              rgb(i * 3) = pal(0); rgb(i * 3 + 1) = pal(1); rgb(i * 3 + 2) = pal(2)
              i += 1
            }
          }
          var k = 0
          while (k < ih) {
            val y = top + rowOf(k)
            var x = 0
            while (x < iw) {
              val idx = (indices(k * iw + x) & 0xff) * 3
              val o = (y * sw + left + x) * 3
              if (y < sh && left + x < sw && idx + 2 < pal.length) {
                rgb(o) = pal(idx); rgb(o + 1) = pal(idx + 1); rgb(o + 2) = pal(idx + 2)
              }
              x += 1
            }
            k += 1
          }
          return BmpImage(sw, sh, rgb)
        case other =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Variable-code-width GIF-LZW decode of `data` into `n` palette
    * indices — the classic formulation (giflib's running-code width bump:
    * the width change takes effect one code AFTER the dictionary fills
    * the current width, matching every spec-conforming encoder). */
  private def lzwDecode(data: Array[Byte], minCode: Int, n: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new Array[Byte](n)
    var outLen = 0
    // dictionary as (prefix code, appended byte); first `clear` entries
    // are the roots
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictSize = end + 1
    var codeWidth = minCode + 1
    var running = end + 1     // codes read since the last clear (giflib)
    var maxCode1 = 1 << codeWidth
    var prev = -1
    var acc = 0L; var accBits = 0; var dp = 0
    val stack = new Array[Byte](4096)
    def emit(code0: Int): Unit = {
      var sp = 0
      var c = code0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c.toByte; sp += 1
      while (sp > 0 && outLen < n) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
    }
    def firstByte(code0: Int): Byte = {
      var c = code0
      while (c >= clear) c = prefix(c)
      c.toByte
    }
    while (outLen < n && (dp < data.length || accBits >= codeWidth)) {
      while (accBits < codeWidth && dp < data.length) {
        acc |= (data(dp) & 0xffL) << accBits
        accBits += 8; dp += 1
      }
      if (accBits < codeWidth) return out // truncated stream: fill stops
      val code = (acc & ((1L << codeWidth) - 1)).toInt
      acc >>>= codeWidth; accBits -= codeWidth
      running += 1
      if (running > maxCode1 && codeWidth < 12) { maxCode1 <<= 1; codeWidth += 1 }
      if (code == clear) {
        dictSize = end + 1; codeWidth = minCode + 1
        running = end + 1; maxCode1 = 1 << codeWidth
        prev = -1
      } else if (code == end) {
        return out
      } else {
        if (prev < 0) emit(code)
        else if (code < dictSize) {
          emit(code)
          if (dictSize < 4096) {
            prefix(dictSize) = prev; suffix(dictSize) = firstByte(code)
            dictSize += 1
          }
        } else {
          // KwKwK: the ONLY code a conforming encoder can emit beyond the
          // current dictionary is exactly dictSize (the entry being
          // defined by this very code). Anything else — code > dictSize,
          // or any beyond-dict code while the dictionary is full — cannot
          // come from a valid encoder; emitting dictSize-1 for it would
          // produce silently wrong pixels.
          require(code == dictSize && dictSize < 4096,
            s"GIF LZW: code $code beyond dictionary size $dictSize " +
              "(corrupt stream)")
          prefix(dictSize) = prev; suffix(dictSize) = firstByte(prev)
          dictSize += 1
          emit(dictSize - 1)
        }
        prev = code
      }
    }
    out
  }

  // ------------------------------------------------------------- encode

  /** Encode top-down RGB as a non-interlaced GIF89a with one global color
    * table — the image must use ≤ 256 distinct colors (palettized by
    * first appearance).
    */
  def encodeGif(img: BmpImage): Array[Byte] = {
    val n = img.width * img.height
    val palIndex = mutable.LinkedHashMap.empty[Int, Int]
    val indices = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val c = ((img.rgb(i * 3) & 0xff) << 16) |
        ((img.rgb(i * 3 + 1) & 0xff) << 8) | (img.rgb(i * 3 + 2) & 0xff)
      val idx = palIndex.getOrElseUpdate(c,
        { require(palIndex.size < 256, "encodeGif: > 256 distinct colors")
          palIndex.size })
      indices(i) = idx.toByte
      i += 1
    }
    // palette size: power of two >= max(2, colors)
    var palBits = 1
    while ((1 << palBits) < palIndex.size) palBits += 1
    val palSize = 1 << palBits
    val minCode = math.max(2, palBits)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(img.width); u16(img.height)
    out.write(0x80 | ((palBits - 1) & 0x07)) // GCT present, size bits
    out.write(0); out.write(0)
    val colors = palIndex.keys.toArray
    i = 0
    while (i < palSize) {
      val c = if (i < colors.length) colors(i) else 0
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
      i += 1
    }
    out.write(0x2c) // image descriptor, full screen, no LCT, sequential
    u16(0); u16(0); u16(img.width); u16(img.height); out.write(0)
    out.write(minCode)
    val lzw = lzwEncode(indices, minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len); off += len
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Variable-code-width GIF-LZW encode — the canonical GIFCOMPR shape:
    * the width check runs AFTER each code is written (`free_ent >
    * maxcode` → widen), so the change takes effect from the next code,
    * exactly when the classic decoder widens its read. Emits CLEAR first,
    * clears when the dictionary fills, ends with END. */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L; var accBits = 0
    var codeWidth = minCode + 1
    var maxcode = (1 << codeWidth) - 1
    // dictionary: (prefix code << 8 | byte) -> code
    var dict = mutable.HashMap.empty[Long, Int]
    var freeEnt = end + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += codeWidth
      while (accBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
      if (freeEnt > maxcode && codeWidth < 12) {
        codeWidth += 1; maxcode = (1 << codeWidth) - 1
      }
    }
    put(clear)
    var prev = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val b = indices(i) & 0xff
      val key = (prev.toLong << 8) | b
      dict.get(key) match {
        case Some(code) => prev = code
        case None =>
          put(prev)
          if (freeEnt < 4096) {
            dict(key) = freeEnt
            freeEnt += 1
          } else {
            put(clear)
            dict = mutable.HashMap.empty
            freeEnt = end + 1
            codeWidth = minCode + 1
            maxcode = (1 << codeWidth) - 1
          }
          prev = b
      }
      i += 1
    }
    put(prev)
    put(end)
    if (accBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }
}
