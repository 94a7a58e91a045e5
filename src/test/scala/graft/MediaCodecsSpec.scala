package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaCodecs
import graft.operators.MediaCodecs.{BmpImage, WavAudio}
import java.nio.{ByteBuffer, ByteOrder}

class MediaCodecsSpec extends AnyFunSuite {

  test("BMP round-trips every row-padding case and random content (seeded)") {
    val rnd = new scala.util.Random(11)
    // widths 1..8 cover all four stride paddings twice; heights incl. 1
    for (w <- 1 to 8; h <- Seq(1, 2, 5)) {
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val img = BmpImage(w, h, rgb)
      val bytes = MediaCodecs.encodeBmp(img)
      // container invariants
      assert(bytes(0) == 'B' && bytes(1) == 'M')
      val stride = (w * 3 + 3) & ~3
      assert(bytes.length == 54 + stride * h)
      val back = MediaCodecs.decodeBmp(bytes)
      assert(back.width == w && back.height == h)
      assert(back.rgb.sameElements(rgb), s"w=$w h=$h")
    }
  }

  test("BMP decode honors bottom-up storage (top row stored last)") {
    // 1x2 image: logical top pixel red, bottom pixel blue
    val img = BmpImage(1, 2, Array[Byte](
      255.toByte, 0, 0, // row 0 (top) = red
      0, 0, 255.toByte)) // row 1 (bottom) = blue
    val bytes = MediaCodecs.encodeBmp(img)
    // bottom-up: the FIRST stored row must be the bottom (blue), BGR order
    assert((bytes(54) & 0xff) == 255 && (bytes(56) & 0xff) == 0,
      "first stored row should be blue in BGR")
    val back = MediaCodecs.decodeBmp(bytes)
    assert(back.rgb.sameElements(img.rgb))
  }

  test("BMP decode supports top-down files (negative height)") {
    val img = BmpImage(2, 2, Array.tabulate(12)(i => (i * 10).toByte))
    val bytes = MediaCodecs.encodeBmp(img)
    // flip to top-down: negate height and reverse the stored row order
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(22, -2)
    val stride = (2 * 3 + 3) & ~3
    val r0 = bytes.slice(54, 54 + stride)
    val r1 = bytes.slice(54 + stride, 54 + 2 * stride)
    System.arraycopy(r1, 0, bytes, 54, stride)
    System.arraycopy(r0, 0, bytes, 54 + stride, stride)
    assert(MediaCodecs.decodeBmp(bytes).rgb.sameElements(img.rgb))
  }

  test("BMP rejects other depths/compressions/magic loudly") {
    val bytes = MediaCodecs.encodeBmp(BmpImage(2, 2, new Array[Byte](12)))
    val b8 = bytes.clone(); ByteBuffer.wrap(b8).order(ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(b8)).getMessage.contains("depth"))
    val bc = bytes.clone(); ByteBuffer.wrap(bc).order(ByteOrder.LITTLE_ENDIAN).putInt(30, 1)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(bc)).getMessage.contains("compression"))
    intercept[IllegalArgumentException](MediaCodecs.decodeBmp("nope".getBytes))
  }

  test("WAV round-trips 16-bit PCM incl. negative samples and stereo") {
    val rnd = new scala.util.Random(12)
    for (ch <- Seq(1, 2); n <- Seq(0, 1, 7, 1000)) {
      val samples = Array.fill(n * ch)((rnd.nextInt(65536) - 32768).toShort)
      val w = WavAudio(44100, ch, samples)
      val bytes = MediaCodecs.encodeWav(w)
      assert(bytes.length == 44 + samples.length * 2)
      val back = MediaCodecs.decodeWav(bytes)
      assert(back.sampleRate == 44100 && back.channels == ch)
      assert(back.samples.sameElements(samples))
    }
  }

  test("WAV chunk walk skips odd-sized chunks before data, rejects non-PCM") {
    val w = WavAudio(8000, 1, Array[Short](100, -200, 300))
    val canonical = MediaCodecs.encodeWav(w)
    // splice a 3-byte 'junk' chunk between fmt and data (word-aligned skip)
    val fmtEnd = 12 + 8 + 16
    val junk = ByteBuffer.allocate(8 + 4).order(ByteOrder.LITTLE_ENDIAN)
    junk.put("junk".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
    val spliced = canonical.take(fmtEnd) ++ junk.array() ++ canonical.drop(fmtEnd)
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val back = MediaCodecs.decodeWav(spliced)
    assert(back.samples.sameElements(w.samples))
    // float (format 3) is rejected
    val bad = canonical.clone()
    ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN).putShort(20, 3)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeWav(bad)).getMessage.contains("PCM"))
  }

  // PNG inputs come from the JDK's ImageIO WRITER — an independent encoder
  // implementation — so these round-trips validate the parser against a
  // third party, not against our own bytes.
  private def imageioPng(w: Int, h: Int, argb: Array[Int],
                         typ: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, typ)
    img.setRGB(0, 0, w, h, argb, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("GIF round-trips through our codec and cross-validates with ImageIO both ways") {
    import graft.operators.GifCodec
    import java.awt.image.{BufferedImage, IndexColorModel}
    val rnd = new scala.util.Random(41)
    // palette sizes straddle the code-width boundaries (2, 4, 16, 200)
    for (nCol <- Seq(2, 4, 16, 200); (w, h) <- Seq((7, 5), (16, 16), (33, 9))) {
      val pal = Array.fill(nCol)(rnd.nextInt(1 << 24))
      val rgb = new Array[Byte](w * h * 3)
      val idx = Array.fill(w * h)(rnd.nextInt(nCol))
      for (i <- 0 until w * h) {
        val c = pal(idx(i))
        rgb(i * 3) = ((c >> 16) & 0xff).toByte
        rgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
        rgb(i * 3 + 2) = (c & 0xff).toByte
      }
      // our encode → our decode
      val ours = GifCodec.encodeGif(BmpImage(w, h, rgb))
      assert(GifCodec.isGif(ours))
      val back = GifCodec.decodeGif(ours)
      assert(back.width == w && back.height == h && back.rgb.sameElements(rgb),
        s"self roundtrip nCol=$nCol ${w}x$h")
      // our encode → ImageIO decode (independent implementation)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val want = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
        assert((img.getRGB(x, y) & 0xffffff) == want, s"ImageIO read ($x,$y)")
      }
      // ImageIO encode (indexed) → our decode
      val r = new Array[Byte](256); val g = new Array[Byte](256); val b = new Array[Byte](256)
      for (i <- 0 until nCol) {
        r(i) = ((pal(i) >> 16) & 0xff).toByte
        g(i) = ((pal(i) >> 8) & 0xff).toByte
        b(i) = (pal(i) & 0xff).toByte
      }
      val icm = new IndexColorModel(8, 256, r, g, b)
      val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until h; x <- 0 until w) {
        val c = pal(idx(y * w + x))
        bi.setRGB(x, y, 0xff000000 | c)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "gif", bos))
      val theirs = GifCodec.decodeGif(bos.toByteArray)
      assert(theirs.width == w && theirs.height == h)
      assert(theirs.rgb.sameElements(rgb), s"our decode of ImageIO GIF nCol=$nCol")
    }
  }

  test("GIF: dictionary overflow (clear mid-stream) and interlace decode") {
    import graft.operators.GifCodec
    val rnd = new scala.util.Random(43)
    // 200x200 random 8-color noise blows past 4096 dict entries → the
    // encoder emits CLEAR mid-stream; ImageIO must still read it exactly
    val w = 200; val h = 200
    val pal = Array.tabulate(8)(i => (i * 37 << 16) | (i * 11 << 8) | (255 - i * 29))
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      val c = pal(rnd.nextInt(8))
      rgb(i * 3) = ((c >> 16) & 0xff).toByte
      rgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
      rgb(i * 3 + 2) = (c & 0xff).toByte
    }
    val ours = GifCodec.encodeGif(BmpImage(w, h, rgb))
    assert(GifCodec.decodeGif(ours).rgb.sameElements(rgb))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    for (y <- 0 until h by 17; x <- 0 until w by 13) {
      val o = (y * w + x) * 3
      val want = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
      assert((img.getRGB(x, y) & 0xffffff) == want)
    }
    // interlace: take our sequential GIF for a 10-row image, reorder the
    // index rows into the 4-pass interlace order and set the flag — the
    // decoder must undo it (spec ordering: 0,8 / 4 / 2,6 / odd rows)
    val iw = 6; val ih = 10
    val seqIdx = Array.tabulate(iw * ih)(i => (i / iw) % 4) // row-colored
    val pal4 = Array(0xff0000, 0x00ff00, 0x0000ff, 0x808080)
    val srgb = new Array[Byte](iw * ih * 3)
    for (i <- 0 until iw * ih) {
      val c = pal4(seqIdx(i))
      srgb(i * 3) = ((c >> 16) & 0xff).toByte
      srgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
      srgb(i * 3 + 2) = (c & 0xff).toByte
    }
    val order = Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9) // interlace storage order
    val perm = new Array[Byte](iw * ih * 3)
    for ((srcRow, k) <- order.zipWithIndex)
      System.arraycopy(srgb, srcRow * iw * 3, perm, k * iw * 3, iw * 3)
    val permuted = GifCodec.encodeGif(BmpImage(iw, ih, perm))
    // set the interlace bit in the image descriptor's packed byte:
    // 6(header) + 7(LSD) + 12(GCT: 4 colors × 3) + 9 = packed byte index
    val packedAt = 6 + 7 + 12 + 9
    permuted(packedAt) = (permuted(packedAt) | 0x40).toByte
    val dec = GifCodec.decodeGif(permuted)
    assert(dec.rgb.sameElements(srgb), "interlaced rows must be reordered back")
  }

  test("GIF: corrupt streams reject loudly (truncation, beyond-dict code)") {
    import graft.operators.GifCodec
    // truncation: cut a valid GIF mid-data — the sub-block walker must
    // name the malformation, not AIOOBE or zero-pad
    val rgb = new Array[Byte](8 * 8 * 3)
    for (i <- 0 until 64) rgb(i * 3) = ((i % 4) * 60).toByte
    val ours = GifCodec.encodeGif(BmpImage(8, 8, rgb))
    val cut = java.util.Arrays.copyOf(ours, ours.length - 8)
    val e1 = intercept[IllegalArgumentException](GifCodec.decodeGif(cut))
    assert(e1.getMessage.contains("truncated GIF"), e1.getMessage)
    // beyond-dict LZW code: hand-built 4-color GIF whose code stream is
    // [clear=4, 0, 7] — after one root code the dictionary holds 6
    // entries, so 7 is not the KwKwK case (6) and cannot be valid
    val bad = {
      val b = new java.io.ByteArrayOutputStream()
      b.write("GIF89a".getBytes("US-ASCII"))
      b.write(Array[Byte](2, 0, 2, 0, 0x81.toByte, 0, 0)) // LSD: 2x2, GCT 4
      b.write(new Array[Byte](12)) // 4-color GCT
      b.write(0x2c); b.write(Array[Byte](0, 0, 0, 0, 2, 0, 2, 0, 0))
      b.write(2) // LZW min code size
      // 3-bit codes 4,0,7 packed LSB-first: 0xC4, 0x01
      b.write(2); b.write(0xc4); b.write(0x01)
      b.write(0) // sub-block terminator
      b.write(0x3b)
      b.toByteArray
    }
    val e2 = intercept[IllegalArgumentException](GifCodec.decodeGif(bad))
    assert(e2.getMessage.contains("beyond dictionary"), e2.getMessage)
  }

  test("PNG decode matches ImageIO-encoded RGBA/RGB/gray pixels exactly (seeded)") {
    val rnd = new scala.util.Random(31)
    (1 to 15).foreach { t =>
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(40)
      val argb = Array.fill(w * h)(rnd.nextInt())
      if (t % 3 == 0) { // RGBA
        val png = imageioPng(w, h, argb, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val img = MediaCodecs.decodePng(png)
        assert(img.width == w && img.height == h && img.channels == 4, s"case $t")
        argb.zipWithIndex.foreach { case (px, i) =>
          assert((img.pixels(i * 4) & 0xff) == ((px >> 16) & 0xff), s"$t R@$i")
          assert((img.pixels(i * 4 + 1) & 0xff) == ((px >> 8) & 0xff), s"$t G@$i")
          assert((img.pixels(i * 4 + 2) & 0xff) == (px & 0xff), s"$t B@$i")
          assert((img.pixels(i * 4 + 3) & 0xff) == ((px >>> 24) & 0xff), s"$t A@$i")
        }
      } else if (t % 3 == 1) { // RGB
        val png = imageioPng(w, h, argb, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val img = MediaCodecs.decodePng(png)
        assert(img.channels == 3, s"case $t")
        argb.zipWithIndex.foreach { case (px, i) =>
          assert((img.pixels(i * 3) & 0xff) == ((px >> 16) & 0xff), s"$t R@$i")
          assert((img.pixels(i * 3 + 2) & 0xff) == (px & 0xff), s"$t B@$i")
        }
      } else { // grayscale
        val png = imageioPng(w, h, argb, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val img = MediaCodecs.decodePng(png)
        assert(img.channels == 1, s"case $t")
        // compare against what ImageIO itself reads back (gray conversion
        // is the writer's business; the parser must agree byte-for-byte)
        val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          .getRaster
        (0 until h).foreach { y =>
          (0 until w).foreach { x =>
            assert((img.pixels(y * w + x) & 0xff) == ref.getSample(x, y, 0),
              s"$t gray@($x,$y)")
          }
        }
      }
    }
  }

  test("PNG decode: tile-renderer output round-trips; bad inputs rejected loudly") {
    // the serving path's own PNG (TileOps.renderPng) is readable back
    val tile = Array.tabulate(6 * 4)(i => i.toDouble)
    val png = graft.operators.TileOps.renderPng(tile, 6, 4, 0.0, 23.0)
    val img = MediaCodecs.decodePng(png)
    assert(img.width == 6 && img.height == 4 && img.channels == 4)
    // corrupted CRC is caught
    val broken = png.clone()
    broken(30) = (broken(30) ^ 0x55).toByte
    assert(intercept[IllegalArgumentException](MediaCodecs.decodePng(broken))
      .getMessage.toLowerCase.contains("crc"))
    intercept[IllegalArgumentException](MediaCodecs.decodePng("nope".getBytes))
  }
}
