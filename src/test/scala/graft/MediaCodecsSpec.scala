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
