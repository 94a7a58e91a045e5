package graft

import graft.operators.JpegCodec
import org.scalatest.funsuite.AnyFunSuite

class JpegCodecSpec extends AnyFunSuite {

  private def imageIoDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode our JPEG")
    img
  }

  /** The closed-form DC-only reconstruction the oracle relies on. */
  private def dcRecon(v: Int, q: Int): Int = {
    val a = 8 * (v - 128)
    val s = if (a >= 0) (a + q / 2) / q else -((-a + q / 2) / q)
    math.max(0, math.min(255, 128 + Math.floorDiv(s * q + 4, 8)))
  }

  test("constant-block grayscale decodes to the exact closed form") {
    val w = 24; val h = 16 // 3x2 blocks
    val blockVals = Array(0, 37, 99, 128, 200, 255)
    val gray = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      gray(y * w + x) = blockVals((y / 8) * 3 + x / 8).toByte
    val q = 85
    val bytes = JpegCodec.encodeGray(w, h, gray, q)
    val img = JpegCodec.decode(bytes)
    assert(img.width == w && img.height == h && img.channels == 1)
    val q00 = JpegCodec.scaleQuant(JpegCodec.StdLumaQuant, q)(0)
    for (y <- 0 until h; x <- 0 until w) {
      val want = dcRecon(blockVals((y / 8) * 3 + x / 8), q00)
      val got = img.pixels(y * w + x) & 0xff
      assert(got == want, s"($x,$y): got $got want $want (q00=$q00)")
    }
  }

  test("constant-block grayscale cross-validates bit-exactly against ImageIO") {
    val w = 24; val h = 16
    val blockVals = Array(5, 60, 130, 131, 250, 17)
    val gray = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      gray(y * w + x) = blockVals((y / 8) * 3 + x / 8).toByte
    val bytes = JpegCodec.encodeGray(w, h, gray, 90)
    val ours = JpegCodec.decode(bytes)
    val ref = imageIoDecode(bytes)
    for (y <- 0 until h; x <- 0 until w) {
      val want = ref.getRaster.getSample(x, y, 0)
      val got = ours.pixels(y * w + x) & 0xff
      assert(got == want, s"($x,$y): ours $got vs ImageIO $want")
    }
  }

  test("random grayscale round-trips within T.83 tolerance vs ImageIO and source") {
    val rnd = new scala.util.Random(42)
    val w = 37; val h = 29 // non-multiple-of-8 dims exercise edge replication
    val gray = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val bytes = JpegCodec.encodeGray(w, h, gray, 95)
    val ours = JpegCodec.decode(bytes)
    val ref = imageIoDecode(bytes)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((ours.pixels(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2, s"our decode vs ImageIO max diff $maxDiff")
    // smooth content at q=95 should round-trip closely to the source too
    val smooth = Array.tabulate[Byte](w * h)(i => ((i % w) * 3 % 200 + 20).toByte)
    val b2 = JpegCodec.encodeGray(w, h, smooth, 95)
    val d2 = JpegCodec.decode(b2)
    val worst = (0 until w * h).map(i =>
      math.abs((d2.pixels(i) & 0xff) - (smooth(i) & 0xff))).max
    assert(worst <= 12, s"smooth round-trip worst-pixel error $worst")
  }

  test("restart markers: decode resynchronizes and matches the no-DRI image") {
    val rnd = new scala.util.Random(7)
    val w = 48; val h = 24
    val gray = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
    val plain = JpegCodec.decode(JpegCodec.encodeGray(w, h, gray, 90))
    val withRst = JpegCodec.decode(JpegCodec.encodeGray(w, h, gray, 90,
      restartInterval = 3))
    assert(plain.pixels.sameElements(withRst.pixels),
      "restart-marker stream must decode identically")
  }

  test("constant-MCU color 4:2:0 decodes to the exact closed form and matches ImageIO") {
    val w = 32; val h = 32 // 2x2 MCUs
    val mcuRgb = Array((200, 30, 60), (10, 180, 90), (120, 120, 250), (33, 66, 99))
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = mcuRgb((y / 16) * 2 + x / 16)
      val o = (y * w + x) * 3
      rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
    }
    val q = 85
    val bytes = JpegCodec.encodeColor420(w, h, rgb, q)
    val ours = JpegCodec.decode(bytes)
    assert(ours.channels == 3)
    val qL = JpegCodec.scaleQuant(JpegCodec.StdLumaQuant, q)(0)
    val qC = JpegCodec.scaleQuant(JpegCodec.StdChromaQuant, q)(0)
    // closed form: RGB -> YCbCr (JFIF fixed point) -> DC-only quant/recon
    // per component -> YCbCr -> RGB
    for (my <- 0 until 2; mx <- 0 until 2) {
      val (r0, g0, b0) = mcuRgb(my * 2 + mx)
      val (yv, cb, cr) = JpegCodec.rgbToYcc(r0, g0, b0)
      val (rr, gg, bb) = JpegCodec.yccToRgb(
        dcRecon(yv, qL), dcRecon(cb, qC), dcRecon(cr, qC))
      val x = mx * 16 + 3; val y = my * 16 + 3 // interior pixel of the MCU
      val o = (y * w + x) * 3
      assert((ours.pixels(o) & 0xff) == rr &&
        (ours.pixels(o + 1) & 0xff) == gg && (ours.pixels(o + 2) & 0xff) == bb,
        s"MCU($mx,$my): got (${ours.pixels(o) & 0xff},${ours.pixels(o + 1) & 0xff}," +
          s"${ours.pixels(o + 2) & 0xff}) want ($rr,$gg,$bb)")
    }
    // ImageIO (libjpeg family) agrees exactly on MCU-interior pixels; at
    // MCU boundaries libjpeg's fancy chroma upsampling blends NEIGHBORING
    // MCUs' chroma while ours box-replicates — so compare away from the
    // 16-px boundaries
    val ref = imageIoDecode(bytes)
    for (y <- 0 until h; x <- 0 until w
         if x % 16 >= 2 && x % 16 <= 13 && y % 16 >= 2 && y % 16 <= 13) {
      val p = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((p >> 16) & 0xff) == (ours.pixels(o) & 0xff) &&
        ((p >> 8) & 0xff) == (ours.pixels(o + 1) & 0xff) &&
        (p & 0xff) == (ours.pixels(o + 2) & 0xff),
        s"($x,$y) vs ImageIO")
    }
    // a fully constant frame has no chroma gradients at all — ImageIO must
    // then agree on EVERY pixel
    val flat = Array.fill[Byte](w * h * 3)(0)
    for (i <- 0 until w * h) {
      flat(i * 3) = 77.toByte; flat(i * 3 + 1) = 150.toByte; flat(i * 3 + 2) = 32.toByte
    }
    val fb = JpegCodec.encodeColor420(w, h, flat, q)
    val fOurs = JpegCodec.decode(fb)
    val fRef = imageIoDecode(fb)
    for (y <- 0 until h; x <- 0 until w) {
      val p = fRef.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((p >> 16) & 0xff) == (fOurs.pixels(o) & 0xff) &&
        ((p >> 8) & 0xff) == (fOurs.pixels(o + 1) & 0xff) &&
        (p & 0xff) == (fOurs.pixels(o + 2) & 0xff),
        s"flat ($x,$y) vs ImageIO")
    }
  }

  test("color 4:2:0 with general content stays within tolerance of ImageIO") {
    val rnd = new scala.util.Random(3)
    val w = 40; val h = 24
    // smooth gradients (chroma upsampling differences show on hard edges;
    // libjpeg's fancy upsampling vs our box replication differ there by
    // design — tolerance covers it)
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (x * 5 % 256).toByte
      rgb(o + 1) = (y * 9 % 256).toByte
      rgb(o + 2) = ((x + y) * 4 % 256).toByte
    }
    val bytes = JpegCodec.encodeColor420(w, h, rgb, 90)
    val ours = JpegCodec.decode(bytes)
    val ref = imageIoDecode(bytes)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      worst = math.max(worst, math.abs(((p >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
      worst = math.max(worst, math.abs(((p >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
      worst = math.max(worst, math.abs((p & 0xff) - (ours.pixels(o + 2) & 0xff)))
    }
    assert(worst <= 16, s"color decode vs ImageIO worst channel diff $worst")
  }

  test("4:2:2 and 4:4:4 decode exactly on constant frames and match ImageIO") {
    val w = 32; val h = 16
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      rgb(i * 3) = 210.toByte; rgb(i * 3 + 1) = 45.toByte; rgb(i * 3 + 2) = 160.toByte
    }
    val q = 85
    val qL = JpegCodec.scaleQuant(JpegCodec.StdLumaQuant, q)(0)
    val qC = JpegCodec.scaleQuant(JpegCodec.StdChromaQuant, q)(0)
    val (yv, cb, cr) = JpegCodec.rgbToYcc(210, 45, 160)
    val (er, eg, eb) = JpegCodec.yccToRgb(
      dcRecon(yv, qL), dcRecon(cb, qC), dcRecon(cr, qC))
    for ((hs, vs) <- Seq((2, 1), (1, 1))) {
      val bytes = JpegCodec.encodeColor(w, h, rgb, q, hs, vs)
      val ours = JpegCodec.decode(bytes)
      assert(ours.channels == 3 && ours.width == w && ours.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert((ours.pixels(o) & 0xff) == er && (ours.pixels(o + 1) & 0xff) == eg &&
          (ours.pixels(o + 2) & 0xff) == eb, s"${hs}x$vs ($x,$y)")
      }
      val ref = imageIoDecode(bytes)
      for (y <- 0 until h; x <- 0 until w) {
        val p = ref.getRGB(x, y)
        assert(((p >> 16) & 0xff) == er && ((p >> 8) & 0xff) == eg &&
          (p & 0xff) == eb, s"${hs}x$vs ImageIO ($x,$y)")
      }
    }
  }

  test("resizeMedia halves color JPEG and BMP payloads through real codecs") {
    val spark = GraftSession.builder("4").getOrCreate()
    import spark.implicits._
    import graft.operators.{MediaCodecs, MultimodalOps}
    val w = 32; val h = 32
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = 180.toByte; rgb(o + 1) = 60.toByte; rgb(o + 2) = 110.toByte
    }
    val df = Seq(
        (1L, "s", JpegCodec.encodeColor420(w, h, rgb, 85)),
        (2L, "s", MediaCodecs.encodeBmp(MediaCodecs.BmpImage(w, h, rgb))),
        (3L, "s", Array[Byte](1, 2, 3))) // unknown format passes through
      .toDF("id", "source", "payload")
    val out = MultimodalOps.resizeMedia(df, 2).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload"), r.getBoolean(3)))
      .sortBy(_._1)
    val jp = JpegCodec.decode(out(0)._2)
    assert(out(0)._3 && jp.width == 16 && jp.height == 16 && jp.channels == 3)
    // constant frame: resize + re-encode must preserve the reconstructed color
    val first = JpegCodec.decode(JpegCodec.encodeColor420(w, h, rgb, 85))
    assert((jp.pixels(0) & 0xff) == (first.pixels(0) & 0xff))
    val bm = MediaCodecs.decodeBmp(out(1)._2)
    assert(out(1)._3 && bm.width == 16 && bm.height == 16)
    assert((bm.rgb(0) & 0xff) == 180 && (bm.rgb(1) & 0xff) == 60)
    assert(!out(2)._3 && out(2)._2.sameElements(Array[Byte](1, 2, 3)))
  }

  test("progressive and truncated inputs are rejected loudly") {
    val gray = Array.fill[Byte](64)(100.toByte)
    val ok = JpegCodec.encodeGray(8, 8, gray, 90)
    // flip SOF0 to SOF2 (progressive)
    val prog = ok.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(e1.getMessage.contains("progressive"))
    val e2 = intercept[Exception](
      JpegCodec.decode(java.util.Arrays.copyOf(ok, ok.length / 2)))
    assert(e2.getMessage != null)
  }
}
