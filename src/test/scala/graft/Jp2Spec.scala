package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.jp2._

/** JPEG 2000 codec: seeded property round-trips layer by layer (MQ coder,
  * tag trees, T1 code-blocks, 5/3 DWT, whole images incl. multi-tile and
  * signed), then cross-validation of the 9/7 lossy path against the
  * reference's own demo granules via the independently-validated GeoTIFF
  * reader (Jp2RealFileSpec).
  */
class Jp2Spec extends AnyFunSuite {

  test("mq coder round-trips random bit sequences across contexts") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val n = 1 + rnd.nextInt(4000)
      val nctx = 1 + rnd.nextInt(T1.NumCtx)
      val bits = Array.fill(n)(rnd.nextInt(2))
      val ctxs = Array.fill(n)(rnd.nextInt(nctx))
      val enc = new MqEncoder
      val encSt = T1.freshStates()
      for (i <- 0 until n) enc.encode(encSt, ctxs(i), bits(i))
      val bytes = enc.finish()
      val dec = new MqDecoder(bytes)
      val decSt = T1.freshStates()
      for (i <- 0 until n)
        assert(dec.decode(decSt, ctxs(i)) == bits(i), s"trial $trial bit $i of $n")
    }
  }

  test("tag tree round-trips random grids and thresholds") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val w = 1 + rnd.nextInt(9)
      val h = 1 + rnd.nextInt(9)
      val vals = Array.fill(h, w)(rnd.nextInt(8))
      val enc = new TagTree(w, h)
      for (y <- 0 until h; x <- 0 until w) enc.setLeaf(x, y, vals(y)(x))
      enc.build()
      val bw = new BitWriter
      // encode in two threshold waves like inclusion coding does
      val t1 = 1 + rnd.nextInt(4)
      val t2 = t1 + 1 + rnd.nextInt(4)
      for (y <- 0 until h; x <- 0 until w) enc.encode(bw, x, y, t1)
      for (y <- 0 until h; x <- 0 until w) enc.encode(bw, x, y, t2)
      val bytes = bw.align()
      val dec = new TagTree(w, h)
      val br = new BitReader(bytes, 0)
      for (y <- 0 until h; x <- 0 until w) {
        val got = dec.decode(br, x, y, t1)
        assert(got == vals(y)(x) < t1, s"trial $trial t1 leaf ($x,$y)")
        if (got) assert(dec.leafValue(x, y) == vals(y)(x))
      }
      for (y <- 0 until h; x <- 0 until w) {
        val got = dec.decode(br, x, y, t2)
        assert(got == vals(y)(x) < t2, s"trial $trial t2 leaf ($x,$y)")
        if (got) assert(dec.leafValue(x, y) == vals(y)(x))
      }
    }
  }

  test("t1 code-block round-trips random coefficients in all bands") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 60) {
      val w = 1 + rnd.nextInt(64)
      val h = 1 + rnd.nextInt(64)
      val band = rnd.nextInt(4)
      val mode = rnd.nextInt(3)
      val coef = Array.tabulate(w * h) { _ =>
        mode match {
          case 0 => rnd.nextInt(17) - 8 // small dense
          case 1 => if (rnd.nextInt(10) == 0) rnd.nextInt(4001) - 2000 else 0 // sparse large
          case _ => rnd.nextInt(2000001) - 1000000 // wide range
        }
      }
      val (numbps, npasses, bytes) = T1.encode(coef, w, h, band)
      val got = T1.decode(bytes, 0, bytes.length, w, h, band, numbps, npasses)
      assert(got.sameElements(coef), s"trial $trial ${w}x$h band $band mode $mode")
    }
  }

  test("t1 empty block encodes to zero bytes and decodes to zeros") {
    val (numbps, npasses, bytes) = T1.encode(new Array[Int](35), 7, 5, 2)
    assert(numbps == 0 && npasses == 0 && bytes.isEmpty)
    val got = T1.decode(Array.emptyByteArray, 0, 0, 7, 5, 2, 0, 0)
    assert(got.forall(_ == 0))
  }

  test("5/3 dwt level is exactly invertible on odd/even rects and offsets") {
    val rnd = new scala.util.Random(3)
    for (trial <- 0 until 50) {
      val x0 = rnd.nextInt(5); val y0 = rnd.nextInt(5)
      val x1 = x0 + 1 + rnd.nextInt(40)
      val y1 = y0 + 1 + rnd.nextInt(40)
      val a = Array.fill((x1 - x0) * (y1 - y0))(rnd.nextInt(4001) - 2000)
      val orig = a.clone()
      Dwt.fwd53Level(a, x0, y0, x1, y1)
      Dwt.inv53Level(a, x0, y0, x1, y1)
      assert(a.sameElements(orig), s"trial $trial rect ($x0,$y0,$x1,$y1)")
    }
  }

  private def roundTrip(w: Int, h: Int, depth: Int, signed: Boolean,
                        nc: Int, nLevels: Int, tileW: Int, tileH: Int,
                        seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val lo = if (signed) -(1 << (depth - 1)) else 0
    val hi = if (signed) (1 << (depth - 1)) - 1 else (1 << depth) - 1
    val planes = Vector.fill(nc)(Array.fill(w * h)(lo + rnd.nextInt(hi - lo + 1)))
    val bytes = Jp2Source.encode(w, h, depth, signed, planes, nLevels, tileW, tileH)
    val img = Jp2Source.decode(bytes)
    assert(img.width == w && img.height == h && img.comps.length == nc)
    for (c <- 0 until nc)
      assert(img.comps(c).sameElements(planes(c)),
        s"comp $c of ${w}x$h depth=$depth signed=$signed tiles=${tileW}x$tileH")
  }

  test("lossless image round-trip: single tile, 8-bit unsigned") {
    roundTrip(130, 77, 8, signed = false, nc = 1, nLevels = 3, 0, 0, seed = 21)
  }

  test("lossless image round-trip: odd dims, 1 level") {
    roundTrip(63, 1, 8, signed = false, nc = 1, nLevels = 1, 0, 0, seed = 22)
    roundTrip(1, 63, 8, signed = false, nc = 1, nLevels = 1, 0, 0, seed = 23)
    roundTrip(65, 33, 8, signed = false, nc = 1, nLevels = 2, 0, 0, seed = 24)
  }

  test("lossless image round-trip: signed 12-bit, multi component") {
    roundTrip(90, 61, 12, signed = true, nc = 3, nLevels = 3, 0, 0, seed = 25)
  }

  test("lossless image round-trip: multi-tile incl. partial edge tiles") {
    roundTrip(200, 130, 8, signed = false, nc = 1, nLevels = 3, 96, 64, seed = 26)
    roundTrip(128, 128, 10, signed = false, nc = 2, nLevels = 2, 64, 64, seed = 27)
  }

  test("lossless image round-trip: 20-bit counts (fixture shape)") {
    roundTrip(360, 100, 20, signed = false, nc = 1, nLevels = 3, 90, 50, seed = 28)
  }

  test("lossless RGB round-trip through the reversible color transform") {
    val w = 120; val h = 81
    val rnd = new scala.util.Random(41)
    // correlated channels (image-like): base luminance + small chroma offsets
    val base = Array.fill(w * h)(rnd.nextInt(200) + 20)
    val r = base.map(v => math.min(255, v + rnd.nextInt(8)))
    val g = base.map(v => math.max(0, v - rnd.nextInt(8)))
    val b = base.clone()
    val planes = Vector(r, g, b)
    val rct = Jp2Source.encode(w, h, 8, signed = false, planes, 3, 0, 0, mct = true)
    val noRct = Jp2Source.encode(w, h, 8, signed = false, planes, 3, 0, 0)
    val img = Jp2Source.decode(rct)
    for (c <- 0 until 3)
      assert(img.comps(c).sameElements(planes(c)), s"RCT comp $c")
    assert(rct.length < noRct.length,
      s"RCT ${rct.length}B should beat independent planes ${noRct.length}B on correlated data")
    // extreme values stress the chroma range (±2^depth after differencing)
    val hard = Vector(Array.fill(w * h)(255), Array.fill(w * h)(0),
      Array.tabulate(w * h)(i => if (i % 2 == 0) 255 else 0))
    val hardBytes = Jp2Source.encode(w, h, 8, signed = false, hard, 2, 0, 0, mct = true)
    val hardImg = Jp2Source.decode(hardBytes)
    for (c <- 0 until 3) assert(hardImg.comps(c).sameElements(hard(c)), s"hard comp $c")
  }

  test("distributed writeRaster emits byte-identical output to the local encoder") {
    // tile encode is pure per-tile: the executor-side path must produce the
    // same codestream as the driver-side path, so the files are comparable
    // byte-for-byte — any geometry/parity drift between the two would show
    val spark = GraftSession.get()
    val w = 300; val h = 170; val depth = 12
    val rnd = new scala.util.Random(31)
    val plane = Array.fill(w * h)(rnd.nextInt(1 << depth))
    val rows = for (j <- 0 until h; i <- 0 until w if plane(j * w + i) != 0)
      yield (j + 0.5, i + 0.5, plane(j * w + i))
    import spark.implicits._
    val df = rows.toDF("y", "x", "v")
    val path = "/tmp/jp2_dist_test/grid.jp2"
    Jp2Source.writeRaster(df, path, w, h, depth, nLevels = 3, tileW = 128, tileH = 128)
    val distBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val localBytes = Jp2Source.encode(w, h, depth, signed = false, Vector(plane),
      nLevels = 3, tileW = 128, tileH = 128)
    assert(java.util.Arrays.equals(distBytes, localBytes),
      s"distributed ${distBytes.length}B vs local ${localBytes.length}B")
    val img = Jp2Source.decode(distBytes)
    assert(img.comps(0).sameElements(plane))
  }

  test("real granule: reference demo .jp2 decodes and matches its GeoTIFF twin") {
    // sample.jp2: 1491×1387 RGB, 9/7 irreversible, ICT, 4 tiles, explicit
    // precincts, rate-truncated final cleanup passes — every lossy-path
    // feature at once. The GeoTIFF twin was produced by GDAL/openjpeg from
    // the same image, so agreement within quantizer rounding across 6.2M
    // samples cross-validates MQ/T1/packets/9/7-DWT/dequant/ICT against an
    // independent implementation (the GeoTIFF reader has its own tests).
    val dir = "/root/reference/examples/serve/demo"
    val jp2Path = java.nio.file.Paths.get(s"$dir/sample.jp2")
    assume(java.nio.file.Files.exists(jp2Path), "reference demo granule absent")
    val img = Jp2Source.decode(java.nio.file.Files.readAllBytes(jp2Path))
    assert(img.width == 1491 && img.height == 1387 && img.comps.length == 3)
    val tif = graft.sources.GeoTiffSource.parseAll(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/sample-geotiff.tif"))).head
    assert(tif.width == img.width && tif.height == img.height)
    for (c <- 0 until 3) {
      val a = img.comps(c); val b = tif.bands(c)
      var within1 = 0L; var maxAbs = 0
      var i = 0
      while (i < a.length) {
        val d = math.abs(a(i) - b(i).toInt)
        if (d <= 1) within1 += 1
        if (d > maxAbs) maxAbs = d
        i += 1
      }
      val frac = within1.toDouble / a.length
      assert(frac > 0.99, s"band $c: only ${frac * 100}%% within 1 LSB")
      assert(maxAbs <= 3, s"band $c: max abs diff $maxAbs")
    }
  }

  test("packbits decode handles literals, runs and the -128 no-op") {
    import graft.sources.GeoTiffSource.packBitsDecode
    // literal(3) | run(4 of 0x55) | noop | literal(1)
    val in = Array[Byte](2, 1, 2, 3, -3, 0x55, -128, 0, 9)
    val out = packBitsDecode(in, 8)
    assert(out.sameElements(Array[Byte](1, 2, 3, 0x55, 0x55, 0x55, 0x55, 9)))
    intercept[IllegalArgumentException] { packBitsDecode(Array[Byte](0, 1), 5) }
  }

  test("smooth gradient data compresses below raw size") {
    val w = 256; val h = 256
    val plane = Array.tabulate(w * h)(i => ((i % w) + (i / w)) / 4)
    val bytes = Jp2Source.encode(w, h, 8, signed = false, Vector(plane), 3, 0, 0)
    assert(bytes.length < w * h / 2, s"jp2 size ${bytes.length} not < ${w * h / 2}")
    val img = Jp2Source.decode(bytes)
    assert(img.comps(0).sameElements(plane))
  }
}
