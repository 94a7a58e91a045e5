package graft.sources.jp2

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** JPEG 2000 (.jp2) raster source — the last reference-supported raster
  * format (xcube opens .jp2 via rasterio→GDAL→openjpeg,
  * `xcube/core/store/fs/impl/rasterio.py:81-330`). Pure-JVM from the public
  * ITU-T T.800 spec: JP2 container boxes + full Part-1 baseline decode
  * (MQ/EBCOT Tier-1, tag-tree packet headers, 5/3 reversible and 9/7
  * irreversible DWT, scalar quantization, RCT/ICT), plus a lossless
  * (reversible 5/3) writer used for fixtures and round-trip property tests.
  *
  * Scale design: tiles are the parallel unit, exactly like the COG reader —
  * the driver parses only the main header + SOT index (bounded read), then
  * each Spark task decodes its own tile from the tile-part byte range, so a
  * 100k-granule collection fans out one task per tile with no driver-side
  * pixel work.
  */
object Jp2Source {
  import Jp2Codestream._

  final case class Jp2Image(width: Int, height: Int, depth: Int,
                            signed: Boolean, comps: Vector[Array[Int]])

  // ----------------------------------------------------------------- read

  /** Extract the raw codestream from a .jp2 container (or pass through a
    * raw .j2k codestream that starts with SOC).
    */
  def codestreamOf(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0x4f)
      return bytes // raw codestream
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var o = 0L
    while (o < bytes.length - 8) {
      var len: Long = b.getInt(o.toInt).toLong & 0xffffffffL
      val typ = new String(bytes, o.toInt + 4, 4, "ISO-8859-1")
      var hdr = 8
      if (len == 1) { len = b.getLong(o.toInt + 8); hdr = 16 }
      else if (len == 0) len = bytes.length - o
      if (typ == "jp2c")
        return java.util.Arrays.copyOfRange(bytes, o.toInt + hdr, (o + len).toInt)
      o += len
    }
    throw new IllegalArgumentException("jp2: no jp2c codestream box")
  }

  /** Byte offset and length of the codestream WITHIN the container file —
    * 0/whole for a raw codestream, the `jp2c` box payload otherwise.
    * Consumed by the kerchunk scanner, whose refs address the original
    * file by absolute offset.
    */
  def codestreamSpan(head: Array[Byte], fileSize: Long): (Long, Long) = {
    if (head.length >= 2 && (head(0) & 0xff) == 0xff && (head(1) & 0xff) == 0x4f)
      return (0L, fileSize)
    val b = ByteBuffer.wrap(head).order(ByteOrder.BIG_ENDIAN)
    var o = 0L
    while (o < head.length - 8) {
      var len: Long = b.getInt(o.toInt).toLong & 0xffffffffL
      val typ = new String(head, o.toInt + 4, 4, "ISO-8859-1")
      var hdr = 8
      if (len == 1) { len = b.getLong(o.toInt + 8); hdr = 16 }
      else if (len == 0) len = fileSize - o
      if (typ == "jp2c") return (o + hdr, len - hdr)
      o += len
    }
    throw new IllegalArgumentException(
      "jp2: no jp2c codestream box within the header prefix")
  }

  /** Decode ONE tile-part against a detached main header — the kerchunk
    * chunk codec: `header ++ tilePart ++ EOC` is a complete one-tile
    * codestream, so the standard parser/decoder run unchanged. The decoded
    * samples are padded to the FULL (yt × xt) chunk shape (zarr edge
    * chunks are stored full-size) and serialized big-endian int32 —
    * matching the scanner's `>i4` dtype declaration.
    */
  def decodeTilePartToI4(header: Array[Byte], tilePart: Array[Byte]): Array[Byte] = {
    val cs = header ++ tilePart ++ Array(0xff.toByte, 0xd9.toByte)
    val cd = parse(cs)
    require(cd.siz.comps.length == 1,
      s"kerchunk jp2 tile: ${cd.siz.comps.length} components (single only)")
    require(cd.tiles.length == 1,
      s"kerchunk jp2 tile: ${cd.tiles.length} tile-parts in one chunk ref")
    val tile = cd.tiles.head
    val samples = decodeTileSamples(cs, cd, tile).head
    val (tx0, ty0, tx1, ty1) = Jp2Codestream.tileRect(cd.siz, tile.index)
    val (tw, th) = (tx1 - tx0, ty1 - ty0)
    val (xt, yt) = (cd.siz.xt, cd.siz.yt)
    val out = ByteBuffer.allocate(yt * xt * 4).order(ByteOrder.BIG_ENDIAN)
    var j = 0
    while (j < yt) {
      var i = 0
      while (i < xt) {
        out.putInt(if (j < th && i < tw) samples(j * tw + i) else 0)
        i += 1
      }
      j += 1
    }
    out.array()
  }

  /** Decode a full image (all tiles, all components) to integer samples
    * (irreversible data is rounded to the nearest integer after inverse
    * ICT/DC-shift, as consumers of 8/16-bit imagery expect).
    */
  def decode(bytes: Array[Byte]): Jp2Image = {
    val cs = codestreamOf(bytes)
    val cd = parse(cs)
    val siz = cd.siz
    val w = siz.xsiz - siz.xosiz; val h = siz.ysiz - siz.yosiz
    val nc = siz.comps.length
    val out = Vector.fill(nc)(new Array[Int](w * h))
    for (tile <- cd.tiles) {
      val (tx0, ty0, tx1, ty1) = tileRect(siz, tile.index)
      val comps = decodeTileSamples(cs, cd, tile)
      var c = 0
      while (c < nc) {
        val tw = tx1 - tx0
        val arr = comps(c)
        var y = ty0
        while (y < ty1) {
          var x = tx0
          while (x < tx1) {
            out(c)((y - siz.yosiz) * w + (x - siz.xosiz)) = arr((y - ty0) * tw + (x - tx0))
            x += 1
          }
          y += 1
        }
        c += 1
      }
    }
    Jp2Image(w, h, siz.comps.head.depth, siz.comps.head.signed, out)
  }

  /** Decode one tile to per-component spatial samples (tile-rect
    * row-major), including inverse DWT, dequantization, inverse MCT and
    * DC level shift.
    */
  def decodeTileSamples(cs: Array[Byte], cd: Codestream, tile: Tile): Vector[Array[Int]] = {
    val siz = cd.siz; val cod = cd.cod
    val nc = siz.comps.length
    val (tx0, ty0, tx1, ty1) = tileRect(siz, tile.index)
    val tw = tx1 - tx0; val th = ty1 - ty0
    val blocks = decodeTilePackets(cs, cd, tile)
    val byComp = blocks.groupBy(_.comp)

    // per component: reconstruct the wavelet pyramid
    def reconstruct(c: Int): Array[Double] = {
      val n = cod.nLevels
      // band coefficient arrays keyed by (lev, orient)
      val bandArr = collection.mutable.Map[(Int, Int), Array[Int]]()
      val bandRect = collection.mutable.Map[(Int, Int), (Int, Int, Int, Int)]()
      for (res <- resolutions(siz, cod, tile.index); band <- res.bands) {
        bandRect((band.lev, band.orient)) = (band.bx0, band.by0, band.bx1, band.by1)
        bandArr.getOrElseUpdate((band.lev, band.orient),
          new Array[Int]((band.bx1 - band.bx0) * (band.by1 - band.by0)))
      }
      for (db <- byComp.getOrElse(c, Vector.empty)) {
        val segs = db.segments
        val data =
          if (segs.length == 1) cs
          else {
            val total = segs.map(s => s._2 - s._1).sum
            val buf = new Array[Byte](total)
            var p = 0
            for ((f, u) <- segs) { System.arraycopy(cs, f, buf, p, u - f); p += u - f }
            buf
          }
        val (from, until) =
          if (segs.length == 1) segs.head else (0, data.length)
        val bw = db.geom.x1 - db.geom.x0; val bh = db.geom.y1 - db.geom.y0
        // irreversible data reconstructs each nonzero index at its bin
        // midpoint, (mag + 0.5·2^lastCodedPlane)·Δ (E.1.1.2 / JJ2000
        // half-bit): store DOUBLED indices with the half folded in and
        // dequantize with Δ/2, so the band array stays integer
        val lastP = if (cod.wavelet53) null else new Array[Int](bw * bh)
        val coefs = T1.decode(data, from, until, bw, bh, db.band.orient,
          db.numbps, db.npasses, lastP)
        val target = bandArr((db.band.lev, db.band.orient))
        val (rx0, ry0, rx1, _) = bandRect((db.band.lev, db.band.orient))
        val rw = rx1 - rx0
        var j = 0
        while (j < bh) {
          var i = 0
          while (i < bw) {
            var v = coefs(j * bw + i)
            if (lastP != null && v != 0) {
              val half = 1 << lastP(j * bw + i)
              v = if (v > 0) 2 * v + half else 2 * v - half
            }
            target((db.geom.y0 + j - ry0) * rw + (db.geom.x0 + i - rx0)) = v
            i += 1
          }
          j += 1
        }
      }
      // assemble + inverse transform
      if (cod.wavelet53) {
        var (lx0, ly0, lx1, ly1) = bandRect((n, 0))
        var ll: Array[Int] = bandArr((n, 0))
        var lev = n
        while (lev >= 1) {
          val sh = lev - 1
          val nx0 = ceilDiv(tx0, 1 << sh); val ny0 = ceilDiv(ty0, 1 << sh)
          val nx1 = ceilDiv(tx1, 1 << sh); val ny1 = ceilDiv(ty1, 1 << sh)
          val nw = nx1 - nx0; val nh = ny1 - ny0
          val a = new Array[Int](nw * nh)
          interleaveI(a, nx0, ny0, nx1, ny1, ll, (lx0, ly0, lx1, ly1),
            bandArr.get((lev, 1)), bandRect.get((lev, 1)),
            bandArr.get((lev, 2)), bandRect.get((lev, 2)),
            bandArr.get((lev, 3)), bandRect.get((lev, 3)))
          Dwt.inv53Level(a, nx0, ny0, nx1, ny1)
          ll = a; lx0 = nx0; ly0 = ny0; lx1 = nx1; ly1 = ny1
          lev -= 1
        }
        val out = new Array[Double](tw * th)
        var i = 0
        while (i < out.length) { out(i) = ll(i); i += 1 }
        out
      } else {
        // irreversible: dequantize into doubles
        val depth = siz.comps(c).depth
        def delta(band: Band): Double = {
          val eps = bandExponent(cd.qcd, n, band)
          val mu = bandMantissa(cd.qcd, n, band)
          val rb = depth + bandGain(band.orient)
          math.pow(2.0, rb - eps) * (1.0 + mu / 2048.0)
        }
        val dBand = collection.mutable.Map[(Int, Int), Array[Double]]()
        for (res <- resolutions(siz, cod, tile.index); band <- res.bands) {
          val key = (band.lev, band.orient)
          val src = bandArr(key)
          val d = delta(band) / 2.0 // indices are doubled (half-bit folded in)
          val dst = new Array[Double](src.length)
          var i = 0
          while (i < src.length) { dst(i) = src(i) * d; i += 1 }
          dBand(key) = dst
        }
        var (lx0, ly0, lx1, ly1) = bandRect((n, 0))
        var ll: Array[Double] = dBand((n, 0))
        var lev = n
        while (lev >= 1) {
          val sh = lev - 1
          val nx0 = ceilDiv(tx0, 1 << sh); val ny0 = ceilDiv(ty0, 1 << sh)
          val nx1 = ceilDiv(tx1, 1 << sh); val ny1 = ceilDiv(ty1, 1 << sh)
          val nw = nx1 - nx0; val nh = ny1 - ny0
          val a = new Array[Double](nw * nh)
          interleaveD(a, nx0, ny0, nx1, ny1, ll, (lx0, ly0, lx1, ly1),
            dBand.get((lev, 1)), bandRect.get((lev, 1)),
            dBand.get((lev, 2)), bandRect.get((lev, 2)),
            dBand.get((lev, 3)), bandRect.get((lev, 3)))
          Dwt.inv97Level(a, nx0, ny0, nx1, ny1)
          ll = a; lx0 = nx0; ly0 = ny0; lx1 = nx1; ly1 = ny1
          lev -= 1
        }
        ll
      }
    }

    val planes = Vector.tabulate(nc)(reconstruct)
    // inverse multi-component transform
    if (cod.mct && nc >= 3) {
      val y = planes(0); val cb = planes(1); val cr = planes(2)
      if (cod.wavelet53) {
        // RCT (reversible, integer)
        var i = 0
        while (i < y.length) {
          val g = y(i) - math.floor((cb(i) + cr(i)) / 4.0)
          val r = cr(i) + g
          val b2 = cb(i) + g
          y(i) = r; cb(i) = g; cr(i) = b2
          i += 1
        }
      } else {
        // ICT (irreversible YCbCr)
        var i = 0
        while (i < y.length) {
          val yy = y(i); val u = cb(i); val v = cr(i)
          y(i) = yy + 1.402 * v
          cb(i) = yy - 0.344136 * u - 0.714136 * v
          cr(i) = yy + 1.772 * u
          i += 1
        }
      }
    }
    // DC level shift + clamp to sample range
    Vector.tabulate(nc) { c =>
      val depth = siz.comps(c).depth
      val signed = siz.comps(c).signed
      val shift = if (signed) 0 else 1 << (depth - 1)
      val lo = if (signed) -(1 << (depth - 1)) else 0
      val hi = if (signed) (1 << (depth - 1)) - 1 else (1 << depth) - 1
      val p = planes(c)
      val out = new Array[Int](p.length)
      var i = 0
      while (i < p.length) {
        val v = math.rint(p(i)).toInt + shift
        out(i) = math.max(lo, math.min(hi, v))
        i += 1
      }
      out
    }
  }

  private def interleaveI(a: Array[Int], x0: Int, y0: Int, x1: Int, y1: Int,
                          ll: Array[Int], llR: (Int, Int, Int, Int),
                          hl: Option[Array[Int]], hlR: Option[(Int, Int, Int, Int)],
                          lh: Option[Array[Int]], lhR: Option[(Int, Int, Int, Int)],
                          hh: Option[Array[Int]], hhR: Option[(Int, Int, Int, Int)]): Unit = {
    val w = x1 - x0
    @inline def put(src: Array[Int], r: (Int, Int, Int, Int), m: Int, nn: Int, u: Int, v: Int): Unit = {
      val (rx0, ry0, rx1, _) = r
      a((v - y0) * w + (u - x0)) = src((nn - ry0) * (rx1 - rx0) + (m - rx0))
    }
    var v = y0
    while (v < y1) {
      var u = x0
      while (u < x1) {
        val ue = (u & 1) == 0; val ve = (v & 1) == 0
        if (ue && ve) put(ll, llR, u >> 1, v >> 1, u, v)
        else if (!ue && ve) put(hl.get, hlR.get, u >> 1, v >> 1, u, v)
        else if (ue && !ve) put(lh.get, lhR.get, u >> 1, v >> 1, u, v)
        else put(hh.get, hhR.get, u >> 1, v >> 1, u, v)
        u += 1
      }
      v += 1
    }
  }

  private def interleaveD(a: Array[Double], x0: Int, y0: Int, x1: Int, y1: Int,
                          ll: Array[Double], llR: (Int, Int, Int, Int),
                          hl: Option[Array[Double]], hlR: Option[(Int, Int, Int, Int)],
                          lh: Option[Array[Double]], lhR: Option[(Int, Int, Int, Int)],
                          hh: Option[Array[Double]], hhR: Option[(Int, Int, Int, Int)]): Unit = {
    val w = x1 - x0
    @inline def put(src: Array[Double], r: (Int, Int, Int, Int), m: Int, nn: Int, u: Int, v: Int): Unit = {
      val (rx0, ry0, rx1, _) = r
      a((v - y0) * w + (u - x0)) = src((nn - ry0) * (rx1 - rx0) + (m - rx0))
    }
    var v = y0
    while (v < y1) {
      var u = x0
      while (u < x1) {
        val ue = (u & 1) == 0; val ve = (v & 1) == 0
        if (ue && ve) put(ll, llR, u >> 1, v >> 1, u, v)
        else if (!ue && ve) put(hl.get, hlR.get, u >> 1, v >> 1, u, v)
        else if (ue && !ve) put(lh.get, lhR.get, u >> 1, v >> 1, u, v)
        else put(hh.get, hhR.get, u >> 1, v >> 1, u, v)
        u += 1
      }
      v += 1
    }
  }

  // ---------------------------------------------------------------- write

  /** Lossless (reversible 5/3) single-layer LRCP writer. `samples`: one
    * Array[Int] per component, row-major width×height; values must fit
    * `depth` bits (signed or unsigned). Multi-tile via `tileW`/`tileH`.
    */
  def encode(width: Int, height: Int, depth: Int, signed: Boolean,
             samples: Vector[Array[Int]], nLevels: Int = 3,
             tileW: Int = 0, tileH: Int = 0, mct: Boolean = false): Array[Byte] = {
    require(samples.nonEmpty && samples.forall(_.length == width * height),
      "jp2 encode: bad sample planes")
    require(!mct || samples.length >= 3, "jp2 encode: RCT needs 3 components")
    val tw = if (tileW <= 0) width else tileW
    val th = if (tileH <= 0) height else tileH
    val nc = samples.length
    val siz = Siz(width, height, 0, 0, tw, th, 0, 0,
      Vector.fill(nc)(SizComp(depth, signed, 1, 1)))
    val cod = Cod(0, 1, mct, nLevels, 6, 6, 0, wavelet53 = true,
      Vector.empty, useSop = false, useEph = false)

    // fixed guard=2 with ε_b = depth + gain + 2 gives Mb = depth + gain + 3,
    // which bounds the 5/3 coefficient growth for any nLevels the tests use
    // (encodeTile asserts numbps ≤ Mb on every block)
    val shift = if (signed) 0 else 1 << (depth - 1)
    // forward RCT (G.2, reversible): Y = floor((R+2G+B)/4), Cb = B−G,
    // Cr = R−G — on DC-shifted values, mirroring the decoder's inverse.
    // encodeTile must then NOT shift again, so pre-shift here when mct.
    val planes =
      if (!mct) samples
      else {
        val r = samples(0); val g = samples(1); val b = samples(2)
        val y = new Array[Int](r.length); val cb = new Array[Int](r.length)
        val cr = new Array[Int](r.length)
        var i = 0
        while (i < r.length) {
          val rs = r(i) - shift; val gs = g(i) - shift; val bs = b(i) - shift
          y(i) = Math.floorDiv(rs + 2 * gs + bs, 4)
          cb(i) = bs - gs
          cr(i) = rs - gs
          i += 1
        }
        Vector(y, cb, cr) ++ samples.drop(3).map(_.map(_ - shift))
      }
    val tileShift = if (mct) 0 else shift
    val tileBytes = Vector.tabulate(siz.ntx * siz.nty) { t =>
      val (tx0, ty0, tx1, ty1) = tileRect(siz, t)
      val tw2 = tx1 - tx0
      val slices = planes.map { full =>
        Array.tabulate((ty1 - ty0) * tw2)(i =>
          full((ty0 + i / tw2) * width + tx0 + i % tw2))
      }
      encodeTile(siz, cod, t, slices, tileShift, depth)
    }
    val nBands = 1 + 3 * nLevels
    val qcdBody = new java.io.ByteArrayOutputStream()
    qcdBody.write((2 << 5) | 0)
    for (bi <- 0 until nBands) {
      val orient = if (bi == 0) 0 else ((bi - 1) % 3) + 1
      qcdBody.write(math.min(31, depth + bandGain(orient) + 2) << 3)
    }

    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v & 0xffff) }
    u16(0xff4f) // SOC
    // SIZ
    u16(0xff51); u16(38 + 3 * nc); u16(0)
    u32(width); u32(height); u32(0); u32(0); u32(tw); u32(th); u32(0); u32(0)
    u16(nc)
    for (_ <- 0 until nc) {
      out.write((depth - 1) | (if (signed) 0x80 else 0)); out.write(1); out.write(1)
    }
    // COD
    u16(0xff52); u16(12)
    out.write(0) // scod: default precincts, no SOP/EPH
    out.write(0) // LRCP
    u16(1) // layers
    out.write(if (mct) 1 else 0)
    out.write(nLevels)
    out.write(6 - 2); out.write(6 - 2) // 64×64 codeblocks
    out.write(0) // style
    out.write(1) // 5/3
    // QCD
    val qb = qcdBody.toByteArray
    u16(0xff5c); u16(2 + qb.length); out.write(qb, 0, qb.length)
    // tiles
    for ((tb, t) <- tileBytes.zipWithIndex) {
      u16(0xff90); u16(10); u16(t); u32(14 + tb.length); out.write(0); out.write(1)
      u16(0xff93)
      out.write(tb, 0, tb.length)
    }
    u16(0xffd9) // EOC
    val cs = out.toByteArray
    wrapJp2(cs, width, height, nc, depth, signed)
  }

  private def epsOf(depth: Int, orient: Int): Int =
    math.min(31, depth + bandGain(orient) + 2)

  /** Encode one tile from tile-local row-major samples (already sliced).
    * The tile's GLOBAL rect drives every parity/geometry decision — band
    * rects, code-block grid anchoring and DWT phase all live in reference
    * grid coordinates, so encoding a tile "at origin 0" would desynchronize
    * from the decoder whenever the origin is not block-aligned at depth.
    * Returns the SOD payload bytes.
    */
  private def encodeTile(siz: Siz, cod: Cod, t: Int,
                         tileSamples: Vector[Array[Int]],
                         shift: Int, depth: Int): Array[Byte] = {
    val (tx0, ty0, tx1, ty1) = tileRect(siz, t)
    val tw = tx1 - tx0; val th = ty1 - ty0
    val n = cod.nLevels
    val nc = tileSamples.length
    require(tw <= 32768 && th <= 32768, "jp2 writer: tile exceeds default precinct")
    // per comp: forward DWT then per-band codeblock encode
    final case class EncBlock(comp: Int, bandIdx: Int, res: Int, cbx: Int, cby: Int,
                              numbps: Int, npasses: Int, bytes: Array[Byte])
    val blocks = Vector.newBuilder[EncBlock]
    val resList = resolutions(siz, cod, t)
    for (c <- 0 until nc) {
      // DC shift the tile-local slice
      val a = new Array[Int](tw * th)
      val src = tileSamples(c)
      var i0 = 0
      while (i0 < a.length) { a(i0) = src(i0) - shift; i0 += 1 }
      // forward levels: lev = 1..N over shrinking LL rect
      var lx0 = tx0; var ly0 = ty0; var lx1 = tx1; var ly1 = ty1
      val levArrays = collection.mutable.Map[Int, (Array[Int], (Int, Int, Int, Int))]()
      var lev = 1
      var cur = a
      while (lev <= n) {
        Dwt.fwd53Level(cur, lx0, ly0, lx1, ly1)
        levArrays(lev) = (cur, (lx0, ly0, lx1, ly1))
        // extract LL for next level
        val nx0 = ceilDiv(lx0, 2); val ny0 = ceilDiv(ly0, 2)
        val nx1 = ceilDiv(lx1, 2); val ny1 = ceilDiv(ly1, 2)
        val nxt = new Array[Int]((nx1 - nx0) * (ny1 - ny0))
        val w = lx1 - lx0
        var v = ly0
        while (v < ly1) {
          if ((v & 1) == 0) {
            var u = lx0
            while (u < lx1) {
              if ((u & 1) == 0)
                nxt(((v >> 1) - ny0) * (nx1 - nx0) + ((u >> 1) - nx0)) = cur((v - ly0) * w + (u - lx0))
              u += 1
            }
          }
          v += 1
        }
        cur = nxt; lx0 = nx0; ly0 = ny0; lx1 = nx1; ly1 = ny1
        lev += 1
      }
      // cur is now LL_N over (lx0,ly0,lx1,ly1)
      // band extraction helper from interleaved level arrays
      def bandSamples(band: Band): Array[Int] = {
        if (band.orient == 0) cur
        else {
          val (arr, (ax0, ay0, ax1, _)) = levArrays(band.lev)
          val aw = ax1 - ax0
          val bw = band.bx1 - band.bx0; val bh = band.by1 - band.by0
          val outB = new Array[Int](bw * bh)
          val (xob, yob) = band.orient match {
            case 1 => (1, 0); case 2 => (0, 1); case _ => (1, 1)
          }
          var jj = 0
          while (jj < bh) {
            var ii = 0
            while (ii < bw) {
              val u = 2 * (band.bx0 + ii) + xob
              val v = 2 * (band.by0 + jj) + yob
              outB(jj * bw + ii) = arr((v - ay0) * aw + (u - ax0))
              ii += 1
            }
            jj += 1
          }
          outB
        }
      }
      for (res <- resList; (band, bi) <- res.bands.zipWithIndex) {
        val bs = bandSamples(band)
        val bw = band.bx1 - band.bx0; val bh = band.by1 - band.by0
        if (bw > 0 && bh > 0) {
          // default precincts (2^15): one precinct per resolution
          val (gw, gh, geoms) = precinctBlocks(res, band, 0, 0, cod)
          for (g <- geoms) {
            val cw = g.x1 - g.x0; val ch = g.y1 - g.y0
            val cb = new Array[Int](cw * ch)
            var jj = 0
            while (jj < ch) {
              var ii = 0
              while (ii < cw) {
                cb(jj * cw + ii) = bs((g.y0 - band.by0 + jj) * bw + (g.x0 - band.bx0 + ii))
                ii += 1
              }
              jj += 1
            }
            val (numbps, npasses, bytes) = T1.encode(cb, cw, ch, band.orient)
            require(numbps <= 2 + epsOf(depth, band.orient) - 1,
              s"jp2 writer: numbps $numbps exceeds Mb for depth $depth")
            blocks += EncBlock(c, bi, res.r, g.cbx, g.cby, numbps, npasses, bytes)
          }
        }
      }
    }
    val blockList = blocks.result()
    // packets: LRCP, 1 layer, 1 precinct per res
    val body = new java.io.ByteArrayOutputStream()
    for (r <- 0 to n; c <- 0 until nc) {
      val res = resList(r)
      if (res.nPrecincts > 0) {
        val bw2 = new BitWriter
        bw2.putBit(1) // non-empty
        val contributing = blockList.filter(b => b.comp == c && b.res == r)
        for ((band, bi) <- res.bands.zipWithIndex) {
          val (gw, gh, geoms) = precinctBlocks(res, band, 0, 0, cod)
          if (geoms.nonEmpty) {
            val incl = new TagTree(gw, gh)
            val zbp = new TagTree(gw, gh)
            val byPos = contributing.filter(_.bandIdx == bi)
              .map(b => ((b.cbx, b.cby), b)).toMap
            for (g <- geoms) {
              val b = byPos((g.cbx, g.cby))
              incl.setLeaf(g.cbx, g.cby, 0) // all blocks in layer 0
              val mb = 2 + epsOf(depth, band.orient) - 1
              zbp.setLeaf(g.cbx, g.cby, mb - b.numbps)
            }
            incl.build(); zbp.build()
            for (g <- geoms) {
              val b = byPos((g.cbx, g.cby))
              incl.encode(bw2, g.cbx, g.cby, 1)
              // zero bitplanes: encode with rising threshold until coded
              var t2 = 1
              while (!zbp.leafKnown(g.cbx, g.cby)) { zbp.encode(bw2, g.cbx, g.cby, t2); t2 += 1 }
              // npasses (Table B.4)
              val np = math.max(1, b.npasses)
              if (np == 1) bw2.putBit(0)
              else if (np == 2) { bw2.putBit(1); bw2.putBit(0) }
              else if (np <= 5) { bw2.putBits(3, 2); bw2.putBits(np - 3, 2) }
              else if (np <= 36) { bw2.putBits(0xf, 4); bw2.putBits(np - 6, 5) }
              else { bw2.putBits(0x1ff, 9); bw2.putBits(np - 37, 7) }
              // Lblock + length
              var lblock = 3
              val passBits = 31 - Integer.numberOfLeadingZeros(np)
              val len = b.bytes.length
              val needBits = if (len == 0) 1 else 32 - Integer.numberOfLeadingZeros(len)
              while (lblock + passBits < needBits) { bw2.putBit(1); lblock += 1 }
              bw2.putBit(0)
              bw2.putBits(len, lblock + passBits)
            }
          }
        }
        val hdr = bw2.align()
        body.write(hdr, 0, hdr.length)
        for ((band, bi) <- res.bands.zipWithIndex) {
          val (_, _, geoms) = precinctBlocks(res, band, 0, 0, cod)
          val byPos = contributing.filter(_.bandIdx == bi)
            .map(b => ((b.cbx, b.cby), b)).toMap
          for (g <- geoms) body.write(byPos((g.cbx, g.cby)).bytes)
        }
      }
    }
    body.toByteArray
  }

  private def wrapJp2(cs: Array[Byte], w: Int, h: Int, nc: Int, depth: Int,
                      signed: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    def box(typ: String, payload: Array[Byte]): Unit = {
      u32(8 + payload.length); out.write(typ.getBytes("ISO-8859-1")); out.write(payload, 0, payload.length)
    }
    box("jP  ", Array(0x0d, 0x0a, 0x87, 0x0a).map(_.toByte))
    box("ftyp", "jp2 ".getBytes("ISO-8859-1") ++ Array[Byte](0, 0, 0, 0) ++ "jp2 ".getBytes("ISO-8859-1"))
    val ihdr = new java.io.ByteArrayOutputStream()
    def ih32(v: Int): Unit = { ihdr.write(v >>> 24); ihdr.write((v >>> 16) & 0xff); ihdr.write((v >>> 8) & 0xff); ihdr.write(v & 0xff) }
    ih32(h); ih32(w); ihdr.write(0); ihdr.write(nc) // nc as u16
    ihdr.write((depth - 1) | (if (signed) 0x80 else 0))
    ihdr.write(7); ihdr.write(0); ihdr.write(0) // compression 7, unk colorspace 0, ipr 0
    val colr = Array[Byte](1, 0, 0, 0, 0, 0, 17) // enumerated, greyscale(17)
    val jp2h = new java.io.ByteArrayOutputStream()
    def sub(typ: String, payload: Array[Byte]): Unit = {
      val lenB = 8 + payload.length
      jp2h.write((lenB >>> 24) & 0xff); jp2h.write((lenB >>> 16) & 0xff)
      jp2h.write((lenB >>> 8) & 0xff); jp2h.write(lenB & 0xff)
      jp2h.write(typ.getBytes("ISO-8859-1"), 0, 4); jp2h.write(payload, 0, payload.length)
    }
    sub("ihdr", ihdr.toByteArray)
    sub("colr", colr)
    box("jp2h", jp2h.toByteArray)
    box("jp2c", cs)
    out.toByteArray
  }

  // ---------------------------------------------------------------- spark

  private def rasterSchema(nb: Int): StructType = StructType(Seq(
    StructField("y", DoubleType, nullable = false),
    StructField("x", DoubleType, nullable = false)) ++
    (if (nb == 1) Seq(StructField("v", DoubleType, nullable = false))
     else (0 until nb).map(b => StructField(s"b$b", DoubleType, nullable = false))))

  /** Distributed read: one Spark task per JP2 tile. The driver reads only
    * the main header and the SOT index; each task re-opens the file and
    * decodes its own tile-part byte range (same chunk-per-task shape as the
    * Zarr/COG readers — no driver-side pixel work, no shuffle).
    */
  def readRaster(spark: SparkSession, path: String,
                 nodata: Option[Double] = None): DataFrame = {
    val bs = graft.sources.ByteStore.current // captured into the tile tasks
    val bytes0 = bs.read(path)
    val cs = codestreamOf(bytes0)
    val cd = parse(cs)
    val siz = cd.siz
    val nc = siz.comps.length
    val tiles = cd.tiles
    val rdd = spark.sparkContext
      .parallelize(tiles.map(_.index), math.min(tiles.length, 32))
      .flatMap { t =>
        val bytes = bs.read(path)
        val cs2 = codestreamOf(bytes)
        val cd2 = parse(cs2)
        val tile = cd2.tiles.find(_.index == t).get
        val comps = decodeTileSamples(cs2, cd2, tile)
        val (tx0, ty0, tx1, ty1) = tileRect(siz, t)
        val tw = tx1 - tx0
        (0 until (ty1 - ty0) * tw).iterator.map { i =>
          val y = ty0 + i / tw; val x = tx0 + i % tw
          val vs = (0 until nc).map { c =>
            val raw = comps(c)(i).toDouble
            nodata match {
              case Some(nd) if raw == nd => Double.NaN
              case _ => raw
            }
          }
          Row.fromSeq(Seq((y + 0.5), (x + 0.5)) ++ vs)
        }
      }
    spark.createDataFrame(rdd, rasterSchema(nc))
  }

  /** Distributed read of a granule COLLECTION: one Spark task per
    * (file, tile) pair. The driver touches only each file's main header to
    * learn the tile grid; pixel decode happens where the task runs. This is
    * the N-granule ingest fan-out — 10^5 files × tiles at 100 TB — with a
    * `src` column carrying the granule file name for time/series binding.
    */
  def readRasterFiles(spark: SparkSession, paths: Seq[String],
                      nodata: Option[Double] = None): DataFrame = {
    require(paths.nonEmpty, "jp2: empty path list")
    val bs = graft.sources.ByteStore.current // captured into the tile tasks
    val work: Seq[(String, Int)] = paths.flatMap { p =>
      val cd = parse(codestreamOf(bs.read(p)))
      cd.tiles.map(t => (p, t.index))
    }
    val first = parse(codestreamOf(bs.read(paths.head)))
    val nc = first.siz.comps.length
    val rdd = spark.sparkContext
      .parallelize(work, math.min(work.length, 64))
      .flatMap { case (p, t) =>
        val bytes = bs.read(p)
        val cd = parse(codestreamOf(bytes))
        val tile = cd.tiles.find(_.index == t).get
        val comps = decodeTileSamples(codestreamOf(bytes), cd, tile)
        val (tx0, ty0, tx1, ty1) = tileRect(cd.siz, t)
        val tw = tx1 - tx0
        val name = new java.io.File(p).getName
        (0 until (ty1 - ty0) * tw).iterator.map { i =>
          val y = ty0 + i / tw; val x = tx0 + i % tw
          val vs = (0 until comps.length).map { c =>
            val raw = comps(c)(i).toDouble
            nodata match {
              case Some(nd) if raw == nd => Double.NaN
              case _ => raw
            }
          }
          Row.fromSeq(Seq(name, (y + 0.5), (x + 0.5)) ++ vs)
        }
      }
    val schema = StructType(StructField("src", StringType, nullable = false) +:
      rasterSchema(nc).fields.toSeq)
    spark.createDataFrame(rdd, schema)
  }

  def write(path: String, width: Int, height: Int, depth: Int, signed: Boolean,
            samples: Vector[Array[Int]], nLevels: Int = 3,
            tileW: Int = 0, tileH: Int = 0): Unit = {
    val bytes = encode(width, height, depth, signed, samples, nLevels, tileW, tileH)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }

  /** Distributed lossless write of a (y, x, v) grid DataFrame: tiles are
    * encoded one-per-task on the executors (DWT + T1 + packets are
    * embarrassingly parallel per tile — the JP2 codestream has no
    * cross-tile state), and only the finished tile-part byte ranges travel
    * to the driver, which concatenates them behind a fixed-size main
    * header. Metadata is O(tiles); pixels never pass through the driver
    * whole — the same sink shape as the Zarr chunk-per-task writer.
    *
    * `df` columns: y and x are cell-centre coordinates (row = floor(y)),
    * `v` integer-valued; absent cells encode as 0.
    */
  def writeRaster(df: DataFrame, path: String, width: Int, height: Int,
                  depth: Int, nLevels: Int = 3,
                  tileW: Int = 256, tileH: Int = 256): Unit = {
    import org.apache.spark.sql.functions.{col, floor => ffloor}
    val spark = df.sparkSession
    val tilesX = ceilDiv(width, tileW)
    val siz = Siz(width, height, 0, 0, tileW, tileH, 0, 0,
      Vector(SizComp(depth, signed = false, 1, 1)))
    val cod = Cod(0, 1, mct = false, nLevels, 6, 6, 0, wavelet53 = true,
      Vector.empty, useSop = false, useEph = false)
    val shift = 1 << (depth - 1)
    // one task per tile: group rows by tile id, encode locally
    val tileBytes = df
      .select((ffloor(col("y")).cast("int")).as("j"),
        (ffloor(col("x")).cast("int")).as("i"), col("v").cast("int").as("v"))
      .rdd.map(r => ((r.getInt(0) / tileH) * tilesX + r.getInt(1) / tileW, r))
      .groupByKey(math.min(tilesX * ceilDiv(height, tileH), 256))
      .map { case (t, rows) =>
        val (tx0, ty0, tx1, ty1) = tileRect(siz, t)
        val tw = tx1 - tx0; val th = ty1 - ty0
        val grid = new Array[Int](tw * th)
        for (r <- rows) {
          val j = r.getInt(0); val i = r.getInt(1)
          grid((j - ty0) * tw + (i - tx0)) = r.getInt(2)
        }
        (t, encodeTile(siz, cod, t, Vector(grid), shift, depth))
      }
      .collect().toMap
    // assemble: header + per-tile SOT/SOD (empty tiles encode an empty grid)
    val allTiles = Vector.tabulate(siz.ntx * siz.nty) { t =>
      tileBytes.getOrElse(t, {
        val (tx0, ty0, tx1, ty1) = tileRect(siz, t)
        encodeTile(siz, cod, t,
          Vector(new Array[Int]((tx1 - tx0) * (ty1 - ty0))), shift, depth)
      })
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Int): Unit = { u16(v >>> 16); u16(v & 0xffff) }
    u16(0xff4f)
    u16(0xff51); u16(38 + 3); u16(0)
    u32(width); u32(height); u32(0); u32(0); u32(tileW); u32(tileH); u32(0); u32(0)
    u16(1); out.write(depth - 1); out.write(1); out.write(1)
    u16(0xff52); u16(12)
    out.write(0); out.write(0); u16(1); out.write(0); out.write(nLevels)
    out.write(4); out.write(4); out.write(0); out.write(1)
    u16(0xff5c); u16(2 + 1 + (1 + 3 * nLevels))
    out.write(2 << 5)
    for (bi <- 0 to 3 * nLevels) {
      val orient = if (bi == 0) 0 else ((bi - 1) % 3) + 1
      out.write(math.min(31, depth + bandGain(orient) + 2) << 3)
    }
    for ((tb, t) <- allTiles.zipWithIndex) {
      u16(0xff90); u16(10); u16(t); u32(14 + tb.length); out.write(0); out.write(1)
      u16(0xff93); out.write(tb, 0, tb.length)
    }
    u16(0xffd9)
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, wrapJp2(out.toByteArray, width, height, 1, depth, signed = false))
  }
}
