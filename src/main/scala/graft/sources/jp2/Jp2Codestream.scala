package graft.sources.jp2

import java.nio.{ByteBuffer, ByteOrder}

/** JPEG 2000 Part 1 codestream (T.800 Annex A/B): marker segments, the
  * resolution/precinct/code-block geometry, packet headers, and whole-tile
  * decode. Scope = the profile actually used by earth-observation granules
  * (verified against the reference's demo .jp2 files): LRCP/RLCP/RPCL
  * progression, one tile-part per tile, code-block style 0, reversible 5/3
  * or irreversible 9/7 with scalar quantization, optional RCT/ICT, SOP/EPH
  * markers tolerated. Anything else fails loudly with a named error.
  */
private[graft] object Jp2Codestream {

  final case class SizComp(depth: Int, signed: Boolean, dx: Int, dy: Int)
  final case class Siz(xsiz: Int, ysiz: Int, xosiz: Int, yosiz: Int,
                       xt: Int, yt: Int, xto: Int, yto: Int,
                       comps: Vector[SizComp]) {
    def ntx: Int = ceilDiv(xsiz - xto, xt)
    def nty: Int = ceilDiv(ysiz - yto, yt)
  }
  final case class Cod(prog: Int, nLayers: Int, mct: Boolean, nLevels: Int,
                       xcb: Int, ycb: Int, cbStyle: Int, wavelet53: Boolean,
                       precincts: Vector[(Int, Int)], // (PPx, PPy) per res, default (15,15)
                       useSop: Boolean, useEph: Boolean) {
    def pp(r: Int): (Int, Int) =
      if (precincts.isEmpty) (15, 15)
      else precincts(math.min(r, precincts.length - 1))
  }
  /** Quantization: style 0 = none (reversible; exponents only), 1 = scalar
    * derived (one (ε,μ) for LL, others derived), 2 = scalar expounded.
    */
  final case class Qcd(style: Int, guard: Int, exps: Vector[Int], mants: Vector[Int])

  final case class Tile(index: Int, dataFrom: Int, dataUntil: Int)

  final case class Codestream(siz: Siz, cod: Cod, qcd: Qcd, tiles: Vector[Tile])

  def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b
  private def ceilHalf(a: Int): Int = (a + 1) >> 1

  // ---------------------------------------------------------------- parse

  def parse(cs: Array[Byte]): Codestream = {
    val b = ByteBuffer.wrap(cs).order(ByteOrder.BIG_ENDIAN)
    require((b.getShort(0) & 0xffff) == 0xff4f, "jp2: missing SOC")
    var o = 2
    var siz: Siz = null
    var cod: Cod = null
    var qcd: Qcd = null
    val tiles = Vector.newBuilder[Tile]
    var done = false
    while (!done && o < cs.length - 1) {
      val marker = b.getShort(o) & 0xffff
      marker match {
        case 0xffd9 => done = true // EOC
        case 0xff90 => // SOT
          val len = b.getShort(o + 2) & 0xffff
          val isot = b.getShort(o + 4) & 0xffff
          val psot0 = b.getInt(o + 6)
          val tpsot = b.get(o + 10) & 0xff
          val tnsot = b.get(o + 11) & 0xff
          require(tpsot == 0 && (tnsot == 1 || tnsot == 0),
            s"jp2: multiple tile-parts per tile not supported (tile $isot part $tpsot of $tnsot)")
          val psot = if (psot0 == 0) cs.length - 2 - o else psot0
          // walk tile-part header markers up to SOD (overrides unsupported)
          var q = o + 2 + len
          while ((b.getShort(q) & 0xffff) != 0xff93) {
            val m = b.getShort(q) & 0xffff
            require(m != 0xff52 && m != 0xff5c && m != 0xff53 && m != 0xff5d,
              s"jp2: per-tile COD/QCD override not supported (marker ${m.toHexString})")
            q += 2 + (b.getShort(q + 2) & 0xffff)
          }
          tiles += Tile(isot, q + 2, o + psot)
          o = o + psot
        case _ =>
          val len = b.getShort(o + 2) & 0xffff
          marker match {
            case 0xff51 => // SIZ
              val xs = b.getInt(o + 6); val ys = b.getInt(o + 10)
              val xo = b.getInt(o + 14); val yo = b.getInt(o + 18)
              val xt = b.getInt(o + 22); val yt = b.getInt(o + 26)
              val xto = b.getInt(o + 30); val yto = b.getInt(o + 34)
              val nc = b.getShort(o + 38) & 0xffff
              val comps = Vector.tabulate(nc) { c =>
                val ss = b.get(o + 40 + 3 * c) & 0xff
                SizComp((ss & 0x7f) + 1, (ss & 0x80) != 0,
                  b.get(o + 41 + 3 * c) & 0xff, b.get(o + 42 + 3 * c) & 0xff)
              }
              require(comps.forall(c => c.dx == 1 && c.dy == 1),
                "jp2: component subsampling not supported")
              siz = Siz(xs, ys, xo, yo, xt, yt, xto, yto, comps)
            case 0xff52 => // COD
              val scod = b.get(o + 4) & 0xff
              val prog = b.get(o + 5) & 0xff
              val nl = b.getShort(o + 6) & 0xffff
              val mct = (b.get(o + 8) & 0xff) != 0
              val nd = b.get(o + 9) & 0xff
              val xcb = (b.get(o + 10) & 0x0f) + 2
              val ycb = (b.get(o + 11) & 0x0f) + 2
              val cbSty = b.get(o + 12) & 0xff
              val wav = (b.get(o + 13) & 0xff) == 1
              val prec =
                if ((scod & 1) == 0) Vector.empty
                else Vector.tabulate(nd + 1) { r =>
                  val v = b.get(o + 14 + r) & 0xff
                  (v & 0x0f, (v >> 4) & 0x0f)
                }
              require(prog <= 2, s"jp2: progression order $prog not supported (LRCP/RLCP/RPCL only)")
              require(cbSty == 0, s"jp2: code-block style ${cbSty.toHexString} not supported")
              cod = Cod(prog, nl, mct, nd, xcb, ycb, cbSty, wav, prec,
                (scod & 2) != 0, (scod & 4) != 0)
            case 0xff5c => // QCD
              val sq = b.get(o + 4) & 0xff
              val style = sq & 0x1f
              val guard = (sq >> 5) & 7
              val n = len - 3
              style match {
                case 0 => // no quantization: 8-bit exponents
                  val exps = Vector.tabulate(n)(i => (b.get(o + 5 + i) & 0xff) >> 3)
                  qcd = Qcd(0, guard, exps, Vector.fill(n)(0))
                case 1 | 2 =>
                  val m = n / 2
                  val exps = Vector.tabulate(m)(i => (b.getShort(o + 5 + 2 * i) & 0xffff) >> 11)
                  val mants = Vector.tabulate(m)(i => b.getShort(o + 5 + 2 * i) & 0x7ff)
                  qcd = Qcd(style, guard, exps, mants)
                case s => throw new IllegalArgumentException(s"jp2: QCD style $s")
              }
            case 0xff53 | 0xff5d =>
              throw new IllegalArgumentException("jp2: per-component COC/QCC not supported")
            case 0xff5e | 0xff5f | 0xff60 | 0xff61 =>
              throw new IllegalArgumentException(
                f"jp2: RGN/POC/PPM/PPT marker $marker%x not supported")
            case _ => () // COM/TLM/PLM/CRG and other informational: skip
          }
          o += 2 + len
      }
    }
    require(siz != null && cod != null && qcd != null, "jp2: missing SIZ/COD/QCD")
    Codestream(siz, cod, qcd, tiles.result())
  }

  // ------------------------------------------------------------- geometry

  /** A subband of one tile-component resolution. orient: 0=LL 1=HL 2=LH 3=HH. */
  final case class Band(orient: Int, lev: Int, // decomposition level (1..N for non-LL, N for LL)
                        bx0: Int, by0: Int, bx1: Int, by1: Int)

  final case class Res(r: Int, trx0: Int, try0: Int, trx1: Int, try1: Int,
                       bands: Vector[Band], ppx: Int, ppy: Int) {
    // precinct grid over the resolution rect, anchored at 0
    def px0: Int = if (trx1 > trx0) trx0 >> ppx else 0
    def py0: Int = if (try1 > try0) try0 >> ppy else 0
    def npx: Int = if (trx1 > trx0) ceilDiv(trx1, 1 << ppx) - px0 else 0
    def npy: Int = if (try1 > try0) ceilDiv(try1, 1 << ppy) - py0 else 0
    def nPrecincts: Int = npx * npy
  }

  /** Tile-component rect in reference-grid coordinates. */
  def tileRect(siz: Siz, t: Int): (Int, Int, Int, Int) = {
    val ti = t % siz.ntx; val tj = t / siz.ntx
    val tx0 = math.max(siz.xto + ti * siz.xt, siz.xosiz)
    val ty0 = math.max(siz.yto + tj * siz.yt, siz.yosiz)
    val tx1 = math.min(siz.xto + (ti + 1) * siz.xt, siz.xsiz)
    val ty1 = math.min(siz.yto + (tj + 1) * siz.yt, siz.ysiz)
    (tx0, ty0, tx1, ty1)
  }

  /** All resolutions (r = 0..N) of a tile-component. */
  def resolutions(siz: Siz, cod: Cod, t: Int): Vector[Res] = {
    val (tcx0, tcy0, tcx1, tcy1) = tileRect(siz, t)
    val n = cod.nLevels
    Vector.tabulate(n + 1) { r =>
      val sh = n - r
      val trx0 = ceilDiv2(tcx0, sh); val try0 = ceilDiv2(tcy0, sh)
      val trx1 = ceilDiv2(tcx1, sh); val try1 = ceilDiv2(tcy1, sh)
      val bands =
        if (r == 0) Vector(Band(0, n, ceilDiv2(tcx0, n), ceilDiv2(tcy0, n),
          ceilDiv2(tcx1, n), ceilDiv2(tcy1, n)))
        else {
          val lev = n - r + 1 // decomposition level of these bands
          def bandRect(xob: Int, yob: Int): (Int, Int, Int, Int) = {
            val d = 1 << lev
            val hx = (1 << (lev - 1)) * xob; val hy = (1 << (lev - 1)) * yob
            (ceilDiv(tcx0 - hx, d), ceilDiv(tcy0 - hy, d),
              ceilDiv(tcx1 - hx, d), ceilDiv(tcy1 - hy, d))
          }
          Vector(1, 2, 3).map { o =>
            val (xob, yob) = o match { case 1 => (1, 0); case 2 => (0, 1); case 3 => (1, 1) }
            val (a, b2, c, d2) = bandRect(xob, yob)
            Band(o, lev, a, b2, c, d2)
          }
        }
      val (ppx, ppy) = cod.pp(r)
      Res(r, trx0, try0, trx1, try1, bands, ppx, ppy)
    }
  }

  private def ceilDiv2(a: Int, sh: Int): Int = ceilDiv(a, 1 << sh)

  /** Code-blocks of one subband restricted to one precinct. The code-block
    * grid is anchored at 0 in subband coordinates with effective size
    * 2^exb × 2^eyb where exb = min(xcb, ppx − (r>0 ? 1 : 0)).
    */
  final case class CbGeom(cbx: Int, cby: Int, // block index in the subband grid
                          x0: Int, y0: Int, x1: Int, y1: Int)

  def precinctBlocks(res: Res, band: Band, pi: Int, pj: Int, cod: Cod): (Int, Int, Vector[CbGeom]) = {
    val half = if (res.r == 0) 0 else 1
    val exb = math.min(cod.xcb, res.ppx - half)
    val eyb = math.min(cod.ycb, res.ppy - half)
    // precinct rect in resolution coords
    val prx0 = math.max(res.trx0, (res.px0 + pi) << res.ppx)
    val pry0 = math.max(res.try0, (res.py0 + pj) << res.ppy)
    val prx1 = math.min(res.trx1, (res.px0 + pi + 1) << res.ppx)
    val pry1 = math.min(res.try1, (res.py0 + pj + 1) << res.ppy)
    // map to subband coords (halve for r>0): a band sample m sits at
    // resolution coord u = 2m + xob, so the precinct [prx0, prx1) covers
    // band columns ceil((prx0 − xob)/2) until ceil((prx1 − xob)/2)
    val (xob, yob) = band.orient match {
      case 0 => (0, 0); case 1 => (1, 0); case 2 => (0, 1); case _ => (1, 1)
    }
    val sx0 = if (half == 1) ceilDiv(prx0 - xob, 2) else prx0
    val sy0 = if (half == 1) ceilDiv(pry0 - yob, 2) else pry0
    val sx1 = if (half == 1) ceilDiv(prx1 - xob, 2) else prx1
    val sy1 = if (half == 1) ceilDiv(pry1 - yob, 2) else pry1
    // intersect with the band rect
    val bx0 = math.max(sx0, band.bx0); val by0 = math.max(sy0, band.by0)
    val bx1 = math.min(sx1, band.bx1); val by1 = math.min(sy1, band.by1)
    if (bx0 >= bx1 || by0 >= by1) return (0, 0, Vector.empty)
    val cb0 = bx0 >> exb; val cb1 = (bx1 - 1) >> exb
    val rb0 = by0 >> eyb; val rb1 = (by1 - 1) >> eyb
    val blocks = Vector.newBuilder[CbGeom]
    var j = rb0
    while (j <= rb1) {
      var i2 = cb0
      while (i2 <= cb1) {
        val x0 = math.max(bx0, i2 << exb); val x1 = math.min(bx1, (i2 + 1) << exb)
        val y0 = math.max(by0, j << eyb); val y1 = math.min(by1, (j + 1) << eyb)
        blocks += CbGeom(i2 - cb0, j - rb0, x0, y0, x1, y1)
        i2 += 1
      }
      j += 1
    }
    (cb1 - cb0 + 1, rb1 - rb0 + 1, blocks.result())
  }

  // -------------------------------------------------------------- packets

  /** Per-code-block accumulated decode state across layers. */
  final class CbState {
    var included = false
    var missingBp = 0
    var numbps = 0
    var lblock = 3
    var npasses = 0
    val segments = Vector.newBuilder[(Int, Int)] // (from, until) into tile data
  }

  /** Decode all packet headers+bodies of one tile for one component count,
    * filling per-codeblock segment lists. Returns, per (comp, res, band
    * orient), the codeblock states with geometry.
    */
  final case class DecodedBlock(comp: Int, band: Band, geom: CbGeom,
                                numbps: Int, npasses: Int,
                                segments: Vector[(Int, Int)])

  def decodeTilePackets(cs: Array[Byte], csData: Codestream, tile: Tile): Vector[DecodedBlock] = {
    val siz = csData.siz; val cod = csData.cod
    val nc = siz.comps.length
    val resPerComp = Vector.tabulate(nc)(_ => resolutions(siz, cod, tile.index))
    // tag trees + states per (comp, res, precinct, bandIdx)
    val incl = collection.mutable.Map[(Int, Int, Int, Int), TagTree]()
    val zbp = collection.mutable.Map[(Int, Int, Int, Int), TagTree]()
    val states = collection.mutable.Map[(Int, Int, Int, Int, Int, Int), CbState]()
    var pos = tile.dataFrom

    def onePacket(c: Int, r: Int, p: Int, layer: Int): Unit = {
      val res = resPerComp(c)(r)
      if (res.nPrecincts == 0) return
      val pi = p % res.npx; val pj = p / res.npx
      // SOP marker: 6 bytes ff91 len(4) Nsop — skip if present
      if (cod.useSop && pos + 1 < cs.length &&
        (cs(pos) & 0xff) == 0xff && (cs(pos + 1) & 0xff) == 0x91) pos += 6
      val br = new BitReader(cs, pos)
      val bandBlocks = res.bands.zipWithIndex.map { case (band, bi) =>
        val (gw, gh, blocks) = precinctBlocks(res, band, pi, pj, cod)
        (band, bi, gw, gh, blocks)
      }
      val nonEmpty = br.getBit() == 1
      val bodies = Vector.newBuilder[(CbState, Int)] // (state, bodyLen)
      if (nonEmpty) {
        for ((band, bi, gw, gh, blocks) <- bandBlocks if blocks.nonEmpty) {
          val key = (c, r, p, bi)
          val it = incl.getOrElseUpdate(key, new TagTree(gw, gh))
          val zt = zbp.getOrElseUpdate(key, new TagTree(gw, gh))
          for (g <- blocks) {
            val sk = (c, r, p, bi, g.cbx, g.cby)
            val st = states.getOrElseUpdate(sk, new CbState)
            val wasIncluded = st.included
            val includedNow =
              if (!wasIncluded) it.decode(br, g.cbx, g.cby, layer + 1)
              else br.getBit() == 1
            if (includedNow) {
              if (!wasIncluded) {
                // zero bitplanes: raise threshold until the leaf resolves
                var t = 1
                while (!zt.decode(br, g.cbx, g.cby, t)) t += 1
                st.missingBp = zt.leafValue(g.cbx, g.cby)
                st.included = true
              }
              // number of coding passes (Table B.4)
              val np =
                if (br.getBit() == 0) 1
                else if (br.getBit() == 0) 2
                else {
                  val v = br.getBits(2)
                  if (v < 3) 3 + v
                  else {
                    val v2 = br.getBits(5)
                    if (v2 < 31) 6 + v2
                    else 37 + br.getBits(7)
                  }
                }
              // Lblock update
              while (br.getBit() == 1) st.lblock += 1
              // one codeword segment (code-block style 0)
              val lenBits = st.lblock + (31 - Integer.numberOfLeadingZeros(np))
              val bodyLen = br.getBits(lenBits)
              st.npasses += np
              bodies += ((st, bodyLen))
            }
          }
        }
      }
      pos = br.alignEnd()
      // EPH marker after header
      if (cod.useEph && pos + 1 < cs.length &&
        (cs(pos) & 0xff) == 0xff && (cs(pos + 1) & 0xff) == 0x92) pos += 2
      for ((st, bodyLen) <- bodies.result()) {
        st.segments += ((pos, pos + bodyLen))
        pos += bodyLen
      }
    }

    // progression iteration
    val maxRes = cod.nLevels + 1
    cod.prog match {
      case 0 => // LRCP
        for (l <- 0 until cod.nLayers; r <- 0 until maxRes; c <- 0 until nc;
             p <- 0 until resPerComp(c)(r).nPrecincts)
          onePacket(c, r, p, l)
      case 1 => // RLCP
        for (r <- 0 until maxRes; l <- 0 until cod.nLayers; c <- 0 until nc;
             p <- 0 until resPerComp(c)(r).nPrecincts)
          onePacket(c, r, p, l)
      case 2 => // RPCL (identical precinct grids across comps: no subsampling)
        for (r <- 0 until maxRes; p <- 0 until resPerComp(0)(r).nPrecincts;
             c <- 0 until nc; l <- 0 until cod.nLayers)
          onePacket(c, r, p, l)
      case o => throw new IllegalArgumentException(s"jp2: progression $o")
    }

    // assemble decoded blocks
    val out = Vector.newBuilder[DecodedBlock]
    for (((c, r, p, bi, cbx, cby), st) <- states if st.included) {
      val res = resPerComp(c)(r)
      val band = res.bands(bi)
      val pi = p % res.npx; val pj = p / res.npx
      val (_, _, blocks) = precinctBlocks(res, band, pi, pj, cod)
      val geom = blocks.find(g => g.cbx == cbx && g.cby == cby).get
      // Mb = guard + ε_b − 1 (E.1); numbps = Mb − missing
      val eps = bandExponent(csData.qcd, cod.nLevels, band)
      val mb = csData.qcd.guard + eps - 1
      out += DecodedBlock(c, band, geom, mb - st.missingBp, st.npasses,
        st.segments.result())
    }
    out.result()
  }

  /** Subband (ε, μ) lookup. QCD entry order: LL, then per resolution r=1..N
    * the HL, LH, HH triplet (B.12 / E.1).
    */
  def bandQcdIndex(nLevels: Int, band: Band): Int =
    if (band.orient == 0) 0
    else {
      val r = nLevels - band.lev + 1
      1 + 3 * (r - 1) + (band.orient - 1)
    }

  def bandExponent(qcd: Qcd, nLevels: Int, band: Band): Int = qcd.style match {
    case 1 => // derived: ε_b = ε_0 − N + n_b  (E.1.1), n_b = decomposition count = lev
      qcd.exps(0) - nLevels + band.lev
    case _ =>
      qcd.exps(math.min(bandQcdIndex(nLevels, band), qcd.exps.length - 1))
  }

  def bandMantissa(qcd: Qcd, nLevels: Int, band: Band): Int = qcd.style match {
    case 0 => 0
    case 1 => qcd.mants(0)
    case _ => qcd.mants(math.min(bandQcdIndex(nLevels, band), qcd.mants.length - 1))
  }

  /** Gain exponent log2 of subband (E.1): LL 0, HL/LH 1, HH 2. */
  def bandGain(orient: Int): Int = orient match {
    case 0 => 0; case 3 => 2; case _ => 1
  }
}
