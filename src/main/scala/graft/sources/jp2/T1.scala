package graft.sources.jp2

/** EBCOT Tier-1 code-block coder (T.800 Annex D): bitplane coding of
  * sign-magnitude wavelet coefficients in three passes per plane
  * (significance propagation, magnitude refinement, cleanup) driven by the
  * MQ coder. Both directions are implemented so lossless round-trips are
  * property-testable offline; the decoder additionally honours truncated
  * pass counts (lossy layers) as found in real granules.
  *
  * Code-block style 0 only (no bypass/reset/termall/causal/segsym): one MQ
  * codeword segment spans all passes — the style every granule this library
  * targets uses (verified on the reference demo .jp2 files).
  */
private[graft] object T1 {

  // context indices
  private final val ZC0 = 0 // ..8
  private final val SC0 = 9 // ..13
  private final val MR0 = 14 // ..16
  private final val UNI = 17
  private final val RL = 18
  final val NumCtx = 19

  def freshStates(): Array[Int] = {
    val st = new Array[Int](NumCtx)
    st(ZC0) = 4 << 1 // T.800 Table D.7 initial index 4
    st(RL) = 3 << 1 // initial index 3
    st(UNI) = 46 << 1 // initial index 46
    st
  }

  /** ZC context from neighbor significance counts; band: 0=LL 1=HL 2=LH 3=HH. */
  private def zcCtx(h0: Int, v0: Int, d: Int, band: Int): Int = {
    // HL is the transpose of the LL/LH table (OpenJPEG generates its LUT
    // the same way from the public Table D.1)
    val (h, v) = if (band == 1) (v0, h0) else (h0, v0)
    if (band == 3) {
      if (d >= 3) 8
      else if (d == 2) { if (h + v >= 1) 7 else 6 }
      else if (d == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (d >= 1) 6 else 5 }
      else { // h == 0
        if (v == 2) 4 else if (v == 1) 3 else if (d >= 2) 2 else if (d == 1) 1 else 0
      }
    }
  }

  /** SC context and XOR bit from clamped sign contributions (Table D.3). */
  private def scCtx(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1)   => (SC0 + 4, 0)
    case (1, 0)   => (SC0 + 3, 0)
    case (1, -1)  => (SC0 + 2, 0)
    case (0, 1)   => (SC0 + 1, 0)
    case (0, 0)   => (SC0, 0)
    case (0, -1)  => (SC0 + 1, 1)
    case (-1, 1)  => (SC0 + 2, 1)
    case (-1, 0)  => (SC0 + 3, 1)
    case (-1, -1) => (SC0 + 4, 1)
    case _        => throw new IllegalStateException(s"sc($hc,$vc)")
  }

  /** Shared per-block coding state + neighborhood queries. */
  private final class Grid(val w: Int, val h: Int) {
    val sig = new Array[Boolean](w * h)
    val vis = new Array[Boolean](w * h)
    val ref = new Array[Boolean](w * h) // refined at least once
    val neg = new Array[Boolean](w * h)
    val mag = new Array[Int](w * h)

    @inline def s(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0 else if (sig(y * w + x)) 1 else 0
    @inline def sgnc(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h || !sig(y * w + x)) 0
      else if (neg(y * w + x)) -1 else 1

    def counts(x: Int, y: Int): (Int, Int, Int) = {
      val hh = s(x - 1, y) + s(x + 1, y)
      val vv = s(x, y - 1) + s(x, y + 1)
      val dd = s(x - 1, y - 1) + s(x + 1, y - 1) + s(x - 1, y + 1) + s(x + 1, y + 1)
      (hh, vv, dd)
    }

    def signCtx(x: Int, y: Int): (Int, Int) = {
      val hc = math.max(-1, math.min(1, sgnc(x - 1, y) + sgnc(x + 1, y)))
      val vc = math.max(-1, math.min(1, sgnc(x, y - 1) + sgnc(x, y + 1)))
      scCtx(hc, vc)
    }
  }

  /** Encode a code-block of signed integer coefficients. Returns
    * (numbps, npasses, segment bytes); numbps = 0 ⇒ empty block (no bytes).
    */
  def encode(coef: Array[Int], w: Int, h: Int, band: Int): (Int, Int, Array[Byte]) = {
    var maxMag = 0
    var i = 0
    while (i < coef.length) { val m = math.abs(coef(i)); if (m > maxMag) maxMag = m; i += 1 }
    if (maxMag == 0) return (0, 0, Array.emptyByteArray)
    val numbps = 32 - Integer.numberOfLeadingZeros(maxMag)
    val g = new Grid(w, h)
    i = 0
    while (i < coef.length) {
      g.mag(i) = math.abs(coef(i)); g.neg(i) = coef(i) < 0; i += 1
    }
    val mq = new MqEncoder
    val st = freshStates()

    def signBit(idx: Int): Int = if (g.neg(idx)) 1 else 0

    def codeSign(x: Int, y: Int): Unit = {
      val (cx, xr) = g.signCtx(x, y)
      mq.encode(st, cx, signBit(y * w + x) ^ xr)
    }

    def spp(p: Int): Unit = {
      var k0 = 0
      while (k0 < h) {
        var x = 0
        while (x < w) {
          var y = k0
          val yEnd = math.min(k0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if (!g.sig(idx)) {
              val (hh, vv, dd) = g.counts(x, y)
              if (hh + vv + dd > 0) {
                val bit = (g.mag(idx) >>> p) & 1
                mq.encode(st, ZC0 + zcCtx(hh, vv, dd, band), bit)
                if (bit == 1) { g.sig(idx) = true; codeSign(x, y) }
                g.vis(idx) = true
              }
            }
            y += 1
          }
          x += 1
        }
        k0 += 4
      }
    }

    def mrp(p: Int): Unit = {
      var k0 = 0
      while (k0 < h) {
        var x = 0
        while (x < w) {
          var y = k0
          val yEnd = math.min(k0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if (g.sig(idx) && !g.vis(idx)) {
              val cx =
                if (!g.ref(idx)) {
                  val (hh, vv, dd) = g.counts(x, y)
                  if (hh + vv + dd > 0) MR0 + 1 else MR0
                } else MR0 + 2
              mq.encode(st, cx, (g.mag(idx) >>> p) & 1)
              g.ref(idx) = true
            }
            y += 1
          }
          x += 1
        }
        k0 += 4
      }
    }

    def cup(p: Int): Unit = {
      var k0 = 0
      while (k0 < h) {
        var x = 0
        while (x < w) {
          val full = k0 + 3 < h
          var rlOk = full
          if (full) {
            var j = 0
            while (rlOk && j < 4) {
              val y = k0 + j; val idx = y * w + x
              if (g.sig(idx) || g.vis(idx)) rlOk = false
              else {
                val (hh, vv, dd) = g.counts(x, y)
                if (hh + vv + dd > 0) rlOk = false
              }
              j += 1
            }
          }
          var yStart = k0
          if (rlOk) {
            var r = -1
            var j = 0
            while (r < 0 && j < 4) {
              if (((g.mag((k0 + j) * w + x) >>> p) & 1) == 1) r = j
              j += 1
            }
            if (r < 0) { mq.encode(st, RL, 0); yStart = k0 + 4 }
            else {
              mq.encode(st, RL, 1)
              mq.encode(st, UNI, (r >>> 1) & 1)
              mq.encode(st, UNI, r & 1)
              val y = k0 + r; val idx = y * w + x
              g.sig(idx) = true
              codeSign(x, y)
              yStart = y + 1
            }
          }
          var y = yStart
          val yEnd = math.min(k0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if (!g.sig(idx) && !g.vis(idx)) {
              val (hh, vv, dd) = g.counts(x, y)
              val bit = (g.mag(idx) >>> p) & 1
              mq.encode(st, ZC0 + zcCtx(hh, vv, dd, band), bit)
              if (bit == 1) { g.sig(idx) = true; codeSign(x, y) }
            }
            y += 1
          }
          x += 1
        }
        k0 += 4
      }
      java.util.Arrays.fill(g.vis, false)
    }

    var p = numbps - 1
    cup(p)
    p -= 1
    while (p >= 0) { spp(p); mrp(p); cup(p); p -= 1 }
    (numbps, 3 * numbps - 2, mq.finish())
  }

  /** Decode `npasses` passes of a code-block with `numbps` coded bitplanes
    * from one MQ segment; returns signed coefficients (quantization indices
    * for irreversible data). `data(from until until)` is the segment.
    */
  def decode(data: Array[Byte], from: Int, until: Int, w: Int, h: Int,
             band: Int, numbps: Int, npasses: Int,
             lastPlane: Array[Int] = null): Array[Int] = {
    val out = new Array[Int](w * h)
    if (numbps <= 0 || npasses <= 0) return out
    @inline def touch(idx: Int, p: Int): Unit =
      if (lastPlane != null) lastPlane(idx) = p
    val g = new Grid(w, h)
    val mq = new MqDecoder(data, from, until)
    val st = freshStates()
    var passesLeft = npasses

    def decSign(x: Int, y: Int): Unit = {
      val (cx, xr) = g.signCtx(x, y)
      g.neg(y * w + x) = (mq.decode(st, cx) ^ xr) == 1
    }

    def spp(p: Int): Unit = {
      var k0 = 0
      while (k0 < h) {
        var x = 0
        while (x < w) {
          var y = k0
          val yEnd = math.min(k0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if (!g.sig(idx)) {
              val (hh, vv, dd) = g.counts(x, y)
              if (hh + vv + dd > 0) {
                if (mq.decode(st, ZC0 + zcCtx(hh, vv, dd, band)) == 1) {
                  g.sig(idx) = true; g.mag(idx) |= 1 << p; decSign(x, y)
                }
                g.vis(idx) = true
                touch(idx, p)
              }
            }
            y += 1
          }
          x += 1
        }
        k0 += 4
      }
    }

    def mrp(p: Int): Unit = {
      var k0 = 0
      while (k0 < h) {
        var x = 0
        while (x < w) {
          var y = k0
          val yEnd = math.min(k0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if (g.sig(idx) && !g.vis(idx)) {
              val cx =
                if (!g.ref(idx)) {
                  val (hh, vv, dd) = g.counts(x, y)
                  if (hh + vv + dd > 0) MR0 + 1 else MR0
                } else MR0 + 2
              g.mag(idx) |= mq.decode(st, cx) << p
              g.ref(idx) = true
              touch(idx, p)
            }
            y += 1
          }
          x += 1
        }
        k0 += 4
      }
    }

    def cup(p: Int): Unit = {
      var k0 = 0
      while (k0 < h) {
        var x = 0
        while (x < w) {
          val full = k0 + 3 < h
          var rlOk = full
          if (full) {
            var j = 0
            while (rlOk && j < 4) {
              val y = k0 + j; val idx = y * w + x
              if (g.sig(idx) || g.vis(idx)) rlOk = false
              else {
                val (hh, vv, dd) = g.counts(x, y)
                if (hh + vv + dd > 0) rlOk = false
              }
              j += 1
            }
          }
          var yStart = k0
          if (rlOk) {
            if (mq.decode(st, RL) == 0) {
              var j2 = 0
              while (j2 < 4) { touch((k0 + j2) * w + x, p); j2 += 1 }
              yStart = k0 + 4
            } else {
              val r = (mq.decode(st, UNI) << 1) | mq.decode(st, UNI)
              val y = k0 + r; val idx = y * w + x
              g.sig(idx) = true; g.mag(idx) |= 1 << p; decSign(x, y)
              var j2 = 0
              while (j2 <= r) { touch((k0 + j2) * w + x, p); j2 += 1 }
              yStart = y + 1
            }
          }
          var y = yStart
          val yEnd = math.min(k0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if (!g.sig(idx) && !g.vis(idx)) {
              val (hh, vv, dd) = g.counts(x, y)
              if (mq.decode(st, ZC0 + zcCtx(hh, vv, dd, band)) == 1) {
                g.sig(idx) = true; g.mag(idx) |= 1 << p; decSign(x, y)
              }
              touch(idx, p)
            }
            y += 1
          }
          x += 1
        }
        k0 += 4
      }
      java.util.Arrays.fill(g.vis, false)
    }

    if (lastPlane != null) java.util.Arrays.fill(lastPlane, numbps - 1)
    var p = numbps - 1
    cup(p); passesLeft -= 1
    p -= 1
    while (p >= 0 && passesLeft > 0) {
      spp(p); passesLeft -= 1
      if (passesLeft > 0) { mrp(p); passesLeft -= 1 }
      if (passesLeft > 0) { cup(p); passesLeft -= 1 }
      p -= 1
    }
    var i = 0
    while (i < out.length) {
      out(i) = if (g.neg(i)) -g.mag(i) else g.mag(i)
      i += 1
    }
    out
  }
}
