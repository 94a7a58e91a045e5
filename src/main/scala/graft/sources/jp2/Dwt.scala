package graft.sources.jp2

/** Discrete wavelet transforms of JPEG 2000 Part 1 (T.800 Annex F):
  * reversible 5/3 integer lifting (lossless) and irreversible 9/7 float
  * lifting (lossy). Signals live in tile-component coordinates, so boundary
  * parity follows the GLOBAL index (low-pass samples sit at even
  * coordinates), with whole-sample symmetric extension at region edges.
  *
  * Convention: forward = rows then columns; inverse = columns then rows
  * (exact mirror, property-tested to identity for 5/3; the 9/7 steps are
  * linear so the order only affects float rounding noise).
  */
private[graft] object Dwt {

  /** 1D inverse 5/3 on interleaved samples of global range [i0, i1).
    * `get`/`set` address global coordinates.
    */
  private def inv53Line(i0: Int, i1: Int, get: Int => Int, set: (Int, Int) => Unit): Unit = {
    val n = i1 - i0
    if (n <= 0) return
    if (n == 1) {
      // single-sample signal: even coord passes through, odd is scaled (F.4.4.2)
      if ((i0 & 1) == 1) set(i0, get(i0) >> 1)
      return
    }
    val buf = new Array[Int](n)
    var i = i0
    while (i < i1) { buf(i - i0) = get(i); i += 1 }
    @inline def ext(i: Int): Int = {
      // whole-sample symmetric extension
      var j = i
      val period = 2 * (n - 1)
      var k = j - i0
      k = ((k % period) + period) % period
      if (k >= n) k = period - k
      buf(k)
    }
    val out = new Array[Int](n)
    // pass 1: even coords (low reconstruction)  x(2m) = y(2m) − floor((y(2m−1)+y(2m+1)+2)/4)
    i = i0
    while (i < i1) {
      if ((i & 1) == 0) out(i - i0) = ext(i) - ((ext(i - 1) + ext(i + 1) + 2) >> 2)
      i += 1
    }
    // pass 2: odd coords  x(2m+1) = y(2m+1) + floor((x(2m)+x(2m+2))/2)
    @inline def extOut(i: Int): Int = {
      val period = 2 * (n - 1)
      var k = ((i - i0) % period + period) % period
      if (k >= n) k = period - k
      out(k)
    }
    i = i0
    while (i < i1) {
      if ((i & 1) == 1) out(i - i0) = ext(i) + ((extOut(i - 1) + extOut(i + 1)) >> 1)
      i += 1
    }
    i = i0
    while (i < i1) { set(i, out(i - i0)); i += 1 }
  }

  /** 1D forward 5/3 (used by the writer): input spatial samples over
    * [i0,i1); output interleaved (low at even global coords).
    */
  private def fwd53Line(i0: Int, i1: Int, get: Int => Int, set: (Int, Int) => Unit): Unit = {
    val n = i1 - i0
    if (n <= 0) return
    if (n == 1) {
      if ((i0 & 1) == 1) set(i0, get(i0) << 1)
      return
    }
    val buf = new Array[Int](n)
    var i = i0
    while (i < i1) { buf(i - i0) = get(i); i += 1 }
    @inline def ext(i: Int): Int = {
      val period = 2 * (n - 1)
      var k = ((i - i0) % period + period) % period
      if (k >= n) k = period - k
      buf(k)
    }
    val out = new Array[Int](n)
    // y(2m+1) = x(2m+1) − floor((x(2m)+x(2m+2))/2)
    i = i0
    while (i < i1) {
      if ((i & 1) == 1) out(i - i0) = ext(i) - ((ext(i - 1) + ext(i + 1)) >> 1)
      i += 1
    }
    @inline def extOut(i: Int): Int = {
      val period = 2 * (n - 1)
      var k = ((i - i0) % period + period) % period
      if (k >= n) k = period - k
      out(k)
    }
    // y(2m) = x(2m) + floor((y(2m−1)+y(2m+1)+2)/4)
    i = i0
    while (i < i1) {
      if ((i & 1) == 0) out(i - i0) = ext(i) + ((extOut(i - 1) + extOut(i + 1) + 2) >> 2)
      i += 1
    }
    i = i0
    while (i < i1) { set(i, out(i - i0)); i += 1 }
  }

  // 9/7 lifting constants (T.800 Table F.4)
  private val Alpha = -1.586134342059924
  private val Beta = -0.052980118572961
  private val Gamma = 0.882911075530934
  private val Delta = 0.443506852043971
  private val K = 1.230174104914001

  /** 1D inverse 9/7 on interleaved doubles over [i0, i1). */
  private def inv97Line(i0: Int, i1: Int, get: Int => Double, set: (Int, Double) => Unit): Unit = {
    val n = i1 - i0
    if (n <= 0) return
    if (n == 1) { if ((i0 & 1) == 0) set(i0, get(i0)) else set(i0, get(i0) / K / K) ; return }
    val buf = new Array[Double](n)
    var i = i0
    while (i < i1) { buf(i - i0) = get(i); i += 1 }
    @inline def idx(i: Int): Int = {
      val period = 2 * (n - 1)
      var k = ((i - i0) % period + period) % period
      if (k >= n) k = period - k
      k
    }
    // undo scaling: low (even) were multiplied by 1/K, high (odd) by K
    i = i0
    while (i < i1) {
      if ((i & 1) == 0) buf(i - i0) *= K else buf(i - i0) *= (1.0 / K)
      i += 1
    }
    // undo update 2 (even): x(2n) −= δ(x(2n−1)+x(2n+1))
    i = i0
    while (i < i1) { if ((i & 1) == 0) buf(i - i0) -= Delta * (buf(idx(i - 1)) + buf(idx(i + 1))); i += 1 }
    // undo predict 2 (odd): x(2n+1) −= γ(x(2n)+x(2n+2))
    i = i0
    while (i < i1) { if ((i & 1) == 1) buf(i - i0) -= Gamma * (buf(idx(i - 1)) + buf(idx(i + 1))); i += 1 }
    // undo update 1 (even): −β
    i = i0
    while (i < i1) { if ((i & 1) == 0) buf(i - i0) -= Beta * (buf(idx(i - 1)) + buf(idx(i + 1))); i += 1 }
    // undo predict 1 (odd): −α
    i = i0
    while (i < i1) { if ((i & 1) == 1) buf(i - i0) -= Alpha * (buf(idx(i - 1)) + buf(idx(i + 1))); i += 1 }
    i = i0
    while (i < i1) { set(i, buf(i - i0)); i += 1 }
  }

  /** One inverse level over an interleaved rect [x0,x1)×[y0,y1) held in a
    * row-major array `a` of width (x1−x0): columns first, then rows.
    */
  def inv53Level(a: Array[Int], x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
    val w = x1 - x0
    var x = x0
    while (x < x1) {
      val cx = x - x0
      inv53Line(y0, y1, i => a((i - y0) * w + cx), (i, v) => a((i - y0) * w + cx) = v)
      x += 1
    }
    var y = y0
    while (y < y1) {
      val row = (y - y0) * w
      inv53Line(x0, x1, i => a(row + (i - x0)), (i, v) => a(row + (i - x0)) = v)
      y += 1
    }
  }

  /** One forward level (writer): rows first, then columns. */
  def fwd53Level(a: Array[Int], x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
    val w = x1 - x0
    var y = y0
    while (y < y1) {
      val row = (y - y0) * w
      fwd53Line(x0, x1, i => a(row + (i - x0)), (i, v) => a(row + (i - x0)) = v)
      y += 1
    }
    var x = x0
    while (x < x1) {
      val cx = x - x0
      fwd53Line(y0, y1, i => a((i - y0) * w + cx), (i, v) => a((i - y0) * w + cx) = v)
      x += 1
    }
  }

  def inv97Level(a: Array[Double], x0: Int, y0: Int, x1: Int, y1: Int): Unit = {
    val w = x1 - x0
    var x = x0
    while (x < x1) {
      val cx = x - x0
      inv97Line(y0, y1, i => a((i - y0) * w + cx), (i, v) => a((i - y0) * w + cx) = v)
      x += 1
    }
    var y = y0
    while (y < y1) {
      val row = (y - y0) * w
      inv97Line(x0, x1, i => a(row + (i - x0)), (i, v) => a(row + (i - x0)) = v)
      y += 1
    }
  }
}
