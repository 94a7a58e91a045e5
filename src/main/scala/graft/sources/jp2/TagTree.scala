package graft.sources.jp2

/** Tag tree (T.800 B.10.2): a quad-tree over a w×h grid where every
  * internal node holds the minimum of its children; leaf values are coded
  * incrementally against rising thresholds. Used in packet headers for
  * code-block inclusion (value = first layer the block contributes to) and
  * missing-bitplane counts.
  *
  * Per-node coding protocol (both directions): given the running lower
  * bound `low` inherited from the parent, a node at state `s`
  * (s = max(own state, low)) emits `0` for every level it exceeds and a
  * single `1` exactly when the level equals its value; emission stops early
  * once `threshold` is reached (the decoder then only learns value ≥
  * threshold).
  */
private[graft] final class TagTree(val w: Int, val h: Int) {
  private val dims: Array[(Int, Int)] = {
    val b = Array.newBuilder[(Int, Int)]
    var cw = w; var ch = h
    b += ((cw, ch))
    while (cw > 1 || ch > 1) { cw = (cw + 1) / 2; ch = (ch + 1) / 2; b += ((cw, ch)) }
    b.result()
  }
  val levels: Int = dims.length
  private val value: Array[Array[Int]] = dims.map { case (cw, ch) => new Array[Int](cw * ch) }
  private val state: Array[Array[Int]] = dims.map { case (cw, ch) => new Array[Int](cw * ch) }
  private val known: Array[Array[Boolean]] = dims.map { case (cw, ch) => new Array[Boolean](cw * ch) }

  def reset(): Unit = {
    value.foreach(java.util.Arrays.fill(_, 0))
    state.foreach(java.util.Arrays.fill(_, 0))
    known.foreach(java.util.Arrays.fill(_, false))
  }

  def setLeaf(x: Int, y: Int, v: Int): Unit = value(0)(y * w + x) = v

  /** Encoder side: fold leaf values up into internal minima and clear the
    * per-node emission states. Call after all setLeaf, before encode().
    */
  def build(): Unit = {
    var l = 1
    while (l < levels) {
      val (pw, ph) = dims(l); val (cw, ch) = dims(l - 1)
      var yy = 0
      while (yy < ph) {
        var xx = 0
        while (xx < pw) {
          var m = Int.MaxValue
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val cy = yy * 2 + dy; val cx = xx * 2 + dx
              if (cx < cw && cy < ch) m = math.min(m, value(l - 1)(cy * cw + cx))
              dx += 1
            }
            dy += 1
          }
          value(l)(yy * pw + xx) = m
          xx += 1
        }
        yy += 1
      }
      l += 1
    }
    state.foreach(java.util.Arrays.fill(_, 0))
    known.foreach(java.util.Arrays.fill(_, false))
  }

  /** Encode knowledge about leaf (x,y) up to `threshold`. */
  def encode(bw: BitWriter, x: Int, y: Int, threshold: Int): Unit = {
    var low = 0
    var l = levels - 1
    while (l >= 0) {
      val cw = dims(l)._1
      val idx = (y >> l) * cw + (x >> l)
      var s = math.max(state(l)(idx), low)
      val v = value(l)(idx)
      while (!known(l)(idx) && s < threshold) {
        if (s < v) { bw.putBit(0); s += 1 }
        else { bw.putBit(1); known(l)(idx) = true }
      }
      state(l)(idx) = s
      if (!known(l)(idx)) return // decoder stops here too (value ≥ threshold)
      low = v
      l -= 1
    }
  }

  /** Decode: true iff leaf (x,y) value is known and < threshold. After a
    * `true` return, leafValue(x,y) is the exact value.
    */
  def decode(br: BitReader, x: Int, y: Int, threshold: Int): Boolean = {
    var low = 0
    var l = levels - 1
    while (l >= 0) {
      val cw = dims(l)._1
      val idx = (y >> l) * cw + (x >> l)
      var s = math.max(state(l)(idx), low)
      while (!known(l)(idx) && s < threshold) {
        if (br.getBit() == 1) { value(l)(idx) = s; known(l)(idx) = true }
        else s += 1
      }
      state(l)(idx) = s
      if (!known(l)(idx)) { state(l)(idx) = s; return false }
      low = value(l)(idx)
      l -= 1
    }
    value(0)(y * w + x) < threshold
  }

  def leafValue(x: Int, y: Int): Int = value(0)(y * w + x)
  def leafKnown(x: Int, y: Int): Boolean = known(0)(y * w + x)
}
