package graft.sources.jp2

/** MQ arithmetic coder (JPEG 2000 Part 1, ITU-T T.800 Annex C; the same
  * coder as JBIG2/T.88). The probability state machine is the public
  * Table C.2 (47 states of Qe/NMPS/NLPS/SWITCH).
  *
  * The reference (xcube) reads .jp2 via rasterio→GDAL→openjpeg
  * (`xcube/core/store/fs/impl/rasterio.py:81-330`); this is a from-spec
  * JVM implementation, not a translation of any of those.
  *
  * Contexts are caller-owned `(state, mps)` pairs packed in an Int array:
  * value = state<<1 | mps.
  */
private[graft] object MqTables {
  // Qe, NMPS, NLPS, SWITCH — T.800 Table C.2
  val Qe: Array[Int] = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  val Nmps: Array[Int] = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36,
    37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  val Nlps: Array[Int] = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15, 16,
    17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  val Switch: Array[Int] = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0)
}

/** MQ decoder over one codeword segment (T.800 C.3). */
private[graft] final class MqDecoder(data: Array[Byte], from: Int, until: Int) {
  def this(data: Array[Byte]) = this(data, 0, data.length)
  private var bp = from
  private var c: Long = 0L
  private var a: Int = 0
  private var ct = 0

  // INITDEC
  c = (byteAt(bp).toLong & 0xffL) << 16
  byteIn()
  c <<= 7; ct -= 7; a = 0x8000

  private def byteAt(i: Int): Int = if (i < until) data(i) & 0xff else 0xff

  private def byteIn(): Unit = {
    if (byteAt(bp) == 0xff) {
      if (byteAt(bp + 1) > 0x8f) { c += 0xff00L; ct = 8 }
      else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
    } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
  }

  /** Decode one bit in context `cx` (index into `states`). */
  def decode(states: Array[Int], cx: Int): Int = {
    val st = states(cx) >>> 1
    var mps = states(cx) & 1
    val qe = MqTables.Qe(st)
    a -= qe
    var d = 0
    if (((c >>> 16) & 0xffffL) < qe) {
      // LPS exchange path
      if (a < qe) { d = mps; states(cx) = (MqTables.Nmps(st) << 1) | mps }
      else {
        d = 1 - mps
        if (MqTables.Switch(st) == 1) mps = 1 - mps
        states(cx) = (MqTables.Nlps(st) << 1) | mps
      }
      a = qe
      // RENORMD
      do {
        if (ct == 0) byteIn()
        a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
      } while (a < 0x8000)
    } else {
      c -= qe.toLong << 16
      if ((a & 0x8000) == 0) {
        // MPS exchange path
        if (a < qe) {
          d = 1 - mps
          if (MqTables.Switch(st) == 1) mps = 1 - mps
          states(cx) = (MqTables.Nlps(st) << 1) | mps
        } else { d = mps; states(cx) = (MqTables.Nmps(st) << 1) | mps }
        do {
          if (ct == 0) byteIn()
          a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
        } while (a < 0x8000)
      } else d = mps
    }
    d
  }
}

/** MQ encoder producing one codeword segment (T.800 C.2). */
private[graft] final class MqEncoder {
  private val out = new scala.collection.mutable.ArrayBuffer[Byte]()
  private var a: Int = 0x8000
  private var c: Long = 0L
  private var ct: Int = 12
  private var bp: Int = -1 // index into out of byte B (C.2.3 uses B pointer)
  private var bVal: Int = -1 // current byte value at bp, -1 = none yet

  private def byteOut(): Unit = {
    if (bVal == 0xff) {
      // stuffing: next byte carries 7 bits
      emit(); bVal = ((c >>> 20) & 0xff).toInt; c &= 0xfffffL; ct = 7
    } else {
      if (c > 0x7ffffffL) {
        bVal += 1
        if (bVal == 0x100) {
          // carry propagated into a 0xff we already… cannot happen: bVal
          // was ≤ 0xfe here because the 0xff branch is handled above
          throw new IllegalStateException("mq carry overflow")
        }
        c &= 0x7ffffffL
        if (bVal == 0xff) { emit(); bVal = ((c >>> 20) & 0xff).toInt; c &= 0xfffffL; ct = 7; return }
      }
      emit(); bVal = ((c >>> 19) & 0xff).toInt; c &= 0x7ffffL; ct = 8
    }
  }

  private def emit(): Unit = if (bVal >= 0) { out += bVal.toByte; bp += 1 }

  def encode(states: Array[Int], cx: Int, bit: Int): Unit = {
    val st = states(cx) >>> 1
    var mps = states(cx) & 1
    val qe = MqTables.Qe(st)
    if (bit == mps) {
      a -= qe
      if ((a & 0x8000) == 0) {
        if (a < qe) a = qe else c += qe
        states(cx) = (MqTables.Nmps(st) << 1) | mps
        do {
          a <<= 1; c <<= 1; ct -= 1
          if (ct == 0) byteOut()
        } while ((a & 0x8000) == 0)
      } else c += qe
    } else {
      a -= qe
      if (a < qe) c += qe else a = qe
      if (MqTables.Switch(st) == 1) mps = 1 - mps
      states(cx) = (MqTables.Nlps(st) << 1) | mps
      do {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      } while ((a & 0x8000) == 0)
    }
  }

  /** FLUSH (C.2.9) and return the segment bytes. */
  def finish(): Array[Byte] = {
    // SETBITS
    val tempc = c + a
    c |= 0xffffL
    if (c >= tempc) c -= 0x8000L
    c <<= ct; byteOut()
    c <<= ct; byteOut()
    emit() // push final pending byte
    // drop trailing 0xff bytes (decoder regenerates them)
    var n = out.length
    while (n > 0 && (out(n - 1) & 0xff) == 0xff) n -= 1
    out.take(n).toArray
  }
}

/** MSB-first bit writer with JPEG 2000 packet-header bit stuffing: after an
  * aligned 0xff byte only 7 bits go in the next byte (B.10.1).
  */
private[graft] final class BitWriter {
  private val out = new scala.collection.mutable.ArrayBuffer[Byte]()
  private var cur = 0
  private var nbits = 0
  private def cap: Int = if (out.nonEmpty && (out.last & 0xff) == 0xff) 7 else 8
  def putBit(b: Int): Unit = {
    cur = (cur << 1) | (b & 1); nbits += 1
    if (nbits == cap) { out += cur.toByte; cur = 0; nbits = 0 }
  }
  def putBits(v: Int, n: Int): Unit = { var i = n - 1; while (i >= 0) { putBit((v >>> i) & 1); i -= 1 } }
  /** Pad current byte with zeros (and, per B.10.1, a stuffed 0 after 0xff). */
  def align(): Array[Byte] = {
    if (nbits > 0) { cur <<= (cap - nbits); out += cur.toByte; cur = 0; nbits = 0 }
    if (out.nonEmpty && (out.last & 0xff) == 0xff) out += 0x00.toByte
    out.toArray
  }
}

/** MSB-first bit reader with the matching bit unstuffing. */
private[graft] final class BitReader(data: Array[Byte], var pos: Int) {
  private var cur = 0
  private var nbits = 0
  private var prevFF = false
  def getBit(): Int = {
    if (nbits == 0) {
      cur = if (pos < data.length) data(pos) & 0xff else 0
      pos += 1
      nbits = if (prevFF) 7 else 8
      prevFF = cur == 0xff && nbits == 8
    }
    nbits -= 1
    (cur >>> nbits) & 1
  }
  def getBits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | getBit(); i += 1 }; v }
  /** Byte-align after header (consume stuffing byte after 0xff). */
  def alignEnd(): Int = {
    if (prevFF && nbits == 0) {
      // a 0xff was the last consumed byte: the next byte is its stuffed
      // partner only when the header ends here; B.10.1 requires the
      // stuffing 0 byte to be present — consume it
      if (pos < data.length && (data(pos) & 0xff) <= 0x7f) pos += 1
    }
    cur = 0; nbits = 0; prevFF = false
    pos
  }
}
