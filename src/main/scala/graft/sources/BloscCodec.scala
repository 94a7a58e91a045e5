package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** c-blosc (Blosc1) container codec — zarr-python's DEFAULT chunk compressor
  * (numcodecs `Blosc(cname='lz4', clevel=5, shuffle=SHUFFLE)`), so a Zarr
  * store written by the reference (`xcube/core/dsio.py:411-533` → `to_zarr`
  * with default encoding) arrives blosc-framed. Implemented from the public
  * container format (c-blosc `README_HEADER.rst` + the blosc.c block layout):
  *
  * {{{
  * byte 0      version            byte 1   versionlz
  * byte 2      flags: 0x1 byte-shuffle | 0x2 memcpy | 0x4 bit-shuffle |
  *                    0x10 dont-split | bits 5-7 inner codec id
  * byte 3      typesize
  * bytes 4-15  nbytes, blocksize, cbytes (little-endian int32 each)
  * then        int32 bstarts[nblocks] (absolute frame offsets), unless memcpy
  * each block  one stream per byte-plane when split, else one stream;
  *             each stream = int32 csize + payload (csize == plain size
  *             means the stream is stored raw)
  * }}}
  *
  * Inner codecs: lz4/lz4hc (lz4-java), zstd (zstd-jni), zlib (java.util.zip),
  * snappy (snappy-java) — all already on the Spark classpath. blosclz (the
  * c-blosc-internal LZ77) and bit-shuffle are rejected with a clear message;
  * zarr-python's defaults never emit either unless asked to.
  *
  * The byte-shuffle filter groups the k-th byte of every element together
  * per block (transpose of the element×typesize matrix), which is what makes
  * little-endian float chunks compress; the trailing `len % typesize` bytes
  * are stored unshuffled, mirroring c-blosc's shuffle-generic.c.
  */
object BloscCodec {

  private val DoShuffle = 0x1
  private val Memcpyed = 0x2
  private val DoBitShuffle = 0x4
  private val DontSplit = 0x10

  private val codecNames = Map(0 -> "blosclz", 1 -> "lz4", 2 -> "snappy", 3 -> "zlib", 4 -> "zstd")
  private val codecIds = Map("blosclz" -> 0, "lz4" -> 1, "lz4hc" -> 1, "snappy" -> 2, "zlib" -> 3, "zstd" -> 4)

  // ----------------------------------------------------------- decompress

  /** Decode one complete blosc frame to its plain bytes. */
  def decompress(frame: Array[Byte]): Array[Byte] = {
    require(frame.length >= 16, s"blosc frame truncated (${frame.length} bytes)")
    val b = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    val flags = frame(2) & 0xff
    val typesize = math.max(frame(3) & 0xff, 1)
    val nbytes = b.getInt(4)
    val blocksize = b.getInt(8)
    val cbytes = b.getInt(12)
    require(nbytes >= 0 && cbytes >= 16 && cbytes <= frame.length,
      s"blosc header corrupt: nbytes=$nbytes cbytes=$cbytes frame=${frame.length}")
    if (nbytes == 0) return Array.emptyByteArray
    if ((flags & Memcpyed) != 0) {
      require(cbytes == nbytes + 16, s"memcpy frame size mismatch")
      return java.util.Arrays.copyOfRange(frame, 16, 16 + nbytes)
    }
    require((flags & DoBitShuffle) == 0,
      "blosc bit-shuffle filter not supported (byte-shuffle and none are)")
    val codec = (flags >> 5) & 0x7
    require(codec != 0, "blosc inner codec 'blosclz' not supported — " +
      "write with cname lz4/zstd/zlib (zarr-python: Blosc(cname='lz4'))")
    require(blocksize > 0, s"blosc blocksize $blocksize")
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val dontSplit = (flags & DontSplit) != 0
    val out = new Array[Byte](nbytes)
    var j = 0
    while (j < nblocks) {
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val leftover = bsize != blocksize
      val nstreams = if (dontSplit || leftover || typesize == 1) 1 else typesize
      val neblock = bsize / nstreams
      var p = b.getInt(16 + 4 * j) // absolute bstart of this block
      val block = new Array[Byte](bsize)
      var w = 0
      var s = 0
      while (s < nstreams) {
        // the last split stream absorbs bsize % typesize (c-blosc keeps
        // blocksize a typesize multiple, so this is normally exact)
        val plain = if (s == nstreams - 1) bsize - w else neblock
        val csize = b.getInt(p); p += 4
        require(csize >= 0 && p + csize <= frame.length,
          s"blosc stream overruns frame (csize=$csize at $p)")
        if (csize == plain) System.arraycopy(frame, p, block, w, plain)
        else {
          val n = innerDecompress(codec, frame, p, csize, block, w, plain)
          require(n == plain, s"blosc stream decoded $n of $plain bytes")
        }
        p += csize; w += plain
        s += 1
      }
      val plain =
        if ((flags & DoShuffle) != 0 && typesize > 1) unshuffle(block, typesize)
        else block
      System.arraycopy(plain, 0, out, j * blocksize, bsize)
      j += 1
    }
    out
  }

  // ------------------------------------------------------------- compress

  /** Encode `data` as one blosc frame. Split mode is always "don't split"
    * (one stream per block, flag 0x10 set) — simpler and every conformant
    * reader honors the flag. Falls back to a memcpy frame when compression
    * does not pay, like c-blosc.
    */
  def compress(data: Array[Byte], typesize: Int, cname: String,
               clevel: Int = 5, shuffle: Boolean = true,
               blocksizeHint: Int = 0): Array[Byte] = {
    val codec = codecIds.getOrElse(cname,
      throw new IllegalArgumentException(s"blosc cname '$cname' (use lz4/lz4hc/zstd/zlib/snappy)"))
    require(codec != 0, "blosclz encode unsupported")
    val ts = math.max(1, math.min(typesize, 255))
    val nbytes = data.length
    def memcpyFrame: Array[Byte] = {
      val out = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      out.put(2.toByte).put(1.toByte)
        .put((Memcpyed | (codec << 5)).toByte).put(ts.toByte)
        .putInt(nbytes).putInt(math.max(nbytes, 1)).putInt(16 + nbytes)
      out.put(data)
      out.array()
    }
    if (nbytes == 0) return memcpyFrame
    // block size: a multiple of typesize near 256 KiB (fits L2, bounds the
    // per-task scratch), never larger than the payload
    val bs0 = math.min(if (blocksizeHint > 0) blocksizeHint else 256 * 1024, nbytes)
    val blocksize = math.max(ts, bs0 - bs0 % ts)
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val doShuffle = shuffle && ts > 1
    // a stream whose compressed form does not beat the plain block is
    // stored raw — raw means the FILTERED bytes, since the reader
    // unshuffles every block when the frame-level shuffle flag is set
    // (csize == plain size is the reader's raw-stream marker)
    val streamBytes: Seq[(Int, Array[Byte])] = (0 until nblocks).map { j =>
      val bsize = math.min(blocksize, nbytes - j * blocksize)
      val block = java.util.Arrays.copyOfRange(data, j * blocksize, j * blocksize + bsize)
      val filtered = if (doShuffle) shuffleBytes(block, ts) else block
      val comp = innerCompress(codec, filtered, clevel)
      if (comp.length >= bsize) (bsize, filtered) else (comp.length, comp)
    }
    val cbytes = 16 + 4 * nblocks + streamBytes.map(4 + _._1).sum
    if (cbytes >= 16 + nbytes) return memcpyFrame
    val out = ByteBuffer.allocate(cbytes).order(ByteOrder.LITTLE_ENDIAN)
    val flags = (if (doShuffle) DoShuffle else 0) | DontSplit | (codec << 5)
    out.put(2.toByte).put(1.toByte).put(flags.toByte).put(ts.toByte)
      .putInt(nbytes).putInt(blocksize).putInt(cbytes)
    var bstart = 16 + 4 * nblocks
    streamBytes.foreach { case (len, _) => out.putInt(bstart); bstart += 4 + len }
    streamBytes.foreach { case (len, payload) =>
      out.putInt(len); out.put(payload, 0, len)
    }
    out.array()
  }

  // ----------------------------------------------------------- internals

  private def innerDecompress(codec: Int, src: Array[Byte], off: Int, len: Int,
                              dst: Array[Byte], dstOff: Int, plain: Int): Int =
    codec match {
      case 1 => // lz4 / lz4hc share the block format
        net.jpountz.lz4.LZ4Factory.fastestInstance().safeDecompressor()
          .decompress(src, off, len, dst, dstOff)
      case 2 =>
        org.xerial.snappy.Snappy.uncompress(src, off, len, dst, dstOff)
      case 3 =>
        val inf = new java.util.zip.Inflater()
        inf.setInput(src, off, len)
        var w = dstOff
        var made = -1
        while (!inf.finished() && made != 0 && w < dstOff + plain) {
          made = inf.inflate(dst, w, dstOff + plain - w)
          w += made
        }
        val ok = inf.finished()
        inf.end()
        require(ok, "truncated zlib stream in blosc block")
        w - dstOff
      case 4 =>
        com.github.luben.zstd.Zstd.decompressByteArray(
          dst, dstOff, plain, src, off, len).toInt
      case other =>
        throw new IllegalArgumentException(
          s"blosc inner codec '${codecNames.getOrElse(other, other.toString)}' unsupported")
    }

  private def innerCompress(codec: Int, block: Array[Byte], clevel: Int): Array[Byte] =
    codec match {
      case 1 =>
        val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
        val out = new Array[Byte](c.maxCompressedLength(block.length))
        val n = c.compress(block, 0, block.length, out, 0, out.length)
        java.util.Arrays.copyOf(out, n)
      case 2 => org.xerial.snappy.Snappy.compress(block)
      case 3 =>
        val d = new java.util.zip.Deflater(math.min(math.max(clevel, 1), 9))
        d.setInput(block); d.finish()
        val bos = new java.io.ByteArrayOutputStream(block.length / 2 + 64)
        val buf = new Array[Byte](64 * 1024)
        while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
        d.end()
        bos.toByteArray
      case 4 => com.github.luben.zstd.Zstd.compress(block, math.min(math.max(clevel, 1), 19))
      case other => throw new IllegalArgumentException(s"blosc codec id $other")
    }

  /** Byte-shuffle: transpose elements×typesize → typesize×elements; the
    * `len % typesize` tail is copied unchanged (c-blosc shuffle-generic.c).
    */
  private[graft] def shuffleBytes(in: Array[Byte], typesize: Int): Array[Byte] = {
    val elems = in.length / typesize
    val out = new Array[Byte](in.length)
    var k = 0
    while (k < typesize) {
      var i = 0
      while (i < elems) { out(k * elems + i) = in(i * typesize + k); i += 1 }
      k += 1
    }
    System.arraycopy(in, elems * typesize, out, elems * typesize, in.length - elems * typesize)
    out
  }

  private[graft] def unshuffle(in: Array[Byte], typesize: Int): Array[Byte] = {
    val elems = in.length / typesize
    val out = new Array[Byte](in.length)
    var k = 0
    while (k < typesize) {
      var i = 0
      while (i < elems) { out(i * typesize + k) = in(k * elems + i); i += 1 }
      k += 1
    }
    System.arraycopy(in, elems * typesize, out, elems * typesize, in.length - elems * typesize)
    out
  }
}
