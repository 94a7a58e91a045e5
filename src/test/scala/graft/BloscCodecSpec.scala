package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BloscCodec
import java.nio.{ByteBuffer, ByteOrder}

/** BloscCodec against the documented c-blosc container layout: header field
  * byte positions, flag bits, bstarts offsets, raw-stream markers, memcpy
  * fallback — plus seeded round-trips over codecs × typesizes × shuffle ×
  * block counts and hand-built frames exercising decoder paths our writer
  * never emits (split streams, per-stream raw fallback).
  */
class BloscCodecSpec extends AnyFunSuite {

  private def header(frame: Array[Byte]) = {
    val b = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    (frame(0) & 0xff, frame(2) & 0xff, frame(3) & 0xff,
      b.getInt(4), b.getInt(8), b.getInt(12))
  }

  test("header byte layout matches the documented format") {
    val data = Array.tabulate(1000 * 8)(i => (i % 251).toByte)
    val frame = BloscCodec.compress(data, typesize = 8, cname = "lz4")
    val (_, flags, ts, nbytes, blocksize, cbytes) = header(frame)
    assert(ts == 8 && nbytes == data.length && cbytes == frame.length)
    assert((flags & 0x1) != 0, "shuffle flag")
    assert((flags & 0x10) != 0, "dont-split flag")
    assert(((flags >> 5) & 0x7) == 1, "lz4 codec id")
    assert(blocksize > 0 && blocksize % 8 == 0)
    // first bstart points just past the bstarts table
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val b = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    assert(b.getInt(16) == 16 + 4 * nblocks)
  }

  test("codec ids: zstd=4, zlib=3, snappy=2 in flag bits 5-7") {
    for ((cname, id) <- Seq("zstd" -> 4, "zlib" -> 3, "snappy" -> 2)) {
      val f = BloscCodec.compress(Array.fill(4096)(7.toByte), 4, cname)
      assert(((header(f)._2 >> 5) & 0x7) == id, cname)
    }
  }

  test("incompressible input falls back to a memcpy frame") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(4096)(rnd.nextInt().toByte)
    val frame = BloscCodec.compress(data, typesize = 1, cname = "lz4", shuffle = false)
    val (_, flags, _, nbytes, _, cbytes) = header(frame)
    assert((flags & 0x2) != 0, "memcpy flag")
    assert(cbytes == nbytes + 16 && frame.length == nbytes + 16)
    assert(BloscCodec.decompress(frame).sameElements(data))
  }

  test("round-trips: codecs x typesizes x shuffle x sizes (seeded)") {
    val rnd = new scala.util.Random(42)
    for {
      cname <- Seq("lz4", "zstd", "zlib", "snappy")
      typesize <- Seq(1, 2, 4, 8)
      shuffle <- Seq(true, false)
      // sizes: sub-block, exact multi-block, ragged tail, tail not a
      // typesize multiple
      n <- Seq(0, 1, typesize * 1000, 256 * 1024 * 2, 256 * 1024 + 12345, 8193)
    } {
      // mildly compressible: low-entropy high bytes after shuffle
      val data = Array.tabulate(n)(i => ((i / typesize) % 17 + (i % typesize) * 16).toByte)
      val frame = BloscCodec.compress(data, typesize, cname, shuffle = shuffle)
      val back = BloscCodec.decompress(frame)
      assert(back.sameElements(data), s"$cname ts=$typesize sh=$shuffle n=$n")
      // random payloads too (mostly memcpy path, still must round-trip)
      val rdata = Array.fill(n)(rnd.nextInt().toByte)
      val rframe = BloscCodec.compress(rdata, typesize, cname, shuffle = shuffle)
      assert(BloscCodec.decompress(rframe).sameElements(rdata),
        s"random $cname ts=$typesize sh=$shuffle n=$n")
    }
  }

  test("shuffle/unshuffle transpose byte planes and keep the ragged tail") {
    val in = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10) // typesize 4 → tail 9,10
    val sh = BloscCodec.shuffleBytes(in, 4)
    assert(sh.sameElements(Array[Byte](1, 5, 2, 6, 3, 7, 4, 8, 9, 10)))
    assert(BloscCodec.unshuffle(sh, 4).sameElements(in))
  }

  test("decoder handles SPLIT frames (one stream per byte plane)") {
    // hand-build what c-blosc emits without the dont-split flag:
    // 8 int32 elements, typesize 4, shuffle, zlib inner codec, one block
    val elems = 8
    val plain = ByteBuffer.allocate(elems * 4).order(ByteOrder.LITTLE_ENDIAN)
    (0 until elems).foreach(i => plain.putInt(i * 1000))
    val data = plain.array()
    val shuffled = BloscCodec.shuffleBytes(data, 4)
    // each of the 4 byte-planes is its own stream, stored RAW here
    // (csize == neblock marks a raw stream)
    val neblock = elems
    val streams = (0 until 4).map(k =>
      java.util.Arrays.copyOfRange(shuffled, k * neblock, (k + 1) * neblock))
    val bstart = 16 + 4 // one block
    val total = bstart + streams.map(4 + _.length).sum
    val f = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    f.put(2.toByte).put(1.toByte)
      .put((0x1 | (3 << 5)).toByte) // shuffle, split allowed, zlib
      .put(4.toByte)
      .putInt(data.length).putInt(data.length).putInt(total)
    f.putInt(bstart)
    streams.foreach { s => f.putInt(s.length); f.put(s) }
    assert(BloscCodec.decompress(f.array()).sameElements(data))
  }

  test("rejects blosclz and bit-shuffle frames with clear messages") {
    val f = BloscCodec.compress(Array.fill(64)(1.toByte), 8, "lz4")
    val blosclz = f.clone(); blosclz(2) = (blosclz(2) & 0x1f).toByte // codec 0
    val e1 = intercept[IllegalArgumentException](BloscCodec.decompress(blosclz))
    assert(e1.getMessage.contains("blosclz"))
    val bitshuf = f.clone(); bitshuf(2) = (bitshuf(2) | 0x4).toByte
    val e2 = intercept[IllegalArgumentException](BloscCodec.decompress(bitshuf))
    assert(e2.getMessage.contains("bit-shuffle"))
  }

  test("truncated and corrupt frames fail loudly, not with garbage") {
    val f = BloscCodec.compress(Array.tabulate(10000)(_.toByte), 8, "zstd")
    intercept[IllegalArgumentException](BloscCodec.decompress(f.take(10)))
    intercept[IllegalArgumentException](BloscCodec.decompress(f.take(40)))
  }
}
