package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** Minimal GeoTIFF raster source — the gridded-raster ingest path the
  * reference routes through rasterio (store/fs/impl/rasterio.py:81-330,
  * which exposes an N-band raster as variables band_1..band_N). Implements
  * the public baseline TIFF 6.0 + GeoTIFF 1.1 subset that converted cube
  * rasters actually use: single- OR multi-band chunky-interleaved
  * (PlanarConfiguration 1, the default), striped OR tiled layout (tiles are
  * the COG interior organization), Compression none (1) or Deflate (8 /
  * 32946, via java.util.zip — no native lib), both byte orders, sample
  * formats uint/int 8/16/32 and float 32/64, georeferenced by
  * ModelPixelScale + ModelTiepoint. Predictors, palettes, planar (band-
  * sequential) layout and COG overview chains are out of scope for v0
  * (ingest converts them once, elsewhere).
  *
  * Scale story mirrors [[NetcdfSource]]: one raster is executor-sized;
  * an archive distributes one file per task via [[readRasterFiles]].
  */
object GeoTiffSource {

  final case class Raster(width: Int, height: Int,
                          bands: IndexedSeq[Array[Double]],
                          scaleX: Double, scaleY: Double,
                          originX: Double, originY: Double) {
    /** The single/first band (the pre-multi-band accessor). */
    def data: Array[Double] = bands.head
    /** World x of pixel-center (col, row) — GeoTIFF pixel-is-area. */
    def xOf(col: Int): Double = originX + (col + 0.5) * scaleX
    /** World y of pixel-center; y decreases with row (north-up raster). */
    def yOf(row: Int): Double = originY - (row + 0.5) * scaleY
  }

  object Raster {
    /** Single-band convenience constructor (the original signature). */
    def apply(width: Int, height: Int, data: Array[Double],
              scaleX: Double, scaleY: Double,
              originX: Double, originY: Double): Raster =
      Raster(width, height, IndexedSeq(data), scaleX, scaleY, originX, originY)
  }

  // ------------------------------------------------------------- parsing

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // BYTE/ASCII/SBYTE/UNDEF
    case 3 | 8 => 2         // SHORT/SSHORT
    case 4 | 9 | 11 => 4    // LONG/SLONG/FLOAT
    case 5 | 10 | 12 => 8   // RATIONAL/SRATIONAL/DOUBLE
    case other => throw new IllegalArgumentException(s"TIFF field type $other")
  }

  def parse(bytes: Array[Byte]): Raster = {
    val head = ByteBuffer.wrap(bytes)
    val order = (head.get(0), head.get(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => throw new IllegalArgumentException("not a TIFF (bad byte order)")
    }
    val b = ByteBuffer.wrap(bytes).order(order)
    require(b.getShort(2) == 42, "not a TIFF (bad magic)")
    val ifdOff = b.getInt(4)
    val nEntries = b.getShort(ifdOff).toInt & 0xffff
    // tag → (type, values as doubles)
    val tags = (0 until nEntries).map { e =>
      val off = ifdOff + 2 + e * 12
      val tag = b.getShort(off).toInt & 0xffff
      val typ = b.getShort(off + 2).toInt & 0xffff
      val count = b.getInt(off + 4)
      val valSize = typeSize(typ) * count
      val valOff = if (valSize <= 4) off + 8 else b.getInt(off + 8)
      val vals = (0 until count).map { i =>
        val p = valOff + i * typeSize(typ)
        typ match {
          case 1 | 2 | 7 => (b.get(p) & 0xff).toDouble
          case 6 => b.get(p).toDouble
          case 3 => (b.getShort(p) & 0xffff).toDouble
          case 8 => b.getShort(p).toDouble
          case 4 => (b.getInt(p).toLong & 0xffffffffL).toDouble
          case 9 => b.getInt(p).toDouble
          case 11 => b.getFloat(p).toDouble
          case 12 => b.getDouble(p)
          case 5 | 10 => b.getInt(p).toDouble / b.getInt(p + 4)
        }
      }.toArray
      tag -> vals
    }.toMap

    def one(tag: Int, default: Option[Double] = None): Double =
      tags.get(tag).map(_.head).orElse(default).getOrElse(
        throw new IllegalArgumentException(s"missing required TIFF tag $tag"))

    val width = one(256).toInt
    val height = one(257).toInt
    val bits = one(258, Some(1.0)).toInt
    val compression = one(259, Some(1.0)).toInt
    val nBands = one(277, Some(1.0)).toInt
    val sampleFormat = one(339, Some(1.0)).toInt // 1 uint, 2 int, 3 float
    val planarConfig = one(284, Some(1.0)).toInt
    require(planarConfig == 1,
      s"planar configuration $planarConfig unsupported (chunky/interleaved only)")
    // per-band bits/format entries must agree (heterogeneous bands are out
    // of scope; rasterio's cube path never produces them)
    require(tags.get(258).forall(_.forall(_ == bits)),
      "per-band BitsPerSample values differ")
    require(tags.get(339).forall(_.forall(_ == sampleFormat)),
      "per-band SampleFormat values differ")
    require(bits >= 8 && bits % 8 == 0,
      s"$bits-bit samples unsupported (bilevel/palette TIFFs out of scope)")
    require(compression == 1 || compression == 8 || compression == 32946,
      s"compression $compression unsupported (none/deflate only)")

    val bytesPerSample = bits / 8
    def inflate(raw: Array[Byte], expect: Int): Array[Byte] =
      if (compression == 1) raw
      else {
        val inf = new java.util.zip.Inflater()
        inf.setInput(raw)
        val out = new Array[Byte](expect)
        // inflate() may return the stream in multiple chunks — loop until the
        // stream ends or the buffer is full (a single-call n==expect check
        // would reject valid externally-produced Deflate TIFFs)
        var n = 0
        var made = -1
        while (n < out.length && !inf.finished() && made != 0) {
          made = inf.inflate(out, n, out.length - n)
          n += made
        }
        inf.end()
        require(n == out.length, s"short inflate: $n of ${out.length}")
        out
      }
    def sample(sb: ByteBuffer, i: Int): Double = (bits, sampleFormat) match {
      case (8, 1) => (sb.get(i) & 0xff).toDouble
      case (8, 2) => sb.get(i).toDouble
      case (16, 1) => (sb.getShort(i * 2) & 0xffff).toDouble
      case (16, 2) => sb.getShort(i * 2).toDouble
      case (32, 1) => (sb.getInt(i * 4).toLong & 0xffffffffL).toDouble
      case (32, 2) => sb.getInt(i * 4).toDouble
      case (32, 3) => sb.getFloat(i * 4).toDouble
      case (64, 3) => sb.getDouble(i * 8)
      case (bf, sf) => throw new IllegalArgumentException(
        s"unsupported sample: $bf bits format $sf")
    }

    // chunky layout: each pixel carries its nBands samples consecutively
    val bands = IndexedSeq.fill(nBands)(new Array[Double](width * height))
    if (tags.contains(322)) {
      // tiled organization (the COG interior layout): fixed tw×th tiles,
      // row-major across then down, edge tiles padded past the image
      val tw = one(322).toInt
      val th = one(323).toInt
      val tileOffsets = tags(324).map(_.toLong)
      val tileCounts = tags(325).map(_.toLong)
      val tilesAcross = (width + tw - 1) / tw
      tileOffsets.zip(tileCounts).zipWithIndex.foreach { case ((toff, tcount), t) =>
        val raw = java.util.Arrays.copyOfRange(bytes, toff.toInt, (toff + tcount).toInt)
        val tile = inflate(raw, tw * th * nBands * bytesPerSample)
        val sb = ByteBuffer.wrap(tile).order(order)
        val (tr, tc) = (t / tilesAcross, t % tilesAcross)
        var r = 0
        while (r < th && tr * th + r < height) {
          val gRow = tr * th + r
          var c = 0
          while (c < tw && tc * tw + c < width) {
            var k = 0
            while (k < nBands) {
              bands(k)(gRow * width + tc * tw + c) =
                sample(sb, (r * tw + c) * nBands + k)
              k += 1
            }
            c += 1
          }
          r += 1
        }
      }
    } else {
      // striped organization
      val rowsPerStrip = one(278, Some(height.toDouble)).toInt
      val stripOffsets = tags(273).map(_.toLong)
      val stripCounts = tags(279).map(_.toLong)
      require(stripOffsets.length == stripCounts.length, "strip table mismatch")
      var row0 = 0
      stripOffsets.zip(stripCounts).foreach { case (soff, scount) =>
        val raw = java.util.Arrays.copyOfRange(bytes, soff.toInt, (soff + scount).toInt)
        val nRows = math.min(rowsPerStrip, height - row0)
        val strip = inflate(raw, nRows * width * nBands * bytesPerSample)
        val sb = ByteBuffer.wrap(strip).order(order)
        val nSamples = strip.length / bytesPerSample
        var i = 0
        while (i < nSamples && row0 * width + i / nBands < width * height) {
          bands(i % nBands)(row0 * width + i / nBands) = sample(sb, i)
          i += 1
        }
        row0 += rowsPerStrip
      }
    }

    val scale = tags.getOrElse(33550, Array(1.0, 1.0, 0.0)) // ModelPixelScale
    val tie = tags.getOrElse(33922, Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    // tiepoint maps raster (tie(0), tie(1)) to world (tie(3), tie(4));
    // normalize to the world coords of raster origin (0, 0)
    val originX = tie(3) - tie(0) * scale(0)
    val originY = tie(4) + tie(1) * scale(1)
    Raster(width, height, bands, scale(0), scale(1), originX, originY)
  }

  def read(path: String): Raster =
    parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** Value columns: `v` for a single band (the original contract),
    * `band_1..band_N` for multi-band (the reference's rasterio naming).
    */
  private def bandNames(n: Int): Seq[String] =
    if (n == 1) Seq("v") else (1 to n).map(k => s"band_$k")

  private def rasterSchema(n: Int) = StructType(Seq(
    StructField("col", LongType), StructField("row", LongType),
    StructField("x", DoubleType), StructField("y", DoubleType)) ++
    bandNames(n).map(StructField(_, DoubleType)))

  /** Decode to long-format (col, row, x, y, v | band_1..band_N) rows. */
  def readRaster(spark: SparkSession, path: String): DataFrame = {
    val r = read(path)
    val rows = rasterRows(r).map(Row.fromSeq)
    spark.createDataFrame(rows.asJava, rasterSchema(r.bands.length))
  }

  /** Distributed decode of many rasters, one file per task (+ file col).
    * Band count comes from the first file; a granule with a different band
    * count fails loudly in its task, naming the path.
    */
  def readRasterFiles(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "readRasterFiles: no input files (empty glob?)")
    val nBands = read(paths.head).bands.length
    val schema = StructType(
      StructField("file", StringType) +: rasterSchema(nBands).fields)
    val rdd = spark.sparkContext.parallelize(paths, paths.length).flatMap { p =>
      val r = read(p)
      require(r.bands.length == nBands,
        s"$p: ${r.bands.length} bands but the schema probe expects $nBands")
      rasterRows(r).map(row => Row.fromSeq(p +: row))
    }
    spark.createDataFrame(rdd, schema)
  }

  private def rasterRows(r: Raster): Seq[Seq[Any]] =
    (0 until r.height).flatMap { row =>
      (0 until r.width).map { colI =>
        Seq[Any](colI.toLong, row.toLong, r.xOf(colI), r.yOf(row)) ++
          r.bands.map(b => b(row * r.width + colI): Any)
      }
    }

  // ------------------------------------------------------------- writing

  /** Minimal writer: float64, little-endian, single- or multi-band chunky-
    * interleaved, optionally Deflate-compressed, striped (one strip) by
    * default or TILED when `tileSize > 0` — the COG-interior organization,
    * with edge tiles zero-padded per the spec. The round-trip counterpart
    * of [[parse]].
    */
  def write(path: String, raster: Raster, deflate: Boolean = false,
            tileSize: Int = 0): Unit = {
    val nb = raster.bands.length
    def compress(b: Array[Byte]): Array[Byte] =
      if (!deflate) b
      else {
        // worst-case zlib expansion: ~5 bytes per 64 KiB stored block + 6
        val d = new java.util.zip.Deflater()
        d.setInput(b); d.finish()
        val out = new Array[Byte](b.length + 5 * (b.length / 65535 + 1) + 16)
        val n = d.deflate(out)
        require(d.finished(), "deflate did not finish in one pass")
        d.end()
        java.util.Arrays.copyOf(out, n)
      }
    val tiled = tileSize > 0
    val chunks: IndexedSeq[Array[Byte]] =
      if (!tiled) {
        val pix = ByteBuffer.allocate(raster.width * raster.height * nb * 8)
          .order(ByteOrder.LITTLE_ENDIAN)
        var p = 0
        while (p < raster.width * raster.height) {
          var k = 0
          while (k < nb) { pix.putDouble(raster.bands(k)(p)); k += 1 }
          p += 1
        }
        IndexedSeq(compress(pix.array()))
      } else {
        val (tw, th) = (tileSize, tileSize)
        val ta = (raster.width + tw - 1) / tw
        val td = (raster.height + th - 1) / th
        for (tr <- 0 until td; tc <- 0 until ta) yield {
          val buf = ByteBuffer.allocate(tw * th * nb * 8)
            .order(ByteOrder.LITTLE_ENDIAN)
          for (r <- 0 until th; c <- 0 until tw; k <- 0 until nb) {
            val (gr, gc) = (tr * th + r, tc * tw + c)
            buf.putDouble(
              if (gr < raster.height && gc < raster.width)
                raster.bands(k)(gr * raster.width + gc)
              else 0.0) // edge padding, skipped on read
          }
          compress(buf.array())
        }
      }

    // layout: header (8) | IFD | scale (24) | tiepoint (48) |
    //         [bits + format arrays when >2 bands] |
    //         [offset + count arrays when >1 chunk] | chunk data
    val entries = (if (tiled) 12 else 11) + 1 // + SamplesPerPixel
    val ifdLen = 2 + entries * 12 + 4
    val scaleOff = 8 + ifdLen
    val tieOff = scaleOff + 3 * 8
    val n = chunks.length
    val needVec = nb > 2 // SHORT×nb no longer fits the 4 inline bytes
    val bitsArrOff = tieOff + 6 * 8
    val fmtArrOff = bitsArrOff + (if (needVec) 2 * nb else 0)
    val offArrOff = fmtArrOff + (if (needVec) 2 * nb else 0)
    val cntArrOff = offArrOff + (if (n > 1) 4 * n else 0)
    val dataOff0 = cntArrOff + (if (n > 1) 4 * n else 0)
    val chunkOffs = chunks.scanLeft(dataOff0)(_ + _.length).init
    val buf = ByteBuffer.allocate(dataOff0 + chunks.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    buf.putShort(entries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(tag.toShort); buf.putShort(typ.toShort); buf.putInt(count)
      if (typ == 3 && count == 1) { buf.putShort(value.toShort); buf.putShort(0) }
      else buf.putInt(value.toInt)
    }
    // per-band SHORT vector: inline up to 2 values, external array beyond
    def shortVecEntry(tag: Int, value: Int, arrOff: Int): Unit =
      if (nb == 1) entry(tag, 3, 1, value)
      else if (nb == 2) {
        buf.putShort(tag.toShort); buf.putShort(3.toShort); buf.putInt(2)
        buf.putShort(value.toShort); buf.putShort(value.toShort)
      } else entry(tag, 3, nb, arrOff)
    // chunk-table fields are inline when a single chunk fits the 4 bytes
    def offsetsEntry(tag: Int): Unit =
      if (n == 1) entry(tag, 4, 1, chunkOffs.head)
      else entry(tag, 4, n, offArrOff)
    def countsEntry(tag: Int): Unit =
      if (n == 1) entry(tag, 4, 1, chunks.head.length)
      else entry(tag, 4, n, cntArrOff)
    entry(256, 4, 1, raster.width)                       // ImageWidth (LONG:
    entry(257, 4, 1, raster.height)                      //  never truncates)
    shortVecEntry(258, 64, bitsArrOff)                   // BitsPerSample
    entry(259, 3, 1, if (deflate) 8 else 1)              // Compression
    entry(262, 3, 1, 1)                                  // Photometric
    if (!tiled) { // entries stay tag-sorted per the spec
      offsetsEntry(273)                                  // StripOffsets
      entry(277, 3, 1, nb)                               // SamplesPerPixel
      entry(278, 4, 1, raster.height)                    // RowsPerStrip
      countsEntry(279)                                   // StripByteCounts
    } else {
      entry(277, 3, 1, nb)                               // SamplesPerPixel
      entry(322, 3, 1, tileSize)                         // TileWidth
      entry(323, 3, 1, tileSize)                         // TileLength
      offsetsEntry(324)                                  // TileOffsets
      countsEntry(325)                                   // TileByteCounts
    }
    shortVecEntry(339, 3, fmtArrOff)                     // SampleFormat: float
    entry(33550, 12, 3, scaleOff)                        // ModelPixelScale
    entry(33922, 12, 6, tieOff)                          // ModelTiepoint
    buf.putInt(0) // next-IFD terminator
    buf.putDouble(raster.scaleX).putDouble(raster.scaleY).putDouble(0.0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)     // raster (0,0,0) →
    buf.putDouble(raster.originX).putDouble(raster.originY).putDouble(0.0)
    if (needVec) {
      (0 until nb).foreach(_ => buf.putShort(64.toShort)) // bits array
      (0 until nb).foreach(_ => buf.putShort(3.toShort))  // format array
    }
    if (n > 1) {
      chunkOffs.foreach(o => buf.putInt(o.toInt))
      chunks.foreach(c => buf.putInt(c.length))
    }
    chunks.foreach(buf.put)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
    ()
  }
}
