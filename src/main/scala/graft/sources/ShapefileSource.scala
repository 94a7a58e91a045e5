package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** Minimal ESRI Shapefile vector source — the second format of the
  * reference's vector store (store/fs/impl/geodataframe.py:19-96 reads both
  * GeoJSON and Shapefile through geopandas). Implements the subset of the
  * public spec (ESRI Shapefile Technical Description, July 1998) that
  * feature layers actually use: Point (1), PolyLine (3), Polygon (5) and
  * MultiPoint (8) records, plus dBase III (.dbf) attributes with C
  * (string), N/F (numeric) and L (logical) fields.
  *
  * Vector layers are driver-sized (the reference loads a GeoDataFrame);
  * parsing happens on the driver and the result distributes as an ordinary
  * DataFrame — same contract as [[GeoJsonSource]]: a WKT `geometry` column
  * plus one typed column per attribute.
  */
object ShapefileSource {

  sealed trait ShpGeom
  final case class ShpPoint(x: Double, y: Double) extends ShpGeom
  /** Rings must be closed (first point repeated last), per the spec. */
  final case class ShpPolygon(rings: Seq[Seq[(Double, Double)]]) extends ShpGeom

  /** dBase III field descriptor: name (≤ 10 chars), type C/N/F/L, byte
    * length, decimal count (N with dec 0 reads as long, otherwise double).
    */
  final case class DbfField(name: String, typ: Char, len: Int, dec: Int)

  // ------------------------------------------------------------- reading

  private def readAll(path: String): Array[Byte] =
    ByteStore.current.read(path) // local file OR object-store URL

  /** Parse the .shp geometry stream to WKT strings, in record order. */
  def readGeometries(shpPath: String): Seq[String] = {
    val raw = readAll(shpPath)
    val be = ByteBuffer.wrap(raw).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, s"$shpPath: bad shapefile magic")
    val fileBytes = be.getInt(24) * 2 // header length field counts 16-bit words
    val out = Seq.newBuilder[String]
    var pos = 100
    while (pos < fileBytes) {
      val contentWords = be.getInt(pos + 4)
      val rec = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      rec.position(pos + 8)
      out += parseRecord(rec)
      pos += 8 + contentWords * 2
    }
    out.result()
  }

  private def parseRecord(b: ByteBuffer): String = b.getInt match {
    case 0 => "GEOMETRYCOLLECTION EMPTY" // null shape
    case 1 =>
      s"POINT (${b.getDouble} ${b.getDouble})"
    case t @ (3 | 5) => // PolyLine | Polygon: bbox, nParts, nPoints, parts, pts
      b.position(b.position() + 32)
      val nParts = b.getInt
      val nPoints = b.getInt
      val parts = Array.fill(nParts)(b.getInt)
      val pts = Array.fill(nPoints)((b.getDouble, b.getDouble))
      val bounds = parts :+ nPoints
      val rings = (0 until nParts).map { p =>
        "(" + (bounds(p) until bounds(p + 1))
          .map(i => s"${pts(i)._1} ${pts(i)._2}").mkString(", ") + ")"
      }
      if (t == 5) "POLYGON (" + rings.mkString(", ") + ")"
      else if (nParts == 1) "LINESTRING " + rings.head
      else "MULTILINESTRING (" + rings.mkString(", ") + ")"
    case 8 =>
      b.position(b.position() + 32)
      val n = b.getInt
      "MULTIPOINT (" +
        (0 until n).map(_ => s"${b.getDouble} ${b.getDouble}").mkString(", ") + ")"
    case other => throw new IllegalArgumentException(s"unsupported shape type $other")
  }

  /** Parse the .dbf sidecar: (fields, one attribute row per record). */
  def readAttributes(dbfPath: String): (Seq[DbfField], Seq[Seq[Any]]) = {
    val raw = readAll(dbfPath)
    val le = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8).toInt & 0xffff
    val recordSize = le.getShort(10).toInt & 0xffff
    val nFields = (headerSize - 33) / 32
    val fields = (0 until nFields).map { i =>
      val off = 32 + i * 32
      val name = new String(raw, off, 11, "ASCII").takeWhile(_ != 0).trim
      DbfField(name, (raw(off + 11) & 0xff).toChar,
        raw(off + 16) & 0xff, raw(off + 17) & 0xff)
    }
    val rows = (0 until nRec).map { r =>
      var off = headerSize + r * recordSize + 1 // skip the deletion flag
      fields.map { f =>
        val s = new String(raw, off, f.len, "ASCII").trim
        off += f.len
        f.typ match {
          case 'N' | 'F' =>
            if (s.isEmpty) null
            else if (f.typ == 'N' && f.dec == 0) java.lang.Long.valueOf(s.toLong)
            else java.lang.Double.valueOf(s.toDouble)
          case 'L' =>
            if (s.isEmpty || s == "?") null
            else java.lang.Boolean.valueOf("TtYy".contains(s.charAt(0)))
          case _ => if (s.isEmpty) null else s
        }
      }
    }
    (fields, rows)
  }

  /** Read a .shp (+ sibling .dbf if present) into
    * (geometry: WKT, attr columns...), mirroring GeoJsonSource.readFeatures.
    */
  def readFeatures(spark: SparkSession, shpPath: String): DataFrame = {
    val geoms = readGeometries(shpPath)
    val dbfPath = shpPath.replaceAll("\\.shp$", ".dbf")
    val (fields, attrs) =
      if (new java.io.File(dbfPath).exists()) readAttributes(dbfPath)
      else (Seq.empty[DbfField], geoms.map(_ => Seq.empty[Any]))
    require(attrs.length == geoms.length,
      s"$shpPath: ${geoms.length} shapes but ${attrs.length} dbf records")
    val schema = StructType(
      StructField("geometry", StringType) +: fields.map { f =>
        val t = f.typ match {
          case 'N' if f.dec == 0 => LongType
          case 'N' | 'F' => DoubleType
          case 'L' => BooleanType
          case _ => StringType
        }
        StructField(f.name, t, nullable = true)
      })
    val rows = geoms.zip(attrs).map { case (g, a) => Row.fromSeq(g +: a) }
    spark.createDataFrame(rows.asJava, schema)
  }

  // ------------------------------------------------------------- writing

  /** Minimal writer (one shape type per file, per the spec; C and N
    * attribute fields) — the round-trip counterpart of readFeatures, like
    * the reference store writes GeoDataFrames back to .shp. Writes
    * `path` (.shp) plus the sibling .dbf AND the spec-mandatory .shx index
    * (strict consumers refuse a layer without it).
    */
  def writeFeatures(shpPath: String, geoms: Seq[ShpGeom],
                    fields: Seq[DbfField], attrs: Seq[Seq[Any]]): Unit = {
    require(geoms.nonEmpty, "no geometries")
    require(attrs.length == geoms.length, "attrs must align with geoms")
    val shapeType = geoms.head match {
      case _: ShpPoint => 1
      case _: ShpPolygon => 5
    }
    require(geoms.forall {
      case _: ShpPoint => shapeType == 1
      case _: ShpPolygon => shapeType == 5
    }, "a shapefile holds a single shape type")

    val contents = geoms.map {
      case ShpPoint(x, y) =>
        val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(1); b.putDouble(x); b.putDouble(y)
        b.array()
      case ShpPolygon(rings) =>
        val nPoints = rings.map(_.length).sum
        val b = ByteBuffer.allocate(44 + 4 * rings.length + 16 * nPoints)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(5)
        val xs = rings.flatten.map(_._1); val ys = rings.flatten.map(_._2)
        b.putDouble(xs.min); b.putDouble(ys.min)
        b.putDouble(xs.max); b.putDouble(ys.max)
        b.putInt(rings.length); b.putInt(nPoints)
        rings.scanLeft(0)(_ + _.length).init.foreach(b.putInt)
        rings.flatten.foreach { case (x, y) => b.putDouble(x); b.putDouble(y) }
        b.array()
    }
    val totalBytes = 100 + contents.map(8 + _.length).sum
    val shp = ByteBuffer.allocate(totalBytes).order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, totalBytes / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, shapeType)
    val allPts = geoms.flatMap {
      case ShpPoint(x, y) => Seq((x, y))
      case ShpPolygon(rings) => rings.flatten
    }
    shp.putDouble(36, allPts.map(_._1).min); shp.putDouble(44, allPts.map(_._2).min)
    shp.putDouble(52, allPts.map(_._1).max); shp.putDouble(60, allPts.map(_._2).max)
    shp.position(100)
    contents.zipWithIndex.foreach { case (c, i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1); shp.putInt(c.length / 2)
      shp.put(c)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(shpPath), shp.array())

    // ------- .shx sidecar: same 100-byte header (its own file length),
    // then per record (offset, content length) in 16-bit words — the
    // offset points at the record HEADER in the .shp
    val shxBytes = 100 + 8 * contents.length
    val shx = ByteBuffer.allocate(shxBytes).order(ByteOrder.BIG_ENDIAN)
    shp.position(0)
    shx.put(0, shp, 0, 100) // copy the .shp header verbatim, then patch
    shx.putInt(24, shxBytes / 2)
    var recOff = 100
    contents.zipWithIndex.foreach { case (c, i) =>
      shx.putInt(100 + 8 * i, recOff / 2)
      shx.putInt(104 + 8 * i, c.length / 2)
      recOff += 8 + c.length
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(shpPath.replaceAll("\\.shp$", ".shx")), shx.array())

    // ------- .dbf sidecar (dBase III)
    val recordSize = 1 + fields.map(_.len).sum
    val headerSize = 32 + 32 * fields.length + 1
    val dbf = ByteBuffer.allocate(headerSize + recordSize * attrs.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, attrs.length)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recordSize.toShort)
    fields.zipWithIndex.foreach { case (f, i) =>
      val off = 32 + i * 32
      val nameBytes = f.name.getBytes("ASCII").take(10)
      (0 until nameBytes.length).foreach(j => dbf.put(off + j, nameBytes(j)))
      dbf.put(off + 11, f.typ.toByte)
      dbf.put(off + 16, f.len.toByte)
      dbf.put(off + 17, f.dec.toByte)
    }
    dbf.put(headerSize - 1, 0x0d.toByte)
    attrs.zipWithIndex.foreach { case (row, r) =>
      var off = headerSize + r * recordSize
      dbf.put(off, ' '.toByte); off += 1
      fields.zip(row).foreach { case (f, v) =>
        val s = f.typ match {
          case 'N' =>
            val txt = if (v == null) "" else v.toString
            // a too-narrow field would silently truncate leading digits —
            // corrupt data, so refuse instead
            require(txt.length <= f.len,
              s"value '$txt' wider than ${f.len}-byte field '${f.name}'")
            (" " * (f.len - txt.length)) + txt // numbers right-justified
          case _ =>
            val txt = if (v == null) "" else v.toString
            txt.take(f.len).padTo(f.len, ' ')
        }
        val bytes = s.getBytes("ASCII")
        (0 until f.len).foreach(j => dbf.put(off + j, bytes(j)))
        off += f.len
      }
    }
    dbf.put(dbf.capacity() - 1, 0x1a.toByte)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(shpPath.replaceAll("\\.shp$", ".dbf")), dbf.array())
    ()
  }
}
