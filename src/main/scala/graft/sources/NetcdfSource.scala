package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import scala.jdk.CollectionConverters._

/** NetCDF raster source — the reference's NetCDF dataset IO (dsio.py:359-408
  * reads/writes via xarray/netCDF4). Implements the public classic file
  * format (CDF-1/CDF-2, the NetCDF "classic format spec") here: dimensions,
  * global + variable attributes, and fixed-size variables of the numeric
  * external types, parsed from the big-endian binary layout — no native
  * library. NetCDF-4 granules (HDF5 containers — what most real
  * satellite/climate archives ship) are routed by magic to [[Hdf5Source]],
  * which parses the HDF5 substrate directly; both formats surface as the
  * same [[NcFile]] model through every entry point below.
  *
  * Scale story: ONE granule is driver/executor-sized (like the reference's
  * per-file xarray open), but an archive is millions of granules —
  * [[readCubeFiles]] distributes one file per task and yields the union of
  * their long-format rows, which is how a 100 TB NetCDF archive converts
  * to the partitioned-Parquet cube layout in one pass.
  */
object NetcdfSource {

  final case class NcDim(name: String, size: Int)
  /** A variable: external type kept as doubles (all numeric nc types
    * widen losslessly except 8-byte ints, which classic files don't have).
    */
  final case class NcVar(name: String, ncType: Int, dimIds: Seq[Int],
                         attrs: Map[String, String], data: Array[Double])
  /** Byte layout of one variable inside the file — enough to address its
    * data without re-parsing: `begin` is the absolute offset of the first
    * value; a record variable's record r starts at `begin + r * recSize`.
    * Consumed by [[KerchunkSource.scanNetcdf]] to emit byte-range refs.
    */
  final case class NcVarLayout(name: String, ncType: Int, dims: Seq[NcDim],
                               begin: Long, isRec: Boolean)
  final case class NcLayout(numRecs: Int, recSize: Long, vars: Seq[NcVarLayout])
  final case class NcFile(dims: Seq[NcDim], attrs: Map[String, String],
                          vars: Seq[NcVar],
                          layout: Option[NcLayout] = None) {
    def varByName(n: String): NcVar = vars.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no variable '$n'; have ${vars.map(_.name).mkString(", ")}"))
  }

  private val TagDim = 0x0a
  private val TagVar = 0x0b
  private val TagAtt = 0x0c

  private def pad4(n: Int): Int = (n + 3) & ~3

  // ------------------------------------------------------------- parsing

  /** Parse a classic NetCDF file image, including RECORD (unlimited-
    * dimension) variables — the way real archives store time: the record
    * dim is written with size 0 (resolved here to `numrecs`), and each
    * record's worth of every record variable is stored contiguously per
    * record, slabs padded to 4 bytes unless there is exactly one record
    * variable (classic format spec, "Note on vsize").
    * `headerOnly` skips the variable data (empty arrays) — for schema
    * discovery without decoding potentially executor-sized payloads.
    */
  def parse(bytes: Array[Byte], headerOnly: Boolean = false): NcFile = {
    // NetCDF-4 granules are HDF5 containers — route them by magic, so every
    // entry point (read/readHeader/readCube/readCubeFiles/store inference)
    // handles both formats transparently. Both branches get the xarray-
    // default CF mask-and-scale decode (the reference opens datasets with
    // mask_and_scale=True — store/fs/impl/dataset.py:60).
    if (Hdf5Source.isHdf5(bytes))
      return maskAndScale(Hdf5Source.parse(bytes, headerOnly))
    maskAndScale(parseClassic(bytes, headerOnly))
  }

  /** CF packed-data decode (xarray `mask_and_scale` default): the
    * `_Unsigned = "true"` convention first re-interprets negative
    * byte/short/int raws as unsigned (classic NetCDF has no unsigned
    * types, so real files ship them this way), then values equal to
    * `_FillValue`/`missing_value` become NaN (the fill compares in the
    * same unsigned space), then `raw * scale_factor + add_offset` recovers
    * physical values. Variables without any of the attributes pass through
    * untouched, so unpacked files are byte-for-byte unaffected.
    */
  def maskAndScale(nc: NcFile): NcFile = {
    def num(v: NcVar, key: String): Option[Double] =
      v.attrs.get(key).flatMap(s => scala.util.Try(s.toDouble).toOption)
    val vars = nc.vars.map { v =>
      val unsigned = v.attrs.get("_Unsigned").exists(_.equalsIgnoreCase("true"))
      val scale = num(v, "scale_factor")
      val offset = num(v, "add_offset")
      val fill = num(v, "_FillValue").orElse(num(v, "missing_value"))
      if (!unsigned && scale.isEmpty && offset.isEmpty && fill.isEmpty) v
      else {
        val span = v.ncType match {
          case 1 => 256.0 // NC_BYTE
          case 3 => 65536.0 // NC_SHORT
          case 4 => 4294967296.0 // NC_INT
          case _ => 0.0 // float/double: _Unsigned is meaningless
        }
        def toU(x: Double): Double =
          if (unsigned && span > 0 && x < 0) x + span else x
        val s = scale.getOrElse(1.0)
        val o = offset.getOrElse(0.0)
        val f = fill.map(toU).getOrElse(Double.NaN)
        v.copy(data = v.data.map { raw =>
          val x = toU(raw)
          if (fill.isDefined && x == f) Double.NaN else x * s + o
        })
      }
    }
    nc.copy(vars = vars)
  }

  private def parseClassic(bytes: Array[Byte], headerOnly: Boolean): NcFile = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(b.get() == 'C' && b.get() == 'D' && b.get() == 'F',
      "not a NetCDF file (neither CDF classic nor HDF5 magic)")
    val version = b.get()
    require(version == 1 || version == 2,
      s"unsupported NetCDF version byte $version (classic/64-bit-offset only)")
    val numRecs = b.getInt
    require(numRecs >= 0, "streaming numrecs (-1) is not supported")

    def name(): String = {
      val len = b.getInt
      val s = new String(bytes, b.position(), len, "UTF-8")
      b.position(b.position() + pad4(len))
      s
    }
    def typedValues(ncType: Int, n: Int): Array[Double] = {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = ncType match {
          case 1 => b.get().toDouble            // byte
          case 2 => (b.get() & 0xff).toDouble   // char → code point (real
          // classic files carry char label vars, e.g. station names;
          // crashing on them would make the whole granule unreadable)
          case 3 => b.getShort.toDouble         // short
          case 4 => b.getInt.toDouble           // int
          case 5 => b.getFloat.toDouble         // float
          case 6 => b.getDouble                 // double
          case t => throw new IllegalArgumentException(s"nc type $t")
        }
        i += 1
      }
      val byteLen = n * Seq(0, 1, 1, 2, 4, 4, 8)(ncType)
      b.position(b.position() + (pad4(byteLen) - byteLen))
      out
    }
    def attList(): Map[String, String] = {
      val tag = b.getInt; val n = b.getInt
      require(tag == TagAtt || (tag == 0 && n == 0), s"bad attribute tag $tag")
      (0 until n).map { _ =>
        val k = name()
        val t = b.getInt
        val nv = b.getInt
        val v =
          if (t == 2) { // char attr → string
            val s = new String(bytes, b.position(), nv, "UTF-8")
            b.position(b.position() + pad4(nv))
            s
          } else typedValues(t, nv).mkString(",")
        k -> v
      }.toMap
    }

    val dimTag = b.getInt; val nDims = b.getInt
    require(dimTag == TagDim || (dimTag == 0 && nDims == 0), "bad dim tag")
    val rawDims = (0 until nDims).map(_ => NcDim(name(), b.getInt))
    // the unlimited dim is stored with size 0; resolve it to numrecs so
    // downstream shape math never sees the sentinel
    val recDimId = rawDims.indexWhere(_.size == 0)
    val dims = rawDims.zipWithIndex.map { case (d, i) =>
      if (i == recDimId) d.copy(size = numRecs) else d
    }
    val gattrs = attList()
    val varTag = b.getInt; val nVars = b.getInt
    require(varTag == TagVar || (varTag == 0 && nVars == 0), "bad var tag")
    val headers = (0 until nVars).map { _ =>
      val vn = name()
      val nd = b.getInt
      val dimIds = (0 until nd).map(_ => b.getInt)
      val vattrs = attList()
      val ncType = b.getInt
      val _ = b.getInt // vsize (including padding; recomputed below)
      val begin = if (version == 1) b.getInt.toLong else b.getLong
      (vn, ncType, dimIds, vattrs, begin)
    }
    // a variable is a record variable iff its FIRST dim is the unlimited
    // one (spec: the unlimited dim may only appear first)
    def isRec(dimIds: Seq[Int]): Boolean =
      recDimId >= 0 && dimIds.headOption.contains(recDimId)
    val sizeOf = Seq(0, 1, 1, 2, 4, 4, 8)
    // per-record slab in bytes, padded to 4 unless exactly one record var
    val nRecVars = headers.count(h => isRec(h._3))
    def slabBytes(t: Int, dimIds: Seq[Int]): Long =
      dimIds.drop(1).map(dims(_).size.toLong).product * sizeOf(t)
    val recSize = headers.filter(h => isRec(h._3)).map { h =>
      val s = slabBytes(h._2, h._3)
      if (nRecVars == 1) s else pad4(s.toInt).toLong
    }.sum
    val vars = headers.map { case (vn, t, dimIds, vattrs, begin) =>
      if (headerOnly) NcVar(vn, t, dimIds, vattrs, Array.empty[Double])
      else if (isRec(dimIds)) {
        val perRec = dimIds.drop(1).map(dims(_).size.toLong).product
        require(perRec * numRecs <= Int.MaxValue,
          s"variable $vn too large for one granule")
        val out = new Array[Double](perRec.toInt * numRecs)
        var r = 0
        while (r < numRecs) {
          b.position((begin + r * recSize).toInt)
          val slab = typedValues(t, perRec.toInt)
          System.arraycopy(slab, 0, out, r * perRec.toInt, perRec.toInt)
          r += 1
        }
        NcVar(vn, t, dimIds, vattrs, out)
      } else {
        val n = dimIds.map(dims(_).size.toLong).product
        require(n <= Int.MaxValue, s"variable $vn too large for one granule")
        b.position(begin.toInt)
        NcVar(vn, t, dimIds, vattrs, typedValues(t, n.toInt))
      }
    }
    val lay = NcLayout(numRecs, recSize, headers.map {
      case (vn, t, dimIds, _, begin) =>
        NcVarLayout(vn, t, dimIds.map(dims(_)), begin, isRec(dimIds))
    })
    NcFile(dims, gattrs, vars, Some(lay))
  }

  def read(path: String): NcFile =
    parse(ByteStore.current.read(path)) // local file OR object-store URL

  /** Header-only read: dims/attrs/var shapes, no data decode. Reads a
    * BOUNDED front-of-file prefix — the classic-format header is stored
    * contiguously at the start (numrecs at byte 4, then dim/attr/var
    * lists), so a metadata scan of a multi-GB granule costs one small
    * range read, not the payload. If an unusually fat attribute table
    * spills past the prefix the parse trips the buffer bound and the
    * prefix grows geometrically — worst case (prefix == file) only for
    * degenerate all-header files.
    */
  def readHeader(path: String, initialPrefixBytes: Int = 1 << 20,
                 bs: ByteStore = ByteStore.current): NcFile = {
    val total = bs.size(path)
    var n = math.min(math.max(initialPrefixBytes.toLong, 64L), total)
    while (true) {
      // bounded prefix read — on an object store this is ONE range GET
      val prefix = bs.readRange(path, 0, n)
      try return parse(prefix, headerOnly = true)
      catch {
        // reads past the prefix (not past the file) mean the header is
        // longer than the guess — retry with a bigger bound. A truncated
        // prefix can surface as any RuntimeException (a require on a
        // half-read size field, NegativeArraySizeException from a clipped
        // length), not just a buffer bound, so retry broadly while the
        // prefix is still short of the file and rethrow only at full size
        case e: RuntimeException =>
          if (n >= total) throw e
          n = math.min(n * 4, total)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One data variable as long-format rows: a column per dimension (the
    * same-named coordinate variable's value if present, else the index)
    * plus the value — the NetCDF→cube decode.
    */
  def readCube(spark: SparkSession, path: String, varName: String): DataFrame =
    readCube(spark, read(path), varName)

  /** Decode from an ALREADY-PARSED file (no second read/decode). */
  def readCube(spark: SparkSession, nc: NcFile, varName: String): DataFrame = {
    val rows = cubeRows(nc, varName)
    val v = nc.varByName(varName)
    val schema = StructType(
      v.dimIds.map(d => StructField(nc.dims(d).name, DoubleType)) :+
        StructField(varName, DoubleType))
    spark.createDataFrame(rows.map(Row.fromSeq).asJava, schema)
  }

  /** Distributed decode of many granules (one file per task): the union of
    * each file's long-format rows plus a `file` column. Every file must
    * carry `varName` with the SAME dimension names in the SAME order as the
    * schema probe (the first file) — a granule with reordered or renamed
    * dims would otherwise bind its coordinates to the wrong columns
    * positionally, so each task validates and names the offending path.
    */
  def readCubeFiles(spark: SparkSession, paths: Seq[String],
                    varName: String): DataFrame = {
    require(paths.nonEmpty, "readCubeFiles: no input files (empty glob?)")
    // header-only schema probe: the granule data decodes in its task, not
    // here on the driver
    val first = readHeader(paths.head)
    val v = first.varByName(varName)
    val expectDims = v.dimIds.map(d => first.dims(d).name)
    val schema = StructType(
      StructField("file", StringType) +:
        expectDims.map(StructField(_, DoubleType)) :+
        StructField(varName, DoubleType))
    val rdd = spark.sparkContext.parallelize(paths, paths.length).flatMap { p =>
      val nc = read(p)
      val fv = nc.varByName(varName)
      val fileDims = fv.dimIds.map(d => nc.dims(d).name)
      require(fileDims == expectDims,
        s"$p: variable '$varName' has dims (${fileDims.mkString(", ")}) " +
          s"but the schema probe expects (${expectDims.mkString(", ")})")
      cubeRows(nc, varName).map(r => Row.fromSeq(p +: r))
    }
    spark.createDataFrame(rdd, schema)
  }

  private def cubeRows(nc: NcFile, varName: String): Seq[Seq[Any]] = {
    val v = nc.varByName(varName)
    val shape = v.dimIds.map(nc.dims(_).size)
    val coords: Seq[Int => Double] = v.dimIds.map { d =>
      nc.vars.find(cv => cv.name == nc.dims(d).name && cv.dimIds == Seq(d)) match {
        case Some(cv) => (i: Int) => cv.data(i)
        case None => (i: Int) => i.toDouble
      }
    }
    val strides = shape.scanRight(1)(_ * _).tail
    (0 until v.data.length).map { flat =>
      val idx = shape.indices.map(k => flat / strides(k) % shape(k))
      idx.indices.map(k => coords(k)(idx(k)): Any) :+ (v.data(flat): Any)
    }
  }

  // ------------------------------------------------------------- writing

  /** Minimal classic (CDF-1) writer: double variables — the round-trip
    * counterpart of [[parse]] (the reference writes through to_netcdf).
    * `coordVars` are 1-D over the same-named dim; `dataVars` list
    * (name, dimNames, row-major values). With `recordDim`, that dimension
    * is written UNLIMITED (header size 0, actual count in numrecs) and
    * every variable leading with it is stored in the spec's per-record
    * interleaved layout — the shape real time-series archives use.
    */
  def write(path: String, dims: Seq[NcDim],
            coordVars: Seq[(String, Array[Double])],
            dataVars: Seq[(String, Seq[String], Array[Double])],
            recordDim: Option[String] = None,
            varAttrs: Map[String, Seq[(String, Double)]] = Map.empty,
            varTextAttrs: Map[String, Seq[(String, String)]] = Map.empty)
      : Unit = {
    val allVars: Seq[(String, Seq[String], Array[Double])] =
      coordVars.map { case (n, d) => (n, Seq(n), d) } ++ dataVars
    def nameBytes(s: String): Array[Byte] = {
      val raw = s.getBytes("UTF-8")
      ByteBuffer.allocate(4 + pad4(raw.length)).putInt(raw.length).put(raw).array()
    }
    val dimIdx = dims.map(_.name).zipWithIndex.toMap
    recordDim.foreach(rd => require(dimIdx.contains(rd), s"unknown record dim $rd"))
    val numRecs = recordDim.map(rd => dims(dimIdx(rd)).size).getOrElse(0)
    def isRecVar(dimNames: Seq[String]): Boolean =
      recordDim.exists(dimNames.headOption.contains)
    // per-record element count of a record variable (non-record dims only)
    def perRec(dimNames: Seq[String]): Int =
      dimNames.drop(1).map(dn => dims(dimIdx(dn)).size).product
    val headerParts = Seq.newBuilder[Array[Byte]]
    headerParts += Array[Byte]('C', 'D', 'F', 1)
    headerParts += ByteBuffer.allocate(4).putInt(numRecs).array()
    headerParts += ByteBuffer.allocate(8).putInt(TagDim).putInt(dims.length).array()
    dims.foreach { d =>
      headerParts += nameBytes(d.name)
      // the unlimited dim is recorded with size 0 per the spec
      headerParts += ByteBuffer.allocate(4)
        .putInt(if (recordDim.contains(d.name)) 0 else d.size).array()
    }
    headerParts += ByteBuffer.allocate(8).putInt(0).putInt(0).array() // no gatts
    headerParts += ByteBuffer.allocate(8).putInt(TagVar).putInt(allVars.length).array()
    // var headers need data offsets: compute header size first with a
    // 2-pass layout (offsets are 4-byte ints in CDF-1)
    def varHeader(name: String, dimNames: Seq[String], begin: Int): Array[Byte] = {
      val nb = nameBytes(name)
      val attrs = varAttrs.getOrElse(name, Nil)
      val textAttrs = varTextAttrs.getOrElse(name, Nil)
      val attrBytes = attrs.map { case (an, _) => nameBytes(an).length + 16 }.sum +
        textAttrs.map { case (an, av) =>
          nameBytes(an).length + 8 + pad4(av.getBytes("UTF-8").length)
        }.sum
      val buf = ByteBuffer.allocate(
        nb.length + 4 + 4 * dimNames.length + 8 + attrBytes + 12)
      buf.put(nb)
      buf.putInt(dimNames.length)
      dimNames.foreach(dn => buf.putInt(dimIdx(dn)))
      if (attrs.isEmpty && textAttrs.isEmpty) {
        buf.putInt(0); buf.putInt(0) // absent att list
      } else {
        buf.putInt(TagAtt).putInt(attrs.length + textAttrs.length)
        attrs.foreach { case (an, av) => // NC_DOUBLE scalar attributes
          buf.put(nameBytes(an)).putInt(6).putInt(1).putDouble(av)
        }
        textAttrs.foreach { case (an, av) => // NC_CHAR attributes (CF
          // grid_mapping / standard_name metadata)
          val raw = av.getBytes("UTF-8")
          buf.put(nameBytes(an)).putInt(2).putInt(raw.length).put(raw)
          var pd = pad4(raw.length) - raw.length
          while (pd > 0) { buf.put(0.toByte); pd -= 1 }
        }
      }
      buf.putInt(6) // NC_DOUBLE
      // vsize: full size for fixed vars, per-record slab for record vars
      // (8-byte doubles are already 4-aligned — no extra padding)
      buf.putInt(8 * (if (isRecVar(dimNames)) perRec(dimNames)
                      else dimNames.map(dn => dims(dimIdx(dn)).size).product))
      buf.putInt(begin)
      buf.array()
    }
    val fixedLen = headerParts.result().map(_.length).sum
    val headerLen = fixedLen + allVars.map { case (n, dn, _) =>
      varHeader(n, dn, 0).length
    }.sum
    // layout: fixed vars first (in var order), then the record block
    var fixedOff = headerLen
    allVars.filterNot(v => isRecVar(v._2)).foreach { case (_, _, data) =>
      fixedOff += 8 * data.length
    }
    val recBase = fixedOff
    val recVars = allVars.filter(v => isRecVar(v._2))
    val recSlabs = recVars.map(v => 8 * perRec(v._2))
    val recSize = recSlabs.sum
    val begins = {
      var fo = headerLen
      var ro = recBase
      allVars.map { case (_, dn, data) =>
        if (isRecVar(dn)) { val o = ro; ro += 8 * perRec(dn); o }
        else { val o = fo; fo += 8 * data.length; o }
      }
    }
    val total = recBase + numRecs * recSize
    val out = ByteBuffer.allocate(total)
    headerParts.result().foreach(out.put)
    allVars.zip(begins).foreach { case ((n, dn, _), begin) =>
      out.put(varHeader(n, dn, begin))
    }
    allVars.filterNot(v => isRecVar(v._2)).foreach { case (_, _, data) =>
      data.foreach(out.putDouble)
    }
    var r = 0
    while (r < numRecs) {
      recVars.foreach { case (_, dn, data) =>
        val pr = perRec(dn)
        var i = 0
        while (i < pr) { out.putDouble(data(r * pr + i)); i += 1 }
      }
      r += 1
    }
    // via ByteStore: parent dirs are created locally; scheme'd paths write
    // the granule as one object
    ByteStore.current.write(path, out.array())
  }
}
