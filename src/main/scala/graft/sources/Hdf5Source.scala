package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable

/** NetCDF-4 (HDF5 container) source — implements the public HDF5 file
  * format spec directly on the JVM, the way [[NetcdfSource]] implements the
  * classic CDF spec and [[GeoTiffSource]] implements TIFF 6.0. The reference
  * opens these through xarray/netCDF4 (`store/fs/impl/dataset.py:231-288`);
  * most real satellite/climate granules are NetCDF-4.
  *
  * Supported physical layer — both what libhdf5 writes BY DEFAULT (the
  * layout netCDF-4 files in the wild use) and the H5F_LIBVER_LATEST
  * variants:
  *  - superblock v0/v1 (symbol-table root) and v2/v3 (root object header
  *    address + checksum), 8-byte offsets/lengths
  *  - v1 object headers incl. continuation blocks, and v2 "OHDR" headers
  *    incl. "OCHK" continuation blocks
  *  - old-style groups: B-tree v1 (type 0, any depth) + SNOD symbol nodes +
  *    local heaps, walked recursively through subgroups; new-style groups:
  *    compact link messages AND dense storage (link messages as fractal-
  *    heap objects behind a lookup3 name-hash v2 B-tree; single-direct-
  *    block heaps + single-leaf trees — hundreds of links — with deeper
  *    shapes rejected loudly)
  *  - datasets: dataspace v1/v2, fixed-point + IEEE-float datatypes of any
  *    byte order, fill-value messages v1/v2/v3
  *  - contiguous AND chunked layouts: v3 (B-tree v1 type 1, any depth) and
  *    v4 with single-chunk, implicit, and non-paged fixed-array indexes;
  *    filter pipeline v1/v2 with deflate (id 1), shuffle (id 2) and
  *    fletcher32 (id 3, checksum stripped) — the netCDF-4 compression stack
  *  - attributes v1/v2/v3: fixed strings, scalar numerics, and
  *    DIMENSION_LIST vlen object references resolved through global heaps
  *
  * NetCDF-4 semantics: dimensions come from dimension-scale datasets
  * (attribute `CLASS = "DIMENSION_SCALE"`, HDF5 dimension-scale spec);
  * data variables bind to them via `DIMENSION_LIST`; datasets without a
  * list get phony per-rank dims. The result is the same [[NetcdfSource.NcFile]]
  * model the classic parser produces, so every cube entry point
  * (readCube/readCubeFiles, store inference, kerchunk) works unchanged.
  *
  * Out of scope (rejected loudly, not silently misread): multi-block /
  * indirect fractal heaps and multi-level link B-trees, paged/extensible-
  * array/v2-btree chunk indexes (unlimited dims), szip/user filters,
  * compact layout, variable-length string data.
  */
object Hdf5Source {

  import NetcdfSource.{NcDim, NcFile, NcVar}

  private val Signature = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
  private val Undef = -1L // 0xFFFF... addresses

  def isHdf5(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i))

  /** Minimum bytes that hold values up to `maxVal` (H5 "minimum encoded
    * size" rule, used for fractal-heap ID length fields).
    */
  private def sizeBytesFor(maxVal: Long): Int = {
    var n = 1
    var v = maxVal >>> 8
    while (v != 0) { n += 1; v >>>= 8 }
    n
  }

  // ============================================================== reading

  private final case class Datatype(kind: Char, size: Int, bigEndian: Boolean,
                                    signed: Boolean)

  private sealed trait Layout
  private final case class Contiguous(addr: Long, size: Long) extends Layout
  /** class 0: raw data inline in the layout message itself (libhdf5 uses
    * this for tiny datasets; `off` is the absolute file offset of the
    * inline bytes, so reads and kerchunk scans treat it exactly like a
    * contiguous block). */
  private final case class CompactL(off: Long, size: Long) extends Layout
  /** v3 chunked: B-tree v1 index. */
  private final case class Chunked(btree: Long, chunk: Seq[Int], elemSize: Int) extends Layout
  /** v4 chunked (libver-latest): single-chunk (1), implicit (2) or fixed
    * array (3) index; `filteredSize`/`filterMask` only for a filtered
    * single chunk.
    */
  private final case class ChunkedV4(indexType: Int, chunk: Seq[Int], elemSize: Int,
                                     addr: Long, pageBits: Int,
                                     filteredSize: Long, filterMask: Int) extends Layout

  private final case class Dataset(name: String, addr: Long, shape: Seq[Int],
                                   dt: Datatype, layout: Layout,
                                   filters: Seq[(Int, Seq[Int])],
                                   fill: Option[Double],
                                   strAttrs: Map[String, String],
                                   dimRefs: Seq[Long])

  def parse(bytes: Array[Byte], headerOnly: Boolean = false): NcFile =
    parseImpl(bytes, headerOnly, collectScan = false)._1

  /** One stored chunk: zarr-style grid key + absolute byte range. */
  final case class H5ChunkRef(key: Seq[Int], addr: Long, size: Int)

  /** Byte layout of one dataset — enough for [[KerchunkSource.scanHdf5]] to
    * emit byte-range refs without copying payload bytes (the HDF5 analog of
    * [[NetcdfSource.NcVarLayout]]).
    */
  final case class H5VarScan(name: String, shape: Seq[Int], chunkDims: Seq[Int],
                             zarrDtype: String, deflate: Boolean,
                             shuffleElem: Int, fletcher: Boolean,
                             fill: Option[Double], dims: Seq[String],
                             contiguous: Option[(Long, Long)],
                             chunks: Seq[H5ChunkRef],
                             cfAttrs: Map[String, String] = Map.empty)

  /** Header-only layout scan (no payload decode) for kerchunk indexing. */
  def scan(bytes: Array[Byte]): Seq[H5VarScan] =
    parseImpl(bytes, headerOnly = true, collectScan = true)._2

  private def parseImpl(bytes: Array[Byte], headerOnly: Boolean,
                        collectScan: Boolean): (NcFile, Seq[H5VarScan]) = {
    require(isHdf5(bytes), "not an HDF5 file (bad signature)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val sbVer = bytes(8) & 0xff
    require(sbVer <= 3, s"HDF5 superblock v$sbVer unknown")
    // v0/v1: root symbol-table entry holds the root header address;
    // v2/v3 (H5F_LIBVER_LATEST): the root OBJECT HEADER address sits at a
    // fixed offset after base/extension/EOF
    val rootHdr =
      if (sbVer >= 2) {
        require((bytes(9) & 0xff) == 8 && (bytes(10) & 0xff) == 8,
          "only 8-byte offsets/lengths supported")
        b.getLong(36)
      } else {
        require((bytes(13) & 0xff) == 8 && (bytes(14) & 0xff) == 8,
          "only 8-byte offsets/lengths supported")
        b.getLong((if (sbVer == 0) 56 else 60) + 8)
      }

    def addrOk(a: Long): Boolean = a != Undef && a >= 0 && a < bytes.length

    // ---- object header walk: v1 (prefix + message count + continuations)
    // and v2 ("OHDR" signature, sized chunk 0, "OCHK" continuation blocks)
    def messages(hdrAddr: Long): Seq[(Int, Int, Int)] =
      if (new String(bytes, hdrAddr.toInt, 4, "US-ASCII") == "OHDR")
        messagesV2(hdrAddr)
      else messagesV1(hdrAddr)

    def messagesV1(hdrAddr: Long): Seq[(Int, Int, Int)] = {
      val ver = bytes(hdrAddr.toInt) & 0xff
      require(ver == 1, s"object header v$ver unsupported at $hdrAddr")
      val nmsgs = b.getShort(hdrAddr.toInt + 2) & 0xffff
      val out = Seq.newBuilder[(Int, Int, Int)]
      var remaining = nmsgs
      // (position, end) of the current message block
      var blocks = List((hdrAddr.toInt + 16, hdrAddr.toInt + 16 + b.getInt(hdrAddr.toInt + 8)))
      while (remaining > 0 && blocks.nonEmpty) {
        var (p, end) = blocks.head
        blocks = blocks.tail
        while (remaining > 0 && p + 8 <= end) {
          val typ = b.getShort(p) & 0xffff
          val size = b.getShort(p + 2) & 0xffff
          if (typ == 0x0010) { // continuation: another message block
            blocks = blocks :+ ((b.getLong(p + 8).toInt, (b.getLong(p + 8) + b.getLong(p + 16)).toInt))
          } else out += ((typ, p + 8, size))
          remaining -= 1
          p += 8 + size
        }
      }
      out.result()
    }

    def messagesV2(hdrAddr: Long): Seq[(Int, Int, Int)] = {
      val a = hdrAddr.toInt
      require((bytes(a + 4) & 0xff) == 2, s"OHDR version ${bytes(a + 4)} at $hdrAddr")
      val flags = bytes(a + 5) & 0xff
      val tracked = (flags & 0x04) != 0 // per-message creation order field
      var p = a + 6
      if ((flags & 0x20) != 0) p += 16 // access/mod/change/birth times
      if ((flags & 0x10) != 0) p += 4  // phase-change limits
      val sizeField = 1 << (flags & 0x3)
      val size0 = sizeField match {
        case 1 => bytes(p) & 0xffL
        case 2 => (b.getShort(p) & 0xffff).toLong
        case 4 => b.getInt(p).toLong & 0xffffffffL
        case _ => b.getLong(p)
      }
      p += sizeField
      val hdrSz = if (tracked) 6 else 4 // type(1)+size(2)+flags(1)[+order(2)]
      val out = Seq.newBuilder[(Int, Int, Int)]
      // (start, end) of message regions. Chunk-0's size field counts message
      // data ONLY (the 4-byte lookup3 checksum sits after it); a trailing
      // gap smaller than a message header is legal — the loop stops when no
      // header fits
      var blocks = List((p, p + size0.toInt))
      while (blocks.nonEmpty) {
        var (q, end) = blocks.head
        blocks = blocks.tail
        while (q + hdrSz <= end) {
          val typ = bytes(q) & 0xff
          val size = b.getShort(q + 1) & 0xffff
          val body = q + hdrSz
          if (typ == 0x10) { // continuation → "OCHK" block (sig + cksum)
            val off = b.getLong(body).toInt
            val len = b.getLong(body + 8).toInt
            require(new String(bytes, off, 4, "US-ASCII") == "OCHK",
              s"bad OCHK continuation at $off")
            blocks = blocks :+ ((off + 4, off + len - 4))
          } else if (typ != 0) out += ((typ, body, size))
          q = body + size
        }
      }
      out.result()
    }

    // ---- new-style (link-message) groups: compact links live directly in
    // the header; dense groups store link messages as fractal-heap objects
    // indexed by a name-hash v2 B-tree
    def parseLink(p: Int): (String, Long) = {
      val ver = bytes(p) & 0xff
      require(ver == 1, s"link message v$ver")
      val flags = bytes(p + 1) & 0xff
      var q = p + 2
      val linkType = if ((flags & 0x08) != 0) { q += 1; bytes(q - 1) & 0xff } else 0
      require(linkType == 0, s"non-hard link type $linkType unsupported")
      if ((flags & 0x04) != 0) q += 8 // creation order
      if ((flags & 0x10) != 0) q += 1 // charset
      val nameLenSize = 1 << (flags & 0x3)
      val nameLen = nameLenSize match {
        case 1 => bytes(q) & 0xff
        case 2 => b.getShort(q) & 0xffff
        case _ => b.getInt(q)
      }
      q += nameLenSize
      val name = new String(bytes, q, nameLen, "UTF-8")
      (name, b.getLong(q + nameLen))
    }

    def linkEntries(msgs: Seq[(Int, Int, Int)]): Seq[(String, Long)] = {
      val dense = msgs.filter(_._1 == 0x0002).flatMap { case (_, p, _) =>
        // Link Info: version(1), flags(1), [max creation index(8)],
        // fractal heap address, name-index b-tree address
        val liFlags = bytes(p + 1) & 0xff
        val heapOff = p + 2 + (if ((liFlags & 1) != 0) 8 else 0)
        val heapAddr = b.getLong(heapOff)
        if (addrOk(heapAddr)) denseLinks(heapAddr, b.getLong(heapOff + 8))
        else Nil
      }
      dense ++ msgs.filter(_._1 == 0x0006).map { case (_, p, _) => parseLink(p) }
    }

    /** Little-endian unsigned read of any 1..8-byte field (heap offsets
      * are (maxHeapBits+7)/8 wide — real libhdf5 attribute heaps use FIVE
      * bytes, so a case list over 1/2/4/8 silently over-reads).
      */
    def readVar(p: Int, n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= (bytes(p + i) & 0xffL) << (8 * i); i += 1 }
      v
    }

    /** Fractal heap resolver shared by dense LINK storage and dense
      * ATTRIBUTE storage: managed objects in a direct-root OR
      * indirect-root heap (one level of indirection — every child of the
      * root indirect block must be a direct block; deeper indirection is
      * rejected loudly). Returns (heap-space offset → file offset, idLen,
      * offSize).
      */
    def heapResolver(heapAddr: Long): (Long => Long, Int, Int) = {
      // fractal heap header
      val a = heapAddr.toInt
      require(new String(bytes, a, 4, "US-ASCII") == "FRHP",
        s"bad fractal heap header at $heapAddr")
      require((bytes(a + 4) & 0xff) == 0, "fractal heap version")
      val idLen = b.getShort(a + 5) & 0xffff
      val ioFilterLen = b.getShort(a + 7) & 0xffff
      require(ioFilterLen == 0, "filtered fractal heap unsupported")
      // fixed-width fields after flags(9): max managed size@10(4),
      // next huge id@14(8), huge bt2 addr@22(8), free space@30(8),
      // fs mgr addr@38(8), managed space@46(8), allocated space@54(8),
      // iterator offset@62(8), managed nobjects@70(8), huge size@78(8),
      // huge nobjects@86(8), tiny size@94(8), tiny nobjects@102(8)
      val maxManaged = b.getInt(a + 10)
      val hugeN = b.getLong(a + 86)
      val tinyN = b.getLong(a + 102)
      require(hugeN == 0 && tinyN == 0,
        "huge/tiny fractal heap objects unsupported (managed only)")
      // doubling table: width@110(2), starting block size@112(8),
      // max direct size@120(8), max heap size bits@128(2),
      // starting # rows@130(2), root block addr@132(8), current # rows@140(2)
      val tblWidth = b.getShort(a + 110) & 0xffff
      val startBlock = b.getLong(a + 112)
      val maxDirect = b.getLong(a + 120)
      val maxHeapBits = b.getShort(a + 128) & 0xffff
      val rootBlockAddr = b.getLong(a + 132)
      val curRows = b.getShort(a + 140) & 0xffff
      val offSize = (maxHeapBits + 7) / 8
      val lenSize = sizeBytesFor(maxManaged)
      // libhdf5 may declare a LONGER id (zero-padded): dense-attribute
      // heaps fix it at 8 bytes regardless of the offset/length widths
      require(idLen >= 1 + offSize + lenSize,
        s"fractal heap ID length $idLen < 1+$offSize+$lenSize")
      // doubling table row sizes: rows 0 and 1 use the starting size, row
      // r >= 2 doubles per row; rows past maxDirect would hold INDIRECT
      // children — one level of indirection only
      def rowBlockSize(r: Int): Long =
        if (r < 2) startBlock else startBlock << (r - 1)

      /** heap-space offset → absolute file offset of the object. The heap
        * address space is the concatenation of the blocks (each block's
        * range includes its own header bytes), so offset o lands at
        * blockFileAddr + (o − blockStartOffset).
        */
      val objFileOffset: Long => Long =
        if (curRows == 0) {
          // root IS a direct block at heap offset 0
          val d = rootBlockAddr.toInt
          require(new String(bytes, d, 4, "US-ASCII") == "FHDB",
            s"bad fractal heap direct block at $rootBlockAddr")
          (o: Long) => rootBlockAddr + o
        } else {
          // indirect blocks at ANY depth: an entry in row r spans
          // rowBlockSize(r) of heap space; spans ≤ maxDirect are direct
          // blocks, larger spans are child indirect blocks whose own
          // doubling table restarts at the starting size with
          // nrows = log2(span / (startBlock·width)) + 1 (H5HF spec)
          val blocks = Vector.newBuilder[(Long, Long, Long)]
          def childNRows(span: Long): Int = {
            var n = 0
            var v = span / (startBlock * tblWidth)
            while (v > 0) { n += 1; v >>= 1 }
            n // log2(span/(S·W)) + 1 for power-of-two spans
          }
          def walkIndirect(ibAddr: Long, base: Long, nrows: Int): Unit = {
            val ib = ibAddr.toInt
            require(new String(bytes, ib, 4, "US-ASCII") == "FHIB",
              s"bad fractal heap indirect block at $ibAddr")
            require((bytes(ib + 4) & 0xff) == 0, "fractal heap indirect version")
            val ptrBase = ib + 5 + 8 + offSize
            var heapOff = base
            var k = 0
            while (k < nrows * tblWidth) {
              val sz = rowBlockSize(k / tblWidth)
              val addr = b.getLong(ptrBase + k * 8)
              if (addrOk(addr)) {
                if (sz <= maxDirect) blocks += ((heapOff, sz, addr))
                else walkIndirect(addr, heapOff, childNRows(sz))
              }
              heapOff += sz
              k += 1
            }
          }
          walkIndirect(rootBlockAddr, 0L, curRows)
          val bs = blocks.result()
          (o: Long) => {
            val hit = bs.find(t3 => o >= t3._1 && o < t3._1 + t3._2)
              .getOrElse(throw new IllegalArgumentException(
                s"heap offset $o outside every allocated direct block"))
            val d = hit._3.toInt
            require(new String(bytes, d, 4, "US-ASCII") == "FHDB",
              s"bad fractal heap direct block at ${hit._3}")
            hit._3 + (o - hit._1)
          }
        }
      (objFileOffset, idLen, offSize)
    }

    /** Walk a v2 B-tree of record type `expectType` at ANY depth (BTIN
      * internal nodes carry records too — a B-tree, not a B+-tree),
      * computing child-pointer field widths from the spec's max-record
      * recurrences (H5B2hdr). Returns (recordSize, file offsets of every
      * record).
      */
    def walkV2Btree(btreeAddr: Long, expectType: Int): (Int, Seq[Int]) = {
      val t = btreeAddr.toInt
      require(new String(bytes, t, 4, "US-ASCII") == "BTHD",
        s"bad v2 B-tree header at $btreeAddr")
      require((bytes(t + 4) & 0xff) == 0, "v2 B-tree version")
      require((bytes(t + 5) & 0xff) == expectType,
        s"v2 B-tree type ${bytes(t + 5) & 0xff}, expected $expectType")
      val nodeSize = b.getInt(t + 6)
      val recordSize = b.getShort(t + 10) & 0xffff
      val depth = b.getShort(t + 12) & 0xffff
      val rootNodeAddr = b.getLong(t + 16)
      val rootNRecords = b.getShort(t + 24) & 0xffff

      // v2 B-tree size math (HDF5 spec / H5B2hdr): child-pointer field
      // widths derive from the maximum record counts each level can hold
      def encBytes(n: Long): Int = { // bytes to encode values up to n
        var bits = 0; var v = n
        while (v > 0) { bits += 1; v >>= 1 }
        math.max(1, (math.max(bits, 1) - 1) / 8 + 1)
      }
      val maxLeafRec = (nodeSize - 10) / recordSize
      // maxNRec(d) = max records of an internal node at depth d >= 1;
      // maxTot(d) = max records in a FULL subtree rooted at depth d
      val maxNRec = new Array[Long](depth + 1)
      val maxTot = new Array[Long](depth + 1)
      maxTot(0) = maxLeafRec.toLong
      (1 to depth).foreach { dd =>
        val ptr = 8 + encBytes(if (dd - 1 == 0) maxLeafRec.toLong else maxNRec(dd - 1)) +
          (if (dd - 1 > 0) encBytes(maxTot(dd - 1)) else 0)
        maxNRec(dd) = ((nodeSize - 10 - ptr) / (recordSize + ptr)).toLong
        maxTot(dd) = maxNRec(dd) + (maxNRec(dd) + 1) * maxTot(dd - 1)
      }

      def walkNode(addr: Long, nRec: Int, d: Int): Seq[Int] = {
        val p = addr.toInt
        if (d == 0) {
          require(new String(bytes, p, 4, "US-ASCII") == "BTLF",
            s"bad v2 B-tree leaf at $addr")
          require((bytes(p + 5) & 0xff) == expectType, "leaf record type")
          (0 until nRec).map(i => p + 6 + i * recordSize)
        } else {
          require(new String(bytes, p, 4, "US-ASCII") == "BTIN",
            s"bad v2 B-tree internal node at $addr")
          require((bytes(p + 5) & 0xff) == expectType, "internal record type")
          val childNRecSize =
            encBytes(if (d - 1 == 0) maxLeafRec.toLong else maxNRec(d - 1))
          val childTotSize = if (d - 1 > 0) encBytes(maxTot(d - 1)) else 0
          val ptrSize = 8 + childNRecSize + childTotSize
          val ptrBase = p + 6 + nRec * recordSize
          val fromChildren = (0 to nRec).flatMap { i =>
            val cp = ptrBase + i * ptrSize
            walkNode(b.getLong(cp), readVar(cp + 8, childNRecSize).toInt, d - 1)
          }
          // internal nodes carry records too (B-tree, not B+-tree)
          fromChildren ++ (0 until nRec).map(i => p + 6 + i * recordSize)
        }
      }
      (recordSize, walkNode(rootNodeAddr, rootNRecords, depth))
    }

    /** Dense group links: the name-index v2 B-tree's records carry fractal
      * heap IDs; each heap object is one serialized link message.
      */
    def denseLinks(heapAddr: Long, btreeAddr: Long): Seq[(String, Long)] = {
      val (objFileOffset, idLen, offSize) = heapResolver(heapAddr)
      val (recordSize, recs) = walkV2Btree(btreeAddr, expectType = 5)
      require(recordSize == 4 + idLen, s"link-name record size $recordSize")
      recs.map { r =>
        // record: name hash (4, lookup3) + heap ID (flags, offset, length)
        require((bytes(r + 4) & 0xff) == 0,
          "non-managed (huge/tiny) heap ID in link record")
        parseLink(objFileOffset(readVar(r + 4 + 1, offSize)).toInt)
      }
    }

    // ---- local heap + group btree + SNOD
    def heapData(heapAddr: Long): Long = {
      require(new String(bytes, heapAddr.toInt, 4, "US-ASCII") == "HEAP",
        s"bad local heap at $heapAddr")
      b.getLong(heapAddr.toInt + 24)
    }
    def cstr(off: Long): String = {
      var e = off.toInt
      while (bytes(e) != 0) e += 1
      new String(bytes, off.toInt, e - off.toInt, "UTF-8")
    }
    def groupEntries(btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
      val hd = heapData(heapAddr)
      def walk(node: Long): Seq[(String, Long)] = {
        require(new String(bytes, node.toInt, 4, "US-ASCII") == "TREE",
          s"bad group B-tree node at $node")
        val level = bytes(node.toInt + 5) & 0xff
        val n = b.getShort(node.toInt + 6) & 0xffff
        (0 until n).flatMap { i =>
          val child = b.getLong(node.toInt + 24 + 8 + i * 16)
          if (level > 0) walk(child)
          else { // SNOD
            require(new String(bytes, child.toInt, 4, "US-ASCII") == "SNOD",
              s"bad symbol node at $child")
            val ns = b.getShort(child.toInt + 6) & 0xffff
            (0 until ns).map { k =>
              val e = child.toInt + 8 + k * 40
              (cstr(hd + b.getLong(e)), b.getLong(e + 8))
            }
          }
        }
      }
      walk(btreeAddr)
    }

    // ---- message decoders
    def parseDataspace(p: Int): Seq[Int] = {
      val ver = bytes(p) & 0xff
      val rank = bytes(p + 1) & 0xff
      val dimsOff = if (ver == 1) p + 8 else p + 4 // v2: ver,rank,flags,type
      (0 until rank).map(k => b.getLong(dimsOff + k * 8).toInt)
    }
    def parseDatatype(p: Int): Datatype = {
      val cls = bytes(p) & 0x0f
      val bits0 = bytes(p + 1) & 0xff
      val size = b.getInt(p + 4)
      cls match {
        case 0 => Datatype('i', size, (bits0 & 1) != 0, (bits0 & 8) != 0)
        case 1 => Datatype('f', size, (bits0 & 1) != 0, signed = true)
        case 3 => Datatype('s', size, bigEndian = false, signed = false)
        case 7 => Datatype('r', size, bigEndian = false, signed = false)
        case 9 => Datatype('v', size, bigEndian = false, signed = false)
        case c => throw new IllegalArgumentException(
          s"HDF5 datatype class $c unsupported (fixed/float/string/reference/vlen)")
      }
    }
    def decodeValue(dt: Datatype, src: Array[Byte], off: Int): Double = {
      val vb = ByteBuffer.wrap(src).order(
        if (dt.bigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      (dt.kind, dt.size) match {
        case ('f', 8) => vb.getDouble(off)
        case ('f', 4) => vb.getFloat(off).toDouble
        case ('i', 1) => if (dt.signed) src(off).toDouble else (src(off) & 0xff).toDouble
        case ('i', 2) => if (dt.signed) vb.getShort(off).toDouble else (vb.getShort(off) & 0xffff).toDouble
        case ('i', 4) => if (dt.signed) vb.getInt(off).toDouble else (vb.getInt(off).toLong & 0xffffffffL).toDouble
        case ('i', 8) => vb.getLong(off).toDouble
        case (k, s) => throw new IllegalArgumentException(s"HDF5 value type $k$s")
      }
    }
    def parseFill(p: Int, size: Int, dt: Datatype): Option[Double] = {
      val ver = bytes(p) & 0xff
      ver match {
        case 1 | 2 =>
          if (size < 8 || bytes(p + 3) == 0) None
          else {
            val n = b.getInt(p + 4)
            if (n <= 0) None else Some(decodeValue(dt, bytes, p + 8))
          }
        case 3 =>
          val flags = bytes(p + 1) & 0xff
          if ((flags & 0x20) == 0) None
          else Some(decodeValue(dt, bytes, p + 6))
        case _ => None
      }
    }
    def parseLayout(p: Int): Layout = {
      val ver = bytes(p) & 0xff
      require(ver == 3 || ver == 4, s"data layout message v$ver unsupported")
      bytes(p + 1) & 0xff match {
        case 1 => Contiguous(b.getLong(p + 2), b.getLong(p + 10))
        case 2 if ver == 3 =>
          val ndims = bytes(p + 2) & 0xff // rank + 1 (elem size dim)
          val btree = b.getLong(p + 3)
          val dims = (0 until ndims).map(k => b.getInt(p + 11 + k * 4))
          Chunked(btree, dims.dropRight(1), dims.last)
        case 2 => // v4 chunked: flags, ndims, enc len, dims, index type
          val flags = bytes(p + 2) & 0xff
          // like v3, ndims is the dataset rank + 1: libhdf5 stores the
          // element byte size as a trailing pseudo-dimension
          val ndims = bytes(p + 3) & 0xff
          val encLen = bytes(p + 4) & 0xff
          def dimAt(q: Int): Long = encLen match {
            case 1 => bytes(q) & 0xffL
            case 2 => (b.getShort(q) & 0xffff).toLong
            case 4 => b.getInt(q).toLong & 0xffffffffL
            case _ => b.getLong(q)
          }
          val dims = (0 until ndims).map(k => dimAt(p + 5 + k * encLen).toInt)
          val chunk = dims.dropRight(1)
          val elem = dims.last
          var q = p + 5 + ndims * encLen
          val idxType = bytes(q) & 0xff
          q += 1
          idxType match {
            case 1 => // single chunk; filtered iff flags bit 1
              val (fs, fm) =
                if ((flags & 0x02) != 0) { val s = b.getLong(q); q += 12; (s, b.getInt(q - 4)) }
                else (-1L, 0)
              ChunkedV4(1, chunk, elem, b.getLong(q), 0, fs, fm)
            case 2 => ChunkedV4(2, chunk, elem, b.getLong(q), 0, -1L, 0)
            case 3 =>
              val pageBits = bytes(q) & 0xff
              ChunkedV4(3, chunk, elem, b.getLong(q + 1), pageBits, -1L, 0)
            case t => throw new IllegalArgumentException(
              s"layout v4 chunk index type $t unsupported " +
                "(single-chunk/implicit/fixed-array only; extensible-array " +
                "and v2-btree indexes come from unlimited dimensions)")
          }
        case 0 => // compact: 2-byte size then the raw data, inline (v3 + v4)
          CompactL(p + 4L, (b.getShort(p + 2) & 0xffff).toLong)
        case c => throw new IllegalArgumentException(s"layout class $c")
      }
    }
    // v1 (padded descriptions, 6 reserved bytes) and v2 (tight packing, the
    // name-length field only for filter ids >= 256)
    def parseFilters(p: Int): Seq[(Int, Seq[Int])] = {
      val ver = bytes(p) & 0xff
      require(ver == 1 || ver == 2, s"filter pipeline message v$ver")
      val nf = bytes(p + 1) & 0xff
      var q = if (ver == 1) p + 8 else p + 2
      (0 until nf).map { _ =>
        val id = b.getShort(q) & 0xffff
        val hasName = ver == 1 || id >= 256
        val nameLen = if (hasName) b.getShort(q + 2) & 0xffff else 0
        val flagsOff = q + (if (hasName) 4 else 2)
        val nvals = b.getShort(flagsOff + 2) & 0xffff
        val valsOff = flagsOff + 4 + nameLen
        val vals = (0 until nvals).map(i => b.getInt(valsOff + i * 4))
        q = valsOff + 4 * nvals
        if (ver == 1 && q % 8 != 0) q += 8 - q % 8
        (id, vals)
      }
    }

    /** Resolve one vlen-of-object-references attribute value (the
      * DIMENSION_LIST payload) through its global heap collections.
      */
    def vlenRefs(dataOff: Int, n: Int): Seq[Long] =
      (0 until n).map { i =>
        val p = dataOff + i * 16
        val gaddr = b.getLong(p + 4)
        val gidx = b.getInt(p + 12)
        require(new String(bytes, gaddr.toInt, 4, "US-ASCII") == "GCOL",
          s"bad global heap at $gaddr")
        var q = gaddr.toInt + 16
        var found = -1L
        while (found < 0) {
          val idx = b.getShort(q) & 0xffff
          val sz = b.getLong(q + 8)
          require(idx != 0, s"global heap object $gidx not found at $gaddr")
          if (idx == gidx) found = b.getLong(q + 16)
          else q += 16 + ((sz.toInt + 7) & ~7)
        }
        found
      }

    final case class Attr(name: String, str: Option[String], refs: Seq[Long])
    def parseAttr(p: Int): Attr = {
      val ver = bytes(p) & 0xff
      require(ver >= 1 && ver <= 3, s"attribute message v$ver")
      val nameSize = b.getShort(p + 2) & 0xffff
      val dtSize = b.getShort(p + 4) & 0xffff
      val dsSize = b.getShort(p + 6) & 0xffff
      val pad = ver == 1 // v1 pads each part to 8; v2/v3 do not
      def padded(n: Int) = if (pad) (n + 7) & ~7 else n
      val nameOff = p + 8 + (if (ver == 3) 1 else 0)
      val name = cstr(nameOff) // stored null-terminated
      val dtOff = nameOff + padded(nameSize)
      val dsOff = dtOff + padded(dtSize)
      val dataOff = dsOff + padded(dsSize)
      // attributes with datatype classes the scan does not model (compound,
      // enum, opaque...) are metadata we never consume — carry the name with
      // no value instead of failing the whole file (real Sentinel granules
      // attach compound attrs); DATASET datatypes stay strict
      val dt = try parseDatatype(dtOff) catch {
        case _: IllegalArgumentException => return Attr(name, None, Nil)
      }
      dt.kind match {
        case 's' =>
          var e = dataOff
          val limit = dataOff + dt.size
          while (e < limit && bytes(e) != 0) e += 1
          Attr(name, Some(new String(bytes, dataOff, e - dataOff, "UTF-8")), Nil)
        case 'v' =>
          val n = parseDataspace(dsOff).headOption.getOrElse(0)
          Attr(name, None, vlenRefs(dataOff, n))
        case 'f' | 'i' =>
          // full dataspace, comma-joined (the classic-NetCDF attr
          // convention used across this repo) — flag_masks and friends are
          // ARRAYS; keeping only element 0 silently breaks flag decoding
          val n = parseDataspace(dsOff) match {
            case s if s.isEmpty => 1
            case s => s.product
          }
          Attr(name, Some((0 until n).map(i =>
            decodeValue(dt, bytes, dataOff + i * dt.size)).mkString(",")), Nil)
        case _ => Attr(name, None, Nil)
      }
    }

    /** Dense ATTRIBUTE storage (libhdf5 switches past 8 attributes): the
      * attribute-name v2 B-tree (record type 8) indexes fractal-heap
      * objects, each one a serialized attribute message. Missing this
      * storage class would silently drop scale_factor/_FillValue and
      * mis-decode every CF-packed value.
      */
    def denseAttrs(heapAddr: Long, btreeAddr: Long): Seq[Attr] = {
      val (objFileOffset, _, offSize) = heapResolver(heapAddr)
      val (recordSize, recs) = walkV2Btree(btreeAddr, expectType = 8)
      // type-8 record: heap ID (8 bytes: version/type byte, offset,
      // length, zero-padded), message flags (1), creation order (4),
      // name hash (4)
      require(recordSize == 17, s"attribute-name record size $recordSize")
      recs.map { r =>
        require((bytes(r) & 0xff) == 0,
          "non-managed (huge/tiny) heap ID in attribute record")
        require((bytes(r + 8) & 0xff & 0x02) == 0,
          "shared attribute message unsupported")
        parseAttr(objFileOffset(readVar(r + 1, offSize)).toInt)
      }
    }

    // ---- walk all groups, collect datasets
    val datasets = mutable.ArrayBuffer.empty[Dataset]
    def visit(name: String, hdrAddr: Long): Unit = {
      val msgs = messages(hdrAddr)
      msgs.find(_._1 == 0x0011) match {
        case Some((_, p, _)) => // old-style GROUP (symbol table): recurse
          groupEntries(b.getLong(p), b.getLong(p + 8)).foreach {
            case (child, addr) =>
              visit(if (name.isEmpty) child else s"$name/$child", addr)
          }
        case None if msgs.exists(m => m._1 == 0x0002 || m._1 == 0x0006) =>
          // new-style GROUP (libver-latest): links live in header messages
          linkEntries(msgs).foreach { case (child, addr) =>
            visit(if (name.isEmpty) child else s"$name/$child", addr)
          }
        case None => // a DATASET
          val shape = msgs.find(_._1 == 0x0001).map(m => parseDataspace(m._2))
            .getOrElse(Seq.empty)
          val dt = parseDatatype(msgs.find(_._1 == 0x0003)
            .getOrElse(throw new IllegalArgumentException(s"$name: no datatype"))._2)
          val layout = parseLayout(msgs.find(_._1 == 0x0008)
            .getOrElse(throw new IllegalArgumentException(s"$name: no layout"))._2)
          val filters = msgs.find(_._1 == 0x000B).map(m => parseFilters(m._2))
            .getOrElse(Nil)
          val fill = msgs.find(_._1 == 0x0005)
            .flatMap(m => parseFill(m._2, m._3, dt))
          val denseA = msgs.filter(_._1 == 0x0015).flatMap { case (_, p, _) =>
            // Attribute Info: version(1), flags(1), [max creation idx(2)
            // when tracked], fractal heap addr(8), name B-tree addr(8)
            val fl = bytes(p + 1) & 0xff
            val ho = p + 2 + (if ((fl & 1) != 0) 2 else 0)
            val ha = b.getLong(ho)
            if (addrOk(ha)) denseAttrs(ha, b.getLong(ho + 8)) else Nil
          }
          val attrs =
            msgs.filter(_._1 == 0x000C).map(m => parseAttr(m._2)) ++ denseA
          datasets += Dataset(name, hdrAddr, shape, dt, layout, filters, fill,
            attrs.flatMap(a => a.str.map(a.name -> _)).toMap,
            attrs.find(_.name == "DIMENSION_LIST").map(_.refs).getOrElse(Nil))
      }
    }
    visit("", rootHdr)

    // ---- decode data
    def applyFilters(raw: Array[Byte], filters: Seq[(Int, Seq[Int])],
                     mask: Int): Array[Byte] =
      filters.zipWithIndex.reverse.foldLeft(raw) { case (acc, ((id, vals), i)) =>
        if ((mask & (1 << i)) != 0) acc
        else id match {
          case 1 => // deflate (zlib stream)
            val inf = new java.util.zip.Inflater()
            inf.setInput(acc)
            val bos = new java.io.ByteArrayOutputStream(acc.length * 4)
            val buf = new Array[Byte](64 * 1024)
            var made = -1
            while (!inf.finished() && made != 0) { made = inf.inflate(buf); bos.write(buf, 0, made) }
            inf.end()
            bos.toByteArray
          case 2 => // shuffle: byte-plane transpose, typesize = client value
            BloscCodec.unshuffle(acc, vals.headOption.getOrElse(1))
          case 3 => // fletcher32: 4-byte checksum appended
            java.util.Arrays.copyOf(acc, acc.length - 4)
          case other => throw new IllegalArgumentException(
            s"HDF5 filter id $other unsupported (deflate/shuffle/fletcher32)")
        }
      }

    /** Walk a chunk B-tree (any depth), yielding (element offsets, stored
      * size, filter mask, data address) per chunk — shared by the decode
      * path and the kerchunk layout scan.
      */
    def foreachChunk(btree: Long, rank: Int)(f: (Seq[Long], Int, Int, Long) => Unit): Unit = {
      def walk(node: Long): Unit = {
        require(new String(bytes, node.toInt, 4, "US-ASCII") == "TREE",
          s"bad chunk B-tree node at $node")
        val level = bytes(node.toInt + 5) & 0xff
        val cnt = b.getShort(node.toInt + 6) & 0xffff
        val keySize = 8 + 8 * (rank + 1)
        var p = node.toInt + 24
        (0 until cnt).foreach { _ =>
          val csize = b.getInt(p)
          val mask = b.getInt(p + 4)
          val offs = (0 until rank).map(k => b.getLong(p + 8 + k * 8))
          val child = b.getLong(p + keySize)
          if (level > 0) walk(child) else f(offs, csize, mask, child)
          p += keySize + 8
        }
      }
      if (addrOk(btree)) walk(btree)
    }

    /** Enumerate stored chunks of a v4 (libver-latest) chunked layout:
      * single-chunk (1), implicit (2), or non-paged fixed-array (3) index,
      * yielding the same (element offsets, stored size, filter mask,
      * address) tuples as the v1 B-tree walk.
      */
    def foreachChunkV4(lay: ChunkedV4, shape: Seq[Int], dsName: String)
                      (f: (Seq[Long], Int, Int, Long) => Unit): Unit = {
      if (!addrOk(lay.addr)) return
      val chunk = lay.chunk
      val grid = shape.zip(chunk).map { case (s, c) => (s + c - 1) / c }
      val chunkBytes = chunk.product * lay.elemSize
      def offsOf(key: Seq[Int]): Seq[Long] =
        key.zip(chunk).map { case (k, c) => k.toLong * c }
      lay.indexType match {
        case 1 => // the whole dataset is one chunk at `addr`
          val size = if (lay.filteredSize >= 0) lay.filteredSize.toInt else chunkBytes
          f(chunk.map(_ => 0L), size, lay.filterMask, lay.addr)
        case 2 => // implicit: unfiltered chunks contiguous in row-major order
          ZarrSource.allChunkKeys(grid).zipWithIndex.foreach { case (key, i) =>
            f(offsOf(key), chunkBytes, 0, lay.addr + i.toLong * chunkBytes)
          }
        case 3 => // fixed array: FAHD header -> FADB element block
          val a = lay.addr.toInt
          require(new String(bytes, a, 4, "US-ASCII") == "FAHD",
            s"$dsName: bad fixed-array header at ${lay.addr}")
          require((bytes(a + 4) & 0xff) == 0, s"$dsName: fixed-array version")
          val client = bytes(a + 5) & 0xff // 0 = plain chunks, 1 = filtered
          val entrySize = bytes(a + 6) & 0xff
          val pageBits = bytes(a + 7) & 0xff
          val nelmts = b.getLong(a + 8)
          val dbAddr = b.getLong(a + 16)
          require(nelmts <= (1L << pageBits),
            s"$dsName: paged fixed-array chunk index unsupported " +
              s"($nelmts elements over ${1L << pageBits}/page)")
          require(nelmts == grid.map(_.toLong).product,
            s"$dsName: fixed-array element count mismatch")
          if (addrOk(dbAddr)) {
            val d = dbAddr.toInt
            require(new String(bytes, d, 4, "US-ASCII") == "FADB",
              s"$dsName: bad fixed-array data block at $dbAddr")
            val elems = d + 14 // sig(4) + version(1) + client(1) + hdr addr(8)
            ZarrSource.allChunkKeys(grid).zipWithIndex.foreach { case (key, i) =>
              val e = elems + i * entrySize
              val caddr = b.getLong(e)
              if (addrOk(caddr)) {
                val (size, mask) =
                  if (client == 0) (chunkBytes, 0)
                  else {
                    val sz = (entrySize - 12) match { // addr(8) + size + mask(4)
                      case 1 => bytes(e + 8) & 0xffL
                      case 2 => (b.getShort(e + 8) & 0xffff).toLong
                      case 4 => b.getInt(e + 8).toLong & 0xffffffffL
                      case _ => b.getLong(e + 8)
                    }
                    (sz.toInt, b.getInt(e + entrySize - 4))
                  }
                f(offsOf(key), size, mask, caddr)
              }
            }
          }
      }
    }

    /** Dispatch a chunked layout (v3 B-tree / v4 index) to one enumerator. */
    def chunkIter(ds: Dataset): (Seq[Int], ((Seq[Long], Int, Int, Long) => Unit) => Unit) =
      ds.layout match {
        case Chunked(btree, ch, elemSize) =>
          require(elemSize == ds.dt.size, s"${ds.name}: chunk elem size mismatch")
          (ch, f => foreachChunk(btree, ds.shape.length)(f))
        case l: ChunkedV4 =>
          require(l.elemSize == ds.dt.size, s"${ds.name}: chunk elem size mismatch")
          (l.chunk, f => foreachChunkV4(l, ds.shape, ds.name)(f))
        case _ => throw new IllegalStateException(s"${ds.name}: not chunked")
      }

    def readData(ds: Dataset): Array[Double] = {
      val n = ds.shape.product
      val out = Array.fill(n)(ds.fill.getOrElse(0.0))
      ds.layout match {
        case Contiguous(addr, size) =>
          if (addrOk(addr)) {
            var i = 0
            while (i < n) { out(i) = decodeValue(ds.dt, bytes, (addr + i.toLong * ds.dt.size).toInt); i += 1 }
          }
        case CompactL(off, size) =>
          require(size >= n.toLong * ds.dt.size, s"${ds.name}: compact data short")
          var i = 0
          while (i < n) { out(i) = decodeValue(ds.dt, bytes, (off + i.toLong * ds.dt.size).toInt); i += 1 }
        case _ =>
          val (chunk, iterate) = chunkIter(ds)
          val rank = ds.shape.length
          val gStride = ds.shape.scanRight(1L)(_ * _).tail.toArray
          iterate { (offs, csize, mask, addr) =>
            val raw = java.util.Arrays.copyOfRange(bytes, addr.toInt, addr.toInt + csize)
            val plain = applyFilters(raw, ds.filters, mask)
            // scatter the (full-sized, fill-padded-at-edges) chunk
            val idx = new Array[Int](rank)
            val cn = chunk.product
            var flat = 0
            while (flat < cn) {
              var inBounds = true
              var global = 0L
              var k = 0
              while (k < rank) {
                val g = offs(k) + idx(k)
                if (g >= ds.shape(k)) inBounds = false
                global += g * gStride(k)
                k += 1
              }
              if (inBounds)
                out(global.toInt) = decodeValue(ds.dt, plain, flat * ds.dt.size)
              var d = rank - 1
              var carry = true
              while (carry && d >= 0) {
                idx(d) += 1
                if (idx(d) == chunk(d)) { idx(d) = 0; d -= 1 } else carry = false
              }
              flat += 1
            }
          }
      }
      out
    }

    // ---- netCDF-4 dimension semantics
    val scales = datasets.filter(_.strAttrs.get("CLASS").contains("DIMENSION_SCALE"))
    val dimsSeq = scales.map(s => NcDim(s.name, s.shape.headOption.getOrElse(0))).toSeq
    val dimIdxByAddr = scales.zipWithIndex.map { case (s, i) => s.addr -> i }.toMap
    val phony = mutable.LinkedHashMap.empty[Int, Int] // size -> dim id
    val allDims = mutable.ArrayBuffer(dimsSeq: _*)
    def phonyDim(size: Int): Int = phony.getOrElseUpdate(size, {
      allDims += NcDim(s"phony_dim_${phony.size}", size)
      allDims.length - 1
    })
    def dimIdsOf(ds: Dataset): Seq[Int] =
      if (dimIdxByAddr.contains(ds.addr)) Seq(dimIdxByAddr(ds.addr))
      else if (ds.dimRefs.nonEmpty) {
        require(ds.dimRefs.length == ds.shape.length,
          s"${ds.name}: DIMENSION_LIST rank mismatch")
        ds.dimRefs.map(r => dimIdxByAddr.getOrElse(r,
          throw new IllegalArgumentException(s"${ds.name}: dangling dimension ref")))
      } else ds.shape.map(phonyDim)
    val ncVars = datasets.map { ds =>
      val dimIds = dimIdsOf(ds)
      val ncType = (ds.dt.kind, ds.dt.size) match {
        case ('f', 8) => 6
        case ('f', 4) => 5
        case ('i', 1) => 1
        case ('i', 2) => 3
        case (_, _) => 4
      }
      NcVar(ds.name, ncType, dimIds,
        ds.strAttrs -- Seq("CLASS", "NAME", "REFERENCE_LIST", "DIMENSION_LIST"),
        if (headerOnly) Array.empty[Double] else readData(ds))
    }.toSeq
    val scans =
      if (!collectScan) Nil
      else datasets.map { ds =>
        val zdt = (if (ds.dt.bigEndian) ">" else "<") +
          (ds.dt.kind match {
            case 'f' => "f"
            case 'i' => if (ds.dt.signed) "i" else "u"
            case k => throw new IllegalArgumentException(
              s"${ds.name}: datatype '$k' not scannable to zarr")
          }) + ds.dt.size
        val dimNames = dimIdsOf(ds).map(allDims(_).name)
        // CF decode attrs travel with the scan so kerchunk refs decode
        // packed values like the direct reader
        val cf = ds.strAttrs.filter(kv => Set("scale_factor", "add_offset",
          "_FillValue", "missing_value", "_Unsigned").contains(kv._1))
        ds.layout match {
          case Contiguous(addr, size) =>
            H5VarScan(ds.name, ds.shape, ds.shape, zdt,
              deflate = false, shuffleElem = 0, fletcher = false,
              ds.fill, dimNames,
              contiguous = if (addrOk(addr)) Some((addr, size)) else None,
              chunks = Nil, cfAttrs = cf)
          case CompactL(off, size) =>
            // inline bytes sit at a plain file offset — reference them
            // exactly like a contiguous block
            H5VarScan(ds.name, ds.shape, ds.shape, zdt,
              deflate = false, shuffleElem = 0, fletcher = false,
              ds.fill, dimNames,
              contiguous = Some((off, size)),
              chunks = Nil, cfAttrs = cf)
          case _ =>
            val (chunk, iterate) = chunkIter(ds)
            val refs = Seq.newBuilder[H5ChunkRef]
            iterate { (offs, csize, mask, addr) =>
              require(mask == 0, s"${ds.name}: per-chunk filter masks not scannable")
              refs += H5ChunkRef(
                offs.zipWithIndex.map { case (o, k) => (o / chunk(k)).toInt },
                addr, csize)
            }
            val shuffleElem = ds.filters.collectFirst {
              case (2, vals) => vals.headOption.getOrElse(1)
            }.getOrElse(0)
            H5VarScan(ds.name, ds.shape, chunk, zdt,
              deflate = ds.filters.exists(_._1 == 1), shuffleElem,
              fletcher = ds.filters.exists(_._1 == 3),
              ds.fill, dimNames, contiguous = None, chunks = refs.result(),
              cfAttrs = cf)
        }
      }.toSeq
    (NcFile(allDims.toSeq, Map.empty, ncVars), scans)
  }

  // ============================================================== writing

  /** One encoded chunk: grid key (in chunk-grid units) + payload bytes. */
  private final case class ChunkBlob(offsets: Seq[Long], bytes: Array[Byte])

  /** Row-major chunk encode (fill-padded at edges) + optional shuffle and
    * deflate — shared by the default-format and libver-latest writers.
    */
  private def encodeChunks(shape: Seq[Int], chunk: Seq[Int], data: Array[Double],
                           shuffle: Boolean, deflate: Boolean): Seq[ChunkBlob] = {
    val grid = shape.zip(chunk).map { case (s, c) => (s + c - 1) / c }
    val gStride = shape.scanRight(1L)(_ * _).tail
    ZarrSource.allChunkKeys(grid).map { key =>
      val cn = chunk.product
      val buf = ByteBuffer.allocate(cn * 8).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Int](shape.length)
      var flat = 0
      while (flat < cn) {
        var inBounds = true
        var global = 0L
        var k = 0
        while (k < shape.length) {
          val g = key(k).toLong * chunk(k) + idx(k)
          if (g >= shape(k)) inBounds = false
          global += g * gStride(k)
          k += 1
        }
        buf.putDouble(if (inBounds) data(global.toInt) else Double.NaN)
        var d = shape.length - 1
        var carry = true
        while (carry && d >= 0) {
          idx(d) += 1
          if (idx(d) == chunk(d)) { idx(d) = 0; d -= 1 } else carry = false
        }
        flat += 1
      }
      var payload = buf.array()
      if (shuffle) payload = BloscCodec.shuffleBytes(payload, 8)
      if (deflate) {
        val d = new java.util.zip.Deflater(6)
        d.setInput(payload); d.finish()
        val bos = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
        val tmp = new Array[Byte](64 * 1024)
        while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
        d.end()
        payload = bos.toByteArray
      }
      ChunkBlob(key.map(k => k.toLong), payload)
    }
  }

  /** Bob Jenkins' lookup3 `hashlittle` — the checksum HDF5 stamps on every
    * piece of "latest format" metadata (superblock v3 tail, OHDR chunks,
    * fixed-array header/data blocks). Public-domain algorithm; readers here
    * don't verify it, but files we WRITE carry the real value so external
    * tools can.
    */
  private[graft] def lookup3(data: Array[Byte], from: Int, until: Int,
                             init: Int = 0): Int = {
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    var len = until - from
    var a = 0xdeadbeef + len + init
    var b = a
    var c = a
    var p = from
    def word(o: Int, n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n && i < 4) { v |= (data(o + i) & 0xff) << (8 * i); i += 1 }
      v
    }
    while (len > 12) {
      a += word(p, 4); b += word(p + 4, 4); c += word(p + 8, 4)
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; len -= 12
    }
    if (len > 0) {
      a += word(p, math.min(len, 4))
      if (len > 4) b += word(p + 4, math.min(len - 4, 4))
      if (len > 8) c += word(p + 8, len - 8)
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  /** Minimal netCDF-4 writer — the round-trip counterpart of [[parse]],
    * mirroring [[NetcdfSource.write]]'s surface: float64 coordinate
    * variables (contiguous, tagged as dimension scales) and float64 data
    * variables (chunked B-tree v1 layout with optional shuffle+deflate,
    * bound to their dims via DIMENSION_LIST). Emits the default-libhdf5
    * physical layout described in the reader's scaladoc.
    */
  def write(path: String, dims: Seq[NcDim],
            coordVars: Seq[(String, Array[Double])],
            dataVars: Seq[(String, Seq[String], Array[Double])],
            chunkOf: Map[String, Seq[Int]] = Map.empty,
            deflate: Boolean = true, shuffle: Boolean = true,
            compactCoords: Boolean = false): Unit = {
    val names = coordVars.map(_._1) ++ dataVars.map(_._1)
    require(names.distinct.size == names.size, "duplicate variable names")
    require(dims.map(_.name).toSet == coordVars.map(_._1).toSet,
      "each dim needs exactly one same-named coordinate variable")
    val dimSize = dims.map(d => d.name -> d.size).toMap
    dataVars.foreach { case (n, dn, data) =>
      require(data.length == dn.map(dimSize).product, s"$n: data length != shape")
    }

    // ---------- layout plan (single forward pass of address assignment)
    var cursor = 0L
    def alloc(n: Long): Long = { val a = cursor; cursor += n; a }
    alloc(96) // superblock v0
    val rootHdrAddr = alloc(40) // root object header: symtab message only
    val heapHdrAddr = alloc(32)
    // heap data: offset 0 is a NUL (root entry's empty name); names 8-aligned
    val sorted = names.sorted // SNOD entries must be name-ordered
    val nameOff = mutable.LinkedHashMap.empty[String, Long]
    var heapSize = 8L
    sorted.foreach { n => nameOff(n) = heapSize; heapSize += (n.length + 1 + 7) & ~7 }
    val heapDataAddr = alloc(heapSize)
    val btreeAddr = alloc(48) // one level-0 node, one SNOD child
    val snodAddr = alloc(8 + 40L * names.length)

    // object header sizes are computed exactly, then addresses assigned
    def pad8(n: Int): Int = (n + 7) & ~7
    def strAttrBody(name: String, value: String): Int =
      8 + pad8(name.length + 1) + 8 + 8 + pad8(value.length + 1)
    def dimListAttrBody(rank: Int): Int =
      8 + pad8("DIMENSION_LIST".length + 1) + 16 + 16 + rank * 16
    // compact layout (class 0) inlines the coordinate data in the header —
    // reader/kerchunk-scan coverage for files in the wild that use
    // H5D_COMPACT. Hard format limit: the 2-byte size field (< 64 KiB);
    // larger coordinates silently stay contiguous.
    def isCompact(values: Array[Double]): Boolean =
      compactCoords && values.length * 8 <= 65408
    val compactSet = coordVars.filter(cv => isCompact(cv._2)).map(_._1).toSet
    def coordHdrSize(name: String): Int =
      16 + // prefix
        (8 + 16) + // dataspace 1-D
        (8 + 24) + // datatype f8
        (8 + 16) + // fill v2 (defined, 8-byte value)
        (if (compactSet(name))
          8 + pad8(4 + 8 * dimSize(name)) // layout v3 compact, data inline
         else 8 + 24) + // layout v3 contiguous
        (8 + strAttrBody("CLASS", "DIMENSION_SCALE")) +
        (8 + strAttrBody("NAME", name))
    def dataHdrSize(rank: Int): Int =
      16 +
        (8 + pad8(8 + 8 * rank)) + // dataspace
        (8 + 24) + // datatype f8
        (8 + 16) + // fill v2
        (8 + pad8(3 + 8 + 4 * (rank + 1))) + // layout v3 chunked
        (if (deflate || shuffle)
          8 + 8 + (if (shuffle) 16 else 0) + (if (deflate) 16 else 0)
        else 0) +
        (8 + dimListAttrBody(rank))
    val hdrAddr = mutable.LinkedHashMap.empty[String, Long]
    coordVars.foreach { case (n, _) => hdrAddr(n) = alloc(coordHdrSize(n)) }
    dataVars.foreach { case (n, dn, _) => hdrAddr(n) = alloc(dataHdrSize(dn.length)) }

    // global heap: one object-reference per (dataVar, dim)
    val nRefs = dataVars.map(_._2.length).sum
    val gcolSize = {
      val need = 16 + nRefs * 24 + 16
      math.max(4096, (need + 7) & ~7)
    }
    val gcolAddr = if (nRefs > 0) alloc(gcolSize) else Undef

    val coordDataAddr = coordVars.collect {
      case (n, v) if !compactSet(n) => n -> alloc(8L * v.length)
    }.toMap

    // chunked data: encode chunks now (need sizes for the B-tree)
    def chunksFor(name: String, dimNames: Seq[String]): Seq[Int] =
      chunkOf.getOrElse(name, dimNames.map(dimSize)) // default: one chunk
    val encodedChunks: Map[String, Seq[ChunkBlob]] = dataVars.map { case (name, dn, data) =>
      val shape = dn.map(dimSize)
      val chunk = chunksFor(name, dn)
      require(chunk.length == shape.length && chunk.forall(_ > 0), s"$name: bad chunks")
      name -> encodeChunks(shape, chunk, data, shuffle, deflate)
    }.toMap
    val chunkBtreeAddr = mutable.LinkedHashMap.empty[String, Long]
    val chunkDataAddr = mutable.LinkedHashMap.empty[(String, Seq[Long]), Long]
    dataVars.foreach { case (name, dn, _) =>
      val rank = dn.length
      val keySize = 8 + 8 * (rank + 1)
      val blobs = encodedChunks(name)
      chunkBtreeAddr(name) = alloc(24L + blobs.length * (keySize + 8L) + keySize)
      blobs.foreach { cb =>
        chunkDataAddr((name, cb.offsets)) = alloc(cb.bytes.length.toLong)
      }
    }
    val fileSize = cursor
    require(fileSize <= Int.MaxValue, "HDF5 writer supports files < 2 GiB")

    // ---------- emit
    val out = ByteBuffer.allocate(fileSize.toInt).order(ByteOrder.LITTLE_ENDIAN)
    def at(addr: Long): ByteBuffer = { out.position(addr.toInt); out }

    // superblock v0
    out.put(Signature)
    out.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    out.put(8.toByte).put(8.toByte).put(0.toByte)
    out.putShort(4).putShort(16).putInt(0)
    out.putLong(0L).putLong(Undef).putLong(fileSize).putLong(Undef)
    // root symbol table entry: name offset 0, header, cached btree+heap
    out.putLong(0L).putLong(rootHdrAddr).putInt(1).putInt(0)
    out.putLong(btreeAddr).putLong(heapHdrAddr)

    // root object header: one symbol-table message
    at(rootHdrAddr).put(1.toByte).put(0.toByte).putShort(1).putInt(1)
      .putInt(24).putInt(0)
    out.putShort(0x0011).putShort(16).put(1.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    out.putLong(btreeAddr).putLong(heapHdrAddr)

    // local heap
    at(heapHdrAddr).put("HEAP".getBytes("US-ASCII")).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .putLong(heapSize).putLong(Undef).putLong(heapDataAddr)
    nameOff.foreach { case (n, off) =>
      at(heapDataAddr + off).put(n.getBytes("UTF-8")).put(0.toByte)
    }

    // group B-tree: level 0, 1 entry → SNOD
    at(btreeAddr).put("TREE".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
      .putShort(1).putLong(Undef).putLong(Undef)
      .putLong(0L) // key 0: lowest name offset
      .putLong(snodAddr)
      .putLong(nameOff(sorted.last)) // key 1
    at(snodAddr).put("SNOD".getBytes("US-ASCII")).put(1.toByte).put(0.toByte)
      .putShort(sorted.length.toShort)
    sorted.foreach { n =>
      out.putLong(nameOff(n)).putLong(hdrAddr(n)).putInt(0).putInt(0)
        .putLong(0L).putLong(0L)
    }

    // ---- message emitters
    def msg(typ: Int, size: Int): Unit = {
      out.putShort(typ.toShort).putShort(size.toShort).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      ()
    }
    def putPadded(s: String, total: Int): Unit = {
      val raw = s.getBytes("UTF-8")
      out.put(raw).put(0.toByte)
      (raw.length + 1 until total).foreach(_ => out.put(0.toByte))
    }
    def dataspaceBody(shape: Seq[Int]): Unit = {
      out.put(1.toByte).put(shape.length.toByte).put(0.toByte)
      (0 until 5).foreach(_ => out.put(0.toByte))
      shape.foreach(s => out.putLong(s.toLong))
      ()
    }
    def f8DatatypeBody(): Unit = Hdf5Source.f8DatatypeBody(out)
    def fillBody(): Unit = {
      out.put(2.toByte).put(1.toByte).put(2.toByte).put(1.toByte)
      out.putInt(8).putDouble(Double.NaN)
      ()
    }
    def strAttr(name: String, value: String): Unit = {
      val body = strAttrBody(name, value)
      msg(0x000C, body)
      out.put(1.toByte).put(0.toByte)
        .putShort((name.length + 1).toShort)
        .putShort(8.toShort)
        .putShort(8.toShort)
      putPadded(name, pad8(name.length + 1))
      // fixed ASCII null-terminated string datatype, size = len+1
      out.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .putInt(value.length + 1)
      // dataspace: scalar (rank 0)
      out.put(1.toByte).put(0.toByte).put(0.toByte)
      (0 until 5).foreach(_ => out.put(0.toByte))
      putPadded(value, pad8(value.length + 1))
    }

    coordVars.foreach { case (name, values) =>
      at(hdrAddr(name)).put(1.toByte).put(0.toByte).putShort(6)
        .putInt(1).putInt(coordHdrSize(name) - 16).putInt(0)
      msg(0x0001, 16); dataspaceBody(Seq(values.length))
      msg(0x0003, 24); f8DatatypeBody()
      msg(0x0005, 16); fillBody()
      if (compactSet(name)) {
        val body = pad8(4 + 8 * values.length)
        msg(0x0008, body)
        out.put(3.toByte).put(0.toByte) // layout v3, compact
          .putShort((8 * values.length).toShort)
        values.foreach(out.putDouble)
        (4 + 8 * values.length until body).foreach(_ => out.put(0.toByte))
        strAttr("CLASS", "DIMENSION_SCALE")
        strAttr("NAME", name)
      } else {
        msg(0x0008, 24)
        out.put(3.toByte).put(1.toByte)
          .putLong(coordDataAddr(name)).putLong(8L * values.length)
        (0 until 6).foreach(_ => out.put(0.toByte)) // 18 → 24
        strAttr("CLASS", "DIMENSION_SCALE")
        strAttr("NAME", name)
        at(coordDataAddr(name))
        values.foreach(out.putDouble)
      }
    }

    // global heap with one object reference per (dataVar, dim)
    val refIndex = mutable.LinkedHashMap.empty[(String, Int), Int]
    if (nRefs > 0) {
      at(gcolAddr).put("GCOL".getBytes("US-ASCII")).put(1.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).putLong(gcolSize.toLong)
      var idx = 1
      dataVars.foreach { case (name, dn, _) =>
        dn.indices.foreach { k =>
          refIndex((name, k)) = idx
          out.putShort(idx.toShort).putShort(1).putInt(0).putLong(8L)
          out.putLong(hdrAddr(dn(k)))
          idx += 1
        }
      }
      // free-space object (index 0) covering the remainder
      val used = 16 + nRefs * 24
      out.putShort(0).putShort(0).putInt(0).putLong((gcolSize - used).toLong)
    }

    dataVars.foreach { case (name, dn, _) =>
      val rank = dn.length
      val shape = dn.map(dimSize)
      val chunk = chunksFor(name, dn)
      val nFilters = (if (shuffle) 1 else 0) + (if (deflate) 1 else 0)
      at(hdrAddr(name)).put(1.toByte).put(0.toByte)
        .putShort((5 + (if (nFilters > 0) 1 else 0)).toShort)
        .putInt(1).putInt(dataHdrSize(rank) - 16).putInt(0)
      msg(0x0001, pad8(8 + 8 * rank)); dataspaceBody(shape)
      (8 + 8 * rank until pad8(8 + 8 * rank)).foreach(_ => out.put(0.toByte))
      msg(0x0003, 24); f8DatatypeBody()
      msg(0x0005, 16); fillBody()
      val laySize = pad8(3 + 8 + 4 * (rank + 1))
      msg(0x0008, laySize)
      out.put(3.toByte).put(2.toByte).put((rank + 1).toByte)
        .putLong(chunkBtreeAddr(name))
      chunk.foreach(c => out.putInt(c))
      out.putInt(8) // element size "dimension"
      (3 + 8 + 4 * (rank + 1) until laySize).foreach(_ => out.put(0.toByte))
      if (nFilters > 0) {
        msg(0x000B, 8 + 16 * nFilters)
        out.put(1.toByte).put(nFilters.toByte).putShort(0).putInt(0)
        if (shuffle) { // shuffle runs FIRST on write, so it is listed first
          out.putShort(2).putShort(0).putShort(1).putShort(1)
          out.putInt(8).putInt(0) // typesize, pad to 16
        }
        if (deflate) {
          out.putShort(1).putShort(0).putShort(1).putShort(1)
          out.putInt(6).putInt(0) // level, pad to 16
        }
      }
      // DIMENSION_LIST: vlen(reference) over a 1-D [rank] dataspace
      msg(0x000C, dimListAttrBody(rank))
      out.put(1.toByte).put(0.toByte)
        .putShort(("DIMENSION_LIST".length + 1).toShort)
        .putShort(16.toShort).putShort(16.toShort)
      putPadded("DIMENSION_LIST", pad8("DIMENSION_LIST".length + 1))
      out.put(0x19.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(16)
      out.put(0x17.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(8)
      dataspaceBody(Seq(rank))
      dn.indices.foreach { k =>
        out.putInt(1).putLong(gcolAddr).putInt(refIndex((name, k)))
      }

      // chunk B-tree (single level-0 node) + chunk payloads
      val blobs = encodedChunks(name)
      val keySize = 8 + 8 * (rank + 1)
      at(chunkBtreeAddr(name)).put("TREE".getBytes("US-ASCII"))
        .put(1.toByte).put(0.toByte).putShort(blobs.length.toShort)
        .putLong(Undef).putLong(Undef)
      blobs.foreach { cb =>
        out.putInt(cb.bytes.length).putInt(0)
        // key offsets are in dataset ELEMENT coordinates
        cb.offsets.zipWithIndex.foreach { case (o, k) => out.putLong(o * chunk(k)) }
        out.putLong(0L) // element-offset key component
        out.putLong(chunkDataAddr((name, cb.offsets)))
      }
      // final key: one past the last chunk in every dimension
      out.putInt(0).putInt(0)
      shape.indices.foreach(k => out.putLong(shape(k).toLong))
      out.putLong(8L)
      blobs.foreach { cb =>
        at(chunkDataAddr((name, cb.offsets))).put(cb.bytes)
      }
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.array())
    ()
  }

  /** IEEE little-endian float64 datatype message body (20 bytes + 4 pad). */
  private def f8DatatypeBody(out: ByteBuffer): Unit = {
    out.put(0x11.toByte).put(0x20.toByte).put(0x3f.toByte).put(0.toByte)
    out.putInt(8)
    out.putShort(0).putShort(64).put(52.toByte).put(11.toByte)
      .put(0.toByte).put(52.toByte).putInt(1023)
    (0 until 4).foreach(_ => out.put(0.toByte)) // pad 20 → 24
  }

  /** H5F_LIBVER_LATEST counterpart of [[write]]: same variables model, but
    * emitted in the "latest" physical layout so the reader's modern paths
    * are exercised end-to-end — superblock v3 (+lookup3 checksum), v2
    * "OHDR" object headers, a root group of compact LINK messages (no
    * symbol table / local heap / SNOD) that switches to DENSE storage
    * (fractal heap + lookup3 name-hash v2 B-tree) beyond the libhdf5
    * compact maximum of 8 links, dataspace v2, fill v3, attributes
    * v3, filter pipeline v2, and data layout v4 with the index libhdf5
    * would pick for fixed-size dims: single-chunk when the grid is one
    * chunk, fixed-array (client 1, filtered entries) under shuffle/deflate,
    * implicit (contiguous unfiltered chunks) otherwise.
    */
  def writeLatest(path: String, dims: Seq[NcDim],
                  coordVars: Seq[(String, Array[Double])],
                  dataVars: Seq[(String, Seq[String], Array[Double])],
                  chunkOf: Map[String, Seq[Int]] = Map.empty,
                  deflate: Boolean = true, shuffle: Boolean = true,
                  btNodeSize: Int = 2048,
                  heapStart: Long = 512L,
                  heapMaxDirect: Long = 8192L): Unit = {
    val names = coordVars.map(_._1) ++ dataVars.map(_._1)
    require(names.distinct.size == names.size, "duplicate variable names")
    require(names.forall(_.length < 256), "variable names must fit 1-byte link length")
    require(dims.map(_.name).toSet == coordVars.map(_._1).toSet,
      "each dim needs exactly one same-named coordinate variable")
    val dimSize = dims.map(d => d.name -> d.size).toMap
    dataVars.foreach { case (n, dn, data) =>
      require(data.length == dn.map(dimSize).product, s"$n: data length != shape")
    }
    val filtered = deflate || shuffle
    val nFilters = (if (shuffle) 1 else 0) + (if (deflate) 1 else 0)

    // per-var chunk grid, encoded payloads, v4 index kind
    final case class VarPlan(chunk: Seq[Int], grid: Seq[Int],
                             blobs: Seq[ChunkBlob], kind: Int, pageBits: Int)
    val plan: Map[String, VarPlan] = dataVars.map { case (name, dn, data) =>
      val shape = dn.map(dimSize)
      val chunk = chunkOf.getOrElse(name, shape)
      require(chunk.length == shape.length && chunk.forall(_ > 0), s"$name: bad chunks")
      val grid = shape.zip(chunk).map { case (s, c) => (s + c - 1) / c }
      val n = grid.map(_.toLong).product
      val kind = if (n == 1) 1 else if (filtered) 3 else 2
      // keep the fixed array non-paged: page size >= element count
      var pageBits = 10
      while ((1L << pageBits) < n) pageBits += 1
      name -> VarPlan(chunk, grid, encodeChunks(shape, chunk, data, shuffle, deflate),
        kind, pageBits)
    }.toMap

    // ---------- exact message-body sizes (v2 header math)
    def strAttr3Body(name: String, value: String): Int =
      9 + (name.length + 1) + 8 + 4 + (value.length + 1)
    def dimListAttr3Body(rank: Int): Int =
      9 + ("DIMENSION_LIST".length + 1) + 16 + 12 + rank * 16
    def layoutChunked4Body(rank: Int, kind: Int): Int =
      5 + (rank + 1) * 8 + 1 + (kind match {
        case 1 => (if (filtered) 12 else 0) + 8
        case 2 => 8
        case _ => 1 + 8 // page bits + address
      })
    // OHDR total = prefix(10: sig+ver+flags+4-byte chunk0 size) + msgs + cksum
    def hdrTotal(bodies: Seq[Int]): Int = 10 + bodies.map(_ + 4).sum + 4
    // beyond the libhdf5 compact-storage default (8 links) the root group
    // goes DENSE: link messages become fractal-heap objects indexed by a
    // lookup3 name-hash v2 B-tree, and the header carries only Link Info +
    // Group Info
    val dense = names.length > 8
    def linkBody(n: String): Int = 2 + 1 + n.length + 8
    val rootBodies =
      if (dense) Seq(18, 2)
      else Seq(18, 2) ++ names.map(linkBody)
    def coordBodies(name: String): Seq[Int] =
      Seq(12, 24, 14, 18,
        strAttr3Body("CLASS", "DIMENSION_SCALE"), strAttr3Body("NAME", name))
    def dataBodies(name: String, rank: Int): Seq[Int] =
      Seq(4 + 8 * rank, 24, 14, layoutChunked4Body(rank, plan(name).kind)) ++
        (if (nFilters > 0) Seq(2 + 10 * nFilters) else Nil) :+
        dimListAttr3Body(rank)

    // ---------- address assignment
    var cursor = 0L
    def alloc(n: Long): Long = { val a = cursor; cursor += n; a }
    alloc(48) // superblock v3
    val rootHdrAddr = alloc(hdrTotal(rootBodies))
    val hdrAddr = mutable.LinkedHashMap.empty[String, Long]
    coordVars.foreach { case (n, _) => hdrAddr(n) = alloc(hdrTotal(coordBodies(n))) }
    dataVars.foreach { case (n, dn, _) => hdrAddr(n) = alloc(hdrTotal(dataBodies(n, dn.length))) }
    // dense-group structures. Up to one B-tree leaf of links (185): ONE
    // root direct block + a depth-0 name-index B-tree (node size 2048).
    // Beyond that, the heap goes through a root INDIRECT block over
    // doubling-table direct blocks (512,512,1024,...,heapMaxDirect —
    // width 4) and the name index becomes a multi-level B-tree. Rows
    // whose span exceeds heapMaxDirect hold child INDIRECT blocks whose
    // own doubling table restarts at the starting size (H5HF spec) —
    // the layout libhdf5 produces for very large groups; small
    // heapMaxDirect values force that depth at modest link counts, which
    // is how the property tests exercise it.
    val FhdbHeaderSize = 17 // sig(4) + ver(1) + heap hdr addr(8) + offset(4)
    val LeafCap = (btNodeSize - 10) / 11 // records per leaf node
    val bigDense = dense && names.length > LeafCap
    require(heapStart >= 64 && (heapStart & (heapStart - 1)) == 0,
      s"heapStart $heapStart must be a power of two >= 64")
    require(heapMaxDirect >= heapStart &&
      (heapMaxDirect & (heapMaxDirect - 1)) == 0,
      s"heapMaxDirect $heapMaxDirect must be a power-of-two >= heapStart")
    val HeapWidth = 4
    def rowSpan(r: Int): Long = if (r < 2) heapStart else heapStart << (r - 1)
    // rows of a child indirect block spanning `span`:
    // nrows = log2(span / (start·width)) + 1
    def childNRowsOf(span: Long): Int = {
      var n = 0
      var v = span / (heapStart * HeapWidth)
      while (v > 0) { n += 1; v >>= 1 }
      n
    }
    // in-heap-order direct-block sizes inside one table entry of `span`
    def entryDirects(span: Long): Vector[Long] =
      if (span <= heapMaxDirect) Vector(span)
      else (0 until childNRowsOf(span)).toVector.flatMap(r =>
        (0 until HeapWidth).toVector.flatMap(_ => entryDirects(rowSpan(r))))
    // direct-block size sequence, extended root row by root row on demand
    val dirSizesBuf = mutable.ArrayBuffer.empty[Long]
    var rootRowsGen = 0
    def blkSize(k: Int): Long = {
      while (dirSizesBuf.length <= k) {
        (0 until HeapWidth).foreach(_ =>
          dirSizesBuf ++= entryDirects(rowSpan(rootRowsGen)))
        rootRowsGen += 1
      }
      dirSizesBuf(k)
    }
    // heap placement: objects packed first-fit in block order, never
    // spanning a block boundary; heap offsets include every block's header
    val linkObjOffsets: Map[String, (Long, Int)] = if (!dense) Map.empty else {
      if (!bigDense) {
        var off = FhdbHeaderSize.toLong
        names.map { n =>
          val sz = linkBody(n)
          val e = n -> ((off, sz))
          off += sz
          e
        }.toMap
      } else {
        var blk = 0
        var blkStart = 0L
        var inBlk = FhdbHeaderSize.toLong
        names.map { n =>
          val sz = linkBody(n)
          require(sz + FhdbHeaderSize <= heapMaxDirect, s"link too big: $n")
          // advance until the object fits: direct sizes are NOT monotone
          // once child indirect blocks restart the doubling table, so a
          // single step is not enough (terminates: a heapMaxDirect-sized
          // block always recurs)
          while (inBlk + sz > blkSize(blk)) {
            blkStart += blkSize(blk); blk += 1; inBlk = FhdbHeaderSize.toLong
          }
          val e = n -> ((blkStart + inBlk, sz))
          inBlk += sz
          e
        }.toMap
      }
    }
    val heapUsedBlocks: Int = if (!bigDense) 1 else {
      var end = 0L
      linkObjOffsets.values.foreach { case (o, sz) => end = math.max(end, o + sz) }
      var k = 0; var covered = blkSize(0)
      while (covered < end) { k += 1; covered += blkSize(k) }
      k + 1
    }
    // ROOT rows: enough row spans to cover the used heap space (entries
    // in a row span rowSpan(r) each, direct or indirect alike)
    val heapCurRows: Int = if (!bigDense) 0 else {
      val end = (0 until heapUsedBlocks).map(blkSize(_)).sum
      var covered = 0L; var r = 0
      while (covered < end) { covered += HeapWidth * rowSpan(r); r += 1 }
      r
    }
    val heapSlots: Int = heapCurRows * HeapWidth
    // indirect-block tree (heap-order traversal mirrors blkSize's direct
    // numbering); children whose span exceeds heapMaxDirect are emitted
    // as FHIB nodes of their own — any depth
    sealed trait HeapEntry
    final case class HDir(idx: Int) extends HeapEntry
    final class HInd(val off: Long, val rows: Int) extends HeapEntry {
      var addr: Long = Undef
      var entries: Vector[HeapEntry] = Vector.empty
    }
    def heapEntryUsed(e: HeapEntry): Boolean = e match {
      case HDir(i) => i < heapUsedBlocks
      case n: HInd => n.entries.exists(heapEntryUsed)
    }
    val heapRoot: Option[HInd] = if (!bigDense) None else {
      var dirCounter = 0
      def build(off: Long, rows: Int): HInd = {
        val node = new HInd(off, rows)
        var o = off
        node.entries = (0 until rows).toVector.flatMap { r =>
          (0 until HeapWidth).map { _ =>
            val sp = rowSpan(r)
            val e: HeapEntry =
              if (sp <= heapMaxDirect) { val i = dirCounter; dirCounter += 1; HDir(i) }
              else build(o, childNRowsOf(sp))
            o += sp
            e
          }
        }
        node
      }
      Some(build(0L, heapCurRows))
    }
    def heapIndNodes(n: HInd): Vector[HInd] =
      n +: n.entries.collect { case c: HInd if heapEntryUsed(c) => c }
        .flatMap(heapIndNodes)
    val fhdbSize: Long = if (!dense || bigDense) 0L else {
      val need = FhdbHeaderSize + names.map(linkBody).sum
      var s = 512L
      while (s < need) s *= 2
      s
    }
    // ---- name-index v2 B-tree, built bottom-up at whatever depth the
    // link count needs (records live in internal nodes too — a B-tree).
    // Field widths follow the spec's max-record recurrences so any
    // conformant reader (including ours) computes the same child-pointer
    // layout. Small btNodeSize values force depth > 1 at modest link
    // counts — how the property tests exercise the deep paths.
    val RecSize = 11 // name hash (4) + managed heap ID (1 + 4 + 2)
    val btMaxLeafRec = (btNodeSize - 10) / RecSize
    def btEncBytes(n: Long): Int = {
      var bits = 0; var v = n
      while (v > 0) { bits += 1; v >>= 1 }
      math.max(1, (math.max(bits, 1) - 1) / 8 + 1)
    }
    // recurrences to depth 8 (astronomically more than any link count)
    val btMaxNRec = new Array[Long](9)
    val btMaxTot = new Array[Long](9)
    btMaxTot(0) = btMaxLeafRec.toLong
    (1 to 8).foreach { dd =>
      val ptr = 8 + btEncBytes(if (dd == 1) btMaxLeafRec.toLong else btMaxNRec(dd - 1)) +
        (if (dd - 1 > 0) btEncBytes(btMaxTot(dd - 1)) else 0)
      btMaxNRec(dd) = (btNodeSize - 10 - ptr) / (RecSize + ptr)
      btMaxTot(dd) = btMaxNRec(dd) + (btMaxNRec(dd) + 1) * btMaxTot(dd - 1)
    }
    final case class BtRec(hash: Long, name: String)
    sealed trait BtNode {
      var addr: Long = Undef
      def nrec: Int
      def total: Long
      def level: Int
    }
    final case class BtLeaf(recs: IndexedSeq[BtRec]) extends BtNode {
      def nrec: Int = recs.length
      def total: Long = recs.length.toLong
      def level: Int = 0
    }
    final case class BtInternal(seps: IndexedSeq[BtRec],
                                children: IndexedSeq[BtNode],
                                level: Int) extends BtNode {
      def nrec: Int = seps.length
      def total: Long = seps.length + children.map(_.total).sum
      def ptrSize: Int =
        8 + btEncBytes(if (level == 1) btMaxLeafRec.toLong else btMaxNRec(level - 1)) +
          (if (level - 1 > 0) btEncBytes(btMaxTot(level - 1)) else 0)
    }
    def btNodeBytes(n: BtNode): Long = n match {
      case l: BtLeaf => 6L + RecSize.toLong * l.nrec + 4
      case i: BtInternal =>
        6L + RecSize.toLong * i.nrec + i.ptrSize.toLong * (i.nrec + 1) + 4
    }
    /** Chunk an alternating (item, sep, item, ...) run into nodes of at
      * most `fill` separators each, promoting one separator between
      * consecutive nodes to the level above.
      */
    def groupLevel(children: IndexedSeq[BtNode], seps: IndexedSeq[BtRec],
                   fill: Int, level: Int): (IndexedSeq[BtNode], IndexedSeq[BtRec]) = {
      val nodes = IndexedSeq.newBuilder[BtNode]
      val promoted = IndexedSeq.newBuilder[BtRec]
      var i = 0
      while (i < children.length) {
        val remaining = children.length - i
        var take = math.min(fill + 1, remaining)
        if (remaining - take == 1) take -= 1 // never strand a lone child
        nodes += BtInternal(seps.slice(i, i + take - 1), children.slice(i, i + take), level)
        if (i + take < children.length) promoted += seps(i + take - 1)
        i += take
      }
      (nodes.result(), promoted.result())
    }
    val btRecs: IndexedSeq[BtRec] = names.map { n =>
      val nb = n.getBytes("UTF-8")
      BtRec(lookup3(nb, 0, nb.length) & 0xffffffffL, n)
    }.sortBy(r => (r.hash, r.name)).toIndexedSeq
    val btRoot: BtNode = if (!dense) BtLeaf(IndexedSeq.empty) else {
      if (btRecs.length <= btMaxLeafRec) BtLeaf(btRecs)
      else {
        // a 1-record leaf capacity cannot tile the alternating
        // (leaf, sep, leaf) run for even record counts — the lone-child
        // adjustment would emit an empty BTLF that real libhdf5 rejects
        require(btMaxLeafRec >= 2,
          s"btNodeSize too small: leaf capacity $btMaxLeafRec < 2")
        // leaf level: ~2/3-full leaves with one separator between
        val leafFill = math.max(1, btMaxLeafRec * 2 / 3)
        val leaves = IndexedSeq.newBuilder[BtNode]
        val seps0 = IndexedSeq.newBuilder[BtRec]
        var i = 0
        while (i < btRecs.length) {
          val remaining = btRecs.length - i
          var take = math.min(leafFill, remaining)
          if (remaining - take == 1) take -= 1
          leaves += BtLeaf(btRecs.slice(i, i + take))
          if (i + take < btRecs.length) seps0 += btRecs(i + take)
          i += take + 1
        }
        var nodes: IndexedSeq[BtNode] = leaves.result()
        var seps: IndexedSeq[BtRec] = seps0.result()
        var level = 1
        while (nodes.length > 1) {
          require(level <= 8, "link-name B-tree deeper than 8")
          val fill = math.max(2, (btMaxNRec(level) * 2 / 3).toInt)
          val (nn, ss) = groupLevel(nodes, seps, fill, level)
          nodes = nn; seps = ss; level += 1
        }
        nodes.head
      }
    }
    val btDepth = btRoot.level
    def btAllNodes(n: BtNode): Seq[BtNode] = n match {
      case l: BtLeaf => Seq(l)
      case i: BtInternal => i +: i.children.flatMap(btAllNodes)
    }
    val frhpAddr = if (dense) alloc(146) else Undef
    val fhdbAddr = if (dense && !bigDense) alloc(fhdbSize) else Undef
    // every used indirect node gets an FHIB allocation (root included)
    if (bigDense) heapIndNodes(heapRoot.get).foreach(n =>
      n.addr = alloc(5L + 8 + 4 + 8L * (n.rows * HeapWidth) + 4))
    val fhibAddr = if (bigDense) heapRoot.get.addr else Undef
    val fhdbAddrs: IndexedSeq[Long] =
      if (!bigDense) IndexedSeq.empty
      else (0 until heapUsedBlocks).map(k => alloc(blkSize(k)))
    val bthdAddr = if (dense) alloc(38) else Undef
    if (dense) btAllNodes(btRoot).foreach(n => n.addr = alloc(btNodeBytes(n)))
    val nRefs = dataVars.map(_._2.length).sum
    val gcolSize = math.max(4096, (16 + nRefs * 24 + 16 + 7) & ~7)
    val gcolAddr = if (nRefs > 0) alloc(gcolSize.toLong) else Undef
    val coordDataAddr = coordVars.map { case (n, v) => n -> alloc(8L * v.length) }.toMap
    val faHdrAddr = mutable.LinkedHashMap.empty[String, Long]
    val faDataAddr = mutable.LinkedHashMap.empty[String, Long]
    val chunkAddr = mutable.LinkedHashMap.empty[(String, Seq[Long]), Long]
    dataVars.foreach { case (name, _, _) =>
      val vp = plan(name)
      if (vp.kind == 3) {
        faHdrAddr(name) = alloc(28)
        faDataAddr(name) = alloc(14L + 16L * vp.blobs.length + 4)
      }
      // implicit index relies on this allocation being contiguous, in
      // row-major key order, with every (unfiltered) chunk the same size
      vp.blobs.foreach(cb => chunkAddr((name, cb.offsets)) = alloc(cb.bytes.length.toLong))
    }
    val fileSize = cursor
    require(fileSize <= Int.MaxValue, "HDF5 writer supports files < 2 GiB")

    // ---------- emit
    val outArr = new Array[Byte](fileSize.toInt)
    val out = ByteBuffer.wrap(outArr).order(ByteOrder.LITTLE_ENDIAN)
    def at(addr: Long): ByteBuffer = { out.position(addr.toInt); out }
    def cksum(from: Long): Unit = { // checksum everything since `from`
      val pos = out.position()
      out.putInt(lookup3(outArr, from.toInt, pos))
      ()
    }

    // superblock v3
    out.put(Signature).put(3.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    out.putLong(0L).putLong(Undef).putLong(fileSize).putLong(rootHdrAddr)
    cksum(0)

    def msg2(typ: Int, size: Int): Unit = {
      out.put(typ.toByte).putShort(size.toShort).put(0.toByte)
      ()
    }
    def ohdrPrefix(addr: Long, bodies: Seq[Int]): Unit = {
      at(addr).put("OHDR".getBytes("US-ASCII")).put(2.toByte)
        .put(0x02.toByte) // flags: 4-byte chunk-0 size, nothing optional
        .putInt(bodies.map(_ + 4).sum)
      ()
    }
    def dataspace2(shape: Seq[Int]): Unit = {
      out.put(2.toByte).put(shape.length.toByte).put(0.toByte)
        .put((if (shape.isEmpty) 0 else 1).toByte) // scalar / simple
      shape.foreach(s => out.putLong(s.toLong))
      ()
    }
    def fill3(): Unit = {
      out.put(3.toByte).put(0x22.toByte) // defined, late allocation
      out.putInt(8).putDouble(Double.NaN)
      ()
    }
    def strAttr3(name: String, value: String): Unit = {
      msg2(0x0C, strAttr3Body(name, value))
      out.put(3.toByte).put(0.toByte)
        .putShort((name.length + 1).toShort).putShort(8.toShort).putShort(4.toShort)
        .put(0.toByte) // ASCII
      out.put(name.getBytes("UTF-8")).put(0.toByte)
      out.put(0x13.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .putInt(value.length + 1)
      dataspace2(Nil)
      out.put(value.getBytes("UTF-8")).put(0.toByte)
      ()
    }

    // root group header: link info + group info (+ the hard links when
    // compact; dense stores them in the fractal heap below)
    def putLinkMsgBody(n: String): Unit = {
      out.put(1.toByte).put(0.toByte) // v1, hard link, 1-byte name length
        .put(n.length.toByte).put(n.getBytes("UTF-8"))
        .putLong(hdrAddr(n))
      ()
    }
    ohdrPrefix(rootHdrAddr, rootBodies)
    msg2(0x02, 18) // link info: no creation-order tracking
    out.put(0.toByte).put(0.toByte)
    if (dense) out.putLong(frhpAddr).putLong(bthdAddr)
    else out.putLong(Undef).putLong(Undef)
    msg2(0x0A, 2) // group info: all defaults
    out.put(0.toByte).put(0.toByte)
    if (!dense) names.foreach { n =>
      msg2(0x06, linkBody(n))
      putLinkMsgBody(n)
    }
    cksum(rootHdrAddr)

    if (dense) {
      val usedSpace = heapUsedBlocks * FhdbHeaderSize.toLong +
        names.map(linkBody).sum
      val allocatedSpace =
        if (bigDense) (0 until heapUsedBlocks).map(blkSize).sum else fhdbSize
      // fractal heap header: managed objects only; root is one direct
      // block, or an indirect block over doubling-table direct blocks
      at(frhpAddr).put("FRHP".getBytes("US-ASCII")).put(0.toByte)
        .putShort(7.toShort)  // heap ID length = 1 + offset(4) + length(2)
        .putShort(0.toShort)  // no I/O filters
        .put(0.toByte)        // flags: no checksummed blocks
        .putInt(4096)         // max managed object size
        .putLong(0L).putLong(Undef)                 // huge: next id, bt2
        .putLong(allocatedSpace - usedSpace)        // free space
        .putLong(Undef)                             // free-space manager
        .putLong(allocatedSpace).putLong(allocatedSpace) // managed, allocated
        .putLong(usedSpace)                         // iterator offset
        .putLong(names.length.toLong)               // managed nobjects
        .putLong(0L).putLong(0L).putLong(0L).putLong(0L) // huge/tiny
        .putShort(HeapWidth.toShort)                // table width
        .putLong(if (bigDense) heapStart else fhdbSize) // starting block size
        .putLong(if (bigDense) heapMaxDirect else 65536L) // max direct size
        .putShort(32.toShort)                       // max heap size (bits)
        .putShort(1.toShort)                        // starting rows
        .putLong(if (bigDense) fhibAddr else fhdbAddr) // root block
        .putShort((if (bigDense) heapCurRows else 0).toShort) // cur rows
      cksum(frhpAddr)
      if (!bigDense) {
        // the direct block: header + link-message objects at their offsets
        at(fhdbAddr).put("FHDB".getBytes("US-ASCII")).put(0.toByte)
          .putLong(frhpAddr).putInt(0) // block offset 0 in heap space
        names.foreach { n =>
          at(fhdbAddr + linkObjOffsets(n)._1)
          putLinkMsgBody(n)
        }
      } else {
        // indirect blocks, root downward: entries row-major — direct
        // addresses for spans <= heapMaxDirect, child FHIB addresses
        // beyond; slots whose heap range holds no object stay undefined
        def emitInd(n: HInd): Unit = {
          at(n.addr).put("FHIB".getBytes("US-ASCII")).put(0.toByte)
            .putLong(frhpAddr).putInt(n.off.toInt)
          n.entries.foreach {
            case HDir(i) =>
              out.putLong(if (i < heapUsedBlocks) fhdbAddrs(i) else Undef)
            case c: HInd =>
              out.putLong(if (heapEntryUsed(c)) c.addr else Undef)
          }
          cksum(n.addr)
          n.entries.foreach {
            case c: HInd if heapEntryUsed(c) => emitInd(c)
            case _ => ()
          }
        }
        emitInd(heapRoot.get)
        // each direct block header carries its own heap-space offset
        var hOff = 0L
        (0 until heapUsedBlocks).foreach { k =>
          at(fhdbAddrs(k)).put("FHDB".getBytes("US-ASCII")).put(0.toByte)
            .putLong(frhpAddr).putInt(hOff.toInt)
          hOff += blkSize(k)
        }
        // objects land at (block file addr) + (heap off − block start)
        val starts = (0 until heapUsedBlocks).scanLeft(0L)((s, k) => s + blkSize(k))
        names.foreach { n =>
          val o = linkObjOffsets(n)._1
          val blkIdx = (0 until heapUsedBlocks).find(i =>
            o >= starts(i) && o < starts(i) + blkSize(i)).get
          at(fhdbAddrs(blkIdx) + (o - starts(blkIdx)))
          putLinkMsgBody(n)
        }
      }
      // name-index v2 B-tree header: root at whatever depth the link
      // count needed
      at(bthdAddr).put("BTHD".getBytes("US-ASCII")).put(0.toByte)
        .put(5.toByte) // type: indexing "link name" records
        .putInt(btNodeSize).putShort(RecSize.toShort)
        .putShort(btDepth.toShort)
        .put(100.toByte).put(40.toByte) // split/merge percents
        .putLong(btRoot.addr)
        .putShort(btRoot.nrec.toShort)
        .putLong(names.length.toLong)
      cksum(bthdAddr)
      def putRecord(r: BtRec): Unit = {
        val (off, len) = linkObjOffsets(r.name)
        out.putInt(r.hash.toInt)
        out.put(0.toByte) // heap ID: version 0, managed
        out.putInt(off.toInt)
        out.putShort(len.toShort)
        ()
      }
      def putVar(v: Long, n: Int): Unit = {
        var i = 0
        while (i < n) { out.put(((v >> (8 * i)) & 0xff).toByte); i += 1 }
      }
      def emitBtNode(node: BtNode): Unit = node match {
        case l: BtLeaf =>
          at(l.addr).put("BTLF".getBytes("US-ASCII")).put(0.toByte).put(5.toByte)
          l.recs.foreach(putRecord)
          cksum(l.addr)
        case n: BtInternal =>
          n.children.foreach(emitBtNode)
          at(n.addr).put("BTIN".getBytes("US-ASCII")).put(0.toByte).put(5.toByte)
          n.seps.foreach(putRecord)
          val cnSize =
            btEncBytes(if (n.level == 1) btMaxLeafRec.toLong else btMaxNRec(n.level - 1))
          val ctSize = if (n.level - 1 > 0) btEncBytes(btMaxTot(n.level - 1)) else 0
          n.children.foreach { c =>
            out.putLong(c.addr)
            putVar(c.nrec.toLong, cnSize)
            if (ctSize > 0) putVar(c.total, ctSize)
          }
          cksum(n.addr)
      }
      emitBtNode(btRoot)
    }

    coordVars.foreach { case (name, values) =>
      ohdrPrefix(hdrAddr(name), coordBodies(name))
      msg2(0x01, 12); dataspace2(Seq(values.length))
      msg2(0x03, 24); f8DatatypeBody(out)
      msg2(0x05, 14); fill3()
      msg2(0x08, 18)
      out.put(4.toByte).put(1.toByte) // layout v4, contiguous
        .putLong(coordDataAddr(name)).putLong(8L * values.length)
      strAttr3("CLASS", "DIMENSION_SCALE")
      strAttr3("NAME", name)
      cksum(hdrAddr(name))
      at(coordDataAddr(name))
      values.foreach(out.putDouble)
    }

    // global heap (same classic format — gheaps are version-independent)
    val refIndex = mutable.LinkedHashMap.empty[(String, Int), Int]
    if (nRefs > 0) {
      at(gcolAddr).put("GCOL".getBytes("US-ASCII")).put(1.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).putLong(gcolSize.toLong)
      var idx = 1
      dataVars.foreach { case (name, dn, _) =>
        dn.indices.foreach { k =>
          refIndex((name, k)) = idx
          out.putShort(idx.toShort).putShort(1).putInt(0).putLong(8L)
          out.putLong(hdrAddr(dn(k)))
          idx += 1
        }
      }
      val used = 16 + nRefs * 24
      out.putShort(0).putShort(0).putInt(0).putLong((gcolSize - used).toLong)
    }

    dataVars.foreach { case (name, dn, _) =>
      val rank = dn.length
      val shape = dn.map(dimSize)
      val vp = plan(name)
      ohdrPrefix(hdrAddr(name), dataBodies(name, rank))
      msg2(0x01, 4 + 8 * rank); dataspace2(shape)
      msg2(0x03, 24); f8DatatypeBody(out)
      msg2(0x05, 14); fill3()
      msg2(0x08, layoutChunked4Body(rank, vp.kind))
      out.put(4.toByte).put(2.toByte) // layout v4, chunked
        .put((if (vp.kind == 1 && filtered) 0x02 else 0x00).toByte)
        .put((rank + 1).toByte).put(8.toByte)
      vp.chunk.foreach(c => out.putLong(c.toLong))
      out.putLong(8L) // trailing element-size pseudo-dimension
      out.put(vp.kind.toByte)
      vp.kind match {
        case 1 =>
          if (filtered) { out.putLong(vp.blobs.head.bytes.length.toLong).putInt(0) }
          out.putLong(chunkAddr((name, vp.blobs.head.offsets)))
        case 2 => out.putLong(chunkAddr((name, vp.blobs.head.offsets)))
        case _ => out.put(vp.pageBits.toByte).putLong(faHdrAddr(name))
      }
      if (nFilters > 0) {
        msg2(0x0B, 2 + 10 * nFilters)
        out.put(2.toByte).put(nFilters.toByte)
        if (shuffle) { out.putShort(2).putShort(0).putShort(1).putInt(8); () }
        if (deflate) { out.putShort(1).putShort(0).putShort(1).putInt(6); () }
      }
      msg2(0x0C, dimListAttr3Body(rank))
      out.put(3.toByte).put(0.toByte)
        .putShort(("DIMENSION_LIST".length + 1).toShort)
        .putShort(16.toShort).putShort(12.toShort).put(0.toByte)
      out.put("DIMENSION_LIST".getBytes("UTF-8")).put(0.toByte)
      out.put(0x19.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(16)
      out.put(0x17.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(8)
      dataspace2(Seq(rank))
      dn.indices.foreach { k =>
        out.putInt(1).putLong(gcolAddr).putInt(refIndex((name, k)))
      }
      cksum(hdrAddr(name))

      if (vp.kind == 3) { // fixed array: header + element block
        at(faHdrAddr(name)).put("FAHD".getBytes("US-ASCII"))
          .put(0.toByte).put(1.toByte) // version, client = filtered chunks
          .put(16.toByte).put(vp.pageBits.toByte)
          .putLong(vp.blobs.length.toLong).putLong(faDataAddr(name))
        cksum(faHdrAddr(name))
        at(faDataAddr(name)).put("FADB".getBytes("US-ASCII"))
          .put(0.toByte).put(1.toByte).putLong(faHdrAddr(name))
        vp.blobs.foreach { cb =>
          out.putLong(chunkAddr((name, cb.offsets)))
            .putInt(cb.bytes.length).putInt(0) // stored size, filter mask
        }
        cksum(faDataAddr(name))
      }
      vp.blobs.foreach(cb => at(chunkAddr((name, cb.offsets))).put(cb.bytes))
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(path), outArr)
    ()
  }
}
