package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import java.nio.file.{Files, Paths}

/** Byte-level object IO for the chunked-store sources (Zarr, `.levels`
  * pyramids): local paths go through `java.nio` exactly as before; paths
  * with a URI scheme (`s3g://`, `hdfs://`, ...) go through a Hadoop
  * `FileSystem`; `http://`/`https://` URLs go through direct ranged HTTP
  * (read-only, no listing — fsspec's HTTPFileSystem contract). This is
  * how the reference reaches every one of its stores through a single
  * fsspec filesystem object (local, s3, memory, https) while the store
  * code stays protocol-blind.
  *
  * Serializable BY VALUE: the instance carries only the Hadoop options the
  * remote scheme needs (e.g. `fs.s3g.impl`, `fs.s3g.endpoint`), so a chunk
  * task capturing a ByteStore on the driver reconstructs an equivalent
  * FileSystem on any executor — object statics would silently be empty on
  * a real cluster, a local-mode-only trap this type exists to avoid.
  */
final case class ByteStore(options: Map[String, String]) extends Serializable {

  @transient private lazy val hconf: Configuration = {
    val c = new Configuration()
    options.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def isRemote(path: String): Boolean = {
    val i = path.indexOf("://")
    i > 0 && !path.startsWith("file:")
  }

  /** Plain-web URLs are served by direct ranged HTTP, not a Hadoop
    * FileSystem: the protocol is READ-ONLY and has no listing, exactly
    * fsspec's HTTPFileSystem contract the reference relies on for
    * `https://` stores (kerchunk refs into hosted NetCDF archives, zarr
    * groups with consolidated metadata behind a web server). `https://`
    * takes the same code path via the JDK's TLS stack —
    * `HttpsURLConnection` IS an `HttpURLConnection`.
    */
  private def isHttp(path: String): Boolean =
    path.startsWith("http://") || path.startsWith("https://")

  /** `ftp://` URLs go through the passive-mode FTP client ([[FtpIo]]) —
    * fsspec's FTPFileSystem contract: full read/write/list, ranged
    * reads via REST. */
  private def isFtp(path: String): Boolean = path.startsWith("ftp://")

  private def httpConn(path: String, method: String,
                       range: Option[(Long, Long)] = None): java.net.HttpURLConnection = {
    val c = new java.net.URI(path).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(30000)
    c.setReadTimeout(120000)
    range.foreach { case (off, lastIncl) =>
      c.setRequestProperty("Range", s"bytes=$off-$lastIncl") }
    c
  }

  private def drainBody(c: java.net.HttpURLConnection): Array[Byte] = {
    val in = c.getInputStream
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  private def httpReadOnly(path: String, op: String): Nothing =
    throw new UnsupportedOperationException(
      s"$op over http(s) is not supported ($path): web stores are " +
        "read-only and unlisted; write through a filesystem scheme")

  private def fs(path: String): FileSystem =
    new HPath(path).getFileSystem(hconf)

  def exists(path: String): Boolean =
    if (isFtp(path)) FtpIo.size(path).isDefined || FtpIo.isDir(path)
    else if (isHttp(path)) {
      val c = httpConn(path, "HEAD")
      try c.getResponseCode match {
        case ok if ok >= 200 && ok < 300 => true
        case 404 | 410 => false
        case other => sys.error(s"HEAD $path: unexpected HTTP $other")
      } finally c.disconnect()
    } else if (isRemote(path)) fs(path).exists(new HPath(path))
    else Files.exists(Paths.get(path))

  def read(path: String): Array[Byte] =
    if (isFtp(path)) FtpIo.read(path)
    else if (isHttp(path)) {
      val c = httpConn(path, "GET")
      try {
        val code = c.getResponseCode
        if (code == 404 || code == 410)
          throw new java.io.FileNotFoundException(path)
        require(code >= 200 && code < 300, s"GET $path: HTTP $code")
        drainBody(c)
      } finally c.disconnect()
    } else if (isRemote(path)) {
      val in = fs(path).open(new HPath(path))
      try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](256 * 1024)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toByteArray
      } finally in.close()
    } else Files.readAllBytes(Paths.get(path))

  def readIfExists(path: String): Option[Array[Byte]] =
    if (isFtp(path))
      // one RETR round trip; 550 answers map to absent
      try Some(FtpIo.read(path))
      catch { case _: java.io.FileNotFoundException => None }
    else if (isHttp(path))
      // one round trip per chunk: GET and treat 404 as absent (the
      // HEAD-then-GET shape would double every chunk task's latency)
      try Some(read(path)) catch { case _: java.io.FileNotFoundException => None }
    else if (exists(path)) Some(read(path)) else None

  def write(path: String, bytes: Array[Byte]): Unit =
    if (isFtp(path)) FtpIo.write(path, bytes)
    else if (isHttp(path)) httpReadOnly(path, "write")
    else if (isRemote(path)) {
      val out = fs(path).create(new HPath(path), true)
      try out.write(bytes) finally out.close()
    } else {
      val p = Paths.get(path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.write(p, bytes)
      ()
    }

  /** Object/file size in bytes. */
  def size(path: String): Long =
    if (isFtp(path))
      FtpIo.size(path).getOrElse(throw new java.io.FileNotFoundException(path))
    else if (isHttp(path)) {
      val c = httpConn(path, "HEAD")
      try {
        val code = c.getResponseCode
        if (code == 404 || code == 410)
          throw new java.io.FileNotFoundException(path)
        require(code >= 200 && code < 300, s"HEAD $path: HTTP $code")
        val len = c.getContentLengthLong
        require(len >= 0, s"HEAD $path: server sent no Content-Length")
        len
      } finally c.disconnect()
    } else if (isRemote(path)) fs(path).getFileStatus(new HPath(path)).getLen
    else Files.size(Paths.get(path))

  /** Positioned range read: bytes `[offset, offset+length)`; `length` -1 =
    * to EOF. Local paths use one positioned FileChannel read; remote paths
    * use the filesystem's positioned readFully — ranged GETs on object
    * stores, never a whole-object download. This is the kerchunk chunk-
    * task primitive. */
  def readRange(path: String, offset: Long, length: Long): Array[Byte] = {
    if (isFtp(path)) {
      require(offset >= 0, s"$path: negative range offset $offset")
      require(length <= Int.MaxValue - 8,
        s"$path: $length-byte range exceeds the 2 GiB task buffer " +
          "(re-index the source with finer chunking)")
      return FtpIo.read(path, offset, length)
    }
    if (isHttp(path)) return httpReadRange(path, offset, length)
    val total = size(path)
    val len = if (length >= 0) length else total - offset
    require(offset >= 0 && offset + len <= total,
      s"$path: range [$offset, +$len) beyond EOF $total")
    require(len <= Int.MaxValue - 8,
      s"$path: $len-byte range exceeds the 2 GiB task buffer " +
        "(re-index the source with finer chunking)")
    if (isRemote(path)) {
      val in = fs(path).open(new HPath(path))
      try {
        val buf = new Array[Byte](len.toInt)
        in.readFully(offset, buf)
        buf
      } finally in.close()
    } else {
      val ch = java.nio.channels.FileChannel.open(
        Paths.get(path), java.nio.file.StandardOpenOption.READ)
      try {
        val buf = java.nio.ByteBuffer.allocate(len.toInt)
        var pos = offset
        while (buf.hasRemaining) {
          val n = ch.read(buf, pos)
          require(n > 0, s"$path: short read at $pos")
          pos += n
        }
        buf.array()
      } finally ch.close()
    }
  }

  /** Ranged GET, ONE round trip (no pre-flight HEAD — a kerchunk chunk
    * fetch is exactly one request). A 200 answer to a ranged request
    * means the server IGNORED the Range header; silently accepting it
    * would hand the caller the wrong bytes, so it rejects loudly unless
    * the requested range actually started at 0 and ran to EOF.
    */
  private def httpReadRange(path: String, offset: Long, length: Long): Array[Byte] = {
    require(offset >= 0, s"$path: negative range offset $offset")
    require(length <= Int.MaxValue - 8,
      s"$path: $length-byte range exceeds the 2 GiB task buffer " +
        "(re-index the source with finer chunking)")
    if (length == 0) return Array.emptyByteArray
    val range = if (length > 0) (offset, offset + length - 1)
                else (offset, -1L) // open-ended "bytes=offset-"
    val c = httpConn(path, "GET", Some(range))
    if (range._2 < 0) // open-ended: emit "bytes=N-" not "bytes=N--1"
      c.setRequestProperty("Range", s"bytes=$offset-")
    try {
      val code = c.getResponseCode
      if (code == 404 || code == 410)
        throw new java.io.FileNotFoundException(path)
      require(code == 206 || (code == 200 && offset == 0 && length < 0),
        s"GET $path range [$offset,+$length): HTTP $code " +
          (if (code == 200) "(server ignored the Range header)" else ""))
      val body = drainBody(c)
      require(length < 0 || body.length == length,
        s"GET $path: asked for $length bytes, got ${body.length}")
      body
    } finally c.disconnect()
  }

  /** Coalesced positioned reads: fetch many `(offset, length)` ranges of
    * ONE object with as few round trips as the kerchunk reference-store
    * contract allows — ranges whose gap is ≤ `maxGap` merge into one
    * request, merged blocks are capped at `maxBlock` (the reference's
    * `max_gap`/`max_block` defaults are 64 KB / 256 MB,
    * `store/ref/store.py:40-48`). Returns payloads in INPUT order.
    *
    * This is the multi-ref task primitive: a task holding n chunk refs
    * into the same granule (a multi-variable DSv2 read, neighboring HDF5
    * chunks) pays one ranged GET per merged block instead of one per
    * ref — on an object store at 100 TB, request count is the cost that
    * dominates small-chunk reads. Over-read bytes inside a merged gap
    * are bounded by `maxGap` per merge and discarded after slicing.
    */
  def readRanges(path: String, ranges: Seq[(Long, Long)],
                 maxGap: Long = 64L * 1024,
                 maxBlock: Long = 256L * 1024 * 1024): Seq[Array[Byte]] = {
    ranges.foreach { case (off, len) =>
      require(off >= 0 && len >= 0, s"$path: bad range ($off, $len)")
    }
    if (ranges.isEmpty) return Nil
    if (ranges.length == 1)
      return Seq(readRange(path, ranges.head._1, ranges.head._2))
    // sort by offset, greedily merge while the gap is small and the
    // merged block stays bounded; overlaps merge unconditionally
    val order = ranges.zipWithIndex.sortBy(_._1._1)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, scala.collection.mutable.ArrayBuffer[Int])] // (start, end, members)
    order.foreach { case ((off, len), i) =>
      val end = off + len
      blocks.lastOption match {
        case Some((bs, be, members))
            if off <= be + maxGap && math.max(be, end) - bs <= maxBlock =>
          members += i
          blocks(blocks.length - 1) = (bs, math.max(be, end), members)
        case _ =>
          blocks += ((off, end, scala.collection.mutable.ArrayBuffer(i)))
      }
    }
    val out = new Array[Array[Byte]](ranges.length)
    blocks.foreach { case (bs, be, members) =>
      val block = readRange(path, bs, be - bs)
      members.foreach { i =>
        val (off, len) = ranges(i)
        out(i) = java.util.Arrays.copyOfRange(
          block, (off - bs).toInt, (off - bs + len).toInt)
      }
    }
    out.toSeq
  }

  def delete(path: String): Unit =
    if (isFtp(path)) FtpIo.delete(path)
    else if (isHttp(path)) httpReadOnly(path, "delete")
    else if (isRemote(path)) { fs(path).delete(new HPath(path), false); () }
    else { Files.deleteIfExists(Paths.get(path)); () }

  def mkdirs(path: String): Unit =
    if (isFtp(path)) FtpIo.mkdirs(path)
    else if (isHttp(path)) () // read-only and directory-free; writes reject
    else if (isRemote(path)) () // object stores have no directories
    else { Files.createDirectories(Paths.get(path)); () }

  /** Immediate children of a directory as (name, isDirectory). */
  def list(path: String): Seq[(String, Boolean)] =
    if (isFtp(path))
      // NLST names; a child with no SIZE answer is a directory (the
      // portable heuristic — SIZE is file-only on FTP servers)
      FtpIo.list(path).map { n =>
        (n, FtpIo.size(s"${path.stripSuffix("/")}/$n").isEmpty)
      }
    else if (isHttp(path)) httpReadOnly(path, "list")
    else if (isRemote(path))
      fs(path).listStatus(new HPath(path)).toSeq
        .map(st => (st.getPath.getName, st.isDirectory))
    else {
      val f = new java.io.File(path)
      Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .map(c => (c.getName, c.isDirectory))
    }

  /** [[walkFiles]] with each file's byte size — the listing already
    * carries lengths on every backend, so callers that need sizes (the
    * zarr scanner's one-ref-per-chunk index) avoid a HEAD/stat per file. */
  def walkFilesSized(path: String): Seq[(String, Long)] =
    if (isFtp(path)) {
      def walk(prefix: String): Seq[(String, Long)] =
        FtpIo.list(s"${path.stripSuffix("/")}/$prefix").flatMap { n =>
          val rel = if (prefix.isEmpty) n else s"$prefix/$n"
          FtpIo.size(s"${path.stripSuffix("/")}/$rel") match {
            case Some(sz) => Seq((rel, sz))
            case None => walk(rel)
          }
        }
      walk("")
    }
    else if (isHttp(path)) httpReadOnly(path, "walkFilesSized")
    else if (isRemote(path)) {
      val base = new HPath(path).toUri.getPath.stripSuffix("/")
      val it = fs(path).listFiles(new HPath(path), true)
      val out = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val st = it.next()
        out += ((st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/"),
          st.getLen))
      }
      out.result()
    } else {
      val dir = Paths.get(path)
      val walk = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(Files.isRegularFile(_))
          .map(p => (dir.relativize(p).toString.replace('\\', '/'),
            Files.size(p)))
          .toSeq
      } finally walk.close()
    }

  /** All regular files under `path`, as slash-separated RELATIVE names. */
  def walkFiles(path: String): Seq[String] =
    if (isFtp(path)) walkFilesSized(path).map(_._1)
    else if (isHttp(path)) httpReadOnly(path, "walkFiles")
    else if (isRemote(path)) {
      val base = new HPath(path).toUri.getPath.stripSuffix("/")
      val it = fs(path).listFiles(new HPath(path), true)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        out += st.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
      }
      out.result()
    } else {
      val dir = Paths.get(path)
      val walk = Files.walk(dir)
      try {
        val it = walk.filter(p => Files.isRegularFile(p)).iterator()
        val out = Seq.newBuilder[String]
        while (it.hasNext)
          out += dir.relativize(it.next()).toString.replace('\\', '/')
        out.result()
      } finally walk.close()
    }
}

object ByteStore {
  /** Bare local path (no scheme, not a file: URI) — THE scheme-detection
    * predicate, shared so scanners and directory probes cannot drift. */
  def isLocal(path: String): Boolean =
    path.indexOf("://") < 0 && !path.startsWith("file:")


  /** Process-registered Hadoop options for remote schemes. Driver-side
    * code (tests, queries) registers e.g. the s3g endpoint once; every
    * `ByteStore.current` snapshot after that carries the options into its
    * task closures. */
  @volatile private var registered: Map[String, String] = Map.empty

  def register(key: String, value: String): Unit = synchronized {
    registered = registered + (key -> value)
  }

  /** Snapshot of the currently-registered options — capture this into a
    * `val` BEFORE building an executor-side closure (the Zarr/Kerchunk/JP2
    * readers do). Calling `current` directly INSIDE a task sees only the
    * options registered in that executor's JVM — identical in local mode,
    * empty on a remote executor — so library code that fans out must
    * capture, not re-resolve. */
  def current: ByteStore = ByteStore(registered)
}
