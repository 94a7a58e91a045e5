package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import java.nio.file.{Files, Paths}

/** Byte-level object IO for the chunked-store sources (Zarr, `.levels`
  * pyramids): local paths go through `java.nio` exactly as before; paths
  * with a URI scheme (`s3g://`, `hdfs://`, ...) go through a Hadoop
  * `FileSystem` — which is how the reference reaches every one of its
  * stores through a single fsspec filesystem object (local, s3, memory)
  * while the store code stays protocol-blind.
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

  private def fs(path: String): FileSystem =
    new HPath(path).getFileSystem(hconf)

  def exists(path: String): Boolean =
    if (isRemote(path)) fs(path).exists(new HPath(path))
    else Files.exists(Paths.get(path))

  def read(path: String): Array[Byte] =
    if (isRemote(path)) {
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
    if (exists(path)) Some(read(path)) else None

  def write(path: String, bytes: Array[Byte]): Unit =
    if (isRemote(path)) {
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
    if (isRemote(path)) fs(path).getFileStatus(new HPath(path)).getLen
    else Files.size(Paths.get(path))

  /** Positioned range read: bytes `[offset, offset+length)`; `length` -1 =
    * to EOF. Local paths use one positioned FileChannel read; remote paths
    * use the filesystem's positioned readFully — ranged GETs on object
    * stores, never a whole-object download. This is the kerchunk chunk-
    * task primitive. */
  def readRange(path: String, offset: Long, length: Long): Array[Byte] = {
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

  def delete(path: String): Unit =
    if (isRemote(path)) { fs(path).delete(new HPath(path), false); () }
    else { Files.deleteIfExists(Paths.get(path)); () }

  def mkdirs(path: String): Unit =
    if (isRemote(path)) () // object stores have no directories
    else { Files.createDirectories(Paths.get(path)); () }

  /** Immediate children of a directory as (name, isDirectory). */
  def list(path: String): Seq[(String, Boolean)] =
    if (isRemote(path))
      fs(path).listStatus(new HPath(path)).toSeq
        .map(st => (st.getPath.getName, st.isDirectory))
    else {
      val f = new java.io.File(path)
      Option(f.listFiles()).getOrElse(Array.empty).toSeq
        .map(c => (c.getName, c.isDirectory))
    }

  /** All regular files under `path`, as slash-separated RELATIVE names. */
  def walkFiles(path: String): Seq[String] =
    if (isRemote(path)) {
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
