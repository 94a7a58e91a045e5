package graft.sources.s3

import java.io.{BufferedOutputStream, DataOutputStream, InputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.concurrent.TrieMap

/** In-JVM S3-compatible object server — the offline stand-in for the moto
  * server the reference spins up for its S3 store tests
  * (`test/core/store/fs/test_fs.py` S3 cases run against a local moto
  * endpoint; `xcube/util/temp.py` + s3fs wire the client side). Everything
  * here is the PUBLIC S3 REST protocol (path-style requests):
  *
  *  - `PUT /bucket`                      → create bucket
  *  - `PUT /bucket/key`                  → put object
  *  - `GET /bucket/key` (+ `Range`)      → get object / ranged get (206)
  *  - `HEAD /bucket/key`                 → object metadata
  *  - `DELETE /bucket/key`               → delete object
  *  - `GET /bucket?list-type=2&prefix=&delimiter=&continuation-token=`
  *                                       → ListObjectsV2 XML
  *
  * Auth headers are accepted and ignored (moto's default mode). The server
  * is a plain `ServerSocket` + thread-per-connection HTTP/1.1 loop with
  * `Connection: close` semantics — deliberately dependency-free; it exists
  * to exercise OUR client/FileSystem against the wire protocol, not to be
  * a production endpoint.
  */
final class S3Emulator {

  // (bucket, key) -> (bytes, mtimeMillis). The emulator is test-scale by
  // design: objects live on the driver heap.
  private val objects = TrieMap.empty[(String, String), (Array[Byte], Long)]
  private val buckets = TrieMap.empty[String, Long]
  // bucket -> local directory served READ-ONLY as that bucket's objects —
  // the reference's webapi S3 emulation (`webapi/s3/listbucket.py`): expose
  // server-side datasets (e.g. a .zarr group) AS a virtual S3 bucket
  // without copying bytes. PUT/DELETE on a mounted bucket are rejected.
  private val mounts = TrieMap.empty[String, String]
  private val clock = new java.util.concurrent.atomic.AtomicLong(1700000000000L)
  // per-method request tallies — lets specs assert IO behavior (e.g.
  // "coalescing halved the GET count", "the provider opened the group once")
  private val reqCounts =
    TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]

  /** Requests served so far for `method` ("GET", "HEAD", ...) since start
    * or the last [[resetRequestCounts]]. */
  def requestCount(method: String): Long =
    reqCounts.get(method).map(_.get).getOrElse(0L)
  def resetRequestCounts(): Unit = reqCounts.clear()

  @volatile private var server: ServerSocket = null
  @volatile private var running = false

  def port: Int = server.getLocalPort
  def endpoint: String = s"http://127.0.0.1:$port"

  def objectCount(bucket: String): Int = objects.keys.count(_._1 == bucket)
  def createBucket(bucket: String): Unit = { buckets.put(bucket, tick()); () }

  /** Serve `dir`'s files as the (read-only) contents of `bucket`. */
  def mountDir(bucket: String, dir: String): Unit = {
    mounts.put(bucket, dir)
    buckets.put(bucket, tick()); ()
  }

  /** Resolve a key against a mounted directory (None when not mounted /
    * not a file / path escapes the mount). */
  private def mountedFile(bucket: String, key: String): Option[java.io.File] =
    mounts.get(bucket).flatMap { d =>
      val base = new java.io.File(d).getCanonicalFile
      val f = new java.io.File(base, key).getCanonicalFile
      if (f.isFile && f.getPath.startsWith(base.getPath)) Some(f) else None
    }

  private def mountedListing(bucket: String): Seq[(String, Int, Long)] =
    mounts.get(bucket).toSeq.flatMap { d =>
      val base = java.nio.file.Paths.get(d)
      if (!java.nio.file.Files.isDirectory(base)) Seq.empty
      else {
        val walk = java.nio.file.Files.walk(base)
        try {
          val it = walk.filter(java.nio.file.Files.isRegularFile(_)).iterator()
          val out = Seq.newBuilder[(String, Int, Long)]
          while (it.hasNext) {
            val p = it.next()
            out += ((base.relativize(p).toString.replace('\\', '/'),
              java.nio.file.Files.size(p).toInt,
              java.nio.file.Files.getLastModifiedTime(p).toMillis))
          }
          out.result()
        } finally walk.close()
      }
    }

  private def tick(): Long = clock.addAndGet(1000L)

  def start(): S3Emulator = synchronized {
    require(server == null, "already started")
    server = new ServerSocket()
    server.bind(new InetSocketAddress("127.0.0.1", 0))
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handleConnection(sock), "graft-s3-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => () } // closed during accept
      }
    }, "graft-s3-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    this
  }

  def stop(): Unit = synchronized {
    running = false
    if (server != null) { server.close(); server = null }
    objects.clear(); buckets.clear()
  }

  // -------------------------------------------------------------- HTTP --

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    sb.toString
  }

  private def handleConnection(sock: Socket): Unit = {
    try {
      sock.setSoTimeout(30000)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
      val reqLine = readLine(in)
      if (reqLine.nonEmpty) {
        val parts = reqLine.split(" ")
        val (method, target) = (parts(0), parts(1))
        var contentLength = 0L
        var range: Option[(Long, Option[Long])] = None
        var line = readLine(in)
        while (line.nonEmpty) {
          val idx = line.indexOf(':')
          if (idx > 0) {
            val name = line.substring(0, idx).trim.toLowerCase
            val value = line.substring(idx + 1).trim
            if (name == "content-length") contentLength = value.toLong
            if (name == "range") range = parseRange(value)
          }
          line = readLine(in)
        }
        val body = if (contentLength > 0) {
          val buf = new Array[Byte](contentLength.toInt)
          var off = 0
          while (off < buf.length) {
            val n = in.read(buf, off, buf.length - off)
            require(n >= 0, "truncated request body")
            off += n
          }
          buf
        } else Array.emptyByteArray
        handleRequest(method, target, range, body, out)
      }
      out.flush()
      sock.close()
    } catch { case _: Exception => try sock.close() catch { case _: Exception => () } }
  }

  private def parseRange(v: String): Option[(Long, Option[Long])] =
    // "bytes=a-b" or "bytes=a-"
    if (!v.startsWith("bytes=")) None
    else v.stripPrefix("bytes=").split("-", 2) match {
      case Array(a, "") => Some((a.toLong, None))
      case Array(a, b) => Some((a.toLong, Some(b.toLong)))
      case _ => None
    }

  private def respond(out: DataOutputStream, code: Int, reason: String,
      body: Array[Byte], headers: Seq[(String, String)] = Nil,
      omitBody: Boolean = false): Unit = {
    out.writeBytes(s"HTTP/1.1 $code $reason\r\n")
    headers.foreach { case (k, v) => out.writeBytes(s"$k: $v\r\n") }
    out.writeBytes(s"Content-Length: ${body.length}\r\n")
    out.writeBytes("Connection: close\r\n\r\n")
    if (!omitBody) out.write(body)
  }

  private def xmlError(code: String, msg: String): Array[Byte] =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<Error><Code>$code</Code><Message>$msg</Message></Error>""".stripMargin
      .getBytes(UTF_8)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  private def handleRequest(method: String, target: String,
      range: Option[(Long, Option[Long])], body: Array[Byte],
      out: DataOutputStream): Unit = {
    reqCounts.getOrElseUpdate(method,
      new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    val qIdx = target.indexOf('?')
    val rawPath = if (qIdx >= 0) target.substring(0, qIdx) else target
    val query = if (qIdx >= 0) target.substring(qIdx + 1) else ""
    val params: Map[String, String] = query.split("&").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> URLDecoder.decode(v, "UTF-8")
        case Array(k) => k -> ""
      }
    }.toMap
    val path = rawPath.split("/", 3).toList match {
      case "" :: rest => rest
      case rest => rest
    }
    val bucket = path.headOption.getOrElse("")
    val key = if (path.size > 1)
      URLDecoder.decode(path(1).replace("+", "%2B"), "UTF-8") else ""

    (method, key.isEmpty) match {
      case ("PUT", true) =>
        // create-bucket on a mounted bucket is a no-op success (S3 returns
        // BucketAlreadyOwnedByYou); only object writes are forbidden
        if (!mounts.contains(bucket)) createBucket(bucket)
        respond(out, 200, "OK", Array.emptyByteArray)
      case ("PUT", false) =>
        if (mounts.contains(bucket))
          respond(out, 403, "Forbidden", xmlError("AccessDenied",
            s"$bucket is a read-only mounted bucket"))
        else {
          createBucket(bucket)
          objects.put((bucket, key), (body, tick()))
          respond(out, 200, "OK", Array.emptyByteArray,
            Seq("ETag" -> s""""${md5hex(body)}""""))
        }
      case ("GET", true) | ("HEAD", true) if params.contains("list-type") || method == "GET" =>
        respond(out, 200, "OK", listV2(bucket, params))
      case ("GET", false) | ("HEAD", false) =>
        objects.get((bucket, key))
          .orElse(mountedFile(bucket, key).map(f =>
            (java.nio.file.Files.readAllBytes(f.toPath), f.lastModified()))) match {
          case None =>
            respond(out, 404, "Not Found", xmlError("NoSuchKey", key),
              omitBody = method == "HEAD")
          case Some((bytes, mtime)) =>
            val hdrs = Seq("ETag" -> s""""${md5hex(bytes)}"""",
              "Last-Modified" -> httpDate(mtime),
              "Accept-Ranges" -> "bytes")
            range match {
              case None =>
                respond(out, 200, "OK", bytes, hdrs, omitBody = method == "HEAD")
              case Some((a, bOpt)) =>
                val endIncl = math.min(bOpt.getOrElse(bytes.length - 1L), bytes.length - 1L)
                if (a > endIncl || a >= bytes.length)
                  respond(out, 416, "Range Not Satisfiable",
                    xmlError("InvalidRange", s"$a-$endIncl/${bytes.length}"))
                else {
                  val slice = java.util.Arrays.copyOfRange(bytes, a.toInt, endIncl.toInt + 1)
                  respond(out, 206, "Partial Content", slice, hdrs ++ Seq(
                    "Content-Range" -> s"bytes $a-$endIncl/${bytes.length}"),
                    omitBody = method == "HEAD")
                }
            }
        }
      case ("DELETE", false) =>
        if (mounts.contains(bucket))
          respond(out, 403, "Forbidden", xmlError("AccessDenied",
            s"$bucket is a read-only mounted bucket"))
        else {
          objects.remove((bucket, key))
          respond(out, 204, "No Content", Array.emptyByteArray)
        }
      case ("DELETE", true) =>
        buckets.remove(bucket)
        respond(out, 204, "No Content", Array.emptyByteArray)
      case _ =>
        respond(out, 400, "Bad Request", xmlError("BadRequest", method))
    }
  }

  private def httpDate(millis: Long): String = {
    val fmt = new java.text.SimpleDateFormat("EEE, dd MMM yyyy HH:mm:ss 'GMT'",
      java.util.Locale.US)
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("GMT"))
    fmt.format(new java.util.Date(millis))
  }

  private def iso(millis: Long): String = {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("GMT"))
    fmt.format(new java.util.Date(millis))
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** ListObjectsV2 (the only list API our FileSystem client speaks). */
  private def listV2(bucket: String, params: Map[String, String]): Array[Byte] = {
    val prefix = params.getOrElse("prefix", "")
    val delimiter = params.get("delimiter").filter(_.nonEmpty)
    val maxKeys = params.get("max-keys").map(_.toInt).getOrElse(1000)
    val startAfter = params.getOrElse("continuation-token",
      params.getOrElse("start-after", ""))

    val all = (objects.toSeq
      .collect { case ((b, k), (bytes, mtime)) if b == bucket && k.startsWith(prefix) =>
        (k, bytes.length, mtime) }
      ++ mountedListing(bucket).filter(_._1.startsWith(prefix)))
      .sortBy(_._1)
      .dropWhile { case (k, _, _) => startAfter.nonEmpty && k <= startAfter }

    // fold keys into contents/common-prefixes under the delimiter
    val contents = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long)]
    val prefixes = scala.collection.mutable.LinkedHashSet.empty[String]
    var truncated = false
    var lastKey = ""
    val it = all.iterator
    while (it.hasNext && !truncated) {
      val (k, sz, mt) = it.next()
      val rolled = delimiter.flatMap { dl =>
        val rest = k.substring(prefix.length)
        val i = rest.indexOf(dl)
        if (i >= 0) Some(prefix + rest.substring(0, i + dl.length)) else None
      }
      if (contents.size + prefixes.size >= maxKeys) truncated = true
      else {
        rolled match {
          case Some(p) => prefixes.add(p)
          case None => contents.append((k, sz, mt))
        }
        lastKey = k
      }
    }

    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8"?>""")
    sb.append("<ListBucketResult>")
    sb.append(s"<Name>${xmlEscape(bucket)}</Name>")
    sb.append(s"<Prefix>${xmlEscape(prefix)}</Prefix>")
    sb.append(s"<KeyCount>${contents.size + prefixes.size}</KeyCount>")
    sb.append(s"<MaxKeys>$maxKeys</MaxKeys>")
    sb.append(s"<IsTruncated>$truncated</IsTruncated>")
    if (truncated)
      sb.append(s"<NextContinuationToken>${xmlEscape(lastKey)}</NextContinuationToken>")
    contents.foreach { case (k, sz, mt) =>
      sb.append("<Contents>")
      sb.append(s"<Key>${xmlEscape(k)}</Key>")
      sb.append(s"<LastModified>${iso(mt)}</LastModified>")
      sb.append(s"<Size>$sz</Size>")
      sb.append("<StorageClass>STANDARD</StorageClass>")
      sb.append("</Contents>")
    }
    prefixes.foreach { p =>
      sb.append(s"<CommonPrefixes><Prefix>${xmlEscape(p)}</Prefix></CommonPrefixes>")
    }
    sb.append("</ListBucketResult>")
    sb.toString.getBytes(UTF_8)
  }
}

/** Process-wide emulator used by tests and the `q_s3_store` oracle query:
  * one lazily-started server per JVM, torn down with the JVM. */
object S3Emulator {
  lazy val shared: S3Emulator = new S3Emulator().start()
}
