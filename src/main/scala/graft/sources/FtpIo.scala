package graft.sources

/** Minimal passive-mode FTP client for `ftp://` stores — the fsspec
  * FTPFileSystem analog (reference store protocol list,
  * xcube/plugin.py:82-89 registers "ftp" stores through fsspec).
  *
  * RFC 959 command set plus SIZE/REST from RFC 3659. Anonymous login,
  * binary TYPE I, passive data connections only (works through NAT and
  * needs no server-to-client connectivity), ONE control connection per
  * operation — the store contract is stateless per call, mirroring
  * ByteStore's http branch. Ranged reads are REST <offset> + RETR with
  * an early data-socket close once `length` bytes have arrived (the
  * standard FTP resume primitive; the 426 the server may then send on
  * the control channel is expected and absorbed).
  *
  * Scale note: like the http branch this is a per-call protocol client —
  * an executor task reading n chunks pays n control round-trips. FTP has
  * no multiplexing; archives at 100 TB should be fronted by http/s3
  * (kerchunk refs), with ftp as the ingest/long-tail protocol, which is
  * exactly how the reference treats it.
  */
object FtpIo {

  final case class Loc(host: String, port: Int, path: String)

  def parse(url: String): Loc = {
    require(url.startsWith("ftp://"), s"not an ftp url: $url")
    val rest = url.stripPrefix("ftp://")
    val slash = rest.indexOf('/')
    val hostPort = if (slash < 0) rest else rest.substring(0, slash)
    val path = if (slash < 0) "/" else rest.substring(slash)
    hostPort.split(':') match {
      case Array(h, p) => Loc(h, p.toInt, path)
      case Array(h) => Loc(h, 21, path)
      case _ => throw new IllegalArgumentException(s"bad ftp host: $url")
    }
  }

  private final class Ctl(host: String, port: Int) {
    val sock = new java.net.Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), 30000)
    sock.setSoTimeout(120000)
    private val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, "ISO-8859-1"))
    private val out =
      new java.io.OutputStreamWriter(sock.getOutputStream, "ISO-8859-1")

    /** One (possibly multi-line) server reply → (code, last-line text). */
    def reply(): (Int, String) = {
      var line = in.readLine()
      if (line == null) sys.error("FTP: control connection closed")
      val code = line.take(3).toInt
      if (line.length > 3 && line(3) == '-') {
        val end = line.take(3) + " "
        while (line != null && !line.startsWith(end)) line = in.readLine()
        if (line == null) sys.error("FTP: truncated multi-line reply")
      }
      (code, line.drop(4))
    }

    def cmd(c: String): (Int, String) = {
      out.write(c + "\r\n"); out.flush(); reply()
    }

    def close(): Unit = {
      try { cmd("QUIT"); () } catch { case _: Throwable => () }
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private def connect(loc: Loc): Ctl = {
    val c = new Ctl(loc.host, loc.port)
    val (g, gm) = c.reply()
    require(g == 220, s"FTP greeting: $g $gm")
    val (u, um) = c.cmd("USER anonymous")
    if (u == 331) {
      val (p, pm) = c.cmd("PASS graft@")
      require(p == 230, s"FTP PASS: $p $pm")
    } else require(u == 230, s"FTP USER: $u $um")
    val (t, tm) = c.cmd("TYPE I")
    require(t == 200, s"FTP TYPE I: $t $tm")
    c
  }

  private val PasvHostPort =
    """\((\d+),(\d+),(\d+),(\d+),(\d+),(\d+)\)""".r.unanchored

  private def pasv(c: Ctl): java.net.Socket = {
    val (code, msg) = c.cmd("PASV")
    require(code == 227, s"FTP PASV: $code $msg")
    msg match {
      case PasvHostPort(h1, h2, h3, h4, p1, p2) =>
        val s = new java.net.Socket()
        s.connect(new java.net.InetSocketAddress(
          s"$h1.$h2.$h3.$h4", p1.toInt * 256 + p2.toInt), 30000)
        s.setSoTimeout(120000)
        s
      case _ => sys.error(s"FTP PASV: unparseable reply '$msg'")
    }
  }

  private def withCtl[A](url: String)(f: (Ctl, String) => A): A = {
    val loc = parse(url)
    val c = connect(loc)
    try f(c, loc.path) finally c.close()
  }

  /** File size via SIZE; None for "no such file" (550) — which FTP also
    * answers for directories, matching the object-store view where only
    * files exist. */
  def size(url: String): Option[Long] = withCtl(url) { (c, p) =>
    val (code, msg) = c.cmd(s"SIZE $p")
    if (code == 213) Some(msg.trim.toLong) else None
  }

  /** Directory probe via CWD (the portable way — SIZE answers 550 for
    * directories on most servers). */
  def isDir(url: String): Boolean = withCtl(url) { (c, p) =>
    c.cmd(s"CWD $p")._1 == 250
  }

  /** RETR bytes `[offset, offset+length)`; `length` < 0 = to EOF. */
  def read(url: String, offset: Long = 0L, length: Long = -1L): Array[Byte] =
    if (length == 0) Array.emptyByteArray
    else withCtl(url) { (c, p) =>
      if (offset > 0) {
        val (r, rm) = c.cmd(s"REST $offset")
        require(r == 350, s"FTP REST $offset: $r $rm")
      }
      val data = pasv(c)
      val (code, msg) = c.cmd(s"RETR $p")
      if (code == 550) {
        data.close()
        throw new java.io.FileNotFoundException(url)
      }
      require(code == 150 || code == 125, s"FTP RETR $p: $code $msg")
      val bos = new java.io.ByteArrayOutputStream()
      try {
        val in = data.getInputStream
        val buf = new Array[Byte](256 * 1024)
        var n = in.read(buf)
        while (n >= 0 && (length < 0 || bos.size() < length)) {
          val keep =
            if (length < 0) n
            else math.min(n.toLong, length - bos.size()).toInt
          bos.write(buf, 0, keep)
          n = if (length >= 0 && bos.size() >= length) -1 else in.read(buf)
        }
      } finally data.close() // early close aborts the rest of a ranged RETR
      // transfer-complete (226) after a full read; 426/451 after an
      // early abort — both are the protocol working as designed
      val (done, _) = c.reply()
      require(done == 226 || done == 250 || done == 426 || done == 451,
        s"FTP RETR completion: $done")
      val out = bos.toByteArray
      require(length < 0 || out.length == length,
        s"FTP RETR $url: asked for $length bytes at $offset, " +
          s"got ${out.length}")
      out
    }

  /** Bare child names via NLST (the emulator and most servers return
    * names relative to the listed directory; absolute forms are
    * normalized to their basename). */
  def list(url: String): Seq[String] = withCtl(url) { (c, p) =>
    val data = pasv(c)
    val (code, msg) = c.cmd(s"NLST $p")
    if (code == 550) { data.close(); Nil }
    else {
      require(code == 150 || code == 125, s"FTP NLST $p: $code $msg")
      val lines =
        try {
          val r = new java.io.BufferedReader(new java.io.InputStreamReader(
            data.getInputStream, "ISO-8859-1"))
          Iterator.continually(r.readLine()).takeWhile(_ != null).toList
        } finally data.close()
      val (done, _) = c.reply()
      require(done == 226 || done == 250, s"FTP NLST completion: $done")
      lines.map(_.trim).filter(_.nonEmpty)
        .map(l => l.substring(l.lastIndexOf('/') + 1))
        .filterNot(n => n == "." || n == "..")
    }
  }

  /** STOR (parents created with best-effort MKDs, like `mkdir -p`). */
  def write(url: String, bytes: Array[Byte]): Unit = withCtl(url) { (c, p) =>
    val parts = p.split('/').filter(_.nonEmpty).dropRight(1)
    parts.inits.toSeq.reverse.drop(1).foreach { pre =>
      c.cmd(s"MKD /${pre.mkString("/")}") // 257 or 550-already-exists
    }
    val data = pasv(c)
    val (code, msg) = c.cmd(s"STOR $p")
    require(code == 150 || code == 125, s"FTP STOR $p: $code $msg")
    try {
      data.getOutputStream.write(bytes)
      data.getOutputStream.flush()
    } finally data.close()
    val (done, _) = c.reply()
    require(done == 226 || done == 250, s"FTP STOR completion: $done")
  }

  def delete(url: String): Unit = withCtl(url) { (c, p) =>
    c.cmd(s"DELE $p") // 250, or 550 for absent — deleteIfExists semantics
    ()
  }

  def mkdirs(url: String): Unit = withCtl(url) { (c, p) =>
    val parts = p.split('/').filter(_.nonEmpty)
    parts.inits.toSeq.reverse.drop(1).foreach { pre =>
      c.cmd(s"MKD /${pre.mkString("/")}")
    }
  }
}
