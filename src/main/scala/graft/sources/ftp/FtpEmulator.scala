package graft.sources.ftp

import java.io.File
import java.net.{InetAddress, ServerSocket, Socket}
import scala.collection.concurrent.TrieMap

/** In-JVM passive-mode FTP server test double — the S3Emulator pattern
  * (`sources/s3/S3Emulator.scala`) applied to the one reference store
  * protocol (`xcube/plugin.py:82-89` registers "ftp") that was
  * untestable offline until now: local directories are mounted under a
  * top-level name and served over real loopback sockets, so the
  * `ftp://` branch of [[graft.sources.ByteStore]] is exercised through
  * the genuine protocol (control + data connections, PASV, REST
  * ranges), not a mock.
  *
  * Command set: the RFC 959 core the [[graft.sources.FtpIo]] client and
  * fsspec's FTPFileSystem actually speak — USER/PASS (anonymous only),
  * SYST, FEAT, TYPE, PWD, CWD, PASV, SIZE, REST, RETR, NLST, STOR,
  * DELE, MKD, QUIT. Active mode (PORT) is intentionally absent: the
  * client is passive-only, as any NAT-era client must be.
  *
  * Deliberately NOT a production server: one thread per control
  * connection, no auth, no TLS — it exists so ftp-store tests run
  * hermetically with zero egress.
  */
final class FtpEmulator {

  // top-level name -> served directory (read-write: STOR/DELE/MKD land
  // in the mounted directory, which tests point at scratch space)
  private val mounts = TrieMap.empty[String, String]

  private var server: ServerSocket = _
  @volatile private var running = false

  def port: Int = server.getLocalPort
  def endpoint: String = s"ftp://127.0.0.1:$port"

  def mountDir(name: String, dir: String): Unit = { mounts.put(name, dir); () }

  /** Resolve an absolute FTP path onto a mounted directory; None when
    * the mount is unknown or the path escapes it. */
  private def resolve(path: String): Option[File] = {
    val parts = path.split('/').filter(_.nonEmpty)
    if (parts.isEmpty) None
    else mounts.get(parts.head).flatMap { root =>
      val f = new File((root +: parts.tail).mkString("/"))
      val rootCanon = new File(root).getCanonicalPath
      if (f.getCanonicalPath.startsWith(rootCanon)) Some(f) else None
    }
  }

  def start(): FtpEmulator = synchronized {
    if (!running) {
      server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
      running = true
      val t = new Thread(() => acceptLoop(), "ftp-emulator-accept")
      t.setDaemon(true)
      t.start()
    }
    this
  }

  private def acceptLoop(): Unit =
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => session(s), "ftp-emulator-session")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => if (!running) return }
    }

  private def session(sock: Socket): Unit = {
    sock.setSoTimeout(120000)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(sock.getInputStream, "ISO-8859-1"))
    val out = new java.io.OutputStreamWriter(sock.getOutputStream, "ISO-8859-1")
    def send(line: String): Unit = { out.write(line + "\r\n"); out.flush() }
    var dataServer: Option[ServerSocket] = None
    var restOffset = 0L
    var cwd = "/"
    def closeData(): Unit = {
      dataServer.foreach(d => try d.close() catch { case _: Throwable => () })
      dataServer = None
    }
    /** Run `body` over an accepted data connection; emits 150/226 (or
      * 426 when the peer aborts the transfer mid-stream). */
    def withData(open: String)(body: Socket => Unit): Unit =
      dataServer match {
        case None => send("425 Use PASV first.")
        case Some(ds) =>
          send(s"150 $open")
          try {
            val d = ds.accept()
            try body(d) finally d.close()
            send("226 Transfer complete.")
          } catch {
            case _: Throwable => send("426 Connection closed; aborted.")
          } finally closeData()
      }
    def abs(arg: String): String =
      if (arg.startsWith("/")) arg
      else (cwd.stripSuffix("/") + "/" + arg)
    try {
      send("220 graft FTP emulator ready.")
      var line = in.readLine()
      while (line != null) {
        val (cmd, arg) = line.indexOf(' ') match {
          case -1 => (line.toUpperCase, "")
          case i => (line.take(i).toUpperCase, line.drop(i + 1).trim)
        }
        cmd match {
          case "USER" => send("331 Anonymous, send any password.")
          case "PASS" => send("230 Logged in.")
          case "SYST" => send("215 UNIX Type: L8")
          case "FEAT" => send("211-Features:"); send(" SIZE"); send(" REST STREAM"); send("211 End")
          case "TYPE" => send("200 Type set.")
          case "NOOP" => send("200 OK.")
          case "PWD" => send(s"""257 "$cwd"""")
          case "CWD" =>
            val target = abs(arg)
            if (target == "/" || resolve(target).exists(_.isDirectory)) {
              cwd = target; send("250 CWD ok.")
            } else send("550 No such directory.")
          case "PASV" =>
            closeData()
            val ds = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
            dataServer = Some(ds)
            val p = ds.getLocalPort
            send(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256}).")
          case "SIZE" =>
            resolve(abs(arg)).filter(_.isFile) match {
              case Some(f) => send(s"213 ${f.length}")
              case None => send("550 No such file.")
            }
          case "REST" =>
            restOffset = arg.toLongOption.getOrElse(0L)
            send(s"350 Restarting at $restOffset.")
          case "RETR" =>
            resolve(abs(arg)).filter(_.isFile) match {
              case None => closeData(); send("550 No such file.")
              case Some(f) =>
                val off = restOffset; restOffset = 0L
                withData("Opening BINARY connection.") { d =>
                  val ch = java.nio.channels.FileChannel.open(
                    f.toPath, java.nio.file.StandardOpenOption.READ)
                  try {
                    val outS = d.getOutputStream
                    val buf = java.nio.ByteBuffer.allocate(256 * 1024)
                    var pos = off
                    var n = ch.read(buf, pos)
                    while (n > 0) {
                      outS.write(buf.array(), 0, n)
                      pos += n
                      buf.clear()
                      n = ch.read(buf, pos)
                    }
                    outS.flush()
                  } finally ch.close()
                }
            }
          case "NLST" =>
            val target = abs(if (arg.isEmpty) cwd else arg)
            val children: Option[Seq[String]] =
              if (target == "/") Some(mounts.keys.toSeq.sorted)
              else resolve(target).filter(_.isDirectory)
                .map(dir => Option(dir.list()).getOrElse(Array.empty[String])
                  .toSeq.sorted)
            children match {
              case None => closeData(); send("550 No such directory.")
              case Some(names) =>
                withData("Here comes the directory listing.") { d =>
                  val w = new java.io.OutputStreamWriter(
                    d.getOutputStream, "ISO-8859-1")
                  names.foreach(n => w.write(n + "\r\n"))
                  w.flush()
                }
            }
          case "STOR" =>
            resolve(abs(arg)) match {
              case None => closeData(); send("550 Not mounted.")
              case Some(f) =>
                Option(f.getParentFile).foreach(_.mkdirs())
                withData("Ok to send data.") { d =>
                  val fos = new java.io.FileOutputStream(f)
                  try {
                    val buf = new Array[Byte](256 * 1024)
                    val inS = d.getInputStream
                    var n = inS.read(buf)
                    while (n >= 0) { fos.write(buf, 0, n); n = inS.read(buf) }
                  } finally fos.close()
                }
            }
          case "DELE" =>
            resolve(abs(arg)).filter(_.isFile) match {
              case Some(f) => f.delete(); send("250 Deleted.")
              case None => send("550 No such file.")
            }
          case "MKD" =>
            resolve(abs(arg)) match {
              case Some(f) =>
                if (f.isDirectory) send("550 Already exists.")
                else if (f.mkdirs()) send(s"""257 "$arg" created.""")
                else send("550 Cannot create.")
              case None => send("550 Not mounted.")
            }
          case "QUIT" => send("221 Goodbye."); line = null
          case _ => send(s"502 Command not implemented: $cmd")
        }
        if (line != null) line = in.readLine()
      }
    } catch { case _: Throwable => () }
    finally {
      closeData()
      try sock.close() catch { case _: Throwable => () }
    }
  }
}

object FtpEmulator {
  lazy val shared: FtpEmulator = new FtpEmulator().start()
}
