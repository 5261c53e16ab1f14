package graft.mlflow

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket, SocketException}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean

/** F2 — the reference's anonymous-write FTP artifact endpoint
  * (`composable_logs/mlflow_server/server.py:259-326`: a pyftpdlib server
  * with one anonymous write-enabled home; a stock `MLFLOW_*`-configured
  * client uploads artifacts to `ftp://…/<traceparent>/<artifact-path>`).
  *
  * This is a minimal RFC 959 subset on JDK sockets — no dependencies —
  * implementing exactly what MLflow's `ftplib`-based
  * `FTPArtifactRepository` issues: USER/PASS (anonymous only), SYST, TYPE,
  * PWD/CWD/MKD (virtual directories, auto-vivified like the reference's
  * permissive home), PASV/EPSV + STOR for upload, RETR/SIZE for read-back,
  * QUIT. Uploaded bytes flow to the same `logBytes` callback as the HTTP
  * PUT path (first path segment = traceparent, rest = artifact name), with
  * the same traversal guard at the protocol boundary.
  *
  * Scale note: this is a driver-side control-plane endpoint (one workflow's
  * artifacts, driver-sized by the reference's contract) — not a data-path
  * operator; data-plane artifact movement belongs in the parquet sinks.
  */
final class MlflowFtpServer(
    logBytes: (String, String, Array[Byte]) => Unit,
    port: Int = 0,
    maxStoreBytes: Long = 64L << 20,
    maxUploadBytes: Long = 256L << 20,
    maxDirs: Int = 4096) {

  private val server = new ServerSocket(port, 16, InetAddress.getByName("127.0.0.1"))
  private val running = new AtomicBoolean(true)
  /** Read-back store so RETR/SIZE can serve what STOR accepted. Bounded:
    * the DURABLE sink is the `logBytes` callback — this map only serves a
    * workflow's recent artifacts back to the client, so oldest uploads are
    * evicted once the byte budget is exceeded (a long-running driver must
    * not accumulate every upload in heap). */
  private val files = new java.util.LinkedHashMap[String, Array[Byte]]()
  private var storedBytes = 0L

  private def store(path: String, bytes: Array[Byte]): Unit = files.synchronized {
    Option(files.remove(path)).foreach(old => storedBytes -= old.length)
    files.put(path, bytes)
    storedBytes += bytes.length
    val it = files.entrySet().iterator()
    val evicted = List.newBuilder[String]
    while (storedBytes > maxStoreBytes && it.hasNext) {
      val e = it.next(); storedBytes -= e.getValue.length
      evicted += e.getKey; it.remove()
    }
    // a directory whose entries were all evicted serves nothing anymore —
    // drop it (deepest first, so emptied ancestors cascade) or the dir set
    // outlives every file it was registered for
    evicted.result().foreach { p =>
      val segs = p.split("/").toSeq
      (segs.length - 1 to 1 by -1).foreach { i =>
        val d = segs.take(i).mkString("/")
        dirs.synchronized { if (childrenOf(d).isEmpty) dirs.remove(d) }
      }
    }
  }
  private def lookup(path: String): Option[Array[Byte]] =
    files.synchronized(Option(files.get(path)))

  /** Known virtual directories (registered by MKD and implicitly by STOR
    * parents). CWD succeeds ONLY for these: MLflow's artifact client
    * implements `_is_dir(p)` as "does cwd(p) succeed", so an auto-vivified
    * CWD that accepts any path would classify every stored FILE as a
    * directory and break stock-client download. Growth is bounded two
    * ways: store eviction trims dirs whose files fell out (above), and
    * past `MaxDirs` a prune sweep drops the oldest CHILDLESS dirs
    * (pure-MKD leftovers). A dir with live children is never evicted —
    * dropping it would 550 a CWD to a directory whose artifacts still
    * serve — so the map can exceed the cap only by dirs that the byte-
    * budgeted file store itself bounds. */
  private val dirs = new java.util.LinkedHashMap[String, java.lang.Boolean]()

  private def registerParents(segs: Seq[String]): Unit = {
    dirs.synchronized {
      (1 until segs.length).foreach(i =>
        dirs.put(segs.take(i).mkString("/"), java.lang.Boolean.TRUE))
    }
    pruneDirs()
  }

  /** Sweep oldest-first, evicting only childless dirs; repeat while the
    * sweep makes progress — removing a chain's leaf makes its parent
    * childless, and a single pass would trim only one level per call,
    * letting a deep pure-MKD chain outgrow the cap. Lock order matches
    * [[store]] (files, then dirs) — taking dirs first here and files
    * inside `childrenOf` would deadlock against a concurrent upload. */
  private def pruneDirs(): Unit = files.synchronized {
    dirs.synchronized {
      var progress = true
      while (dirs.size > maxDirs && progress) {
        progress = false
        val it = dirs.keySet().iterator()
        while (dirs.size > maxDirs && it.hasNext) {
          if (childrenOf(it.next()).isEmpty) { it.remove(); progress = true }
        }
      }
    }
  }

  /** Child entries (names) directly under a virtual directory. */
  private def childrenOf(path: String): Seq[String] = {
    val prefix = if (path.isEmpty) "" else path + "/"
    def child(full: String): Option[String] =
      if (full.startsWith(prefix) && full.length > prefix.length)
        Some(full.drop(prefix.length).takeWhile(_ != '/'))
      else None
    import scala.jdk.CollectionConverters._
    val fileKids = files.synchronized(files.keySet().asScala.toSeq).flatMap(child)
    val dirKids = dirs.synchronized(dirs.keySet().asScala.toSeq).flatMap(child)
    (fileKids ++ dirKids).distinct.sorted
  }

  /** Read at most `cap` bytes; None if the stream holds more (the caller
    * rejects the upload instead of buffering it unbounded). */
  private def readUpTo(in: java.io.InputStream, cap: Long): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      if (out.size().toLong + n > cap) return None
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    Some(out.toByteArray)
  }

  def boundPort: Int = server.getLocalPort
  def uri: String = s"ftp://127.0.0.1:$boundPort"

  /** Live control sockets and PASV/EPSV listeners, tracked so [[stop]] can
    * tear down ACTIVE sessions — closing only the accept socket would leave
    * session threads (and their data listeners) running until the client
    * goes away, which a long-lived driver accumulates. */
  private val sessions = java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()
  private val dataListeners =
    java.util.concurrent.ConcurrentHashMap.newKeySet[ServerSocket]()

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        // register FIRST, then re-check: a stop() racing between the
        // accept and the add would snapshot `sessions` without this
        // socket and never close it — after the add, either stop()'s
        // sweep sees it or this check does (close is idempotent)
        sessions.add(sock)
        if (!running.get()) { sessions.remove(sock); sock.close() }
        else {
          val t = new Thread(() => session(sock), "mlflow-ftp-session")
          t.setDaemon(true)
          t.start()
        }
      } catch {
        // SocketException: closed during stop(); any other IO hiccup must
        // not kill the accept loop while the server is still running
        case _: java.io.IOException =>
      }
    }
  }, "mlflow-ftp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running.set(false)
    server.close()
    import scala.jdk.CollectionConverters._
    // closing a session's control socket pops its blocking readLine with an
    // exception; the session's finally-block then releases its own state
    sessions.asScala.toSeq.foreach(s =>
      try s.close() catch { case _: java.io.IOException => })
    dataListeners.asScala.toSeq.foreach(l =>
      try l.close() catch { case _: java.io.IOException => })
  }

  /** True once [[stop]] has run: the accept socket and every tracked
    * session socket and PASV/EPSV data listener are closed. Specs assert
    * teardown on THIS state rather than by connecting to the freed ports —
    * the OS can re-issue a just-freed ephemeral port to another process
    * between `stop()` and the probe, making a connect-refused assertion
    * nondeterministic under a concurrent test JVM. */
  def stopped: Boolean = {
    import scala.jdk.CollectionConverters._
    server.isClosed &&
      sessions.asScala.forall(_.isClosed) &&
      dataListeners.asScala.forall(_.isClosed)
  }

  // ---- per-connection session ----

  private def session(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = sock.getOutputStream
    def reply(line: String): Unit = {
      out.write((line + "\r\n").getBytes(StandardCharsets.UTF_8))
      out.flush()
    }
    var user: String = null
    var loggedIn = false
    var cwd = "/"
    var dataListener: ServerSocket = null

    def openData(): Option[Socket] = Option(dataListener).flatMap { l =>
      try Some(l.accept())
      catch { case _: java.io.IOException => None }
      finally { l.close(); dataListeners.remove(l); dataListener = null }
    }

    def newDataListener(): ServerSocket = {
      if (dataListener != null) { dataListener.close(); dataListeners.remove(dataListener) }
      val l = new ServerSocket(0, 1, InetAddress.getByName("127.0.0.1"))
      l.setSoTimeout(15000)
      dataListeners.add(l)
      dataListener = l
      l
    }

    /** Resolve `arg` against the virtual cwd → clean segment list; None on
      * traversal/absolute escapes (the pyftpdlib home confined uploads the
      * same way). */
    def resolve(arg: String): Option[Seq[String]] = {
      val full = if (arg.startsWith("/")) arg else s"$cwd/$arg"
      val segs = full.split("/").filter(s => s.nonEmpty && s != ".")
      if (segs.contains("..")) None else Some(segs.toSeq)
    }

    try {
      reply("220 composable-logs mlflow artifact FTP ready")
      var open = true
      while (open) {
        val line = in.readLine()
        if (line == null) { open = false }
        else {
          val (cmd, arg) = line.split(" ", 2) match {
            case Array(c, a) => (c.toUpperCase, a)
            case Array(c) => (c.toUpperCase, "")
          }
          cmd match {
            case "USER" => user = arg; reply("331 password required")
            case "PASS" =>
              if (user == "anonymous") { loggedIn = true; reply("230 anonymous login ok") }
              else reply("530 only anonymous login is supported")
            case _ if !loggedIn => reply("530 not logged in")
            case "SYST" => reply("215 UNIX Type: L8")
            case "TYPE" => reply("200 type set")
            case "NOOP" => reply("200 ok")
            case "PWD" => reply(s"""257 "$cwd" is the current directory""")
            case "CWD" =>
              resolve(arg) match {
                // only root and KNOWN directories: MLflow probes
                // file-vs-directory with cwd, so success here must mean
                // "is a directory" (a stored file path must 550)
                case Some(segs)
                    if segs.isEmpty ||
                      dirs.synchronized(dirs.containsKey(segs.mkString("/"))) =>
                  cwd = "/" + segs.mkString("/"); reply("250 CWD ok")
                case Some(_) => reply("550 no such directory")
                case None => reply("550 path rejected (traversal)")
              }
            case "MKD" =>
              resolve(arg) match {
                case Some(segs) if segs.nonEmpty =>
                  dirs.synchronized {
                    (1 to segs.length).foreach(i => // target + intermediates
                      dirs.put(segs.take(i).mkString("/"), java.lang.Boolean.TRUE))
                  }
                  pruneDirs()
                  reply(s"""257 "/${segs.mkString("/")}" created""")
                case Some(_) => reply("550 cannot create root")
                case None => reply("550 path rejected (traversal)")
              }
            case "PASV" =>
              val p = newDataListener().getLocalPort
              reply(s"227 Entering Passive Mode (127,0,0,1,${p / 256},${p % 256})")
            case "EPSV" =>
              reply(s"229 Entering Extended Passive Mode (|||${newDataListener().getLocalPort}|)")
            case "STOR" =>
              resolve(arg) match {
                case None => reply("550 path rejected (traversal)")
                case Some(segs) if segs.size < 2 =>
                  // first segment is the owning traceparent, like the
                  // reference's <traceparent>/<artifact-path> layout
                  reply("550 upload path must be /<traceparent>/<artifact-path>")
                case Some(segs) =>
                  reply("150 ready for data")
                  openData() match {
                    case None => reply("425 no data connection")
                    case Some(data) =>
                      // bounded read: the cap must apply DURING the read —
                      // buffering an arbitrary upload before checking it
                      // would OOM the driver the budget exists to protect
                      val bytes =
                        try readUpTo(data.getInputStream, maxUploadBytes)
                        finally data.close()
                      bytes match {
                        case None =>
                          reply(s"552 upload exceeds $maxUploadBytes bytes")
                        case Some(b) =>
                          registerParents(segs)
                          store(segs.mkString("/"), b)
                          logBytes(segs.head, segs.tail.mkString("/"), b)
                          reply("226 transfer complete")
                      }
                  }
              }
            case "SIZE" =>
              resolve(arg).map(_.mkString("/")).flatMap(lookup) match {
                case Some(b) => reply(s"213 ${b.length}")
                case None => reply("550 no such file")
              }
            case "RETR" =>
              resolve(arg).map(_.mkString("/")).flatMap(lookup) match {
                case None => reply("550 no such file")
                case Some(bytes) =>
                  reply("150 ready for data")
                  openData() match {
                    case None => reply("425 no data connection")
                    case Some(data) =>
                      val os: OutputStream = data.getOutputStream
                      try { os.write(bytes); os.flush() } finally data.close()
                      reply("226 transfer complete")
                  }
              }
            case "NLST" =>
              // directory listing (MLflow's download path lists artifact
              // dirs): names only, one per line over the data connection
              resolve(arg) match {
                case None => reply("550 path rejected (traversal)")
                case Some(segs) =>
                  val path = segs.mkString("/")
                  val names =
                    if (lookup(path).isDefined) Seq(segs.last) // a file lists itself
                    else childrenOf(path)
                  reply("150 listing")
                  openData() match {
                    case None => reply("425 no data connection")
                    case Some(data) =>
                      val os: OutputStream = data.getOutputStream
                      try {
                        os.write(names.map(_ + "\r\n").mkString
                          .getBytes(StandardCharsets.UTF_8))
                        os.flush()
                      } finally data.close()
                      reply("226 transfer complete")
                  }
              }
            case "QUIT" => reply("221 bye"); open = false
            case other => reply(s"502 $other not implemented")
          }
        }
      }
    } catch {
      // dropped connection or a malformed command sequence: the session
      // dies, the server (and other sessions) keep serving
      case _: Exception =>
    } finally {
      if (dataListener != null) { dataListener.close(); dataListeners.remove(dataListener) }
      sessions.remove(sock)
      sock.close()
    }
  }
}

object MlflowFtp {
  /** Start the artifact FTP endpoint wired to an engine's typed logging —
    * the FTP twin of [[MlflowShim.start]]'s HTTP PUT route. */
  def start(engine: graft.exec.Engine, port: Int = 0): MlflowFtpServer =
    new MlflowFtpServer(
      (tp, name, bytes) => engine.loggerFor(tp).logArtefact(name, bytes),
      port)
}
