package graft.streaming

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetSocketAddress, ServerSocket, Socket, URLDecoder}
import java.nio.charset.StandardCharsets
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.jdk.CollectionConverters._

import graft.filters.{EventFilter, FilterEval, FilterParser, FilterSyntaxException}

/** The consumer-facing half of the reference re-expressed as the
  * engine's serving layer: an HTTP/1.1 Server-Sent-Events endpoint
  * with per-listener filter predicates, subsystem-keyed routing,
  * keepalive pings, auth-expiry logout, and the `/stats` aggregation
  * (reference: evtstrd/http_server.py, dispatcher.py, listener.py,
  * stats.py). This class owns only sockets + registry; all bulk
  * dataflow (parse/validate/fan-out) runs in Spark and feeds
  * [[notify]] / [[writeTo]] from `foreachBatch` (see
  * [[EventStreamServer]]).
  */
object SseServer {
  sealed trait AuthResult
  case object AuthOk extends AuthResult
  final case class AuthOkExpiring(expireAtMs: Long) extends AuthResult
  final case class AuthUnauthorized(authenticate: String) extends AuthResult
  case object AuthForbidden extends AuthResult

  /** Auth plugin contract (evtstrd/auth.py:11-36,
    * plugins/README.md:12-36); absent plugin => allow all.
    */
  trait AuthPlugin {
    def check(
        resource: String,
        headers: Map[String, String],
        subsystem: Option[String]): AuthResult
  }
  object AllowAll extends AuthPlugin {
    def check(r: String, h: Map[String, String], s: Option[String]): AuthResult =
      AuthOk
  }

  final case class ListenerConn(
      id: Long,
      subsystem: String,
      filters: Seq[EventFilter],
      rawFilters: Seq[String],
      connectionTime: LocalDateTime,
      remoteHost: String,
      referer: Option[String],
      socket: Socket,
      out: OutputStream) {
    val closed = new AtomicBoolean(false)

    /** All writes to [[out]] after the response head go through here.
      * Multiple threads write concurrently (the ping scheduler, the
      * Spark foreachBatch delivery thread, expiry logout); the
      * reference is race-free only because asyncio is single-threaded,
      * so we serialize per connection instead. The chunk is
      * pre-rendered to one buffer and written with a single locked
      * write+flush so HTTP/1.1 chunked framing can never interleave.
      *
      * [[writeStart]] marks an in-flight blocking write: a peer that
      * stops reading (TCP zero window, no RST) eventually blocks
      * write() forever, wedging whichever shared thread hit it first
      * and starving every other connection's pings/logouts. The
      * server's watchdog closes the socket of any write stuck past
      * the timeout, which unblocks the writer with an IOException
      * => dropDead.
      */
    private[streaming] val writeLock = new Object
    private[streaming] val writeStart = new AtomicLong(0L)
    private[streaming] val reaped = new AtomicBoolean(false)
    private[streaming] def writeBytes(b: Array[Byte]): Unit =
      writeLock.synchronized {
        writeStart.set(System.currentTimeMillis())
        try { out.write(b); out.flush() }
        finally writeStart.set(0L)
      }
  }
}

final class SseServer(
    port: Int = 0,
    pingIntervalSec: Long = 20L,
    auth: SseServer.AuthPlugin = SseServer.AllowAll,
    tls: Option[(String, String)] = None,
    writeTimeoutMs: Long = 10_000L,
    bindHost: Option[String] = None,
    sendBufferBytes: Int = 256 * 1024) {
  import SseServer._

  /** With (certFile, keyFile) configured the accept socket is an
    * SSLServerSocket (reference: optional `ssl_context` passed to
    * `asyncio.start_server`, evtstrd/http_server.py:49-56); the
    * handshake happens lazily on first read/write of each accepted
    * connection, and everything above the socket layer is unchanged.
    */
  private val server: ServerSocket = tls match {
    case Some((certFile, keyFile)) =>
      Tls.serverContext(certFile, keyFile)
        .getServerSocketFactory.createServerSocket()
    case None => new ServerSocket()
  }
  // reference parity: asyncio.start_server(port=...) with no host
  // binds ALL interfaces (evtstrd/http_server.py:45-47) — a loopback
  // default would make the production endpoint unreachable remotely
  server.bind(bindHost.fold(new InetSocketAddress(port))(
    h => new InetSocketAddress(h, port)))
  def actualPort: Int = server.getLocalPort

  private val startTime = LocalDateTime.now()
  private val totalConnections = new AtomicLong(0L)
  private val nextListenerId = new AtomicLong(0L)
  private val listeners =
    new ConcurrentHashMap[String, CopyOnWriteArrayList[ListenerConn]]()
  private val listenersById = new ConcurrentHashMap[Long, ListenerConn]()
  private val running = new AtomicBoolean(true)

  private val scheduler = Executors.newScheduledThreadPool(2, r => {
    val t = new Thread(r, "sse-scheduler"); t.setDaemon(true); t
  })
  scheduler.scheduleAtFixedRate(
    () => pingAll(),
    pingIntervalSec, pingIntervalSec, TimeUnit.SECONDS)

  /** Write watchdog on its OWN thread: the shared scheduler pool is
    * exactly what a wedged subscriber can starve (a blocking write in
    * pingAll plus a blocked expiry logout occupy both threads), so the
    * reaper must never share it. Closing the stuck connection's socket
    * out-of-band unblocks its writer with an IOException, whose normal
    * error path deregisters the listener (dropDead).
    */
  private val writeWatchdog = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "sse-write-watchdog"); t.setDaemon(true); t
  })
  private val watchdogPeriodMs = math.max(writeTimeoutMs / 4, 50L)
  writeWatchdog.scheduleAtFixedRate(
    () => reapStuckWriters(),
    watchdogPeriodMs, watchdogPeriodMs, TimeUnit.MILLISECONDS)

  private def reapStuckWriters(): Unit =
    for (l <- allListeners) {
      val started = l.writeStart.get()
      if (started > 0 && System.currentTimeMillis() - started > writeTimeoutMs
        && l.reaped.compareAndSet(false, true)) {
        // close on a throwaway daemon thread, NOT the watchdog thread:
        // an SSLSocket.close() wants to send close_notify and can
        // itself block on the very connection being reaped (same
        // output lock / full send buffer), which would wedge the
        // single watchdog and disable reaping server-wide. Linger-0
        // makes the close abortive (RST) so the kernel drops the
        // buffer instead of draining it.
        val closer = new Thread(() => {
          try l.socket.setSoLinger(true, 0)
          catch { case _: Exception => () }
          try l.socket.close()
          catch { case _: Exception => () }
        }, "sse-reap-close")
        closer.setDaemon(true)
        closer.start()
      }
    }

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handleConnection(sock), "sse-conn")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  }, "sse-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  // ---- HTTP plumbing (reference: evtstrd/http.py) ----

  private val HttpDate =
    DateTimeFormatter.ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'")
      .withZone(java.time.ZoneOffset.UTC)
      .withLocale(java.util.Locale.US)

  private def defaultHeaders: Seq[(String, String)] = Seq(
    "Date" -> HttpDate.format(java.time.Instant.now()),
    "Server" -> "eventstreamd")

  private def writeHead(
      out: OutputStream,
      status: Int,
      phrase: String,
      headers: Seq[(String, String)]): Unit = {
    val sb = new StringBuilder(s"HTTP/1.1 $status $phrase\r\n")
    headers.foreach { case (h, v) => sb.append(s"$h: $v\r\n") }
    sb.append("\r\n")
    out.write(sb.toString.getBytes(StandardCharsets.US_ASCII))
    out.flush()
  }

  private def writeError(
      out: OutputStream,
      status: Int,
      phrase: String,
      message: String,
      extra: Seq[(String, String)] = Nil): Unit = {
    writeHead(out, status, phrase, defaultHeaders ++ extra)
    out.write((message + "\r\n").getBytes(StandardCharsets.UTF_8))
    out.flush()
  }

  /** One HTTP chunk, rendered to a single buffer: lowercase hex byte
    * length + CRLF + payload + CRLF (evtstrd/http.py:114-118).
    */
  private def renderChunk(payload: Array[Byte]): Array[Byte] = {
    val len = payload.length.toHexString.getBytes(StandardCharsets.US_ASCII)
    val buf = new Array[Byte](len.length + payload.length + 4)
    System.arraycopy(len, 0, buf, 0, len.length)
    buf(len.length) = '\r'; buf(len.length + 1) = '\n'
    System.arraycopy(payload, 0, buf, len.length + 2, payload.length)
    buf(buf.length - 2) = '\r'; buf(buf.length - 1) = '\n'
    buf
  }

  private def handleConnection(sock: Socket): Unit = {
    // Bound the kernel send buffer per connection (disables wmem
    // auto-tune, which grows to megabytes): a fan-out server must cap
    // memory per slow consumer — 10k wedged subscribers × 4 MB of
    // auto-tuned buffer is 40 GB of kernel memory — and a bounded
    // buffer is what makes the write watchdog meaningful (an
    // unbounded one hides a dead-slow consumer for minutes before any
    // write blocks). SSE frames are KBs; 256 KiB absorbs every normal
    // burst.
    try sock.setSendBufferSize(sendBufferBytes)
    catch { case _: Exception => () }
    val out = sock.getOutputStream
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.US_ASCII))
      val requestLine = in.readLine()
      if (requestLine == null) { sock.close(); return }
      val parts = requestLine.split(" ")
      if (parts.length != 3 || parts(2) != "HTTP/1.1") {
        writeError(out, 400, "Bad Request", "invalid request line")
        sock.close(); return
      }
      val Array(method, path, _) = parts
      if (!Seq("HEAD", "GET", "POST", "PUT").contains(method)) {
        writeError(out, 501, "Not Implemented", "")
        sock.close(); return
      }
      // headers, lower-cased names (http.py:83); OWS after the colon
      // is OPTIONAL (RFC 7230 §3.2) — splitting on ": " would drop a
      // legal "Authorization:Bearer x" and fail its auth
      val headers = Iterator
        .continually(in.readLine())
        .takeWhile(l => l != null && l.nonEmpty)
        .flatMap { l =>
          l.split(":", 2) match {
            case Array(h, v) =>
              Some(h.toLowerCase -> v.replaceAll("^[ \\t]+|[ \\t]+$", ""))
            case _ => None
          }
        }
        .toMap
      val (rawPath, query) = path.span(_ != '?')
      // only a successful /events registration keeps the socket open
      val registered = rawPath match {
        case "/events" =>
          if (method != "GET") {
            writeError(out, 405, "Method Not Allowed", s"method $method not allowed")
            false
          } else handleEvents(sock, out, query.drop(1), headers)
        case "/stats" =>
          if (method != "GET")
            writeError(out, 405, "Method Not Allowed", s"method $method not allowed")
          else handleStats(out, headers)
          false
        case p =>
          writeError(out, 404, "Not Found", s"'$p' not found")
          false
      }
      if (!registered) sock.close()
    } catch {
      case _: Exception =>
        try {
          writeError(out, 500, "Internal Server Error", "internal server error")
          sock.close()
        } catch { case _: Exception => () }
    }
  }

  /** Mirrors Python `parse_qs` defaults (keep_blank_values=False,
    * evtstrd/http_server.py:146): a pair with an empty value is
    * dropped entirely, so `filter=` means "no filter" and
    * `subsystem=` means "missing argument", not empty-string.
    */
  private def parseQuery(q: String): Map[String, Seq[String]] = {
    // Python's unquote leaves malformed %-escapes as-is; URLDecoder
    // throws. A bad escape is a client quirk, not a server error —
    // fall back to the raw text ('+' still means space) instead of
    // letting the exception surface as a 500.
    def dec(s: String): String =
      try URLDecoder.decode(s, "UTF-8")
      catch { case _: IllegalArgumentException => s.replace('+', ' ') }
    q.split("&").filter(_.nonEmpty).toSeq
      .map { kv =>
        val Array(k, v) = (kv.split("=", 2) ++ Array("")).take(2)
        dec(k) -> dec(v)
      }
      .filter(_._2.nonEmpty)
      .groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
  }

  /** Returns true when the connection was registered as a listener
    * (and must stay open); false on any error response.
    */
  private def handleEvents(
      sock: Socket,
      out: OutputStream,
      query: String,
      headers: Map[String, String]): Boolean = {
    val args = parseQuery(query)
    val subsystem = args.get("subsystem").flatMap(_.headOption) match {
      case Some(s) => s
      case None =>
        writeError(out, 400, "Bad Request", "subsystem: missing argument")
        return false
    }
    val rawFilters = args.getOrElse("filter", Nil)
    val filters =
      try rawFilters.map(FilterParser.parse)
      catch {
        case _: FilterSyntaxException =>
          writeError(out, 400, "Bad Request", "filter: could not parse filter")
          return false
      }
    val expire = auth.check("events", headers, Some(subsystem)) match {
      case AuthOk => None
      case AuthOkExpiring(ms) => Some(ms)
      case AuthUnauthorized(a) =>
        writeError(out, 401, "Unauthorized", "Unauthorized",
          Seq("WWW-Authenticate" -> a))
        return false
      case AuthForbidden =>
        writeError(out, 403, "Forbidden", "Forbidden")
        return false
    }
    val responseHeaders = defaultHeaders ++ Seq(
      "Transfer-Encoding" -> "chunked",
      "Content-Type" -> "text/event-stream",
      "Connection" -> "keep-alive",
      "Keep-Alive" -> "timeout=5, max=100") ++
      headers.get("origin").toSeq.flatMap(o => Seq(
        "Access-Control-Allow-Credentials" -> "true",
        "Access-Control-Allow-Origin" -> o))
    writeHead(out, 200, "OK", responseHeaders)
    // Past this point the 200 head is on the wire: never let an
    // exception bubble to handleConnection's catch-all, which would
    // write a second response head mid-chunked-stream (a protocol
    // violation) and leave a registered listener behind. Tear down
    // cleanly instead.
    val conn = ListenerConn(
      nextListenerId.incrementAndGet(),
      subsystem, filters, rawFilters,
      LocalDateTime.now(),
      Option(sock.getInetAddress).map(_.getHostAddress).getOrElse("unknown"),
      headers.get("referer"),
      sock, out)
    try {
      listeners
        .computeIfAbsent(subsystem, _ => new CopyOnWriteArrayList[ListenerConn]())
        .add(conn)
      listenersById.put(conn.id, conn)
      totalConnections.incrementAndGet()
      // reference ping_loop writes a ping before its first sleep
      // (evtstrd/listener.py:72-78): send one immediately so proxies see
      // bytes right after the 200 head instead of idling a full interval
      write(conn, ConnectionTimers.PingFrame.getBytes(StandardCharsets.UTF_8))
      // absolute-time logout timer (listener.py:80-84)
      expire.foreach { ms =>
        val delay = math.max(0L, ms - System.currentTimeMillis())
        scheduler.schedule(
          new Runnable { def run(): Unit = logout(conn) },
          delay, TimeUnit.MILLISECONDS)
      }
      true
    } catch {
      case _: Exception =>
        dropDead(conn) // deregister + close; no further bytes written
        true // the socket is handled; handleConnection must not reuse it
    }
  }

  private def handleStats(out: OutputStream, headers: Map[String, String]): Unit = {
    auth.check("stats", headers, None) match {
      case AuthUnauthorized(a) =>
        writeError(out, 401, "Unauthorized", "Unauthorized",
          Seq("WWW-Authenticate" -> a)); return
      case AuthForbidden =>
        writeError(out, 403, "Forbidden", "Forbidden"); return
      case _ => ()
    }
    val body = statsJson.getBytes(StandardCharsets.UTF_8)
    writeHead(out, 200, "OK", defaultHeaders ++ Seq(
      "Connection" -> "close",
      "Content-Type" -> "application/json",
      "Content-Length" -> body.length.toString))
    out.write(body)
    out.flush()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Stats document (evtstrd/stats.py:34-50): `referer` key omitted
    * when absent.
    */
  def statsJson: String = {
    val conns = allListeners.map { l =>
      val base = Seq(
        s""""subsystem": ${jsonStr(l.subsystem)}""",
        s""""filters": [${l.rawFilters.map(jsonStr).mkString(", ")}]""",
        s""""connection-time": ${jsonStr(l.connectionTime.toString)}""",
        s""""remote-host": ${jsonStr(l.remoteHost)}""") ++
        l.referer.map(r => s""""referer": ${jsonStr(r)}""")
      base.mkString("{", ", ", "}")
    }
    s"""{"start-time": ${jsonStr(startTime.toString)}, """ +
      s""""total-connections": ${totalConnections.get()}, """ +
      s""""connections": [${conns.mkString(", ")}]}"""
  }

  def allListeners: Seq[ListenerConn] =
    listeners.values.asScala.flatMap(_.asScala).toSeq.sortBy(_.id)

  /** Deliver one event to every matching listener of its subsystem —
    * the per-listener residual predicate runs here when called from
    * the simple path; the Spark path pre-filters and calls [[writeTo]].
    * (evtstrd/dispatcher.py:88-99, listener.py:56-70)
    */
  def notify(subsystem: String, eventType: String, data: String, id: String): Int = {
    val bucket = listeners.get(subsystem)
    if (bucket == null) return 0
    var delivered = 0
    // snapshot copy before iteration (dispatcher.py:91-93); one JSON
    // parse per event covers the listener's whole filter list
    for (l <- bucket.asScala.toList) {
      if (l.rawFilters.isEmpty || FilterEval.matches(data, l.rawFilters)) {
        val idLine = if (id != null && id.nonEmpty) s"id: $id\r\n" else ""
        val frame = s"event: $eventType\r\ndata: $data\r\n$idLine\r\n"
        // a failed write means the listener was dropped, not delivered
        if (write(l, frame.getBytes(StandardCharsets.UTF_8)))
          delivered += 1
      }
    }
    delivered
  }

  /** Write a pre-rendered chunk to a listener by id (Spark fan-out
    * path). A dead socket removes the listener; it never propagates
    * (an escaping IOException would kill the foreachBatch sink and
    * with it every other subscriber's stream).
    */
  def writeTo(listenerId: Long, chunkBytes: Array[Byte]): Unit = {
    val l = listenersById.get(listenerId)
    if (l != null) {
      try l.writeBytes(chunkBytes)
      catch { case _: Exception => dropDead(l) }
    }
  }

  private def write(l: ListenerConn, frame: Array[Byte]): Boolean =
    try { l.writeBytes(renderChunk(frame)); true }
    catch { case _: Exception => dropDead(l); false } // lazy disconnect detection

  /** A write failed: the peer is gone. Deregister AND close our end —
    * remove() alone would leak the file descriptor of every dead
    * subscriber on a long-running server. No terminal chunk (the
    * socket is already broken).
    */
  private def dropDead(l: ListenerConn): Unit = {
    l.closed.set(true)
    try l.socket.close()
    catch { case _: Exception => () }
    remove(l)
  }

  // the ping payload is constant — render its chunk bytes once, not
  // once per listener per tick
  private lazy val pingChunk: Array[Byte] =
    renderChunk(ConnectionTimers.PingFrame.getBytes(StandardCharsets.UTF_8))

  private def pingAll(): Unit =
    for (l <- allListeners) {
      try l.writeBytes(pingChunk)
      catch { case _: Exception => dropDead(l) }
    }

  private def logout(l: ListenerConn): Unit = {
    write(l, ConnectionTimers.LogoutFrame.getBytes(StandardCharsets.UTF_8))
    disconnect(l)
  }

  private def disconnect(l: ListenerConn): Unit = {
    if (l.closed.compareAndSet(false, true)) {
      try { l.writeBytes(renderChunk(Array.emptyByteArray)); l.socket.close() }
      catch { case _: Exception => () }
      remove(l)
    }
  }

  private def remove(l: ListenerConn): Unit = {
    val bucket = listeners.get(l.subsystem)
    if (bucket != null) bucket.remove(l)
    listenersById.remove(l.id)
  }

  /** Graceful drain: last chunk to every listener, close everything
    * (evtstrd/dispatcher.py:101-103, server.py:26-29).
    */
  def close(): Unit = {
    running.set(false)
    allListeners.foreach(disconnect)
    scheduler.shutdownNow()
    writeWatchdog.shutdownNow()
    try server.close()
    catch { case _: Exception => () }
  }
}
