package graft.streaming

import java.io.OutputStreamWriter
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import javax.net.ssl.SSLSocket

import org.scalatest.funsuite.AnyFunSuite

/** TLS on the SSE endpoint (reference: SSLCertificateFile/SSLKeyFile
  * config keys, evtstrd/config.py:20-28,47-50, building the
  * ssl_context of evtstrd/http_server.py:49-56), plus the stalled-
  * subscriber write watchdog.
  */
class TlsSpec extends AnyFunSuite {

  private def fixture(name: String): String =
    getClass.getResource(s"/tls/$name").getPath

  private def writeHead(s: Socket, path: String): Unit = {
    val w = new OutputStreamWriter(s.getOutputStream, StandardCharsets.US_ASCII)
    w.write(s"GET $path HTTP/1.1\r\nHost: x\r\n\r\n")
    w.flush()
  }

  private def read(s: Socket, until: String, ms: Long = 8000): String = {
    s.setSoTimeout(300)
    val buf = new Array[Byte](4096)
    val sb = new StringBuilder
    val deadline = System.currentTimeMillis() + ms
    while (!sb.toString.contains(until) && System.currentTimeMillis() < deadline)
      try {
        val n = s.getInputStream.read(buf)
        if (n > 0) sb.append(new String(buf, 0, n, StandardCharsets.UTF_8))
      } catch { case _: java.net.SocketTimeoutException => () }
    sb.toString
  }

  test("TLS handshake + SSE delivery against the self-signed cert") {
    val server = new SseServer(
      0, pingIntervalSec = 3600,
      tls = Some((fixture("cert.pem"), fixture("key.pem"))))
    try {
      val sock = Tls.clientContext(fixture("cert.pem"))
        .getSocketFactory
        .createSocket("127.0.0.1", server.actualPort)
        .asInstanceOf[SSLSocket]
      sock.startHandshake() // explicit: fails loudly on a bad chain
      assert(sock.getSession.isValid)
      writeHead(sock, "/events?subsystem=tlsy")
      val head = read(sock, "\r\n\r\n")
      assert(head.startsWith("HTTP/1.1 200"))
      // the 200 head precedes registry insertion; wait for the listener
      val deadline = System.currentTimeMillis() + 8000
      while (server.allListeners.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(10)
      assert(server.notify("tlsy", "add", "{\"a\": 1}", "7") == 1)
      val body = read(sock, "id: 7")
      assert(body.contains("event: add\r\ndata: {\"a\": 1}\r\nid: 7"))
      sock.close()
    } finally server.close()
  }

  test("plaintext client against a TLS server fails, not hangs") {
    val server = new SseServer(
      0, pingIntervalSec = 3600,
      tls = Some((fixture("cert.pem"), fixture("key.pem"))))
    try {
      val s = new Socket("127.0.0.1", server.actualPort)
      writeHead(s, "/events?subsystem=x")
      // the server's TLS layer rejects the plaintext bytes; the client
      // sees EOF/reset rather than an SSE stream
      val got = read(s, "HTTP/1.1", ms = 2000)
      assert(!got.contains("HTTP/1.1 200"))
      s.close()
    } finally server.close()
  }

  test("config file with SSL keys yields a TLS server config") {
    val conf = Files.createTempFile("evtstrd", ".conf")
    Files.writeString(
      conf,
      s"""[General]
         |HTTPPort = 9911
         |SSLCertificateFile = ${fixture("cert.pem")}
         |SSLKeyFile = ${fixture("key.pem")}
         |""".stripMargin)
    val cfg = ServerConfig.readConfig(conf.toString)
    assert(cfg.tls.contains((fixture("cert.pem"), fixture("key.pem"))))
    assert(cfg.httpPort == 9911)
    // reference semantics: one key alone (or empty) is NOT TLS
    // (config.py with_ssl requires both)
    assert(cfg.copy(keyFile = None).tls.isEmpty)
    assert(ServerConfig().tls.isEmpty)
    Files.delete(conf)
  }

  test("--ssl-key/--ssl-cert CLI flags drive a real TLS endpoint") {
    // the reference's start.sh pattern: cert/key passed as flags, no
    // config file at all (evtstrd/cmdargs.py:12-13,26-29)
    val cfg = ServerConfig.parseArgs(
      Array("--ssl-cert", fixture("cert.pem"), "--ssl-key", fixture("key.pem")))
    assert(cfg.tls.contains((fixture("cert.pem"), fixture("key.pem"))))
    val server = new SseServer(0, pingIntervalSec = 3600, tls = cfg.tls)
    try {
      val sock = Tls.clientContext(fixture("cert.pem"))
        .getSocketFactory
        .createSocket("127.0.0.1", server.actualPort)
        .asInstanceOf[SSLSocket]
      sock.startHandshake()
      assert(sock.getSession.isValid)
      writeHead(sock, "/events?subsystem=cliflags")
      assert(read(sock, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      sock.close()
    } finally server.close()
  }

  test("wedged subscriber is reaped by the write watchdog") {
    val server =
      new SseServer(0, pingIntervalSec = 3600, writeTimeoutMs = 500)
    try {
      val sock = new Socket("127.0.0.1", server.actualPort)
      sock.setReceiveBufferSize(4096)
      writeHead(sock, "/events?subsystem=wedge")
      assert(read(sock, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      // the client now STOPS reading; once the kernel buffers fill,
      // the server's blocking write wedges until the watchdog closes
      // the socket and dropDead deregisters the listener
      val payload = "{\"x\": \"" + "a" * 65536 + "\"}"
      val t = new Thread(() => {
        var i = 0
        while (i < 2000 && !server.allListeners.isEmpty) {
          server.notify("wedge", "add", payload, null)
          i += 1
        }
      })
      t.start()
      t.join(30000)
      assert(!t.isAlive, "delivery thread still wedged after 30s")
      assert(server.allListeners.isEmpty, "dead listener not deregistered")
      sock.close()
    } finally server.close()
  }
}
