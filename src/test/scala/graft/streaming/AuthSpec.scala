package graft.streaming

import java.io.OutputStreamWriter
import java.net.Socket
import java.nio.charset.StandardCharsets

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Auth-plugin gate semantics (evtstrd/auth.py:11-36,
  * plugins/README.md): 401 with WWW-Authenticate, 403, and
  * ok-with-expire scheduling the logout timer.
  */
class AuthSpec extends AnyFunSuite {
  import SseServer._

  private object TestAuth extends AuthPlugin {
    def check(
        resource: String,
        headers: Map[String, String],
        subsystem: Option[String]): AuthResult =
      headers.get("authorization") match {
        case None => AuthUnauthorized("Basic realm=\"events\"")
        case Some("Basic forbidden") => AuthForbidden
        case Some("Basic expiring") =>
          AuthOkExpiring(System.currentTimeMillis() + 500)
        case Some(_) => AuthOk
      }
  }

  private def rawGet(port: Int, path: String, headers: Seq[String]): Socket = {
    val s = new Socket("127.0.0.1", port)
    val w = new OutputStreamWriter(s.getOutputStream, StandardCharsets.US_ASCII)
    w.write(s"GET $path HTTP/1.1\r\nHost: x\r\n" +
      headers.map(_ + "\r\n").mkString + "\r\n")
    w.flush()
    s
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

  test("401 with WWW-Authenticate, 403, and expiry-driven logout") {
    val server = new SseServer(0, pingIntervalSec = 3600, auth = TestAuth)
    try {
      val unauth = rawGet(server.actualPort, "/events?subsystem=s", Nil)
      val r401 = read(unauth, "\r\n\r\n")
      assert(r401.startsWith("HTTP/1.1 401"))
      assert(r401.contains("WWW-Authenticate: Basic realm=\"events\""))

      val forb = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization: Basic forbidden"))
      assert(read(forb, "\r\n\r\n").startsWith("HTTP/1.1 403"))

      val exp = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization: Basic expiring"))
      assert(read(exp, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      // expire in ~500ms => logout frame then terminal chunk
      val tail = read(exp, "0\r\n\r\n")
      assert(tail.contains("event: logout\r\ndata: {\"reason\": \"expire\"}"))
      assert(tail.contains("0\r\n\r\n"))

      val ok = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization: Basic gooduser"))
      assert(read(ok, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      unauth.close(); forb.close(); exp.close(); ok.close()
    } finally server.close()
  }
}
