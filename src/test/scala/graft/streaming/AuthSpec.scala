package graft.streaming

import java.io.OutputStreamWriter
import java.net.Socket
import java.nio.charset.StandardCharsets

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** A drop-in plugin as a user would ship it: top-level, zero-arg
  * constructible, loadable by class name from config
  * (reference: a module dropped into evtstrd/plugins/,
  * plugins/README.md:12-36).
  */
class DemoAuthPlugin extends SseServer.AuthPlugin {
  import SseServer._
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

/** Scala-`object` flavored plugin (loaded via its `$` name). */
object DemoAuthObject extends SseServer.AuthPlugin {
  def check(
      resource: String,
      headers: Map[String, String],
      subsystem: Option[String]): SseServer.AuthResult = SseServer.AuthForbidden
}

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

      // RFC 7230 §3.2: the space after ':' is optional whitespace —
      // a client omitting it must still authenticate
      val tight = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization:Basic gooduser"))
      assert(read(tight, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      unauth.close(); forb.close(); exp.close(); ok.close(); tight.close()
    } finally server.close()
  }

  test("malformed percent-escape in the query is served, not a 500") {
    val server = new SseServer(0, pingIntervalSec = 3600)
    try {
      // Python parse_qs leaves invalid escapes as literal text; the
      // request must register (200), never crash to a 500
      val s = rawGet(server.actualPort, "/events?subsystem=a%zz", Nil)
      assert(read(s, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      s.close()
    } finally server.close()
  }

  test("drop-in plugin loads reflectively and gates the endpoint") {
    val plugin = AuthPluginLoader.load("graft.streaming.DemoAuthPlugin")
    val server = new SseServer(0, pingIntervalSec = 3600, auth = plugin)
    try {
      // unauthorized: 401 + WWW-Authenticate from the loaded plugin
      val unauth = rawGet(server.actualPort, "/events?subsystem=s", Nil)
      val r401 = read(unauth, "\r\n\r\n")
      assert(r401.startsWith("HTTP/1.1 401"))
      assert(r401.contains("WWW-Authenticate: Basic realm=\"events\""))
      // forbidden
      val forb = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization: Basic forbidden"))
      assert(read(forb, "\r\n\r\n").startsWith("HTTP/1.1 403"))
      // ok-with-expire: logout + terminal arrive when the expiry passes
      val exp = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization: Basic expiring"))
      assert(read(exp, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      val tail = read(exp, "0\r\n\r\n")
      assert(tail.contains("event: logout\r\ndata: {\"reason\": \"expire\"}"))
      // plain ok
      val ok = rawGet(server.actualPort, "/events?subsystem=s",
        Seq("Authorization: Basic gooduser"))
      assert(read(ok, "\r\n\r\n").startsWith("HTTP/1.1 200"))
      unauth.close(); forb.close(); exp.close(); ok.close()
    } finally server.close()
  }

  test("plugin loader: object form, missing class, wrong type") {
    // Scala object: trailing-$ class name, MODULE$ instance
    val obj = AuthPluginLoader.load("graft.streaming.DemoAuthObject$")
    assert(obj.check("events", Map.empty, None) == AuthForbidden)
    // a typo'd class name fails loudly (never silently allow-all)
    intercept[AuthPluginLoader.PluginException] {
      AuthPluginLoader.load("graft.streaming.NoSuchPlugin")
    }
    // a class that is not an AuthPlugin fails loudly
    intercept[AuthPluginLoader.PluginException] {
      AuthPluginLoader.load("java.lang.Object")
    }
    // config wiring: AuthPlugin key read from [General]
    val conf = java.nio.file.Files.createTempFile("evtstrd", ".conf")
    java.nio.file.Files.writeString(
      conf,
      "[General]\nAuthPlugin = graft.streaming.DemoAuthPlugin\n")
    assert(
      ServerConfig.readConfig(conf.toString).authPlugin
        .contains("graft.streaming.DemoAuthPlugin"))
    java.nio.file.Files.delete(conf)
  }
}
