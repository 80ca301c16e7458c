package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class ServerConfigSpec extends AnyFunSuite {

  test("defaults match the reference (config.py)") {
    val c = ServerConfig()
    assert(c.socketFile == "/var/run/eventstreamd.sock")
    assert(c.httpPort == 8888)
    assert(c.pingIntervalSec == 20L)
    assert(c.socketMode == 0x180) // 0600 octal
  }

  test("ini config file keys (sample.conf shape)") {
    val f = Files.createTempFile("graft-conf", ".conf")
    Files.writeString(f, """[General]
      |SocketFile = /tmp/x.sock
      |SocketOwner = www-data
      |SocketMode = 0660
      |HTTPPort = 9999
      |# comment
      |""".stripMargin)
    val c = ServerConfig.readConfig(f.toString)
    assert(c.socketFile == "/tmp/x.sock")
    assert(c.httpPort == 9999)
    assert(c.socketOwner.contains("www-data"))
    assert(c.socketMode == Integer.parseInt("660", 8))
    Files.delete(f)
  }

  test("cli flags override config (cmdargs.py)") {
    val c = ServerConfig.parseArgs(
      Array("-s", "/tmp/cli.sock", "-p", "7777", "--ping-interval", "5", "-d"))
    assert(c.socketFile == "/tmp/cli.sock")
    assert(c.httpPort == 7777)
    assert(c.pingIntervalSec == 5L)
    assert(c.debug)
    assertThrows[IllegalArgumentException](
      ServerConfig.parseArgs(Array("--bogus")))
    // a value-taking flag with no value is a usage error, not an
    // ArrayIndexOutOfBoundsException
    assertThrows[IllegalArgumentException](
      ServerConfig.parseArgs(Array("--port")))
  }

  test("--ssl-key/--ssl-cert flags (cmdargs.py:12-13) override config") {
    // flags alone enable TLS, exactly like the reference's start.sh
    // pattern of passing cert/key on the command line
    val flagsOnly = ServerConfig.parseArgs(
      Array("--ssl-key", "/tmp/k.pem", "--ssl-cert", "/tmp/c.pem"))
    assert(flagsOnly.keyFile.contains("/tmp/k.pem"))
    assert(flagsOnly.certFile.contains("/tmp/c.pem"))
    assert(flagsOnly.tls.contains(("/tmp/c.pem", "/tmp/k.pem")))

    // flags override the config-file SSLKeyFile/SSLCertificateFile
    // (cmdargs.py:26-29 applies args AFTER read_config)
    val f = Files.createTempFile("graft-conf", ".conf")
    Files.writeString(f, """[General]
      |SSLCertificateFile = /etc/old-cert.pem
      |SSLKeyFile = /etc/old-key.pem
      |""".stripMargin)
    val c = ServerConfig.parseArgs(
      Array("-c", f.toString, "--ssl-key", "/tmp/new-k.pem",
        "--ssl-cert", "/tmp/new-c.pem"))
    assert(c.tls.contains(("/tmp/new-c.pem", "/tmp/new-k.pem")))
    // one flag overrides its half only; the other half keeps config
    val half = ServerConfig.parseArgs(
      Array("-c", f.toString, "--ssl-key", "/tmp/new-k.pem"))
    assert(half.tls.contains(("/etc/old-cert.pem", "/tmp/new-k.pem")))
    // a key alone (no cert anywhere) must NOT enable TLS
    // (config.py with_ssl requires both)
    val keyOnly = ServerConfig.parseArgs(Array("--ssl-key", "/tmp/k.pem"))
    assert(keyOnly.tls.isEmpty)
    Files.delete(f)
  }
}
