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
}
