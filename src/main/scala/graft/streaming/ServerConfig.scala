package graft.streaming

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Server configuration with the reference's defaults, config-file
  * keys, and CLI flags (evtstrd/config.py, evtstrd/cmdargs.py,
  * sample.conf). INI subset parser: `[Section]` headers and
  * `Key = Value` lines; `#`/`;` comments.
  */
final case class ServerConfig(
    socketFile: String = "/var/run/eventstreamd.sock",
    socketMode: Int = Integer.parseInt("600", 8),
    socketOwner: Option[String] = None,
    socketGroup: Option[String] = None,
    httpPort: Int = 8888,
    pingIntervalSec: Long = 20L,
    certFile: Option[String] = None,
    keyFile: Option[String] = None,
    authPlugin: Option[String] = None,
    debug: Boolean = false) {

  /** TLS only when BOTH files are configured (evtstrd/config.py:26-28
    * `with_ssl`).
    */
  def tls: Option[(String, String)] =
    for (c <- certFile; k <- keyFile) yield (c, k)
}

object ServerConfig {
  val DefaultConfigFile = "/etc/eventstreamd.conf"

  def parseIni(lines: Seq[String]): Map[String, Map[String, String]] = {
    var section = ""
    val out = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, String]]
    for (raw <- lines) {
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]"))
          section = line.substring(1, line.length - 1)
        else
          line.split("=", 2) match {
            case Array(k, v) =>
              out.getOrElseUpdate(section, scala.collection.mutable.Map.empty)
                .put(k.trim, v.trim)
            case _ => ()
          }
      }
    }
    out.view.mapValues(_.toMap).toMap
  }

  /** Reads exactly the keys the reference reads (evtstrd/config.py:
    * 31-53): SocketFile/SocketMode/SocketOwner/SocketGroup/
    * SSLCertificateFile/SSLKeyFile/HTTPPort (empty string => unset,
    * matching the reference's `fallback=""` + truthiness check). The
    * ping interval is deliberately NOT a config-file key there either
    * (config.py:23 pins the constant); `--ping-interval` and the
    * `AuthPlugin` key are our only extensions.
    */
  def readConfig(path: String): ServerConfig = {
    val ini = parseIni(Files.readAllLines(Path.of(path)).asScala.toSeq)
    val g = ini.getOrElse("General", Map.empty)
    ServerConfig(
      socketFile = g.getOrElse("SocketFile", "/var/run/eventstreamd.sock"),
      socketMode = g.get("SocketMode")
        .map(Integer.parseInt(_, 8))
        .getOrElse(Integer.parseInt("600", 8)),
      socketOwner = g.get("SocketOwner").filter(_.nonEmpty),
      socketGroup = g.get("SocketGroup").filter(_.nonEmpty),
      httpPort = g.get("HTTPPort").map(_.toInt).getOrElse(8888),
      certFile = g.get("SSLCertificateFile").filter(_.nonEmpty),
      keyFile = g.get("SSLKeyFile").filter(_.nonEmpty),
      authPlugin = g.get("AuthPlugin").filter(_.nonEmpty))
  }

  /** CLI parity with the reference: `-c/--config-file`, `-s/--socket`,
    * `--ssl-key`, `--ssl-cert`, `-p/--port`, `-d/--debug`
    * (evtstrd/cmdargs.py:10-17), plus `--ping-interval`. Flags
    * override the config file, exactly as cmdargs.py:22-31 applies
    * them after read_config.
    */
  def parseArgs(args: Array[String]): ServerConfig = {
    var cfg: Option[ServerConfig] = None
    var socket: Option[String] = None
    var sslKey: Option[String] = None
    var sslCert: Option[String] = None
    var port: Option[Int] = None
    var ping: Option[Long] = None
    var debug = false
    var i = 0
    // a value-taking flag as the LAST argument must be a usage error,
    // not an ArrayIndexOutOfBoundsException with a raw stack trace
    def value(flag: String): String =
      if (i + 1 < args.length) args(i + 1)
      else throw new IllegalArgumentException(
        s"argument '$flag' requires a value")
    while (i < args.length) {
      args(i) match {
        case f @ ("-c" | "--config-file") =>
          cfg = Some(readConfig(value(f))); i += 2
        case f @ ("-s" | "--socket") => socket = Some(value(f)); i += 2
        case f @ "--ssl-key" => sslKey = Some(value(f)); i += 2
        case f @ "--ssl-cert" => sslCert = Some(value(f)); i += 2
        case f @ ("-p" | "--port") => port = Some(value(f).toInt); i += 2
        case f @ "--ping-interval" => ping = Some(value(f).toLong); i += 2
        case "-d" | "--debug" => debug = true; i += 1
        case other =>
          throw new IllegalArgumentException(s"unknown argument '$other'")
      }
    }
    val base = cfg.getOrElse {
      if (Files.exists(Path.of(DefaultConfigFile)))
        readConfig(DefaultConfigFile)
      else ServerConfig()
    }
    base.copy(
      socketFile = socket.getOrElse(base.socketFile),
      keyFile = sslKey.orElse(base.keyFile),
      certFile = sslCert.orElse(base.certFile),
      httpPort = port.getOrElse(base.httpPort),
      pingIntervalSec = ping.getOrElse(base.pingIntervalSec),
      debug = debug)
  }
}

/** `eventstreamd`-compatible entry point: starts the Spark pipeline
  * (socket source -> validate -> fan-out) and the SSE HTTP endpoint.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val cfg = ServerConfig.parseArgs(args)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("eventstreamdspark")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(if (cfg.debug) "INFO" else "WARN")
    val server = new EventStreamServer(
      spark,
      socketPath = Some(cfg.socketFile),
      httpPort = cfg.httpPort,
      pingIntervalSec = cfg.pingIntervalSec,
      auth = cfg.authPlugin
        .map(AuthPluginLoader.load)
        .getOrElse(SseServer.AllowAll),
      socketMode = Some(cfg.socketMode),
      socketOwner = cfg.socketOwner,
      socketGroup = cfg.socketGroup,
      tls = cfg.tls)
    println(s"eventstreamdspark listening: socket=${cfg.socketFile} " +
      s"http${if (cfg.tls.isDefined) "s" else ""}=${server.sse.actualPort} " +
      s"ping=${cfg.pingIntervalSec}s")
    sys.addShutdownHook(server.close())
    server.query.awaitTermination()
  }
}
