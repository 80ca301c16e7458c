package graft

import java.io.OutputStreamWriter
import java.net.Socket
import java.nio.channels.{Channels, SocketChannel}
import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import graft.streaming.EventStreamServer
import org.apache.spark.sql.SparkSession

/** End-to-end streaming throughput: producer JSON lines on the Unix
  * socket source -> envelope parse -> fan-out -> partition-wise SSE
  * delivery to live HTTP subscribers, measured in events/sec at
  * several subscriber counts.
  *
  * This is the throughput fact for the half of the engine that IS the
  * reference (eventstreamd is a single-threaded asyncio process whose
  * delivery cost is O(listeners) per event on one core —
  * `evtstrd/dispatcher.py` walks every matching listener serially).
  * Here delivery is a Spark micro-batch whose rendered (listener,
  * chunk) rows shuffle to delivery shards, so added subscribers fan
  * out across cores instead of extending a serial loop. Results land
  * in BASELINE.md and `target/stream_bench.json`.
  *
  * Methodology: per subscriber count K, subscribe K HTTP clients
  * (each drained by its own reader thread, counting `id: ` frame
  * terminators), write N events to the socket as fast as the producer
  * can, `processAllAvailable()`, then wait until every subscriber has
  * received all N frames. Wall clock runs from the first producer
  * write to the last frame observed — ingest, parse, fan-out and
  * socket delivery are all inside the measured window. One warmup run
  * absorbs codegen/classloading, matching Bench's discipline.
  */
object StreamBench {
  private def countFrames(s: Socket, counter: AtomicLong): Thread = {
    val t = new Thread(() => {
      val in = s.getInputStream
      val buf = new Array[Byte](1 << 16)
      // frames are ASCII; "id: " only occurs as the frame id line
      // (payloads are {"k":N}), so counting the marker counts frames.
      val marker = "\nid: ".getBytes(StandardCharsets.US_ASCII)
      var m = 0
      try {
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            m = if (buf(i) == marker(m)) m + 1 else if (buf(i) == marker(0)) 1 else 0
            if (m == marker.length) { counter.incrementAndGet(); m = 0 }
            i += 1
          }
          n = in.read(buf)
        }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true)
    t.start()
    t
  }

  /** One measured run: K subscribers, N events. Returns (wallSec). */
  private def run(spark: SparkSession, subs: Int, events: Int): Double = {
    val sockPath = s"/tmp/graft-sbench-${System.nanoTime()}.sock"
    val server = new EventStreamServer(
      spark, socketPath = Some(sockPath), pingIntervalSec = 3600,
      partitionsPerBatch = Some(8))
    try {
      val port = server.sse.actualPort
      val counters = Array.fill(subs)(new AtomicLong)
      val sockets = (0 until subs).map { i =>
        val s = new Socket("127.0.0.1", port)
        val w = new OutputStreamWriter(s.getOutputStream, StandardCharsets.US_ASCII)
        w.write("GET /events?subsystem=bench HTTP/1.1\r\nHost: x\r\n\r\n")
        w.flush()
        countFrames(s, counters(i))
        s
      }
      // wait until the registry sees everyone (registration is async
      // to the HTTP accept loop)
      val regDeadline = System.currentTimeMillis() + 15000
      while (server.sse.allListeners.size < subs
        && System.currentTimeMillis() < regDeadline) Thread.sleep(10)
      require(server.sse.allListeners.size == subs, "subscribers not registered")

      val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
      ch.connect(UnixDomainSocketAddress.of(sockPath))
      val pw = new OutputStreamWriter(
        Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      val t0 = System.nanoTime()
      var i = 0
      while (i < events) {
        pw.write(
          s"""{"action": "notify", "subsystem": "bench", "event": "add", "data": {"k": $i}, "id": "e$i"}""" + "\n")
        i += 1
        if (i % 2000 == 0) pw.flush() // stream in chunks: batches overlap production
      }
      pw.flush()
      // drain: processAllAvailable covers what has reached the source;
      // lines still in flight through the socket reader need another
      // pass, so loop until every subscriber saw every frame
      val deadline = System.currentTimeMillis() + 120000
      while (counters.exists(_.get() < events)
        && System.currentTimeMillis() < deadline) {
        server.processAllAvailable()
        Thread.sleep(10)
      }
      val t1 = System.nanoTime()
      val missing = counters.count(_.get() < events)
      require(missing == 0,
        s"$missing/$subs subscribers incomplete: ${counters.map(_.get()).min}/$events")
      sockets.foreach(s => try s.close() catch { case _: Exception => () })
      ch.close()
      (t1 - t0) / 1e9
    } finally server.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      run(spark, subs = 1, events = 2000) // warmup: codegen + classloading
      // 1 and 32 subscribers take the plan-compiled fan-out;
      // 80 crosses CompiledSubsLimit onto the broadcast-join path.
      val cases = Seq((1, 20000), (32, 20000), (80, 5000))
      val rows = cases.map { case (k, n) =>
        val sec = run(spark, k, n)
        val eps = (n / sec).round
        val dps = (n.toLong * k / sec).round
        println(s"subs=$k events=$n wall=${f"$sec%.2f"}s ingest=$eps ev/s deliveries=$dps/s")
        s"""{"subs":$k,"events":$n,"wall_s":$sec,"events_per_sec":$eps,"deliveries_per_sec":$dps}"""
      }
      val line = s"""{"metric":"stream_throughput","runs":[${rows.mkString(",")}]}"""
      println(line)
      val out = java.nio.file.Paths.get("target/stream_bench.json")
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    } finally spark.stop()
  }
}
