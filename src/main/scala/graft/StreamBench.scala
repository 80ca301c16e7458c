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

  /** Extract SSE frame ids ("id: eN") and record per-frame latency
    * against the producer's send-stamp array.
    */
  private def probeFrames(
      s: Socket, sent: java.util.concurrent.atomic.AtomicLongArray,
      lats: java.util.concurrent.ConcurrentLinkedQueue[Long],
      counter: AtomicLong): Thread = {
    val t = new Thread(() => {
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(s.getInputStream, StandardCharsets.US_ASCII))
        Iterator.continually(in.readLine()).takeWhile(_ != null).foreach { line =>
          if (line.startsWith("id: e")) {
            counter.incrementAndGet()
            val idx = line.substring(5).trim.toInt
            val t0 = sent.get(idx)
            if (t0 > 0) lats.add(System.nanoTime() - t0)
          }
        }
      } catch { case _: Exception => () }
    })
    t.setDaemon(true)
    t.start()
    t
  }

  /** The sustained-load probe (round-9 verdict item 8): ≥10× the
    * events of the 80-subscriber case, subscribers joining and
    * leaving CONTINUOUSLY during the burst, and the spool WAL ON with
    * a small segment size — measuring deliveries/s, p50/p99 frame
    * latency at a probe subscriber, and the on-disk spool footprint
    * over time. The spool assertions are the live twin of
    * EvtStreamSourceSpec's compaction test: peak spool bytes must
    * stay below the total bytes produced (segments deleted DURING the
    * run, not only at the end) and the post-drain footprint must be
    * tail-sized.
    */
  private def sustained(spark: SparkSession): String = {
    val stableSubs = 24
    val churnPool = 8
    val events = 50000
    val tag = System.nanoTime()
    val sockPath = s"/tmp/graft-sbench-$tag.sock"
    val spoolPrefix = s"/tmp/graft-sbench-$tag.spool"
    val segBytes = 1L << 20
    val server = new EventStreamServer(
      spark, socketPath = Some(sockPath), pingIntervalSec = 3600,
      partitionsPerBatch = Some(8), spool = Some(spoolPrefix),
      spoolSegmentBytes = Some(segBytes))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      val port = server.sse.actualPort
      def subscribe(): Socket = {
        val s = new Socket("127.0.0.1", port)
        val w = new OutputStreamWriter(s.getOutputStream, StandardCharsets.US_ASCII)
        w.write("GET /events?subsystem=bench HTTP/1.1\r\nHost: x\r\n\r\n")
        w.flush()
        s
      }
      val counters = Array.fill(stableSubs)(new AtomicLong)
      val sent = new java.util.concurrent.atomic.AtomicLongArray(events)
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      // probe subscriber 0 parses ids for latency; the rest count
      val sockets = (0 until stableSubs).map { i =>
        val s = subscribe()
        if (i == 0) probeFrames(s, sent, lats, counters(i))
        else countFrames(s, counters(i))
        s
      }
      val regDeadline = System.currentTimeMillis() + 15000
      while (server.sse.allListeners.size < stableSubs
        && System.currentTimeMillis() < regDeadline) Thread.sleep(10)
      require(server.sse.allListeners.size == stableSubs,
        "stable subscribers not registered")

      // continuous churn: a rolling pool of extra subscribers joins
      // and leaves for the whole burst (registry copy-before-iterate
      // under real load, not just the EndToEndSpec churn case)
      val churns = new AtomicLong
      val churnThread = new Thread(() => {
        val pool = scala.collection.mutable.Queue.empty[Socket]
        try {
          while (!stop.get()) {
            pool.enqueue(subscribe()); churns.incrementAndGet()
            if (pool.size > churnPool)
              try pool.dequeue().close() catch { case _: Exception => () }
            Thread.sleep(100)
          }
        } catch { case _: Exception => () }
        finally pool.foreach(s => try s.close() catch { case _: Exception => () })
      })
      churnThread.setDaemon(true)

      // spool footprint sampler: sum of all segment sizes, 250 ms grain
      val spoolSamples = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def spoolBytes(): Long = {
        val dir = java.nio.file.Paths.get("/tmp")
        val base = java.nio.file.Paths.get(spoolPrefix).getFileName.toString
        val it = java.nio.file.Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          it.iterator().asScala
            .filter(_.getFileName.toString.startsWith(base))
            .map(p => try java.nio.file.Files.size(p) catch { case _: Exception => 0L })
            .sum
        } finally it.close()
      }
      val sampler = new Thread(() => {
        while (!stop.get()) {
          spoolSamples.add(spoolBytes())
          Thread.sleep(250)
        }
      })
      sampler.setDaemon(true)

      val ch = SocketChannel.open(StandardProtocolFamily.UNIX)
      ch.connect(UnixDomainSocketAddress.of(sockPath))
      val pw = new OutputStreamWriter(
        Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      churnThread.start(); sampler.start()
      // PACED production — this is a sustained-load probe, not a
      // burst: the producer offers a steady rate the pipeline can
      // commit against, so spool segments roll AND die during the
      // run (a single burst would legitimately spool its entire
      // backlog before the first commit)
      val offeredEps = 2000
      val t0 = System.nanoTime()
      var bytesProduced = 0L
      var i = 0
      while (i < events) {
        val line =
          s"""{"action": "notify", "subsystem": "bench", "event": "add", "data": {"k": $i}, "id": "e$i"}""" + "\n"
        sent.set(i, System.nanoTime())
        pw.write(line)
        bytesProduced += line.length
        i += 1
        if (i % 200 == 0) {
          pw.flush()
          // hold the offered rate: sleep off any lead over the pace
          val aheadMs =
            (i.toLong * 1000 / offeredEps) - (System.nanoTime() - t0) / 1000000
          if (aheadMs > 0) Thread.sleep(aheadMs)
        }
      }
      pw.flush()
      val deadline = System.currentTimeMillis() + 300000
      while (counters.exists(_.get() < events)
        && System.currentTimeMillis() < deadline) {
        server.processAllAvailable()
        Thread.sleep(10)
      }
      val t1 = System.nanoTime()
      stop.set(true)
      val missing = counters.count(_.get() < events)
      require(missing == 0,
        s"$missing/$stableSubs stable subscribers incomplete: " +
          s"${counters.map(_.get()).min}/$events")
      // one more commit cycle so the final compaction runs, then the
      // footprint must be tail-sized (≤ one rolled + one active
      // segment), and the PEAK must prove mid-run deletion
      server.processAllAvailable()
      val finalSpool = spoolBytes()
      val maxSpool = {
        import scala.jdk.CollectionConverters._
        (spoolSamples.iterator().asScala ++ Iterator(finalSpool)).max
      }
      require(maxSpool < bytesProduced / 2,
        s"spool grew with the stream instead of the uncommitted tail: " +
          s"peak $maxSpool vs produced $bytesProduced")
      require(finalSpool <= 2 * segBytes,
        s"post-drain spool not tail-sized: $finalSpool bytes")
      val wall = (t1 - t0) / 1e9
      val latSorted = {
        import scala.jdk.CollectionConverters._
        lats.iterator().asScala.toArray.sorted
      }
      def pct(p: Double): Double =
        if (latSorted.isEmpty) -1
        else latSorted(math.min(latSorted.length - 1,
          (p * latSorted.length).toInt)) / 1e6
      val dps = (events.toLong * stableSubs / wall).round
      val row =
        s"""{"mode":"sustained","subs":$stableSubs,"churn_pool":$churnPool,""" +
          s""""churn_joins":${churns.get()},"events":$events,"offered_eps":$offeredEps,""" +
          s""""wall_s":$wall,"deliveries_per_sec":$dps,""" +
          s""""p50_latency_ms":${pct(0.50)},"p99_latency_ms":${pct(0.99)},""" +
          s""""bytes_produced":$bytesProduced,"spool_peak_bytes":$maxSpool,""" +
          s""""spool_final_bytes":$finalSpool}"""
      println(row)
      sockets.foreach(s => try s.close() catch { case _: Exception => () })
      ch.close()
      row
    } finally {
      stop.set(true)
      server.close()
      // spool cleanup
      val base = java.nio.file.Paths.get(spoolPrefix).getFileName.toString
      val it = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
      try {
        import scala.jdk.CollectionConverters._
        it.iterator().asScala.filter(_.getFileName.toString.startsWith(base))
          .foreach(p => try java.nio.file.Files.deleteIfExists(p)
          catch { case _: Exception => () })
      } finally it.close()
    }
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
      val sustainedRow = sustained(spark)
      val line = s"""{"metric":"stream_throughput","runs":[${(rows :+ sustainedRow).mkString(",")}]}"""
      println(line)
      val out = java.nio.file.Paths.get("target/stream_bench.json")
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    } finally spark.stop()
  }
}
