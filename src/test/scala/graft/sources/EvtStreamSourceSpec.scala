package graft.sources

import java.io.OutputStreamWriter
import java.net.InetSocketAddress
import java.nio.channels.SocketChannel
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.read.streaming.Offset
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level contract of the micro-batch source's offset window:
  * replay within the run works; a range outside the buffered window
  * (the restart-from-checkpoint case for a volatile socket transport)
  * must fail fast instead of silently returning an empty slice.
  */
class EvtStreamSourceSpec extends AnyFunSuite {

  private def lines(p: Array[org.apache.spark.sql.connector.read.InputPartition]) =
    p.flatMap(_.asInstanceOf[LinesPartition].rows).toSeq

  test("offsets slice the buffered window; out-of-window ranges fail fast") {
    val mb = new EvtStreamMicroBatch(path = None, port = Some(0))
    try {
      val port = mb.instanceKey.stripPrefix("tcp:").toInt
      val ch = SocketChannel.open(new InetSocketAddress("127.0.0.1", port))
      val w = new OutputStreamWriter(
        java.nio.channels.Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      (1 to 4).foreach(i => w.write(s"line-$i\n"))
      w.flush()
      val deadline = System.currentTimeMillis() + 60000
      while (EvtStreamSource.buffered.getOrDefault(mb.instanceKey, 0) < 4
        && System.currentTimeMillis() < deadline) Thread.sleep(20)
      def off(n: Long): Offset = LineOffset(n)

      assert(lines(mb.planInputPartitions(off(0), off(2))) == Seq("line-1", "line-2"))
      assert(lines(mb.planInputPartitions(off(2), off(4))) == Seq("line-3", "line-4"))
      mb.commit(off(2))
      // within the remaining window after a commit
      assert(lines(mb.planInputPartitions(off(2), off(4))) == Seq("line-3", "line-4"))
      // start below the committed watermark => gone from the buffer
      intercept[IllegalStateException](mb.planInputPartitions(off(0), off(2)))
      // end beyond what was ever buffered (fresh-restart replay case)
      intercept[IllegalStateException](mb.planInputPartitions(off(2), off(99)))
      ch.close()
    } finally mb.stop()
  }

  test("maxLinesPerBatch admits a burst over successive micro-batches") {
    val mb = new EvtStreamMicroBatch(
      path = None, port = Some(0), maxLinesPerBatch = Some(3L))
    try {
      val port = mb.instanceKey.stripPrefix("tcp:").toInt
      val ch = SocketChannel.open(new InetSocketAddress("127.0.0.1", port))
      val w = new OutputStreamWriter(
        java.nio.channels.Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      (1 to 8).foreach(i => w.write(s"line-$i\n"))
      w.flush()
      val deadline = System.currentTimeMillis() + 60000
      while (EvtStreamSource.buffered.getOrDefault(mb.instanceKey, 0) < 8
        && System.currentTimeMillis() < deadline) Thread.sleep(20)

      // drain the way MicroBatchExecution does: latestOffset, run the
      // batch, commit, repeat — the 8-line burst takes 3 batches of
      // at most 3 lines, in order, losing nothing
      var start = 0L
      val batches = Iterator.continually {
        val end = mb.latestOffset().asInstanceOf[LineOffset].count
        val got =
          if (end == start) Nil
          else lines(mb.planInputPartitions(
            LineOffset(start), LineOffset(end)))
        if (end != start) { mb.commit(LineOffset(end)); start = end }
        got
      }.takeWhile(_.nonEmpty).toList
      assert(batches.map(_.size) == List(3, 3, 2))
      assert(batches.flatten == (1 to 8).map(i => s"line-$i"))
      ch.close()
    } finally mb.stop()
  }

  test("AvailableNow drains the full prepared backlog despite the cap") {
    val mb = new EvtStreamMicroBatch(
      path = None, port = Some(0), maxLinesPerBatch = Some(3L))
    try {
      val port = mb.instanceKey.stripPrefix("tcp:").toInt
      val ch = SocketChannel.open(new InetSocketAddress("127.0.0.1", port))
      val w = new OutputStreamWriter(
        java.nio.channels.Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      (1 to 8).foreach(i => w.write(s"line-$i\n"))
      w.flush()
      val deadline = System.currentTimeMillis() + 60000
      while (EvtStreamSource.buffered.getOrDefault(mb.instanceKey, 0) < 8
        && System.currentTimeMillis() < deadline) Thread.sleep(20)

      // the SupportsTriggerAvailableNow protocol: snapshot the
      // endpoint, then run capped batches until it is reached
      mb.prepareForTriggerAvailableNow()
      val target = mb.reportLatestOffset().asInstanceOf[LineOffset].count
      assert(target == 8L)
      // a line arriving AFTER prepare is outside this run
      w.write("late-line\n"); w.flush()
      val dl2 = System.currentTimeMillis() + 60000
      while (EvtStreamSource.buffered.getOrDefault(mb.instanceKey, 0) < 9
        && System.currentTimeMillis() < dl2) Thread.sleep(20)

      var start = 0L
      val drained = ArrayBuffer.empty[String]
      var batches = 0
      while (start < target) {
        val end = mb.latestOffset().asInstanceOf[LineOffset].count
        assert(end - start <= 3L)
        assert(end <= target) // never admits past the prepared end
        drained ++= lines(mb.planInputPartitions(
          LineOffset(start), LineOffset(end)))
        mb.commit(LineOffset(end)); start = end; batches += 1
      }
      assert(batches == 3)
      assert(drained.toSeq == (1 to 8).map(i => s"line-$i"))
      ch.close()
    } finally mb.stop()
  }

  test("partitionsPerBatch splits a batch into contiguous offset-correct chunks") {
    val mb = new EvtStreamMicroBatch(
      path = None, port = Some(0), partitionsPerBatch = Some(3))
    try {
      val port = mb.instanceKey.stripPrefix("tcp:").toInt
      val ch = SocketChannel.open(new InetSocketAddress("127.0.0.1", port))
      val w = new OutputStreamWriter(
        java.nio.channels.Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      (1 to 7).foreach(i => w.write(s"line-$i\n"))
      w.flush()
      val deadline = System.currentTimeMillis() + 60000
      while (EvtStreamSource.buffered.getOrDefault(mb.instanceKey, 0) < 7
        && System.currentTimeMillis() < deadline) Thread.sleep(20)

      val parts = mb.planInputPartitions(LineOffset(0), LineOffset(7))
        .map(_.asInstanceOf[LinesPartition])
      assert(parts.length == 3)
      // contiguous chunks, global start offsets, nothing lost
      assert(parts.map(_.rows.toSeq).toSeq ==
        Seq(Seq("line-1", "line-2", "line-3"),
          Seq("line-4", "line-5", "line-6"), Seq("line-7")))
      assert(parts.map(_.startOffset).toSeq == Seq(0L, 3L, 6L))
      // a commit shifts the buffer but offsets stay global
      mb.commit(LineOffset(3))
      val tail = mb.planInputPartitions(LineOffset(3), LineOffset(7))
        .map(_.asInstanceOf[LinesPartition])
      assert(tail.map(_.startOffset).toSeq == Seq(3L, 5L))
      assert(tail.flatMap(_.rows).toSeq ==
        Seq("line-4", "line-5", "line-6", "line-7"))
      ch.close()
    } finally mb.stop()
  }

  test("non-positive maxLinesPerBatch is rejected at construction") {
    intercept[IllegalArgumentException] {
      new EvtStreamMicroBatch(
        path = None, port = Some(0), maxLinesPerBatch = Some(0L))
    }
  }

  test("spool WAL compacts at commit: disk and restart replay are tail-sized") {
    // a long-running stream must not accumulate its full history in
    // the spool: segments wholly below the committed watermark are
    // deleted at commit, and a restart replays only the retained tail
    val prefix = s"/tmp/graft-compact-${System.nanoTime()}.spool"
    val line = (i: Int) => f"line-$i%05d-padding-padding-padding" // 31 B
    val mb = new EvtStreamMicroBatch(
      path = None, port = Some(0), spool = Some(prefix),
      spoolSegmentBytes = Some(512L)) // ~16 lines per segment
    try {
      val port = mb.instanceKey.stripPrefix("tcp:").toInt
      val ch = SocketChannel.open(new InetSocketAddress("127.0.0.1", port))
      val w = new OutputStreamWriter(
        java.nio.channels.Channels.newOutputStream(ch), StandardCharsets.UTF_8)
      // commit in waves so rotation interleaves with ingestion the way
      // a live micro-batch loop would
      var sent = 0
      for (upTo <- Seq(300, 600, 900)) {
        (sent until upTo).foreach(i => w.write(line(i) + "\n"))
        w.flush()
        // generous deadline: this box runs the suite alongside sf10
        // sweeps at loadavg 30+, where 10s was observed to flake
        val dl = System.currentTimeMillis() + 60000
        def buffered = EvtStreamSource.buffered.getOrDefault(mb.instanceKey, 0).toInt
        // each prior wave was fully committed, so the buffer holds
        // only this wave's lines once they all arrive
        while (buffered < upTo - sent && System.currentTimeMillis() < dl)
          Thread.sleep(20)
        // fail HERE, by name, if the wave never arrived — committing an
        // offset past the received lines would corrupt every assertion
        // downstream and point the failure at the wrong place
        assert(buffered == upTo - sent,
          s"wave to $upTo: only $buffered of ${upTo - sent} lines arrived")
        sent = upTo
        mb.commit(LineOffset(upTo.toLong))
      }
      ch.close(); mb.stop()

      // on-disk state: only tail-adjacent segments survive — the full
      // 900-line history is ~28 KB; the retained spool must be one
      // (possibly empty) active segment plus at most one predecessor
      val segs = mb.spoolSegmentsForTest
      assert(segs.size <= 2, segs)
      assert(segs.head._1 <= 900L && segs.last._1 <= 900L, segs)
      val diskBytes = segs.map { case (_, p) =>
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else 0L
      }.sum
      assert(diskBytes <= 2 * 512L + 64L, s"spool not compacted: $diskBytes bytes")

      // restart: recovery replays only the retained tail, with global
      // offsets intact — feed 5 post-restart lines and read them back
      val mb2 = new EvtStreamMicroBatch(
        path = None, port = Some(0), spool = Some(prefix),
        spoolSegmentBytes = Some(512L))
      try {
        val recovered = EvtStreamSource.buffered.getOrDefault(mb2.instanceKey, 0).toInt
        assert(recovered <= 32, s"restart replayed $recovered lines, not the tail")
        val ch2 = SocketChannel.open(
          new InetSocketAddress("127.0.0.1", mb2.instanceKey.stripPrefix("tcp:").toInt))
        val w2 = new OutputStreamWriter(
          java.nio.channels.Channels.newOutputStream(ch2), StandardCharsets.UTF_8)
        (900 until 905).foreach(i => w2.write(line(i) + "\n"))
        w2.flush()
        val dl = System.currentTimeMillis() + 60000
        while (EvtStreamSource.buffered.getOrDefault(mb2.instanceKey, 0) < recovered + 5
          && System.currentTimeMillis() < dl) Thread.sleep(20)
        // the engine restarts from its checkpoint (900): the slice is
        // exactly the five new lines at their correct global offsets
        assert(lines(mb2.planInputPartitions(LineOffset(900), LineOffset(905)))
          == (900 until 905).map(line))
        ch2.close()
      } finally mb2.stop()
    } finally {
      mb.spoolSegmentsForTest.foreach { case (_, p) =>
        java.nio.file.Files.deleteIfExists(p)
      }
      java.nio.file.Files.deleteIfExists(java.nio.file.Path.of(prefix))
    }
  }

  test("commit fails loud when the spool fsync fails (WAL durability contract)") {
    val prefix = s"/tmp/graft-fsync-${System.nanoTime()}.spool"
    val mb = new EvtStreamMicroBatch(
      path = None, port = Some(0), spool = Some(prefix))
    try {
      // simulate a dead disk: the active channel is closed underneath
      mb.spoolActiveChannelForTest.foreach(_.close())
      val ex = intercept[IllegalStateException](mb.commit(LineOffset(0)))
      assert(ex.getMessage.contains("fsync"), ex.getMessage)
    } finally {
      mb.stop()
      java.nio.file.Files.deleteIfExists(java.nio.file.Path.of(prefix))
    }
  }

  test("engine honors the cap: a live query drains a burst in bounded batches") {
    val spark = graft.TestSpark.spark
    val sockPath = s"/tmp/graft-cap-${System.nanoTime()}.sock"
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream
      .format("graft.sources.EvtStreamSource")
      .option("path", sockPath)
      .option("maxLinesPerBatch", "4")
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        if (n > 0) sizes.add(n)
        ()
      }
      .start()
    try {
      // the source (and its listening socket) comes up asynchronously
      // with the query's first trigger — wait for the file
      val sockDl = System.currentTimeMillis() + 60000
      while (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(sockPath))
        && System.currentTimeMillis() < sockDl) Thread.sleep(20)
      val ch = SocketChannel.open(
        java.net.StandardProtocolFamily.UNIX)
      ch.connect(
        java.net.UnixDomainSocketAddress.of(sockPath))
      val w = new OutputStreamWriter(
        java.nio.channels.Channels.newOutputStream(ch),
        StandardCharsets.UTF_8)
      (1 to 10).foreach(i => w.write(s"line-$i\n"))
      w.flush()
      val deadline = System.currentTimeMillis() + 60000
      while (EvtStreamSource.buffered.getOrDefault(sockPath, 0) < 10
        && System.currentTimeMillis() < deadline) Thread.sleep(20)
      q.processAllAvailable()
      val got = sizes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      assert(got.sum == 10L, got.toSeq)
      assert(got.forall(_ <= 4L), got.toSeq) // engine asked per ReadLimit
      assert(got.length >= 3, got.toSeq)     // burst split across batches
      ch.close()
    } finally q.stop()
  }
}
