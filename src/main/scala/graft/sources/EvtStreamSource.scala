package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.net.{InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.channels.{Channels, ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 micro-batch source replicating the reference's ingest
  * side (evtstrd/socket_server.py:25-92): the source *listens* on a
  * socket — Unix domain (option `path`, the reference's transport) or
  * TCP (option `port`, for tests) — accepts any number of producer
  * connections, and reads one JSON value per line. Lines buffer on the
  * driver; each micro-batch drains the lines accumulated since the
  * last offset, giving replay within the run (offsets are cumulative
  * line counts). Envelope validation/corrupt-line dropping happens in
  * the downstream plan (EventStreamPipeline.parseLines), exactly where
  * the reference does it (util.py:11-21).
  *
  * Registered as format "evtstream" via its provider class name
  * `graft.sources.EvtStreamSource`. Driver-side accumulation mirrors
  * Spark's own TextSocketMicroBatchStream; at production scale the
  * same interface fronts a partitioned transport (one accept loop per
  * input partition).
  */
class EvtStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EvtStreamSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EvtStreamTable(properties)
}

object EvtStreamSource {
  /** `_offset` is the source-assigned GLOBAL line offset (the same
    * cumulative count the replay offsets use). Downstream delivery
    * sorts on it, so per-listener wire order is source arrival order
    * even when one micro-batch spans several input partitions —
    * `monotonically_increasing_id` would only order within a
    * partition and interleave across them in partition-id order.
    */
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("_offset", LongType, nullable = false)))

  /** Test/ops hook: live line counts per source instance key. */
  val buffered = new ConcurrentHashMap[String, Integer]()

  /** Test/ops hook: global received high-water (the next line's
    * offset) per instance key — unlike [[buffered]] it never shrinks
    * at commit, so the arrival of a production burst stays observable
    * while a live query is committing batches underneath.
    */
  val highWater = new ConcurrentHashMap[String, java.lang.Long]()
}

final class EvtStreamTable(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = "evtstream"
  override def schema(): StructType = EvtStreamSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () =>
      new Scan {
        override def readSchema(): StructType = EvtStreamSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new EvtStreamMicroBatch(
            Option(options.get("path")),
            Option(options.get("port")).map(_.toInt),
            Option(options.get("mode")).map(Integer.parseInt(_, 8)),
            Option(options.get("owner")),
            Option(options.get("group")),
            Option(options.get("maxLinesPerBatch")).map(_.toLong),
            Option(options.get("partitionsPerBatch")).map(_.toInt),
            Option(options.get("spool")),
            Option(options.get("spoolSegmentBytes")).map(_.toLong))
      }
}

final case class LineOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

/** @param spool durable-replay WAL mode: every received line is
  *   appended to the active spool segment BEFORE it becomes visible
  *   to the engine (write-ahead), segments are fsync'd at each batch
  *   commit, and a fresh instance recovers the uncommitted line tail
  *   from them — so a checkpointed query can restart across a
  *   process kill with no loss of spooled-but-unprocessed events and
  *   no replay of committed ones. Without it, a live socket has no
  *   history (evtstrd/socket_server.py:82-92 has the same property)
  *   and a restart-from-checkpoint fails fast in planInputPartitions.
  *   A torn trailing line from a mid-write crash is truncated at
  *   recovery (it was never visible to the engine: visibility
  *   follows the completed write).
  *
  *   COMPACTION: the spool is segmented — the first segment is the
  *   `spool` path itself (base line-offset 0), rolled segments live
  *   at `<spool>.seg<base>` where `<base>` is the global offset of
  *   the segment's first line. At each commit the active segment
  *   rolls once it exceeds `spoolSegmentBytes`, and any segment
  *   whose entire line range is below the committed watermark is
  *   deleted — so on-disk size and restart replay are O(uncommitted
  *   tail), not O(stream lifetime). Segment bases ride in the file
  *   names, so a crash between roll and delete only leaves an extra
  *   already-committed segment behind (replayed into the buffer with
  *   correct global offsets, never re-delivered: the engine asks
  *   from its checkpointed offset).
  *
  * @param spoolSegmentBytes roll threshold for the active segment
  *   (default 16 MiB); tests shrink it to force rotation.
  */
final class EvtStreamMicroBatch(
    path: Option[String],
    port: Option[Int],
    socketMode: Option[Int] = None,
    socketOwner: Option[String] = None,
    socketGroup: Option[String] = None,
    maxLinesPerBatch: Option[Long] = None,
    partitionsPerBatch: Option[Int] = None,
    spool: Option[String] = None,
    spoolSegmentBytes: Option[Long] = None)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  maxLinesPerBatch.foreach(m => require(m > 0,
    s"maxLinesPerBatch must be positive, got $m (0 would stall the " +
      "stream forever while the driver buffer grows unboundedly)"))
  partitionsPerBatch.foreach(p => require(p > 0,
    s"partitionsPerBatch must be positive, got $p"))
  private val lines = ArrayBuffer.empty[String]
  private val running = new AtomicBoolean(true)
  @volatile private var committed = 0L
  // Trigger.AvailableNow endpoint: fixed at prepare time so the run
  // has run-to-completion semantics even while producers keep writing
  @volatile private var availableNowTarget: Option[Long] = None

  private val channel: ServerSocketChannel = path match {
    case Some(p) =>
      val addr = UnixDomainSocketAddress.of(p)
      Files.deleteIfExists(Path.of(p)) // stale socket removal (socket_server.py:48-57)
      val ch = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
      ch.bind(addr)
      // chmod/chown like the reference (socket_server.py:59-70);
      // ownership changes need privilege and fail soft, as there
      applySocketPerms(Path.of(p))
      ch
    case None =>
      val ch = ServerSocketChannel.open()
      ch.bind(new InetSocketAddress("127.0.0.1", port.getOrElse(0)))
      ch
  }

  private def applySocketPerms(p: Path): Unit = {
    socketMode.foreach { mode =>
      val perms = new java.util.HashSet[java.nio.file.attribute.PosixFilePermission]()
      import java.nio.file.attribute.PosixFilePermission._
      val bits = Seq(
        OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
        GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
      bits.zipWithIndex.foreach { case (perm, i) =>
        if ((mode & (1 << (8 - i))) != 0) perms.add(perm)
      }
      try Files.setPosixFilePermissions(p, perms)
      catch { case _: Exception => () }
    }
    val lookup = p.getFileSystem.getUserPrincipalLookupService
    socketOwner.foreach(o =>
      try Files.setOwner(p, lookup.lookupPrincipalByName(o))
      catch { case _: Exception => () })
    socketGroup.foreach(g =>
      try Files.getFileAttributeView(
        p, classOf[java.nio.file.attribute.PosixFileAttributeView])
        .setGroup(lookup.lookupPrincipalByGroupName(g))
      catch { case _: Exception => () })
  }

  /** Key under which tests can observe buffered counts. */
  val instanceKey: String = path.getOrElse {
    "tcp:" + channel.getLocalAddress
      .asInstanceOf[InetSocketAddress].getPort.toString
  }

  private val segBytesLimit: Long = spoolSegmentBytes.getOrElse(16L << 20)
  require(segBytesLimit > 0,
    s"spoolSegmentBytes must be positive, got $segBytesLimit")
  // retained spool segments in base-offset order; last one is active
  private val spoolSegments = ArrayBuffer.empty[(Long, Path)]
  @volatile private var spoolActive: Option[java.nio.channels.FileChannel] = None
  private var spoolActiveBytes = 0L

  private def segPath(base: Long): Path =
    if (base == 0L) Path.of(spool.get) else Path.of(spool.get + ".seg" + base)

  // WAL recovery + append channel — set up BEFORE the accept loop so
  // no live line can interleave with the recovered history. Reads
  // only the retained segments (everything wholly below the committed
  // watermark was deleted at commit), so restart replay is
  // O(uncommitted tail), not O(stream lifetime).
  spool.foreach { f =>
    val p = Path.of(f)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val segPrefix = p.getFileName.toString + ".seg"
    val rolled =
      Option(p.getParent).map { dir =>
        if (Files.exists(dir)) {
          val it = Files.list(dir)
          try {
            import scala.jdk.CollectionConverters._
            it.iterator().asScala.flatMap { q =>
              val n = q.getFileName.toString
              if (n.startsWith(segPrefix))
                n.stripPrefix(segPrefix).toLongOption.map(_ -> q)
              else None
            }.toVector
          } finally it.close()
        } else Vector.empty
      }.getOrElse(Vector.empty)
    val found = ((if (Files.exists(p)) Vector(0L -> p) else Vector.empty)
      ++ rolled).sortBy(_._1)
    var nextBase = found.headOption.map(_._1).getOrElse(0L)
    committed = nextBase
    found.zipWithIndex.foreach { case ((base, q), i) =>
      if (base != nextBase)
        throw new IllegalStateException(
          s"corrupted spool: segment $q starts at line $base but the " +
            s"previous segment ends at line $nextBase")
      val bytes = Files.readAllBytes(q)
      val lastNl = bytes.lastIndexOf('\n'.toByte)
      val completeLen = lastNl + 1 // 0 when no newline at all
      if (completeLen < bytes.length) {
        // torn tail from a mid-write crash: only the ACTIVE (last)
        // segment ever receives writes, and the line never became
        // visible to the engine (visibility follows the completed
        // write), so truncating it cannot lose checkpointed data
        if (i != found.size - 1)
          throw new IllegalStateException(
            s"corrupted spool: non-final segment $q has a torn tail")
        val fc = java.nio.channels.FileChannel.open(
          q, java.nio.file.StandardOpenOption.WRITE)
        try fc.truncate(completeLen.toLong)
        finally fc.close()
      }
      if (completeLen > 0) {
        val recovered = new String(bytes, 0, completeLen,
          StandardCharsets.UTF_8).split("\n", -1).dropRight(1)
        lines ++= recovered
        nextBase += recovered.length
      }
      spoolSegments += ((base, q))
    }
    EvtStreamSource.buffered.put(instanceKey, lines.size)
    EvtStreamSource.highWater.put(instanceKey, committed + lines.size)
    if (spoolSegments.isEmpty) spoolSegments += ((0L, p))
    val active = spoolSegments.last._2
    spoolActiveBytes = if (Files.exists(active)) Files.size(active) else 0L
    spoolActive = Some(java.nio.channels.FileChannel.open(
      active,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.APPEND))
  }

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val client = channel.accept()
        val t = new Thread(() => readLoop(client), "evtstream-read")
        t.setDaemon(true)
        t.start()
      } catch { case _: Exception => () }
    }
  }, "evtstream-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def readLoop(client: SocketChannel): Unit = {
    try {
      val reader = new BufferedReader(
        new InputStreamReader(
          Channels.newInputStream(client), StandardCharsets.UTF_8))
      Iterator.continually(reader.readLine())
        .takeWhile(_ != null) // EOF ends this producer (util.py:20-21)
        .foreach { line =>
          lines.synchronized {
            // WRITE-AHEAD: the spool append precedes buffer
            // visibility, so any offset the engine checkpoints is
            // backed by spooled bytes (fsync'd at batch commit)
            spoolActive.foreach { ch =>
              val bytes = (line + "\n").getBytes(StandardCharsets.UTF_8)
              ch.write(java.nio.ByteBuffer.wrap(bytes))
              spoolActiveBytes += bytes.length
            }
            lines += line
            EvtStreamSource.buffered.put(instanceKey, lines.size)
            EvtStreamSource.highWater.put(instanceKey, committed + lines.size)
          }
        }
    } catch { case _: Exception => () }
    finally {
      try client.close()
      catch { case _: Exception => () }
    }
  }

  override def initialOffset(): Offset = LineOffset(0L)

  /** Admission control: a producer burst must not become one giant
    * micro-batch (unbounded batch memory + a latency cliff for every
    * event behind it). With `maxLinesPerBatch` set, each trigger
    * admits at most that many lines (surfaced to the engine as the
    * default ReadLimit.maxRows) and the backlog drains over
    * successive micro-batches: `processAllAvailable` keeps going
    * because latestOffset advances every trigger until the buffer is
    * empty, and Trigger.AvailableNow keeps going because this source
    * implements SupportsTriggerAvailableNow — the endpoint is
    * snapshotted in prepareForTriggerAvailableNow and batches are
    * capped toward it (without the interface, Spark would snapshot
    * ONE capped latestOffset and stop there, silently dropping the
    * rest of the backlog).
    */
  override def latestOffset(): Offset =
    latestOffset(null, getDefaultReadLimit)

  override def getDefaultReadLimit: ReadLimit =
    maxLinesPerBatch.fold(ReadLimit.allAvailable())(ReadLimit.maxRows)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    lines.synchronized {
      // The cap is relative to START, not the commit watermark: the
      // engine asks for the next end offset BEFORE committing the
      // previous batch, so capping from `committed` would return the
      // previous end and stall the drain after one batch.
      val trueEnd0 = committed + lines.size
      val trueEnd = availableNowTarget.fold(trueEnd0)(math.min(_, trueEnd0))
      val s = Option(start)
        .map(_.asInstanceOf[LineOffset].count).getOrElse(committed)
      val end = limit match {
        case r: ReadMaxRows => math.min(s + r.maxRows(), trueEnd)
        case _ => trueEnd
      }
      LineOffset(math.max(end, s))
    }

  override def prepareForTriggerAvailableNow(): Unit =
    lines.synchronized {
      availableNowTarget = Some(committed + lines.size)
    }

  /** The endpoint an AvailableNow run must reach before terminating. */
  override def reportLatestOffset(): Offset = lines.synchronized {
    LineOffset(availableNowTarget.getOrElse(committed + lines.size))
  }
  override def deserializeOffset(json: String): Offset =
    LineOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].count
    val e = end.asInstanceOf[LineOffset].count
    val slice = lines.synchronized {
      // A restart from checkpoint resets this instance (committed=0,
      // empty buffer); a range outside the live window means the
      // checkpoint references data this volatile transport no longer
      // holds. Fail fast rather than silently replaying an empty
      // slice as successful progress.
      if (s < committed || e - committed > lines.size)
        throw new IllegalStateException(
          s"evtstream offset range [$s, $e) outside buffered window " +
            s"[$committed, ${committed + lines.size}); checkpointed data " +
            "is not replayable from a live socket — start a fresh query, " +
            "or run with the `spool` option for durable-replay restarts")
      lines.slice((s - committed).toInt, (e - committed).toInt).toArray
    }
    // contiguous chunks so each partition's rows keep consecutive
    // global offsets; with >1 partition the per-line `_offset` column
    // is what preserves cross-partition arrival order downstream
    val nParts = math.max(1, math.min(
      partitionsPerBatch.getOrElse(1), slice.length))
    val chunk = (slice.length + nParts - 1) / math.max(nParts, 1)
    if (slice.isEmpty) Array(LinesPartition(slice, s))
    else slice.grouped(chunk).zipWithIndex.map { case (rows, i) =>
      LinesPartition(rows, s + i.toLong * chunk)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[LinesPartition]
      val rows = p.rows
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow =
          InternalRow(UTF8String.fromString(rows(i)), p.startOffset + i)
        override def close(): Unit = ()
      }
    }

  override def commit(end: Offset): Unit = {
    // WAL batch boundary: everything the batch read is on disk before
    // the engine records it committed. A failed fsync FAILS THE
    // COMMIT — swallowing it would let the engine record a batch
    // whose WAL bytes never reached disk, silently voiding the
    // no-loss recovery contract after a machine crash.
    spoolActive.foreach { ch =>
      try ch.force(false)
      catch {
        case ex: Exception =>
          throw new IllegalStateException(
            "evtstream spool fsync failed at batch commit — the WAL " +
              "durability contract cannot be honored for this batch", ex)
      }
    }
    val e = end.asInstanceOf[LineOffset].count
    lines.synchronized {
      val drop = (e - committed).toInt
      if (drop > 0) {
        // a commit past the buffered window would desynchronize the
        // offset math (lines(0) must sit at offset `committed`): the
        // engine only ever commits offsets it has read, so this is
        // always a caller bug — fail loud instead of corrupting
        if (drop > lines.size)
          throw new IllegalStateException(
            s"evtstream commit($e) outruns the buffered window " +
              s"[$committed, ${committed + lines.size})")
        lines.remove(0, drop)
        committed = e
        // keep the observable count in step with the trim — the
        // receiver thread only updates it on append, and a stale
        // post-commit reading over-reports the uncommitted backlog
        EvtStreamSource.buffered.put(instanceKey, lines.size)
      }
      compactSpool()
    }
  }

  /** Roll the active segment past the size threshold and delete every
    * segment wholly below the committed watermark; holds the `lines`
    * lock so no append can interleave with a roll. O(segment count),
    * no data copy — deletion only, bases ride in file names.
    */
  private def compactSpool(): Unit = spoolActive.foreach { ch =>
    if (spoolActiveBytes >= segBytesLimit) {
      ch.force(false); ch.close()
      val base = committed + lines.size // next line's global offset
      val p = segPath(base)
      spoolSegments += ((base, p))
      spoolActiveBytes = 0L
      spoolActive = Some(java.nio.channels.FileChannel.open(
        p,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.APPEND))
    }
    // a segment is dead when the NEXT segment's base is <= committed
    // (its last line is nextBase-1); the active segment never dies
    while (spoolSegments.size >= 2 && spoolSegments(1)._1 <= committed) {
      val (_, dead) = spoolSegments.remove(0)
      try Files.deleteIfExists(dead)
      catch { case _: Exception => () } // retried at the next commit
    }
  }

  /** Test hook: the active spool channel, to provoke fsync failure. */
  private[graft] def spoolActiveChannelForTest: Option[java.nio.channels.FileChannel] =
    spoolActive

  /** Test hook: retained on-disk segment paths in base order. */
  private[graft] def spoolSegmentsForTest: Seq[(Long, Path)] =
    lines.synchronized(spoolSegments.toSeq)

  override def stop(): Unit = {
    running.set(false)
    try channel.close()
    catch { case _: Exception => () }
    spoolActive.foreach(ch =>
      try ch.close()
      catch { case _: Exception => () })
    EvtStreamSource.buffered.remove(instanceKey)
    path.foreach(p =>
      try Files.deleteIfExists(Path.of(p))
      catch { case _: Exception => () })
  }
}

final case class LinesPartition(rows: Array[String], startOffset: Long)
    extends InputPartition
