package graft.streaming

import java.nio.charset.StandardCharsets

import graft.operators.Fanout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** End-to-end composition of the engine's streaming half — the full
  * eventstreamd replacement (SURVEY §3):
  *
  *   EP1 ingest: `evtstream` DataSourceV2 socket source (JSON lines)
  *     -> envelope parse/validate (EventStreamPipeline.parseLines)
  *     -> per micro-batch: broadcast fan-out join against the current
  *        subscription registry + residual filter predicates
  *     -> SSE chunk writes to the matching listeners.
  *   EP2 subscribe: HTTP GET /events on [[SseServer]] (registry insert,
  *     filter compile at registration).
  *   EP3 stats: HTTP GET /stats (registry aggregation).
  *
  * Spark executes the dataflow; the SseServer owns only sockets and
  * the listener registry.
  */
final class EventStreamServer(
    spark: SparkSession,
    socketPath: Option[String] = None,
    tcpPort: Option[Int] = None,
    httpPort: Int = 0,
    pingIntervalSec: Long = 20L,
    auth: SseServer.AuthPlugin = SseServer.AllowAll,
    socketMode: Option[Int] = None,
    socketOwner: Option[String] = None,
    socketGroup: Option[String] = None,
    tls: Option[(String, String)] = None,
    partitionsPerBatch: Option[Int] = None,
    writeTimeoutMs: Long = 10_000L,
    spool: Option[String] = None,
    spoolSegmentBytes: Option[Long] = None,
    checkpointLocation: Option[String] = None,
    maxLinesPerBatch: Option[Long] = None) {

  val sse = new SseServer(httpPort, pingIntervalSec, auth, tls, writeTimeoutMs)

  private val reader = spark.readStream.format("graft.sources.EvtStreamSource")
  socketPath.foreach(p => reader.option("path", p))
  tcpPort.foreach(p => reader.option("port", p.toString))
  socketMode.foreach(m => reader.option("mode", Integer.toOctalString(m)))
  socketOwner.foreach(o => reader.option("owner", o))
  socketGroup.foreach(g => reader.option("group", g))
  partitionsPerBatch.foreach(p => reader.option("partitionsPerBatch", p.toString))
  // durable-replay mode: spool WAL + checkpoint together give
  // kill-and-restart with no loss of unprocessed events and no replay
  // of committed ones (see EvtStreamMicroBatch's spool doc)
  spool.foreach(f => reader.option("spool", f))
  spoolSegmentBytes.foreach(b => reader.option("spoolSegmentBytes", b.toString))
  // burst admission control (source doc at EvtStreamMicroBatch): a
  // producer burst drains over bounded micro-batches instead of one
  // unbounded batch — also what makes a mid-burst kill leave a
  // deterministic uncommitted tail for the WAL restart specs
  maxLinesPerBatch.foreach(m => reader.option("maxLinesPerBatch", m.toString))
  private val lines: DataFrame = reader.load()

  /** Above this registry size the per-batch plan would unroll too many
    * predicate branches; switch to the broadcast-join + runtime-eval
    * path.
    */
  private val CompiledSubsLimit = 64

  /** One connection shard per delivery partition; bounded so tiny
    * registries don't schedule empty tasks. At cluster scale this is
    * the number of executor-side shard servers the shuffle routes to.
    */
  private val MaxDeliveryShards = 32

  /** Bus id under which this server's socket registry is reachable
    * from delivery tasks (see [[DeliveryBus]]).
    */
  private val busId = java.util.UUID.randomUUID().toString
  DeliveryBus.register(busId, (lid, bytes) => sse.writeTo(lid, bytes))

  /** Deliver one micro-batch. Small registries compile into the plan
    * (codegen'd predicates, the reference's compile-at-subscribe —
    * evtstrd/http_server.py:150); large ones broadcast-join the
    * subscription snapshot with runtime residual evaluation.
    *
    * Delivery is PARTITION-WISE, never a whole-batch collect: rendered
    * (listenerId, chunk) rows shuffle by listener id — each listener's
    * rows land in exactly one shard — sort within the shard by the
    * batch-order `_seq` tag (per-connection wire order survives the
    * shuffle), and each task hands its shard to the JVM-local socket
    * sink via [[DeliveryBus]]. O(events × matched-subscriptions) bytes
    * flow shard-parallel instead of funnelling through one node.
    */
  private def deliverBatch(batch: DataFrame, batchId: Long): Unit = {
    val listeners = sse.allListeners
    if (listeners.isEmpty) return
    // batch order as a sortable tag: the evtstream source assigns each
    // line its GLOBAL offset (`_offset`), so sorting by it restores
    // source arrival order per listener even when a micro-batch spans
    // several input partitions. The fallback for offset-less batches,
    // monotonically_increasing_id = (partition << 33 | row-in-
    // partition), is arrival order only for single-partition sources —
    // cross-partition it interleaves in partition-id order.
    val tagged =
      if (batch.columns.contains("_offset"))
        batch.withColumn("_seq", col("_offset"))
      else batch.withColumn("_seq", monotonically_increasing_id())
    val delivered =
      if (listeners.size <= CompiledSubsLimit)
        // the documented pipeline IS the serving plan — reusing it
        // keeps the live server and the oracle-checked projection
        // from drifting apart
        EventStreamPipeline
          .deliveries(
            tagged,
            listeners.map(l =>
              Fanout.Subscription(l.id, l.subsystem, l.rawFilters)))
          .select(col("sub_id"), col("chunk"), col("_seq"))
      else {
        val subsDf = batch.sparkSession
          .createDataFrame(listeners.map(l => (l.id, l.subsystem, l.rawFilters)))
          .toDF("sub_id", "subsystem", "filters")
        Fanout.dynamic(tagged, subsDf, col("subsystem"), col("data"))
          .select(
            col("sub_id"),
            graft.functions.Sse
              .chunk(graft.functions.Sse
                .frame(col("event"), col("data"), col("id")))
              .as("chunk"),
            col("_seq"))
      }
    val shards = math.min(listeners.size, MaxDeliveryShards)
    val localBusId = busId // capture only the id, not `this`
    delivered
      .repartition(shards, col("sub_id"))
      .sortWithinPartitions(col("sub_id"), col("_seq"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val sink = DeliveryBus.sink(localBusId)
          rows.foreach { r =>
            sink(r.getLong(0), r.getString(1).getBytes(StandardCharsets.UTF_8))
          }
        }
      }
  }

  val query: StreamingQuery = {
    val w = EventStreamPipeline
      .parseLines(lines)
      .writeStream
      .outputMode("append")
      .foreachBatch(deliverBatch _)
    checkpointLocation.foreach(w.option("checkpointLocation", _))
    w.start()
  }

  def processAllAvailable(): Unit = query.processAllAvailable()

  def close(): Unit = {
    try query.stop()
    catch { case _: Exception => () }
    DeliveryBus.unregister(busId)
    sse.close()
  }
}
