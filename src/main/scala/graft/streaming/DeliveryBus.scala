package graft.streaming

import java.util.concurrent.ConcurrentHashMap

/** Process-local hand-off from Spark delivery tasks to the socket
  * layer. The fan-out plan's final stage is `foreachPartition` over
  * (listener-shard) partitions; each task looks up the sink that owns
  * its connections IN ITS OWN JVM and writes directly — the batch
  * never funnels through a whole-batch `collect()` on one node
  * (events × matched-subscriptions rows through the driver was the
  * one scale cliff in the delivery path).
  *
  * Deployment model: whichever process owns the sockets registers the
  * sink under the server's bus id. In local mode that is the driver
  * JVM and every partition task resolves it directly. On a
  * multi-executor cluster the same contract holds per executor: each
  * executor hosts a connection-shard server registered under the same
  * bus id, and the `repartition(sub_id)` shuffle routes every
  * listener's rows to the executor whose shard owns that connection.
  * A task landing in a JVM with no registered sink is a deployment
  * error and fails loudly (silently dropping deliveries would look
  * like subscriber loss).
  */
object DeliveryBus {
  private val sinks =
    new ConcurrentHashMap[String, (Long, Array[Byte]) => Unit]()

  def register(busId: String, sink: (Long, Array[Byte]) => Unit): Unit =
    sinks.put(busId, sink)

  def unregister(busId: String): Unit =
    sinks.remove(busId)

  /** Resolve the JVM-local sink for `busId`; called from partition
    * tasks. Throws when this JVM hosts no connection shard for the
    * server — see the deployment note above.
    */
  def sink(busId: String): (Long, Array[Byte]) => Unit = {
    val s = sinks.get(busId)
    if (s == null)
      throw new IllegalStateException(
        s"no DeliveryBus sink registered for '$busId' in this JVM: " +
          "delivery tasks must run where a connection shard is " +
          "registered (driver in local mode; per-executor shard " +
          "servers on a cluster)")
    s
  }
}
