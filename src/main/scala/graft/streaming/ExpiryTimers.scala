package graft.streaming

import graft.functions.Sse
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Auth-expiry logout via `transformWithState` *event-time timers* —
  * the closest Spark analog of the reference's absolute-time
  * `sleep_until` logout (evtstrd/listener.py:80-84, util.py:24-33):
  * at connect, a timer is registered at the auth-provided expiry
  * timestamp; when the watermark passes it, the logout event and
  * terminal chunk are emitted and state dropped. Disconnect cancels
  * the timer. Requires the RocksDB state store provider (set in the
  * spec / production session conf).
  *
  * Complements [[ConnectionTimers]] (tick-driven
  * flatMapGroupsWithState, covering ping cadence deterministically).
  */
object ExpiryTimers {

  /** kind: connect | disconnect; expireAtMs < 0 => no expiry.
    * `seq` is a producer-side monotonic sequence number that breaks
    * same-millisecond ties in TRUE arrival order — inferring order
    * from kind (connect-first) replays a same-ms disconnect-then-
    * reconnect as connect-then-disconnect, deleting the new session's
    * timer and emitting a spurious terminal chunk.
    */
  final case class ConnEvt(
      connId: Long,
      kind: String,
      ts: java.sql.Timestamp,
      expireAtMs: Long,
      seq: Long = 0L)

  final case class ExpiryFrame(connId: Long, frame: String, terminal: Boolean)

  class ExpiryProcessor
      extends StatefulProcessor[Long, ConnEvt, ExpiryFrame] {
    @transient private var expireAt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      expireAt = getHandle.getValueState[Long](
        "expireAt", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[ConnEvt],
        timerValues: TimerValues): Iterator[ExpiryFrame] = {
      val out = Seq.newBuilder[ExpiryFrame]
      // Event-time order within the batch: rows arrive in partition
      // order, so a connect+disconnect pair landing in one micro-batch
      // could otherwise process disconnect-first (no terminal chunk,
      // then a stale timer). Same-ms ties break by the producer's
      // monotonic sequence number — true arrival order, covering both
      // connect-then-disconnect AND disconnect-then-reconnect. The
      // kind rank stays as the FINAL tie-break so a producer that
      // leaves seq at its default 0 keeps the old connect-first
      // guarantee instead of arbitrary partition order.
      val ordered = rows.toSeq.sortBy(e =>
        (e.ts.getTime, e.seq, if (e.kind == "connect") 0 else 1))
      ordered.foreach { e =>
        e.kind match {
          case "connect" =>
            // a re-connect replaces any previously registered timer —
            // leaving it live would fire a premature logout
            if (expireAt.exists() && expireAt.get() >= 0)
              getHandle.deleteTimer(expireAt.get())
            expireAt.update(e.expireAtMs)
            if (e.expireAtMs >= 0) getHandle.registerTimer(e.expireAtMs)
          case "disconnect" =>
            if (expireAt.exists()) {
              out += ExpiryFrame(key, Sse.lastChunk, terminal = true)
              if (expireAt.get() >= 0) getHandle.deleteTimer(expireAt.get())
              expireAt.clear()
            }
          case _ => ()
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ExpiryFrame] =
      if (expireAt.exists()) {
        expireAt.clear()
        Iterator(
          ExpiryFrame(key, ConnectionTimers.LogoutFrame, terminal = false),
          ExpiryFrame(key, Sse.lastChunk, terminal = true))
      } else Iterator.empty
  }

  def process(events: Dataset[ConnEvt]): Dataset[ExpiryFrame] = {
    implicit val outEnc: Encoder[ExpiryFrame] = Encoders.product[ExpiryFrame]
    events
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.connId)(Encoders.scalaLong)
      .transformWithState(
        new ExpiryProcessor,
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
