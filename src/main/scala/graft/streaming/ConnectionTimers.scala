package graft.streaming

import graft.functions.Sse
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-connection stateful timers (SURVEY §2.4 rows 18-21): keepalive
  * pings every `pingIntervalSec` (reference default 20s,
  * evtstrd/config.py:11 / listener.py:72-78), auth-expiry logout
  * (listener.py:80-84), disconnect => terminal chunk
  * (listener.py:93-95). Implemented as `flatMapGroupsWithState` keyed
  * by connection id; time advances via explicit tick events, so the
  * operator is deterministic and replayable (the serving layer feeds
  * wall-clock ticks; tests feed synthetic ones).
  */
object ConnectionTimers {

  /** Connection lifecycle event. kind: connect | tick | disconnect.
    * Times are epoch micros; expireAtUs < 0 means "no expiry".
    * `seq` is a producer-side monotonic sequence for same-microsecond
    * ordering — without it a disconnect-then-reconnect at the same
    * timestamp replays as connect-then-disconnect (kind sorts
    * lexicographically), deleting the new session's state and
    * emitting a spurious terminal chunk (the ExpiryTimers tie-break
    * bug, ported here).
    */
  final case class ConnEvent(
      connId: Long,
      kind: String,
      tsUs: Long,
      expireAtUs: Long,
      seq: Long = 0L)

  final case class ConnState(
      connectedAtUs: Long,
      lastPingUs: Long,
      expireAtUs: Long)

  /** One control frame to write to a connection. `terminal` marks the
    * connection closed after this write.
    */
  final case class ControlFrame(
      connId: Long,
      tsUs: Long,
      frame: String,
      terminal: Boolean)

  val PingFrame: String = "event: ping\r\ndata: \r\n\r\n"
  val LogoutFrame: String = "event: logout\r\ndata: {\"reason\": \"expire\"}\r\n\r\n"

  def process(
      events: Dataset[ConnEvent],
      pingIntervalSec: Long = 20L): Dataset[ControlFrame] = {
    implicit val stateEnc: Encoder[ConnState] = Encoders.product[ConnState]
    implicit val outEnc: Encoder[ControlFrame] = Encoders.product[ControlFrame]
    val pingUs = pingIntervalSec * 1000000L

    def handle(
        connId: Long,
        evs: Iterator[ConnEvent],
        state: GroupState[ConnState]): Iterator[ControlFrame] = {
      val out = Seq.newBuilder[ControlFrame]
      // Deterministic order within the micro-batch regardless of
      // upstream partitioning. Kind rank stays as the FINAL tie-break
      // so producers leaving seq at its default 0 keep the old
      // connect-first guarantee instead of arbitrary partition order.
      for (e <- evs.toSeq.sortBy(ev =>
        (ev.tsUs, ev.seq, if (ev.kind == "connect") 0 else 1))) {
        (e.kind, state.getOption) match {
          case ("connect", None) =>
            state.update(ConnState(e.tsUs, e.tsUs, e.expireAtUs))
          case ("tick", Some(s)) =>
            if (s.expireAtUs >= 0 && e.tsUs >= s.expireAtUs) {
              // auth expiry wins: logout event then terminal chunk
              // (reference races timers, first completion disconnects:
              // dispatcher.py:76-86)
              out += ControlFrame(connId, e.tsUs, LogoutFrame, terminal = false)
              out += ControlFrame(connId, e.tsUs, Sse.lastChunk, terminal = true)
              state.remove()
            } else if (e.tsUs - s.lastPingUs >= pingUs) {
              out += ControlFrame(connId, e.tsUs, PingFrame, terminal = false)
              state.update(s.copy(lastPingUs = e.tsUs))
            }
          case ("disconnect", Some(_)) =>
            out += ControlFrame(connId, e.tsUs, Sse.lastChunk, terminal = true)
            state.remove()
          case _ => () // connect on live state / tick on dead: ignore
        }
      }
      out.result().iterator
    }

    events
      .groupByKey(_.connId)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(handle)
  }
}
