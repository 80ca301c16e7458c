package graft.streaming

import graft.TestSpark
import graft.streaming.ConnectionTimers.{ConnEvent, ControlFrame}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful timer semantics (ping every 20s, auth-expiry logout,
  * disconnect => terminal chunk) driven through a real streaming query
  * across multiple micro-batches, so state persistence between batches
  * is exercised.
  */
class ConnectionTimersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T0 = 1700000000000000L // epoch micros
  private def us(sec: Long): Long = T0 + sec * 1000000L

  private def run(batches: Seq[Seq[ConnEvent]]): Seq[ControlFrame] = {
    import spark.implicits._
    val mem = MemoryStream[ConnEvent](spark)
    val q = ConnectionTimers.process(mem.toDS())
      .writeStream.format("memory")
      .queryName("timers_out")
      .outputMode("append")
      .start()
    try {
      for (b <- batches) { mem.addData(b); q.processAllAvailable() }
      spark.table("timers_out").as[ControlFrame]
        .collect().toSeq.sortBy(f => (f.tsUs, f.connId))
    } finally q.stop()
  }

  test("ping after interval, not before; state survives batches") {
    val frames = run(Seq(
      Seq(
        ConnEvent(1L, "connect", us(0), -1L),
        ConnEvent(1L, "tick", us(10), -1L)), // < 20s: no ping
      Seq(
        ConnEvent(1L, "tick", us(25), -1L), // >= 20s: ping
        ConnEvent(1L, "tick", us(30), -1L)), // 5s after ping: nothing
      Seq(ConnEvent(1L, "tick", us(50), -1L)) // 25s after last ping
    ))
    assert(frames.map(_.frame) ==
      Seq(ConnectionTimers.PingFrame, ConnectionTimers.PingFrame))
    assert(frames.map(_.tsUs) == Seq(us(25), us(50)))
  }

  test("auth expiry emits logout then terminal chunk and clears state") {
    val frames = run(Seq(
      Seq(
        ConnEvent(2L, "connect", us(0), us(60)),
        ConnEvent(2L, "tick", us(30), -1L)), // ping at 30
      Seq(
        ConnEvent(2L, "tick", us(65), -1L), // past expiry: logout
        ConnEvent(2L, "tick", us(70), -1L)) // dead: ignored
    ))
    assert(frames.map(_.frame) == Seq(
      ConnectionTimers.PingFrame,
      ConnectionTimers.LogoutFrame,
      "0\r\n\r\n"))
    assert(frames.last.terminal)
  }

  test("disconnect emits terminal chunk; concurrent connections independent") {
    val frames = run(Seq(
      Seq(
        ConnEvent(3L, "connect", us(0), -1L),
        ConnEvent(4L, "connect", us(0), -1L),
        ConnEvent(3L, "disconnect", us(5), -1L),
        ConnEvent(4L, "tick", us(25), -1L))
    ))
    assert(frames.map(f => (f.connId, f.frame)) == Seq(
      (3L, "0\r\n\r\n"),
      (4L, ConnectionTimers.PingFrame)))
  }

  test("same-microsecond disconnect-then-reconnect keeps the new session") {
    // without the seq tie-break these replay as connect-then-
    // disconnect (kind order), killing the NEW session's state
    val frames = run(Seq(
      Seq(ConnEvent(5L, "connect", us(0), -1L)),
      Seq(
        ConnEvent(5L, "disconnect", us(10), -1L, seq = 1L),
        ConnEvent(5L, "connect", us(10), -1L, seq = 2L)),
      Seq(ConnEvent(5L, "tick", us(35), -1L))
    ))
    // exactly one terminal chunk (the old session), then the NEW
    // session is alive and gets its ping at t=35 (25s after connect)
    assert(frames.map(f => (f.connId, f.frame, f.terminal)) == Seq(
      (5L, "0\r\n\r\n", true),
      (5L, ConnectionTimers.PingFrame, false)))
  }
}
