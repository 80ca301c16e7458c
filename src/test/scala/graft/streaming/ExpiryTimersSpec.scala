package graft.streaming

import graft.TestSpark
import graft.streaming.ExpiryTimers.{ConnEvt, ExpiryFrame}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Event-time timer semantics through transformWithState: a logout
  * fires exactly when the watermark passes the registered expiry,
  * disconnect cancels the timer. RocksDB state store (required by
  * transformWithState).
  */
class ExpiryTimersSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private val T0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
  private def ts(sec: Long) =
    java.sql.Timestamp.from(T0.plusSeconds(sec))
  private def ms(sec: Long) = T0.plusSeconds(sec).toEpochMilli

  test("watermark passing the expiry fires logout + terminal chunk") {
    import spark.implicits._
    val mem = MemoryStream[ConnEvt](spark)
    val q = ExpiryTimers.process(mem.toDS())
      .writeStream.format("memory").queryName("expiry_out")
      .outputMode("append").start()
    try {
      // conn 1 expires at t+60; conn 2 never expires
      mem.addData(Seq(
        ConnEvt(1L, "connect", ts(0), ms(60)),
        ConnEvt(2L, "connect", ts(0), -1L)))
      q.processAllAvailable()
      // advance watermark past the expiry, then one more batch so the
      // new watermark takes effect and fires the timer
      mem.addData(Seq(ConnEvt(99L, "connect", ts(120), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(98L, "connect", ts(121), -1L)))
      q.processAllAvailable()

      val frames = spark.table("expiry_out").as[ExpiryFrame]
        .collect().toSeq.sortBy(f => (f.connId, f.terminal))
      assert(frames.map(f => (f.connId, f.frame, f.terminal)) == Seq(
        (1L, ConnectionTimers.LogoutFrame, false),
        (1L, "0\r\n\r\n", true)))
    } finally q.stop()
  }

  test("disconnect cancels the expiry timer") {
    import spark.implicits._
    val mem = MemoryStream[ConnEvt](spark)
    val q = ExpiryTimers.process(mem.toDS())
      .writeStream.format("memory").queryName("expiry_out2")
      .outputMode("append").start()
    try {
      mem.addData(Seq(ConnEvt(5L, "connect", ts(0), ms(60))))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(5L, "disconnect", ts(10), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(97L, "connect", ts(120), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(96L, "connect", ts(121), -1L)))
      q.processAllAvailable()
      val frames = spark.table("expiry_out2").as[ExpiryFrame]
        .collect().toSeq
      // only the disconnect's terminal chunk; no logout ever fires
      assert(frames.map(f => (f.connId, f.frame, f.terminal)) == Seq(
        (5L, "0\r\n\r\n", true)))
    } finally q.stop()
  }

  test("connect+disconnect in one batch process in event-time order") {
    import spark.implicits._
    val mem = MemoryStream[ConnEvt](spark)
    val q = ExpiryTimers.process(mem.toDS())
      .writeStream.format("memory").queryName("expiry_out3")
      .outputMode("append").start()
    try {
      // same micro-batch, disconnect listed FIRST: the processor must
      // order by event time, emit the terminal chunk, and cancel the
      // timer — no logout later
      mem.addData(Seq(
        ConnEvt(7L, "disconnect", ts(10), -1L),
        ConnEvt(7L, "connect", ts(0), ms(60))))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(95L, "connect", ts(120), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(94L, "connect", ts(121), -1L)))
      q.processAllAvailable()
      val frames = spark.table("expiry_out3").as[ExpiryFrame].collect().toSeq
      assert(frames.map(f => (f.connId, f.frame, f.terminal)) == Seq(
        (7L, "0\r\n\r\n", true)))
    } finally q.stop()
  }

  test("same-millisecond disconnect then reconnect keeps the new session live") {
    import spark.implicits._
    val mem = MemoryStream[ConnEvt](spark)
    val q = ExpiryTimers.process(mem.toDS())
      .writeStream.format("memory").queryName("expiry_out5")
      .outputMode("append").start()
    try {
      mem.addData(Seq(ConnEvt(9L, "connect", ts(0), ms(60), seq = 0L)))
      q.processAllAvailable()
      // SAME millisecond: disconnect (seq 1) then re-connect (seq 2).
      // A kind-based tie-break replays this as connect-then-disconnect,
      // deleting the NEW session's timer and leaving the live
      // connection with no expiry.
      mem.addData(Seq(
        ConnEvt(9L, "disconnect", ts(10), -1L, seq = 1L),
        ConnEvt(9L, "connect", ts(10), ms(300), seq = 2L)))
      q.processAllAvailable()
      // past the OLD expiry: only the disconnect's terminal chunk so far
      mem.addData(Seq(ConnEvt(89L, "connect", ts(120), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(88L, "connect", ts(121), -1L)))
      q.processAllAvailable()
      assert(
        spark.table("expiry_out5").as[ExpiryFrame].collect().toSeq
          .map(f => (f.connId, f.terminal)) == Seq((9L, true)))
      // past the NEW session's expiry: its logout must still fire
      mem.addData(Seq(ConnEvt(87L, "connect", ts(400), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(86L, "connect", ts(401), -1L)))
      q.processAllAvailable()
      val frames = spark.table("expiry_out5").as[ExpiryFrame]
        .collect().toSeq.map(f => (f.connId, f.frame, f.terminal)).sorted
      assert(frames == Seq(
        (9L, "0\r\n\r\n", true),
        (9L, "0\r\n\r\n", true),
        (9L, ConnectionTimers.LogoutFrame, false)).sorted)
    } finally q.stop()
  }

  test("re-connect replaces the previous expiry timer") {
    import spark.implicits._
    val mem = MemoryStream[ConnEvt](spark)
    val q = ExpiryTimers.process(mem.toDS())
      .writeStream.format("memory").queryName("expiry_out4")
      .outputMode("append").start()
    try {
      mem.addData(Seq(ConnEvt(8L, "connect", ts(0), ms(60))))
      q.processAllAvailable()
      // re-auth with a LATER expiry before the first fires
      mem.addData(Seq(ConnEvt(8L, "connect", ts(10), ms(300))))
      q.processAllAvailable()
      // pass the OLD expiry: nothing may fire (old timer replaced)
      mem.addData(Seq(ConnEvt(93L, "connect", ts(90), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(92L, "connect", ts(91), -1L)))
      q.processAllAvailable()
      assert(spark.table("expiry_out4").isEmpty)
      // pass the NEW expiry: exactly one logout + terminal
      mem.addData(Seq(ConnEvt(91L, "connect", ts(400), -1L)))
      q.processAllAvailable()
      mem.addData(Seq(ConnEvt(90L, "connect", ts(401), -1L)))
      q.processAllAvailable()
      val frames = spark.table("expiry_out4").as[ExpiryFrame]
        .collect().toSeq.sortBy(_.terminal)
      assert(frames.map(f => (f.connId, f.frame, f.terminal)) == Seq(
        (8L, ConnectionTimers.LogoutFrame, false),
        (8L, "0\r\n\r\n", true)))
    } finally q.stop()
  }
}
