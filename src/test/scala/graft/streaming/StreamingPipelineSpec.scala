package graft.streaming

import graft.TestSpark
import graft.operators.Fanout.Subscription
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runs the EP1 pipeline as an actual Structured Streaming query over
  * a MemoryStream and asserts exact parity with the identical plan
  * executed in batch mode — the stream/batch unification the engine is
  * built on.
  */
class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val subs = Seq(
    Subscription(1L, "jobs", Seq("k<=50")),
    Subscription(2L, "jobs", Seq("k>10", "k<90")),
    Subscription(3L, "alerts", Nil),
    Subscription(4L, "jobs", Seq("k<='50'")))

  private val lines: Seq[String] =
    (0 until 200).map { i =>
      val sub = if (i % 3 == 0) "jobs" else "alerts"
      s"""{"action": "notify", "subsystem": "$sub", "event": "add", "data": {"k": ${i % 100}}, "id": "evt-$i"}"""
    } ++ Seq(
      "not json at all",
      """{"action": "ping", "subsystem": "jobs", "event": "x", "data": {}, "id": "i"}""",
      """{"action": "notify", "subsystem": "jobs", "event": "x", "id": "missing-data"}""",
      // data must be a JSON object (socket_server.py:107) — scalar,
      // string and array payloads are all rejected
      """{"action": "notify", "subsystem": "jobs", "event": "x", "data": 5, "id": "num-data"}""",
      """{"action": "notify", "subsystem": "jobs", "event": "x", "data": "x", "id": "str-data"}""",
      """{"action": "notify", "subsystem": "jobs", "event": "x", "data": [1], "id": "arr-data"}""",
      // a STRING whose content looks like an object is still a string
      // (isinstance-dict check, socket_server.py:107) — the variant
      // type tag, not the text shape, decides
      """{"action": "notify", "subsystem": "jobs", "event": "x", "data": "{\"a\": 1}", "id": "strobj-data"}""",
      """{"action": "notify", "subsystem": "jobs", "event": "x", "data": null, "id": "null-data"}""")

  test("streaming pipeline output equals batch pipeline output") {
    import spark.implicits._
    val batchOut = EventStreamPipeline
      .full(lines.toDF("value"), subs)
      .select("sub_id", "id", "chunk")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sorted

    val mem = MemoryStream[String](spark)
    val q = EventStreamPipeline
      .full(mem.toDF(), subs)
      .writeStream
      .format("memory")
      .queryName("pipe_out")
      .outputMode("append")
      .start()
    try {
      mem.addData(lines.take(100))
      q.processAllAvailable()
      mem.addData(lines.drop(100))
      q.processAllAvailable()
      val streamOut = spark.table("pipe_out")
        .select("sub_id", "id", "chunk")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted
      assert(streamOut.nonEmpty)
      assert(streamOut.toSeq == batchOut.toSeq)
    } finally q.stop()
  }

  test("invalid lines are dropped, not failed") {
    import spark.implicits._
    val out = EventStreamPipeline.parseLines(lines.toDF("value"))
    assert(out.count() == 200) // the 8 bad/ignored lines dropped
  }

  test("dropDuplicatesWithinWatermark dedups replayed event ids") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 50).map(i =>
      (java.sql.Timestamp.from(base.plusSeconds(i)), s"id-${i % 25}"))
    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    val q = mem.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .start()
    try {
      mem.addData(rows.take(30))
      q.processAllAvailable()
      mem.addData(rows.drop(30)) // replays of the same 25 ids
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("event_id").as[String].collect()
      assert(ids.length == 25)
      assert(ids.toSet.size == 25)
    } finally q.stop()
  }

  test("late rows behind the watermark are dropped AND accounted") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def t(s: Long) = java.sql.Timestamp.from(base.plusSeconds(s))
    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    val q = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("late_out")
      .outputMode("update")
      .start()
    try {
      // batch 1 reaches t=360s → watermark after the batch = 350s;
      // every window ending at or before 350 is then final
      mem.addData((0 until 37).map(i => (t(i * 10L), s"u$i")))
      q.processAllAvailable()
      val before = spark.table("late_out")
        .where(col("window.start") === t(0)).agg(max("n"))
        .collect()(0).getLong(0)
      // batch 2: two rows into the SAME final window [0,60) and one
      // row each into two other final windows. The accounting metric
      // counts rows dropped AT THE STATE OPERATOR — after the
      // map-side partial aggregate — so the two same-window rows
      // collapse to ONE dropped state row: 3 windows → 3, not 4.
      // Pinning that is the point: a monitor reading this metric
      // sees late WINDOWS-worth of state rows, not late input rows.
      mem.addData(Seq(
        (t(0), "late0"), (t(1), "late1"),
        (t(61), "late2"), (t(121), "late3")))
      q.processAllAvailable()
      val after = spark.table("late_out")
        .where(col("window.start") === t(0)).agg(max("n"))
        .collect()(0).getLong(0)
      assert(after == before, "late rows must not mutate a final window")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped == 3L, s"expected 3 accounted drops, got $dropped")
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks matches batch") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def t(s: Long) = java.sql.Timestamp.from(base.plusSeconds(s))
    // impressions every 10s per user; clicks follow some impressions
    val imps = (0 until 60).map(i => (t(i * 10L), s"u${i % 4}", s"imp-$i"))
    val clicks = (0 until 60).filter(_ % 3 == 0)
      .map(i => (t(i * 10L + 25), s"u${i % 4}", s"clk-$i"))

    def joinPlan(
        l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) = {
      val i = l.toDF("its", "user", "imp_id")
        .withWatermark("its", "1 minute")
      val c = r.toDF("cts", "cuser", "clk_id")
        .withWatermark("cts", "1 minute")
      // click attributed to an impression of the same user within 30s
      i.join(
        c,
        col("user") === col("cuser") &&
          col("cts") >= col("its") && col("cts") <= col("its") + expr("interval 30 seconds"))
        .select(col("imp_id"), col("clk_id"))
    }

    val batchOut = joinPlan(imps.toDF(), clicks.toDF())
      .collect().map(r => (r.getString(0), r.getString(1))).sorted

    val mi = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val mc = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val q = joinPlan(mi.toDF(), mc.toDF())
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .start()
    try {
      mi.addData(imps.take(30)); mc.addData(clicks.take(10))
      q.processAllAvailable()
      mi.addData(imps.drop(30)); mc.addData(clicks.drop(10))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      assert(got.nonEmpty)
      assert(got.toSeq == batchOut.toSeq)
    } finally q.stop()
  }

  test("left-outer interval join null-extends ONLY after watermark passes") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def t(s: Long) = java.sql.Timestamp.from(base.plusSeconds(s))
    // clicks every 10s; a purchase follows every third click within 20s
    val clicks = (0 until 30).map(i => (t(i * 10L), s"u${i % 4}", s"clk-$i"))
    val purch = (0 until 30).filter(_ % 3 == 0)
      .map(i => (t(i * 10L + 20), s"u${i % 4}", s"pur-$i"))
    // far-future pair: advances the watermark past every real click's
    // match window AND (matching each other) proves matches still
    // emit immediately at the frontier
    val sentinelL = Seq((t(7200), "zz", "clk-zz"))
    val sentinelR = Seq((t(7200), "zz", "pur-zz"))

    def plan(
        l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) = {
      val c = l.toDF("cts", "cuser", "click_id")
        .withWatermark("cts", "10 minutes")
      val p = r.toDF("pts", "puser", "purchase_id")
        .withWatermark("pts", "10 minutes")
      // interval condition INSIDE the join: on an outer join a
      // post-filter would drop the null-extended rows
      c.join(
        p,
        col("cuser") === col("puser") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("interval 30 seconds"),
        "left_outer")
        .select(col("click_id"), col("purchase_id"))
    }

    val batchOut = plan(
      (clicks ++ sentinelL).toDF(), (purch ++ sentinelR).toDF())
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).sorted

    val mc = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val mp = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val q = plan(mc.toDF(), mp.toDF())
      .writeStream.format("memory").queryName("ssoj_out")
      .outputMode("append")
      .start()
    try {
      // phase 1+2: all real rows; watermark (10 min behind a 5-min
      // tail) has passed NO click's match window yet
      mc.addData(clicks.take(15)); mp.addData(purch.take(5))
      q.processAllAvailable()
      mc.addData(clicks.drop(15)); mp.addData(purch.drop(5))
      q.processAllAvailable()
      val mid = spark.table("ssoj_out").collect()
        .map(r => (r.getString(0), Option(r.getString(1))))
      assert(mid.nonEmpty, "matched pairs must emit before any watermark")
      assert(mid.forall(_._2.isDefined),
        s"null-extension before watermark passed: ${mid.filter(_._2.isEmpty)}")
      // phase 3: sentinel advances the watermark -> every unmatched
      // click's state expires and emits its single null row
      mc.addData(sentinelL); mp.addData(sentinelR)
      q.processAllAvailable()
      val fin = spark.table("ssoj_out").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).sorted
      assert(fin.exists(_._2.isEmpty), "expired clicks never null-extended")
      assert(fin.toSeq == batchOut.toSeq)
    } finally q.stop()
  }

  test("full-outer interval join null-extends BOTH sides after watermark") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def t(s: Long) = java.sql.Timestamp.from(base.plusSeconds(s))
    // clicks every 10s; every third click gets a purchase within 20s;
    // plus ORPHAN purchases (user u9 never clicks) that only a
    // full-outer join surfaces
    val clicks = (0 until 30).map(i => (t(i * 10L), s"u${i % 4}", s"clk-$i"))
    val purch = (0 until 30).filter(_ % 3 == 0)
      .map(i => (t(i * 10L + 20), s"u${i % 4}", s"pur-$i")) ++
      (0 until 3).map(i => (t(50L + i * 60), "u9", s"orphan-$i"))
    val sentinelL = Seq((t(7200), "zz", "clk-zz"))
    val sentinelR = Seq((t(7200), "zz", "pur-zz"))

    def plan(
        l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame) = {
      val c = l.toDF("cts", "cuser", "click_id")
        .withWatermark("cts", "10 minutes")
      val p = r.toDF("pts", "puser", "purchase_id")
        .withWatermark("pts", "10 minutes")
      c.join(
        p,
        col("cuser") === col("puser") &&
          col("pts") >= col("cts") &&
          col("pts") <= col("cts") + expr("interval 30 seconds"),
        "full_outer")
        .select(col("click_id"), col("purchase_id"))
    }

    val batchOut = plan(
      (clicks ++ sentinelL).toDF(), (purch ++ sentinelR).toDF())
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).sorted

    val mc = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val mp = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val q = plan(mc.toDF(), mp.toDF())
      .writeStream.format("memory").queryName("ssfo_out")
      .outputMode("append")
      .start()
    try {
      mc.addData(clicks.take(15)); mp.addData(purch.take(5))
      q.processAllAvailable()
      mc.addData(clicks.drop(15)); mp.addData(purch.drop(5))
      q.processAllAvailable()
      val mid = spark.table("ssfo_out").collect()
        .map(r => (Option(r.getString(0)), Option(r.getString(1))))
      assert(mid.nonEmpty, "matched pairs must emit before any watermark")
      assert(mid.forall(p => p._1.isDefined && p._2.isDefined),
        "null-extension on either side before the watermark passed")
      // the sentinel advances the watermark: unmatched CLICK state
      // expires (null right) AND orphan PURCHASE state expires
      // (null left) — full outer means both directions emit
      mc.addData(sentinelL); mp.addData(sentinelR)
      q.processAllAvailable()
      val fin = spark.table("ssfo_out").collect()
        .map(r => (Option(r.getString(0)), Option(r.getString(1)))).sorted
      assert(fin.exists(p => p._1.isDefined && p._2.isEmpty),
        "expired clicks never null-extended")
      assert(fin.exists(p => p._1.isEmpty && p._2.isDefined),
        "orphan purchases never null-extended")
      assert(fin.toSeq == batchOut.toSeq)
    } finally q.stop()
  }

  test("chained stateful operators: dedup-within-watermark feeds windowed agg") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def t(s: Long) = java.sql.Timestamp.from(base.plusSeconds(s))
    // 3 users x 2 types over 10 minutes, every event sent TWICE a few
    // seconds apart (the at-least-once delivery the debounce absorbs)
    val raw = for {
      i <- 0 until 40
      d <- Seq(0, 3)
    } yield (t(i * 15L + d), s"u${i % 3}", if (i % 2 == 0) "click" else "view")
    val sentinel = Seq((t(7200), "zz", "click"))

    def plan(df: org.apache.spark.sql.DataFrame, streaming: Boolean) = {
      val slotted = df.toDF("ts", "user", "etype")
        .withWatermark("ts", "10 minutes")
        .withColumn("slot", expr("unix_micros(ts) div 60000000"))
      // batch has no dropDuplicatesWithinWatermark; plain
      // dropDuplicates is its batch-mode statement (the aggregate
      // depends only on which (user,type,slot) groups survive)
      val dedup =
        if (streaming) slotted.dropDuplicatesWithinWatermark("user", "etype", "slot")
        else slotted.dropDuplicates("user", "etype", "slot")
      dedup
        .groupBy(window(col("ts"), "5 minutes"), col("etype"))
        .agg(count(lit(1)).as("n"))
        .select(
          unix_timestamp(col("window.start")).as("ws"), col("etype"),
          col("n"))
    }

    val batchOut = plan((raw ++ sentinel).toDF(), streaming = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted

    val mem = MemoryStream[(java.sql.Timestamp, String, String)](spark)
    val q = plan(mem.toDF(), streaming = true)
      .writeStream.format("memory").queryName("dedup_agg_out")
      .outputMode("append")
      .start()
    try {
      // duplicates of an event may straddle the batch boundary: the
      // within-watermark dedup state absorbs them anyway
      mem.addData(raw.take(45))
      q.processAllAvailable()
      mem.addData(raw.drop(45))
      q.processAllAvailable()
      mem.addData(sentinel) // flush: watermark passes every real window
      q.processAllAvailable()
      // in a chained-stateful pipeline each stateful operator applies
      // the watermark one batch late — the aggregate needs TWO more
      // batches after the advance before it can close windows
      mem.addData(Seq((t(7300), "zz", "view")))
      q.processAllAvailable()
      mem.addData(Seq((t(7400), "zz", "view")))
      q.processAllAvailable()
      val got = spark.table("dedup_agg_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(got.nonEmpty)
      // the sentinel's own window can't close (watermark sits at its
      // heel) — compare the closed set
      val want = batchOut.filter(_._1 < base.getEpochSecond + 7200)
      assert(got.toSeq == want.toSeq)
    } finally q.stop()
  }

  test("mapGroupsWithState latest-state: 3-batch stream equals batch fold") {
    import spark.implicits._
    import graft.queries.StreamingWindows.{UserEvent, UserLatest}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    // 60 events over 5 users, VALUES chosen so latest != largest
    val events = (0 until 60).map { i =>
      UserEvent(
        user_id = i % 5, us = ((i * 37) % 60) * 1000000L + i,
        event_id = 1000L + i, vc = (i * 13) % 200 - 50)
    }
    def fold(
        key: Long, rows: Iterator[UserEvent],
        state: GroupState[UserLatest]): UserLatest = {
      // the SAME transition the stream_latest_state query uses,
      // restated via its public contract: max-by-(us,event_id) +
      // running sums, merged with prior state
      val init = state.getOption.getOrElse(
        UserLatest(key, 0L, 0L, Long.MinValue, Long.MinValue, 0L))
      val out = rows.foldLeft(init) { (s, e) =>
        val later = e.us > s.last_us ||
          (e.us == s.last_us && e.event_id > s.last_event_id)
        UserLatest(
          key, s.n_events + 1, s.sum_c + e.vc,
          if (later) e.us else s.last_us,
          if (later) e.event_id else s.last_event_id,
          if (later) e.vc else s.last_value_c)
      }
      state.update(out)
      out
    }
    val batchOut = events.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
      .collect().sortBy(_.user_id)

    val mem = MemoryStream[UserEvent](spark)
    val q = mem.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
      .writeStream.format("memory").queryName("latest_state_out")
      .outputMode("update")
      .start()
    try {
      // arrival order deliberately NOT time order: shuffled thirds —
      // the commutative transition must converge to the batch answer
      val shuffled = events.sortBy(e => (e.event_id * 2654435761L) % 97)
      mem.addData(shuffled.take(20))
      q.processAllAvailable()
      mem.addData(shuffled.slice(20, 40))
      q.processAllAvailable()
      mem.addData(shuffled.drop(40))
      q.processAllAvailable()
      // update mode re-emits a key's state each batch it changes in;
      // the LAST emission per key (memory sink appends batches in
      // order, one row per changed key per batch) is the final state
      val rows = spark.table("latest_state_out").collect()
      val last = rows.zipWithIndex
        .groupBy(_._1.getLong(0))
        .map { case (_, g) => g.maxBy(_._2)._1 }
        .toSeq
        .map(r => UserLatest(
          r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .sortBy(_.user_id)
      assert(last == batchOut.toSeq)
    } finally q.stop()
  }

  test("transformWithState (Spark 4 API): RocksDB ValueState equals batch fold") {
    import spark.implicits._
    import graft.queries.StreamingWindows.{UserEvent, UserLatest}
    import org.apache.spark.sql.streaming.{
      GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode,
      TimerValues, TTLConfig}
    val events = (0 until 60).map { i =>
      UserEvent(
        user_id = i % 5, us = ((i * 41) % 60) * 1000000L + i,
        event_id = 2000L + i, vc = (i * 17) % 300 - 80)
    }
    val batchOut = events.toDS()
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[UserEvent],
         st: org.apache.spark.sql.streaming.GroupState[UserLatest]) =>
          rows.foldLeft(
            UserLatest(key, 0L, 0L, Long.MinValue, Long.MinValue, 0L))(
            TwsLatestProcessor.step)
      }
      .collect().sortBy(_.user_id)

    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[UserEvent](spark)
    val q = mem.toDS()
      .groupByKey(_.user_id)
      .transformWithState(
        new TwsLatestProcessor, TimeMode.None(), OutputMode.Update())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update")
      .start()
    try {
      val shuffled = events.sortBy(e => (e.event_id * 48271L) % 101)
      mem.addData(shuffled.take(20))
      q.processAllAvailable()
      mem.addData(shuffled.slice(20, 40))
      q.processAllAvailable()
      mem.addData(shuffled.drop(40))
      q.processAllAvailable()
      val rows = spark.table("tws_out").collect()
      val last = rows.zipWithIndex
        .groupBy(_._1.getLong(0))
        .map { case (_, g) => g.maxBy(_._2)._1 }
        .toSeq
        .map(r => UserLatest(
          r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .sortBy(_.user_id)
      assert(last == batchOut.toSeq)
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming windowed aggregation with watermark runs and matches batch") {
    import spark.implicits._
    val ts = (0 until 120).map(i =>
      (java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 97L)),
        s"u${i % 5}"))
    val batch = ts.toDF("ts", "user")
      .groupBy(window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("user"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted

    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    val q = mem.toDF().toDF("ts", "user")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("user"), col("n"))
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete")
      .start()
    try {
      mem.addData(ts)
      q.processAllAvailable()
      val got = spark.table("win_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(got.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("stream-static broadcast enrich matches batch (stream_enrich shape)") {
    import spark.implicits._
    // the static dimension: user -> region, broadcast into every batch
    val dim = (0 until 5).map(i => (s"u$i", s"region${i % 2}"))
      .toDF("user", "region")
    val ts = (0 until 90).map(i =>
      (java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 131L)),
        s"u${i % 5}"))
    def plan(df: org.apache.spark.sql.DataFrame) = df
      .join(broadcast(dim), "user")
      .groupBy(window(col("ts"), "15 minutes"), col("region"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("region"), col("n"))
    val batch = plan(ts.toDF("ts", "user"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted

    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    val q = plan(mem.toDF().toDF("ts", "user").withWatermark("ts", "5 minutes"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete")
      .start()
    try {
      mem.addData(ts)
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
      assert(got.toSeq == batch.toSeq)
      // the stream side must probe a broadcast, never shuffle into the dim
      val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      assert(exec.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        exec.toString.take(2000))
    } finally q.stop()
  }

  test("restart from checkpoint restores state: no loss, no duplicates") {
    import spark.implicits._
    // Stateful dedup across a stop/restart: run 1 commits ids 0-9 and
    // its state to the checkpoint; run 2 (same checkpoint, same
    // source) feeds overlapping ids 5-14. Exactly-once recovery means
    // run 2 must emit ONLY 10-14 — a replay of 0-9 (lost offsets) or
    // an emit of 5-9 (lost dedup state) both fail the assertion.
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ckpt").toFile.getAbsolutePath
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def rows(ids: Range) = ids.map(i =>
      (java.sql.Timestamp.from(base.plusSeconds(i * 60L)), s"id-$i"))
    val mem = MemoryStream[(java.sql.Timestamp, String)](spark)
    // The memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink shape (same as the SSE delivery path).
    def start(into: java.util.Queue[String]) = mem.toDF()
      .toDF("ts", "event_id")
      .dropDuplicates("event_id")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("event_id").collect().foreach(r => into.add(r.getString(0)))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val run1 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q1 = start(run1)
    try {
      mem.addData(rows(0 until 10))
      q1.processAllAvailable()
      assert(run1.toArray(Array.empty[String]).sorted.toSeq
        == (0 until 10).map(i => s"id-$i").sorted)
    } finally q1.stop()

    mem.addData(rows(5 until 15)) // 5-9 are dups of committed state
    val run2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q2 = start(run2)
    try {
      q2.processAllAvailable()
      assert(run2.toArray(Array.empty[String]).sorted.toSeq
        == (10 until 15).map(i => s"id-$i").sorted)
    } finally q2.stop()
  }

  test("min/max-of-struct OHLC boundaries survive streaming state (stream_ohlc shape)") {
    import spark.implicits._
    // boundary events arrive in DIFFERENT micro-batches than the bulk
    // of their window, so open/close are only right if the struct
    // min/max merges through the state store across batches
    val rows = (0 until 90).map { i =>
      (java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 53L)),
        i.toLong, ((i * 37) % 100 + 1).toLong)
    }
    def plan(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(
        count(lit(1)).as("n"),
        max(col("vc")).as("high"), min(col("vc")).as("low"),
        min(struct(unix_micros(col("ts")).as("us"), col("id"), col("vc"))).as("o"),
        max(struct(unix_micros(col("ts")).as("us"), col("id"), col("vc"))).as("c"))
      .select(
        unix_timestamp(col("window.start")).as("ws"),
        col("n"), col("o.vc").as("open"), col("high"), col("low"),
        col("c.vc").as("close"))
    def snap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sorted.toSeq
    val batch = snap(plan(rows.toDF("ts", "id", "vc")))
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)](spark)
    val q = plan(mem.toDF().toDF("ts", "id", "vc").withWatermark("ts", "5 minutes"))
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("complete")
      .start()
    try {
      // shuffled arrival order + 3 batches: every window's true open/
      // close lands away from its other rows
      val shuffled = new scala.util.Random(11).shuffle(rows)
      mem.addData(shuffled.take(30)); q.processAllAvailable()
      mem.addData(shuffled.slice(30, 60)); q.processAllAvailable()
      mem.addData(shuffled.drop(60)); q.processAllAvailable()
      assert(snap(spark.table("ohlc_out")) == batch)
    } finally q.stop()
  }

  test("bitmap distinct aggregate carries streaming state (stream_distinct shape)") {
    import spark.implicits._
    // users revisit across micro-batches, so the exact distinct per
    // window NEEDS the bitmap state to merge across batches — a
    // per-batch count would overcount revisits
    val ts = (0 until 120).map(i =>
      (java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 41L)),
        (i % 7).toLong))
    def plan(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(
        graft.functions.BitmapFunctions.bitmapDistinct(col("uid"))
          .as("n_users"),
        count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("window.start")).as("ws"),
        col("n_users"), col("n"))
    val batch = plan(ts.toDF("ts", "uid"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted

    val mem = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val q = plan(mem.toDF().toDF("ts", "uid").withWatermark("ts", "5 minutes"))
      .writeStream.format("memory").queryName("bmdist_out")
      .outputMode("complete")
      .start()
    try {
      // three separate micro-batches: windows straddle batch
      // boundaries, so buffers round-trip the state store serialized
      mem.addData(ts.take(40)); q.processAllAvailable()
      mem.addData(ts.slice(40, 80)); q.processAllAvailable()
      mem.addData(ts.drop(80)); q.processAllAvailable()
      val got = spark.table("bmdist_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq == batch.toSeq)
    } finally q.stop()
  }
}

/** Top-level (NOT an inner class — a spec-nested processor would
  * capture the scalatest engine into the task closure): the Spark-4
  * `StatefulProcessor` carrying the stream_latest_state transition in
  * an explicit RocksDB-backed ValueState.
  */
class TwsLatestProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long,
      graft.queries.StreamingWindows.UserEvent,
      graft.queries.StreamingWindows.UserLatest] {
  import graft.queries.StreamingWindows.{UserEvent, UserLatest}
  @transient private var state
      : org.apache.spark.sql.streaming.ValueState[UserLatest] = _
  override def init(
      out: org.apache.spark.sql.streaming.OutputMode,
      time: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[UserLatest](
      "latest",
      org.apache.spark.sql.Encoders.product[UserLatest],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(
      key: Long, rows: Iterator[UserEvent],
      tv: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserLatest] = {
    val init =
      if (state.exists()) state.get()
      else UserLatest(key, 0L, 0L, Long.MinValue, Long.MinValue, 0L)
    val out = rows.foldLeft(init)(TwsLatestProcessor.step)
    state.update(out)
    Iterator.single(out)
  }
}

object TwsLatestProcessor {
  import graft.queries.StreamingWindows.{UserEvent, UserLatest}
  def step(s: UserLatest, e: UserEvent): UserLatest = {
    val later = e.us > s.last_us ||
      (e.us == s.last_us && e.event_id > s.last_event_id)
    UserLatest(
      s.user_id, s.n_events + 1, s.sum_c + e.vc,
      if (later) e.us else s.last_us,
      if (later) e.event_id else s.last_event_id,
      if (later) e.vc else s.last_value_c)
  }
}
