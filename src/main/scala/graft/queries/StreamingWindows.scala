package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time windowing semantics (SURVEY §2.6 streaming gap-fill),
  * expressed over the batch `events` table with the *same* `window` /
  * `session_window` operators Structured Streaming uses — the
  * streaming specs (graft.streaming) run these plans as actual
  * streams; here they are oracle-checked for correctness. Window
  * starts surface as epoch seconds/micros (BIGINT) to stay
  * engine-portable.
  */
object StreamingWindows {

  /** Tumbling 6-hour windows per event type: epoch-aligned, exactly
    * Spark's `window()` bucketing.
    */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        window(col("ts"), "6 hours").as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"), col("total"))
      .orderBy("window_start", "event_type")

  def streamTumblingOracle: String =
    """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600 AS window_start,
      |  event_type, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** `stream_distinct`: EXACT distinct users per tumbling window
    * through the mergeable bitmap aggregate — the distinct-count
    * streaming dashboards usually approximate (HLL) served exactly:
    * [[graft.functions.BitmapDistinct]]'s buffer is the windowed
    * STATE, serialized into the state store between micro-batches
    * and OR-merged as late rows arrive, so a custom
    * TypedImperativeAggregate carries streaming aggregation state
    * like any built-in (StreamingPipelineSpec proves live parity
    * over a watermarked MemoryStream). Batch semantics here; the
    * identical plan runs as a stream.
    */
  def streamDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(
        graft.functions.BitmapFunctions.bitmapDistinct(col("user_id"))
          .as("n_users"),
        count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("n_users"), col("n"))
      .orderBy("window_start")

  def streamDistinctOracle: String =
    """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600 AS window_start,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) n_users,
      |  CAST(COUNT(*) AS BIGINT) n
      |FROM events GROUP BY 1 ORDER BY window_start""".stripMargin

  /** `stream_ohlc`: per-window open/high/low/close/volume candles in
    * a form a STREAMING aggregation can run — the market-data /
    * metrics resample. Window functions don't exist in streaming
    * aggregations, so the boundary values come from MIN/MAX over the
    * ORDERABLE STRUCT (us, event_id, cents): lexicographic struct
    * comparison makes "value at the earliest/latest instant" a plain
    * mergeable aggregate (ties impossible — event_id is unique), the
    * same trick min-of-struct survivorship uses in golden_record.
    * Batch ohlc_bars resolves the identical boundary by grid
    * join-back; this formulation trades two joins for two struct
    * aggregates and gains streaming compatibility
    * (StreamingPipelineSpec runs the plan live over a watermarked
    * MemoryStream and asserts exact parity).
    */
  def streamOhlc(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("ts"), unix_micros(col("ts")).as("us"), col("event_id"),
        Quantize.cents(col("value")).as("vc"))
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(
        count(lit(1)).as("n"),
        max(col("vc")).as("high_c"),
        min(col("vc")).as("low_c"),
        min(struct(col("us"), col("event_id"), col("vc"))).as("o"),
        max(struct(col("us"), col("event_id"), col("vc"))).as("c"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("n"), col("o.vc").as("open_c"), col("high_c"), col("low_c"),
        col("c.vc").as("close_c"))
      .orderBy("window_start")

  def streamOhlcOracle: String =
    s"""WITH ev AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) us, event_id,
       |    ${Quantize.centsSql("value")} vc
       |  FROM events),
       |r AS (
       |  SELECT us // 21600000000 wk, vc,
       |    ROW_NUMBER() OVER (PARTITION BY us // 21600000000
       |      ORDER BY us, event_id) rn,
       |    ROW_NUMBER() OVER (PARTITION BY us // 21600000000
       |      ORDER BY us DESC, event_id DESC) rn_last
       |  FROM ev),
       |g AS (
       |  SELECT wk, CAST(count(*) AS BIGINT) n, max(vc) high_c,
       |    min(vc) low_c
       |  FROM r GROUP BY 1),
       |o AS (SELECT wk, vc open_c FROM r WHERE rn = 1),
       |c AS (SELECT wk, vc close_c FROM r WHERE rn_last = 1)
       |SELECT g.wk * 21600 window_start, g.n, o.open_c, g.high_c,
       |  g.low_c, c.close_c
       |FROM g JOIN o ON g.wk = o.wk JOIN c ON g.wk = c.wk
       |ORDER BY window_start""".stripMargin

  /** Sliding windows: 6-hour windows every 3 hours (each event lands
    * in exactly two windows).
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours", "3 hours").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("n"))
      .orderBy("window_start")

  def streamSlidingOracle: String =
    """WITH slid AS (
      |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 10800000000) * 10800 AS slot_start, ts
      |  FROM events),
      |w AS (
      |  SELECT slot_start AS window_start FROM slid
      |  UNION ALL
      |  SELECT slot_start - 10800 AS window_start FROM slid)
      |SELECT window_start, CAST(COUNT(*) AS BIGINT) n
      |FROM w GROUP BY 1 ORDER BY window_start""".stripMargin

  /** Session windows per user with a 30-minute inactivity gap —
    * Spark's `session_window`; the oracle derives identical sessions
    * with a gaps-and-islands window query. A new session starts when
    * the gap since the previous event is >= 30 minutes.
    */
  def streamSessions(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")

  def streamSessionsOracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) ts FROM events),
      |m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) sid
      |  FROM m)
      |SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
      |  CAST(COUNT(*) AS BIGINT) n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** `dynamic_sessions`: session windows whose inactivity gap depends
    * on the EVENT — clicks hold a session open 10 minutes, views 30,
    * everything else 20 (engagement-weighted sessionization; the
    * fixed-gap form is `stream_sessions`). Uses Spark's dynamic-gap
    * `session_window(ts, gapExpr)`: each event spans [ts, ts+gap) and
    * overlapping spans merge, so a session ends only when the NEXT
    * event starts at-or-after the running max of all previous spans'
    * ends — which is exactly how the oracle replays it (running max
    * over the prior rows' ts+gap, new session on ts >= that max). The
    * same aggregate runs under a watermark as a stream; user_id < 40
    * bounds oracle rows per the session_stats convention.
    */
  def dynamicSessions(spark: SparkSession, dir: String): DataFrame = {
    val gap = when(col("event_type") === "click", lit("10 minutes"))
      .when(col("event_type") === "view", lit("30 minutes"))
      .otherwise(lit("20 minutes"))
    Tables.events(spark, dir)
      .where(col("user_id") < 40)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")
  }

  def dynamicSessionsOracle: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) ts,
      |    CASE event_type WHEN 'click' THEN INTERVAL 10 MINUTE
      |      WHEN 'view' THEN INTERVAL 30 MINUTE
      |      ELSE INTERVAL 20 MINUTE END gap
      |  FROM events WHERE user_id < 40),
      |m AS (
      |  SELECT user_id, ts, ts + gap AS sp_end,
      |    MAX(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) prev_end
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts, sp_end,
      |    SUM(CASE WHEN prev_end IS NULL OR ts >= prev_end
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) sid
      |  FROM m)
      |SELECT user_id, epoch_us(MIN(ts)) session_start_us,
      |  epoch_us(MAX(sp_end)) session_end_us,
      |  CAST(COUNT(*) AS BIGINT) n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Stream-stream interval join semantics (click -> purchase by the
    * same user within 30 minutes AFTER the click), stated as the
    * banded equi-join: both sides bucket to 30-minute slots and join
    * on (user, slot) with the purchase side exploded to {slot,
    * slot-1}, so each qualifying pair matches exactly once and the
    * join key stays hashable — no O(n²) theta join, and the same
    * banding is the state-cleanup story under watermarks. The LIVE
    * watermarked interval join runs in StreamingPipelineSpec and is
    * asserted equal to the batch plan; here the semantics are
    * oracle-checked (the oracle states the naive theta join).
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 1800000000L // 30 minutes in micros
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(
        col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
      .withColumn("slot", expr(s"c_us div $W"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
      .withColumn("pslot", expr(s"p_us div $W"))
      .select(
        col("user_id"), col("purchase_id"), col("p_us"),
        explode(array(col("pslot"), col("pslot") - 1)).as("slot"))
    clicks
      .join(purchases, Seq("user_id", "slot"))
      .where(col("p_us") >= col("c_us") && col("p_us") - col("c_us") <= W)
      .select(
        col("user_id"), col("click_id"), col("purchase_id"),
        (col("p_us") - col("c_us")).as("dt_us"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  def streamJoinOracle: String =
    """SELECT c.user_id AS user_id, c.event_id AS click_id,
      |  p.event_id AS purchase_id,
      |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS dt_us
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND epoch_us(CAST(p.ts AS TIMESTAMP)) >= epoch_us(CAST(c.ts AS TIMESTAMP))
      |  AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) <= 1800000000
      |ORDER BY user_id, click_id, purchase_id""".stripMargin

  /** `stream_outer_join`: the LEFT-OUTER stream-stream interval join
    * — every click, attributed to a same-user purchase within 30
    * minutes after it, or null-extended when none arrives. This is
    * the streaming semantics users get wrong most: in a live stream
    * the unmatched left row can only emit AFTER the watermark passes
    * its match window (state must expire before "no match" is a
    * fact), which StreamingPipelineSpec pins over a 3-phase
    * MemoryStream; here the batch-stated twin is oracle-checked. The
    * interval predicate lives INSIDE the join condition — on an
    * outer join a post-filter would silently drop the null-extended
    * rows (the classic bug). Banded equi-join per stream_join: the
    * purchase side explodes to {slot, slot−1}, so each qualifying
    * pair matches exactly once, the key stays hashable, and an
    * unmatched click emits exactly one null row.
    */
  def streamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 1800000000L // 30 minutes in micros
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(
        col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
      .withColumn("slot", expr(s"c_us div $W"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
      .withColumn("pslot", expr(s"p_us div $W"))
      .select(
        col("p_user"), col("purchase_id"), col("p_us"),
        explode(array(col("pslot"), col("pslot") - 1)).as("pslot"))
    clicks
      .join(
        purchases,
        col("user_id") === col("p_user") && col("slot") === col("pslot") &&
          col("p_us") >= col("c_us") && col("p_us") - col("c_us") <= W,
        "left_outer")
      .select(
        col("user_id"), col("click_id"), col("purchase_id"),
        (col("p_us") - col("c_us")).as("dt_us"))
      .orderBy(
        col("user_id"), col("click_id"), col("purchase_id").asc_nulls_first)
  }

  def streamOuterJoinOracle: String =
    """SELECT c.user_id AS user_id, c.event_id AS click_id,
      |  p.event_id AS purchase_id,
      |  epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS dt_us
      |FROM events c LEFT JOIN events p
      |  ON c.user_id = p.user_id
      |  AND p.event_type = 'purchase'
      |  AND epoch_us(CAST(p.ts AS TIMESTAMP)) >= epoch_us(CAST(c.ts AS TIMESTAMP))
      |  AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) <= 1800000000
      |WHERE c.event_type = 'click'
      |ORDER BY user_id, click_id, purchase_id NULLS FIRST""".stripMargin

  /** `stream_full_outer_join`: the FULL-outer stream-stream interval
    * join — every click with its attributed purchase, every
    * unattributed click null-extended right, and every orphan
    * purchase (no qualifying click) null-extended left. Spark runs
    * this natively as a watermarked full_outer interval join (both
    * sides' state expires before either "no match" is a fact —
    * StreamingPipelineSpec pins the phased emission); the BATCH twin
    * here cannot reuse the banded explode naively — an unmatched
    * purchase appears once per slot replica under a full join, the
    * double-null-extension bug — so it states the standard
    * decomposition instead: left-outer (clicks side, interval
    * predicate inside the join condition) ∪ right-anti (purchases
    * whose id never matched, null-extended). The anti probe runs on
    * matched purchase IDS (distinct, bounded by the match volume),
    * never re-exploded.
    */
  def streamFullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 1800000000L // 30 minutes in micros
    val ev = Tables.events(spark, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("c_us"))
      .withColumn("slot", expr(s"c_us div $W"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(
        col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("p_us"))
    val purchasesExpl = purchases
      .select(
        col("p_user"), col("purchase_id"), col("p_us"),
        explode(array(expr(s"p_us div $W"), expr(s"p_us div $W - 1")))
          .as("pslot"))
    val lo = clicks
      .join(
        purchasesExpl,
        col("c_user") === col("p_user") && col("slot") === col("pslot") &&
          col("p_us") >= col("c_us") && col("p_us") - col("c_us") <= W,
        "left_outer")
      .select(
        col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        (col("p_us") - col("c_us")).as("dt_us"))
    val matchedIds = lo.where(col("purchase_id").isNotNull)
      .select(col("purchase_id")).distinct()
    val rightOnly = purchases
      .join(matchedIds, Seq("purchase_id"), "left_anti")
      .select(
        col("p_user").as("user_id"),
        lit(null).cast("long").as("click_id"),
        col("purchase_id"),
        lit(null).cast("long").as("dt_us"))
    lo.unionByName(rightOnly)
      .orderBy(
        col("user_id"), col("click_id").asc_nulls_first,
        col("purchase_id").asc_nulls_first)
  }

  def streamFullOuterJoinOracle: String =
    """WITH c AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
      |  c.event_id AS click_id, p.event_id AS purchase_id,
      |  p.us - c.us AS dt_us
      |FROM c FULL JOIN p
      |  ON c.user_id = p.user_id AND p.us >= c.us
      |  AND p.us - c.us <= 1800000000
      |ORDER BY user_id, click_id NULLS FIRST, purchase_id NULLS FIRST""".stripMargin

  /** `debounce_agg`: CHAINED stateful operators — semantic dedup
    * (one event per user × type × 30-minute slot, the debounce every
    * telemetry pipeline wants) feeding a windowed aggregate, in one
    * query. Spark 4 runs this live as dropDuplicatesWithinWatermark →
    * windowed count (two stateful operators in one stream —
    * StreamingPipelineSpec pins the live parity); the batch twin is
    * deterministic because the aggregate depends only on WHICH
    * (user, type, slot) groups survive, never on which row
    * represents them — 30-minute slots nest exactly in the 6-hour
    * windows, so every survivor of a slot lands in the same window.
    */
  def debounceAgg(spark: SparkSession, dir: String): DataFrame = {
    val W = 1800000000L // 30-minute slot in micros
    Tables.events(spark, dir)
      .withColumn("slot", expr(s"unix_micros(ts) div $W"))
      .dropDuplicates("user_id", "event_type", "slot")
      .groupBy(
        expr("slot * 1800 div 21600 * 21600").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_debounced"))
      .orderBy("window_start", "event_type")
  }

  def debounceAggOracle: String =
    """WITH s AS (
      |  SELECT DISTINCT user_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000 slot
      |  FROM events)
      |SELECT (slot * 1800 // 21600) * 21600 AS window_start, event_type,
      |  CAST(count(*) AS BIGINT) n_debounced
      |FROM s GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Windowed top-k: the per-window leaderboard every streaming
    * dashboard runs — rank inside each tumbling window. The rank
    * window partitions on window_start (high cardinality over time),
    * and upstream is the same pre-aggregated (window, type) count
    * table as stream_tumbling, so the ranked input is
    * dimension-sized, never raw events.
    */
  def streamTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n"))
    val wr = Window.partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("event_type"))
    counts
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .where(col("rnk") <= 2)
      .orderBy("window_start", "rnk")
  }

  def streamTopkOracle: String =
    """WITH c AS (
      |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600 AS window_start,
      |    event_type, CAST(COUNT(*) AS BIGINT) n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY window_start ORDER BY n DESC, event_type) rnk
      |  FROM c)
      |SELECT window_start, event_type, n, CAST(rnk AS BIGINT) rnk
      |FROM r WHERE rnk <= 2 ORDER BY window_start, rnk""".stripMargin

  /** Streaming deduplication semantics (`dropDuplicates` /
    * `dropDuplicatesWithinWatermark` keyed state): keep the FIRST
    * event per (user, event_type) — deterministically the minimum
    * (event time, event_id), which is what arrival-ordered streaming
    * dedup retains — plus how many duplicates the state absorbed.
    * Batch plan: ONE hash aggregate (min-of-struct + count), no
    * window, map-side combinable — the exact cost model of the
    * streaming operator's state updates at 100 TB.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(struct(col("us"), col("event_id"))).as("m"),
        count(lit(1)).as("n_events"))
      .select(
        col("user_id"), col("event_type"),
        col("m.us").as("first_us"),
        col("m.event_id").as("first_event_id"),
        col("n_events"))
      .orderBy("user_id", "event_type")

  def streamDedupOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us, event_id
      |  FROM events),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY user_id, event_type ORDER BY us, event_id) rn,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id, event_type) AS BIGINT) n_events
      |  FROM e)
      |SELECT user_id, event_type, us AS first_us, event_id AS first_event_id,
      |  n_events
      |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Stream-static enrichment: each micro-batch of events joins the
    * static customer→nation dimension (user_id keys into the customer
    * table) before windowed aggregation — the canonical "enrich the
    * stream against a warehouse table" topology. The dimension side
    * BROADCASTS (it is bounded; the stream is not), so at 100 TB/day
    * of events no shuffle ever carries the stream: each executor
    * probes its batch partition against the replicated dimension,
    * exactly how Structured Streaming plans a stream-static equi-join.
    * Oracle: the batch equivalent over the full table.
    */
  def streamEnrich(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.read(spark, dir, "customer")
      .join(
        Tables.read(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    Tables.events(spark, dir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(
        window(col("ts"), "6 hours").as("w"),
        col("n_name"))
      .agg(
        count(lit(1)).as("n"),
        sum(Quantize.cents(col("value"))).as("value_cents"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("n_name"), col("n"), col("value_cents"))
      .orderBy("window_start", "n_name")
  }

  def streamEnrichOracle: String =
    s"""SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600 AS window_start,
      |  n_name, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(SUM(${Quantize.centsSql("value")}) AS BIGINT) value_cents
      |FROM events
      |JOIN customer ON user_id = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY window_start, n_name""".stripMargin

  final case class UserEvent(
      user_id: Long, us: Long, event_id: Long, vc: Long)

  /** The per-key running state [[streamLatestState]] maintains; also
    * the emitted row, so update-mode streaming output IS the state
    * table (last emission per key = final state).
    */
  final case class UserLatest(
      user_id: Long,
      n_events: Long,
      sum_c: Long,
      last_us: Long,
      last_event_id: Long,
      last_value_c: Long)

  /** The state transition: fold a batch of events into the running
    * per-user state. Commutative across arrival order — "latest" is
    * max by (us, event_id), never "last seen" — so any micro-batch
    * split of the stream converges to the same state (the spec
    * shuffles arrival across 3 batches and asserts exactly that).
    */
  private def foldUserState(
      key: Long,
      rows: Iterator[UserEvent],
      prior: Option[UserLatest]): UserLatest =
    rows.foldLeft(
      prior.getOrElse(UserLatest(key, 0L, 0L, Long.MinValue, Long.MinValue, 0L))
    ) { (s, e) =>
      val later = e.us > s.last_us ||
        (e.us == s.last_us && e.event_id > s.last_event_id)
      UserLatest(
        key, s.n_events + 1, s.sum_c + e.vc,
        if (later) e.us else s.last_us,
        if (later) e.event_id else s.last_event_id,
        if (later) e.vc else s.last_value_c)
    }

  /** `stream_latest_state`: arbitrary keyed state via
    * `mapGroupsWithState` — the CDC-style "latest record + running
    * totals per key" state machine that windowed aggregates can't
    * express (the state is a whole struct chosen by an ordering, not
    * a mergeable scalar... except it IS designed mergeable here, see
    * [[foldUserState]]). The SAME typed function runs three ways:
    * batch (this entry — Spark executes mapGroupsWithState over each
    * full group, oracle-checked), live update-mode streaming
    * (StreamingPipelineSpec: 3-batch MemoryStream, last emission per
    * key equals this result), and incrementally (state carried
    * between batches via GroupState). At 100 TB the state store is
    * user-grain — each micro-batch shuffles only ITS rows to the
    * key's state partition; the batch twin is one hash shuffle.
    */
  def streamLatestState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    Tables.events(spark, dir)
      .select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), Quantize.cents(col("value")).as("vc"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[UserEvent],
         state: org.apache.spark.sql.streaming.GroupState[UserLatest]) =>
          val out = foldUserState(key, rows, state.getOption)
          state.update(out)
          out
      }
      .toDF()
      .orderBy("user_id")
  }

  def streamLatestStateOracle: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) us, event_id,
       |    ${Quantize.centsSql("value")} vc
       |  FROM events),
       |r AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (
       |      PARTITION BY user_id ORDER BY us DESC, event_id DESC) rn,
       |    CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) n_events,
       |    CAST(SUM(vc) OVER (PARTITION BY user_id) AS BIGINT) sum_c
       |  FROM e)
       |SELECT user_id, n_events, sum_c, us AS last_us,
       |  event_id AS last_event_id, vc AS last_value_c
       |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "stream_latest_state", streamLatestState, Some(streamLatestStateOracle)),
    QueryDef("stream_ohlc", streamOhlc, Some(streamOhlcOracle)),
    QueryDef("stream_distinct", streamDistinct, Some(streamDistinctOracle)),
    QueryDef("stream_enrich", streamEnrich, Some(streamEnrichOracle)),
    QueryDef("stream_dedup", streamDedup, Some(streamDedupOracle)),
    QueryDef("stream_topk", streamTopk, Some(streamTopkOracle)),
    QueryDef("stream_tumbling", streamTumbling, Some(streamTumblingOracle)),
    QueryDef("stream_sliding", streamSliding, Some(streamSlidingOracle)),
    QueryDef("stream_sessions", streamSessions, Some(streamSessionsOracle)),
    QueryDef(
      "dynamic_sessions", dynamicSessions, Some(dynamicSessionsOracle)),
    QueryDef("stream_join", streamJoin, Some(streamJoinOracle)),
    QueryDef(
      "stream_outer_join", streamOuterJoin, Some(streamOuterJoinOracle)),
    QueryDef(
      "stream_full_outer_join", streamFullOuterJoin,
      Some(streamFullOuterJoinOracle)),
    QueryDef("debounce_agg", debounceAgg, Some(debounceAggOracle)))
}
