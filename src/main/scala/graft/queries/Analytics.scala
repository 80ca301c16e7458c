package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics suite over `events` / `orders`: ordered funnel
  * conversion, cohort retention, SCD2 change-history compaction
  * (gaps-and-islands), and range-frame rolling aggregates. Each is a
  * classic warehouse shape the reference's consumers would run
  * downstream of the event stream, expressed with the scale-correct
  * plan: high-cardinality window partition keys (user_id), pre-
  * aggregation before any low-cardinality window, and time arithmetic
  * kept in exact integer micros until the final scalar.
  */
object Analytics {

  /** Ordered view→click→purchase funnel: a user converts a stage only
    * with an event STRICTLY AFTER their previous-stage time (the
    * ordering is the point — an unordered count(distinct) funnel
    * overstates conversion). One row: stage survivor counts + mean
    * seconds view→purchase.
    *
    * Scale shape: three user-keyed min-aggregations chained by joins
    * that all hash on user_id — after the first shuffle the rest
    * co-partition (ReuseExchange/AQE), and each aggregate is map-side
    * combinable. The delay sum stays in exact integer micros so the
    * distributed aggregation is order-independent; doubles only in the
    * final one-row division.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicks = ev.where(col("event_type") === "click")
      .join(views, "user_id")
      .where(col("ts") > col("t_view"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_click"), max(col("t_view")).as("t_view"))
    val buys = ev.where(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .where(col("ts") > col("t_click"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t_buy"), max(col("t_view")).as("t_view"))
    views
      .join(clicks.select(col("user_id").as("cu")),
        col("user_id") === col("cu"), "left")
      .join(buys.select(col("user_id").as("bu"),
          (unix_micros(col("t_buy")) - unix_micros(col("t_view"))).as("us")),
        col("user_id") === col("bu"), "left")
      .agg(
        count(lit(1)).as("users_view"),
        count(col("cu")).as("users_click"),
        count(col("bu")).as("users_purchase"),
        (sum(col("us")).cast("double") / count(col("bu")) / 1e6)
          .as("avg_convert_s"))
  }

  def funnelStepsOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) ts FROM events),
      |v AS (
      |  SELECT user_id, MIN(ts) t_view FROM ev
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT ev.user_id, MIN(ev.ts) t_click, MAX(v.t_view) t_view
      |  FROM ev JOIN v ON ev.user_id = v.user_id
      |  WHERE ev.event_type = 'click' AND ev.ts > v.t_view
      |  GROUP BY ev.user_id),
      |b AS (
      |  SELECT ev.user_id, MIN(ev.ts) t_buy, MAX(c.t_view) t_view
      |  FROM ev JOIN c ON ev.user_id = c.user_id
      |  WHERE ev.event_type = 'purchase' AND ev.ts > c.t_click
      |  GROUP BY ev.user_id)
      |SELECT CAST(COUNT(*) AS BIGINT) users_view,
      |  CAST(COUNT(c.user_id) AS BIGINT) users_click,
      |  CAST(COUNT(b.user_id) AS BIGINT) users_purchase,
      |  CAST(SUM(epoch_us(b.t_buy) - epoch_us(b.t_view)) AS DOUBLE)
      |    / COUNT(b.user_id) / 1e6 AS avg_convert_s
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |LEFT JOIN b ON v.user_id = b.user_id""".stripMargin

  /** Cohort retention: users grouped by first-active day, then the
    * distinct-user count per (cohort, day-offset) for the first week —
    * the standard retention triangle.
    *
    * Scale shape: first-seen is one user-keyed min; the join back is
    * on the same key (co-partitioned); the (cohort, offset, user)
    * dedup + count shuffles rows already reduced to one per
    * user-activity-day. No low-cardinality window anywhere.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
    ev.join(first, "user_id")
      .select(
        col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"),
        col("user_id"))
      .where(col("day_offset") <= 7)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  def cohortRetentionOracle: String =
    """WITH ev AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) d
      |  FROM events),
      |f AS (SELECT user_id, MIN(d) cohort_day FROM ev GROUP BY user_id)
      |SELECT f.cohort_day,
      |  CAST(date_diff('day', f.cohort_day, ev.d) AS BIGINT) day_offset,
      |  CAST(COUNT(*) AS BIGINT) n_users
      |FROM ev JOIN f ON ev.user_id = f.user_id
      |WHERE date_diff('day', f.cohort_day, ev.d) <= 7
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** `cohort_ltv`: the lifetime-value TRIANGLE — cumulative purchase
    * revenue per signup cohort × age day (offset ≤ 14), with cohort
    * size and per-user LTV in milli-cents: [[cohortRetention]] counts
    * who came back, this prices what they spent, and the diagonal
    * (all cohorts at equal age) is how a growth team compares
    * acquisition quality without waiting for old cohorts to finish.
    * Cohort = first event date over ALL event types (same rule as
    * retention); exact cents per cell, cumulative along age.
    *
    * Plan: one user-grain first-date aggregate, one fact join
    * co-partitioned on user_id (retention's shape), then the
    * cohort×age grid is BOUNDED (≤ window-days², ~10⁵ rows at a year)
    * — the cumulative window partitions by cohort over that
    * grid-sized relation, never over facts; cohort sizes broadcast
    * back. Sparse cells (a cohort-day with no purchases) are simply
    * absent — the cumulative carries over them identically in both
    * engines because both window the same present rows.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val first = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
      .localCheckpoint(eager = false) // cohort sizes + the fact join
    val sizes = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    val grid = ev.where(col("event_type") === "purchase")
      .select(
        col("user_id"), to_date(col("ts")).as("d"),
        Quantize.cents(col("value")).as("c"))
      .join(first, "user_id")
      .select(
        col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"),
        col("c"))
      .where(col("day_offset") <= 14)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(sum(col("c")).as("rev_c"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_rev_c", sum(col("rev_c")).over(w))
      .join(broadcast(sizes), "cohort_day")
      .select(
        col("cohort_day"), col("day_offset"), col("n_cohort"),
        col("rev_c"), col("cum_rev_c"),
        expr("cum_rev_c * 1000 div n_cohort").as("ltv_milli"))
      .orderBy("cohort_day", "day_offset")
  }

  def cohortLtvOracle: String =
    s"""WITH f AS (
      |  SELECT user_id,
      |    MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) cohort_day
      |  FROM events GROUP BY 1),
      |sz AS (
      |  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) n_cohort
      |  FROM f GROUP BY 1),
      |g AS (
      |  SELECT f.cohort_day,
      |    CAST(date_diff('day', f.cohort_day,
      |      CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) AS BIGINT) day_offset,
      |    CAST(SUM(${Quantize.centsSql("e.value")}) AS BIGINT) rev_c
      |  FROM events e JOIN f ON e.user_id = f.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND date_diff('day', f.cohort_day,
      |      CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) <= 14
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT cohort_day, day_offset, rev_c,
      |    CAST(SUM(rev_c) OVER (
      |      PARTITION BY cohort_day ORDER BY day_offset) AS BIGINT) cum_rev_c
      |  FROM g)
      |SELECT c.cohort_day, c.day_offset, n_cohort, rev_c, cum_rev_c,
      |  cum_rev_c * 1000 // n_cohort AS ltv_milli
      |FROM c JOIN sz USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin

  /** SCD2 change-history compaction (gaps-and-islands): each user's
    * event stream collapses to runs of consecutive equal event_type,
    * emitted as validity intervals [valid_from, valid_to) with the run
    * length — the type-2 dimension-history build. Island ids come from
    * a running sum of change flags; the final interval close is a lead
    * over the compacted runs (far fewer rows than events).
    *
    * Scale shape: both windows partition on user_id (high cardinality
    * ⇒ even spread), and the second window runs over the ALREADY
    * COMPACTED islands. Deterministic ordering via the (ts, event_id)
    * tie-break.
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val chg = when(
      lag(col("event_type"), 1).over(w).isNull ||
        lag(col("event_type"), 1).over(w) =!= col("event_type"),
      1L).otherwise(0L)
    val islands = ev
      .withColumn("island", sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(
        max(col("event_type")).as("seg_type"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("island"))
    islands
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .select(
        col("user_id"), col("island"), col("seg_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("island"))
  }

  /** The SCD2 segment-build CTE chain ending in
    * `segs(user_id, island, seg_type, valid_from, n_events)` — shared
    * by the history query and the point-in-time join oracle.
    */
  private val Scd2Ctes: String =
    """ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) ts, event_id
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
      |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END chg
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |isl AS (
      |  SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) island
      |  FROM flagged),
      |segs AS (
      |  SELECT user_id, island, MAX(event_type) seg_type, MIN(ts) valid_from,
      |    CAST(COUNT(*) AS BIGINT) n_events
      |  FROM isl GROUP BY user_id, island)""".stripMargin

  def scd2HistoryOracle: String =
    s"""WITH $Scd2Ctes
      |SELECT user_id, island, seg_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY island) valid_to,
      |  n_events
      |FROM segs ORDER BY user_id, island""".stripMargin

  /** Point-in-time join: each purchase looks up the SCD2 dimension
    * VERSION valid at its moment — the versioned-dimension lookup
    * every fact-load pipeline runs. Because validity intervals
    * partition each key's timeline ([valid_from, next valid_from)),
    * the interval-membership join is EXACTLY a backward as-of on
    * valid_from — so the probe runs through the native
    * [[graft.plans.AsOfJoin]] operator (one exchange per side, linear
    * merge; broadcast variant when the dimension is small), while the
    * oracle states the same relation as an explicit BETWEEN-interval
    * join. No banding, no explode, no per-probe interval scan.
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame = {
    // Adjacent islands of one user can share a valid_from when boundary
    // events carry identical timestamps; the earlier island's interval
    // [vf, vf) is then EMPTY, and an as-of probe at a tied time would
    // pick among equal vf_us rows in arrival order. The oracle's
    // half-open interval semantics deterministically exclude the
    // empty-interval version, so tie-break to max(version) per
    // (d_user, vf_us) — one user-partitioned aggregate over the
    // already-compacted islands — before the as-of probe.
    val dim = scd2History(spark, dir).select(
        col("user_id").as("d_user"),
        col("island").as("version"),
        col("seg_type"),
        unix_micros(col("valid_from")).as("vf_us"))
      .groupBy(col("d_user"), col("vf_us"))
      .agg(max(struct(col("version"), col("seg_type"))).as("m"))
      .select(
        col("d_user"), col("vf_us"),
        col("m.version").as("version"), col("m.seg_type").as("seg_type"))
    val probes = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    graft.plans.AsOfJoin.backward(
        probes, dim,
        leftKey = "user_id", leftTime = "us",
        rightKey = "d_user", rightTime = "vf_us")
      .select(col("event_id"), col("user_id"), col("seg_type"), col("version"))
      .orderBy("event_id")
  }

  def pitJoinOracle: String =
    s"""WITH $Scd2Ctes,
      |dim AS (
      |  SELECT user_id, island AS version, seg_type,
      |    epoch_us(valid_from) vf_us,
      |    lead(epoch_us(valid_from)) OVER (
      |      PARTITION BY user_id ORDER BY island) vt_us
      |  FROM segs),
      |p AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, d.seg_type, d.version
      |FROM p LEFT JOIN dim d ON p.user_id = d.user_id
      |  AND p.us >= d.vf_us AND (d.vt_us IS NULL OR p.us < d.vt_us)
      |ORDER BY p.event_id""".stripMargin

  /** Trailing-7-day rolling order stats per priority via a RANGE frame
    * over integer day numbers — a range frame (calendar window), not a
    * rows frame, so sparse days contribute correctly.
    *
    * Scale shape: the raw table pre-aggregates to (priority, day)
    * BEFORE any window — the range window runs over ~day-granularity
    * rows (thousands), not the fact table, so the low-cardinality
    * partition key is harmless. Cents stay integer until the final
    * division.
    */
  def rollingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.read(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("sale_day"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("priority"), col("sale_day"))
      .agg(sum(col("cents")).as("day_cents"), count(lit(1)).as("day_orders"))
      .withColumn("dayn", unix_date(col("sale_day")).cast("long"))
    val w = Window.partitionBy(col("priority")).orderBy(col("dayn"))
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("roll_cents", sum(col("day_cents")).over(w))
      .withColumn("roll_orders", sum(col("day_orders")).over(w))
      .select(
        col("priority"), col("sale_day"), col("roll_orders"),
        (col("roll_cents").cast("double") / col("roll_orders") / 100.0)
          .as("avg_order_value"))
      .orderBy(col("priority"), col("sale_day"))
  }

  def rollingRevenueOracle: String =
    s"""WITH daily AS (
      |  SELECT o_orderpriority priority, CAST(o_orderdate AS DATE) sale_day,
      |    SUM(${Quantize.centsSql("o_totalprice")}) day_cents,
      |    CAST(COUNT(*) AS BIGINT) day_orders,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) dayn
      |  FROM orders GROUP BY 1, 2, 5)
      |SELECT priority, sale_day,
      |  CAST(SUM(day_orders) OVER w AS BIGINT) roll_orders,
      |  CAST(SUM(day_cents) OVER w AS DOUBLE)
      |    / SUM(day_orders) OVER w / 100.0 AS avg_order_value
      |FROM daily
      |WINDOW w AS (PARTITION BY priority ORDER BY dayn
      |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY priority, sale_day""".stripMargin

  /** `rolling_median`: trailing-7-day EXACT median of daily revenue
    * per priority — the robust rolling smoother beside
    * rolling_revenue's mean (one outlier day drags a mean for a week;
    * the median shrugs). The window input is the (priority, day)
    * GRID, never fact rows, so collecting each ≤7-value frame into a
    * sorted array is constant work per output row; the median is
    * integer order-statistic arithmetic (floor-mean of the two middle
    * elements on even frames) — no float interpolation, bit-exact
    * against the oracle's list-window form.
    */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.read(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("sale_day"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("priority"), col("sale_day"))
      .agg(sum(col("cents")).as("day_cents"))
      .withColumn("dayn", unix_date(col("sale_day")).cast("long"))
    val w = Window.partitionBy(col("priority")).orderBy(col("dayn"))
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("vals", sort_array(collect_list(col("day_cents")).over(w)))
      .withColumn("n_days", size(col("vals")).cast("long"))
      .select(
        col("priority"), col("sale_day"), col("n_days"),
        expr(
          "(element_at(vals, CAST((n_days + 1) div 2 AS INT)) + " +
            "element_at(vals, CAST(n_days div 2 + 1 AS INT))) div 2")
          .as("median_cents"))
      .orderBy("priority", "sale_day")
  }

  def rollingMedianOracle: String =
    s"""WITH daily AS (
       |  SELECT o_orderpriority priority, CAST(o_orderdate AS DATE) sale_day,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) day_cents,
       |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) dayn
       |  FROM orders GROUP BY 1, 2, 4),
       |framed AS (
       |  SELECT priority, sale_day,
       |    list_sort(list(day_cents) OVER (PARTITION BY priority ORDER BY dayn
       |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) vals
       |  FROM daily)
       |SELECT priority, sale_day, CAST(len(vals) AS BIGINT) n_days,
       |  (vals[(len(vals) + 1) // 2] + vals[len(vals) // 2 + 1]) // 2
       |    AS median_cents
       |FROM framed ORDER BY priority, sale_day""".stripMargin

  /** Seasonal-naive forecast backtest over the event stream: train on
    * the first 23 days of the month, forecast daily revenue by weekday
    * class ((day-1) mod 7 — pure arithmetic, no engine dow-origin
    * divergence), score MAE on the held-out tail. Forecast and MAE are
    * integer floor divisions of exact cent sums, so the backtest table
    * hash-pins.
    *
    * Scale shape: one map-side-combinable daily aggregate over the
    * facts; train means and test scores are arithmetic over the tiny
    * per-day table, with the 7-row forecast broadcast back. The
    * backtest costs one aggregate regardless of event volume — the
    * forecasting front door for the capacity dashboards the reference's
    * stats endpoint feeds.
    */
  def forecastBaseline(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(
        to_date(col("ts")).as("d"),
        Quantize.cents(col("value")).as("vc"))
      .groupBy(col("d"))
      .agg(sum(col("vc")).as("day_cents"))
      .select(
        dayofmonth(col("d")).as("dom"),
        ((dayofmonth(col("d")) - 1) % 7).as("dow"),
        col("day_cents"))
    val train = daily.where(col("dom") <= 23)
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_train"), sum(col("day_cents")).as("train_cents"))
      .withColumn("forecast_cents", expr("train_cents div n_train"))
    val test = daily.where(col("dom") > 23)
      .join(broadcast(train), "dow")
      .groupBy(col("dow"))
      .agg(
        max(col("n_train")).as("n_train"),
        max(col("forecast_cents")).as("forecast_cents"),
        count(lit(1)).as("n_test"),
        sum(abs(col("day_cents") - col("forecast_cents"))).as("abs_err"))
    test.select(
      col("dow").cast("long").as("dow"),
      col("n_train"),
      col("forecast_cents"),
      col("n_test"),
      expr("abs_err div n_test").as("mae_cents"))
      .orderBy("dow")
  }

  def forecastBaselineOracle: String =
    s"""WITH daily AS (
      |  SELECT CAST(ts AS DATE) d, SUM(${Quantize.centsSql("value")}) day_cents
      |  FROM events GROUP BY 1),
      |tagged AS (
      |  SELECT day(d) dom, (day(d) - 1) % 7 dow, day_cents FROM daily),
      |train AS (
      |  SELECT dow, CAST(COUNT(*) AS BIGINT) n_train,
      |    SUM(day_cents) train_cents,
      |    CAST(SUM(day_cents) // COUNT(*) AS BIGINT) forecast_cents
      |  FROM tagged WHERE dom <= 23 GROUP BY 1)
      |SELECT CAST(t.dow AS BIGINT) dow, MAX(n_train) n_train,
      |  MAX(forecast_cents) forecast_cents,
      |  CAST(COUNT(*) AS BIGINT) n_test,
      |  CAST(SUM(abs(day_cents - forecast_cents)) // COUNT(*) AS BIGINT) mae_cents
      |FROM tagged t JOIN train USING (dow)
      |WHERE t.dom > 23
      |GROUP BY t.dow ORDER BY dow""".stripMargin

  /** Pinned ppm EWMA kernel — floor(10⁶·α·(1−α)^l) for α=¼ and lags
    * 0..13, quantized ONCE as integer literals consumed by both
    * engines (the ndcg_eval discount-table discipline: an irrational
    * intermediate can never diverge a hash). The bounded-lag form IS
    * the production streaming form — an unbounded EWMA needs the full
    * history; 14 taps of a ¼-decay carry >98% of the mass.
    */
  private val EwmaW: Seq[Long] = Seq(250000L, 187500L, 140625L, 105468L,
    79101L, 59326L, 44494L, 33370L, 25028L, 18771L, 14078L, 10558L,
    7919L, 5939L)
  private val EwmaWSql = EwmaW.zipWithIndex
    .map { case (w, l) => s"WHEN lag = $l THEN $w" }
    .mkString("CASE ", " ", " ELSE 0 END")

  /** `ewma_smooth`: exponentially-weighted moving average of daily
    * event revenue — the smoothing a monitoring dashboard layers on
    * the raw series before alerting (the suite's cusum_shift and
    * seasonal_anomaly detect; this is the smoother they read).
    * Weights are the pinned integer kernel above; the average is
    * SELF-NORMALIZING over the days actually present (Σw·rev div Σw
    * of present lags), so sparse edges and calendar gaps degrade
    * gracefully instead of reading absent days as zero revenue.
    *
    * Plan shape: one fact scan → day-grain aggregate (the calendar
    * grid is dimension-sized at any corpus size) → banded broadcast
    * self-join (14 lags per day, grid×14 rows) → day-grain aggregate.
    * The fact table is touched exactly once; at 100 TB the smoother
    * costs one day-grain shuffle and nothing else.
    */
  def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), Quantize.cents(col("value")).as("vc"))
      .groupBy(col("d"))
      .agg(sum(col("vc")).as("day_cents"))
      .localCheckpoint(eager = false) // both sides of the lag self-join
    daily
      .join(
        broadcast(daily.toDF("pd", "p_cents")),
        col("pd") <= col("d") && col("pd") >= date_sub(col("d"), 13))
      .withColumn("lag", datediff(col("d"), col("pd")))
      .withColumn("w", expr(EwmaWSql).cast("long"))
      .groupBy(col("d"))
      .agg(
        max(col("day_cents")).as("day_cents"),
        sum(col("w") * col("p_cents")).as("num"),
        sum(col("w")).as("den"))
      .select(
        col("d"), col("day_cents"),
        // num can be negative if a day's value sum is (events values
        // are non-negative here, but the convention is structural):
        // sign-split the floor division per the suite rule
        expr("CASE WHEN num < 0 THEN -((-num) div den) " +
          "ELSE num div den END").as("ewma_cents"))
      .orderBy("d")
  }

  def ewmaSmoothOracle: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) d, SUM(${Quantize.centsSql("value")}) day_cents
       |  FROM events GROUP BY 1),
       |j AS (
       |  SELECT c.d, c.day_cents, date_diff('day', p.d, c.d) lag,
       |    p.day_cents p_cents
       |  FROM daily c JOIN daily p
       |    ON p.d <= c.d AND p.d >= c.d - 13),
       |wj AS (SELECT d, day_cents, CAST($EwmaWSql AS BIGINT) w, p_cents FROM j)
       |SELECT d, CAST(MAX(day_cents) AS BIGINT) day_cents,
       |  CAST(CASE WHEN SUM(w * p_cents) < 0
       |    THEN -((-SUM(w * p_cents)) // SUM(w))
       |    ELSE SUM(w * p_cents) // SUM(w) END AS BIGINT) ewma_cents
       |FROM wj GROUP BY d ORDER BY d""".stripMargin

  /** Recency-decayed per-user activity leaderboard: every event's
    * weight is 2^(30 − age_days) relative to a fixed as-of date —
    * half-life of one day expressed in EXACT integer powers of two
    * (the float e^−λt form is not order-independent; bit-shift weights
    * sum exactly, so distributed partial sums are deterministic).
    * Top 3 users per event type by decayed score.
    *
    * Scale shape: narrow weight projection folded into one
    * (type, user) aggregate, then the rank<=3 filter plans
    * WindowGroupLimit over the 5-value type key — map-side partial
    * top-k, the `group_topk` pattern. The decay leaderboard at 100 TB
    * costs the per-key aggregate and nothing else.
    */
  def decayedTopk(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.events(spark, dir)
      .select(
        col("event_type"), col("user_id"),
        expr("shiftleft(CAST(1 AS BIGINT), " +
          "30 - datediff(DATE '2024-01-31', CAST(ts AS DATE)))").as("w"))
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("w")).as("decayed_score"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("decayed_score").desc, col("user_id"))
    scored
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .where(col("rnk") <= 3)
      .orderBy("event_type", "rnk")
  }

  def decayedTopkOracle: String =
    """WITH s AS (
      |  SELECT event_type, user_id,
      |    SUM(CAST(1 AS BIGINT) << (30 - date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')))
      |      decayed_score
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY event_type ORDER BY decayed_score DESC, user_id) rnk
      |  FROM s)
      |SELECT event_type, user_id, CAST(decayed_score AS BIGINT) decayed_score,
      |  CAST(rnk AS BIGINT) rnk
      |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin

  /** Sequence-pattern detection over per-user journeys — the
    * MATCH_RECOGNIZE / CEP shape: each user's events collapse to an
    * ordered initial-string (c/e/p/s/v per event type) and regex
    * patterns count behavioral motifs (clicks-then-purchase,
    * views-then-purchase). Deterministic: order is (ts, event_id),
    * initials are distinct per type, and both engines run greedy
    * non-overlapping matching on backreference-free patterns.
    *
    * Scale shape: ONE shuffle(user) building the sorted journey string
    * (sort_array of packed structs — in-partition sort, no window),
    * then codegen'd regex per row. Journey strings are bounded by
    * per-user activity, not corpus size; at 100 TB the pattern pass
    * costs the per-user aggregate. (True streaming CEP additionally
    * needs state timeouts — `ConnectionTimers` demonstrates that
    * machinery; this is the batch/backfill form.)
    */
  def eventPattern(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("user_id"),
        struct(
          unix_micros(col("ts")).as("us"),
          col("event_id"),
          substring(col("event_type"), 1, 1).as("i")).as("e"))
      .groupBy(col("user_id"))
      .agg(concat_ws("", sort_array(collect_list(col("e"))).getField("i"))
        .as("seq"))
      .select(
        col("user_id"),
        length(col("seq")).cast("long").as("seq_len"),
        size(expr("regexp_extract_all(seq, 'c+p', 0)")).cast("long")
          .as("n_click_buy"),
        size(expr("regexp_extract_all(seq, 'v+p', 0)")).cast("long")
          .as("n_view_buy"))
      .orderBy("user_id")

  def eventPatternOracle: String =
    """WITH j AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), ''
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(length(seq) AS BIGINT) seq_len,
      |  CAST(len(regexp_extract_all(seq, 'c+p')) AS BIGINT) n_click_buy,
      |  CAST(len(regexp_extract_all(seq, 'v+p')) AS BIGINT) n_view_buy
      |FROM j ORDER BY user_id""".stripMargin

  /** `clamped_balance`: per-supplier inventory balance where receipts
    * add, returns ('R' flag) subtract, and the balance FLOORS at
    * zero — the stateful sequential recursion (b = max(0, b + x))
    * every inventory/credit-limit pipeline runs. The trick that
    * keeps it relational: a one-sided clamp has the closed form
    * b_n = r_n − min(0, min_i r_i) over the UNCLAMPED prefix sums
    * r, so two partitioned window passes (running sum, then its
    * running min collapsed into the final aggregate) replace the
    * sequential fold — model-checked against the literal fold on
    * seeded random sequences (ClampIdentitySpec) and exact in
    * integers.
    *
    * Plan shape: one window partitioned by supplier (never
    * unpartitioned) + one hash aggregate; order within supplier is
    * total (shipdate, orderkey, linenumber) so both engines fold
    * identically. At 100 TB this is one shuffle on suppkey.
    */
  def clampedBalance(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "lineitem")
      .select(
        col("l_suppkey").as("suppkey"),
        when(col("l_returnflag") === "R",
          -col("l_quantity").cast("long"))
          .otherwise(col("l_quantity").cast("long")).as("x"),
        col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.withColumn("r", sum(col("x")).over(w))
      .groupBy("suppkey")
      .agg(
        count(lit(1)).as("n_tx"),
        sum(col("x")).as("net"),
        min(col("r")).as("low_water"))
      .select(
        col("suppkey"), col("n_tx"), col("net"),
        (col("net") - least(lit(0L), col("low_water"))).as("balance"))
      .orderBy("suppkey")
  }

  def clampedBalanceOracle: String =
    """WITH tx AS (
      |  SELECT l_suppkey suppkey,
      |    CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
      |         ELSE CAST(l_quantity AS BIGINT) END x,
      |    l_shipdate, l_orderkey, l_linenumber
      |  FROM lineitem),
      |pre AS (
      |  SELECT suppkey, x,
      |    sum(x) OVER (PARTITION BY suppkey
      |      ORDER BY l_shipdate, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) r
      |  FROM tx)
      |SELECT suppkey, CAST(count(*) AS BIGINT) n_tx,
      |  CAST(sum(x) AS BIGINT) net,
      |  CAST(sum(x) - least(0, min(r)) AS BIGINT) balance
      |FROM pre GROUP BY suppkey ORDER BY suppkey""".stripMargin

  /** `drift_cusum`: one-sided CUSUM drift detection per event type —
    * the sequential change-point monitor (Page's test) every
    * data-quality pipeline runs over daily metric series: accumulate
    * positive deviations from the series mean (minus a slack of
    * mean/20), reset at zero, flag days where the accumulation
    * crosses mean/4. The CUSUM recursion c = max(0, c + dev) is the
    * same one-sided clamp as `clamped_balance`, so it computes
    * relationally via the closed form c = r − min(0, running-min r)
    * over prefix sums — two windows partitioned by event type over
    * the DAILY aggregate (dimension-sized), never raw events. All
    * arithmetic integer cents (mean/slack by floor division).
    */
  def driftCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(
        col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(Quantize.cents(col("value"))).as("x"))
    val withMean = daily
      .join(
        daily.groupBy(col("event_type"))
          .agg(expr("sum(x) div count(1)").as("mu")),
        "event_type")
      .withColumn("dev", col("x") - col("mu") - expr("mu div 20"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withMean
      .withColumn("r", sum(col("dev")).over(w))
      .withColumn("m", min(col("r")).over(w))
      .select(
        col("event_type"), col("day"), col("x"),
        (col("r") - least(lit(0L), col("m"))).as("cusum"),
        (col("r") - least(lit(0L), col("m")) > expr("mu div 4")).as("drift"))
      .orderBy("event_type", "day")
  }

  def driftCusumOracle: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) x
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(SUM(x) AS BIGINT) // CAST(COUNT(*) AS BIGINT) mu
      |  FROM daily GROUP BY 1),
      |pre AS (
      |  SELECT d.event_type, d.day, d.x, m.mu,
      |    SUM(d.x - m.mu - m.mu // 20) OVER (PARTITION BY d.event_type
      |      ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) r
      |  FROM daily d JOIN m USING (event_type)),
      |cs AS (
      |  SELECT event_type, day, x, mu,
      |    CAST(r - least(0, min(r) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT) cusum
      |  FROM pre)
      |SELECT event_type, day, x, cusum, cusum > mu // 4 AS drift
      |FROM cs ORDER BY event_type, day""".stripMargin

  /** `twap`: time-weighted average value per (user, day) — the
    * step-function integral (TWAP/TWAB: time-weighted average price /
    * balance) the ROW-weighted aggregates can't express: each event's
    * value holds until the user's next event, the last of the day
    * holds to midnight, so twap_cents = Σ value·held_us div Σ held_us
    * with the integral window [first event, day end). Everything is
    * integer micros × integer cents (Σ held ≤ a day ⇒ the weighted
    * sum stays < 2^63 by orders of magnitude), one division at the
    * end — bit-exact against the oracle.
    *
    * Plan shape: ONE (user, day)-partitioned lead window over the
    * fact rows, then the partial+final weighted-sum aggregate on the
    * same key — co-partitioned with the window's shuffle, nothing
    * else moves. Restricted to user_id < 40 to keep the oracle row
    * count stable (the session_stats convention).
    */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .where(col("user_id") < 40)
      .select(
        col("user_id"), col("event_id"),
        to_date(col("ts")).as("d"), unix_micros(col("ts")).as("us"),
        Quantize.cents(col("value")).as("vc"))
      .withColumn(
        "day_end_us",
        unix_micros(to_timestamp(col("d"))) + 86400L * 1000000L)
      .withColumn(
        "held_us",
        coalesce(lead(col("us"), 1).over(w), col("day_end_us")) - col("us"))
      .groupBy(col("user_id"), col("d"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("held_us")).as("span_us"),
        sum(col("vc") * col("held_us")).as("wsum"))
      .select(
        col("user_id"), col("d"), col("n_events"), col("span_us"),
        expr("wsum div span_us").as("twap_cents"))
      .orderBy("user_id", "d")
  }

  def twapOracle: String =
    s"""WITH ev AS (
       |  SELECT user_id, event_id,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
       |    epoch_us(CAST(ts AS TIMESTAMP)) us,
       |    ${Quantize.centsSql("value")} vc
       |  FROM events WHERE user_id < 40),
       |held AS (
       |  SELECT user_id, d, vc,
       |    COALESCE(
       |      LEAD(us) OVER (PARTITION BY user_id, d ORDER BY us, event_id),
       |      epoch_us(CAST(d AS TIMESTAMP)) + 86400000000) - us held_us
       |  FROM ev)
       |SELECT user_id, d, CAST(COUNT(*) AS BIGINT) n_events,
       |  CAST(SUM(held_us) AS BIGINT) span_us,
       |  CAST(SUM(vc * held_us) AS BIGINT) // CAST(SUM(held_us) AS BIGINT)
       |    twap_cents
       |FROM held GROUP BY user_id, d
       |ORDER BY user_id, d""".stripMargin

  /** `seasonality_profile`: the (ISO weekday × hour-of-day) activity
    * grid — the seasonality matrix behind every traffic dashboard and
    * the input the seasonal-naive forecast (forecast_baseline) class
    * generalizes. One map-side-combinable aggregate from the fact
    * table into a fixed 7×24 grid; means are integer floor division,
    * shares are ppm against a broadcast single-row total. Weekday is
    * Spark `weekday()+1` ≡ DuckDB `isodow` (Monday=1) — pinned
    * explicitly because the engines' default `dayofweek` disagree on
    * week start.
    */
  def seasonalityProfile(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .groupBy(
        (weekday(col("ts")) + 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(Quantize.cents(col("value"))).as("sum_cents"))
    val total = grid.agg(sum(col("n_events")).as("tot"))
    grid.crossJoin(broadcast(total))
      .select(
        col("dow"), col("hr"), col("n_events"), col("sum_cents"),
        expr("sum_cents div n_events").as("mean_cents"),
        expr("n_events * 1000000 div tot").as("share_ppm"))
      .orderBy("dow", "hr")
  }

  def seasonalityProfileOracle: String =
    s"""WITH g AS (
       |  SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) dow,
       |    CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) hr,
       |    CAST(count(*) AS BIGINT) n_events,
       |    CAST(sum(${Quantize.centsSql("value")}) AS BIGINT) sum_cents
       |  FROM events GROUP BY 1, 2),
       |t AS (SELECT CAST(sum(n_events) AS BIGINT) tot FROM g)
       |SELECT dow, hr, n_events, sum_cents,
       |  sum_cents // n_events mean_cents,
       |  n_events * 1000000 // tot share_ppm
       |FROM g, t ORDER BY dow, hr""".stripMargin

  /** `conversion_lag_histogram`: the DISTRIBUTION of click→purchase
    * latency — funnel_steps reports the mean; capacity and UX
    * decisions need the shape (median vs tail). Per user: first
    * click, then first purchase strictly after it; the delay in
    * whole seconds buckets into powers of two via the integer-exact
    * bit-width idiom (no float log2). Two user-grain aggregates and
    * one co-partitioned join — the histogram itself is ~32 rows at
    * any scale.
    */
  def conversionLagHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val firstClick = ev.where(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val firstBuy = ev.where(col("event_type") === "purchase")
      .join(firstClick, "user_id")
      .where(col("us") > col("c_us"))
      .groupBy(col("user_id"), col("c_us")).agg(min(col("us")).as("p_us"))
    firstBuy
      .withColumn("lag_s", expr("(p_us - c_us) div 1000000"))
      .withColumn(
        "bucket_cap_s",
        when(col("lag_s") <= 1, lit(1L))
          .otherwise(
            call_function(
              "shiftleft", lit(1L), length(bin(col("lag_s") - 1)).cast("int"))
              .cast("long")))
      .groupBy(col("bucket_cap_s"))
      .agg(
        count(lit(1)).as("n_users"),
        min(col("lag_s")).as("min_lag_s"),
        max(col("lag_s")).as("max_lag_s"))
      .orderBy("bucket_cap_s")
  }

  def conversionLagHistogramOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events),
      |fc AS (
      |  SELECT user_id, min(us) c_us FROM ev
      |  WHERE event_type = 'click' GROUP BY 1),
      |fb AS (
      |  SELECT ev.user_id, min(us) p_us, min(c_us) c_us
      |  FROM ev JOIN fc ON ev.user_id = fc.user_id AND ev.us > fc.c_us
      |  WHERE event_type = 'purchase' GROUP BY 1),
      |lag AS (
      |  SELECT (p_us - c_us) // 1000000 lag_s FROM fb),
      |b AS (
      |  SELECT lag_s,
      |    CASE WHEN lag_s <= 1 THEN 1
      |      ELSE 1::BIGINT << length(bin(lag_s - 1)) END bucket_cap_s
      |  FROM lag)
      |SELECT bucket_cap_s, CAST(count(*) AS BIGINT) n_users,
      |  min(lag_s) min_lag_s, max(lag_s) max_lag_s
      |FROM b GROUP BY 1 ORDER BY bucket_cap_s""".stripMargin

  /** `topk_with_others`: the dashboard fold — top-2 event types per
    * nation-independent day kept by exact rank, everything else
    * collapsed into an 'other' bucket so the output stays fixed-width
    * however many categories exist. Rank runs over the (day, type)
    * grid (day-partitioned WindowGroupLimit-eligible window, never
    * fact-sized), then a conditional relabel + re-aggregate.
    */
  def topkWithOthers(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val ranked = grid.withColumn(
      "rk",
      row_number().over(
        Window.partitionBy(col("d"))
          .orderBy(col("n").desc, col("event_type"))))
    ranked
      .withColumn(
        "label",
        when(col("rk") <= 2, col("event_type")).otherwise(lit("other")))
      .groupBy(col("d"), col("label"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_types"))
      .orderBy("d", "label")
  }

  def topkWithOthersOracle: String =
    """WITH g AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) d, event_type,
      |    CAST(count(*) AS BIGINT) n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY d
      |    ORDER BY n DESC, event_type) rk
      |  FROM g),
      |l AS (
      |  SELECT d, CASE WHEN rk <= 2 THEN event_type ELSE 'other' END lbl, n
      |  FROM r)
      |SELECT d, lbl AS "label", CAST(sum(n) AS BIGINT) n_events,
      |  CAST(count(*) AS BIGINT) n_types
      |FROM l GROUP BY 1, 2 ORDER BY d, lbl""".stripMargin

  /** `new_vs_returning`: the daily acquisition-vs-retention split —
    * events on a user's first-ever active day count as "new", later
    * days as "returning"; the topline every growth dashboard leads
    * with. One min-per-user aggregate (first day), broadcast back to
    * the (user, day) grid, one day-grain rollup — the fact table
    * shuffles once.
    */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val userDays = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val firstDay = userDays.groupBy(col("user_id"))
      .agg(min(col("d")).as("first_d"))
    userDays
      .join(broadcast(firstDay), "user_id")
      .groupBy(col("d"))
      .agg(
        count(when(col("d") === col("first_d"), 1)).as("new_users"),
        count(when(col("d") =!= col("first_d"), 1)).as("returning_users"),
        sum(when(col("d") === col("first_d"), col("n"))).as("new_events"),
        sum(when(col("d") =!= col("first_d"), col("n")))
          .as("returning_events"))
      .orderBy("d")
  }

  def newVsReturningOracle: String =
    """WITH ud AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
      |    CAST(count(*) AS BIGINT) n
      |  FROM events GROUP BY 1, 2),
      |fd AS (SELECT user_id, min(d) first_d FROM ud GROUP BY 1)
      |SELECT d,
      |  CAST(count(*) FILTER (d = first_d) AS BIGINT) new_users,
      |  CAST(count(*) FILTER (d <> first_d) AS BIGINT) returning_users,
      |  CAST(sum(n) FILTER (d = first_d) AS BIGINT) new_events,
      |  CAST(sum(n) FILTER (d <> first_d) AS BIGINT) returning_events
      |FROM ud JOIN fd USING (user_id)
      |GROUP BY d ORDER BY d""".stripMargin

  /** `gini_index`: revenue-concentration (inequality) of per-user
    * purchase value — the 80/20 diagnostic behind "whales carry the
    * product" decisions, as one exact integer. With per-user cents
    * x sorted ascending and 1-based ranks i,
    * G = (2·Σ i·xᵢ) / (n·Σx) − (n+1)/n, reported as gini_ppm =
    * (2·Σ i·xᵢ·10⁶) div (n·Σx) − ((n+1)·10⁶) div n (floor per term,
    * both engines identical). Σ i·xᵢ never materializes a global
    * rank: ties share consecutive ranks, so each distinct VALUE
    * contributes x·(c·(2·R_prev + c + 1) div 2) from the value
    * histogram, where R_prev (users below the value) comes from the
    * same sharded prefix sum ks_test uses — value-bucket shards,
    * shard-partitioned windows, triangular cross-shard offsets;
    * never a global window. The only fact-sized step is the per-user
    * aggregate.
    */
  def giniIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(Quantize.cents(col("value"))).as("x"))
    val hist = perUser.groupBy(col("x")).agg(count(lit(1)).as("c"))
    val width = hist.agg(expr("max(x) div 64 + 1").as("w"))
    val sharded = hist.crossJoin(broadcast(width))
      .withColumn("shard", expr("x div w"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inShard = sharded.withColumn(
      "cum_in", coalesce(sum(col("c")).over(wIn), lit(0L)))
    val shardTotals = sharded.groupBy(col("shard"))
      .agg(sum(col("c")).as("tc"))
    val offsets = shardTotals.as("a")
      .join(
        broadcast(shardTotals.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.tc")), lit(0L)).as("off"))
    inShard
      .join(broadcast(offsets), "shard")
      .select(
        col("x"), col("c"),
        (col("off") + col("cum_in")).as("r_prev"))
      .agg(
        sum(col("c")).as("n"),
        sum(col("x") * col("c")).as("sx"),
        sum(col("x") * expr("(c * (2 * r_prev + c + 1)) div 2")).as("six"))
      .select(
        col("n"), col("sx"),
        // 2·six·10⁶ crosses 2^63 around 10⁴ users — DECIMAL(38,0)
        // for the cross-multiplied term (the linreg_trend discipline)
        (expr(
          "CAST((2 * CAST(six AS DECIMAL(38,0)) * 1000000)" +
            " div (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)") -
          expr("((n + 1) * 1000000) div n")).as("gini_ppm"))
  }

  def giniIndexOracle: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) x
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |h AS (SELECT x, CAST(count(*) AS BIGINT) c FROM pu GROUP BY 1),
      |cum AS (
      |  SELECT x, c,
      |    CAST(COALESCE(sum(c) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) r_prev
      |  FROM h),
      |agg AS (
      |  SELECT CAST(sum(c) AS BIGINT) n,
      |    CAST(sum(x * c) AS BIGINT) sx,
      |    CAST(sum(x * ((c * (2 * r_prev + c + 1)) // 2)) AS BIGINT) six
      |  FROM cum)
      |SELECT n, sx,
      |  CAST((2 * CAST(six AS HUGEINT) * 1000000)
      |    // (CAST(n AS HUGEINT) * sx) AS BIGINT)
      |    - ((n + 1) * 1000000) // n AS gini_ppm
      |FROM agg""".stripMargin

  /** `window_funnel`: time-CONSTRAINED funnel depth (the ClickHouse
    * windowFunnel shape) — how far each user progresses through
    * view → click → purchase where every step must land within ONE
    * HOUR of the previous step's completion (funnel_steps counts the
    * unconstrained ordered funnel; real campaign attribution expires
    * steps). Greedy-earliest semantics make it deterministic: each
    * stage takes the MINIMUM qualifying timestamp given the previous
    * stage's pick. Three user-grain min-aggregates chained by
    * co-partitioned joins — the fact table shuffles once per stage,
    * output is the 4-row depth histogram.
    */
  def windowFunnel(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val users = ev.select(col("user_id")).distinct()
    val v = ev.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v1"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("us") >= col("v1") && col("us") <= col("v1") + HourUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("c1"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("us") >= col("c1") && col("us") <= col("c1") + HourUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("p1"))
    users
      .join(v.select(col("user_id"), lit(1L).as("d1")), Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1L).as("d2")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1L).as("d3")), Seq("user_id"), "left")
      .select(
        (coalesce(col("d1"), lit(0L)) + coalesce(col("d2"), lit(0L)) +
          coalesce(col("d3"), lit(0L))).as("depth"))
      .groupBy(col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("depth")
  }

  def windowFunnelOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events),
      |u AS (SELECT DISTINCT user_id FROM ev),
      |v AS (
      |  SELECT user_id, min(us) v1 FROM ev
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT ev.user_id, min(us) c1
      |  FROM ev JOIN v ON ev.user_id = v.user_id
      |  WHERE event_type = 'click' AND us >= v1 AND us <= v1 + 3600000000
      |  GROUP BY 1),
      |p AS (
      |  SELECT ev.user_id, min(us) p1
      |  FROM ev JOIN c ON ev.user_id = c.user_id
      |  WHERE event_type = 'purchase' AND us >= c1 AND us <= c1 + 3600000000
      |  GROUP BY 1)
      |SELECT (CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
      |      + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT depth,
      |  CAST(count(*) AS BIGINT) n_users
      |FROM u
      |LEFT JOIN v ON u.user_id = v.user_id
      |LEFT JOIN c ON u.user_id = c.user_id
      |LEFT JOIN p ON u.user_id = p.user_id
      |GROUP BY 1 ORDER BY depth""".stripMargin

  /** `error_rate_alert`: per-(day, hour) error share with alert flags
    * — the ops-monitoring staple (SLO burn panels): error events over
    * total in integer ppm per hour cell, alert = share above a fixed
    * 25% threshold AND enough volume to matter (min 10 events — the
    * standard low-traffic false-alarm guard). One map-side-combinable
    * aggregate into the bounded 30×24 grid; flags are pure integer
    * comparisons, bit-exact across engines.
    */
  def errorRateAlert(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"), hour(col("ts")).cast("long").as("hr"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      .withColumn("err_ppm", expr("n_errors * 1000000 div n_events"))
      .withColumn(
        "alert", col("err_ppm") >= 250000L && col("n_events") >= 10L)
      .orderBy("d", "hr")
  }

  def errorRateAlertOracle: String =
    """SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
      |  CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) hr,
      |  CAST(count(*) AS BIGINT) n_events,
      |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) n_errors,
      |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
      |    * 1000000 // count(*) err_ppm,
      |  (CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
      |    * 1000000 // count(*) >= 250000 AND count(*) >= 10) alert
      |FROM events GROUP BY 1, 2 ORDER BY d, hr""".stripMargin

  /** `rfm_segments`: the classic Recency/Frequency/Monetary customer
    * segmentation — per customer, days since last order (vs a fixed
    * anchor), order count and lifetime cents, each bucketed 1..3 by
    * PINNED thresholds (not quantiles: threshold segments are what
    * marketing ops actually ship, and they stay integer-exact where
    * per-bucket quantile cuts would drag the ntile machinery in for
    * no analytical gain). Output: one row per occupied RFM cell with
    * its population and value.
    *
    * Plan shape: one fact scan → customer-grain aggregate (the only
    * shuffle) → narrow bucket projection → 27-cell aggregate. At
    * 100 TB both aggregates are map-side-combinable and nothing after
    * the first is fact-sized.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        datediff(lit("2001-09-01").cast("date"), max(to_date(col("o_orderdate"))))
          .cast("long").as("rec_days"),
        count(lit(1)).as("freq"),
        sum(Quantize.cents(col("o_totalprice"))).as("monet"))
    cust
      .select(
        when(col("rec_days") <= 180, 1L)
          .when(col("rec_days") <= 540, 2L).otherwise(3L).as("r"),
        when(col("freq") >= 15, 1L)
          .when(col("freq") >= 8, 2L).otherwise(3L).as("f"),
        when(col("monet") >= 350000000L, 1L)
          .when(col("monet") >= 150000000L, 2L).otherwise(3L).as("m"),
        col("monet"))
      .groupBy(col("r"), col("f"), col("m"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("monet")).as("sum_cents"))
      .withColumn(
        "segment",
        concat(
          col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")))
      .select("segment", "r", "f", "m", "n_customers", "sum_cents")
      .orderBy("segment")
  }

  def rfmSegmentsOracle: String =
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |    date_diff('day', CAST(max(o_orderdate) AS DATE), DATE '2001-09-01') rec_days,
       |    CAST(count(*) AS BIGINT) freq,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) monet
       |  FROM orders GROUP BY 1),
       |b AS (
       |  SELECT
       |    CASE WHEN rec_days <= 180 THEN 1 WHEN rec_days <= 540 THEN 2 ELSE 3 END r,
       |    CASE WHEN freq >= 15 THEN 1 WHEN freq >= 8 THEN 2 ELSE 3 END f,
       |    CASE WHEN monet >= 350000000 THEN 1 WHEN monet >= 150000000 THEN 2 ELSE 3 END m,
       |    monet
       |  FROM cust)
       |SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) segment,
       |  CAST(r AS BIGINT) r, CAST(f AS BIGINT) f, CAST(m AS BIGINT) m,
       |  CAST(count(*) AS BIGINT) n_customers,
       |  CAST(sum(monet) AS BIGINT) sum_cents
       |FROM b GROUP BY r, f, m ORDER BY segment""".stripMargin

  /** `autocorr_lag`: sample autocorrelation of the daily-revenue
    * series at lags 1 and 7 — the seasonality/persistence diagnostic
    * run before any forecasting model choice (a strong lag-7 ACF is
    * the weekly cycle `forecast_baseline` assumes). Integer-exact the
    * suite's way: with n = days and S = Σx over the FULL series, each
    * centered product (n·x_t − S)(n·x_{t+L} − S) is an exact
    * DECIMAL(38,0) product, numerator sums over the lag-joined pairs,
    * denominator over all days, and the ppm ratio is sign·(10⁶·|num|
    * div den) so truncation-toward-zero agrees across engines (floor
    * division diverges on negatives).
    *
    * Plan shape: one fact scan → day-grain aggregate; everything
    * after (1-row moments broadcast, day-grid self-join on day+L) is
    * calendar-sized — ~2400 rows here and bounded by elapsed days,
    * not data volume, at any scale.
    */
  def autocorrLag(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.read(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("x"))
      .localCheckpoint(eager = false) // day grid: 3 consumers below
    val mom = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("s"))
    val centered = daily.crossJoin(broadcast(mom))
      .select(
        col("day"), col("n"),
        (col("n").cast("decimal(38,0)") * col("x") - col("s")).as("c"))
    val den = centered
      .agg(sum(col("c") * col("c")).as("den"), max(col("n")).as("n_days"))
    val pairs = Seq(1, 7).map { lag =>
      val lead = centered.select(
        col("day").as("lday"), col("c").as("lc"))
      centered
        .join(lead, date_add(col("day"), lag) === col("lday"))
        .agg(
          lit(lag.toLong).as("lag"),
          count(lit(1)).as("n_pairs"),
          sum(col("c") * col("lc")).as("num"))
    }.reduce(_ unionByName _)
    pairs.crossJoin(broadcast(den))
      .select(
        col("lag"), col("n_pairs"), col("n_days"),
        (signum(col("num")).cast("long") *
          expr("CAST((1000000 * abs(num)) div den AS BIGINT)"))
          .as("acf_ppm"))
      .orderBy("lag")
  }

  def autocorrLagOracle: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |mom AS (SELECT CAST(count(*) AS HUGEINT) n, CAST(sum(x) AS HUGEINT) s FROM daily),
       |c AS (SELECT d, n, n * x - s AS c FROM daily, mom),
       |den AS (SELECT sum(c * c) den, CAST(max(n) AS BIGINT) n_days FROM c),
       |pairs AS (
       |  SELECT l.lg, CAST(count(*) AS BIGINT) n_pairs, sum(a.c * b.c) num
       |  FROM (VALUES (1), (7)) l(lg)
       |  CROSS JOIN c a
       |  JOIN c b ON b.d = a.d + l.lg
       |  GROUP BY l.lg)
       |SELECT CAST(lg AS BIGINT) lag, n_pairs, n_days,
       |  CAST(CASE WHEN num < 0 THEN -((1000000 * -num) // den)
       |       ELSE (1000000 * num) // den END AS BIGINT) acf_ppm
       |FROM pairs, den ORDER BY lag""".stripMargin

  /** The ppm-quantized Durbin–Levinson recursion, unrolled to lag 5,
    * as SQL text shared verbatim by both engines (`d` = the truncating
    * integer-division operator: Spark `div`, DuckDB `//`). Every
    * intermediate is a ppm BIGINT: products ≤ 10¹², divisions truncate
    * toward zero identically on integer operands (the holt_linear
    * verification), and the one denominator guard (0 → 1) is stated
    * in both engines. φ(k,j) columns are named p{k}{j}.
    */
  private def durbinLevinson(d: String): Seq[Seq[String]] = {
    def g(x: String) = s"(CASE WHEN ($x) = 0 THEN 1 ELSE ($x) END)"
    Seq(
      Seq("r1 AS p11"),
      Seq(
        s"(r2 - (p11 * r1) $d 1000000) * 1000000 " +
          s"$d ${g(s"1000000 - (p11 * r1) $d 1000000")} AS p22"),
      Seq(s"p11 - (p22 * p11) $d 1000000 AS p21"),
      Seq(
        s"(r3 - (p21 * r2 + p22 * r1) $d 1000000) * 1000000 " +
          s"$d ${g(s"1000000 - (p21 * r1 + p22 * r2) $d 1000000")} AS p33"),
      Seq(
        s"p21 - (p33 * p22) $d 1000000 AS p31",
        s"p22 - (p33 * p21) $d 1000000 AS p32"),
      Seq(
        s"(r4 - (p31 * r3 + p32 * r2 + p33 * r1) $d 1000000) * 1000000 " +
          s"$d ${g(s"1000000 - (p31 * r1 + p32 * r2 + p33 * r3) $d 1000000")}" +
          " AS p44"),
      Seq(
        s"p31 - (p44 * p33) $d 1000000 AS p41",
        s"p32 - (p44 * p32) $d 1000000 AS p42",
        s"p33 - (p44 * p31) $d 1000000 AS p43"),
      Seq(
        s"(r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1) $d 1000000)" +
          s" * 1000000 $d ${g(
            s"1000000 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4)" +
              s" $d 1000000")} AS p55"))
  }

  /** `pacf_lags`: the partial autocorrelation function of daily order
    * revenue at lags 1–5 — the AR-order diagnostic [[autocorrLag]]'s
    * raw ACF cannot give (ACF at lag 2 conflates direct dependence
    * with propagation through lag 1; PACF is the lag-k coefficient
    * with 1..k−1 regressed out, read off the Durbin–Levinson
    * recursion). Inputs are the EXACT integer ACF ppm values in
    * autocorr_lag's convention (global-mean centering via
    * c = n·x − S in DECIMAL(38,0), shared denominator); the recursion
    * itself is ppm-QUANTIZED — every φ(k,j) floors to a ppm BIGINT
    * before reuse — so the whole computation is integer arithmetic
    * both engines replay verbatim (the suite's answer to a float
    * recursion; the quantization error is ≤ 5 ppm per level and the
    * QUANTIZED recursion is the pinned semantics). Emits (lag,
    * acf_ppm, pacf_ppm), with pacf(1) ≡ acf(1) structural.
    *
    * Plan shape: one orders scan → day grid; 5 lag equi-joins of the
    * grid (broadcast); the recursion is a scalar chain on ONE wide
    * row. Output-bounded at any scale.
    */
  def pacfLags(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.read(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("x"))
      .localCheckpoint(eager = false) // mean + den + 5 lag joins
    val mom = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val centered = daily.crossJoin(broadcast(mom))
      .select(
        col("day"),
        (col("n").cast("decimal(38,0)") * col("x") - col("s")).as("c"))
      .localCheckpoint(eager = false)
    val den = centered.agg(sum(col("c") * col("c")).as("den"))
    // Round 11: ONE join + one (lag)-grain aggregate instead of five
    // separate join+aggregate branches — each day row probes its 5
    // lead days via an exploded lag column (day-grain × 5, trivial at
    // any scale); per-lag sums are identical, five stages fewer.
    val lead = centered.select(col("day").as("lday"), col("c").as("lc"))
    val rRows = centered
      .select(
        col("day"), col("c"),
        explode(sequence(lit(1), lit(5))).as("lag"))
      .join(lead, expr("date_add(day, lag)") === col("lday"))
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(sum(col("c") * col("lc")).as("num"))
      .crossJoin(broadcast(den))
      .select(
        col("lag"),
        (signum(col("num")).cast("long") *
          expr("CAST((1000000 * abs(num)) div den AS BIGINT)")).as("r"))
    val rCols = (1 to 5).map(k =>
      max(when(col("lag") === k, col("r"))).as(s"r$k"))
    var wide = rRows.groupBy().agg(rCols.head, rCols.tail: _*)
    durbinLevinson("div").foreach { stage =>
      wide = wide.selectExpr("*" +: stage: _*)
    }
    val out = (1 to 5).map { k =>
      wide.selectExpr(
        s"CAST($k AS BIGINT) AS lag", s"r$k AS acf_ppm",
        s"p$k$k AS pacf_ppm")
    }.reduce(_ unionByName _)
    out.orderBy("lag")
  }

  def pacfLagsOracle: String = {
    val stages = durbinLevinson("//").zipWithIndex.map { case (st, i) =>
      s"dl${i + 1} AS (SELECT *, ${st.mkString(", ")} FROM dl$i)"
    }.mkString(",\n")
    val out = (1 to 5).map(k =>
      s"SELECT CAST($k AS BIGINT) lag, r$k acf_ppm, p$k$k pacf_ppm" +
        s" FROM dl8").mkString(" UNION ALL ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |mom AS (SELECT CAST(count(*) AS HUGEINT) n,
       |  CAST(sum(x) AS HUGEINT) s FROM daily),
       |c AS (SELECT d, n * x - s AS c FROM daily, mom),
       |den AS (SELECT sum(c * c) den FROM c),
       |rr AS (
       |  SELECT l.lg, sum(a.c * b.c) num
       |  FROM (VALUES (1), (2), (3), (4), (5)) l(lg)
       |  CROSS JOIN c a
       |  JOIN c b ON b.d = a.d + l.lg
       |  GROUP BY l.lg),
       |rv AS (
       |  SELECT lg, CAST(CASE WHEN num < 0 THEN -((1000000 * -num) // den)
       |    ELSE (1000000 * num) // den END AS BIGINT) r
       |  FROM rr, den),
       |dl0 AS (
       |  SELECT ${(1 to 5).map(k =>
      s"MAX(CASE WHEN lg = $k THEN r END) r$k").mkString(", ")}
       |  FROM rv),
       |$stages
       |SELECT * FROM ($out) ORDER BY lag""".stripMargin
  }

  /** `xcorr_lags`: lead–lag cross-correlation between daily order
    * VOLUME (count) and daily order VALUE (revenue cents) at lags
    * −3..+3 — does a volume surge lead a revenue surge, the
    * two-series question autocorr/pacf ask of one series. Exact
    * integer moments in the autocorr_lag convention (c = n·x − S per
    * series, DECIMAL(38,0)); the correlation per lag is the one final
    * float 10⁶·num/√(denx·deny) — *,/,√ only, floored to ppm. The
    * shared global denominator across lags keeps the 7 rows mutually
    * comparable (a per-lag denominator would re-normalize each
    * window).
    *
    * Plan shape: one orders scan → day grid carrying both series; 7
    * lag equi-joins of the bounded grid; 1-row moments broadcast.
    * Output-bounded at any scale.
    */
  def xcorrLags(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.read(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(
        count(lit(1)).as("y"),
        sum(Quantize.cents(col("o_totalprice"))).as("x"))
      .localCheckpoint(eager = false) // moments + 7 lag joins
    val mom = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
    val centered = daily.crossJoin(broadcast(mom))
      .select(
        col("day"),
        (col("n").cast("decimal(38,0)") * col("x") - col("sx")).as("cx"),
        (col("n").cast("decimal(38,0)") * col("y") - col("sy")).as("cy"))
      .localCheckpoint(eager = false)
    val den = centered.agg(
      sum(col("cx") * col("cx")).as("denx"),
      sum(col("cy") * col("cy")).as("deny"))
    val rows = (-3 to 3).map { lag =>
      val lead = centered.select(col("day").as("lday"), col("cy").as("lcy"))
      centered
        .join(lead, date_add(col("day"), lag) === col("lday"))
        .agg(
          lit(lag.toLong).as("lag"),
          count(lit(1)).as("n_pairs"),
          sum(col("cx") * col("lcy")).as("num"))
    }.reduce(_ unionByName _)
    rows.crossJoin(broadcast(den))
      .select(
        col("lag"), col("n_pairs"),
        expr("CAST(floor(1000000.0 * CAST(num AS DOUBLE)" +
          " / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)))" +
          " AS BIGINT)").as("xcorr_ppm"))
      .orderBy("lag")
  }

  def xcorrLagsOracle: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(count(*) AS BIGINT) y,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |mom AS (SELECT CAST(count(*) AS HUGEINT) n,
       |  CAST(sum(x) AS HUGEINT) sx, CAST(sum(y) AS HUGEINT) sy
       |  FROM daily),
       |c AS (SELECT d, n * x - sx AS cx, n * y - sy AS cy FROM daily, mom),
       |den AS (SELECT sum(cx * cx) denx, sum(cy * cy) deny FROM c),
       |rows7 AS (
       |  SELECT l.lg, CAST(count(*) AS BIGINT) n_pairs,
       |    sum(a.cx * b.cy) num
       |  FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) l(lg)
       |  CROSS JOIN c a
       |  JOIN c b ON b.d = a.d + l.lg
       |  GROUP BY l.lg)
       |SELECT CAST(lg AS BIGINT) lag, n_pairs,
       |  CAST(floor(1000000.0 * CAST(num AS DOUBLE)
       |    / sqrt(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)))
       |    AS BIGINT) xcorr_ppm
       |FROM rows7, den ORDER BY lag""".stripMargin

  /** `seasonal_strength`: how much of daily revenue variance the
    * weekly cycle EXPLAINS — η² of ISO weekday on the day grid
    * (SS_between / SS_total), the effect size beside
    * [[weekdaySeasonality]]'s per-weekday index (an index can look
    * dramatic while explaining 2% of variance; η² is the go/no-go
    * for adding the seasonal term holt_winters models). Moments
    * accumulate EXACT (Σy int64, Σy² DECIMAL(38,0), per-weekday S_w
    * and n_w int64); the seven weekday cells pivot into ONE wide row
    * so the final η² = (N·Σ_w S_w²/n_w − (Σy)²)/(N·Σy² − (Σy)²) is a
    * FIXED-ORDER scalar double chain over exact operands (the anova_f
    * discipline — never a distributed float sum), floored to ppm.
    * Single row: n_days, eta2_ppm.
    *
    * Plan shape: one orders scan → day grid → 7-row weekday grid +
    * 1-row moments; scalar algebra. Scan-bound at any scale.
    */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("y"))
      .select(expr("CAST(weekday(d) + 1 AS BIGINT)").as("wd"), col("y"))
      .localCheckpoint(eager = false) // totals + weekday pivot
    val tot = days.agg(
      count(lit(1)).as("n"),
      sum(col("y")).as("s"),
      sum(col("y").cast("decimal(38,0)") * col("y")).as("q"))
    val wide = days.groupBy(col("wd"))
      .agg(count(lit(1)).as("nw"), sum(col("y")).as("sw"))
      .groupBy()
      .agg(
        max(when(col("wd") === 1, col("sw"))).as("s1"),
        max(when(col("wd") === 1, col("nw"))).as("n1"),
        max(when(col("wd") === 2, col("sw"))).as("s2"),
        max(when(col("wd") === 2, col("nw"))).as("n2"),
        max(when(col("wd") === 3, col("sw"))).as("s3"),
        max(when(col("wd") === 3, col("nw"))).as("n3"),
        max(when(col("wd") === 4, col("sw"))).as("s4"),
        max(when(col("wd") === 4, col("nw"))).as("n4"),
        max(when(col("wd") === 5, col("sw"))).as("s5"),
        max(when(col("wd") === 5, col("nw"))).as("n5"),
        max(when(col("wd") === 6, col("sw"))).as("s6"),
        max(when(col("wd") === 6, col("nw"))).as("n6"),
        max(when(col("wd") === 7, col("sw"))).as("s7"),
        max(when(col("wd") === 7, col("nw"))).as("n7"),
        count(lit(1)).as("n_wd"))
    val b = "(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE) + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE) + CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE) / CAST(n5 AS DOUBLE) + CAST(s6 AS DOUBLE) * CAST(s6 AS DOUBLE) / CAST(n6 AS DOUBLE) + CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE))"
    tot.crossJoin(broadcast(wide)) // 1-row moments: documented exception
      .select(
        col("n").as("n_days"),
        expr(s"""CAST(floor(
          (CAST(n AS DOUBLE) * $b
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * 1000000.0
          / (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)""")
          .as("eta2_ppm"))
  }

  def seasonalStrengthOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")} ) AS BIGINT) y
       |  FROM orders GROUP BY 1),
       |wg AS (SELECT isodow(d) wd, y FROM days),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) n,
       |  CAST(SUM(y) AS BIGINT) s,
       |  SUM(CAST(y AS HUGEINT) * y) q FROM wg),
       |cells AS (
       |  SELECT wd, CAST(COUNT(*) AS BIGINT) nw,
       |    CAST(SUM(y) AS BIGINT) sw
       |  FROM wg GROUP BY 1),
       |wide AS (
       |  SELECT
       |    MAX(CASE WHEN wd = 1 THEN sw END) s1,
       |    MAX(CASE WHEN wd = 1 THEN nw END) n1,
       |    MAX(CASE WHEN wd = 2 THEN sw END) s2,
       |    MAX(CASE WHEN wd = 2 THEN nw END) n2,
       |    MAX(CASE WHEN wd = 3 THEN sw END) s3,
       |    MAX(CASE WHEN wd = 3 THEN nw END) n3,
       |    MAX(CASE WHEN wd = 4 THEN sw END) s4,
       |    MAX(CASE WHEN wd = 4 THEN nw END) n4,
       |    MAX(CASE WHEN wd = 5 THEN sw END) s5,
       |    MAX(CASE WHEN wd = 5 THEN nw END) n5,
       |    MAX(CASE WHEN wd = 6 THEN sw END) s6,
       |    MAX(CASE WHEN wd = 6 THEN nw END) n6,
       |    MAX(CASE WHEN wd = 7 THEN sw END) s7,
       |    MAX(CASE WHEN wd = 7 THEN nw END) n7
       |  FROM cells)
       |SELECT n n_days,
       |  CAST(floor(
       |    (CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE) / CAST(n3 AS DOUBLE) + CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE) / CAST(n4 AS DOUBLE) + CAST(s5 AS DOUBLE) * CAST(s5 AS DOUBLE) / CAST(n5 AS DOUBLE) + CAST(s6 AS DOUBLE) * CAST(s6 AS DOUBLE) / CAST(n6 AS DOUBLE) + CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE) / CAST(n7 AS DOUBLE))
       |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) * 1000000.0
       |    / (CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
       |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)
       |    eta2_ppm
       |FROM tot, wide""".stripMargin

  /** `quantile_map`: decile-level distribution alignment between two
    * customer segments' order values — the quantile-normalization /
    * batch-effect-correction primitive: for q = 10..90, the exact
    * order statistic of each segment and the value mapping A→B at
    * that rank (shift in cents, ratio in ppm). `ks_test` answers
    * whether the distributions differ; this emits the monotone MAP
    * that would align them. Order statistics are exact rank
    * arithmetic over per-segment value histograms with SEGMENT-
    * partitioned cumulative windows (the percentile_report
    * discipline — never a global window, never a sort of the fact).
    *
    * Plan shape: one orders ⋈ broadcast customer-segment join → two
    * per-(segment, cent) histograms; windows partitioned by segment;
    * a 9-row quantile grid joined against both. Scan-bound.
    */
  def quantileMap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val SegA = "BUILDING"
    val SegB = "AUTOMOBILE"
    val seg = Tables.read(spark, dir, "customer")
      .where(col("c_mktsegment").isin(SegA, SegB))
      .select(col("c_custkey"), col("c_mktsegment").as("seg"))
    val hist = Tables.read(spark, dir, "orders")
      .select(col("o_custkey"), Quantize.cents(col("o_totalprice")).as("v"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .groupBy(col("seg"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("seg")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("hi", sum(col("cnt")).over(w))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn(
        "n", sum(col("cnt")).over(Window.partitionBy(col("seg"))))
    // decile rank r_q = (q·n + 9) div 10 hits exactly one [lo, hi] run
    def at(segName: String) = ranked
      .where(col("seg") === segName)
      .crossJoin(broadcast(
        spark.range(1, 10).select((col("id") * 10).as("q"))))
      .where(
        expr("(q * n + 90) div 100").between(col("lo"), col("hi")))
      .select(col("q"), col("v"))
    at(SegA).withColumnRenamed("v", "v_a_c")
      .join(at(SegB).withColumnRenamed("v", "v_b_c"), "q")
      .select(
        col("q"), col("v_a_c"), col("v_b_c"),
        (col("v_b_c") - col("v_a_c")).as("shift_c"),
        expr("v_b_c * 1000000 div v_a_c").as("ratio_ppm"))
      .orderBy("q")
  }

  def quantileMapOracle: String =
    s"""WITH seg AS (
       |  SELECT c_custkey, c_mktsegment seg FROM customer
       |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |h AS (
       |  SELECT seg, ${Quantize.centsSql("o_totalprice")} v,
       |    CAST(COUNT(*) AS BIGINT) cnt
       |  FROM orders JOIN seg ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT *, SUM(cnt) OVER (PARTITION BY seg ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) hi,
       |    SUM(cnt) OVER (PARTITION BY seg) n
       |  FROM h),
       |i AS (SELECT *, hi - cnt + 1 lo FROM r),
       |qs AS (SELECT q * 10 q FROM range(1, 10) t(q)),
       |a AS (
       |  SELECT q, v v_a_c FROM i, qs
       |  WHERE seg = 'BUILDING' AND (q * n + 90) // 100 BETWEEN lo AND hi),
       |bq AS (
       |  SELECT q, v v_b_c FROM i, qs
       |  WHERE seg = 'AUTOMOBILE'
       |    AND (q * n + 90) // 100 BETWEEN lo AND hi)
       |SELECT a.q, v_a_c, v_b_c, v_b_c - v_a_c shift_c,
       |  v_b_c * 1000000 // v_a_c ratio_ppm
       |FROM a JOIN bq ON a.q = bq.q ORDER BY a.q""".stripMargin

  /** `double_changepoint`: the best TWO-breakpoint segmentation of
    * daily order revenue — exhaustive minimization of pooled
    * within-segment SSE over all (t₁ < t₂) day pairs
    * (`segmented_trend` finds ONE break; regime analyses need the
    * window between two). Prefix moments Σy and Σy² accumulate EXACT
    * (int64 / DECIMAL(38,0)); the 10³¹-magnitude comparison
    * objective is one fixed double chain over those exact operands —
    * decimal→double casts and +,−,×,÷ are correctly rounded in both
    * engines, so the ARGMIN is engine-identical even though the
    * objective never materializes exactly (it stays internal; the
    * emitted break dates, segment sizes, and floored mean cents are
    * all int64). Argmin tie-breaks (t₁, t₂) ascending.
    *
    * Plan shape: one orders scan → day grid; prefix Σy and Σy² via
    * the cusum SHARDED discipline (never a global window); the
    * candidate relation is the (t₁, t₂) pair grid of the
    * CALENDAR-BOUNDED day grid (~2400² / 2 rows at ANY scale factor
    * — constant work as data grows); argmin via
    * TakeOrderedAndProject. The one scale-variant stage is the first
    * aggregate.
    */
  def doubleChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("y"))
      .select(
        col("d"), col("y"),
        (col("y").cast("decimal(38,0)") * col("y")).as("y2"))
      .withColumn("shard", expr("(year(d) * 12 + month(d)) div 4"))
      .localCheckpoint(eager = false) // in-shard windows + shard totals
    val wIn = Window.partitionBy(col("shard")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = days
      .withColumn("pre1", sum(col("y")).over(wIn))
      .withColumn("pre2", sum(col("y2")).over(wIn))
      .withColumn("rk", count(lit(1)).over(wIn))
    val shardTot = days.groupBy(col("shard"))
      .agg(
        sum(col("y")).as("t1"), sum(col("y2")).as("t2"),
        count(lit(1)).as("tc"))
    val offs = shardTot.as("a")
      .join(
        broadcast(shardTot.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(
        coalesce(sum(col("b.t1")), lit(0L).cast("decimal(38,0)"))
          .as("off1"),
        coalesce(sum(col("b.t2")), lit(0L).cast("decimal(38,0)"))
          .as("off2"),
        coalesce(sum(col("b.tc")), lit(0L)).as("offc"))
    val pref = inShard.join(broadcast(offs), "shard")
      .select(
        col("d"),
        (col("offc") + col("rk")).as("idx"),
        (col("off1") + col("pre1")).cast("decimal(38,0)").as("s1"),
        (col("off2") + col("pre2")).cast("decimal(38,0)").as("s2"))
      .localCheckpoint(eager = false) // two pair-grid readers + totals
    val tot = pref.agg(
      max(col("idx")).as("nn"), max(col("s1")).as("tt1"),
      max(col("s2")).as("tt2"))
    // spread the NLJ probe side across the full parallelism: the
    // 2400-row stream side is byte-tiny, so AQE coalesces an implicit
    // shuffle back to ONE task and the ~3M-pair evaluation runs on one
    // core (measured 7.9s); an EXPLICIT partition count survives AQE
    //
    // Round 11 (guide §1.2 per-task work): the first and third SSE
    // terms depend only on ONE pair endpoint (+ the 1-row totals), so
    // they are hoisted out of the ~3M-pair loop and computed once per
    // DAY row (2400 each) — `term1` on the t₁ side, `term3` on the t₂
    // side after attaching the totals. Only the middle term's two
    // decimal(38,0) differences remain per pair. The objective is the
    // SAME ops in the SAME left-associated order ((term1 + term2) +
    // term3), each term's internal chain textually unchanged — double
    // arithmetic is deterministic, so every obj value and the argmin
    // are bit-identical to the unhoisted form (oracle-hash re-proven).
    val p1 = pref.select(
      col("d").as("d1"), col("idx").as("i1"), col("s1").as("a1"),
      col("s2").as("a2"))
      .withColumn(
        "term1",
        expr("""CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)
               |   / CAST(i1 AS DOUBLE)""".stripMargin.replace("\n", " ")))
      .repartition(spark.sparkContext.defaultParallelism, col("d1"))
    val p2 = pref.select(
      col("d").as("d2"), col("idx").as("i2"), col("s1").as("b1"),
      col("s2").as("b2"))
      .crossJoin(broadcast(tot)) // 1-row totals: documented exception
      .withColumn(
        "term3",
        expr("""CAST(tt2 - b2 AS DOUBLE)
               |   - CAST(tt1 - b1 AS DOUBLE) * CAST(tt1 - b1 AS DOUBLE)
               |   / CAST(nn - i2 AS DOUBLE)""".stripMargin.replace("\n", " ")))
      .select(
        col("d2"), col("i2"), col("b1"), col("b2"),
        col("nn"), col("tt1"), col("term3"))
    val sse =
      """(term1
        | + (CAST(b2 - a2 AS DOUBLE)
        |   - CAST(b1 - a1 AS DOUBLE) * CAST(b1 - a1 AS DOUBLE)
        |   / CAST(i2 - i1 AS DOUBLE)))
        | + term3"""
        .stripMargin.replace("\n", " ")
    // Round 11: the argmin scans NARROW (obj, i1, i2) rows — the old
    // projection dragged two dates + five decimal(38,0)s through the
    // ~3M-row join output and TakeOrderedAndProject; the evidence
    // columns are re-attached AFTER limit(1) by two 1-row broadcast
    // lookups into `pref` (checkpointed, day-grain). Argmin key
    // (obj asc, i1, i2) unchanged, so the selected pair — and every
    // emitted value, recomputed from the same pref row — is identical.
    val winner = p1.join(broadcast(p2), col("i2") > col("i1"))
      .where(col("i2") < col("nn")) // third segment non-empty
      .select(col("i1"), col("i2"), expr(sse).as("obj"))
      .orderBy(col("obj").asc, col("i1"), col("i2"))
      .limit(1)
    val e1 = pref.select(
      col("d").as("d1"), col("idx").as("i1"), col("s1").as("a1"))
    val e2 = pref.select(
      col("d").as("d2"), col("idx").as("i2"), col("s1").as("b1"))
    e2.join(
      broadcast(e1.join(broadcast(winner), Seq("i1"))), Seq("i2"))
      .crossJoin(broadcast(tot))
      .select(
        col("d1"), col("d2"),
        col("i1").as("n1"),
        (col("i2") - col("i1")).as("n2"),
        (col("nn") - col("i2")).as("n3"),
        expr("CAST(a1 div i1 AS BIGINT)").as("mean1_c"),
        expr("CAST((b1 - a1) div (i2 - i1) AS BIGINT)").as("mean2_c"),
        expr("CAST((tt1 - b1) div (nn - i2) AS BIGINT)").as("mean3_c"))
  }

  def doubleChangepointOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) y
       |  FROM orders GROUP BY 1),
       |pref AS (
       |  SELECT d,
       |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) idx,
       |    CAST(SUM(y) OVER (ORDER BY d) AS HUGEINT) s1,
       |    SUM(CAST(y AS HUGEINT) * y) OVER (ORDER BY d) s2
       |  FROM days),
       |tot AS (SELECT MAX(idx) nn, MAX(s1) tt1, MAX(s2) tt2 FROM pref),
       |cand AS (
       |  SELECT p1.d d1, p2.d d2, p1.idx i1, p2.idx i2,
       |    p1.s1 a1, p2.s1 b1,
       |    (CAST(p1.s2 AS DOUBLE) - CAST(p1.s1 AS DOUBLE)
       |        * CAST(p1.s1 AS DOUBLE) / CAST(p1.idx AS DOUBLE))
       |      + (CAST(p2.s2 - p1.s2 AS DOUBLE)
       |        - CAST(p2.s1 - p1.s1 AS DOUBLE)
       |          * CAST(p2.s1 - p1.s1 AS DOUBLE)
       |          / CAST(p2.idx - p1.idx AS DOUBLE))
       |      + (CAST(tt2 - p2.s2 AS DOUBLE)
       |        - CAST(tt1 - p2.s1 AS DOUBLE)
       |          * CAST(tt1 - p2.s1 AS DOUBLE)
       |          / CAST(nn - p2.idx AS DOUBLE)) obj,
       |    nn, tt1
       |  FROM pref p1, pref p2, tot
       |  WHERE p2.idx > p1.idx AND p2.idx < nn)
       |SELECT d1, d2, i1 n1, i2 - i1 n2, nn - i2 n3,
       |  CAST(a1 // i1 AS BIGINT) mean1_c,
       |  CAST((b1 - a1) // (i2 - i1) AS BIGINT) mean2_c,
       |  CAST((tt1 - b1) // (nn - i2) AS BIGINT) mean3_c
       |FROM cand ORDER BY obj, i1, i2 LIMIT 1""".stripMargin

  /** `funnel_negation`: conversion WITH an exclusion constraint — of
    * the users whose first signup converts to a later purchase, how
    * many did it with ZERO error events strictly between the two
    * timestamps. Sequence-with-negation is the funnel feature
    * [[windowFunnel]] (prescribed steps) and [[conversionLatency]]
    * (time-to-convert) cannot express — "A then B with no X between"
    * is its own operator in every product-analytics engine. Greedy
    * first-conversion matching (the conversionLatency rule); the
    * negation is a per-user count of error events inside the open
    * interval, folded to the clean/contaminated split in ppm.
    *
    * Plan shape: three user-co-partitioned aggregates (first signup,
    * earliest later purchase, in-window error count via one join back)
    * — no windows, no fact self-join beyond the user-keyed pairing.
    * Single-row output at any scale.
    */
  def funnelNegation(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val su = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(su, "user_id")
      .where(col("ts") > col("s_ts"))
      .groupBy(col("user_id"), col("s_ts"))
      .agg(min(col("ts")).as("p_ts"))
      .localCheckpoint(eager = false) // error join + final fold
    val errCnt = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_ts"))
      .join(conv, "user_id")
      .where(col("e_ts") > col("s_ts") && col("e_ts") < col("p_ts"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
    conv.join(errCnt, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_converted"),
        sum(when(col("n_err").isNull, 1L).otherwise(0L)).as("n_clean"))
      .select(
        col("n_converted"), col("n_clean"),
        expr("n_clean * 1000000 div n_converted").as("clean_ppm"))
  }

  def funnelNegationOracle: String =
    """WITH su AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) s_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |conv AS (
      |  SELECT e.user_id, su.s_ts, MIN(CAST(e.ts AS TIMESTAMP)) p_ts
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND CAST(e.ts AS TIMESTAMP) > su.s_ts
      |  GROUP BY 1, 2),
      |ec AS (
      |  SELECT e.user_id, CAST(COUNT(*) AS BIGINT) n_err
      |  FROM events e JOIN conv ON e.user_id = conv.user_id
      |  WHERE e.event_type = 'error'
      |    AND CAST(e.ts AS TIMESTAMP) > conv.s_ts
      |    AND CAST(e.ts AS TIMESTAMP) < conv.p_ts
      |  GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) n_converted,
      |  CAST(SUM(CASE WHEN ec.n_err IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    n_clean,
      |  CAST(SUM(CASE WHEN ec.n_err IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1000000 // CAST(COUNT(*) AS BIGINT) clean_ppm
      |FROM conv LEFT JOIN ec ON conv.user_id = ec.user_id""".stripMargin

  /** `burst_days`: trailing-baseline burst detection over the daily
    * event count — per day with a FULL 7-day trailing window: the
    * day's count against the trailing mean as an exact ratio
    * (n·7·10⁶ div trail_sum) and the ≥3× burst verdict. The rate
    * sibling of [[cusumShift]] (location of a sustained mean shift)
    * and p_chart (proportion limits): bursts are single-day spikes a
    * CUSUM smooths over. The trailing window is a BAND SELF-JOIN of
    * the bounded day grid (b.d in [a.d−7, a.d−1]) — never a window
    * function, and calendar gaps surface as trail_days < 7 rows,
    * excluded explicitly rather than silently zero-filled.
    *
    * Plan shape: one events scan → day grid; one grid×grid band join
    * (≤7 rows per day). Output-bounded at any scale.
    */
  def burstDays(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // band self-join below
    val trail = days.select(col("d").as("td"), col("n").as("tn"))
    days
      .join(
        broadcast(trail),
        col("td") >= date_sub(col("d"), 7) && col("td") < col("d"))
      .groupBy(col("d"), col("n"))
      .agg(count(lit(1)).as("trail_days"), sum(col("tn")).as("trail_sum"))
      .where(col("trail_days") === 7)
      .select(
        col("d"), col("n"), col("trail_sum"),
        expr("n * 7 * 1000000 div trail_sum").as("ratio_ppm"))
      .withColumn("burst", col("ratio_ppm") > 3000000L)
      .orderBy("d")
  }

  def burstDaysOracle: String =
    """WITH days AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
      |    CAST(COUNT(*) AS BIGINT) n
      |  FROM events GROUP BY 1),
      |tr AS (
      |  SELECT a.d, a.n, CAST(COUNT(*) AS BIGINT) trail_days,
      |    CAST(SUM(b.n) AS BIGINT) trail_sum
      |  FROM days a JOIN days b ON b.d >= a.d - 7 AND b.d < a.d
      |  GROUP BY 1, 2)
      |SELECT d, n, trail_sum,
      |  n * 7 * 1000000 // trail_sum ratio_ppm,
      |  n * 7 * 1000000 // trail_sum > 3000000 burst
      |FROM tr WHERE trail_days = 7 ORDER BY d""".stripMargin

  /** `price_elasticity`: midpoint arc elasticity of demand along the
    * discount ladder — per adjacent discount-percent pair (d, d+1):
    * how much mean line quantity moves per percent of effective-price
    * change, ε = (Δq/q̄)/(Δp/p̄). The econ readout the revenue panels
    * (mom_growth, whale_share) stop short of: whether discounts
    * actually buy volume. Mean quantities stay EXACT rationals —
    * q = S/n is never materialized; the elasticity cross-multiplies
    * to ((S₂n₁−S₁n₂)(p₁+p₂)·10⁶) div ((p₂−p₁)(S₂n₁+S₁n₂)) with
    * p = 100−d (Δp = p₂−p₁ = −1 per rung — the round-9 StatModelSpec
    * sweep caught the earlier (p₁−p₂) form emitting −ε: demand rising
    * as price falls MUST read as the textbook's negative elasticity),
    * DECIMAL(38,0) per the overflow convention. Emits the ladder
    * itself (n, Σqty per level) beside each ε.
    *
    * Plan shape: one lineitem scan → ≤11-row discount-level grid;
    * the pair join is grid×grid. Scan-bound at any scale.
    */
  def priceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val levels = Tables.read(spark, dir, "lineitem")
      .select(
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"),
        expr("CAST(l_quantity AS BIGINT)").as("q"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .localCheckpoint(eager = false) // grid self-join
    val a = levels.select(
      col("d").as("d1"), col("n").as("n1"), col("s").as("s1"))
    val b = levels.select(
      col("d").as("d2"), col("n").as("n2"), col("s").as("s2"))
    a.join(broadcast(b), col("d2") === col("d1") + 1)
      .select(
        col("d1").as("disc_from"), col("d2").as("disc_to"),
        col("n1"), col("s1").as("qty1"), col("n2"), col("s2").as("qty2"),
        expr("""CAST(
          (CAST(s2 AS DECIMAL(38,0)) * n1 - CAST(s1 AS DECIMAL(38,0)) * n2)
            * ((100 - d1) + (100 - d2)) * 1000000
          div (((100 - d2) - (100 - d1))
            * (CAST(s2 AS DECIMAL(38,0)) * n1
              + CAST(s1 AS DECIMAL(38,0)) * n2)) AS BIGINT)""")
          .as("elasticity_ppm"))
      .orderBy("disc_from")
  }

  def priceElasticityOracle: String =
    """WITH lv AS (
      |  SELECT CAST(round(l_discount * 100) AS BIGINT) d,
      |    CAST(COUNT(*) AS BIGINT) n,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) s
      |  FROM lineitem GROUP BY 1)
      |SELECT a.d disc_from, b.d disc_to, a.n n1, a.s qty1,
      |  b.n n2, b.s qty2,
      |  CAST(
      |    (CAST(b.s AS HUGEINT) * a.n - CAST(a.s AS HUGEINT) * b.n)
      |      * ((100 - a.d) + (100 - b.d)) * 1000000
      |    // (((100 - b.d) - (100 - a.d))
      |      * (CAST(b.s AS HUGEINT) * a.n + CAST(a.s AS HUGEINT) * b.n))
      |    AS BIGINT) elasticity_ppm
      |FROM lv a JOIN lv b ON b.d = a.d + 1
      |ORDER BY disc_from""".stripMargin

  /** `mom_growth`: month-over-month revenue growth in integer ppm —
    * the first panel on any revenue dashboard. The consecutive-month
    * pairing is an equi-join on an integer month number (year·12 +
    * month), NOT a lag window: the month grid is tiny but the
    * suite-wide rule bans unpartitioned windows over any input, and
    * the equi-join form also survives gaps in the calendar without a
    * sentinel row. Growth is sign-split floor division (negatives
    * truncate toward zero identically in both engines).
    *
    * Plan shape: one fact scan → month-grain aggregate; the grid
    * self-join and ppm math are calendar-sized. First month has no
    * predecessor and drops (inner join) — stated, not accidental.
    */
  def momGrowth(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.read(spark, dir, "orders")
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("rev_cents"))
      .withColumn(
        "monthn", (year(col("month")) * 12 + month(col("month"))).cast("long"))
      .localCheckpoint(eager = false) // grid: both join sides
    monthly
      .join(
        monthly.select(
          (col("monthn") + 1).as("monthn"),
          col("rev_cents").as("prev_cents")),
        "monthn")
      .select(
        col("month"), col("rev_cents"), col("prev_cents"),
        expr("""CASE WHEN rev_cents >= prev_cents
               |  THEN ((rev_cents - prev_cents) * 1000000) div prev_cents
               |  ELSE -(((prev_cents - rev_cents) * 1000000) div prev_cents)
               |END""".stripMargin).as("growth_ppm"))
      .orderBy("month")
  }

  def momGrowthOracle: String =
    s"""WITH m AS (
       |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) mo,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) rev_cents
       |  FROM orders GROUP BY 1),
       |k AS (
       |  SELECT mo, rev_cents,
       |    CAST(year(mo) * 12 + month(mo) AS BIGINT) monthn
       |  FROM m)
       |SELECT a.mo AS "month", a.rev_cents, b.rev_cents prev_cents,
       |  CAST(CASE WHEN a.rev_cents >= b.rev_cents
       |    THEN ((a.rev_cents - b.rev_cents) * 1000000) // b.rev_cents
       |    ELSE -(((b.rev_cents - a.rev_cents) * 1000000) // b.rev_cents)
       |  END AS BIGINT) growth_ppm
       |FROM k a JOIN k b ON a.monthn = b.monthn + 1
       |ORDER BY a.mo""".stripMargin

  /** `seasonal_anomaly`: per-(day, hour) activity value vs the
    * weekday×hour seasonal expectation — the ops-monitoring layer on
    * top of [[seasonalityProfile]]'s grid: "Tuesday 14:00 was 3×
    * its usual Tuesday-14:00" is the alert that a global z-score
    * (which `stats_outliers` covers) can't express. Expected value =
    * integer mean of the cell's (dow, hr) class; deviation is
    * sign-split ppm. Top 25 by absolute deviation.
    *
    * Plan shape: one fact scan → (day, hour) grid aggregate →
    * class-profile re-aggregate of the GRID (never re-scanning
    * facts, the share_of_parent discipline) broadcast back → top-k.
    * Everything after the first aggregate is calendar-sized.
    */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.events(spark, dir)
      .groupBy(
        to_date(col("ts")).as("day"), hour(col("ts")).cast("long").as("hr"))
      .agg(sum(Quantize.cents(col("value"))).as("obs_cents"))
      .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
      .localCheckpoint(eager = false) // grid: profile + join sides
    val profile = grid.groupBy(col("dow"), col("hr"))
      .agg(sum(col("obs_cents")).as("s"), count(lit(1)).as("n"))
      .select(col("dow"), col("hr"), expr("s div n").as("exp_cents"))
    grid.join(broadcast(profile), Seq("dow", "hr"))
      .select(
        col("day"), col("hr"), col("dow"), col("obs_cents"), col("exp_cents"),
        // exp_cents = 0 -> NULL (the lsh_recall zero-guard rule):
        // impossible on value > 0 data, but an ANSI throw on a future
        // data generation would fail the whole query
        expr("""CASE WHEN exp_cents = 0 THEN CAST(NULL AS BIGINT)
               |  WHEN obs_cents >= exp_cents
               |  THEN ((obs_cents - exp_cents) * 1000000) div exp_cents
               |  ELSE -(((exp_cents - obs_cents) * 1000000) div exp_cents)
               |END""".stripMargin).as("dev_ppm"))
      .orderBy(abs(col("dev_ppm")).desc, col("day"), col("hr"))
      .limit(25)
  }

  def seasonalAnomalyOracle: String =
    s"""WITH g AS (
       |  SELECT CAST(ts AS DATE) d, CAST(hour(ts) AS BIGINT) hr,
       |    CAST(sum(${Quantize.centsSql("value")}) AS BIGINT) obs_cents
       |  FROM events GROUP BY 1, 2),
       |gd AS (SELECT d, hr, obs_cents,
       |         CAST(isodow(d) AS BIGINT) dow FROM g),
       |p AS (
       |  SELECT dow, hr, CAST(sum(obs_cents) // count(*) AS BIGINT) exp_cents
       |  FROM gd GROUP BY 1, 2)
       |SELECT d AS "day", hr, dow, obs_cents, exp_cents,
       |  CAST(CASE WHEN exp_cents = 0 THEN NULL
       |    WHEN obs_cents >= exp_cents
       |    THEN ((obs_cents - exp_cents) * 1000000) // exp_cents
       |    ELSE -(((exp_cents - obs_cents) * 1000000) // exp_cents)
       |  END AS BIGINT) dev_ppm
       |FROM gd JOIN p USING (dow, hr)
       |ORDER BY abs(dev_ppm) DESC, d, hr LIMIT 25""".stripMargin

  /** `trend_decompose`: the classical-decomposition (STL-lite) split
    * of the daily-revenue series into trend + seasonal + residual —
    * trend = centered 7-day moving average, seasonal = per-weekday
    * mean of the detrended series, residual = the anomaly signal left
    * over (what `seasonal_anomaly` thresholds on, here derived from
    * first principles). All integer with sign-split floor division.
    *
    * Plan shape: one fact scan → day-grain aggregate; the centered MA
    * comes from an explode(−3..3) equi-join of the day grid with
    * itself — NOT a window (the suite bans unpartitioned windows, and
    * the join form states the edge rule explicitly: days without a
    * full 7-day neighborhood drop). Everything after the first
    * aggregate is calendar-sized.
    */
  def trendDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.read(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("x"))
      .localCheckpoint(eager = false) // grid: three consumers
    val trend = daily
      .select(col("d"), explode(sequence(lit(-3), lit(3))).as("off"))
      .select(col("d"), expr("date_add(d, off)").as("nd"))
      .join(daily.select(col("d").as("nd"), col("x").as("nx")), "nd")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("nn"), sum(col("nx")).as("s7"))
      .where(col("nn") === 7) // full neighborhood only: the edge rule
      .select(col("d"), expr("s7 div 7").as("trend"))
    val detr = daily.join(trend, "d")
      .select(
        col("d"), col("x"), col("trend"),
        (col("x") - col("trend")).as("detr"),
        (weekday(col("d")) + 1).cast("long").as("dow"))
      .localCheckpoint(eager = false) // grid: seasonal + join-back
    val seasonal = detr.groupBy(col("dow"))
      .agg(sum(col("detr")).as("sd"), count(lit(1)).as("nd"))
      .select(
        col("dow"),
        expr("CASE WHEN sd >= 0 THEN sd div nd ELSE -((-sd) div nd) END")
          .as("seasonal"))
    detr.join(broadcast(seasonal), "dow")
      .select(
        col("d").as("day"), col("x").as("obs_cents"), col("trend"),
        col("seasonal"), (col("detr") - col("seasonal")).as("residual"))
      .orderBy("day")
  }

  def trendDecomposeOracle: String =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |tr AS (
       |  SELECT a.d, CAST(count(*) AS BIGINT) nn,
       |    CAST(sum(b.x) AS BIGINT) s7
       |  FROM daily a, unnest(range(-3, 4)) t(off)
       |  JOIN daily b ON b.d = a.d + CAST(off AS INT)
       |  GROUP BY 1),
       |tr7 AS (SELECT d, s7 // 7 trend FROM tr WHERE nn = 7),
       |detr AS (
       |  SELECT daily.d, x, trend, x - trend AS detr,
       |    CAST(isodow(daily.d) AS BIGINT) dow
       |  FROM daily JOIN tr7 ON daily.d = tr7.d),
       |seasonal AS (
       |  SELECT dow,
       |    CAST(CASE WHEN sum(detr) >= 0 THEN sum(detr) // count(*)
       |      ELSE -((-sum(detr)) // count(*)) END AS BIGINT) seasonal
       |  FROM detr GROUP BY 1)
       |SELECT d AS "day", x obs_cents, trend, seasonal,
       |  detr - seasonal AS residual
       |FROM detr JOIN seasonal USING (dow)
       |ORDER BY "day"""".stripMargin

  /** `whale_share`: revenue concentration in the top 1% of customers —
    * the "whale" metric every subscription/commerce business tracks
    * beside [[giniIndex]]'s full-curve summary: k = max(n/100, 1)
    * top customers by lifetime cents, their exact revenue share in
    * ppm, and the entry threshold. k derives from a driver-side count
    * (the bom_rollup depth-bound rule: one scalar action fixes the
    * plan, no per-row dependence), ties broken by customer key so the
    * top set is exact.
    *
    * Plan shape: fact scan → customer-grain aggregate →
    * TakeOrderedAndProject(k) — per-partition heap + driver merge of
    * k rows, never a global sort — plus one 1-row total. At 100 TB k
    * is still customers/100: the heap path is exactly how you'd
    * compute it there.
    */
  def whaleShare(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("monet"))
      .localCheckpoint(eager = false) // count + top-k + total
    val n = cust.count()
    val k = math.max(n / 100, 1L).toInt
    val top = cust.orderBy(col("monet").desc, col("o_custkey")).limit(k)
      .agg(
        count(lit(1)).as("k"),
        sum(col("monet")).as("topk_cents"),
        min(col("monet")).as("threshold_cents"))
    val tot = cust.agg(
      count(lit(1)).as("n_customers"), sum(col("monet")).as("total_cents"))
    top.crossJoin(broadcast(tot))
      .select(
        col("n_customers"), col("k"), col("threshold_cents"),
        col("topk_cents"), col("total_cents"),
        expr("topk_cents * 1000000 div total_cents").as("share_ppm"))
  }

  def whaleShareOracle: String =
    s"""WITH cust AS (
       |  SELECT o_custkey, CAST(sum(${Quantize.centsSql("o_totalprice")}) AS BIGINT) monet
       |  FROM orders GROUP BY 1),
       |r AS (
       |  SELECT monet,
       |    ROW_NUMBER() OVER (ORDER BY monet DESC, o_custkey) rn
       |  FROM cust),
       |kk AS (SELECT greatest(count(*) // 100, 1) k FROM cust),
       |top AS (
       |  SELECT CAST(count(*) AS BIGINT) k,
       |    CAST(sum(monet) AS BIGINT) topk_cents,
       |    CAST(min(monet) AS BIGINT) threshold_cents
       |  FROM r, kk WHERE rn <= kk.k),
       |tot AS (
       |  SELECT CAST(count(*) AS BIGINT) n_customers,
       |    CAST(sum(monet) AS BIGINT) total_cents
       |  FROM cust)
       |SELECT n_customers, k, threshold_cents, topk_cents, total_cents,
       |  topk_cents * 1000000 // total_cents share_ppm
       |FROM top, tot""".stripMargin

  /** `ohlc_bars`: daily open/high/low/close/volume bars over the event
    * value stream — the candlestick resample every market-data and
    * metrics pipeline runs. High/low/volume are one map-side-combinable
    * day aggregate. Open/close need "value AT the boundary instant",
    * which a naive arg_min is not deterministic about under timestamp
    * ties — so the boundary is made tie-proof structurally: the day
    * aggregate also yields min/max event-time, and two joins back onto
    * the fact stream at exactly those instants take min(cents) at the
    * open and max(cents) at the close (the stated tie rule). The
    * join-back side is the ~365-row day grid, broadcast — the fact
    * stream never shuffles, and each join-back probe prunes to rows at
    * one instant per day.
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(
        to_date(col("ts")).as("d"), unix_micros(col("ts")).as("us"),
        Quantize.cents(col("value")).as("vc"))
    val g = ev.groupBy(col("d"))
      .agg(
        count(lit(1)).as("n_trades"),
        min(col("us")).as("open_us"), max(col("us")).as("close_us"),
        max(col("vc")).as("high_c"), min(col("vc")).as("low_c"),
        sum(col("vc")).as("volume_c"))
    val openV = ev
      .join(broadcast(g.select(col("d"), col("open_us"))), Seq("d"))
      .where(col("us") === col("open_us"))
      .groupBy(col("d")).agg(min(col("vc")).as("open_c"))
    val closeV = ev
      .join(broadcast(g.select(col("d"), col("close_us"))), Seq("d"))
      .where(col("us") === col("close_us"))
      .groupBy(col("d")).agg(max(col("vc")).as("close_c"))
    g.join(openV, Seq("d")).join(closeV, Seq("d"))
      .select(
        col("d"), col("n_trades"), col("open_c"), col("high_c"),
        col("low_c"), col("close_c"), col("volume_c"))
      .orderBy("d")
  }

  def ohlcBarsOracle: String =
    s"""WITH ev AS (
       |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
       |    epoch_us(CAST(ts AS TIMESTAMP)) us,
       |    ${Quantize.centsSql("value")} vc
       |  FROM events),
       |g AS (
       |  SELECT d, CAST(count(*) AS BIGINT) n_trades,
       |    min(us) open_us, max(us) close_us,
       |    max(vc) high_c, min(vc) low_c, CAST(sum(vc) AS BIGINT) volume_c
       |  FROM ev GROUP BY d),
       |o AS (
       |  SELECT ev.d, min(vc) open_c FROM ev
       |  JOIN g ON ev.d = g.d AND ev.us = g.open_us GROUP BY ev.d),
       |c AS (
       |  SELECT ev.d, max(vc) close_c FROM ev
       |  JOIN g ON ev.d = g.d AND ev.us = g.close_us GROUP BY ev.d)
       |SELECT g.d, n_trades, open_c, high_c, low_c, close_c, volume_c
       |FROM g JOIN o ON g.d = o.d JOIN c ON g.d = c.d
       |ORDER BY g.d""".stripMargin

  /** 24h attribution lookback in micros (shared with `attribution`'s
    * last-touch tolerance) — also the band width of the range join.
    */
  private val TouchWindowUs = 86400000000L

  /** `multi_touch`: LINEAR multi-touch attribution — every purchase
    * splits its revenue EQUALLY across all click/view touches by the
    * same user in the 24h before it (last-touch `attribution`'s
    * sibling; the two bracket the credit-assignment space). Exactness
    * is the design: credit = val div k cents per touch with the
    * remainder assigned to the MOST RECENT touch (ties by touch id),
    * so per-channel credits + the unattributed bucket sum to total
    * purchase revenue TO THE CENT — and the emitted `zz_total` row
    * computes that total INDEPENDENTLY from the purchase relation, so
    * the conservation law is hash-checked, not asserted.
    *
    * Plan shape: the purchase×touch pairing is the `range_join`
    * banding discipline — equi-join on (user, 24h slot) with the
    * purchase side exploded ×2, time residual inside the band; never
    * a theta join. k and the remainder rank are windows over
    * purchase event_id (high cardinality, even spread). Unattributed
    * purchases arrive via left-anti against the credited ids (a left
    * join on the exploded band side would double-count its
    * null-extensions).
    */
  def multiTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        Quantize.cents(col("value")).as("val_c"))
    val touches = ev.where(col("event_type").isin("click", "view"))
      .groupBy(col("user_id").as("tu"), unix_micros(col("ts")).as("tus"))
      .agg(max(col("event_id")).as("tid"), max(col("event_type")).as("ttype"))
      .withColumn("tslot", expr(s"tus div $TouchWindowUs"))
    val banded = purchases
      .select(
        col("*"),
        explode(array(
          expr(s"us div $TouchWindowUs"),
          expr(s"us div $TouchWindowUs - 1"))).as("slot"))
      .join(
        touches,
        col("user_id") === col("tu") && col("slot") === col("tslot") &&
          col("tus") <= col("us") &&
          col("us") - col("tus") <= TouchWindowUs)
    val wk = Window.partitionBy(col("event_id"))
    val wr = Window.partitionBy(col("event_id"))
      .orderBy(col("tus").desc, col("tid").desc)
    val credits = banded
      .withColumn("k", count(lit(1)).over(wk))
      .withColumn("rn", row_number().over(wr))
      .select(
        col("ttype").as("channel"),
        (expr("val_c div k") +
          when(col("rn") === 1, expr("val_c % k")).otherwise(lit(0L)))
          .as("credit_c"),
        col("event_id"))
    val channelRows = credits.groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"), sum(col("credit_c")).as("credit_c"))
    val unattributed = purchases
      .join(
        credits.select(col("event_id")).distinct(),
        Seq("event_id"), "left_anti")
      .agg(count(lit(1)).as("n_credits"), sum(col("val_c")).as("credit_c"))
      .select(lit("unattributed").as("channel"), col("n_credits"),
        coalesce(col("credit_c"), lit(0L)).as("credit_c"))
    val total = purchases
      .agg(count(lit(1)).as("n_credits"), sum(col("val_c")).as("credit_c"))
      .select(lit("zz_total").as("channel"), col("n_credits"),
        col("credit_c"))
    channelRows.unionByName(unattributed).unionByName(total)
      .orderBy("channel")
  }

  def multiTouchOracle: String =
    s"""WITH p AS (
       |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) us,
       |         CAST(round(value * 100) AS BIGINT) val_c
       |  FROM events WHERE event_type = 'purchase'),
       |t AS (
       |  SELECT user_id tu, epoch_us(CAST(ts AS TIMESTAMP)) tus,
       |         max(event_id) tid, max(event_type) ttype
       |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
       |b AS (
       |  SELECT p.event_id, p.val_c, t.ttype, t.tus, t.tid
       |  FROM p JOIN t ON p.user_id = t.tu AND t.tus <= p.us
       |    AND p.us - t.tus <= $TouchWindowUs),
       |c AS (
       |  SELECT ttype channel, event_id,
       |    val_c // (COUNT(*) OVER (PARTITION BY event_id)) +
       |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_id
       |        ORDER BY tus DESC, tid DESC) = 1
       |      THEN val_c % (COUNT(*) OVER (PARTITION BY event_id))
       |      ELSE 0 END credit_c
       |  FROM b)
       |SELECT channel, CAST(count(*) AS BIGINT) n_credits,
       |  CAST(sum(credit_c) AS BIGINT) credit_c
       |FROM c GROUP BY 1
       |UNION ALL
       |SELECT 'unattributed', CAST(count(*) AS BIGINT),
       |  CAST(coalesce(sum(val_c), 0) AS BIGINT)
       |FROM p WHERE event_id NOT IN (SELECT DISTINCT event_id FROM c)
       |UNION ALL
       |SELECT 'zz_total', CAST(count(*) AS BIGINT),
       |  CAST(sum(val_c) AS BIGINT) FROM p
       |ORDER BY channel""".stripMargin

  /** `cusum_shift`: changepoint LOCALIZATION over the daily revenue
    * series — the max-|CUSUM| estimator: with per-day cents xᵢ
    * (1-based day rank t, n days, T = Σx), Sₜ = n·prefixₜ − t·T is
    * n·Σᵢ≤ₜ(xᵢ − x̄) kept EXACT by cross-multiplying the mean away;
    * the day maximizing |Sₜ| is the classic single-shift estimate,
    * and the top-10 days by |Sₜ| show the plateau around it (a sharp
    * peak ⇒ one clean level shift, a flat top ⇒ drift). The
    * retrospective LOCALIZER beside [[driftCusum]]'s sequential
    * Page's-test monitor — drift_cusum answers "is this metric
    * drifting NOW" with a reset-at-zero accumulator, this answers
    * "WHERE did the level shift" with a global max; the same pairing
    * as `ks_test`'s max-gap statistic, on the calendar axis.
    * Integer bound: n·T must fit int64 — at 10⁴ days
    * that is T ≲ 9·10¹⁴ cents; past that, rescale x by a common
    * power of two (argmax is invariant).
    *
    * Plan shape: one fact aggregate to day grain (the only
    * fact-sized step), then the gini/ks sharded prefix sum over the
    * ~2.4k-day relation — day-bucket shards, shard-partitioned
    * windows for in-shard prefix sum AND rank, triangular broadcast
    * cross-shard offsets; never a global window. Top-10 via
    * TakeOrderedAndProject.
    */
  /** `p_chart`: the attribute control chart completing the SPC triad
    * (cusum_shift LOCALIZES a mean shift, ewma_smooth SMOOTHS the
    * series, this draws the Shewhart alarm limits an on-call actually
    * watches): per day, the error-event share against 3σ binomial
    * control limits around the overall rate — UCL/LCL = p̄ ±
    * 3·√(p̄(1−p̄)/n_t), per-day limits because daily volume varies.
    * Counts and p̄ are exact integers; the one √ evaluates the
    * textually-identical IEEE expression over identical int64
    * operands and floors to ppm (the corr_stats final-float
    * convention), so the limits — and the out-of-control verdicts —
    * hash-pin. LCL clamps at 0 (the binomial's truncation at small
    * n), UCL at 10⁶.
    *
    * Plan: one events scan → day grid with n and errors in one
    * aggregate, overall rate as a 1-row broadcast, per-day limit
    * arithmetic. Zero joins past the grid.
    */
  def pChart(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(
        to_date(col("ts")).as("d"),
        (col("event_type") === "error").cast("long").as("e"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("e")).as("n_err"))
      .localCheckpoint(eager = false) // overall fold + per-day limits
    val overall = days.agg(
      sum(col("n")).as("nt"), sum(col("n_err")).as("et"))
    val lim = "3.0 * sqrt(CAST(pbar AS DOUBLE) * (1000000.0 - pbar) / n)"
    days
      .crossJoin(broadcast(overall)) // 1-row totals: documented exception
      .withColumn("pbar", expr("et * 1000000 div nt"))
      .select(
        col("d"), col("n"), col("n_err"),
        expr("n_err * 1000000 div n").as("p_ppm"),
        col("pbar").as("pbar_ppm"),
        expr(s"least(CAST(1000000 AS BIGINT), pbar + CAST(floor($lim) AS BIGINT))")
          .as("ucl_ppm"),
        expr(s"greatest(CAST(0 AS BIGINT), pbar - CAST(floor($lim) AS BIGINT))")
          .as("lcl_ppm"))
      .withColumn(
        "out_of_control",
        col("p_ppm") > col("ucl_ppm") || col("p_ppm") < col("lcl_ppm"))
      .orderBy("d")
  }

  def pChartOracle: String = {
    val lim = "3.0 * sqrt(CAST(pbar AS DOUBLE) * (1000000.0 - pbar) / n)"
    s"""WITH dg AS (
       |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
       |    CAST(COUNT(*) AS BIGINT) n,
       |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS BIGINT) n_err
       |  FROM events GROUP BY 1),
       |ov AS (SELECT CAST(SUM(n) AS BIGINT) nt,
       |  CAST(SUM(n_err) AS BIGINT) et FROM dg),
       |pb AS (
       |  SELECT d, n, n_err, et * 1000000 // nt pbar
       |  FROM dg CROSS JOIN ov),
       |lims AS (
       |  SELECT d, n, n_err,
       |    n_err * 1000000 // n p_ppm,
       |    pbar pbar_ppm,
       |    least(CAST(1000000 AS BIGINT),
       |      pbar + CAST(floor($lim) AS BIGINT)) ucl_ppm,
       |    greatest(CAST(0 AS BIGINT),
       |      pbar - CAST(floor($lim) AS BIGINT)) lcl_ppm
       |  FROM pb)
       |SELECT d, n, n_err, p_ppm, pbar_ppm, ucl_ppm, lcl_ppm,
       |  p_ppm > ucl_ppm OR p_ppm < lcl_ppm AS out_of_control
       |FROM lims ORDER BY d""".stripMargin
  }

  def cusumShift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("x"))
    val totals = days.agg(
      count(lit(1)).as("n"), sum(col("x")).as("t_sum"))
    val sharded = days
      .withColumn("shard", expr("(year(d) * 12 + month(d)) div 4"))
      .localCheckpoint(eager = false) // in-shard window + shard totals
    val wIn = Window.partitionBy(col("shard")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = sharded
      .withColumn("pre_in", sum(col("x")).over(wIn))
      .withColumn("rk_in", count(lit(1)).over(wIn))
    val shardTotals = sharded.groupBy(col("shard"))
      .agg(sum(col("x")).as("tx"), count(lit(1)).as("tc"))
    val offsets = shardTotals.as("a")
      .join(
        broadcast(shardTotals.as("b")), col("b.shard") < col("a.shard"),
        "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(
        coalesce(sum(col("b.tx")), lit(0L)).as("offx"),
        coalesce(sum(col("b.tc")), lit(0L)).as("offc"))
    inShard
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(totals))
      .select(
        col("d"), col("x").as("x_cents"),
        (col("n") * (col("offx") + col("pre_in")) -
          (col("offc") + col("rk_in")) * col("t_sum")).as("s_scaled"))
      .orderBy(abs(col("s_scaled")).desc, col("d"))
      .limit(10)
  }

  def cusumShiftOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) n,
       |    CAST(SUM(x) AS BIGINT) t_sum FROM days),
       |pre AS (SELECT d, x,
       |    CAST(SUM(x) OVER (ORDER BY d) AS BIGINT) pr,
       |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) rk
       |  FROM days)
       |SELECT d, x AS x_cents, n * pr - rk * t_sum AS s_scaled
       |FROM pre, tot
       |ORDER BY abs(n * pr - rk * t_sum) DESC, d LIMIT 10""".stripMargin

  /** `max_drawdown`: the peak-to-date decline of cumulative daily
    * order revenue — the SPC family's magnitude counterpart
    * ([[cusumShift]] LOCATES a mean shift; drawdown prices the worst
    * sustained slump in the unit the business reads, cents off the
    * running peak). Per day: S_t (cumulative cents), the running peak
    * max_{s≤t} S_s, and dd_t = peak − S_t; top-10 days by drawdown
    * (earliest day breaks ties). All integer cents.
    *
    * Both prefixes — the running SUM and the running MAX — use the
    * gini/cusum sharded discipline (never a global window): in-shard
    * windows partitioned by the month-quarter shard, plus triangular
    * broadcast offsets. The prefix-max offset needs one extra rung:
    * shard b's peak contribution is offx_b + maxpre_b (its start
    * offset plus its in-shard max prefix), so offsets compose in two
    * triangular steps (sum first, then max over the summed peaks).
    * COALESCE(offmax, 0) is exact because revenue cents are positive:
    * every in-shard prefix already exceeds 0.
    *
    * Plan shape: one orders scan → day grid; two grid-sized window
    * passes + two broadcast triangular joins over ~shard-count rows;
    * top-10 via TakeOrderedAndProject. At 100 TB only the first
    * aggregate sees fact rows.
    */
  def maxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("x"))
      .withColumn("shard", expr("(year(d) * 12 + month(d)) div 4"))
      .localCheckpoint(eager = false) // in-shard windows + shard totals
    val wIn = Window.partitionBy(col("shard")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inShard = days
      .withColumn("pre_in", sum(col("x")).over(wIn))
      .withColumn("mx_in", max(col("pre_in")).over(wIn))
      .localCheckpoint(eager = false) // reused by shard peak fold
    val shardAgg = inShard.groupBy(col("shard"))
      .agg(sum(col("x")).as("tx"), max(col("pre_in")).as("maxpre"))
    val offx = shardAgg.as("a")
      .join(broadcast(shardAgg.as("b")), col("b.shard") < col("a.shard"),
        "left")
      .groupBy(col("a.shard").as("shard"), col("a.maxpre").as("maxpre"))
      .agg(coalesce(sum(col("b.tx")), lit(0L)).as("offx"))
    val offmax = offx.as("a")
      .join(broadcast(offx.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"), col("a.offx").as("offx"))
      .agg(max(col("b.offx") + col("b.maxpre")).as("offmax"))
    inShard
      .join(broadcast(offmax), "shard")
      .select(
        col("d"), col("x").as("x_cents"),
        (col("offx") + col("pre_in")).as("s_cents"),
        greatest(coalesce(col("offmax"), lit(0L)),
          col("offx") + col("mx_in")).as("peak_cents"))
      .withColumn("dd_cents", col("peak_cents") - col("s_cents"))
      .orderBy(col("dd_cents").desc, col("d"))
      .limit(10)
  }

  def maxDrawdownOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |pre AS (SELECT d, x,
       |    CAST(SUM(x) OVER (ORDER BY d) AS BIGINT) s_cents
       |  FROM days),
       |pk AS (SELECT d, x, s_cents,
       |    CAST(MAX(s_cents) OVER (ORDER BY d) AS BIGINT) peak_cents
       |  FROM pre)
       |SELECT d, x AS x_cents, s_cents, peak_cents,
       |  peak_cents - s_cents AS dd_cents
       |FROM pk ORDER BY dd_cents DESC, d LIMIT 10""".stripMargin

  /** `top_journeys`: the most common user journeys — each user's
    * first 8 event types in arrival order joined into one path
    * string, counted across users, top-10 (count desc, path asc).
    * The funnel family's free-form complement: `window_funnel`
    * matches ONE prescribed sequence, `markov_next` keeps only
    * one-step transitions; this surfaces which full paths actually
    * dominate — the question a growth team asks before prescribing
    * any funnel. Arrival order is (ts, event_id) — event_id breaks
    * same-micro ties deterministically.
    *
    * Plan shape: one user-PARTITIONED window (never global) for the
    * first-8 cut, one per-user aggregate building the bounded path
    * string (array_sort on (rn, type) structs — order independent of
    * shuffle arrival), one count aggregate over journey strings;
    * top-10 via TakeOrderedAndProject. Journey cardinality is
    * bounded by |event_types|⁸, but the count aggregate is map-side
    * combinable so even the long tail never concentrates.
    */
  def topJourneys(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 8)
      .groupBy(col("user_id"))
      .agg(
        concat_ws(
          ">",
          transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            s => s.getField("event_type"))).as("journey"))
      .groupBy(col("journey"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("journey"))
      .limit(10)
  }

  def topJourneysOracle: String =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (
      |      PARTITION BY user_id
      |      ORDER BY CAST(ts AS TIMESTAMP), event_id) rn
      |  FROM events),
      |j AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) journey
      |  FROM r WHERE rn <= 8 GROUP BY user_id)
      |SELECT journey, CAST(COUNT(*) AS BIGINT) n_users
      |FROM j GROUP BY 1 ORDER BY n_users DESC, journey LIMIT 10"""
      .stripMargin

  /** `weekday_seasonality`: the measured weekly rhythm of order
    * revenue — per ISO weekday (1=Mon): day count, revenue, share,
    * and the seasonal INDEX (that weekday's mean daily revenue over
    * the all-days mean, ppm; 10⁶ = flat). This is the direct
    * measurement behind what holt_winters MODELS with its seven
    * seasonal states — the pair gives both the fitted and the
    * empirical answer to "is there a weekly cycle". The index
    * cross-multiply (revenue·days·10⁶) crosses 2^63 past ~10¹³
    * cents — DECIMAL(38,0), the suite's overflow convention.
    *
    * Plan shape: one orders scan → day grid → 7-row weekday grid;
    * totals are a 1-row broadcast. Output-bounded at any scale.
    */
  def weekdaySeasonality(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("x"))
      .select(expr("CAST(weekday(d) + 1 AS BIGINT)").as("wd"), col("x"))
      .groupBy(col("wd"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("rev_c"))
      .localCheckpoint(eager = false) // totals fold + per-row index
    val tot = days.agg(
      sum(col("n_days")).as("nd_all"), sum(col("rev_c")).as("rev_all"))
    days.crossJoin(broadcast(tot)) // 1-row totals: documented exception
      .select(
        col("wd"), col("n_days"), col("rev_c"),
        expr("CAST(CAST(rev_c AS DECIMAL(38,0)) * 1000000"
          + " div rev_all AS BIGINT)").as("share_ppm"),
        expr("CAST(CAST(rev_c AS DECIMAL(38,0)) * nd_all * 1000000"
          + " div (CAST(rev_all AS DECIMAL(38,0)) * n_days) AS BIGINT)")
          .as("index_ppm"))
      .orderBy("wd")
  }

  def weekdaySeasonalityOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |wg AS (
       |  SELECT isodow(d) wd, CAST(COUNT(*) AS BIGINT) n_days,
       |    CAST(SUM(x) AS BIGINT) rev_c
       |  FROM days GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_days) AS BIGINT) nd_all,
       |  CAST(SUM(rev_c) AS BIGINT) rev_all FROM wg)
       |SELECT wd, n_days, rev_c,
       |  CAST(CAST(rev_c AS HUGEINT) * 1000000 // rev_all AS BIGINT)
       |    share_ppm,
       |  CAST(CAST(rev_c AS HUGEINT) * nd_all * 1000000
       |    // (CAST(rev_all AS HUGEINT) * n_days) AS BIGINT) index_ppm
       |FROM wg, tot ORDER BY wd""".stripMargin

  /** `mase_eval`: MASE (mean absolute scaled error) of the naive
    * last-value forecaster on daily order revenue, scaled by the
    * seasonal-naive(7) baseline — the forecast-accuracy gate the
    * smoothing family ([[SqlSurface.holtLinear]], holt_winters) emits
    * predictions into but nothing graded: MASE < 1 ⇔ carrying
    * yesterday beats carrying last week, the standard scale-free
    * verdict (Hyndman & Koehler 2006). Errors are exact integer
    * cents; day pairs come from DATE-ARITHMETIC JOINS (d−1, d−7) so
    * calendar gaps drop out identically in both engines — no window,
    * no gap-fill; the one float is the final scalar ratio
    * (sae1·n7)/(sae7·n1), *,/ only.
    *
    * Plan shape: one orders scan → day grid; two broadcast self-joins
    * of the bounded grid; single-row output. Scale-invariant past the
    * first aggregate.
    */
  def maseEval(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("x"))
      .localCheckpoint(eager = false) // three readers below
    def scaledErr(lagDays: Int) = days.as("a")
      .join(
        broadcast(days.as("b")),
        col("b.d") === date_sub(col("a.d"), lagDays))
      .agg(
        count(lit(1)).as(s"n$lagDays"),
        sum(abs(col("a.x") - col("b.x"))).as(s"sae$lagDays"))
    scaledErr(1).crossJoin(broadcast(scaledErr(7)))
      .select(
        col("n1"), col("sae1").as("sae1_c"),
        col("n7"), col("sae7").as("sae7_c"),
        expr("CAST(sae1 AS DOUBLE) * n7 / (CAST(sae7 AS DOUBLE) * n1)")
          .as("mase"))
  }

  def maseEvalOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |e1 AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n1,
       |    CAST(SUM(abs(a.x - b.x)) AS BIGINT) sae1
       |  FROM days a JOIN days b ON b.d = a.d - 1),
       |e7 AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n7,
       |    CAST(SUM(abs(a.x - b.x)) AS BIGINT) sae7
       |  FROM days a JOIN days b ON b.d = a.d - 7)
       |SELECT n1, sae1 AS sae1_c, n7, sae7 AS sae7_c,
       |  CAST(sae1 AS DOUBLE) * n7 / (CAST(sae7 AS DOUBLE) * n1) AS mase
       |FROM e1, e7""".stripMargin

  /** `conversion_latency`: the signup→purchase time-to-convert
    * distribution — the product metric funnels stop short of: per
    * user, the gap from FIRST signup to the EARLIEST purchase after
    * it (greedy first-conversion, the seq_support3 matching rule),
    * floored to whole minutes; reported as the EXACT p50 / p90 of
    * that latency plus the conversion rate in ppm. Percentiles are
    * order statistics over a minute-grain value HISTOGRAM (the
    * exact_median discipline: rank arithmetic, never a global sort),
    * with cumulative ranks from the gini/cusum sharded prefix sum —
    * shard-partitioned windows + triangular broadcast offsets, no
    * global window. p-th percentile = smallest minute whose
    * cumulative count satisfies cum·100 ≥ n·p (pure integer).
    *
    * Plan shape: two fact-grain aggregates (per-user first signup;
    * per-user earliest later purchase — co-partitioned on user), then
    * everything is histogram-sized. At 100 TB the histogram is
    * bounded by the latency DOMAIN (distinct minutes), not users.
    */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val su = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      .localCheckpoint(eager = false) // join + signup count
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
      .join(su, "user_id")
      .where(col("ts") > col("s_ts"))
      .groupBy(col("user_id"), col("s_ts"))
      .agg(min(col("ts")).as("p_ts"))
      .select(expr(
        "(unix_micros(p_ts) - unix_micros(s_ts)) div 60000000")
        .as("lat_min"))
    val hist = conv.groupBy(col("lat_min")).agg(count(lit(1)).as("c"))
      .withColumn("shard", expr("lat_min div 1024"))
      .localCheckpoint(eager = false) // window + shard totals
    val wIn = Window.partitionBy(col("shard")).orderBy(col("lat_min"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shardTot = hist.groupBy(col("shard")).agg(sum(col("c")).as("tc"))
    val offsets = shardTot.as("a")
      .join(
        broadcast(shardTot.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.tc")), lit(0L)).as("off"))
    val ranked = hist
      .withColumn("cum_in", sum(col("c")).over(wIn))
      .join(broadcast(offsets), "shard")
      .select(col("lat_min"), (col("off") + col("cum_in")).as("cum"))
    val nConv = conv.agg(count(lit(1)).as("n_conv"))
    val nSign = su.agg(count(lit(1)).as("n_signups"))
    ranked
      .crossJoin(broadcast(nConv))
      .agg(
        min(when(col("cum") * 100 >= col("n_conv") * 50, col("lat_min")))
          .as("p50_min"),
        min(when(col("cum") * 100 >= col("n_conv") * 90, col("lat_min")))
          .as("p90_min"))
      .crossJoin(broadcast(nConv))
      .crossJoin(broadcast(nSign))
      .select(
        col("n_signups"), col("n_conv"),
        expr("n_conv * 1000000 div n_signups").as("conversion_ppm"),
        col("p50_min"), col("p90_min"))
  }

  def conversionLatencyOracle: String =
    """WITH su AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) s_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |conv AS (
      |  SELECT e.user_id,
      |    (epoch_us(MIN(CAST(e.ts AS TIMESTAMP))) - epoch_us(su.s_ts))
      |      // 60000000 lat_min
      |  FROM events e JOIN su ON e.user_id = su.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > su.s_ts
      |  GROUP BY e.user_id, su.s_ts),
      |hist AS (
      |  SELECT lat_min, CAST(count(*) AS BIGINT) c FROM conv GROUP BY 1),
      |ranked AS (
      |  SELECT lat_min,
      |    CAST(SUM(c) OVER (ORDER BY lat_min) AS BIGINT) cum FROM hist),
      |nc AS (SELECT CAST(count(*) AS BIGINT) n_conv FROM conv),
      |ns AS (SELECT CAST(count(*) AS BIGINT) n_signups FROM su),
      |pct AS (
      |  SELECT
      |    MIN(CASE WHEN cum * 100 >= n_conv * 50 THEN lat_min END) p50_min,
      |    MIN(CASE WHEN cum * 100 >= n_conv * 90 THEN lat_min END) p90_min
      |  FROM ranked, nc)
      |SELECT n_signups, n_conv, n_conv * 1000000 // n_signups
      |    conversion_ppm, p50_min, p90_min
      |FROM ns, nc, pct""".stripMargin

  /** `abc_classification`: Pareto inventory classes — parts ranked by
    * revenue, class A = the head up to 80% of cumulative revenue,
    * B to 95%, C the tail (the warehouse 80/15/5 rule `whale_share`
    * states for customers, here as the stocking-policy CLASSIFIER).
    * Boundaries are cross-multiplied (cum·5 ≤ tot·4, cum·20 ≤ tot·19)
    * so no float touches the decision; the output is the 3-row class
    * summary (count, revenue, share ppm) — scale-invariant.
    *
    * Plan shape: one fact shuffle to part grain, then the DESCENDING
    * variant of the sharded prefix sum: revenue-bucket shards,
    * in-shard windows ordered rev DESC, and the triangular offsets
    * join reversed (higher-revenue shards accumulate first) — never
    * a global window. At 100 TB only the part-grain aggregate moves
    * fact data.
    */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(Quantize.cents(col("l_extendedprice"))).as("r"))
    val tot = rev.agg(sum(col("r")).as("t"))
    val sharded = rev
      .crossJoin(broadcast(rev.agg(expr("max(r) div 64 + 1").as("wd"))))
      .withColumn("shard", expr("r div wd"))
      .localCheckpoint(eager = false) // window + shard totals
    val wIn = Window.partitionBy(col("shard"))
      .orderBy(col("r").desc, col("pk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shardTot = sharded.groupBy(col("shard")).agg(sum(col("r")).as("tr"))
    val offsets = shardTot.as("a")
      .join(
        broadcast(shardTot.as("b")), col("b.shard") > col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.tr")), lit(0L)).as("off"))
    sharded
      .withColumn("cum_in", sum(col("r")).over(wIn))
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(tot))
      .withColumn("cum", col("off") + col("cum_in"))
      .withColumn(
        "abc_class",
        when(col("cum") * 5 <= col("t") * 4, "A")
          .when(col("cum") * 20 <= col("t") * 19, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("r")).as("revenue_cents"))
      .crossJoin(broadcast(tot))
      .select(
        col("abc_class"), col("n_parts"), col("revenue_cents"),
        // revenue·10⁶ crosses 2^63 past ~9·10¹² cents — DECIMAL(38,0)
        // for the cross-multiplied term (the gini/linreg discipline)
        expr("CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1000000" +
          " div t AS BIGINT)").as("share_ppm"))
      .orderBy("abc_class")
  }

  def abcClassificationOracle: String =
    s"""WITH rev AS (
       |  SELECT l_partkey pk,
       |    CAST(SUM(${Quantize.centsSql("l_extendedprice")}) AS BIGINT) r
       |  FROM lineitem GROUP BY 1),
       |tot AS (SELECT CAST(SUM(r) AS BIGINT) t FROM rev),
       |c AS (
       |  SELECT r,
       |    CAST(SUM(r) OVER (ORDER BY r DESC, pk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) cum
       |  FROM rev),
       |cls AS (
       |  SELECT r, CASE WHEN cum * 5 <= t * 4 THEN 'A'
       |    WHEN cum * 20 <= t * 19 THEN 'B' ELSE 'C' END abc_class
       |  FROM c, tot)
       |SELECT abc_class, CAST(count(*) AS BIGINT) n_parts,
       |  CAST(SUM(r) AS BIGINT) revenue_cents,
       |  CAST(CAST(SUM(r) AS HUGEINT) * 1000000 // t AS BIGINT) share_ppm
       |FROM cls, tot GROUP BY abc_class, t
       |ORDER BY abc_class""".stripMargin

  /** `lorenz_deciles`: the CURVE behind [[giniIndex]]'s scalar — at
    * each population decile (users ordered by purchase value
    * ascending), the share of total value the bottom d/10 of users
    * hold, both axes in exact ppm. The readable form of inequality:
    * gini says 0.62, Lorenz says "the bottom half holds 9%". Decile
    * row d = the last VALUE row where cumulative population ≤ d·n/10
    * (cross-multiplied), so the 10-row output is scale-invariant and
    * exact — no interpolation, no float.
    *
    * Plan shape: per-user aggregate (the one fact-sized step), value
    * HISTOGRAM, then the gini sharded prefix sum for cumulative
    * population AND value per distinct value — shard-partitioned
    * windows + triangular offsets, never a global window; decile
    * selection is a 10-way conditional aggregate over the
    * histogram-sized relation.
    */
  def lorenzDeciles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(sum(Quantize.cents(col("value"))).as("x"))
    val hist = perUser.groupBy(col("x"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // width + shards + totals
    val tot = hist.agg(
      sum(col("c")).as("n"), sum(col("x") * col("c")).as("tv"))
    val sharded = hist
      .crossJoin(broadcast(hist.agg(expr("max(x) div 64 + 1").as("wd"))))
      .withColumn("shard", expr("x div wd"))
      .localCheckpoint(eager = false) // window + shard totals
    val wIn = Window.partitionBy(col("shard")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val shardTot = sharded.groupBy(col("shard"))
      .agg(sum(col("c")).as("tc"), sum(col("x") * col("c")).as("txv"))
    val offsets = shardTot.as("a")
      .join(
        broadcast(shardTot.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(
        coalesce(sum(col("b.tc")), lit(0L)).as("offc"),
        coalesce(sum(col("b.txv")), lit(0L)).as("offv"))
    val cum = sharded
      .withColumn("cin", sum(col("c")).over(wIn))
      .withColumn("vin", sum(col("x") * col("c")).over(wIn))
      .join(broadcast(offsets), "shard")
      .select(
        (col("offc") + col("cin")).as("cpop"),
        (col("offv") + col("vin")).as("cval"))
      .crossJoin(broadcast(tot))
    val decile = explode(array((1L to 10L).map(lit(_)): _*)).as("decile")
    cum
      .select(col("cpop"), col("cval"), col("n"), col("tv"), decile)
      .where(col("cpop") * 10 <= col("n") * col("decile"))
      .groupBy(col("decile"))
      .agg(
        max(col("cpop")).as("mp"),
        max(col("cval")).as("mv"),
        max(col("n")).as("n"), max(col("tv")).as("tv"))
      .select(
        col("decile"),
        expr("mp * 1000000 div n").as("cum_pop_ppm"),
        expr("mv * 1000000 div tv").as("cum_value_ppm"))
      .orderBy("decile")
  }

  def lorenzDecilesOracle: String =
    s"""WITH pu AS (
       |  SELECT user_id, CAST(SUM(${Quantize.centsSql("value")}) AS BIGINT) x
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |h AS (SELECT x, CAST(count(*) AS BIGINT) c FROM pu GROUP BY 1),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) n,
       |    CAST(SUM(x * c) AS BIGINT) tv FROM h),
       |cum AS (
       |  SELECT CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) cpop,
       |    CAST(SUM(x * c) OVER (ORDER BY x) AS BIGINT) cval
       |  FROM h),
       |d AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) decile)
       |SELECT decile,
       |  CAST(MAX(cpop) AS BIGINT) * 1000000 // n cum_pop_ppm,
       |  CAST(MAX(cval) AS BIGINT) * 1000000 // tv cum_value_ppm
       |FROM cum, d, tot
       |WHERE cpop * 10 <= n * decile
       |GROUP BY decile, n, tv ORDER BY decile""".stripMargin

  /** `markov_next`: the first-order Markov transition matrix of the
    * per-user event stream — P(next event type | current), the model
    * behind next-action prediction, funnel simulation, and session
    * generation. Transitions are counted along each user's total
    * order ((ts micros, event_id) — the [[eventPattern]] ordering
    * discipline, so both engines walk identical sequences), then
    * normalized per source state in ppm; the full matrix with raw
    * counts ships so downstream smoothing is a reader-side choice.
    *
    * Plan shape: one shuffle on user_id into partitioned lead
    * windows, then a map-side-combinable count on the (prev, next)
    * grid (|types|² rows — tiny at any scale) and a broadcast join
    * for the per-row normalizer. At 100 TB this is the canonical
    * sessionize-then-summarize shape: the heavy shuffle is the one
    * you already paid for sessionization.
    */
  def markovNext(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val tr = Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("event_type").as("prev"), col("nxt"))
      .agg(count(lit(1)).as("n"))
    val tot = tr.groupBy(col("prev")).agg(sum(col("n")).as("tn"))
    tr.join(broadcast(tot), "prev")
      .select(
        col("prev"), col("nxt"), col("n"),
        expr("n * 1000000 div tn").as("p_ppm"))
      .orderBy("prev", "nxt")
  }

  def markovNextOracle: String =
    """WITH seqd AS (
      |  SELECT event_type,
      |    LEAD(event_type) OVER (
      |      PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) nxt
      |  FROM events),
      |tr AS (
      |  SELECT event_type prev, nxt, CAST(count(*) AS BIGINT) n
      |  FROM seqd WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) tn FROM tr GROUP BY 1)
      |SELECT prev, nxt, n, n * 1000000 // tn p_ppm
      |FROM tr JOIN tot USING (prev) ORDER BY prev, nxt""".stripMargin

  /** `interarrival_hist`: the per-user inter-event gap distribution
    * on a log₂ scale — the histogram a session-timeout is CALIBRATED
    * from (the sessionize cut should sit in the valley between the
    * within-session mode and the between-visit mode; this query IS
    * that elbow plot). Gaps ride the [[markovNext]]/[[eventPattern]]
    * total order ((ts micros, event_id)); the log₂ bucket is
    * `length(bin(gap+1)) − 1` — integer floor-log₂ via the binary
    * string, IDENTICAL in both engines (no floating log), gap 0 in
    * bucket 0. Shares in ppm against the broadcast gap total.
    *
    * Plan shape: one shuffle on user_id into partitioned lag
    * windows, then a ~60-row histogram aggregate (map-side
    * combinable) — at 100 TB the same one-shuffle cost as
    * sessionization itself.
    */
  def interarrivalHist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(
        col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .where(col("prev").isNotNull)
      .select((col("us") - col("prev")).as("gap"))
    val hist = gaps
      .groupBy(expr("CAST(length(bin(gap + 1)) - 1 AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum(col("n")).as("t"))
    hist.crossJoin(broadcast(tot)) // 1-row total: documented exception
      .select(
        col("bucket"), col("n"),
        expr("n * 1000000 div t").as("share_ppm"))
      .orderBy("bucket")
  }

  def interarrivalHistOracle: String =
    """WITH g AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) -
      |    LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
      |      PARTITION BY user_id
      |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) gap
      |  FROM events),
      |h AS (
      |  SELECT CAST(length(bin(gap + 1)) - 1 AS BIGINT) bucket,
      |    CAST(count(*) AS BIGINT) n
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) t FROM h)
      |SELECT bucket, n, n * 1000000 // t share_ppm
      |FROM h CROSS JOIN tot ORDER BY bucket""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("markov_next", markovNext, Some(markovNextOracle)),
    QueryDef(
      "interarrival_hist", interarrivalHist, Some(interarrivalHistOracle)),
    QueryDef("lorenz_deciles", lorenzDeciles, Some(lorenzDecilesOracle)),
    QueryDef(
      "abc_classification", abcClassification,
      Some(abcClassificationOracle)),
    QueryDef(
      "conversion_latency", conversionLatency,
      Some(conversionLatencyOracle)),
    QueryDef("cusum_shift", cusumShift, Some(cusumShiftOracle)),
    QueryDef("max_drawdown", maxDrawdown, Some(maxDrawdownOracle)),
    QueryDef("mase_eval", maseEval, Some(maseEvalOracle)),
    QueryDef("top_journeys", topJourneys, Some(topJourneysOracle)),
    QueryDef("pacf_lags", pacfLags, Some(pacfLagsOracle)),
    QueryDef("xcorr_lags", xcorrLags, Some(xcorrLagsOracle)),
    QueryDef(
      "price_elasticity", priceElasticity, Some(priceElasticityOracle)),
    QueryDef("funnel_negation", funnelNegation, Some(funnelNegationOracle)),
    QueryDef("burst_days", burstDays, Some(burstDaysOracle)),
    QueryDef("quantile_map", quantileMap, Some(quantileMapOracle)),
    QueryDef(
      "seasonal_strength", seasonalStrength, Some(seasonalStrengthOracle)),
    QueryDef(
      "double_changepoint", doubleChangepoint,
      Some(doubleChangepointOracle)),
    QueryDef(
      "weekday_seasonality", weekdaySeasonality,
      Some(weekdaySeasonalityOracle)),
    QueryDef("multi_touch", multiTouch, Some(multiTouchOracle)),
    QueryDef("ohlc_bars", ohlcBars, Some(ohlcBarsOracle)),
    QueryDef("whale_share", whaleShare, Some(whaleShareOracle)),
    QueryDef(
      "trend_decompose", trendDecompose, Some(trendDecomposeOracle)),
    QueryDef("mom_growth", momGrowth, Some(momGrowthOracle)),
    QueryDef("seasonal_anomaly", seasonalAnomaly, Some(seasonalAnomalyOracle)),
    QueryDef("rfm_segments", rfmSegments, Some(rfmSegmentsOracle)),
    QueryDef("autocorr_lag", autocorrLag, Some(autocorrLagOracle)),
    QueryDef(
      "error_rate_alert", errorRateAlert, Some(errorRateAlertOracle)),
    QueryDef("window_funnel", windowFunnel, Some(windowFunnelOracle)),
    QueryDef(
      "new_vs_returning", newVsReturning, Some(newVsReturningOracle)),
    QueryDef("gini_index", giniIndex, Some(giniIndexOracle)),
    QueryDef(
      "conversion_lag_histogram", conversionLagHistogram,
      Some(conversionLagHistogramOracle)),
    QueryDef(
      "topk_with_others", topkWithOthers, Some(topkWithOthersOracle)),
    QueryDef(
      "seasonality_profile", seasonalityProfile,
      Some(seasonalityProfileOracle)),
    QueryDef("twap", twap, Some(twapOracle)),
    QueryDef("drift_cusum", driftCusum, Some(driftCusumOracle)),
    QueryDef("clamped_balance", clampedBalance, Some(clampedBalanceOracle)),
    QueryDef("event_pattern", eventPattern, Some(eventPatternOracle)),
    QueryDef("decayed_topk", decayedTopk, Some(decayedTopkOracle)),
    QueryDef("forecast_baseline", forecastBaseline, Some(forecastBaselineOracle)),
    QueryDef("funnel_steps", funnelSteps, Some(funnelStepsOracle)),
    QueryDef("cohort_retention", cohortRetention, Some(cohortRetentionOracle)),
    QueryDef("cohort_ltv", cohortLtv, Some(cohortLtvOracle)),
    QueryDef("p_chart", pChart, Some(pChartOracle)),
    QueryDef("scd2_history", scd2History, Some(scd2HistoryOracle)),
    QueryDef("pit_join", pitJoin, Some(pitJoinOracle)),
    QueryDef("rolling_revenue", rollingRevenue, Some(rollingRevenueOracle)),
    QueryDef("rolling_median", rollingMedian, Some(rollingMedianOracle)),
    QueryDef("ewma_smooth", ewmaSmooth, Some(ewmaSmoothOracle)))
}
