package graft.queries

import graft.plans.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries exercising the engine's custom whole-operator Catalyst
  * nodes (graft.plans) — the tier below expressions on the
  * custom-operator ladder. Each has a declarative sibling elsewhere in
  * the suite (e.g. `asof_join`'s union+window idiom) so the plans can
  * be compared: same answer, different physical shape.
  */
object NativePlans {

  /** Shared relation prep for ALL as-of queries, so the click-dedup
    * rule (one click per key tuple + time, max event_id) can never
    * diverge between them and their oracles. `segmented = true` adds
    * the props.k-half segment column to both key tuples (asof_multi's
    * composite key).
    */
  private def purchasesAndClicks(
      spark: SparkSession, dir: String,
      segmented: Boolean = false): (DataFrame, DataFrame) = {
    val ev = Tables.events(spark, dir)
    val kh = expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 50")
    val pCols =
      Seq(col("event_id"), col("user_id")) ++
        (if (segmented) Seq(kh.as("kh")) else Nil) :+
        unix_micros(col("ts")).as("us")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(pCols: _*)
    val cKeys =
      Seq(col("user_id").as("c_user_id")) ++
        (if (segmented) Seq(kh.as("c_kh")) else Nil) :+
        unix_micros(col("ts")).as("click_us")
    val clicks = ev.where(col("event_type") === "click")
      .groupBy(cKeys: _*)
      .agg(max(col("event_id")).as("click_id"))
    (purchases, clicks)
  }

  /** `asof_native`: for every purchase, the most recent click by the
    * same user at or before it — the same relation family as
    * `asof_join`, but joining two separate relations through the
    * native [[graft.plans.AsOfJoinExec]] operator: one hash shuffle
    * per side + in-partition sort + linear merge, zero row expansion.
    * The right side is pre-aggregated to one click per (user, time)
    * (max event_id) so the inclusive-tie match is deterministic.
    */
  def asofNative(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(spark, dir)
    AsOfJoin.backward(
        purchases, clicks,
        leftKey = "user_id", leftTime = "us",
        rightKey = "c_user_id", rightTime = "click_us")
      .select(
        col("event_id"), col("user_id"), col("click_id"), col("click_us"))
      .orderBy("event_id")
  }

  def asofNativeOracle: String =
    """SELECT p.event_id, p.user_id, c.click_id, c.click_us
      |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS c_user_id,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS click_us,
      |             max(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
      |ON p.user_id = c.c_user_id AND p.us >= c.click_us
      |ORDER BY p.event_id""".stripMargin

  /** `asof_strict`: the operator's other mode pair — strictly-before
    * matching (`<`) with a 1-hour tolerance that voids stale matches
    * (~98% of them at this data's click density, so both outcomes are
    * exercised). DuckDB states the same relation as a `>` ASOF plus a
    * gap CASE — valid because the as-of match is the gap-minimal
    * eligible row, so voiding it equals filtering candidates by gap.
    */
  def asofStrict(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(spark, dir)
    AsOfJoin.backward(
        purchases, clicks,
        leftKey = "user_id", leftTime = "us",
        rightKey = "c_user_id", rightTime = "click_us",
        strict = true, toleranceUs = Some(3600000000L))
      .select(
        col("event_id"), col("user_id"), col("click_id"), col("click_us"))
      .orderBy("event_id")
  }

  def asofStrictOracle: String =
    """SELECT p.event_id, p.user_id,
      |  CASE WHEN p.us - c.click_us <= 3600000000 THEN c.click_id END AS click_id,
      |  CASE WHEN p.us - c.click_us <= 3600000000 THEN c.click_us END AS click_us
      |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS c_user_id,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS click_us,
      |             max(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
      |ON p.user_id = c.c_user_id AND p.us > c.click_us
      |ORDER BY p.event_id""".stripMargin

  /** `asof_multi`: COMPOSITE-key as-of through the same native node —
    * most recent click by the same user in the same props.k half
    * (the (entity, attribute) key shape: per (user, segment) state).
    * Key tuples ride the generic natural-ordering merge; the plan is
    * identical to the single-key form — one exchange per side,
    * clustered on both key columns.
    */
  def asofMulti(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(spark, dir, segmented = true)
    AsOfJoin.backwardMulti(
        purchases, clicks,
        leftKeys = Seq("user_id", "kh"), leftTime = "us",
        rightKeys = Seq("c_user_id", "c_kh"), rightTime = "click_us")
      .select(
        col("event_id"), col("user_id"), col("kh"),
        col("click_id"), col("click_us"))
      .orderBy("event_id")
  }

  def asofMultiOracle: String =
    """SELECT p.event_id, p.user_id, p.kh, c.click_id, c.click_us
      |FROM (SELECT event_id, user_id,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) // 50 AS kh,
      |        epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS c_user_id,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) // 50 AS c_kh,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS click_us,
      |             max(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3) c
      |ON p.user_id = c.c_user_id AND p.kh = c.c_kh AND p.us >= c.click_us
      |ORDER BY p.event_id""".stripMargin

  /** `asof_forward`: for every purchase, the NEXT click by the same
    * user at-or-after it — the forward direction of the native
    * operator (time-to-next-action, the retention-analysis shape).
    * Same physical plan as backward: one exchange per side, linear
    * merge with the head as the unconsumed forward candidate; DuckDB
    * oracles it directly with the `<=` ASOF comparator.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(spark, dir)
    AsOfJoin.forward(
        purchases, clicks,
        leftKey = "user_id", leftTime = "us",
        rightKey = "c_user_id", rightTime = "click_us")
      .select(
        col("event_id"), col("user_id"), col("click_id"), col("click_us"))
      .orderBy("event_id")
  }

  def asofForwardOracle: String =
    """SELECT p.event_id, p.user_id, c.click_id, c.click_us
      |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |      FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN
      |     (SELECT user_id AS c_user_id,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS click_us,
      |             max(event_id) AS click_id
      |      FROM events WHERE event_type = 'click' GROUP BY 1, 2) c
      |ON p.user_id = c.c_user_id AND p.us <= c.click_us
      |ORDER BY p.event_id""".stripMargin

  /** `asof_nearest`: the click CLOSEST in time to each purchase,
    * backward winning exact ties — one merge pass tracking both
    * directional candidates. DuckDB has no nearest ASOF, so the
    * oracle runs both directional ASOF joins and picks the smaller
    * gap with the same tie rule.
    */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(spark, dir)
    AsOfJoin.nearest(
        purchases, clicks,
        leftKey = "user_id", leftTime = "us",
        rightKey = "c_user_id", rightTime = "click_us")
      .select(
        col("event_id"), col("user_id"), col("click_id"), col("click_us"))
      .orderBy("event_id")
  }

  def asofNearestOracle: String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT user_id AS c_user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS click_us,
      |         max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |b AS (
      |  SELECT p.event_id, c.click_id b_id, c.click_us b_us
      |  FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.c_user_id AND p.us >= c.click_us),
      |f AS (
      |  SELECT p.event_id, c.click_id f_id, c.click_us f_us
      |  FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.c_user_id AND p.us <= c.click_us)
      |SELECT p.event_id, p.user_id,
      |  CASE WHEN b_us IS NOT NULL
      |         AND (f_us IS NULL OR p.us - b_us <= f_us - p.us)
      |       THEN b_id ELSE f_id END AS click_id,
      |  CASE WHEN b_us IS NOT NULL
      |         AND (f_us IS NULL OR p.us - b_us <= f_us - p.us)
      |       THEN b_us ELSE f_us END AS click_us
      |FROM p
      |JOIN b ON p.event_id = b.event_id
      |JOIN f ON p.event_id = f.event_id
      |ORDER BY p.event_id""".stripMargin

  /** `attribution`: last-touch marketing attribution — every purchase
    * credits the most recent click/view by the same user within 24
    * hours, rolled up to a per-channel conversions + revenue report
    * (the workload as-of joins exist FOR: the operator composes
    * straight into the business aggregate). Touches pre-dedup to one
    * row per (user, time) with max-id/max-type picks so the
    * inclusive-tie match is deterministic; the 24h tolerance voids
    * stale matches, surfacing them as the 'unattributed' bucket.
    *
    * Plan shape: one native as-of merge (hash shuffle per side +
    * in-partition sort, zero row expansion) feeding a 3-row
    * aggregate. At 100 TB both sides shuffle once on user; nothing
    * is quadratic in touches per user.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        Quantize.cents(col("value")).as("val_c"))
    val touches = ev.where(col("event_type").isin("click", "view"))
      .groupBy(
        col("user_id").as("tu"), unix_micros(col("ts")).as("tus"))
      .agg(max(col("event_id")).as("tid"), max(col("event_type")).as("ttype"))
    AsOfJoin.backward(
        purchases, touches,
        leftKey = "user_id", leftTime = "us",
        rightKey = "tu", rightTime = "tus",
        toleranceUs = Some(86400000000L))
      .select(
        coalesce(col("ttype"), lit("unattributed")).as("channel"),
        col("val_c"))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("val_c")).as("revenue_c"))
      .orderBy("channel")
  }

  def attributionOracle: String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) us,
      |         CAST(round(value * 100) AS BIGINT) val_c
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id tu, epoch_us(CAST(ts AS TIMESTAMP)) tus,
      |         max(event_id) tid, max(event_type) ttype
      |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
      |a AS (
      |  SELECT p.event_id, p.val_c,
      |    CASE WHEN p.us - t.tus <= 86400000000 THEN t.ttype END ch
      |  FROM p ASOF LEFT JOIN t ON p.user_id = t.tu AND p.us >= t.tus)
      |SELECT coalesce(ch, 'unattributed') AS channel,
      |  CAST(count(*) AS BIGINT) n_purchases,
      |  CAST(sum(val_c) AS BIGINT) revenue_c
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("asof_native", asofNative, Some(asofNativeOracle)),
    QueryDef("asof_strict", asofStrict, Some(asofStrictOracle)),
    QueryDef("asof_multi", asofMulti, Some(asofMultiOracle)),
    QueryDef("asof_forward", asofForward, Some(asofForwardOracle)),
    QueryDef("asof_nearest", asofNearest, Some(asofNearestOracle)),
    QueryDef("attribution", attribution, Some(attributionOracle)))
}
