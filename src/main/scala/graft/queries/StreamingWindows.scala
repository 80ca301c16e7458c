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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("stream_tumbling", streamTumbling, Some(streamTumblingOracle)),
    QueryDef("stream_sliding", streamSliding, Some(streamSlidingOracle)),
    QueryDef("stream_sessions", streamSessions, Some(streamSessionsOracle)))
}
