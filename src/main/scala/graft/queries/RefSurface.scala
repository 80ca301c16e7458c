package graft.queries

import graft.filters.FilterOracle
import graft.functions.Sse
import graft.operators.Fanout
import graft.operators.Fanout.Subscription
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries replicating the reference's own analytic surface over the
  * driver's `events` table: subsystem fan-out with filter predicates,
  * SSE/chunk framing, envelope validation.
  */
object RefSurface {

  /** Standing subscriptions for the batch fan-out queries (FIXTURES §7
    * shape). Subscription 4's string filter `k<='50'` never matches the
    * integer `props.k` — it pins the reference's strict type matching
    * in the oracle comparison. Subscription 3 has zero filters =>
    * matches every `error` event (evtstrd/listener.py:62).
    */
  val subscriptions: Seq[Subscription] = Seq(
    Subscription(1L, "purchase", Seq("k<=50")),
    Subscription(2L, "purchase", Seq("k>=10", "k<90")),
    Subscription(3L, "error", Nil),
    Subscription(4L, "view", Seq("k<='50'")))

  private val crlf = "chr(13) || chr(10)"

  /** Flagship: compiled fan-out + SSE frame projection. */
  def fanout(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    Fanout
      .compiled(events, subscriptions, col("event_type"), col("props"))
      .select(
        col("sub_id"),
        col("event_id"),
        Sse
          .frame(col("event_type"), col("props"), col("event_id").cast("string"))
          .as("frame"))
      .orderBy("sub_id", "event_id")
  }

  /** Same result through the runtime path: broadcast join on subsystem
    * + residual filter evaluation (subscriptions as data).
    */
  def fanoutDynamic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, dir)
    val subs = subscriptions
      .map(s => (s.id, s.subsystem, s.filters))
      .toDF("sub_id", "subsystem", "filters")
    Fanout
      .dynamic(events, subs, col("event_type"), col("props"))
      .select(col("sub_id"), col("event_id"))
      .orderBy("sub_id", "event_id")
  }

  def fanoutOracle: String = {
    val branches = subscriptions.map { s =>
      val frame =
        s"'event: ' || event_type || $crlf || 'data: ' || props || $crlf" +
          s" || 'id: ' || CAST(event_id AS VARCHAR) || $crlf || $crlf"
      s"SELECT CAST(${s.id} AS BIGINT) AS sub_id, event_id, $frame AS frame " +
        s"FROM events WHERE event_type = '${s.subsystem}' " +
        s"AND ${FilterOracle.predicateAll(s.filters, "props")}"
    }
    branches.mkString("", " UNION ALL ", " ORDER BY sub_id, event_id")
  }

  def fanoutDynamicOracle: String = {
    val branches = subscriptions.map { s =>
      s"SELECT CAST(${s.id} AS BIGINT) AS sub_id, event_id " +
        s"FROM events WHERE event_type = '${s.subsystem}' " +
        s"AND ${FilterOracle.predicateAll(s.filters, "props")}"
    }
    branches.mkString("", " UNION ALL ", " ORDER BY sub_id, event_id")
  }

  /** SSE frames wrapped in HTTP/1.1 chunks; a deterministic subset of
    * events carries no id => id line omitted (evtstrd/events.py:30-31).
    */
  def sseChunks(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val id =
      when(col("event_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("event_id").cast("string"))
    events
      .select(
        col("event_id"),
        Sse.chunk(Sse.frame(col("event_type"), col("props"), id)).as("chunk"))
      .orderBy("event_id")
  }

  def sseChunksOracle: String = {
    val idPart =
      s"CASE WHEN event_id % 5 = 0 THEN '' ELSE 'id: ' || CAST(event_id AS VARCHAR) || $crlf END"
    val frame =
      s"('event: ' || event_type || $crlf || 'data: ' || props || $crlf || $idPart || $crlf)"
    s"SELECT event_id, printf('%x', octet_length(CAST($frame AS BLOB))) || $crlf || $frame || $crlf AS chunk " +
      "FROM events ORDER BY event_id"
  }

  /** Wire-envelope validation: events are serialized to the socket
    * JSON-lines format (evtstrd/socket_server.py:102-112), a
    * deterministic subset corrupted (bad JSON) or mis-actioned, then
    * parsed back with permissive corrupt-record handling and validated
    * — bad lines are dropped, never fail the job (evtstrd/util.py:11-21,
    * socket_server.py:88-99). Output: surviving event count per
    * subsystem.
    */
  def envelopeStats(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val action =
      when(col("event_id") % 89 === 0, lit("ping")).otherwise(lit("notify"))
    val line = to_json(
      struct(
        action.as("action"),
        col("event_type").as("subsystem"),
        lit("add").as("event"),
        col("props").as("data"),
        col("event_id").cast("string").as("id")))
    val corrupted =
      when(col("event_id") % 97 === 0, concat(lit("{oops"), line))
        .otherwise(line)
    val envSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "action STRING, subsystem STRING, event STRING, data STRING, id STRING")
    events
      .select(corrupted.as("line"))
      .select(from_json(col("line"), envSchema).as("env"))
      .select(col("env.*"))
      .where(
        col("action") === "notify" && col("subsystem").isNotNull &&
          col("event").isNotNull && col("data").isNotNull &&
          col("id").isNotNull)
      .groupBy(col("subsystem"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("subsystem")
  }

  def envelopeStatsOracle: String =
    """SELECT event_type AS subsystem, CAST(count(*) AS BIGINT) AS n_events
      |FROM events WHERE event_id % 89 <> 0 AND event_id % 97 <> 0
      |GROUP BY event_type ORDER BY subsystem""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("fanout", fanout, Some(fanoutOracle)),
    QueryDef("fanout_dynamic", fanoutDynamic, Some(fanoutDynamicOracle)),
    QueryDef("sse_chunks", sseChunks, Some(sseChunksOracle)),
    QueryDef("envelope_stats", envelopeStats, Some(envelopeStatsOracle)))
}
