package graft.streaming

import graft.functions.Sse
import graft.operators.Fanout
import graft.operators.Fanout.Subscription
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's ingest→deliver dataflow (EP1, SURVEY §3) as one
  * Catalyst plan that runs identically over a batch DataFrame or a
  * Structured Streaming DataFrame — parse the JSON-lines wire format,
  * validate the envelope (bad lines dropped, never failing the job:
  * evtstrd/util.py:11-21, socket_server.py:88-99), fan out per
  * subscription, project SSE frames.
  */
object EventStreamPipeline {

  /** Wire envelope (evtstrd/socket_server.py:102-112): all fields
    * required; `data` stays a JSON string payload probed dynamically by
    * filters.
    */
  val envelopeSchema: StructType = StructType.fromDDL(
    "action STRING, subsystem STRING, event STRING, data STRING, id STRING")

  /** `data` must be a JSON *object* (evtstrd/socket_server.py:107
    * requires dict): from_json captures any JSON value as its string
    * form for a STRING field, so `{"data": 5}` yields "5" here. A
    * captured object re-serializes starting with '{'; scalars/arrays
    * never do, so the cheap prefix test short-circuits for them and
    * only '{'-shaped values pay the variant re-parse (which weeds out
    * string-typed fields like `{"data": "{x"}` whose capture starts
    * with '{' but is not valid JSON). Null collapses => dropped.
    */
  private[graft] def isJsonObject(c: org.apache.spark.sql.Column) =
    c.startsWith("{") && try_parse_json(c).isNotNull

  /** JSON line column -> valid envelope rows. The Generate
    * (inline/array) guarantees one parse per line; invalid JSON yields
    * a null struct whose fields fail the validity filter.
    */
  def parseLines(lines: DataFrame): DataFrame =
    lines
      .select(inline(array(from_json(col("value"), envelopeSchema))))
      .where(
        col("action") === "notify" && col("subsystem").isNotNull &&
          col("event").isNotNull && col("data").isNotNull &&
          col("id").isNotNull && isJsonObject(col("data")))

  /** Envelopes -> one delivery row per matching subscription with the
    * serialized SSE frame. Plan-compiled subscriptions (the reference
    * compiles filters at subscribe time); shuffle-free.
    */
  def deliveries(envelopes: DataFrame, subs: Seq[Subscription]): DataFrame =
    Fanout
      .compiled(envelopes, subs, col("subsystem"), col("data"))
      .select(
        col("sub_id"),
        col("subsystem"),
        col("id"),
        Sse.chunk(Sse.frame(col("event"), col("data"), col("id"))).as("chunk"))

  /** Full wire-in to SSE-chunk-out pipeline. */
  def full(lines: DataFrame, subs: Seq[Subscription]): DataFrame =
    deliveries(parseLines(lines), subs)
}
