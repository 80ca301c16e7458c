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
    * required. `data` parses as VARIANT so its JSON *type* survives
    * the parse — a STRING-typed schema field would capture any value
    * as text, making `{"data": 5}` and worse `{"data": "{\"a\":1}"}`
    * (a string whose content merely looks like an object)
    * indistinguishable from real objects.
    */
  val envelopeSchema: StructType = StructType.fromDDL(
    "action STRING, subsystem STRING, event STRING, data VARIANT, id STRING")

  /** `data` must be a JSON *object* (evtstrd/socket_server.py:107
    * requires dict): the variant's own type tag decides — scalars,
    * arrays, strings (whatever their content), and JSON null all
    * fail. Null collapses => dropped.
    */
  private[graft] def isJsonObject(c: org.apache.spark.sql.Column) =
    schema_of_variant(c).startsWith("OBJECT")

  /** JSON line column -> valid envelope rows, `data` re-serialized to
    * JSON text. Like the reference, delivery re-serializes the parsed
    * dict rather than passing original wire bytes (evtstrd/events.py:
    * 48-49) — but the renderings differ cosmetically: json.dumps
    * keeps insertion order with ", "/": " separators, while the
    * variant encoding renders compact separators with keys in
    * dictionary order. Values are identical; byte layout of the
    * delivered frame is not guaranteed to match the reference's.
    * The Generate (inline/array) guarantees one parse per line;
    * invalid JSON yields a null struct whose fields fail the validity
    * filter.
    */
  def parseLines(lines: DataFrame): DataFrame =
    lines
      .select(
        // the source's global line offset (when present) survives the
        // parse so delivery can restore cross-partition arrival order
        lines.columns.filter(_ == "_offset").map(col).toSeq :+
          inline(array(from_json(col("value"), envelopeSchema))): _*)
      .where(
        col("action") === "notify" && col("subsystem").isNotNull &&
          col("event").isNotNull && col("id").isNotNull &&
          col("data").isNotNull && isJsonObject(col("data")))
      .withColumn("data", to_json(col("data")))

  /** Envelopes -> one delivery row per matching subscription with the
    * serialized SSE frame. Plan-compiled subscriptions (the reference
    * compiles filters at subscribe time); shuffle-free. An `_seq`
    * ordering column, when the caller added one, passes through — the
    * live server sorts each listener shard by it so partition-wise
    * delivery preserves wire arrival order per connection.
    */
  def deliveries(envelopes: DataFrame, subs: Seq[Subscription]): DataFrame =
    Fanout
      .compiled(envelopes, subs, col("subsystem"), col("data"))
      .select(
        Seq(
          col("sub_id"),
          col("subsystem"),
          col("id"),
          Sse.chunk(Sse.frame(col("event"), col("data"), col("id"))).as("chunk")
        ) ++ envelopes.columns.filter(_ == "_seq").map(col): _*)

  /** Full wire-in to SSE-chunk-out pipeline. */
  def full(lines: DataFrame, subs: Seq[Subscription]): DataFrame =
    deliveries(parseLines(lines), subs)
}
