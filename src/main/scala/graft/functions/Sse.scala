package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Server-Sent-Events frame + HTTP/1.1 chunk framing as Catalyst
  * column expressions (reference: evtstrd/events.py:23-33,
  * evtstrd/http.py:114-128).
  */
object Sse {

  /** `event: {type}\r\ndata: {data}\r\n[id: {id}\r\n]\r\n` — the id
    * line is emitted only when id is non-null and non-empty
    * (evtstrd/events.py:30-31).
    */
  def frame(eventType: Column, data: Column, id: Column): Column =
    concat(
      lit("event: "), eventType, lit("\r\n"),
      lit("data: "), data, lit("\r\n"),
      when(id.isNotNull && id =!= "", concat(lit("id: "), id, lit("\r\n")))
        .otherwise(lit("")),
      lit("\r\n"))

  /** One HTTP/1.1 chunk: lowercase hex byte-length, CRLF, payload,
    * CRLF (evtstrd/http.py:114-118).
    */
  def chunk(payload: Column): Column =
    concat(
      format_string("%x", octet_length(payload)), lit("\r\n"),
      payload, lit("\r\n"))

  /** Terminal zero-length chunk (evtstrd/http.py:127-128). */
  val lastChunk: String = "0\r\n\r\n"
}
