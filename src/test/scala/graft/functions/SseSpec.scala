package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden SSE frames from evtstrd_test/events.py:9-17 and
  * evtstrd/events.py:27-55.
  */
class SseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(t: String, d: String, id: Option[String]): String = {
    import spark.implicits._
    Seq((t, d, id.orNull))
      .toDF("t", "d", "id")
      .select(Sse.frame(col("t"), col("d"), col("id")).as("f"))
      .head().getString(0)
  }

  test("basic frame, no id") {
    assert(frame("add", "test-data", None) ==
      "event: add\r\ndata: test-data\r\n\r\n")
  }

  test("frame with id") {
    assert(frame("add", "D", Some("I")) ==
      "event: add\r\ndata: D\r\nid: I\r\n\r\n")
  }

  test("empty id omitted (events.py:30)") {
    assert(frame("add", "D", Some("")) == "event: add\r\ndata: D\r\n\r\n")
  }

  test("ping frame (events.py:36-38)") {
    assert(frame("ping", "", None) == "event: ping\r\ndata: \r\n\r\n")
  }

  test("logout frame (events.py:53-55)") {
    assert(frame("logout", "{\"reason\": \"expire\"}", None) ==
      "event: logout\r\ndata: {\"reason\": \"expire\"}\r\n\r\n")
  }

  test("chunk framing: lowercase hex byte length (http.py:114-118)") {
    import spark.implicits._
    val got = Seq("hello", "x" * 26)
      .toDF("p")
      .select(Sse.chunk(col("p")).as("c"))
      .collect()
      .map(_.getString(0))
    assert(got(0) == "5\r\nhello\r\n")
    assert(got(1) == "1a\r\n" + "x" * 26 + "\r\n")
    assert(Sse.lastChunk == "0\r\n\r\n")
  }
}
