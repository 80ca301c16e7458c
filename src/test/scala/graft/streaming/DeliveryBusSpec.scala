package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.scalatest.funsuite.AnyFunSuite

/** The JVM-local delivery hand-off contract: partition tasks resolve
  * the sink registered for their server's bus id, and a task landing
  * in a JVM with no registered shard fails LOUDLY (a silent drop
  * would read as subscriber loss).
  */
class DeliveryBusSpec extends AnyFunSuite {

  test("register/sink/unregister round trip") {
    val got = new AtomicReference[(Long, String)]()
    val id = "bus-spec-1"
    DeliveryBus.register(id, (lid, b) => got.set((lid, new String(b, "UTF-8"))))
    try {
      DeliveryBus.sink(id)(7L, "chunk".getBytes("UTF-8"))
      assert(got.get() == ((7L, "chunk")))
    } finally DeliveryBus.unregister(id)
    val e = intercept[IllegalStateException](DeliveryBus.sink(id))
    assert(e.getMessage.contains(id))
  }

  test("unknown bus id fails loudly, naming the deployment contract") {
    val e = intercept[IllegalStateException](DeliveryBus.sink("nope"))
    assert(e.getMessage.contains("connection shard"))
  }

  test("re-registration replaces the sink (latest wins)") {
    val id = "bus-spec-2"
    val seen = new AtomicReference[String]("none")
    DeliveryBus.register(id, (_, _) => seen.set("first"))
    DeliveryBus.register(id, (_, _) => seen.set("second"))
    try {
      DeliveryBus.sink(id)(1L, Array.emptyByteArray)
      assert(seen.get() == "second")
    } finally DeliveryBus.unregister(id)
  }
}
