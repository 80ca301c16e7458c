package graft.operators

import graft.TestSpark
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `observe` counters must equal an independently-computed aggregate:
  * the funnel reports itself from the same pass, with no second scan.
  */
class ObservedMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("observed gate counters equal an independent aggregation") {
    val docs = Tables.read(spark, dir, "documents")
    val kept = col("n_chars") >= 200
    val tokens = col("n_chars") // proxy token budget: exact integers

    val gated = ObservedMetrics.observeGate(
      docs, "clean_gate", kept, tokens)
    // the action that carries the metrics: the gate's own filter pass.
    // NB metrics live on the QueryExecution that ran — `count()` would
    // build a fresh one (groupBy().count()) and record nothing, so the
    // action must be on the dataset itself.
    val out = gated.where(kept).select("doc_id")
    val survivors = out.collect().length.toLong

    val m = ObservedMetrics.lastMetrics(out, "clean_gate")
      .getOrElse(fail("no observed metrics recorded"))

    val expect = docs.agg(
      count(lit(1)).as("n_total"),
      sum(kept.cast("long")).as("n_kept"),
      sum(when(kept, tokens).otherwise(lit(0L))).as("kept_tokens"))
      .collect()(0)

    assert(m.getAs[Long]("n_total") == expect.getAs[Long]("n_total"))
    assert(m.getAs[Long]("n_kept") == expect.getAs[Long]("n_kept"))
    assert(m.getAs[Long]("n_kept") == survivors)
    assert(
      m.getAs[Long]("kept_tokens") == expect.getAs[Long]("kept_tokens"))
  }

  test("observed gate counters are exact zeros on empty input") {
    val docs = Tables.read(spark, dir, "documents")
    val gated = ObservedMetrics.observeGate(
      docs.where(lit(false)), "empty_gate",
      col("n_chars") >= 200, col("n_chars"))
    assert(gated.collect().isEmpty)
    val m = ObservedMetrics.lastMetrics(gated, "empty_gate")
      .getOrElse(fail("no observed metrics recorded"))
    // sum() over zero rows is NULL — the gate must coalesce to 0 so
    // the documented all-integers contract survives empty batches
    assert(m.getAs[Long]("n_total") == 0L)
    assert(m.getAs[Long]("n_kept") == 0L)
    assert(m.getAs[Long]("kept_tokens") == 0L)
  }

  test("observed metrics surface per micro-batch on a stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[Long](spark)
    val gated = ObservedMetrics.observeGate(
      mem.toDF().toDF("n_chars"), "stream_gate",
      col("n_chars") >= 200, col("n_chars"))
    val q = gated.writeStream.format("noop").start()
    try {
      mem.addData(100L, 250L, 300L)
      q.processAllAvailable()
      val obs = q.lastProgress.observedMetrics.get("stream_gate")
      assert(obs != null, "no stream_gate metrics in progress")
      assert(obs.getAs[Long]("n_total") == 3L)
      assert(obs.getAs[Long]("n_kept") == 2L)
      assert(obs.getAs[Long]("kept_tokens") == 550L)
    } finally q.stop()
  }
}
