package graft.operators

import graft.filters.{FilterCompiler, FilterEval}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core dataflow: every event is paired with each
  * subscription of its subsystem, gated by the subscription's
  * conjunctive filters (evtstrd/dispatcher.py:88-99,
  * evtstrd/listener.py:56-70).
  *
  * Two Spark-native strategies, both shuffle-free on the event side:
  *
  *   - [[compiled]]: subscriptions known at plan time (the reference
  *     compiles filters at subscribe time — evtstrd/http_server.py:150).
  *     The subscription list unrolls into a codegen'd array of
  *     matched-subscription ids + explode: one scan of events, no join,
  *     no shuffle; scales linearly in events at any cluster size.
  *
  *   - [[dynamic]]: subscriptions as data. Broadcast hash equi-join on
  *     subsystem (the analog of the dispatcher's defaultdict bucket
  *     index, dispatcher.py:20) with the residual per-row filter
  *     evaluation. Subscription tables are tiny relative to events, so
  *     broadcast avoids shuffling the 100 TB side entirely.
  */
object Fanout {
  final case class Subscription(
      id: Long,
      subsystem: String,
      filters: Seq[String])

  /** Plan-time-compiled fan-out. Adds a `sub_id` column; events
    * matching several subscriptions are emitted once per match, events
    * matching none are dropped.
    */
  def compiled(
      events: DataFrame,
      subs: Seq[Subscription],
      subsystemCol: Column,
      payloadCol: Column): DataFrame = {
    require(subs.nonEmpty, "at least one subscription")
    val matched = subs.map { s =>
      when(
        subsystemCol === s.subsystem &&
          FilterCompiler.compileAll(s.filters, payloadCol),
        lit(s.id)).otherwise(lit(null).cast("long"))
    }
    events
      .withColumn("sub_id", explode(array_compact(array(matched: _*))))
  }

  /** Runtime fan-out over a subscriptions DataFrame with columns
    * (sub_id: long, subsystem: string, filters: array<string>).
    */
  def dynamic(
      events: DataFrame,
      subscriptions: DataFrame,
      subsystemCol: Column,
      payloadCol: Column): DataFrame = {
    // zero filters match unconditionally, before touching the payload
    // (reference all([]) == True, evtstrd/listener.py:62) — keeps the
    // dynamic path identical to the compiled one on unparseable data
    val matches = udf((json: String, filters: Seq[String]) => {
      val fs = Option(filters).getOrElse(Nil)
      fs.isEmpty || (json != null && FilterEval.matches(json, fs))
    })
    // rename the join key to keep the plan unambiguous when the event
    // side also carries a `subsystem` column (the streaming envelope)
    val subs = subscriptions.withColumnRenamed("subsystem", "__sub_subsystem")
    events
      .join(broadcast(subs), subsystemCol === subs("__sub_subsystem"))
      .where(matches(payloadCol, subs("filters")))
      .drop("__sub_subsystem")
  }
}
