package graft.operators

import graft.filters.FilterCompiler
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
    require(!events.columns.contains("sub_id"),
      "events already carry a sub_id column — fan-out would silently " +
        "overwrite it")
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
    *
    * No Scala UDF anywhere: the payload is parsed to VARIANT once per
    * EVENT row (below the join, so N payload parses — not N x subs),
    * and the residual predicate is the codegen'd
    * [[graft.functions.VariantFilters]] kernel walking that compact
    * binary per (event, subscription) pair. Zero filters match
    * unconditionally, before touching the payload (reference
    * all([]) == True, evtstrd/listener.py:62) — null/unparseable
    * payloads still reach every zero-filter subscription.
    */
  def dynamic(
      events: DataFrame,
      subscriptions: DataFrame,
      subsystemCol: Column,
      payloadCol: Column): DataFrame = {
    // rename the join key to keep the plan unambiguous when the event
    // side also carries a `subsystem` column (the streaming envelope)
    require(
      !events.columns.contains("sub_id") &&
        !events.columns.contains("filters"),
      "events already carry sub_id/filters columns — the subscription " +
        "join would make them ambiguous")
    val subs = subscriptions.withColumnRenamed("subsystem", "__sub_subsystem")
    val fs = subs("filters")
    val noFilters = fs.isNull || size(fs) === 0
    events
      // explode(array(..)) is the usual Generate barrier: the parsed
      // variant materializes once per event row instead of being
      // inlined into each downstream reference by CollapseProject
      .withColumn("__payload_variant", explode(array(try_parse_json(payloadCol))))
      .join(broadcast(subs), subsystemCol === subs("__sub_subsystem"))
      .where(
        noFilters ||
          coalesce(
            graft.functions.VariantFilterFunctions
              .variantFilters(col("__payload_variant"), fs),
            lit(false)))
      // drop the subscription-side filters too: compiled and dynamic
      // are interchangeable strategies (EventStreamServer swaps on
      // listener count), so their output schemas must match — events
      // columns + sub_id, nothing else
      .drop("__sub_subsystem", "__payload_variant")
      .drop(fs)
  }
}
