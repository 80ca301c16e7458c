package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Free pipeline counters via `Dataset.observe` (CollectMetrics).
  *
  * A cleaning funnel normally pays a second aggregation pass (or a
  * driver-side count per stage) to report how many rows/tokens each
  * gate dropped. `observe` attaches the counters to the SAME physical
  * plan: the metrics are folded into the pass that already runs, cost
  * zero extra scans and zero extra shuffles, and surface after any
  * action through `QueryExecution.observedMetrics` (batch) or the
  * streaming listener's `QueryProgress.observedMetrics`. At 100 TB
  * this is the difference between "the pipeline reports its own
  * funnel" and "re-scan the corpus to count survivors".
  */
object ObservedMetrics {

  /** Attach total/kept/kept-token counters for a keep-gate to `df`
    * without changing its rows. All counters are exact integers.
    */
  def observeGate(
      df: DataFrame,
      name: String,
      kept: Column,
      tokens: Column): DataFrame =
    df.observe(
      name,
      count(lit(1)).as("n_total"),
      // sum over zero rows is NULL — coalesce so an empty input (or
      // empty micro-batch) still reports exact integer zeros
      coalesce(sum(kept.cast("long")), lit(0L)).as("n_kept"),
      coalesce(sum(when(kept, tokens).otherwise(lit(0L))), lit(0L))
        .as("kept_tokens"))

  /** The metrics row recorded for `name` by the last action on `df`,
    * if that action has completed. Metrics attach to the
    * QueryExecution that actually ran: invoke the action on this very
    * dataset (`collect`/`write`) — `count()` executes a derived
    * `groupBy().count()` plan and records nothing here.
    */
  def lastMetrics(df: DataFrame, name: String): Option[Row] =
    df.queryExecution.observedMetrics.get(name)
}
