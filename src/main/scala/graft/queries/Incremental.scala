package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the pattern that keeps a 100 TB
  * pipeline's daily rollup tables fresh without rescanning history.
  * Partial aggregates from two disjoint slices of the fact data (here
  * even/odd event ids, modelling "the stored rollup" + "today's new
  * partition") merge by RE-AGGREGATING the partials — counts sum,
  * sums sum, and derived metrics (averages) recompute from the merged
  * sums rather than being merged themselves (averaging averages is
  * the classic wrong answer this operator exists to avoid).
  *
  * The oracle is the FULL recompute over all rows — equality proves
  * the aggregation is algebraically decomposable, which is the same
  * property that makes Spark's partial+final hash aggregation correct
  * under any partitioning.
  */
object Incremental {

  def incrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(
        col("event_type"),
        to_date(col("ts")).as("d"),
        Quantize.cents(col("value")).as("vc"),
        col("event_id"))
    def partials(slice: DataFrame): DataFrame = slice
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_vc"))
    val stored = partials(ev.where(col("event_id") % 2 === 0))
    val fresh = partials(ev.where(col("event_id") % 2 === 1))
    stored.unionByName(fresh)
      .groupBy(col("event_type"), col("d"))
      .agg(sum(col("n")).as("n"), sum(col("sum_vc")).as("sum_vc"))
      .withColumn(
        "avg_value",
        col("sum_vc").cast("double") / col("n") / 100.0)
      .orderBy("event_type", "d")
  }

  def incrementalAggOracle: String =
    s"""SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
      |  CAST(COUNT(*) AS BIGINT) n,
      |  SUM(${Quantize.centsSql("value")}) sum_vc,
      |  CAST(SUM(${Quantize.centsSql("value")}) AS DOUBLE)
      |    / COUNT(*) / 100.0 AS avg_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("incremental_agg", incrementalAgg, Some(incrementalAggOracle)))
}
