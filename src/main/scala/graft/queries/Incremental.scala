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
      |  CAST(SUM(${Quantize.centsSql("value")}) AS BIGINT) sum_vc,
      |  CAST(SUM(${Quantize.centsSql("value")}) AS DOUBLE)
      |    / COUNT(*) / 100.0 AS avg_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** MERGE/upsert as relational algebra: apply a keyed change set onto
    * a base table — matched rows update (balance + delta), unmatched
    * base rows keep, change-only keys insert. A single full-outer join
    * on the key + coalesce projection IS the merge; at cluster scale
    * both sides co-partition (bucket) by the key so the daily merge is
    * one co-located SMJ with no residual shuffle. The base is
    * restricted (custkey % 3 != 0) so all three outcomes occur.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.read(spark, dir, "customer")
      .where(col("c_custkey") % 3 =!= 0)
      .select(
        col("c_custkey").as("bkey"),
        Quantize.cents(col("c_acctbal")).as("bal_cents"))
    val changes = Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey").as("ckey"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("delta_cents"))
    base.join(changes, col("bkey") === col("ckey"), "full")
      .select(
        coalesce(col("bkey"), col("ckey")).as("c_custkey"),
        (coalesce(col("bal_cents"), lit(0L)) +
          coalesce(col("delta_cents"), lit(0L))).as("new_bal_cents"),
        when(col("bkey").isNull, "inserted")
          .when(col("ckey").isNull, "kept")
          .otherwise("updated").as("status"))
      .orderBy("c_custkey")
  }

  def upsertMergeOracle: String =
    s"""WITH base AS (
      |  SELECT c_custkey bkey, ${Quantize.centsSql("c_acctbal")} bal_cents
      |  FROM customer WHERE c_custkey % 3 <> 0),
      |changes AS (
      |  SELECT o_custkey ckey,
      |    SUM(${Quantize.centsSql("o_totalprice")}) delta_cents
      |  FROM orders GROUP BY 1)
      |SELECT COALESCE(bkey, ckey) AS c_custkey,
      |  CAST(COALESCE(bal_cents, 0) + COALESCE(delta_cents, 0)
      |    AS BIGINT) AS new_bal_cents,
      |  CASE WHEN bkey IS NULL THEN 'inserted'
      |       WHEN ckey IS NULL THEN 'kept'
      |       ELSE 'updated' END AS status
      |FROM base FULL OUTER JOIN changes ON bkey = ckey
      |ORDER BY c_custkey""".stripMargin

  /** CDC apply: a keyed change log (upserts AND deletes) collapsed to
    * latest state — the missing half of [[upsertMerge]] (which has no
    * delete semantics). Orders act as the log: each order upserts its
    * customer's record; status-'F' entries are tombstones. Last write
    * per key wins, ordered by (event time, order key); a key whose
    * final entry is a tombstone is ABSENT from the state. One
    * map-side-combinable max-struct aggregate — no per-key sort, no
    * window over the log — so applying a day's CDC stream at 100 TB is
    * a single partial+final shuffle keyed by the primary key.
    */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val log = Tables.read(spark, dir, "orders").select(
      col("o_custkey").as("c_custkey"),
      struct(
        // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast
        // is wall-clock-identity, matching the oracle's epoch_us(CAST)
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderkey").as("okey"),
        (col("o_orderstatus") === "F").as("is_del"),
        Quantize.cents(col("o_totalprice")).as("vc")).as("chg"))
    log.groupBy(col("c_custkey"))
      .agg(max(col("chg")).as("m"))
      .where(!col("m.is_del"))
      .select(
        col("c_custkey"),
        col("m.okey").as("last_order_key"),
        col("m.vc").as("last_total_cents"))
      .orderBy("c_custkey")
  }

  def cdcApplyOracle: String =
    s"""WITH log AS (
      |  SELECT o_custkey c_custkey, o_orderkey okey,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) us,
      |    (o_orderstatus = 'F') is_del,
      |    ${Quantize.centsSql("o_totalprice")} vc
      |  FROM orders),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY c_custkey ORDER BY us DESC, okey DESC) rn
      |  FROM log)
      |SELECT c_custkey, okey AS last_order_key, vc AS last_total_cents
      |FROM ranked WHERE rn = 1 AND NOT is_del
      |ORDER BY c_custkey""".stripMargin

  /** `incremental_join`: delta-join view maintenance — the algebra
    * that keeps a MATERIALIZED JOIN fresh under insertions to both
    * sides without re-joining history:
    * (R∪ΔR)⋈(S∪ΔS) = R⋈S ∪ ΔR⋈S ∪ R⋈ΔS ∪ ΔR⋈ΔS. Here R/S are the
    * stored orders/lineitem slices and ΔR/ΔS the day's inserts (key-
    * mod splits so all four terms are non-empty); the maintained
    * result re-aggregates to the priority grid and the oracle is the
    * PLAIN full join — equality proves the distribution law the
    * incremental pipeline relies on.
    *
    * Why it matters at 100 TB: the R⋈S term is the STORED view (read
    * back, not recomputed — it stands in here to close the algebra);
    * the three delta terms are each driven by a day-sized side, so
    * the daily refresh costs |Δ|-scaled joins (bloom/DPP prune the
    * big probe side to delta keys) instead of the history×history
    * join.
    */
  def incrementalJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.read(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.read(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity")).cast("long").as("qty"))
    val oStored = o.where(col("o_orderkey") % 7 =!= 0)
    val oDelta = o.where(col("o_orderkey") % 7 === 0)
    val lStored = l.where(col("l_linenumber") % 2 === 1)
    val lDelta = l.where(col("l_linenumber") % 2 === 0)
    def join2(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_orderkey") === col("l_orderkey"))
    join2(oStored, lStored)
      .unionByName(join2(oDelta, lStored))
      .unionByName(join2(oStored, lDelta))
      .unionByName(join2(oDelta, lDelta))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  def incrementalJoinOracle: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) n_rows,
      |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) sum_qty
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("incremental_agg", incrementalAgg, Some(incrementalAggOracle)),
    QueryDef(
      "incremental_join", incrementalJoin, Some(incrementalJoinOracle)),
    QueryDef("upsert_merge", upsertMerge, Some(upsertMergeOracle)),
    QueryDef("cdc_apply", cdcApply, Some(cdcApplyOracle)))
}
