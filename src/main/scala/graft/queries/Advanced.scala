package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Advanced relational operators the reference lacks entirely
  * (SURVEY §2.6): as-of join, banded range join, pivot, exact
  * quantiles, BPE-style subword tokenization, and a custom typed
  * Aggregator (UDAF). Each chooses the scale-correct physical shape:
  * the as-of join is a single windowed pass (no join at all), the
  * range join banded so the join key stays equi (no O(n^2) theta
  * join), the pivot a fixed-width conditional aggregation.
  */
object Advanced {

  /** As-of join: for every purchase event, the most recent click by
    * the same user at or before it. Expressed as one windowed pass
    * over the unioned stream — the idiomatic distributed as-of: no
    * join, one shuffle on user_id.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("purchase", "click"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn(
        "last_click_id",
        last(
          when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn(
        "last_click_ts",
        last(
          when(col("event_type") === "click", col("ts")),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        col("last_click_id"),
        unix_micros(col("last_click_ts")).as("last_click_us"))
      .orderBy("event_id")
  }

  def asofJoinOracle: String =
    """SELECT event_id, user_id, last_click_id, last_click_us FROM (
      |  SELECT event_id, user_id, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) OVER w AS last_click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS) OVER w AS last_click_us
      |  FROM events WHERE event_type IN ('purchase', 'click')
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** Range join: pairs of events by the same user within 60 seconds
    * of each other. Banded: bucket each event to a 60s slot and join
    * on (user, slot) x (user, slot±1) — an equi join Catalyst hash-
    * partitions, instead of an O(n^2) theta join; the residual |dt|
    * predicate filters exactly. The oracle states the same relation
    * as the naive theta join.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val banded = ev.withColumn("slot", expr("us div 60000000"))
    val right = banded
      .select(
        col("user_id"),
        col("event_id").as("b_id"),
        col("us").as("b_us"),
        explode(
          array(col("slot") - 1, col("slot"), col("slot") + 1)).as("slot"))
    banded
      .join(right, Seq("user_id", "slot"))
      .where(
        col("event_id") < col("b_id") &&
          abs(col("b_us") - col("us")) <= 60000000L)
      .select(
        col("user_id"),
        col("event_id").as("a_id"),
        col("b_id"),
        (col("b_us") - col("us")).as("dt_us"))
      .orderBy("user_id", "a_id", "b_id")
  }

  def rangeJoinOracle: String =
    """SELECT a.user_id AS user_id, a.event_id a_id, b.event_id b_id,
      |  epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) dt_us
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))) <= 60000000
      |ORDER BY user_id, a_id, b_id""".stripMargin

  /** Pivot: per-user event-type counts as fixed columns. */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def pivotCounts(spark: SparkSession, dir: String): DataFrame = {
    val pivoted = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes
      .foldLeft(pivoted)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy("user_id")
  }

  def pivotCountsOracle: String = {
    val cols = EventTypes.map(t =>
      s"CAST(COUNT(*) FILTER (event_type = '$t') AS BIGINT) AS \"$t\"")
    s"""SELECT user_id, ${cols.mkString(", ")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Exact quantiles via explicit rank arithmetic (identical formula
    * both engines — no reliance on interpolation-convention parity):
    * median = mean of the two middle values on the ordered column.
    *
    * Computed from a value HISTOGRAM, not a sort: l_quantity has ~50
    * distinct values, so a count per (flag, value) reduces the table
    * to a tiny frame whose cumulative counts locate the two middle
    * ranks. A row_number window partitioned by l_returnflag would
    * funnel the whole table through 3 reducers and fully sort each —
    * the classic low-cardinality-partition skew; the histogram shape
    * is one map-side-combinable shuffle regardless of table size.
    */
  def exactMedian(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window
      .partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("l_returnflag"))
    // rank interval [lo, hi] covered by each distinct value; the two
    // middle ranks r1/r2 fall in 1 or 2 of these tiny intervals
    val ranked = hist
      .withColumn("hi", sum(col("cnt")).over(w))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("r1", expr("(n + 1) div 2"))
      .withColumn("r2", expr("(n + 2) div 2"))
    val contrib =
      (col("r1") >= col("lo") && col("r1") <= col("hi")).cast("long") +
        (col("r2") >= col("lo") && col("r2") <= col("hi")).cast("long")
    ranked
      .withColumn("c", contrib)
      .where(col("c") > 0)
      .groupBy(col("l_returnflag"))
      .agg((sum(col("l_quantity") * col("c")) / sum(col("c"))).as("median_qty"))
      .orderBy("l_returnflag")
  }

  def exactMedianOracle: String =
    """SELECT l_returnflag, SUM(l_quantity) / COUNT(*) AS median_qty FROM (
      |  SELECT l_returnflag, l_quantity,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) n
      |  FROM lineitem)
      |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Exact p50/p90/p99 (discrete order statistics at rank ⌈p·n⌉) per
    * event type, via the same value-histogram rank arithmetic as
    * exact_median — generalized to arbitrary percentiles: each
    * distinct value covers a rank interval [lo, hi]; the order
    * statistic at rank r is the single value whose interval contains
    * r. All ranks are exact integer arithmetic ((p·n ceil)-divisions),
    * so both engines pick the identical element — no float quantile
    * interpolation to disagree over.
    *
    * Scale shape: one map-side-combinable histogram shuffle; windows
    * run over the HISTOGRAM (group × distinct-value rows), never the
    * fact table; the final pick is a tiny filtered aggregate.
    */
  def percentileReport(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.events(spark, dir)
      .select(
        col("event_type"), Quantize.cents(col("value")).as("vc"))
      .groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("hi", sum(col("cnt")).over(w))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    def atRank(r: org.apache.spark.sql.Column) =
      max(when(r >= col("lo") && r <= col("hi"), col("vc"))).cast("double") / 100.0
    ranked
      .groupBy(col("event_type"))
      .agg(
        atRank(expr("(n + 1) div 2")).as("p50"),
        atRank(expr("(9 * n + 9) div 10")).as("p90"),
        atRank(expr("(99 * n + 99) div 100")).as("p99"))
      .orderBy("event_type")
  }

  def percentileReportOracle: String =
    s"""WITH v AS (
      |  SELECT event_type, ${Quantize.centsSql("value")} vc FROM events),
      |h AS (SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) cnt FROM v GROUP BY 1, 2),
      |r AS (
      |  SELECT *, SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) hi,
      |    SUM(cnt) OVER (PARTITION BY event_type) n
      |  FROM h),
      |i AS (SELECT *, hi - cnt + 1 lo FROM r)
      |SELECT event_type,
      |  CAST(MAX(CASE WHEN (n + 1) // 2 BETWEEN lo AND hi THEN vc END) AS DOUBLE) / 100.0 p50,
      |  CAST(MAX(CASE WHEN (9 * n + 9) // 10 BETWEEN lo AND hi THEN vc END) AS DOUBLE) / 100.0 p90,
      |  CAST(MAX(CASE WHEN (99 * n + 99) // 100 BETWEEN lo AND hi THEN vc END) AS DOUBLE) / 100.0 p99
      |FROM i GROUP BY event_type ORDER BY event_type""".stripMargin

  /** BPE-style subword tokenization: letter runs, digit runs, and
    * punctuation runs as separate tokens; global top-20 subwords.
    */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      .select(
        explode(
          regexp_extract_all(
            lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"),
            lit(0))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  def bpeTokensOracle: String =
    """SELECT token, CAST(COUNT(*) AS BIGINT) cnt FROM (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) token
      |  FROM documents)
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  /** Custom typed Aggregator (UDAF): exact weighted mean via integer
    * cent arithmetic — order-independent, so distributed partial
    * aggregation is deterministic.
    */
  object WeightedMean
      extends Aggregator[(Double, Double), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + math.round(a._1 * 100), b._2 + math.round(a._2 * 100))
    def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    def finish(b: (Long, Long)): Double = b._1.toDouble / b._2
    def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  def udafWeighted(spark: SparkSession, dir: String): DataFrame = {
    val wm = udaf(WeightedMean)
    Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        wm(col("l_extendedprice"), col("l_quantity"))
          .as("price_per_qty"))
      .orderBy("l_returnflag")
  }

  def udafWeightedOracle: String =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
      |    / SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS price_per_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Quantile-sketch counterpart of `sketch_distinct`: per event
    * type, `approx_percentile`'s p50 (a KLL/GK-family sketch whose
    * rank error is ≤ n/accuracy) is audited against the exact rank
    * interval of the element it returned, and the bound surfaces as
    * a boolean the oracle pins TRUE — sketch internals are
    * engine-specific, so the raw estimate can't hash-match DuckDB,
    * but the error CONTRACT can. Exact quantiles live in
    * `percentile_report`; this row proves the sketch path honors its
    * bound (the 100 TB answer when an exact histogram pass is too
    * expensive).
    *
    * Scale shape: one sketch aggregation pass (map-side partial
    * sketches merged per group), then one conditional-aggregate pass
    * joined to the 5-row sketch result by broadcast — no shuffle of
    * the fact table beyond the two group-by-type aggregates.
    */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
    val acc = 1000L
    val sk = base.groupBy(col("event_type"))
      .agg(percentile_approx(col("vc"), lit(0.5), lit(acc)).as("ap50"))
    val target = call_function("div", col("n_events") + 1, lit(2L))
    val err = call_function("div", col("n_events"), lit(acc)) + lit(1L)
    base.join(broadcast(sk), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("vc") < col("ap50"), 1L).otherwise(0L))
          .as("rank_lo"),
        sum(when(col("vc") <= col("ap50"), 1L).otherwise(0L))
          .as("rank_hi"))
      .select(
        col("event_type"),
        col("n_events"),
        (target >= col("rank_lo") + 1 - err &&
          target <= col("rank_hi") + err).as("p50_in_bounds"))
      .orderBy("event_type")
  }

  def sketchQuantilesOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) n_events,
      |  TRUE p50_in_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `tokenizer_fertility`: subword-per-word fertility and chars-per-
    * subword by language — the tokenizer-efficiency readout that
    * decides whether a tokenizer (or a language's representation in
    * it) is wasting context budget: high fertility = more subwords
    * per whitespace word = fewer effective words per sequence.
    * Whitespace words vs the BPE-ish run tokenizer (`bpe_tokens`'
    * letter/digit/punct runs), integer ppm/milli.
    *
    * Plan shape: one narrow scan computes both token counts per row
    * (no explode — only the array SIZES leave the projection), then
    * one language-grain aggregate. Map-side-combinable, zero joins.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val ws = size(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      .cast("long")
    val sub = size(
      regexp_extract_all(
        lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")
    Tables.read(spark, dir, "documents")
      .select(
        col("lang"), ws.as("n_ws"), sub.as("n_sub"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("ws_tokens"),
        sum(col("n_sub")).as("sub_tokens"),
        sum(col("n_chars")).as("chars"))
      .select(
        col("lang"), col("n_docs"), col("ws_tokens"), col("sub_tokens"),
        expr("sub_tokens * 1000000 div ws_tokens").as("fertility_ppm"),
        expr("chars * 1000 div sub_tokens").as("chars_per_sub_milli"))
      .orderBy("lang")
  }

  def tokenizerFertilityOracle: String =
    """WITH t AS (
      |  SELECT lang,
      |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) n_ws,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) n_sub,
      |    length(text) n_chars
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) n_docs,
      |  CAST(sum(n_ws) AS BIGINT) ws_tokens,
      |  CAST(sum(n_sub) AS BIGINT) sub_tokens,
      |  CAST(sum(n_sub) AS BIGINT) * 1000000 // CAST(sum(n_ws) AS BIGINT) fertility_ppm,
      |  CAST(sum(n_chars) AS BIGINT) * 1000 // CAST(sum(n_sub) AS BIGINT) chars_per_sub_milli
      |FROM t GROUP BY 1 ORDER BY lang""".stripMargin

  /** `weighted_median`: exact LOWER weighted median of extended price
    * per return flag, weighted by quantity — the robust center a
    * revenue distribution wants when a row's mass varies (the plain
    * exact_median treats a 1-unit and 50-unit line identically).
    * Stated rule: smallest value whose cumulative weight reaches half
    * the total (2·cum ≥ W, pure integer — no float half). The flag
    * partitions are fact-sized, so cumulative weights ride the shared
    * [[Statistics.lowerMedianBy]] kernel — (flag, value-shard)
    * partitioned running sums plus triangular cross-shard offsets
    * over the per-flag shard-total grid — never a 3-partition window
    * over a fact-sized histogram. One histogram shuffle; everything
    * after is shard-grid-sized.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    // NOT checkpointed (median_merge's lesson, re-proven at the 1000×
    // replica): a fact-grain localCheckpoint pins deserialized row
    // blocks — ~20 GB at 600M rows — and the block-manager/GC churn
    // stalled the driver past the executor's heartbeat budget,
    // killing the SparkContext mid-run. The kernel's bounds/grid/
    // slice passes each re-read a 3-column pruned parquet scan with
    // cheap cent arithmetic — linear, spill-free, and cheaper than
    // materializing the projection at any replica scale
    val rows = Tables.read(spark, dir, "lineitem")
      .select(
        col("l_returnflag").as("flag"),
        Quantize.cents(col("l_extendedprice")).as("vc"),
        Quantize.cents(col("l_quantity")).as("wt"))
    Statistics.lowerMedianBy(rows, Seq("flag"), "vc", Some("wt"))
      .select(
        col("flag"), col("med").as("wmedian_cents"),
        col("wtot").as("total_weight"))
      .orderBy("flag")
  }

  def weightedMedianOracle: String =
    s"""WITH h AS (
       |  SELECT l_returnflag flag, ${Quantize.centsSql("l_extendedprice")} vc,
       |    CAST(SUM(${Quantize.centsSql("l_quantity")}) AS BIGINT) w
       |  FROM lineitem GROUP BY 1, 2),
       |c AS (
       |  SELECT flag, vc, w,
       |    CAST(SUM(w) OVER (PARTITION BY flag ORDER BY vc
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum,
       |    CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) wtot
       |  FROM h)
       |SELECT flag, min(vc) wmedian_cents, max(wtot) total_weight
       |FROM c WHERE cum * 2 >= wtot
       |GROUP BY flag ORDER BY flag""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "weighted_median", weightedMedian, Some(weightedMedianOracle)),
    QueryDef(
      "tokenizer_fertility", tokenizerFertility,
      Some(tokenizerFertilityOracle)),
    QueryDef("asof_join", asofJoin, Some(asofJoinOracle)),
    QueryDef("range_join", rangeJoin, Some(rangeJoinOracle)),
    QueryDef("pivot_counts", pivotCounts, Some(pivotCountsOracle)),
    QueryDef("exact_median", exactMedian, Some(exactMedianOracle)),
    QueryDef("percentile_report", percentileReport, Some(percentileReportOracle)),
    QueryDef("bpe_tokens", bpeTokens, Some(bpeTokensOracle)),
    QueryDef("udaf_weighted", udafWeighted, Some(udafWeightedOracle)),
    QueryDef(
      "sketch_quantiles",
      sketchQuantiles,
      Some(sketchQuantilesOracle)))
}
