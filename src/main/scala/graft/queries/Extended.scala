package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second-round gap-fill inventory: grouping sets, lag/lead, ntile,
  * ordered string aggregation, decorrelated scalar subqueries, tf-df
  * term ranking, edit-distance near-dup, salted skew joins, and the
  * Spark 4 VARIANT path for semi-structured payloads. Everything
  * deterministic (integer/decimal-exact aggregates, total orderings)
  * for the DuckDB oracle.
  *
  * Scale notes (100 TB): every aggregation here is partial+final
  * combinable; ntile's total order is computed by histogram rank
  * arithmetic (see [[ntileBuckets]]) rather than a single-partition
  * global window; the skew join demonstrates key salting for hot keys
  * too large to broadcast.
  */
object Extended {

  // --- explicit GROUPING SETS (beyond rollup/cube) ---

  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")

  def groupingSetsOracle: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY rf, ls""".stripMargin

  // --- lag/lead: per-user inter-event gaps ---

  def windowLag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn(
        "gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(col("gap_us")).as("n_gaps"),
        sum(col("gap_us")).as("total_gap_us"))
      .orderBy("user_id")
  }

  def windowLagOracle: String =
    """SELECT user_id, CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
      |  CAST(SUM(gap_us) AS BIGINT) AS total_gap_us
      |FROM (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS gap_us
      |  FROM events)
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- ntile quartiles over a total order ---

  /** Quartile buckets WITHOUT a global window (the r2 shape was
    * `ntile(4) over (order by ...)` — Spark funnels the whole table
    * through ONE partition for an unpartitioned window, a
    * scale-killer). ntile's per-bucket count is pure arithmetic on the
    * total row count, and because the ordering is primarily by price,
    * each bucket's min/max price is an ORDER STATISTIC of the price
    * multiset at the bucket-boundary ranks. Those 6 interior order
    * statistics are located with the exact_median histogram trick
    * (Advanced.exactMedian), two-level so it scales past low-
    * cardinality columns:
    *
    *   1. coarse value histogram (price div 1000 bins) -> each target
    *      rank's bin, via cumulative bin counts (tiny triangular
    *      broadcast self-join over ~B bins — no window at all);
    *   2. exact per-value sub-histogram INSIDE the <=6 boundary bins
    *      only (each ~n/B rows), windowed per-bin (partitioned, tiny);
    *   3. rank-interval lookup: the value whose [lo, hi] interval
    *      covers the target rank is the order statistic.
    *
    * Cost at 100 TB: a few narrow single-column scans + KB-sized
    * aggregates, vs. sorting the table on one reducer. The oracle
    * still states plain `ntile(4)`.
    */
  def ntileBuckets(spark: SparkSession, dir: String): DataFrame =
    quartileBuckets(
      Tables.read(spark, dir, "orders").select(col("o_totalprice").as("p")),
      binWidth = 1000.0)

  /** The reusable core: quartiles of a single-column (`p`) relation.
    * `binWidth` trades coarse-histogram size against boundary-bin
    * size; property-checked against Spark's own window ntile on
    * random data (QueriesSpec).
    */
  private[queries] def quartileBuckets(
      orders: DataFrame, binWidth: Double): DataFrame = {
    val binCol = floor(col("p") / binWidth).cast("long")

    // coarse histogram + cumulative rank interval [lo, hi] per bin
    val bins = orders.groupBy(binCol.as("bin")).agg(count(lit(1)).as("cnt"))
    val cum = bins
      .join(
        broadcast(bins.select(col("bin").as("b2"), col("cnt").as("c2"))),
        col("b2") <= col("bin"))
      .groupBy(col("bin"), col("cnt"))
      .agg(sum(col("c2")).as("hi"))
      .withColumn("lo", col("hi") - col("cnt") + 1)

    // the 6 interior boundary ranks: bucket i (1-based) holds
    // n div 4 (+1 while i <= n % 4) rows, so its last row has global
    // rank cum_i = i*(n div 4) + least(i, n mod 4); targets are the
    // (rank, which-bucket, min-or-max) roles of cum_i and cum_i + 1
    val tot = orders.agg(
      count(lit(1)).as("n"), min(col("p")).as("gmin"), max(col("p")).as("gmax"))
    val targets = tot
      .select(col("n"), explode(expr("array(1L, 2L, 3L)")).as("i"))
      .withColumn(
        "cum", col("i") * expr("n div 4") + least(col("i"), expr("n % 4")))
      .select(explode(array(
        struct(col("cum").as("r"), col("i").as("bucket"), lit("hi").as("kind")),
        struct((col("cum") + 1).as("r"), (col("i") + 1).as("bucket"),
          lit("lo").as("kind")))).as("t"))
      .select(col("t.r").as("r"), col("t.bucket").as("bucket"), col("t.kind").as("kind"))

    // bins containing a target rank (<= 6 of them), then the exact
    // per-value histogram inside those bins only; the window is
    // partitioned by bin and each partition holds ~n/B rows
    val hotBins = cum
      .join(broadcast(targets), col("r") >= col("lo") && col("r") <= col("hi"))
      .select(col("bin"), (col("lo") - 1).as("bin_base"))
      .distinct()
    val wb = Window.partitionBy(col("bin")).orderBy(col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fine = orders
      .withColumn("bin", binCol)
      .join(broadcast(hotBins), "bin")
      .groupBy(col("bin"), col("bin_base"), col("p"))
      .agg(count(lit(1)).as("c"))
      .withColumn("fhi", col("bin_base") + sum(col("c")).over(wb))
      .withColumn("flo", col("fhi") - col("c") + 1)
    val boundaryVals = fine
      .join(broadcast(targets), col("r") >= col("flo") && col("r") <= col("fhi"))
      .groupBy(col("bucket"))
      .agg(
        min(when(col("kind") === "lo", col("p"))).as("lo_val"),
        max(when(col("kind") === "hi", col("p"))).as("hi_val"))

    // assemble: counts by rank arithmetic; bucket 1 min / bucket 4 max
    // are the global extremes
    tot
      .select(
        col("n"), col("gmin"), col("gmax"),
        explode(expr("array(1L, 2L, 3L, 4L)")).as("bucket"))
      .withColumn(
        "bn", expr("n div 4") + (col("bucket") <= expr("n % 4")).cast("long"))
      .where(col("bn") > 0) // n < 4: ntile emits no row for empty buckets
      .join(broadcast(boundaryVals), Seq("bucket"), "left")
      .select(
        col("bucket"),
        col("bn").as("n"),
        coalesce(col("lo_val"), col("gmin")).as("min_price"),
        coalesce(col("hi_val"), col("gmax")).as("max_price"))
      .orderBy("bucket")
  }

  def ntileBucketsOracle: String =
    """SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
      |FROM (
      |  SELECT o_totalprice,
      |    CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS bucket
      |  FROM orders)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  // --- ordered string aggregation per group ---

  def stringAggNations(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(
        count(lit(1)).as("n"),
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
      .orderBy("nationkey")

  def stringAggNationsOracle: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  string_agg(c_name, ',' ORDER BY c_name) AS names
      |FROM customer GROUP BY 1 ORDER BY nationkey""".stripMargin

  // --- correlated scalar subquery, decorrelated as a window ---

  /** "Orders above their customer's average order value" — the
    * correlated-subquery shape, decorrelated into one pass with
    * window aggregates (no per-row re-aggregation). Exactness: the
    * comparison is price * n > sum (decimal), never a divided
    * average.
    */
  def aboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    Tables.read(spark, dir, "orders")
      .withColumn("s", sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn(
        "above",
        (col("o_totalprice").cast(DecimalType(18, 2)) * col("n") > col("s"))
          .cast("long"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("above")).as("n_above"))
      .orderBy("o_custkey")
  }

  def aboveAvgOrdersOracle: String =
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(above) AS BIGINT) AS n_above
      |FROM (
      |  SELECT o_custkey,
      |    CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) * COUNT(*) OVER w
      |              > SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
      |         THEN 1 ELSE 0 END AS above
      |  FROM orders WINDOW w AS (PARTITION BY o_custkey))
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // --- tf/df term ranking (the integer-exact core of tf-idf) ---

  /** Top term per document by (term frequency desc, document
    * frequency asc, term asc) — the tf-idf ranking with its float
    * log removed: for a single document's terms, ordering by
    * (tf, -df) ranks identically to tf * log(N/df) whenever tf and
    * df alone decide, and stays integer-exact for the oracle.
    */
  def topTerm(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.read(spark, dir, "documents")
      .select(
        col("doc_id"),
        explode(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
          .as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, "term")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
      .orderBy("doc_id")
  }

  def topTermOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |r AS (
      |  SELECT doc_id, term, tf, df,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS rn
      |  FROM tf JOIN df USING (term))
      |SELECT doc_id, term, tf, df FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // --- edit-distance near-dup over adjacent documents ---

  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.read(spark, dir, "documents")
    val a = docs.select(col("doc_id").as("a"), col("text").as("ta"))
    val b = docs.select((col("doc_id") - 1).as("a"), col("doc_id").as("b"),
      col("text").as("tb"))
    a.join(b, "a")
      .select(
        col("a"), col("b"),
        levenshtein(
          substring(col("ta"), 1, 40), substring(col("tb"), 1, 40)).cast("long")
          .as("dist"))
      .orderBy("a")
  }

  def nearDupPairsOracle: String =
    """SELECT a.doc_id AS a, b.doc_id AS b,
      |  CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT) AS dist
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY a""".stripMargin

  // --- salted join: hot-key fan-out when the build side can't broadcast ---

  /** The fact side's 5 event types would funnel a 100 TB shuffle join
    * into 5 reducers; salting replicates each dim row SALT ways and
    * spreads each hot key across SALT reducers. (When the dim side
    * fits in memory a broadcast join is the simpler answer — this is
    * the pattern for when it does not.) Result is identical to the
    * unsalted join, which is what the oracle states.
    */
  private val Salt = 8

  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dim = ev.groupBy(col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    val salted = ev
      .withColumn("salt", pmod(col("event_id"), lit(Salt)).cast("int"))
      .join(dim.hint("shuffle_hash"), Seq("event_type", "salt"))
    salted
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), min(col("first_event_id")).as("first_event_id"))
      .orderBy("event_type")
  }

  def skewJoinOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MIN(event_id) AS first_event_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Schema census of a semi-structured column: which keys appear,
    * how often, across how many event types — the first question
    * asked of any schemaless payload field before choosing what to
    * shred into real columns. `json_object_keys` explodes top-level
    * keys narrowly; one wordcount-shaped aggregate follows. Null or
    * invalid JSON contributes no rows on either engine.
    */
  def jsonKeysStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        explode(json_object_keys(col("props"))).as("key"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy("key")

  def jsonKeysStatsOracle: String =
    """SELECT t.key, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) n_types
      |FROM events, unnest(json_keys(props)) AS t(key)
      |GROUP BY t.key ORDER BY t.key""".stripMargin

  // --- Spark 4 VARIANT path for semi-structured payloads ---

  /** Typed extraction through the binary VARIANT encoding (parse
    * once, probe many) — the modern engine shape for schemaless JSON
    * columns; the oracle states the same result via JSON text
    * operators.
    */
  def variantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        try_variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  def variantExtractOracle: String =
    """SELECT event_type, CAST(COUNT(k) AS BIGINT) AS n_k,
      |  CAST(SUM(k) AS BIGINT) AS sum_k
      |FROM (SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- time spine: resample to a dense hourly grid, zero-filling gaps ---

  /** Dense (hour × event_type) grid over the observed range with
    * zero-filled gaps — the resample/gap-fill primitive every
    * time-series feature pipeline needs. The spine generates from the
    * global min/max (one tiny agg), cross-joins the type dimension,
    * and left-joins the hourly counts; at scale the spine side is
    * dimension-sized (hours × types), so it broadcasts.
    */
  def timeSpine(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(
        (unix_timestamp(date_trunc("hour", col("ts")))).as("hour_start"),
        col("event_type"))
    // ONE scan of the fact table: bounds and the type dimension both
    // derive from the (dimension-sized) counts aggregate, not from
    // separate re-scans
    val counts = ev.groupBy(col("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = counts.agg(
      min(col("hour_start")).as("lo"), max(col("hour_start")).as("hi"))
    val hours = bounds.select(
      explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_start"))
    val types = counts.select(col("event_type")).distinct()
    hours.crossJoin(types)
      .join(counts, Seq("hour_start", "event_type"), "left")
      .select(
        col("hour_start"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("hour_start", "event_type")
  }

  def timeSpineOracle: String =
    """WITH ev AS (
      |  SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 1000000 AS hour_start,
      |    event_type
      |  FROM events),
      |bounds AS (SELECT min(hour_start) lo, max(hour_start) hi FROM ev),
      |hours AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_start FROM bounds),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |counts AS (
      |  SELECT hour_start, event_type, CAST(COUNT(*) AS BIGINT) n
      |  FROM ev GROUP BY 1, 2)
      |SELECT h.hour_start AS hour_start, t.event_type AS event_type, COALESCE(c.n, 0) AS n
      |FROM hours h CROSS JOIN types t
      |LEFT JOIN counts c ON c.hour_start = h.hour_start AND c.event_type = t.event_type
      |ORDER BY h.hour_start, t.event_type""".stripMargin

  // --- per-key gap fill: each key densifies its OWN observed span ---

  /** Per-key densification: every key's series zero-fills its OWN
    * [min, max] hour range — unlike [[timeSpine]]'s single global
    * grid, which is wrong when entities live over disjoint spans (a
    * device first seen in June must not emit zero-rows for January).
    * The spine explodes from the per-key span aggregate — rows scale
    * with keys × their span, never with the fact table — and the
    * value join co-partitions on (key, hour): one aggregate shuffle,
    * one join shuffle, no cross join, no global sequence.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"),
      Quantize.cents(col("value")).as("vc"))
    // ONE fact scan: spans derive from the counts aggregate
    val counts = ev.groupBy(col("event_type"), col("hour_start"))
      .agg(count(lit(1)).as("n"), sum(col("vc")).as("sum_vc"))
    val spine = counts.groupBy(col("event_type"))
      .agg(min(col("hour_start")).as("lo"), max(col("hour_start")).as("hi"))
      .select(
        col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_start"))
    spine.join(counts, Seq("event_type", "hour_start"), "left")
      .select(
        col("event_type"), col("hour_start"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_vc"), lit(0L)).as("sum_vc"))
      .orderBy("event_type", "hour_start")
  }

  def gapFillOracle: String =
    s"""WITH ev AS (
      |  SELECT event_type,
      |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) // 1000000 AS hour_start,
      |    ${Quantize.centsSql("value")} AS vc
      |  FROM events),
      |counts AS (
      |  SELECT event_type, hour_start, CAST(COUNT(*) AS BIGINT) n,
      |    CAST(SUM(vc) AS BIGINT) sum_vc
      |  FROM ev GROUP BY 1, 2),
      |spine AS (
      |  SELECT event_type, unnest(range(lo, hi + 3600, 3600)) AS hour_start
      |  FROM (SELECT event_type, min(hour_start) lo, max(hour_start) hi
      |        FROM counts GROUP BY 1))
      |SELECT s.event_type, s.hour_start, COALESCE(c.n, 0) n,
      |  COALESCE(c.sum_vc, 0) sum_vc
      |FROM spine s LEFT JOIN counts c
      |  ON c.event_type = s.event_type AND c.hour_start = s.hour_start
      |ORDER BY 1, 2""".stripMargin

  // --- lag-based sessionization (gap > 30 min starts a new session) ---

  /** The classic sessionize-by-inactivity composition: lag to detect
    * gaps, running sum to number sessions — all inside one
    * user-partitioned window pass (same shuffle the session_window
    * streaming operator uses, but expressed relationally).
    */
  def sessionizeLag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn(
        "new_session",
        when(
          lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"))
      .agg(
        max(col("session_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  def sessionizeLagOracle: String =
    """SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts2, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM (
      |    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts2,
      |      CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |             OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |             OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |             > 1800000000
      |        THEN 1 ELSE 0 END AS new_session
      |    FROM events))
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- interval-overlap join (banded by day, residual overlap) ---

  /** Interval × interval OVERLAP join — the other range-join family
    * ([[Advanced.rangeJoin]] is point-in-band): each user's daily
    * activity interval [first,last event] against each event type's
    * daily "incident window" (first 30 min of that type's day).
    * Banding by day turns the O(n·m) interval comparison into an
    * equi-join on the band key with the overlap residual
    * (`a_start <= b_end AND b_start <= a_end`) evaluated only inside
    * the band; intervals here are day-clipped by construction, and a
    * cross-band interval would explode to its covered bands exactly
    * like range_join's slot explode. The incident side is
    * dimension-sized (types × days) so it broadcasts — the user-day
    * side never shuffles past its own aggregate.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("d", to_date(col("ts")))
    val userDay = ev.groupBy(col("user_id"), col("d"))
      .agg(min(col("us")).as("a_start"), max(col("us")).as("a_end"))
    val incidents = ev.groupBy(col("event_type"), col("d"))
      .agg(min(col("us")).as("b_start"))
      .withColumn("b_end", col("b_start") + lit(1800L * 1000000L))
    userDay.join(broadcast(incidents), Seq("d"))
      .where(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .select(
        col("user_id"), col("d"), col("event_type"),
        greatest(col("a_start"), col("b_start")).as("ov_start"),
        least(col("a_end"), col("b_end")).as("ov_end"))
      .withColumn("ov_us", col("ov_end") - col("ov_start"))
      .orderBy("user_id", "d", "event_type")
  }

  def intervalJoinOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) d,
      |    epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events),
      |user_day AS (
      |  SELECT user_id, d, MIN(us) a_start, MAX(us) a_end
      |  FROM ev GROUP BY 1, 2),
      |incidents AS (
      |  SELECT event_type, d, MIN(us) b_start,
      |    MIN(us) + 1800000000 AS b_end
      |  FROM ev GROUP BY 1, 2)
      |SELECT u.user_id, u.d, i.event_type,
      |  GREATEST(a_start, b_start) ov_start,
      |  LEAST(a_end, b_end) ov_end,
      |  LEAST(a_end, b_end) - GREATEST(a_start, b_start) AS ov_us
      |FROM user_day u JOIN incidents i ON u.d = i.d
      |WHERE a_start <= b_end AND b_start <= a_end
      |ORDER BY u.user_id, u.d, i.event_type""".stripMargin

  /** Session-GRAIN output — the table the per-user rollup
    * ([[sessionizeLag]]) summarizes away: one row per (user, session)
    * with its interval, duration, event count and value sum. Same
    * single user-partitioned window pass to number sessions, then one
    * aggregate keyed by (user, session) — co-partitioned with the
    * window's own shuffle, so the session table costs nothing extra at
    * scale. Restricted to user_id < 40 to keep the oracle row count
    * stable.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .where(col("user_id") < 40)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn(
        "new_session",
        when(
          lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("us")).as("start_us"),
        max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(Quantize.cents(col("value"))).as("sum_cents"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "session_id")
  }

  def sessionStatsOracle: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) us,
      |    ${Quantize.centsSql("value")} vc
      |  FROM events WHERE user_id < 40),
      |flagged AS (
      |  SELECT *, CASE WHEN LAG(us) OVER w IS NULL
      |      OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT *, CAST(SUM(new_session) OVER (
      |    PARTITION BY user_id ORDER BY us, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) session_id
      |  FROM flagged)
      |SELECT user_id, session_id, MIN(us) start_us, MAX(us) end_us,
      |  CAST(COUNT(*) AS BIGINT) n_events,
      |  CAST(SUM(vc) AS BIGINT) sum_cents,
      |  MAX(us) - MIN(us) AS duration_us
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** `peak_concurrency`: maximum simultaneous sessions per day — the
    * sweep-line interval-aggregation operator (peak concurrent
    * viewers / connections / capacity sizing) the interval_join
    * family doesn't cover. Sessions come from the same 30-minute-gap
    * sessionization as session_stats (all users), treated as CLOSED
    * micros intervals [start_us, end_us].
    *
    * Plan shape: the classic sweep needs a GLOBAL ordered prefix sum
    * — banned — so the sweep is day-partitioned: each session
    * explodes into the days it covers (bounded: a session spans at
    * most a handful of days), contributing +1 at max(start, the
    * day's midnight) and -1 at end_us+1 only when that instant still
    * falls inside the same day (a session running past midnight
    * keeps its slot to the day's last instant and re-enters the next
    * day as a fresh midnight +1). Deltas AGGREGATE per (day, t)
    * before the window — same-instant end/start cancellation IS the
    * half-open semantics, and the interchangeable-row tie hazard
    * disappears because ties no longer exist. The running sum is a
    * day-PARTITIONED window over the per-day event grid; output is
    * one row per day. At 100 TB the only fact-sized steps are the
    * sessionization window (user-partitioned) and the delta
    * aggregate.
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // explicit-width repartition on the window key tried and REVERTED
    // (round 12): pinning the sessionize exchange at session
    // parallelism to defeat AQE's 4-partition coalesce measured
    // 1.38 -> 2.27 s in a matched A/B — the wide exchange plus
    // uncoalesced window tasks cost more than the serial tail saved
    val sessions = Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn(
        "new_session",
        when(
          lag(col("us"), 1).over(w).isNull ||
            col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    dailyPeakOf(sessions)
  }

  /** The day-partitioned sweep core over ANY closed-interval relation
    * (start_us, end_us) — per covered day: peak simultaneous
    * intervals and the count of intervals active that day. Also
    * model-checked by `SweepPropertySpec` against a brute-force
    * per-instant counter on seeded random interval sets (midnight
    * crossings included).
    */
  private[queries] def dailyPeakOf(sessions: DataFrame): DataFrame = {
    val plus = sessions
      .select(
        explode(sequence(
          to_date(timestamp_micros(col("start_us"))),
          to_date(timestamp_micros(col("end_us"))),
          expr("interval 1 day"))).as("d"),
        col("start_us"))
      .select(
        col("d"),
        greatest(
          col("start_us"),
          unix_micros(to_timestamp(col("d")))).as("t"),
        lit(1L).as("delta"))
    val minus = sessions
      .where(
        to_date(timestamp_micros(col("end_us") + 1)) ===
          to_date(timestamp_micros(col("end_us"))))
      .select(
        to_date(timestamp_micros(col("end_us"))).as("d"),
        (col("end_us") + 1).as("t"),
        lit(-1L).as("delta"))
    val net = plus.unionByName(minus)
      .groupBy(col("d"), col("t"))
      .agg(sum(col("delta")).as("net"), sum(when(col("delta") === 1, 1L)).as("starts"))
    val wd = Window.partitionBy(col("d")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    net
      .withColumn("conc", sum(col("net")).over(wd))
      .groupBy(col("d"))
      .agg(
        max(col("conc")).as("peak"),
        sum(coalesce(col("starts"), lit(0L))).as("n_sessions"))
      .orderBy("d")
  }

  def peakConcurrencyOracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) us
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN LAG(us) OVER w IS NULL
      |      OR us - LAG(us) OVER w > 1800000000 THEN 1 ELSE 0 END new_session
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (
      |  SELECT user_id,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) session_id, us
      |  FROM flagged),
      |iv AS (
      |  SELECT user_id, session_id, MIN(us) start_us, MAX(us) end_us
      |  FROM sess GROUP BY 1, 2),
      |plus AS (
      |  SELECT CAST(unnest(generate_series(
      |      CAST(make_timestamp(start_us) AS DATE),
      |      CAST(make_timestamp(end_us) AS DATE),
      |      INTERVAL 1 DAY)) AS DATE) d,
      |    start_us, end_us
      |  FROM iv),
      |deltas AS (
      |  SELECT d,
      |    GREATEST(start_us, epoch_us(CAST(d AS TIMESTAMP))) t,
      |    CAST(1 AS BIGINT) delta
      |  FROM plus
      |  UNION ALL
      |  SELECT CAST(make_timestamp(end_us) AS DATE) d, end_us + 1,
      |    CAST(-1 AS BIGINT)
      |  FROM iv
      |  WHERE CAST(make_timestamp(end_us + 1) AS DATE)
      |      = CAST(make_timestamp(end_us) AS DATE)),
      |net AS (
      |  SELECT d, t, CAST(SUM(delta) AS BIGINT) net,
      |    CAST(SUM(CASE WHEN delta = 1 THEN 1 END) AS BIGINT) starts
      |  FROM deltas GROUP BY 1, 2),
      |swept AS (
      |  SELECT d, starts, CAST(SUM(net) OVER (
      |    PARTITION BY d ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) conc
      |  FROM net)
      |SELECT d, MAX(conc) peak,
      |  CAST(SUM(COALESCE(starts, 0)) AS BIGINT) n_sessions
      |FROM swept GROUP BY d ORDER BY d""".stripMargin

  /** `fifo_match`: FIFO flow matching (cost-basis assignment /
    * inventory consumption): per part, 'O' lineitems are inflows and
    * 'F' lineitems outflows, each in shipdate order, and every
    * outflow unit consumes the OLDEST unconsumed inflow unit. The
    * sequential-sounding recursion is pure algebra via cumulative
    * intervals: each row owns [cum − qty, cum) on its side's running
    * quantity axis, and FIFO matches are EXACTLY the pairwise
    * interval overlaps — min(bhi, shi) − max(blo, slo) units of buy
    * b feed sell s. Two part-partitioned running sums + one equi-join
    * on part with the overlap residual; per-part row counts bound the
    * pair fan-out (at 100 TB you'd additionally band the join on
    * coarse cum-quantity buckets — the range_join discipline — so
    * a hot part never goes quadratic). Restricted to part < 200 to
    * keep the pair-level oracle output stable.
    */
  def fifoMatch(spark: SparkSession, dir: String): DataFrame = {
    val flows = Tables.read(spark, dir, "lineitem")
      .where(col("l_partkey") < 200)
      .select(
        col("l_partkey").as("part"), col("l_linestatus").as("st"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        // floor() on BOTH sides pins the decimal→int rule (Spark casts
        // truncate, DuckDB rounds half-even — equal on integral TPC-H
        // quantities only by coincidence).
        floor(col("l_quantity")).cast("long").as("qty"),
        col("l_shipdate").as("sd"))
    fifoPairsOf(flows)
  }

  /** The FIFO interval-overlap core over ANY flow relation
    * (part, st ∈ {O=in, F=out}, ok, ln, qty, sd) — the pair-level
    * match table. Also model-checked by `SweepPropertySpec` against a
    * sequential queue simulation on seeded random flows.
    */
  private[queries] def fifoPairsOf(rawFlows: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("part"), col("st"))
      .orderBy(col("sd"), col("ok"), col("ln"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flows = rawFlows
      .withColumn("hi", sum(col("qty")).over(w))
      .withColumn("lo", col("hi") - col("qty"))
    val buys = flows.where(col("st") === "O")
      .select(
        col("part"), col("ok").as("b_ok"), col("ln").as("b_ln"),
        col("lo").as("blo"), col("hi").as("bhi"))
    val sells = flows.where(col("st") === "F")
      .select(
        col("part"), col("ok").as("s_ok"), col("ln").as("s_ln"),
        col("lo").as("slo"), col("hi").as("shi"))
    buys.join(sells, Seq("part"))
      .where(col("blo") < col("shi") && col("slo") < col("bhi"))
      .select(
        col("part"), col("b_ok"), col("b_ln"), col("s_ok"), col("s_ln"),
        (least(col("bhi"), col("shi")) - greatest(col("blo"), col("slo")))
          .as("qty_matched"),
        col("blo"), col("slo"))
      .orderBy("part", "blo", "slo")
  }

  def fifoMatchOracle: String =
    """WITH f AS (
      |  SELECT l_partkey part, l_linestatus st, l_orderkey ok,
      |    l_linenumber ln, CAST(floor(l_quantity) AS BIGINT) qty,
      |    l_shipdate sd
      |  FROM lineitem WHERE l_partkey < 200),
      |cum AS (
      |  SELECT *, CAST(SUM(qty) OVER (PARTITION BY part, st
      |      ORDER BY sd, ok, ln ROWS UNBOUNDED PRECEDING) AS BIGINT) hi
      |  FROM f),
      |iv AS (SELECT *, hi - qty lo FROM cum)
      |SELECT b.part, b.ok b_ok, b.ln b_ln, s.ok s_ok, s.ln s_ln,
      |  LEAST(b.hi, s.hi) - GREATEST(b.lo, s.lo) qty_matched,
      |  b.lo blo, s.lo slo
      |FROM iv b JOIN iv s ON b.part = s.part
      |  AND b.st = 'O' AND s.st = 'F'
      |  AND b.lo < s.hi AND s.lo < b.hi
      |ORDER BY b.part, blo, slo""".stripMargin

  /** `interval_coalesce`: merge overlapping/touching intervals per
    * key — the classic interval-union primitive (busy periods,
    * coverage spans, outage windows) that gaps-and-islands on VALUES
    * (scd2_history) and gap-based sessionization (session_stats)
    * don't give. Input: each order's [orderdate, last shipdate] span;
    * output: per customer, maximal merged busy spans. The closed
    * form: one customer-partitioned window where a span opens a new
    * island iff its start exceeds the running max of all PREVIOUS
    * ends (ties merge — closed intervals), island id = running sum
    * of open flags, then one aggregate per island. Order-to-ship
    * spans for one customer overlap heavily, so the merge is real
    * work, not identity. Restricted to custkey < 100 for stable
    * oracle output.
    */
  def intervalCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.read(spark, dir, "orders")
      .where(col("o_custkey") < 100)
      .join(
        Tables.read(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(
        col("o_custkey").as("c"), col("o_orderkey").as("ok"),
        col("o_orderdate").as("s"))
      .agg(max(col("l_shipdate")).as("e"))
    val w = Window.partitionBy(col("c")).orderBy(col("s"), col("e"), col("ok"))
    spans
      .withColumn(
        "prev_max_e",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "opens",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn(
        "island",
        sum(col("opens")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("c").as("custkey"), col("island"))
      .agg(
        min(col("s")).as("span_start"),
        max(col("e")).as("span_end"),
        count(lit(1)).as("n_orders"))
      .orderBy("custkey", "island")
  }

  def intervalCoalesceOracle: String =
    """WITH spans AS (
      |  SELECT o_custkey c, o_orderkey ok, o_orderdate s,
      |    max(l_shipdate) e
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE o_custkey < 100
      |  GROUP BY 1, 2, 3),
      |flagged AS (
      |  SELECT *, CASE WHEN max(e) OVER (PARTITION BY c ORDER BY s, e, ok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > max(e) OVER (PARTITION BY c ORDER BY s, e, ok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    THEN 1 ELSE 0 END opens
      |  FROM spans),
      |islands AS (
      |  SELECT *, CAST(SUM(opens) OVER (PARTITION BY c ORDER BY s, e, ok
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) island
      |  FROM flagged)
      |SELECT c custkey, island, min(s) span_start, max(e) span_end,
      |  CAST(count(*) AS BIGINT) n_orders
      |FROM islands GROUP BY 1, 2 ORDER BY custkey, island""".stripMargin

  // --- deterministic train/val/test split (reproducible sampling) ---

  /** Content-hash split assignment: the first 16 bits of md5 of the
    * stable id decide the bucket (8/1/1 to within 65536-value hash
    * granularity, each bucket within ±0.01% of nominal), so the split
    * is reproducible across engines, runs, partitionings and cluster
    * sizes — the property random() sampling lacks. Narrow per-row
    * work + one tiny aggregation.
    */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = ContentHash.bucket(col("doc_id"), 10)
    val split = when(bucket < 8, lit("train"))
      .when(bucket === 8, lit("val"))
      .otherwise(lit("test"))
    Tables.read(spark, dir, "documents")
      .select(split.as("split"), col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("split")
  }

  def trainSplitOracle: String = {
    val b = ContentHash.bucketSql("doc_id", 10)
    s"""SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM (
       |  SELECT CASE
       |    WHEN $b < 8 THEN 'train'
       |    WHEN $b = 8 THEN 'val'
       |    ELSE 'test' END AS split, n_chars
       |  FROM documents)
       |GROUP BY split ORDER BY split""".stripMargin
  }

  /** Deterministic k-per-group sample over a LOW-cardinality group key
    * (5 event types): rank by content hash (reproducible — never
    * rand()) and keep the top 3 per type. The rank<=k filter is what
    * lets Spark plan WindowGroupLimit: each map task keeps only its
    * own top-k BEFORE the shuffle, so the 5-partition window sees
    * k×tasks rows, not the fact table — the only safe way to window
    * on a low-cardinality key (PlanShapeSpec pins the node).
    */
  def groupTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("h"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("event_type"), col("event_id"),
        md5(col("event_id").cast("string")).as("h"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("event_type"), col("rn").cast("long").as("rn"), col("event_id"))
      .orderBy("event_type", "rn")
  }

  def groupTopkOracle: String =
    """SELECT event_type, CAST(rn AS BIGINT) rn, event_id FROM (
      |  SELECT event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) rn
      |  FROM events)
      |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin

  /** `map_surface`: the MapType function surface — the one container
    * type the suite had not yet exercised — routed through REAL map
    * values end to end: map_from_entries builds a priority→count map
    * per order status, then map_keys / map_values / element_at /
    * map_filter / transform_values each produce a pinned column. The
    * oracle replays every answer from the FLAT (status, priority,
    * count) relation — maps are Spark-side representation, the
    * semantics must be representation-free. Keys sort before any
    * order-sensitive emission (map iteration order is not a
    * contract, the collect_list lesson applied to maps). `big_keys`
    * emits as a comma-joined STRING, not an array — the driver
    * comparator's sort step cannot hash top-level array cells (the
    * no-ARRAY/MAP-output contract, SURVEY §5.2); the list semantics
    * stay pinned element-wise in QueriesSpec.
    *
    * Scale shape: one 25-cell aggregate then narrow map ops; maps at
    * scale live INSIDE rows (per-entity attribute bags), so the cost
    * model is the row width, never a shuffle.
    */
  def mapSurface(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("pri"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("status"))
      .agg(
        map_from_entries(
          sort_array(collect_list(struct(col("pri"), col("cnt")))))
          .as("m"))
      .select(
        col("status"),
        size(map_keys(col("m"))).cast("long").as("n_keys"),
        aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v)
          .as("total"),
        coalesce(element_at(col("m"), "1-URGENT"), lit(0L))
          .as("urgent_n"),
        concat_ws(",",
          sort_array(map_keys(map_filter(col("m"), (_, v) => v > 100))))
          .as("big_keys"),
        aggregate(
          map_values(transform_values(col("m"), (_, v) => v * 2)),
          lit(0L), (acc, v) => acc + v).as("doubled_total"))
      .orderBy("status")

  def mapSurfaceOracle: String =
    """WITH f AS (
      |  SELECT o_orderstatus status, o_orderpriority pri,
      |    CAST(count(*) AS BIGINT) cnt
      |  FROM orders GROUP BY 1, 2)
      |SELECT status,
      |  CAST(count(*) AS BIGINT) n_keys,
      |  CAST(sum(cnt) AS BIGINT) total,
      |  CAST(coalesce(max(CASE WHEN pri = '1-URGENT' THEN cnt END), 0)
      |    AS BIGINT) urgent_n,
      |  coalesce(string_agg(pri, ',' ORDER BY pri)
      |             FILTER (WHERE cnt > 100), '') big_keys,
      |  CAST(2 * sum(cnt) AS BIGINT) doubled_total
      |FROM f GROUP BY status ORDER BY status""".stripMargin

  /** `string_battery`: the string-function portability surface over
    * the corpus vocabulary (distinct tokens — vocab-bounded, so the
    * battery costs one wordcount regardless of corpus size): padding,
    * character translation, 1-based substring search with the 0 =
    * absent convention, repetition, reversal, edit distance against
    * a fixed probe, leading code point, negative-index suffix slice,
    * zero-padded formatting, hex, and popcount. Functions only ONE
    * engine has (initcap, overlay, soundex) are deliberately out —
    * the battery pins the shared surface a query can port across.
    */
  def stringBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      .select(explode(TextAnalysis.toks(col("text"))).as("tok"))
      .distinct()
      .select(
        col("tok"),
        lpad(col("tok"), 6, "*").as("padded"),
        translate(col("tok"), "ae", "xy").as("translated"),
        locate("a", col("tok")).cast("long").as("pos_a"),
        repeat(col("tok"), 2).as("doubled"),
        reverse(col("tok")).as("reversed"),
        levenshtein(col("tok"), lit("table")).cast("long").as("lev_table"),
        ascii(col("tok")).cast("long").as("lead_cp"),
        expr("CASE WHEN length(tok) <= 3 THEN tok " +
          "ELSE substring(tok, -3) END").as("suffix3"),
        format_string("%05d", length(col("tok"))).as("len_padded"),
        hex(length(col("tok")).cast("long")).as("len_hex"),
        bit_count(length(col("tok")).cast("long")).cast("long")
          .as("len_bits"))
      .orderBy("tok")

  def stringBatteryOracle: String =
    s"""SELECT tok,
       |  lpad(tok, 6, '*') padded,
       |  translate(tok, 'ae', 'xy') translated,
       |  CAST(strpos(tok, 'a') AS BIGINT) pos_a,
       |  repeat(tok, 2) doubled,
       |  reverse(tok) reversed,
       |  CAST(levenshtein(tok, 'table') AS BIGINT) lev_table,
       |  CAST(ascii(tok) AS BIGINT) lead_cp,
       |  CASE WHEN length(tok) <= 3 THEN tok ELSE substr(tok, -3) END
       |    suffix3,
       |  printf('%05d', length(tok)) len_padded,
       |  to_hex(CAST(length(tok) AS BIGINT)) len_hex,
       |  CAST(bit_count(CAST(length(tok) AS BIGINT)) AS BIGINT) len_bits
       |FROM (SELECT DISTINCT unnest(${TextAnalysis.ToksSql.format("text")}) tok
       |      FROM documents)
       |ORDER BY tok""".stripMargin

  /** `datetime_battery`: the calendar-function portability surface
    * pinned value-by-value over every distinct order date — week
    * truncation (both engines start Monday, but only by convention:
    * pin it), ISO day-of-week (Spark's `dayofweek` is 1=Sunday,
    * DuckDB's `isodow` is 1=Monday — the query normalizes Spark to
    * ISO explicitly, documenting the divergence instead of tripping
    * on it), ISO week number, quarter, end-of-month, the add-month
    * END-OF-MONTH CLAMP (Jan 31 + 1 month = Feb 28 — both engines
    * clamp, neither overflows, but a hand-rolled day-arithmetic
    * version wouldn't), days-in-month, and the epoch-day linearization
    * joins/windows use as an integer time axis.
    *
    * Scale shape: one distinct over dates (calendar-bounded — ~2.4k
    * rows per decade regardless of fact volume), then a narrow
    * projection. The battery costs nothing and fails loudly on any
    * engine upgrade that shifts a calendar convention.
    */
  def datetimeBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"))
      .distinct()
      .select(
        col("d"),
        to_date(date_trunc("week", col("d"))).as("week_start"),
        to_date(date_trunc("month", col("d"))).as("month_start"),
        quarter(col("d")).cast("long").as("qtr"),
        (pmod(dayofweek(col("d")) + lit(5), lit(7)) + lit(1))
          .cast("long").as("iso_dow"),
        weekofyear(col("d")).cast("long").as("iso_week"),
        last_day(col("d")).as("eom"),
        add_months(col("d"), 1).as("plus_month"),
        dayofmonth(last_day(col("d"))).cast("long").as("days_in_month"),
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long")
          .as("epoch_day"))
      .orderBy("d")

  def datetimeBatteryOracle: String =
    """SELECT d,
      |  CAST(date_trunc('week', d) AS DATE) week_start,
      |  CAST(date_trunc('month', d) AS DATE) month_start,
      |  CAST(quarter(d) AS BIGINT) qtr,
      |  CAST(isodow(d) AS BIGINT) iso_dow,
      |  CAST(weekofyear(d) AS BIGINT) iso_week,
      |  last_day(d) eom,
      |  CAST(d + INTERVAL 1 MONTH AS DATE) plus_month,
      |  CAST(day(last_day(d)) AS BIGINT) days_in_month,
      |  CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) epoch_day
      |FROM (SELECT DISTINCT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) d
      |      FROM orders)
      |ORDER BY d""".stripMargin

  /** `generate_outer`: explode vs explode_outer over a
    * frequently-EMPTY array — the Generate null-extension semantics
    * that silently loses parent rows in real pipelines (an order
    * whose filtered line array is empty vanishes under explode; under
    * explode_outer it survives as one null-extended row). Both
    * variants run as REAL Generate nodes and report their own row
    * accounting, plus the lost-parent count that is the whole
    * difference; the oracle replays the identities
    * rows(explode)=Σlen, rows(outer)=Σmax(len,1), null=Σ(len=0).
    *
    * Scale shape: one orderkey aggregate builds the arrays (map-side
    * combinable), the Generates are narrow; the final numbers are
    * 2 rows.
    */
  def generateOuter(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.read(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_list(Quantize.cents(col("l_quantity"))).as("qs"))
      .select(
        col("l_orderkey"),
        filter(col("qs"), q => q > 4900).as("big"))
    val inner = base.select(col("l_orderkey"), explode(col("big")).as("q"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("q").isNull.cast("long")).as("n_null"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .select(
        lit("explode").as("variant"), col("n_rows"),
        coalesce(col("n_null"), lit(0L)).as("n_null"), col("n_orders"))
    val outer = base
      .select(col("l_orderkey"), explode_outer(col("big")).as("q"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("q").isNull.cast("long")).as("n_null"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .select(
        lit("explode_outer").as("variant"), col("n_rows"), col("n_null"),
        col("n_orders"))
    inner.unionByName(outer).orderBy("variant")
  }

  def generateOuterOracle: String =
    s"""WITH t AS (
       |  SELECT l_orderkey,
       |    list_filter(list(${Quantize.centsSql("l_quantity")}),
       |      q -> q > 4900) big
       |  FROM lineitem GROUP BY 1)
       |SELECT 'explode' variant,
       |  CAST(SUM(len(big)) AS BIGINT) n_rows,
       |  CAST(0 AS BIGINT) n_null,
       |  CAST(SUM(CASE WHEN len(big) > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    n_orders
       |FROM t
       |UNION ALL
       |SELECT 'explode_outer',
       |  CAST(SUM(greatest(len(big), 1)) AS BIGINT),
       |  CAST(SUM(CASE WHEN len(big) = 0 THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(COUNT(*) AS BIGINT)
       |FROM t
       |ORDER BY variant""".stripMargin

  /** Null-safe join semantics: standard equality drops null keys, the
    * null-safe operator (`<=>` / IS NOT DISTINCT FROM) matches them —
    * the divergence that silently loses rows in real pipelines. Both
    * behaviors side by side over the same derived nullable key.
    */
  def nullsafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"),
      when(col("value") >= 1.0, col("event_type")).as("k"))
    // dim derives from ev so the nullable key has ONE definition —
    // the strict/null-safe contrast must compare identical keys
    val dim = ev.groupBy(col("k")).agg(count(lit(1)).as("dim_n"))
    val strict = ev.join(dim, ev("k") === dim("k"))
      .agg(count(lit(1)).as("cnt")).select(lit("strict_eq").as("join_mode"), col("cnt"))
    val nullsafe = ev.join(dim, ev("k") <=> dim("k"))
      .agg(count(lit(1)).as("cnt")).select(lit("null_safe").as("join_mode"), col("cnt"))
    strict.unionByName(nullsafe).orderBy("join_mode")
  }

  def nullsafeJoinOracle: String =
    """WITH ev AS (
      |  SELECT event_id,
      |    CASE WHEN value >= 1.0 THEN event_type END k FROM events),
      |dim AS (
      |  SELECT CASE WHEN value >= 1.0 THEN event_type END k,
      |    CAST(COUNT(*) AS BIGINT) dim_n
      |  FROM events GROUP BY 1)
      |SELECT 'strict_eq' join_mode, CAST(COUNT(*) AS BIGINT) cnt
      |FROM ev JOIN dim ON ev.k = dim.k
      |UNION ALL
      |SELECT 'null_safe' join_mode, CAST(COUNT(*) AS BIGINT) cnt
      |FROM ev JOIN dim ON ev.k IS NOT DISTINCT FROM dim.k
      |ORDER BY join_mode""".stripMargin

  /** Aggregate null-semantics battery: the corner rules engines
    * disagree on most often, pinned per order-status group over a
    * deterministically null-injected value (`v` = totalprice cents,
    * NULL on every 3rd orderkey and for the ENTIRE 'F' group):
    * count(*) counts rows, count(v)/count(distinct v) skip nulls,
    * sum/min/max over an all-NULL group are NULL (not 0), and the
    * null-safe integer average is NULL exactly when count(v)=0.
    * The synthetic tables carry no nulls, so the injection is part
    * of the query on both engines.
    *
    * Scale shape: one narrow scan + one map-side-combinable hash
    * aggregate; the single count(distinct) plans one Expand, the
    * accepted cost of exact distinct-per-group.
    */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val v = when(
      col("o_orderkey") % 3 === 0 || col("o_orderstatus") === "F",
      lit(null).cast("long"))
      .otherwise(Quantize.cents(col("o_totalprice")))
    Tables.read(spark, dir, "orders")
      .select(col("o_orderstatus"), v.as("v"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .withColumn(
        "avg_milli",
        when(col("n_nonnull") === 0, lit(null).cast("long"))
          .otherwise(
            call_function(
              "div", col("sum_v") * lit(1000L), col("n_nonnull"))))
      .orderBy("o_orderstatus")
  }

  def nullSemanticsOracle: String =
    s"""WITH t AS (
       |  SELECT o_orderstatus,
       |    CASE WHEN o_orderkey % 3 = 0 OR o_orderstatus = 'F'
       |      THEN NULL ELSE ${Quantize.centsSql("o_totalprice")} END v
       |  FROM orders)
       |SELECT o_orderstatus,
       |  CAST(COUNT(*) AS BIGINT) n_rows,
       |  CAST(COUNT(v) AS BIGINT) n_nonnull,
       |  CAST(COUNT(DISTINCT v) AS BIGINT) n_distinct,
       |  CAST(SUM(v) AS BIGINT) sum_v,
       |  CAST(MIN(v) AS BIGINT) min_v,
       |  CAST(MAX(v) AS BIGINT) max_v,
       |  CASE WHEN COUNT(v) = 0 THEN NULL
       |    ELSE CAST(SUM(v) * 1000 // COUNT(v) AS BIGINT) END avg_milli
       |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Distribution window functions — percent_rank / cume_dist (peer-
    * aware rank arithmetic: ties share values, so ordering by the raw
    * double is deterministic) and nth_value over an explicit
    * full-partition ROWS frame with a unique (value, id) ordering.
    * Partitioned by user_id — high cardinality, even spread; never a
    * global window (PlanShapeSpec's rule).
    */
  def windowDist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
    val peers = Window.partitionBy(col("user_id")).orderBy(col("value"))
    val frame = Window.partitionBy(col("user_id"))
      .orderBy(col("value"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ev.select(
        col("user_id"), col("event_id"),
        percent_rank().over(peers).as("pr"),
        cume_dist().over(peers).as("cd"),
        nth_value(col("event_id"), 2).over(frame).as("second_id"))
      .orderBy("user_id", "event_id")
  }

  def windowDistOracle: String =
    """SELECT user_id, event_id,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  nth_value(event_id, 2) OVER (PARTITION BY user_id
      |    ORDER BY value, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |    AS second_id
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY value)
      |ORDER BY user_id, event_id""".stripMargin

  /** Multiset set operations — INTERSECT ALL / EXCEPT ALL keep
    * duplicate cardinalities (a customer with 3 orders in 1998 and 2
    * in 1999 contributes 2 'both' rows and 1 'only_1998' row). Spark
    * plans both as an aggregate of per-side counts + generate — one
    * shuffle keyed by the value, no join.
    */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders")
    def buyers(y: Int): DataFrame =
      ord.where(year(col("o_orderdate")) === y).select(col("o_custkey"))
    val both = buyers(1998).intersectAll(buyers(1999))
      .select(lit("both").as("tag"), col("o_custkey"))
    val only98 = buyers(1998).exceptAll(buyers(1999))
      .select(lit("only_1998").as("tag"), col("o_custkey"))
    both.union(only98)
      .groupBy(col("tag"), col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy("tag", "o_custkey")
  }

  def setOpsAllOracle: String =
    """SELECT tag, o_custkey, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT 'both' AS tag, o_custkey FROM (
      |    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
      |    INTERSECT ALL
      |    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1999)
      |  UNION ALL
      |  SELECT 'only_1998' AS tag, o_custkey FROM (
      |    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1998
      |    EXCEPT ALL
      |    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1999))
      |GROUP BY tag, o_custkey
      |ORDER BY tag, o_custkey""".stripMargin

  /** Wide-to-long reshape via the first-class unpivot/melt operator
    * (Spark `Dataset.unpivot` == DuckDB `UNPIVOT`): the per-type
    * aggregate is computed once, then melted to (key, metric, value)
    * rows — a narrow projection+generate, no shuffle beyond the
    * aggregate's own.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(Quantize.cents(col("value"))).as("sum_cents"))
      .unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("n_users"), col("sum_cents")),
        "metric", "value")
      .orderBy("event_type", "metric")

  def unpivotMetricsOracle: String =
    s"""SELECT event_type, metric, value FROM (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |    CAST(SUM(${Quantize.centsSql("value")}) AS BIGINT) AS sum_cents
      |  FROM events GROUP BY 1)
      |UNPIVOT (value FOR metric IN (n_events, n_users, sum_cents))
      |ORDER BY event_type, metric""".stripMargin

  /** `pareto_skyline`: the group-wise SKYLINE operator (Börzsönyi et
    * al.'s classic) — per brand, the parts not dominated on
    * (minimize retail price, maximize size): a dominates b iff
    * price≤ ∧ size≥ with one strict. The multi-objective "best
    * tradeoffs" shelf every catalog/pricing pipeline computes.
    *
    * Plan shape — in 2D the skyline REDUCES to a sort-scan, so the
    * idiomatic Spark form is pure relational algebra, no custom
    * operator: one map-combinable (brand, price)→max(size) aggregate
    * collapses the fact table to a dimension-sized grid, a
    * brand-PARTITIONED running-max window (frame ends 1 PRECEDING —
    * strictly-cheaper rows only) marks frontier prices, and one join
    * back picks the surviving rows (price-duplicates with the same
    * max size all survive; a same-price larger size dominates). At
    * 100 TB the window input is |brand × distinct-price| rows, never
    * fact-sized. For d>2 dims (no total order) the same pipeline
    * swaps the window for partition-local skyline + candidate merge
    * — skylines compose under union — with this 2D form as its
    * per-partition kernel.
    */
  def paretoSkyline(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.read(spark, dir, "part")
      .select(
        col("p_brand"), col("p_partkey"),
        Quantize.cents(col("p_retailprice")).as("price_c"),
        col("p_size").cast("long").as("sz"))
    val best = pts.groupBy(col("p_brand"), col("price_c"))
      .agg(max(col("sz")).as("msize"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("price_c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = best.withColumn("mprev", max(col("msize")).over(w))
    pts.join(run, Seq("p_brand", "price_c"))
      .where(col("sz") === col("msize") &&
        (col("mprev").isNull || col("sz") > col("mprev")))
      .select(col("p_brand"), col("p_partkey"), col("price_c"), col("sz"))
      .orderBy("p_brand", "price_c", "p_partkey")
  }

  def paretoSkylineOracle: String =
    s"""WITH pts AS (
       |  SELECT p_brand, p_partkey,
       |    ${Quantize.centsSql("p_retailprice")} price_c,
       |    CAST(p_size AS BIGINT) sz
       |  FROM part),
       |best AS (SELECT p_brand, price_c, max(sz) msize FROM pts GROUP BY 1, 2),
       |run AS (
       |  SELECT p_brand, price_c, msize,
       |    max(msize) OVER (PARTITION BY p_brand ORDER BY price_c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) mprev
       |  FROM best)
       |SELECT pts.p_brand, pts.p_partkey, pts.price_c, pts.sz
       |FROM pts JOIN run USING (p_brand, price_c)
       |WHERE pts.sz = run.msize AND (run.mprev IS NULL OR pts.sz > run.mprev)
       |ORDER BY p_brand, price_c, p_partkey""".stripMargin

  /** `hof_battery`: the higher-order array-function surface —
    * transform/filter/aggregate(fold)/zip_with/exists/forall/slice —
    * exercised per order over its sorted quantity array and pinned
    * against DuckDB's list-function family (list_transform /
    * list_filter / list_sum / list_reverse / slicing). This is the
    * "functions, not UDFs" discipline made checkable: every lambda
    * here is a codegen'd Catalyst HigherOrderFunction, zero Scala
    * closures. collect_list order is nondeterministic by contract, so
    * the array is canonicalized with sort_array BEFORE any
    * order-sensitive op (the zip_with pairs each element with its
    * mirror, which only means something on a sorted array). Output
    * capped to orderkey < 200 (the pos_tokens row-budget convention,
    * filtered before the aggregate builds arrays).
    */
  def hofBattery(spark: SparkSession, dir: String): DataFrame = {
    val arr = sort_array(collect_list(col("qc")))
    Tables.read(spark, dir, "lineitem")
      .where(col("l_orderkey") < 200)
      .select(col("l_orderkey"), Quantize.cents(col("l_quantity")).as("qc"))
      .groupBy(col("l_orderkey"))
      .agg(arr.as("arr"))
      .select(
        col("l_orderkey"),
        size(col("arr")).cast("long").as("n_items"),
        aggregate(col("arr"), lit(0L), (acc, x) => acc + x).as("total_q"),
        size(filter(col("arr"), x => x > 2500L)).cast("long").as("n_big"),
        aggregate(
          zip_with(col("arr"), reverse(col("arr")), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("mirror_dot"),
        exists(col("arr"), x => x >= 5000L).as("any_ge_50"),
        forall(col("arr"), x => x > 0L).as("all_pos"),
        concat_ws(",", transform(slice(col("arr"), 1, 3), x => x.cast("string")))
          .as("first3"))
      .orderBy("l_orderkey")
  }

  def hofBatteryOracle: String =
    s"""WITH g AS (
       |  SELECT l_orderkey,
       |    list_sort(list(${Quantize.centsSql("l_quantity")})) arr
       |  FROM lineitem WHERE l_orderkey < 200 GROUP BY 1),
       |b AS (
       |  SELECT l_orderkey, arr, list_reverse(arr) rev,
       |    CAST(len(arr) AS BIGINT) n_items
       |  FROM g)
       |SELECT l_orderkey, n_items,
       |  CAST(list_sum(arr) AS BIGINT) total_q,
       |  CAST(len(list_filter(arr, x -> x > 2500)) AS BIGINT) n_big,
       |  CAST(list_sum(list_transform(range(1, CAST(n_items AS INT) + 1),
       |    i -> arr[i] * rev[i])) AS BIGINT) mirror_dot,
       |  len(list_filter(arr, x -> x >= 5000)) > 0 any_ge_50,
       |  len(list_filter(arr, x -> NOT x > 0)) = 0 all_pos,
       |  array_to_string(list_transform(arr[1:3], x -> CAST(x AS VARCHAR)), ',')
       |    first3
       |FROM b ORDER BY l_orderkey""".stripMargin

  /** `null_ordering`: explicit NULLS FIRST/LAST pinned across both
    * sort directions — the portability battery for a semantic the
    * engines DISAGREE on by default (Spark: nulls smallest, so FIRST
    * asc / LAST desc; DuckDB: NULLS LAST everywhere) and that any
    * cross-engine ORDER BY silently gets wrong unless stated. The
    * nullable column is real (left-join-produced last-order date for
    * customers with no recent orders); output interleaves both
    * placements: desc NULLS LAST rank and asc NULLS FIRST rank per
    * row for the 10 top/bottom customers of a nation slice, plus the
    * null count. Every ORDER BY in this suite that can see a null
    * states its placement — this row is the discipline itself made
    * hash-checked.
    */
  def nullOrdering(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lastOrder = Tables.read(spark, dir, "orders")
      .where(to_date(col("o_orderdate")) >= lit("2001-01-01").cast("date"))
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"))
    val base = Tables.read(spark, dir, "customer")
      .where(col("c_nationkey") === 3)
      .join(lastOrder, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("last_d"))
    // the input is one nation's customers (a dimension slice), but the
    // suite-wide unpartitioned-window ban is LITERAL (PlanShapeSpec
    // checks every optimized plan), so the global ranking states its
    // partition as an explicit 1-bucket key — derived from the column
    // (custkey % 1), because a literal key constant-folds away and the
    // window reverts to unpartitioned in the optimized plan
    base
      .withColumn("b", pmod(col("c_custkey"), lit(1L)))
      .withColumn(
        "rk_desc_nl",
        row_number().over(
          Window.partitionBy(col("b"))
            .orderBy(col("last_d").desc_nulls_last, col("c_custkey")))
          .cast("long"))
      .withColumn(
        "rk_asc_nf",
        row_number().over(
          Window.partitionBy(col("b"))
            .orderBy(col("last_d").asc_nulls_first, col("c_custkey")))
          .cast("long"))
      .where(col("rk_desc_nl") <= 10 || col("rk_asc_nf") <= 10)
      .select(col("c_custkey"), col("last_d"), col("rk_desc_nl"), col("rk_asc_nf"))
      .orderBy("rk_desc_nl")
  }

  def nullOrderingOracle: String =
    """WITH lo AS (
      |  SELECT o_custkey, MAX(CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) last_d
      |  FROM orders
      |  WHERE CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) >= DATE '2001-01-01'
      |  GROUP BY 1),
      |b AS (
      |  SELECT c_custkey, last_d
      |  FROM customer LEFT JOIN lo ON c_custkey = o_custkey
      |  WHERE c_nationkey = 3),
      |r AS (
      |  SELECT c_custkey, last_d,
      |    CAST(ROW_NUMBER() OVER (ORDER BY last_d DESC NULLS LAST,
      |      c_custkey) AS BIGINT) rk_desc_nl,
      |    CAST(ROW_NUMBER() OVER (ORDER BY last_d ASC NULLS FIRST,
      |      c_custkey) AS BIGINT) rk_asc_nf
      |  FROM b)
      |SELECT c_custkey, last_d, rk_desc_nl, rk_asc_nf FROM r
      |WHERE rk_desc_nl <= 10 OR rk_asc_nf <= 10
      |ORDER BY rk_desc_nl""".stripMargin

  /** `range_frame_battery`: ROWS- vs RANGE-frame semantics pinned as
    * data — the window wrong-answer class beside NULL placement: with
    * DUPLICATE order keys, `RANGE ... AND CURRENT ROW` aggregates the
    * WHOLE peer group (every row of the current day shows the same
    * day-closing total) while `ROWS` splits peers by physical order —
    * deterministic only because the ROWS sort key here is made UNIQUE
    * (day, orderkey); and a value-bounded `RANGE 3 PRECEDING` is a
    * 4-DAY window that skips absent days, where the naive
    * `ROWS 3 PRECEDING` would reach back across gaps. One query, all
    * three frames on the same rows, hash-compared against DuckDB's
    * implementations of the same frames.
    *
    * Plan shape: one shuffle(priority) feeds all three frames (two
    * window specs share the sort); per-order output. High-cardinality
    * tie-broken sort keys keep partitions balanced at scale.
    */
  def rangeFrameBattery(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.read(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("priority"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
          .cast("long").as("day"),
        col("o_orderkey").as("okey"),
        Quantize.cents(col("o_totalprice")).as("cents"))
    val byRows = Window.partitionBy(col("priority"))
      .orderBy(col("day"), col("okey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byRange = Window.partitionBy(col("priority"))
      .orderBy(col("day"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val range3 = Window.partitionBy(col("priority"))
      .orderBy(col("day"))
      .rangeBetween(-3, 0)
    base.select(
        col("priority"), col("day"), col("okey"), col("cents"),
        sum(col("cents")).over(byRows).as("rows_cum"),
        sum(col("cents")).over(byRange).as("range_cum"),
        sum(col("cents")).over(range3).as("range_3d"))
      .orderBy("priority", "day", "okey")
  }

  def rangeFrameBatteryOracle: String =
    s"""WITH base AS (
       |  SELECT o_orderpriority priority,
       |    CAST(date_diff('day', DATE '1992-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) d,
       |    o_orderkey okey, ${Quantize.centsSql("o_totalprice")} cents
       |  FROM orders)
       |SELECT priority, d AS day, okey, cents,
       |  CAST(SUM(cents) OVER (PARTITION BY priority ORDER BY d, okey
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) rows_cum,
       |  CAST(SUM(cents) OVER (PARTITION BY priority ORDER BY d
       |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) range_cum,
       |  CAST(SUM(cents) OVER (PARTITION BY priority ORDER BY d
       |    RANGE BETWEEN 3 PRECEDING AND CURRENT ROW)
       |    AS BIGINT) range_3d
       |FROM base ORDER BY priority, d, okey""".stripMargin

  /** `topk_tie_battery`: the three top-k cutoffs pinned side by side —
    * `row_number ≤ k` (exactly k rows, ties broken arbitrarily unless
    * the key is unique), `rank ≤ k` (ties at the boundary ALL come
    * back — more than k rows), `dense_rank ≤ k` (k distinct VALUES —
    * possibly many more rows) — the top-k wrong-answer class: a
    * report that switches function silently changes its row count on
    * tied data. Counted per order priority over the tie-rich
    * day-grain revenue (many days share a total at cents grain? no —
    * ties are manufactured honestly by ranking on the DAY of the
    * month, which has massive ties), k = 3. Output per (priority,
    * method): n_rows and revenue sum — the discrepancy IS the data.
    * row_number's arbitrary-tie hazard is removed the only correct
    * way: a unique tie-break key in ITS ordering only, so the three
    * methods differ exactly where their semantics differ, not where
    * physical order leaks.
    *
    * Plan shape: one shuffle(priority); three windows share the sort;
    * 15-row output.
    */
  def topkTieBattery(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.read(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("priority"),
        dayofmonth(to_date(col("o_orderdate"))).cast("long").as("dom"),
        col("o_orderkey").as("okey"),
        Quantize.cents(col("o_totalprice")).as("cents"))
    val byTie = Window.partitionBy(col("priority"))
      .orderBy(col("dom").desc)
    val byUnique = Window.partitionBy(col("priority"))
      .orderBy(col("dom").desc, col("okey"))
    val ranked = base.select(
      col("priority"), col("cents"),
      row_number().over(byUnique).as("rn"),
      rank().over(byTie).as("rk"),
      dense_rank().over(byTie).as("dr"))
    def side(m: String, keep: org.apache.spark.sql.Column) =
      ranked.where(keep)
        .groupBy(col("priority"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("revenue"))
        .select(col("priority"), lit(m).as("method"), col("n_rows"),
          col("revenue"))
    side("dense_rank", col("dr") <= 3)
      .unionByName(side("rank", col("rk") <= 3))
      .unionByName(side("row_number", col("rn") <= 3))
      .orderBy("priority", "method")
  }

  def topkTieBatteryOracle: String =
    s"""WITH base AS (
       |  SELECT o_orderpriority priority,
       |    CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) dom,
       |    o_orderkey okey, ${Quantize.centsSql("o_totalprice")} cents
       |  FROM orders),
       |r AS (
       |  SELECT priority, cents,
       |    row_number() OVER (PARTITION BY priority
       |      ORDER BY dom DESC, okey) rn,
       |    rank() OVER (PARTITION BY priority ORDER BY dom DESC) rk,
       |    dense_rank() OVER (PARTITION BY priority ORDER BY dom DESC) dr
       |  FROM base)
       |SELECT priority, m AS method, CAST(n_rows AS BIGINT) n_rows,
       |  CAST(revenue AS BIGINT) revenue FROM (
       |  SELECT priority, 'dense_rank' m, count(*) n_rows,
       |    SUM(cents) revenue FROM r WHERE dr <= 3 GROUP BY 1
       |  UNION ALL
       |  SELECT priority, 'rank', count(*), SUM(cents)
       |  FROM r WHERE rk <= 3 GROUP BY 1
       |  UNION ALL
       |  SELECT priority, 'row_number', count(*), SUM(cents)
       |  FROM r WHERE rn <= 3 GROUP BY 1)
       |ORDER BY priority, method""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "topk_tie_battery", topkTieBattery, Some(topkTieBatteryOracle)),
    QueryDef(
      "range_frame_battery", rangeFrameBattery,
      Some(rangeFrameBatteryOracle)),
    QueryDef("generate_outer", generateOuter, Some(generateOuterOracle)),
    QueryDef("string_battery", stringBattery, Some(stringBatteryOracle)),
    QueryDef("map_surface", mapSurface, Some(mapSurfaceOracle)),
    QueryDef(
      "datetime_battery", datetimeBattery, Some(datetimeBatteryOracle)),
    QueryDef("null_ordering", nullOrdering, Some(nullOrderingOracle)),
    QueryDef("hof_battery", hofBattery, Some(hofBatteryOracle)),
    QueryDef("pareto_skyline", paretoSkyline, Some(paretoSkylineOracle)),
    QueryDef("grouping_sets", groupingSets, Some(groupingSetsOracle)),
    QueryDef("window_dist", windowDist, Some(windowDistOracle)),
    QueryDef("set_ops_all", setOpsAll, Some(setOpsAllOracle)),
    QueryDef("unpivot_metrics", unpivotMetrics, Some(unpivotMetricsOracle)),
    QueryDef("window_lag", windowLag, Some(windowLagOracle)),
    QueryDef("ntile_buckets", ntileBuckets, Some(ntileBucketsOracle)),
    QueryDef("string_agg_nations", stringAggNations, Some(stringAggNationsOracle)),
    QueryDef("above_avg_orders", aboveAvgOrders, Some(aboveAvgOrdersOracle)),
    QueryDef("top_term", topTerm, Some(topTermOracle)),
    QueryDef("near_dup_pairs", nearDupPairs, Some(nearDupPairsOracle)),
    QueryDef("skew_join", skewJoin, Some(skewJoinOracle)),
    QueryDef("variant_extract", variantExtract, Some(variantExtractOracle)),
    QueryDef("json_keys_stats", jsonKeysStats, Some(jsonKeysStatsOracle)),
    QueryDef("time_spine", timeSpine, Some(timeSpineOracle)),
    QueryDef("gap_fill", gapFill, Some(gapFillOracle)),
    QueryDef("interval_join", intervalJoin, Some(intervalJoinOracle)),
    QueryDef("sessionize_lag", sessionizeLag, Some(sessionizeLagOracle)),
    QueryDef("session_stats", sessionStats, Some(sessionStatsOracle)),
    QueryDef("peak_concurrency", peakConcurrency, Some(peakConcurrencyOracle)),
    QueryDef("fifo_match", fifoMatch, Some(fifoMatchOracle)),
    QueryDef(
      "interval_coalesce", intervalCoalesce, Some(intervalCoalesceOracle)),
    QueryDef("train_split", trainSplit, Some(trainSplitOracle)),
    QueryDef("group_topk", groupTopk, Some(groupTopkOracle)),
    QueryDef("nullsafe_join", nullsafeJoin, Some(nullsafeJoinOracle)),
    QueryDef("null_semantics", nullSemantics, Some(nullSemanticsOracle)),
    QueryDef("safe_arithmetic", safeArithmetic, Some(safeArithmeticOracle)))

  /** Spark 4 runs ANSI mode by default: arithmetic overflow, division
    * by zero and bad casts THROW unless the `try_*` forms are used —
    * the semantics every library operator here relies on (`try_to_date`
    * in the filter compiler, guards in the kernels). This battery pins
    * the recovery surface: try_divide/try_add/try_cast turn each
    * failure into NULL, counted per failure class over a derived
    * corpus. DuckDB oracles via TRY_CAST and NULLIF-guarded division —
    * same NULL-in/NULL-out outcomes, engine-portably.
    *
    * Scale shape: one narrow projection + a single global aggregate —
    * semantics proof, not a data-volume operator. Measured note: every
    * FAILING `try_*` row pays Spark's internal throw-and-catch even
    * with stack traces elided (~20µs/row measured; an earlier form
    * with two always-failing columns ran 3.4s at sf0.1 — linear in
    * rows, pure exception cost). That engine property is worth knowing
    * at 100 TB: `try_*` over a MOSTLY-failing column is an
    * anti-pattern (pre-filter the failing class instead); over
    * mostly-succeeding data it's free. The battery therefore prices
    * failure at its information value: each failure class fails on
    * ~1% of rows (k-mod gates) — every class still lands a nonzero
    * pinned count, and the hot path stays the succeeding one, like
    * production data.
    */
  def safeArithmetic(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.read(spark, dir, "orders").select(
      col("o_orderkey").as("k"),
      Quantize.cents(col("o_totalprice")).as("cents"),
      col("o_orderpriority").as("prio"))
    o.select(
      // div-by-zero: every 7th row divides by zero -> NULL (a guard in
      // try_divide, not an exception -- cheap at any failure rate)
      expr("try_divide(cents, k % 7)").as("div7"),
      // overflow: Long.MaxValue + cents overflows on the ~1% of rows
      // the k % 97 gate selects (cents > 0 always)
      expr(
        s"try_add(CASE WHEN k % 97 = 0 THEN ${Long.MaxValue}L ELSE 0L END, cents)")
        .as("ovf"),
      // bad cast: '1-URGENT' etc. never parse as ints; gated to ~1% of
      // rows, the rest cast the extracted (parseable) leading digit
      expr(
        "try_cast(CASE WHEN k % 89 = 0 THEN prio ELSE substring(prio, 1, 1) END AS BIGINT)")
        .as("badcast"),
      // good cast: the leading digit does parse once extracted
      expr("try_cast(substring(prio, 1, 1) AS BIGINT)").as("goodcast"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("div7").isNull.cast("long")).as("n_div0_null"),
        sum(col("ovf").isNull.cast("long")).as("n_overflow_null"),
        sum(col("badcast").isNull.cast("long")).as("n_badcast_null"),
        sum(col("goodcast")).as("sum_goodcast"),
        // try_divide result where defined: floor to micros for an
        // integer-exact checksum of the non-null division results
        sum(when(col("div7").isNotNull,
          expr("CAST(floor(div7 * 1000) AS BIGINT)"))).as("div_milli_sum"))
  }

  def safeArithmeticOracle: String =
    s"""WITH t AS (
       |  SELECT o_orderkey k, ${Quantize.centsSql("o_totalprice")} cents,
       |    o_orderpriority prio
       |  FROM orders),
       |d AS (
       |  SELECT
       |    CASE WHEN k % 7 = 0 THEN NULL
       |      ELSE CAST(cents AS DOUBLE) / (k % 7) END div7,
       |    CASE WHEN k % 97 = 0 THEN CAST(NULL AS BIGINT)
       |      ELSE cents END ovf,
       |    TRY_CAST(CASE WHEN k % 89 = 0 THEN prio
       |      ELSE substr(prio, 1, 1) END AS BIGINT) badcast,
       |    TRY_CAST(substr(prio, 1, 1) AS BIGINT) goodcast
       |  FROM t)
       |SELECT CAST(COUNT(*) AS BIGINT) n_rows,
       |  CAST(SUM(CASE WHEN div7 IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_div0_null,
       |  CAST(SUM(CASE WHEN ovf IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_overflow_null,
       |  CAST(SUM(CASE WHEN badcast IS NULL THEN 1 ELSE 0 END) AS BIGINT) n_badcast_null,
       |  CAST(SUM(goodcast) AS BIGINT) sum_goodcast,
       |  CAST(SUM(CASE WHEN div7 IS NOT NULL
       |    THEN CAST(floor(div7 * 1000) AS BIGINT) END) AS BIGINT) div_milli_sum
       |FROM d""".stripMargin
}
