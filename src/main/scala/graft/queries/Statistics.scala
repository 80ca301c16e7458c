package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical aggregates done the oracle-portable way: every moment
  * (Σx, Σx², Σxy) accumulates as an EXACT integer — order-independent
  * across partitionings, so the distributed partial+final aggregation
  * is deterministic — and floating point enters only in the final
  * closed-form scalar, where both engines evaluate the textually-
  * identical IEEE expression over the same exact operands. (Naive
  * stddev/corr over doubles is not reproducible: summation order
  * differs per partitioning and engines disagree in the last ulps.)
  *
  * Quantization picks units so the SUMS stay in int64 headroom
  * (cents for |x| <= ~1e3-range columns, whole units for ~1e5-range
  * prices: Σx² <= rows × 1e10 keeps 1e8 rows exact); products OF the
  * sums (n·S2, S1²) can exceed int64 and are therefore computed in
  * double — deterministically, since IEEE rounding of identical
  * expressions over identical operands agrees everywhere.
  */
object Statistics {

  /** THE shared exact-order-statistics kernel: per-key exact LOWER
    * WEIGHTED MEDIAN — the smallest value whose cumulative weight
    * reaches ⌈W/2⌉ (2·cum ≥ W, pure integer) — over ROW-grain input
    * `(keys..., value: long, weight)`. Output: one row per key with
    * `med` and `wtot`.
    *
    * Two-pass probe, the shape a 100 TB quantile wants — NO
    * fact-sized shuffle anywhere:
    *  1. a 1-row bounds collect (the suite's bounded driver-
    *     arithmetic exception) sizes ≤65 ORDERED value shards to the
    *     observed range ((hi−lo) div 64 + 1 — a fixed width blows the
    *     shard count on a wider domain, the round-7 mannwhitney
    *     lesson);
    *  2. one map-side-combinable aggregate to the (keys × shard)
    *     GRID (≤ 65·|keys| rows — callers must have bounded key
    *     cardinality), COLLECTED: the crossing-shard search over the
    *     grid (sort, prefix-sum, first shard reaching the target
    *     rank) is plain Long arithmetic on a bounded relation — the
    *     same driver-arithmetic class as the bounds collect — so it
    *     runs here instead of as a triangular broadcast self-join +
    *     two checkpoints + a separate crossing collect (round-10
    *     profile: ~0.5 s of small-stage scheduling per call at bench
    *     scale, all fixed floor);
    *  3. the fact re-scan keeps only each key's crossing shard
    *     (broadcast semi-filter, ~1/64 of values) and resolves the
    *     exact median with a keys-partitioned window over that slice
    *     — partition size is value-domain/64-bounded, never
    *     fact-bounded.
    *
    * Shard boundaries cannot affect the result (any contiguous
    * sharding telescopes to the same prefix), so callers that
    * previously rolled their own full prefix sums keep bit-identical
    * medians. Consumers: weighted_median, levene_bf, median_merge
    * (per-content-shard medians). The same prefix-sum discipline
    * inlined at ks_test / wasserstein_1d / spearman_rho / theil_sen
    * needs EVERY cumulative, not one probe, and predates this kernel.
    */
  private[queries] def lowerMedianBy(
      rows: DataFrame, keys: Seq[String], value: String,
      weight: Option[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val w = weight.map(col).getOrElse(lit(1L))
    val b = rows
      .agg(min(col(value)).cast("long"), max(col(value)).cast("long"))
      .head
    // empty input: min/max are NULL — any (lo, wd) works since every
    // downstream relation is empty; (0, 1) keeps the plan well-formed
    // and the output schema identical
    val (lo, wd) =
      if (b.isNullAt(0)) (0L, 1L)
      else { val l = b.getLong(0); (l, (b.getLong(1) - l) / 64 + 1) }
    // (value − lo) ≥ 0, so truncating div IS floor and shard order
    // follows value order
    val shard = expr(s"($value - ${lo}L) div ${wd}L")
    // ONE grid job, then driver arithmetic: the grid is ≤ 65·|keys|
    // rows by construction. Weights are integral across the suite
    // (cents / counts), so t_ casts to Long losslessly.
    val gridSchema = rows
      .groupBy((keyCols :+ shard.as("shard_")): _*)
      .agg(sum(w).cast("long").as("t_"))
    val gridRows = gridSchema.collect()
    val k = keys.length
    // crossing shard per key: first shard (in shard = value order)
    // whose grid-cumulative reaches the target rank — identical to
    // the former min(struct(shard, off)) over qualifying shards,
    // since the cumulative is nondecreasing. NULL-keyed groups flow
    // through untouched (the key tuple is compared by value here and
    // by <=> in the slice join below).
    val sels = gridRows
      .groupBy(r => (0 until k).map(r.get).toList)
      .map { case (kv, rs) =>
        val sorted = rs.sortBy(_.getLong(k))
        val wtot = sorted.iterator.map(_.getLong(k + 1)).sum
        var cum = 0L
        val cross = sorted
          .find { r => cum += r.getLong(k + 1); cum * 2 >= wtot }.get
        (kv, cross.getLong(k), cum - cross.getLong(k + 1), wtot)
      }
      .toSeq
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // fresh __k names: the slice join below must not capture the
    // fact-side attribute ids
    val starSchema = StructType(
      keys.zipWithIndex.map { case (kn, i) =>
        StructField(s"${kn}__k", gridSchema.schema(i).dataType,
          nullable = true)
      } ++ Seq(
        StructField("vshard__", LongType, nullable = false),
        StructField("off_", LongType, nullable = false),
        StructField("wtot", LongType, nullable = false)))
    val star = rows.sparkSession.createDataFrame(
      java.util.Arrays.asList(sels.map { case (kv, vs, off, wtot) =>
        Row.fromSeq(kv ++ Seq(vs, off, wtot))
      }: _*),
      starSchema)
    // ROW-grain running sum over the slice — deliberately NOT a
    // value-grain pre-aggregate: with cent-exact values the slice has
    // ~|slice| groups and the hash aggregate OOMs under concurrent
    // tasks at the 100× replica, while a window sorts and spills
    // gracefully. Correctness is tie-order-independent: cum is
    // nondecreasing, so the FIRST crossing row's value is the median
    // even if the crossing lands mid-way through a run of equal
    // values (all later rows also cross; min(value) reads the first).
    //
    // Crossing-shard pre-filter: the distinct crossing value-shards
    // (≤ |keys| of the ≤65-shard grid, usually 1–3 — iid keys cross
    // near the same global rank) are already in hand from the driver
    // search and pushed as a CHEAP arithmetic IN-filter on the fact
    // scan, so the join — and, for callers whose key column is an
    // expensive expression (e.g. median_merge's md5 content bucket),
    // the key evaluation itself — runs over only the ~1/64-per-key
    // crossing slice instead of every row. Pure pruning: the join
    // keeps exactly the (key, crossing-shard) rows either way.
    val crossing = sels.map(_._2).distinct
    val slice = rows
      .where(shard.isin(crossing: _*))
      .join(broadcast(star),
        keys.map(k => col(k) <=> col(s"${k}__k"))
          .reduce(_ && _) && shard === col("vshard__"))
    val wsl = Window.partitionBy(keyCols: _*).orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slice
      .withColumn("cum_", sum(w).over(wsl) + col("off_"))
      .where(col("cum_") * 2 >= col("wtot"))
      .groupBy(keyCols: _*)
      .agg(min(col(value)).as("med"), max(col("wtot")).as("wtot"))
  }

  /** Per-event-type z-score outlier report: moment sums in integer
    * cents, then mean/outlier-count from the closed form — a row is an
    * outlier when |x - mean| > 2·stddev (sample stddev), tested as
    * |n·x - S1| > 2·sqrt(n·(n·S2 - S1²)/(n-1)). The tiny moment table
    * broadcasts back onto the rows: at 100 TB the second pass is a
    * narrow filter against a handful of broadcast rows.
    */
  def statsOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
    val moments = ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("vc")).as("s1"),
        sum(col("vc") * col("vc")).as("s2"))
    val nD = col("n").cast("double")
    val s1D = col("s1").cast("double")
    val s2D = col("s2").cast("double")
    val isOut =
      abs(nD * col("vc").cast("double") - s1D) >
        lit(2.0) * sqrt(nD * (nD * s2D - s1D * s1D) / (nD - 1.0))
    ev.join(broadcast(moments), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (max(col("s1")).cast("double") / max(col("n")) / 100.0).as("mean_value"),
        sum(isOut.cast("long")).as("n_outliers"))
      .orderBy("event_type")
  }

  def statsOutliersOracle: String =
    s"""WITH v AS (
      |  SELECT event_type, ${Quantize.centsSql("value")} vc FROM events),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) n, SUM(vc) s1, SUM(vc * vc) s2
      |  FROM v GROUP BY event_type)
      |SELECT v.event_type, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(MAX(s1) AS DOUBLE) / MAX(n) / 100.0 AS mean_value,
      |  CAST(SUM(CASE WHEN
      |    abs(CAST(n AS DOUBLE) * CAST(vc AS DOUBLE) - CAST(s1 AS DOUBLE)) >
      |    2.0 * sqrt(CAST(n AS DOUBLE) *
      |      (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |      / (CAST(n AS DOUBLE) - 1.0))
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM v JOIN m USING (event_type)
      |GROUP BY v.event_type ORDER BY event_type""".stripMargin

  /** Pearson correlation of quantity (cents) vs extended price (whole
    * units — cents would push Σy² past int64) per return flag, from
    * exact integer moment sums: one map-side-combinable shuffle, the
    * closed form evaluated in double at the end.
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.read(spark, dir, "lineitem")
      .select(
        col("l_returnflag"),
        Quantize.cents(col("l_quantity")).as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(
        col("l_returnflag"), col("n"),
        ((nD * d("sxy") - d("sx") * d("sy")) /
          sqrt(
            (nD * d("sxx") - d("sx") * d("sx")) *
              (nD * d("syy") - d("sy") * d("sy"))))
          .as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  def corrStatsOracle: String =
    s"""WITH v AS (
      |  SELECT l_returnflag,
      |    ${Quantize.centsSql("l_quantity")} x,
      |    CAST(round(l_extendedprice) AS BIGINT) y
      |  FROM lineitem),
      |m AS (
      |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) n,
      |    SUM(x) sx, SUM(y) sy, SUM(x * x) sxx, SUM(y * y) syy, SUM(x * y) sxy
      |  FROM v GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |    sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |         (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |  AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Chi-square independence test of order priority × status from the
    * integer contingency table: one tiny groupBy count, marginals via
    * windows OVER THE 15-row contingency (post-aggregation, so even
    * the global total "window" touches aggregate-sized data). Each
    * cell's χ² term is the exact rational
    * (n·tot − row·col)² / (tot·row·col) — integer numerator and
    * denominator, divided once in double — and the cross-cell SUM
    * folds over the SORTED term list, so the float summation order is
    * identical in both engines (a plain double SUM is partition-order-
    * dependent; with ~15 cells the sorted fold costs nothing).
    */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cont = Tables.read(spark, dir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    // grand total via a broadcast 1-row aggregate, not an
    // empty-partition window: same KB-scale input, but no
    // single-partition WindowExec node anywhere in the suite's plans
    val tot = cont.agg(sum(col("n")).as("tot"))
    val withMarginals = cont
      .withColumn("row_n", sum(col("n")).over(
        Window.partitionBy(col("o_orderpriority"))))
      .withColumn("col_n", sum(col("n")).over(
        Window.partitionBy(col("o_orderstatus"))))
      .crossJoin(broadcast(tot))
    // products of counts go to double BEFORE multiplying (the suite's
    // integer-sums rule): n·tot, row·col and tot·row·col blow past
    // int64 at the row counts this operator targets, and ANSI Spark
    // would throw where DuckDB's HUGEINT windows would not
    val num = col("n").cast("double") * col("tot") -
      col("row_n").cast("double") * col("col_n")
    val term = (num * num) /
      (col("tot").cast("double") * col("row_n") * col("col_n"))
    withMarginals
      .agg(
        max(col("tot")).as("n_orders"),
        sort_array(collect_list(term)).as("terms"),
        ((countDistinct(col("o_orderpriority")) - 1) *
          (countDistinct(col("o_orderstatus")) - 1)).as("dof"))
      .select(
        col("n_orders"),
        aggregate(col("terms"), lit(0.0), (a, x) => a + x).as("chi2"),
        col("dof").cast("long").as("dof"))
  }

  def chiSquareOracle: String =
    """WITH c AS (
      |  SELECT o_orderpriority p, o_orderstatus s, CAST(COUNT(*) AS BIGINT) n
      |  FROM orders GROUP BY 1, 2),
      |m AS (
      |  SELECT *, SUM(n) OVER (PARTITION BY p) row_n,
      |    SUM(n) OVER (PARTITION BY s) col_n, SUM(n) OVER () tot
      |  FROM c),
      |t AS (
      |  SELECT tot,
      |    (CAST(n AS DOUBLE) * tot - CAST(row_n AS DOUBLE) * col_n)
      |    * (CAST(n AS DOUBLE) * tot - CAST(row_n AS DOUBLE) * col_n)
      |    / (CAST(tot AS DOUBLE) * row_n * col_n) term,
      |    p, s
      |  FROM m)
      |SELECT CAST(MAX(tot) AS BIGINT) n_orders,
      |  list_reduce(list_prepend(0.0, list_sort(list(term))), (a, x) -> a + x) chi2,
      |  CAST((COUNT(DISTINCT p) - 1) * (COUNT(DISTINCT s) - 1) AS BIGINT) dof
      |FROM t""".stripMargin

  /** Robust outlier report via median absolute deviation: per event
    * type, the lower median m of value-cents, the lower median MAD of
    * |vc − m|, and the count of rows with |vc − m| > 5·MAD. ENTIRELY
    * integer arithmetic — medians are rank-based order statistics
    * (lower median, rank ⌈n/2⌉), deviations and the 5× threshold stay
    * in int64 — so unlike mean/stddev outliers there is no float
    * anywhere to disagree across engines or partitionings, and unlike
    * them the report is robust to the very outliers it hunts.
    *
    * Scale shape: two value-HISTOGRAM passes (map-side-combinable
    * shuffles whose size is distinct-value cardinality, not rows) and
    * one broadcast-join filter pass — the exact_median trick composed
    * twice; never a sort, never a low-cardinality row_number window.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))

    // lower median of `valCol` per event_type from a value histogram
    def histMedian(df: DataFrame, valCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(valCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.groupBy(col("event_type"), col(valCol))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hi", sum(col("cnt")).over(w))
        .withColumn("lo", col("hi") - col("cnt") + 1)
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("event_type"))))
        .withColumn("r", expr("(n + 1) div 2"))
        .where(col("r") >= col("lo") && col("r") <= col("hi"))
        .select(col("event_type"), col(valCol).as(out))
    }

    val med = histMedian(ev, "vc", "m")
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("vc") - col("m")).as("ad"))
    val mad = histMedian(dev, "ad", "mad")
    ev.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        max(col("m")).as("median_cents"),
        max(col("mad")).as("mad_cents"),
        sum((abs(col("vc") - col("m")) > lit(5) * col("mad")).cast("long"))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  def madOutliersOracle: String =
    s"""WITH v AS (
       |  SELECT event_type, ${Quantize.centsSql("value")} vc FROM events),
       |med AS (
       |  SELECT event_type, vc m FROM (
       |    SELECT event_type, vc,
       |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc) rn,
       |      COUNT(*) OVER (PARTITION BY event_type) n
       |    FROM v) WHERE rn = (n + 1) // 2),
       |dev AS (
       |  SELECT v.event_type, abs(vc - m) ad
       |  FROM v JOIN med ON v.event_type = med.event_type),
       |mad AS (
       |  SELECT event_type, ad mad FROM (
       |    SELECT event_type, ad,
       |      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) rn,
       |      COUNT(*) OVER (PARTITION BY event_type) n
       |    FROM dev) WHERE rn = (n + 1) // 2)
       |SELECT v.event_type, MAX(m) median_cents, MAX(mad) mad_cents,
       |  CAST(SUM(CASE WHEN abs(vc - m) > 5 * mad THEN 1 ELSE 0 END) AS BIGINT) n_outliers
       |FROM v JOIN med ON v.event_type = med.event_type
       |JOIN mad ON v.event_type = mad.event_type
       |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin

  /** Heavy hitters via the engine's Misra–Gries sketch
    * ([[graft.functions.MisraGries]]): which values occur more than
    * N/(k+1) times, answered by a k-counter mergeable summary — ONE
    * map-side-combinable pass, k-sized partials, no full groupBy over
    * the distinct values. At 100 TB this replaces a shuffle keyed by
    * every distinct value with a fixed k-row reduce.
    *
    * The skewed key is derived deterministically (floor(sqrt(props.k))
    * over the uniform k∈[0,100) gives value b share (2b+1)%, so three
    * values clear the 1/7 threshold at k=6 — and 10 distinct values
    * keep the 6-counter table genuinely evicting). Because MG
    * estimates depend on merge order, the query surfaces the sketch's
    * GUARANTEED facts as booleans the oracle pins TRUE — membership of
    * every true heavy hitter, no overestimate, error <= N/(k+1) — plus
    * the exact counts from a verification aggregate; raw estimates
    * stay internal, keeping the result partitioning-independent.
    */
  /** The deterministically skewed item key both heavy-hitter queries
    * sketch (floor(sqrt(props.k)): value b has share (2b+1)%).
    */
  private def skewedItems(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        floor(sqrt(get_json_object(col("props"), "$.k").cast("long")))
          .cast("long").cast("string").as("item"))
      .where(col("item").isNotNull)

  /** THE MG guarantee surface, single-sourced for the global and
    * grouped heavy-hitter queries: given the exact (groupCols, item,
    * exact_cnt) counts joined against the (groupCols, summary, n)
    * sketch rows, emit one row per TRUE heavy hitter with the
    * membership and error-bound booleans the oracle pins TRUE. A bound
    * change can never diverge the two queries.
    */
  private def heavyReport(
      joined: DataFrame, k: Int, groupCols: Seq[String]): DataFrame = {
    val keyCols = (groupCols :+ "item").map(col)
    joined
      .where(col("exact_cnt") * (k + 1) > col("n"))
      .select(
        keyCols ++ Seq(
          col("exact_cnt"), col("n"),
          filter(col("summary"),
            e => e.getField("item") === col("item")).as("hits")): _*)
      .select(
        keyCols ++ Seq(
          col("exact_cnt"), col("n"),
          (size(col("hits")) === 1).as("in_summary"),
          (size(col("hits")) === 1 &&
            element_at(col("hits"), 1).getField("est") <= col("exact_cnt") &&
            (col("exact_cnt") - element_at(col("hits"), 1).getField("est")) *
              (k + 1) <= col("n")).as("bound_ok")): _*)
      .orderBy(groupCols :+ "item" map col: _*)
  }

  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val k = 6
    val items = skewedItems(spark, dir)
    val sketch = items.agg(
      graft.functions.SketchFunctions.misraGries(col("item"), k).as("summary"),
      count(lit(1)).as("n"))
    val exact = items.groupBy(col("item"))
      .agg(count(lit(1)).as("exact_cnt"))
    heavyReport(exact.crossJoin(broadcast(sketch)), k, groupCols = Nil)
  }

  def heavyHittersOracle: String =
    """WITH items AS (
      |  SELECT CAST(CAST(floor(sqrt(CAST(json_extract_string(props, '$.k') AS BIGINT))) AS BIGINT) AS VARCHAR) AS item
      |  FROM events WHERE props IS NOT NULL
      |    AND json_extract_string(props, '$.k') IS NOT NULL),
      |tot AS (SELECT CAST(count(*) AS BIGINT) n FROM items),
      |exact AS (
      |  SELECT item, CAST(count(*) AS BIGINT) exact_cnt FROM items GROUP BY 1)
      |SELECT item, exact_cnt, (SELECT n FROM tot) AS n,
      |  TRUE AS in_summary, TRUE AS bound_ok
      |FROM exact WHERE exact_cnt * 7 > (SELECT n FROM tot)
      |ORDER BY item""".stripMargin

  /** Per-group heavy hitters — the sketch composes with grouping
    * exactly like any aggregate (one pass, k counters PER GROUP, the
    * per-tenant frequency shape): each event type's summary carries
    * its own N_g/(k+1) guarantee. Same guarantee-pinned surface as
    * [[heavyHitters]], one group column wider.
    */
  def heavyHittersGrouped(spark: SparkSession, dir: String): DataFrame = {
    val k = 6
    val items = skewedItems(spark, dir)
    val sketch = items.groupBy(col("event_type")).agg(
      graft.functions.SketchFunctions.misraGries(col("item"), k).as("summary"),
      count(lit(1)).as("n"))
    val exact = items.groupBy(col("event_type"), col("item"))
      .agg(count(lit(1)).as("exact_cnt"))
    heavyReport(
      exact.join(broadcast(sketch), "event_type"), k,
      groupCols = Seq("event_type"))
  }

  def heavyHittersGroupedOracle: String =
    """WITH items AS (
      |  SELECT event_type,
      |    CAST(CAST(floor(sqrt(CAST(json_extract_string(props, '$.k') AS BIGINT))) AS BIGINT) AS VARCHAR) AS item
      |  FROM events WHERE props IS NOT NULL
      |    AND json_extract_string(props, '$.k') IS NOT NULL),
      |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) n
      |        FROM items GROUP BY 1),
      |exact AS (
      |  SELECT event_type, item, CAST(count(*) AS BIGINT) exact_cnt
      |  FROM items GROUP BY 1, 2)
      |SELECT exact.event_type, item, exact_cnt, n,
      |  TRUE AS in_summary, TRUE AS bound_ok
      |FROM exact JOIN tot ON exact.event_type = tot.event_type
      |WHERE exact_cnt * 7 > n
      |ORDER BY exact.event_type, item""".stripMargin

  /** Join-key skew diagnostics — the report that decides between a
    * plain shuffle join, AQE skew splitting, and explicit salting
    * BEFORE the expensive join runs: per-key group sizes of
    * orders.o_custkey summarized as exact order statistics. The size
    * HISTOGRAM (distinct sizes, not keys) is what gets ranked, via the
    * triangular broadcast self-join cumulative (the ntile/no-global-
    * window idiom) — a KB-scale computation however many rows the fact
    * table has. top_key_ppm (largest key's share of all rows) is the
    * direct salt-or-not signal.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("sz"))
    val hist = sizes.groupBy(col("sz")).agg(count(lit(1)).as("cnt"))
    val cum = hist.as("a")
      .join(broadcast(hist.as("b")), col("b.sz") <= col("a.sz"))
      .groupBy(col("a.sz").as("sz"), col("a.cnt").as("cnt"))
      .agg(sum(col("b.cnt")).as("hi"))
      .withColumn("lo", col("hi") - col("cnt") + 1)
    val totals = hist.agg(
      sum(col("cnt")).as("n_keys"),
      sum(col("sz") * col("cnt")).as("n_rows"),
      max(col("sz")).as("max_sz"))
    def atRank(r: org.apache.spark.sql.Column) =
      max(when(r.between(col("lo"), col("hi")), col("sz")))
    cum.crossJoin(broadcast(totals))
      .groupBy(col("n_keys"), col("n_rows"), col("max_sz"))
      .agg(
        atRank(expr("(n_keys + 1) div 2")).as("p50_sz"),
        atRank(expr("(99 * n_keys + 99) div 100")).as("p99_sz"))
      .select(
        col("n_keys"), col("n_rows"), col("p50_sz"), col("p99_sz"),
        col("max_sz"),
        call_function("div", col("max_sz") * lit(1000000L), col("n_rows"))
          .as("top_key_ppm"))
  }

  def skewReportOracle: String =
    """WITH sizes AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) sz
      |  FROM orders GROUP BY 1),
      |h AS (SELECT sz, CAST(COUNT(*) AS BIGINT) cnt FROM sizes GROUP BY sz),
      |r AS (
      |  SELECT *, SUM(cnt) OVER (ORDER BY sz
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) hi
      |  FROM h),
      |i AS (SELECT *, hi - cnt + 1 lo FROM r),
      |t AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) n_keys,
      |    CAST(SUM(sz * cnt) AS BIGINT) n_rows,
      |    MAX(sz) max_sz
      |  FROM h)
      |SELECT n_keys, n_rows,
      |  MAX(CASE WHEN (n_keys + 1) // 2 BETWEEN lo AND hi THEN sz END) p50_sz,
      |  MAX(CASE WHEN (99 * n_keys + 99) // 100 BETWEEN lo AND hi THEN sz END) p99_sz,
      |  max_sz,
      |  CAST(max_sz * 1000000 // n_rows AS BIGINT) top_key_ppm
      |FROM i, t GROUP BY n_keys, n_rows, max_sz""".stripMargin

  /** Per-nation OLS trend of monthly revenue: x = month index, y =
    * monthly revenue cents, slope/intercept/r² from the closed form
    * over exact moment sums. Sums that can leave int64 at scale (Σy,
    * Σxy, Σy²) accumulate as DECIMAL(38,0) on the Spark side and
    * HUGEINT in DuckDB — both lossless, both converting to the same
    * nearest-double operands for the one final float expression.
    *
    * Scale shape: fact⋈customer shuffles once, nation broadcasts, the
    * monthly pre-aggregate is map-side combinable, and the per-nation
    * regression runs over a nations×months table — aggregate-sized
    * regardless of fact volume. The trend-per-group question at 100 TB
    * costs exactly the revenue-per-group aggregate.
    */
  def linregTrend(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.read(spark, dir, "orders")
    val cust = Tables.read(spark, dir, "customer")
    val nation = Tables.read(spark, dir, "nation")
    val monthly = orders
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(
        col("n_name"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
          .as("x"))
      .agg(sum(Quantize.cents(col("o_totalprice"))).as("yc"))
    val ycD = col("yc").cast("decimal(38,0)")
    val m = monthly.groupBy(col("n_name")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(ycD).as("sy"),
      sum(col("x").cast("decimal(38,0)") * ycD).as("sxy"),
      sum(ycD * ycD).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val sxxD = col("sxx").cast("double")
    val syD = col("sy").cast("double")
    val sxyD = col("sxy").cast("double")
    val covN = nD * sxyD - sxD * syD // n·Σxy − Σx·Σy
    val varX = nD * sxxD - sxD * sxD
    val slope = covN / varX
    // r² stays INTEGER (ppm): Σy² crosses 2^53 already at sf0.1 and
    // DuckDB's HUGEINT→double is not correctly rounded (Spark's
    // Decimal→double is), so any float touching syy diverges in the
    // last ulps. cov²·10⁶ ~ 8e36 at sf1 — inside DECIMAL(38,0) and
    // HUGEINT; past ~sf3 swap the ppm numerator to a coarser quantum.
    val dec = "decimal(38,0)"
    m.withColumn("covi",
        col("n").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy"))
      .withColumn("varxi",
        col("n").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx"))
      .withColumn("varyi",
        col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
      .select(
        col("n_name"),
        col("n").as("n_months"),
        slope.as("slope_cents"),
        ((syD - covN / varX * sxD) / nD).as("intercept_cents"),
        expr("""CASE WHEN varxi * varyi = 0 THEN CAST(NULL AS BIGINT)
          ELSE (CAST(1000000 AS decimal(38,0)) * covi * covi) div (varxi * varyi)
          END""").as("r2_ppm"))
      .orderBy("n_name")
  }

  def linregTrendOracle: String =
    s"""WITH monthly AS (
      |  SELECT n_name,
      |    (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS x,
      |    SUM(${Quantize.centsSql("o_totalprice")}) yc
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT n_name, CAST(COUNT(*) AS BIGINT) n,
      |    SUM(x) sx, SUM(x * x) sxx,
      |    SUM(CAST(yc AS HUGEINT)) sy,
      |    SUM(CAST(x AS HUGEINT) * yc) sxy,
      |    SUM(CAST(yc AS HUGEINT) * yc) syy
      |  FROM monthly GROUP BY 1)
      |SELECT n_name, n AS n_months,
      |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    AS slope_cents,
      |  (CAST(sy AS DOUBLE)
      |    - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |      * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents,
      |  CASE WHEN (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
      |            * (CAST(n AS HUGEINT) * syy - sy * sy) = 0
      |    THEN CAST(NULL AS BIGINT)
      |    ELSE CAST(
      |      (1000000 * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
      |               * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy))
      |      // ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
      |         * (CAST(n AS HUGEINT) * syy - sy * sy)) AS BIGINT)
      |    END AS r2_ppm
      |FROM m ORDER BY n_name""".stripMargin

  /** `ks_test`: two-sample Kolmogorov–Smirnov distribution test — the
    * CONTINUOUS member of the drift-detection family (chi_square
    * covers categorical, drift_cusum covers temporal location shift):
    * D = max over v of |F1(v) − F2(v)| between the click and purchase
    * value distributions, evaluated on the pooled value grid.
    *
    * Exactness: values quantize to cents, CDFs never materialize as
    * floats — the statistic is max |cum1·n2 − cum2·n1| over integer
    * cumulatives, divided once at the end (ppm floor division). The
    * α=0.05 decision compares D² against c²·(n1+n2)/(n1·n2)
    * (c = 1.358) cross-multiplied into DECIMAL(38,0), so even the
    * significance boolean is bit-exact across engines.
    *
    * Scale shape: the only fact-sized operation is the (value →
    * c1, c2) histogram aggregate. Cumulatives then run as the SHARDED
    * prefix sum (the pack_sequences idiom): values hash into ordered
    * $10 shards, each shard's running sum is a shard-PARTITIONED
    * window (never a global window), and cross-shard offsets come
    * from a triangular join over the ~50-row shard-total table. The
    * value DOMAIN (bounded cents), not the event count, caps the
    * window input at every scale.
    */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(
        Quantize.cents(col("value")).as("vc"),
        col("event_type").as("g"))
    val hist = ev.groupBy(col("vc")).agg(
      count(when(col("g") === "click", 1)).as("c1"),
      count(when(col("g") === "purchase", 1)).as("c2"))
    // shard width derives from the OBSERVED max (integer, so the
    // oracle replicates it exactly): ~64 ordered shards at ANY value
    // domain — a fixed width would blow the shard count (and the
    // triangular offset join) on a wider domain than it was tuned for
    val width = hist.agg(expr("max(vc) div 64 + 1").as("w"))
    val sharded = hist.crossJoin(broadcast(width))
      .withColumn("shard", expr("vc div w"))
    val w = Window.partitionBy(col("shard")).orderBy(col("vc"))
    val inShard = sharded
      .withColumn("cum1_in", sum(col("c1")).over(w))
      .withColumn("cum2_in", sum(col("c2")).over(w))
    val shardTotals = sharded.groupBy(col("shard")).agg(
      sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
    val offsets = shardTotals.as("a")
      .join(
        broadcast(shardTotals.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(
        coalesce(sum(col("b.t1")), lit(0L)).as("off1"),
        coalesce(sum(col("b.t2")), lit(0L)).as("off2"))
    val n = hist.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val d = inShard
      .join(broadcast(offsets), "shard")
      .crossJoin(broadcast(n))
      .select(
        col("vc"), col("n1"), col("n2"),
        abs((col("off1") + col("cum1_in")) * col("n2") -
          (col("off2") + col("cum2_in")) * col("n1")).as("dn"))
    val m = d.groupBy(col("n1"), col("n2")).agg(max(col("dn")).as("maxdn"))
    d.join(broadcast(m), Seq("n1", "n2"))
      .where(col("dn") === col("maxdn"))
      .groupBy(col("n1"), col("n2"), col("maxdn"))
      .agg(min(col("vc")).as("at_cents"))
      .select(
        col("n1"), col("n2"),
        expr("maxdn * 1000000 div (n1 * n2)").as("d_ppm"),
        col("at_cents"),
        (col("maxdn").cast("decimal(38,0)") *
          col("maxdn").cast("decimal(38,0)") * lit(1000000) >
          lit(1844164).cast("decimal(38,0)") *
          (col("n1") + col("n2")) * col("n1") * col("n2"))
          .as("reject_95"))
  }

  def ksTestOracle: String =
    """WITH ev AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) vc, event_type g
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |hist AS (
      |  SELECT vc,
      |    CAST(count(*) FILTER (g = 'click') AS BIGINT) c1,
      |    CAST(count(*) FILTER (g = 'purchase') AS BIGINT) c2
      |  FROM ev GROUP BY 1),
      |n AS (
      |  SELECT CAST(sum(c1) AS BIGINT) n1, CAST(sum(c2) AS BIGINT) n2
      |  FROM hist),
      |cum AS (
      |  SELECT vc,
      |    CAST(sum(c1) OVER (ORDER BY vc) AS BIGINT) f1,
      |    CAST(sum(c2) OVER (ORDER BY vc) AS BIGINT) f2
      |  FROM hist),
      |d AS (
      |  SELECT vc, abs(f1 * n.n2 - f2 * n.n1) dn FROM cum, n),
      |m AS (SELECT max(dn) maxdn FROM d)
      |SELECT n.n1, n.n2,
      |  m.maxdn * 1000000 // (n.n1 * n.n2) AS d_ppm,
      |  (SELECT min(vc) FROM d WHERE dn = m.maxdn) AS at_cents,
      |  (CAST(m.maxdn AS HUGEINT) * m.maxdn * 1000000 >
      |   CAST(1844164 AS HUGEINT) * (n.n1 + n.n2) * n.n1 * n.n2)
      |    AS reject_95
      |FROM n, m""".stripMargin

  /** `ab_test`: two-proportion experiment readout — users content-hash
    * into variants A/B (the deterministic assignment every real
    * experiment framework uses — reproducible across engines, runs
    * and partitionings, unlike rand()), conversion = fired at least
    * one purchase event, and the pooled two-proportion z statistic
    * decides significance. The algebra is cross-multiplied so no
    * square root or float division ever happens:
    * z² = (c1·n2 − c2·n1)²·N div (n1·n2·(c1+c2)·(N−c1−c2)), N=n1+n2,
    * reported in milli (z² > 3841/1000 ⟺ p < 0.05 two-sided, the
    * χ²₁ 95% quantile 3.841459 held as an integer micro constant).
    * The squared numerator crosses 2^63 around 10⁴ users/arm, so the
    * decision arithmetic runs in DECIMAL(38,0)/HUGEINT — the
    * linreg_trend discipline.
    *
    * Plan shape: ONE fact-sized aggregate (per-user conversion flag
    * via max(when)), then a 2-row variant rollup and single-row
    * algebra. Nothing else moves at 100 TB.
    */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    // "ever purchased" saturates on this data (every user buys inside
    // the 30-day window), which zeroes p̂(1−p̂) — so the conversion
    // event is the heavy-buyer cut at the corpus median (>= 14
    // purchases), non-degenerate at every SF; the zero-variance edge
    // still guards to NULL rather than throwing under ANSI.
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg((count(when(col("event_type") === "purchase", 1)) >= 14)
        .cast("long").as("converted"))
      .withColumn("variant", ContentHash.bucket(col("user_id"), 2))
    val arms = perUser.groupBy(col("variant")).agg(
      count(lit(1)).as("n"), sum(col("converted")).as("c"))
    val wide = arms.agg(
      sum(when(col("variant") === 0, col("n"))).as("n_a"),
      sum(when(col("variant") === 0, col("c"))).as("c_a"),
      sum(when(col("variant") === 1, col("n"))).as("n_b"),
      sum(when(col("variant") === 1, col("c"))).as("c_b"))
    val dec = "decimal(38,0)"
    wide.select(
      col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      expr(
        s"""CASE WHEN c_a + c_b = 0 OR n_a + n_b - c_a - c_b = 0
           |  THEN NULL
           |  ELSE CAST((CAST(c_a AS $dec) * n_b - CAST(c_b AS $dec) * n_a)
           |    * (CAST(c_a AS $dec) * n_b - CAST(c_b AS $dec) * n_a)
           |    * (n_a + n_b) * 1000
           |    div (CAST(n_a AS $dec) * n_b * (c_a + c_b)
           |         * (n_a + n_b - c_a - c_b)) AS BIGINT) END""".stripMargin
          .replaceAll("\n", " ")).as("z2_milli"),
      expr(
        s"""(CAST(c_a AS $dec) * n_b - CAST(c_b AS $dec) * n_a)
           |  * (CAST(c_a AS $dec) * n_b - CAST(c_b AS $dec) * n_a)
           |  * (n_a + n_b) * 1000000
           |  > CAST(3841459 AS $dec) * n_a * n_b * (c_a + c_b)
           |    * (n_a + n_b - c_a - c_b)""".stripMargin
          .replaceAll("\n", " ")).as("reject_95"))
  }

  def abTestOracle: String = {
    val b = ContentHash.bucketSql("user_id", 2)
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(count(*) FILTER (event_type = 'purchase') >= 14
      |      AS BIGINT) converted,
      |    BKT variant
      |  FROM events GROUP BY user_id),
      |wide AS (
      |  SELECT
      |    CAST(count(*) FILTER (variant = 0) AS BIGINT) n_a,
      |    CAST(sum(converted) FILTER (variant = 0) AS BIGINT) c_a,
      |    CAST(count(*) FILTER (variant = 1) AS BIGINT) n_b,
      |    CAST(sum(converted) FILTER (variant = 1) AS BIGINT) c_b
      |  FROM pu)
      |SELECT n_a, c_a, n_b, c_b,
      |  CASE WHEN c_a + c_b = 0 OR n_a + n_b - c_a - c_b = 0 THEN NULL
      |  ELSE CAST((CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)
      |    * (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)
      |    * (n_a + n_b) * 1000
      |    // (CAST(n_a AS HUGEINT) * n_b * (c_a + c_b)
      |       * (n_a + n_b - c_a - c_b)) AS BIGINT) END z2_milli,
      |  (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)
      |    * (CAST(c_a AS HUGEINT) * n_b - CAST(c_b AS HUGEINT) * n_a)
      |    * (n_a + n_b) * 1000000
      |    > CAST(3841459 AS HUGEINT) * n_a * n_b * (c_a + c_b)
      |      * (n_a + n_b - c_a - c_b) reject_95
      |FROM wide""".stripMargin.replace("BKT", b)
  }

  /** `hhi_concentration`: Herfindahl–Hirschman supplier-concentration
    * index per part — the sourcing-risk diagnostic (gini_index
    * measures user-revenue inequality; HHI measures how captive a
    * part is to few suppliers; > 2500 basis points is the antitrust
    * "highly concentrated" line). HHI = Σ shareᵢ² computed without
    * materializing float shares: hhi_ppm = (Σ qᵢ²)·10⁶ div (Σ qᵢ)²
    * over per-(part, supplier) quantity sums — one fact-sized
    * aggregate, one part-grain rollup, everything after is integer
    * algebra on the grid. Restricted to part < 50 for stable oracle
    * output.
    */
  def hhiConcentration(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.read(spark, dir, "lineitem")
      .where(col("l_partkey") < 50)
      .groupBy(col("l_partkey").as("part"), col("l_suppkey"))
      // floor() pins the decimal→int rule on both engines (see
      // fifo_match) rather than relying on integral quantities.
      .agg(sum(floor(col("l_quantity")).cast("long")).as("q"))
    ps.groupBy(col("part"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("q")).as("total_q"),
        sum(col("q") * col("q")).as("sq"))
      .select(
        col("part"), col("n_suppliers"), col("total_q"),
        expr("(sq * 1000000) div (total_q * total_q)").as("hhi_ppm"))
      .withColumn("concentrated", col("hhi_ppm") >= 250000L)
      .orderBy("part")
  }

  def hhiConcentrationOracle: String =
    """WITH ps AS (
      |  SELECT l_partkey part, l_suppkey,
      |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) q
      |  FROM lineitem WHERE l_partkey < 50 GROUP BY 1, 2)
      |SELECT part, CAST(count(*) AS BIGINT) n_suppliers,
      |  CAST(sum(q) AS BIGINT) total_q,
      |  (CAST(sum(q * q) AS BIGINT) * 1000000)
      |    // (CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT)) hhi_ppm,
      |  ((CAST(sum(q * q) AS BIGINT) * 1000000)
      |    // (CAST(sum(q) AS BIGINT) * CAST(sum(q) AS BIGINT)) >= 250000)
      |    concentrated
      |FROM ps GROUP BY part ORDER BY part""".stripMargin

  /** Benford first-digit expected shares in ppm: floor(log10(1+1/d)
    * · 10⁶), hard-coded as literals in BOTH engines so no log() ever
    * crosses the engine boundary.
    */
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /** `benford_test`: first-significant-digit distribution of order
    * totals against Benford's law — the forensic-accounting /
    * data-fabrication screen run over any financial fact table
    * (fabricated or truncated data flattens the leading-digit curve).
    * Observed shares and deviations are integer ppm; the expected
    * shares are pinned literals, so the whole panel is hash-exact.
    * TPC-H prices are uniform-ish, NOT Benford — the panel measures
    * the deviation rather than asserting conformance; dev_ppm is the
    * per-digit signal a monitor thresholds on.
    *
    * Plan shape: one narrow scan → 9-row digit aggregate → broadcast
    * 1-row total; nothing downstream of the first aggregate is
    * fact-sized. At 100 TB this is a map-side-combinable count per
    * digit — the cheapest possible full-table screen.
    */
  def benfordTest(spark: SparkSession, dir: String): DataFrame = {
    val expected = BenfordPpm
      .map { case (d, p) => s"WHEN digit = $d THEN ${p}L" }
      .mkString("CASE ", " ", " END")
    val digits = Tables.read(spark, dir, "orders")
      .select(Quantize.cents(col("o_totalprice")).as("cents"))
      // cents > 0 for every order; the leading char of the decimal
      // rendering IS the first significant digit
      .select(substring(col("cents").cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("tot"))
    digits.crossJoin(broadcast(tot))
      .select(
        col("digit"),
        col("n_obs"),
        expr("n_obs * 1000000 div tot").as("obs_ppm"),
        expr(expected).as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
      .orderBy("digit")
  }

  def benfordTestOracle: String = {
    val expected = BenfordPpm
      .map { case (d, p) => s"WHEN digit = $d THEN $p" }
      .mkString("CASE ", " ", " END")
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(${Quantize.centsSql("o_totalprice")} AS VARCHAR), 1, 1) AS BIGINT) digit
       |  FROM orders),
       |g AS (SELECT digit, CAST(count(*) AS BIGINT) n_obs FROM d GROUP BY 1),
       |t AS (SELECT CAST(sum(n_obs) AS BIGINT) tot FROM g)
       |SELECT digit, n_obs,
       |  n_obs * 1000000 // tot obs_ppm,
       |  CAST($expected AS BIGINT) exp_ppm,
       |  n_obs * 1000000 // tot - CAST($expected AS BIGINT) dev_ppm
       |FROM g, t ORDER BY digit""".stripMargin
  }

  /** `join_size_estimate`: the textbook equi-join cardinality
    * estimate. DISTINCT from `join_size_est`
    * ([[graft.queries.Sketches.joinSizeEst]]): that one answers the
    * same planner question from Count-Min sketch inner products
    * (sub-linear memory, overestimate bound); this one uses the
    * exact-statistics formula |A⋈B| ≈ |A|·|B| / max(d_A, d_B) computed from exact
    * per-side statistics and compared against the true join size —
    * the optimizer-diagnostics readout (a large err_ppm on a
    * production join is the signal its key distribution violates the
    * uniformity assumption and needs a histogram or a salt, exactly
    * what `skew_report`/`salt_plan` then quantify). Two joins
    * audited: orders⋈customer (FK, est exact by construction) and
    * lineitem⋈orders.
    *
    * Plan shape: per join, two single-pass side aggregates (count +
    * count-distinct) and one exact join count; outputs are 1-row per
    * audited join. The estimate needs only per-side stats — at
    * 100 TB that's the point: the est column costs two narrow scans
    * while the actual column costs the join, and production uses the
    * estimate precisely to decide whether to run such joins.
    */
  def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    def audit(
        name: String, a: DataFrame, ka: String, b: DataFrame, kb: String)
        : DataFrame = {
      val sa = a.agg(
        count(lit(1)).as("n_left"),
        countDistinct(col(ka)).as("d_left"))
      val sb = b.agg(
        count(lit(1)).as("n_right"),
        countDistinct(col(kb)).as("d_right"))
      val actual = a.join(b, col(ka) === col(kb))
        .agg(count(lit(1)).as("actual"))
      sa.crossJoin(sb).crossJoin(actual)
        .select(
          lit(name).as("join_name"),
          col("n_left"), col("d_left"), col("n_right"), col("d_right"),
          expr("n_left * n_right div greatest(d_left, d_right)").as("est"),
          col("actual"))
        .withColumn(
          "err_ppm",
          expr("""CASE WHEN est >= actual
                 |  THEN ((est - actual) * 1000000) div actual
                 |  ELSE -(((actual - est) * 1000000) div actual)
                 |END""".stripMargin))
    }
    val ord = Tables.read(spark, dir, "orders")
    audit(
      "orders_customer", ord.select(col("o_custkey")), "o_custkey",
      Tables.read(spark, dir, "customer").select(col("c_custkey")),
      "c_custkey")
      .unionByName(audit(
        "lineitem_orders",
        Tables.read(spark, dir, "lineitem").select(col("l_orderkey")),
        "l_orderkey", ord.select(col("o_orderkey")), "o_orderkey"))
      .orderBy("join_name")
  }

  def joinSizeEstimateOracle: String = {
    def audit(name: String, a: String, ka: String, b: String, kb: String) =
      s"""SELECT '$name' join_name,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $a) n_left,
         |  (SELECT CAST(count(DISTINCT $ka) AS BIGINT) FROM $a) d_left,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $b) n_right,
         |  (SELECT CAST(count(DISTINCT $kb) AS BIGINT) FROM $b) d_right,
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM $a JOIN $b ON $ka = $kb) actual""".stripMargin
    s"""WITH s AS (
       |${audit("orders_customer", "orders", "o_custkey", "customer", "c_custkey")}
       |UNION ALL
       |${audit("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")})
       |SELECT join_name, n_left, d_left, n_right, d_right,
       |  n_left * n_right // greatest(d_left, d_right) est, actual,
       |  CAST(CASE WHEN n_left * n_right // greatest(d_left, d_right) >= actual
       |    THEN ((n_left * n_right // greatest(d_left, d_right) - actual) * 1000000) // actual
       |    ELSE -(((actual - n_left * n_right // greatest(d_left, d_right)) * 1000000) // actual)
       |  END AS BIGINT) err_ppm
       |FROM s ORDER BY join_name""".stripMargin
  }

  /** Target rows-per-reducer for [[saltPlan]] — the knob a real job
    * sets from executor memory; pinned so the plan is hash-exact.
    */
  private val SaltTarget = 15L

  /** `salt_plan`: the skew-mitigation PLANNING table — for the
    * orders-per-customer key distribution, every hot key (group size
    * > [[SaltTarget]]) with its computed salt factor
    * ceil(cnt / target), plus the residual uniform keys folded to one
    * summary row. This is the table the salted-join pattern
    * (`skew_join`) consumes: replicate the dim side ×salt for hot
    * keys only, leave the uniform mass alone — `skew_report` says
    * WHETHER to salt, this says HOW MUCH, per key.
    *
    * Plan shape: one fact scan → key-grain count → threshold split;
    * the hot-key table is by definition tiny (heavy hitters), the
    * uniform remainder collapses to one aggregate row.
    */
  def saltPlan(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey").as("join_key"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = false) // both branches below
    val hot = counts.where(col("cnt") > SaltTarget)
      .select(
        lit("hot").as("key_class"), col("join_key"), col("cnt"),
        expr(s"(cnt + $SaltTarget - 1) div $SaltTarget").as("salt"))
    val uniform = counts.where(col("cnt") <= SaltTarget)
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("cnt"))
      .select(
        lit("uniform").as("key_class"), lit(-1L).as("join_key"),
        col("cnt"), lit(1L).as("salt"))
    hot.unionByName(uniform)
      .orderBy(col("key_class"), col("cnt").desc, col("join_key"))
  }

  def saltPlanOracle: String =
    s"""WITH c AS (
       |  SELECT o_custkey join_key, CAST(count(*) AS BIGINT) cnt
       |  FROM orders GROUP BY 1)
       |SELECT 'hot' key_class, join_key, cnt,
       |  (cnt + $SaltTarget - 1) // $SaltTarget salt
       |FROM c WHERE cnt > $SaltTarget
       |UNION ALL
       |SELECT 'uniform', CAST(-1 AS BIGINT),
       |  CAST(COALESCE(sum(cnt), 0) AS BIGINT), CAST(1 AS BIGINT)
       |FROM c WHERE cnt <= $SaltTarget
       |ORDER BY key_class, cnt DESC, join_key""".stripMargin

  /** Equi-depth histogram machinery shared by `equidepth_hist` and
    * `selectivity_estimate` — the optimizer-statistics structure
    * (DB2/Spark CBO both keep equi-HEIGHT histograms precisely
    * because equi-width lies under skew). Global ranks over the
    * ~150k-distinct price domain WITHOUT a global window: the ks_test
    * sharded-prefix-sum discipline — value-range shards ($20k wide),
    * a shard-PARTITIONED running sum within each, and triangular
    * cross-shard offsets over the ~25-row shard-total relation.
    * Bucket id = ((lo − 1)·B) div n: a value row belongs to the
    * bucket where its first rank falls, all integer.
    */
  private val EqDepthBuckets = 8
  private val EqDepthShard = 2000000L // $20k shard width, cents

  private def totalpriceRanked(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vh = Tables.read(spark, dir, "orders")
      .select(Quantize.cents(col("o_totalprice")).as("vc"))
      .groupBy(col("vc")).agg(count(lit(1)).as("cnt"))
      .withColumn("shard", expr(s"vc div $EqDepthShard"))
    val shardTot = vh.groupBy(col("shard")).agg(sum(col("cnt")).as("tot"))
    val offsets = shardTot.toDF("shard", "tot")
      .join(
        broadcast(shardTot.toDF("s2", "t2")),
        col("s2") < col("shard"), "left")
      .groupBy(col("shard"))
      .agg(coalesce(sum(col("t2")), lit(0L)).as("off"))
    val w = Window.partitionBy(col("shard")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vh.join(broadcast(offsets), "shard")
      .withColumn("hi", sum(col("cnt")).over(w) + col("off"))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .crossJoin(broadcast(
        Tables.read(spark, dir, "orders").agg(count(lit(1)).as("n"))))
      .withColumn("bucket", expr(s"((lo - 1) * $EqDepthBuckets) div n"))
  }

  /** The identical rank chain as oracle CTE text ending in
    * `ranked(vc, cnt, lo, hi, n, bucket)`.
    */
  private def rankedSql: String =
    s"""vh AS (
       |  SELECT ${Quantize.centsSql("o_totalprice")} vc,
       |    CAST(count(*) AS BIGINT) cnt,
       |    ${Quantize.centsSql("o_totalprice")} // $EqDepthShard shard
       |  FROM orders GROUP BY 1, 3),
       |st AS (SELECT shard, CAST(sum(cnt) AS BIGINT) tot FROM vh GROUP BY 1),
       |offs AS (
       |  SELECT a.shard, COALESCE(CAST(sum(b.tot) AS BIGINT), 0) cum_off
       |  FROM st a LEFT JOIN st b ON b.shard < a.shard GROUP BY 1),
       |rk AS (
       |  SELECT vh.vc, vh.cnt,
       |    SUM(vh.cnt) OVER (PARTITION BY vh.shard ORDER BY vh.vc
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + offs.cum_off hi
       |  FROM vh JOIN offs ON vh.shard = offs.shard),
       |ranked AS (
       |  SELECT vc, cnt, hi - cnt + 1 lo, hi,
       |    (SELECT CAST(count(*) AS BIGINT) FROM orders) n,
       |    CAST(((hi - cnt) * $EqDepthBuckets)
       |      // (SELECT count(*) FROM orders) AS BIGINT) bucket
       |  FROM rk)""".stripMargin

  /** `equidepth_hist`: the 8-bucket equi-depth histogram of order
    * totals — per bucket: value bounds, row count, distinct values.
    * Near-equal counts by construction (exact rank arithmetic, heavy
    * values may straddle); THE statistics object a cost-based
    * optimizer consults, built with one histogram shuffle + windows
    * only over histogram rows.
    */
  def equidepthHist(spark: SparkSession, dir: String): DataFrame =
    totalpriceRanked(spark, dir)
      .groupBy(col("bucket"))
      .agg(
        min(col("vc")).as("lo_cents"),
        max(col("vc")).as("hi_cents"),
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_values"))
      .orderBy("bucket")

  def equidepthHistOracle: String =
    s"""WITH $rankedSql
       |SELECT bucket, min(vc) lo_cents, max(vc) hi_cents,
       |  CAST(sum(cnt) AS BIGINT) n_rows, CAST(count(*) AS BIGINT) n_values
       |FROM ranked GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Range predicate audited by `selectivity_estimate`: cents bounds
    * [A, B). */
  private val SelLoC = 2500000L // $25k
  private val SelHiC = 15000000L // $150k

  /** `selectivity_estimate`: filter-selectivity estimation off the
    * equi-depth histogram vs the true count — join_size_estimate's
    * sibling (that row audits the join-cardinality formula; this one
    * audits range-predicate selectivity, the other half of every
    * cost model). Estimate = Σ_buckets n_rows·overlap div width
    * (uniform-within-bucket, pure integer), truth = one counting
    * scan, error sign-split ppm. The whole estimate runs on the
    * 8-row histogram — at 100 TB the stats object answers without
    * touching the table, which is the point.
    */
  /** The session-shared 8-row equi-depth histogram the selectivity
    * audit consults — a cost-model stats object is PRE-BUILT in
    * production, so the consumer reading a materialized copy is the
    * faithful shape (and the old plan re-ran the whole rank chain per
    * invocation). Cache-plan honesty (the minhashLshShared rule):
    * only the 3-column consumer projection persists — it drops
    * bucket/n_values, so it matches no subtree of the REGISTERED
    * `equidepth_hist` query, whose benched cost stays the real chain.
    */
  private val eqdepthCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def equidepthShared(
      spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val stale =
      eqdepthCache.keys.asScala.filter(_._1.sparkContext.isStopped).toList
    stale.foreach(eqdepthCache.remove)
    eqdepthCache.computeIfAbsent(
      (spark, dir),
      { case (s, d) =>
        equidepthHist(s, d)
          .select(col("lo_cents"), col("hi_cents"), col("n_rows"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
  }

  /** Drop the shared histogram for `dir` (post-rewrite). */
  def invalidateShared(spark: SparkSession, dir: String): Unit = {
    val df = eqdepthCache.remove((spark, dir))
    if (df != null) df.unpersist()
  }

  def selectivityEstimate(spark: SparkSession, dir: String): DataFrame = {
    val b = equidepthShared(spark, dir)
      .withColumn(
        "overlap",
        greatest(
          lit(0L),
          least(col("hi_cents"), lit(SelHiC - 1)) -
            greatest(col("lo_cents"), lit(SelLoC)) + 1))
      .withColumn("width", col("hi_cents") - col("lo_cents") + 1)
    val est = b.agg(
      sum(expr("n_rows * overlap div width")).as("est_rows"),
      sum(when(col("overlap") > 0, 1L).otherwise(0L)).as("buckets_touched"))
    val actual = Tables.read(spark, dir, "orders")
      .where(
        Quantize.cents(col("o_totalprice")) >= SelLoC &&
          Quantize.cents(col("o_totalprice")) < SelHiC)
      .agg(count(lit(1)).as("actual_rows"))
    est.crossJoin(broadcast(actual))
      .withColumn(
        "err_ppm",
        // empty-selection edge → NULL, not ANSI DIVIDE_BY_ZERO (the
        // lsh_recall zero-guard convention)
        expr("""CASE WHEN actual_rows = 0 THEN NULL
               |  WHEN est_rows >= actual_rows
               |  THEN ((est_rows - actual_rows) * 1000000) div actual_rows
               |  ELSE -(((actual_rows - est_rows) * 1000000) div actual_rows)
               |END""".stripMargin))
  }

  def selectivityEstimateOracle: String =
    s"""WITH $rankedSql,
       |h AS (
       |  SELECT bucket, min(vc) lo_cents, max(vc) hi_cents,
       |    CAST(sum(cnt) AS BIGINT) n_rows
       |  FROM ranked GROUP BY bucket),
       |ov AS (
       |  SELECT *,
       |    greatest(0, least(hi_cents, ${SelHiC - 1})
       |      - greatest(lo_cents, $SelLoC) + 1) overlap,
       |    hi_cents - lo_cents + 1 width
       |  FROM h),
       |e AS (
       |  SELECT CAST(sum(n_rows * overlap // width) AS BIGINT) est_rows,
       |    CAST(sum(CASE WHEN overlap > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      buckets_touched
       |  FROM ov),
       |a AS (
       |  SELECT CAST(count(*) AS BIGINT) actual_rows FROM orders
       |  WHERE ${Quantize.centsSql("o_totalprice")} >= $SelLoC
       |    AND ${Quantize.centsSql("o_totalprice")} < $SelHiC)
       |SELECT est_rows, buckets_touched, actual_rows,
       |  CAST(CASE WHEN actual_rows = 0 THEN NULL
       |    WHEN est_rows >= actual_rows
       |    THEN ((est_rows - actual_rows) * 1000000) // actual_rows
       |    ELSE -(((actual_rows - est_rows) * 1000000) // actual_rows)
       |  END AS BIGINT) err_ppm
       |FROM e, a""".stripMargin

  /** `diff_in_diff`: the difference-in-differences readout — the
    * quasi-experimental estimator beside ab_test's randomized one
    * (when assignment isn't randomized, DiD subtracts each group's
    * OWN pre-period baseline, removing time-invariant group effects
    * and the common time trend). Cells: content-hash group × a
    * pinned period cutoff (2024-01-16). All four cell means are
    * integer micro-cents (sum·10⁶ div n — floor division pinned, so
    * the estimate is bit-stable), DiD = (T_post − T_pre) − (C_post −
    * C_pre). One 4-cell conditional aggregate over the fact scan;
    * nothing downstream is ever row-sized.
    */
  private val DidCutoff = "2024-01-16"

  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(
        ContentHash.bucket(col("user_id"), 2).as("grp"),
        (to_date(col("ts")) >= lit(DidCutoff).cast("date")).as("post"),
        Quantize.cents(col("value")).as("vc"))
      .groupBy(col("grp"), col("post"))
      .agg(sum(col("vc")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_uc", expr("s * 1000000 div n"))
    def cell(g: Int, p: Boolean) =
      sum(when(col("grp") === g && col("post") === p, col("mean_uc")))
    cells.agg(
        cell(1, false).as("t_pre_uc"), cell(1, true).as("t_post_uc"),
        cell(0, false).as("c_pre_uc"), cell(0, true).as("c_post_uc"))
      .withColumn(
        "did_uc",
        (col("t_post_uc") - col("t_pre_uc")) -
          (col("c_post_uc") - col("c_pre_uc")))
  }

  def diffInDiffOracle: String =
    s"""WITH e AS (
       |  SELECT ${ContentHash.bucketSql("user_id", 2)} grp,
       |    CAST(CAST(ts AS TIMESTAMP) AS DATE) >= DATE '$DidCutoff' post,
       |    ${Quantize.centsSql("value")} vc
       |  FROM events),
       |c AS (
       |  SELECT grp, post, CAST(sum(vc) AS BIGINT) * 1000000
       |      // CAST(count(*) AS BIGINT) mean_uc
       |  FROM e GROUP BY 1, 2),
       |w AS (
       |  SELECT
       |    CAST(sum(CASE WHEN grp = 1 AND NOT post THEN mean_uc END) AS BIGINT) t_pre_uc,
       |    CAST(sum(CASE WHEN grp = 1 AND post THEN mean_uc END) AS BIGINT) t_post_uc,
       |    CAST(sum(CASE WHEN grp = 0 AND NOT post THEN mean_uc END) AS BIGINT) c_pre_uc,
       |    CAST(sum(CASE WHEN grp = 0 AND post THEN mean_uc END) AS BIGINT) c_post_uc
       |  FROM c)
       |SELECT t_pre_uc, t_post_uc, c_pre_uc, c_post_uc,
       |  (t_post_uc - t_pre_uc) - (c_post_uc - c_pre_uc) did_uc
       |FROM w""".stripMargin

  /** `theil_sen`: robust trend — the Theil–Sen estimator (median of
    * all pairwise slopes) over the weekly revenue series, reported
    * beside the OLS slope it robustifies (outlier weeks move OLS,
    * not the pairwise median). Scale shape: the only corpus-sized
    * work is the one week-grain aggregate; the pair stage is the
    * CALENDAR GRID squared (~340 weeks → ~57k pairs at ANY corpus
    * size — a broadcast inequality join over a grid relation, the
    * range_join discipline), and the median over pair slopes runs
    * the weighted_median shard pattern: slope-value shards, shard
    * totals broadcast as cumulative offsets, the rank window
    * partitioned (shard, never global). Slopes quantized to
    * millicents/week via an identical floor(double) on both engines
    * (truncating integer div would diverge on negative slopes);
    * the OLS closed form evaluates the textually-identical IEEE
    * expression over exact integer moments.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekly = Tables.read(spark, dir, "orders")
      .select(
        // axis based at the dataset's own epoch (orders start 1992):
        // small x values keep the integer OLS moments in int64 —
        // n·Σ(wk·y) overflowed at sf1 on the unix-epoch axis
        expr("datediff(to_date(o_orderdate), DATE '1992-01-01') div 7")
          .cast("long").as("wk"),
        Quantize.cents(col("o_totalprice")).as("yc"))
      .groupBy(col("wk"))
      .agg(sum(col("yc")).as("y"))
    val a = weekly.select(col("wk").as("w1"), col("y").as("y1"))
    val b = weekly.select(col("wk").as("w2"), col("y").as("y2"))
    // try_divide: the nested-loop codegen can evaluate the slope for a
    // CANDIDATE row before the w1 < w2 condition drops it — ANSI would
    // throw on the w1 = w2 diagonal; try_ yields a NULL the condition
    // then discards (no real pair ever has w2 = w1).
    // persist: the slope histogram feeds FOUR consumers (shard totals,
    // offsets, the ranked cum path, n_pairs) — unpersisted, each one
    // re-ran the grid² nested loop and the week aggregate beneath it
    // (19s at sf0.1; 1.4s persisted)
    val slopes = a.join(broadcast(b), col("w1") < col("w2"))
      .select(
        expr("CAST(floor(try_divide(CAST((y2 - y1) * 1000 AS DOUBLE), " +
          "CAST(w2 - w1 AS DOUBLE))) AS BIGINT)")
          .as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("cnt"))
      .persist()
    // shard width ADAPTS to the slope range (1-row broadcast): a fixed
    // width put every distinct slope in its own shard (34k shards at
    // sf0.1) and the cumulative-offset self-join went quadratic in
    // shard count — 25s for what is a 65-shard, sub-second panel.
    // (s - mn) ≥ 0, so truncating div IS floor and shard order follows
    // value order.
    val mm = slopes.agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
    val sharded = slopes.crossJoin(broadcast(mm))
      .withColumn(
        "shard", expr("(s - mn) div greatest(1L, (mx - mn) div 64 + 1)"))
      .select(col("s"), col("cnt"), col("shard"))
    val shardTot = sharded.groupBy(col("shard")).agg(sum(col("cnt")).as("tot"))
    val offsets = shardTot
      .join(
        broadcast(shardTot.toDF("s2", "t2")),
        col("s2") < col("shard"), "left")
      .groupBy(col("shard"))
      .agg(coalesce(sum(col("t2")), lit(0L)).as("cum_off"))
    val wsh = Window.partitionBy(col("shard")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = slopes.agg(sum(col("cnt")).as("n_pairs"))
    val tsSlope = sharded
      .join(broadcast(offsets), Seq("shard"))
      .withColumn("cum", sum(col("cnt")).over(wsh) + col("cum_off"))
      .crossJoin(broadcast(totals))
      .where(col("cum") * 2 >= col("n_pairs"))
      .agg(min(col("s")).as("ts_slope_mc"), max(col("n_pairs")).as("n_pairs"))
    // OLS moments in whole DOLLARS (y div 100): cents would push
    // n·Σxy past int64 by sf10; ×100000.0 restores millicents at the
    // final (identical-IEEE) closed form
    val ols = weekly.agg(
      count(lit(1)).as("n_weeks"),
      sum(col("wk")).as("sx"),
      sum(expr("y div 100")).as("sy"),
      sum(col("wk") * expr("y div 100")).as("sxy"),
      sum(col("wk") * col("wk")).as("sxx"))
      .select(
        col("n_weeks"),
        expr("CAST(floor(100000.0 * (n_weeks * sxy - sx * sy) / " +
          "(n_weeks * sxx - sx * sx)) AS BIGINT)").as("ols_slope_mc"))
    tsSlope.crossJoin(broadcast(ols))
      .select(
        col("n_weeks"), col("n_pairs"), col("ts_slope_mc"),
        col("ols_slope_mc"))
  }

  def theilSenOracle: String =
    s"""WITH weekly AS (
       |  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) // 7 wk,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) y
       |  FROM orders GROUP BY 1),
       |pairs AS (
       |  SELECT CAST(floor(CAST((b.y - a.y) * 1000 AS DOUBLE) / (b.wk - a.wk)) AS BIGINT) s
       |  FROM weekly a JOIN weekly b ON a.wk < b.wk),
       |r AS (
       |  SELECT s,
       |    CAST(SUM(1) OVER (ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) cum,
       |    CAST(COUNT(*) OVER () AS BIGINT) n_pairs
       |  FROM pairs),
       |ts AS (
       |  SELECT min(s) ts_slope_mc, max(n_pairs) n_pairs
       |  FROM r WHERE cum * 2 >= n_pairs),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n_weeks, CAST(SUM(wk) AS BIGINT) sx,
       |    CAST(SUM(y // 100) AS BIGINT) sy, CAST(SUM(wk * (y // 100)) AS BIGINT) sxy,
       |    CAST(SUM(wk * wk) AS BIGINT) sxx
       |  FROM weekly)
       |SELECT m.n_weeks, ts.n_pairs, ts.ts_slope_mc,
       |  CAST(floor(100000.0 * (m.n_weeks * m.sxy - m.sx * m.sy) /
       |    (m.n_weeks * m.sxx - m.sx * m.sx)) AS BIGINT) ols_slope_mc
       |FROM ts, m""".stripMargin

  /** `bootstrap_ci`: a percentile-bootstrap confidence interval for
    * the mean order value — the resampling machinery every
    * experimentation platform runs, made DETERMINISTIC and
    * engine-portable: instead of sampling rows (irreproducible and
    * not distributable without coordination), each of B=32 replicates
    * weights every row by an integer w ∈ {0,1,2} with P(0)=¼, P(1)=½,
    * P(2)=¼ (mean 1 — the two-bit multiplier bootstrap, a bounded
    * stand-in for Poisson(1) weights) derived from
    * md5(orderkey:replica) — the suite's ContentHash discipline, so
    * any engine, run, partitioning and cluster size draws the same
    * resamples. Plan shape: ONE scan exploded ×32 with map-side
    * combine into 32 (Σw, Σw·y) integer pairs — the shuffle carries
    * 32 rows per partition regardless of corpus size; replicate
    * means divide identical integers (identical IEEE result), and
    * the 2nd/31st order statistics (the ~94% percentile interval)
    * come from a 32×32 broadcast rank join, never a global window.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.read(spark, dir, "orders")
      .select(
        col("o_orderkey").as("k"),
        Quantize.cents(col("o_totalprice")).as("yc"))
    val w = o
      .select(col("k"), col("yc"), explode(sequence(lit(0), lit(31))).as("r"))
      .withColumn(
        "v",
        conv(
          substring(
            md5(concat(col("k").cast("string"), lit(":"),
              col("r").cast("string"))), 1, 1),
          16, 10).cast("long") % 4)
      .withColumn("wt", expr("v div 2 + v % 2"))
    // persist: 32 rows, but derived from the ×32-exploded md5 scan —
    // the rank self-join and the lo/hi probes would otherwise re-run
    // that scan per consumer
    val rep = w.groupBy(col("r"))
      .agg(sum(col("wt")).as("n_r"), sum(expr("wt * yc")).as("s_r"))
      .persist()
    val m = rep.select(
      col("r"),
      expr("CASE WHEN n_r = 0 THEN NULL ELSE CAST(s_r AS DOUBLE) / n_r END")
        .as("mean_r"))
    val rk = m.toDF("r1", "m1")
      .join(
        broadcast(m.toDF("r2", "m2")),
        expr("m2 < m1 OR (m2 = m1 AND r2 <= r1)"))
      .groupBy(col("r1"), col("m1"))
      .agg(count(lit(1)).as("rnk"))
    val lo = rk.where(col("rnk") === 2).select(col("m1").as("boot_lo"))
    val hi = rk.where(col("rnk") === 31).select(col("m1").as("boot_hi"))
    val full = o.agg(
      count(lit(1)).as("n_orders"),
      expr("CAST(SUM(yc) AS DOUBLE) / COUNT(*)").as("mean_c"))
    full.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .select(
        col("n_orders"), col("mean_c"), col("boot_lo"), col("boot_hi"))
  }

  def bootstrapCiOracle: String =
    s"""WITH o AS (
       |  SELECT o_orderkey k, ${Quantize.centsSql("o_totalprice")} yc
       |  FROM orders),
       |w AS (
       |  SELECT k, yc, r,
       |    ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
       |      CAST(r AS VARCHAR)), 1, 1))::BIGINT % 4 AS v
       |  FROM o, unnest(range(0, 32)) t(r)),
       |rep AS (
       |  SELECT r, CAST(SUM(v // 2 + v % 2) AS BIGINT) n_r,
       |    CAST(SUM((v // 2 + v % 2) * yc) AS BIGINT) s_r
       |  FROM w GROUP BY r),
       |m AS (
       |  SELECT r, CASE WHEN n_r = 0 THEN NULL
       |    ELSE CAST(s_r AS DOUBLE) / n_r END AS mean_r
       |  FROM rep),
       |rk AS (
       |  SELECT a.r, a.mean_r, CAST(COUNT(*) AS BIGINT) rnk
       |  FROM m a JOIN m b
       |    ON (b.mean_r < a.mean_r OR (b.mean_r = a.mean_r AND b.r <= a.r))
       |  GROUP BY a.r, a.mean_r),
       |f AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n_orders,
       |    CAST(SUM(yc) AS DOUBLE) / COUNT(*) AS mean_c
       |  FROM o)
       |SELECT f.n_orders, f.mean_c,
       |  (SELECT mean_r FROM rk WHERE rnk = 2) AS boot_lo,
       |  (SELECT mean_r FROM rk WHERE rnk = 31) AS boot_hi
       |FROM f""".stripMargin

  /** `cuped_adjust`: CUPED variance reduction (Deng et al.'s
    * controlled-experiment estimator, the industry-standard A/B
    * power-up): each user's experiment-period metric y is adjusted by
    * their PRE-period covariate x — y′ = y − θ(x − x̄), θ =
    * cov(x,y)/var(x) pooled — which cancels the between-user variance
    * that x already explains without biasing the arm difference
    * (E[x] is treatment-independent by randomization). Everything
    * reduces to per-arm and pooled INTEGER moment sums (n, Σx, Σy,
    * Σxy, Σx², Σy²) — the adjusted arm mean needs no second per-row
    * pass: ȳ′_arm = ȳ_arm − θ(x̄_arm − x̄). One user-grain aggregate
    * (map-side combinable), a 2-row arm rollup, a 1-row broadcast of
    * pooled moments; θ and the realized variance-reduction ratio
    * (= corr²·10⁶ ppm) evaluate the textually-identical IEEE
    * expression over identical int64 operands on both engines.
    */
  def cupedAdjust(spark: SparkSession, dir: String): DataFrame = {
    val boundary = lit("2024-01-16").cast("timestamp")
    val pu = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < boundary, Quantize.cents(col("value")))
          .otherwise(lit(0L))).as("x"),
        sum(when(col("ts") >= boundary, Quantize.cents(col("value")))
          .otherwise(lit(0L))).as("y"))
      .withColumn("variant", ContentHash.bucket(col("user_id"), 2))
    val pooled = pu.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val arms = pu.groupBy(col("variant")).agg(
      count(lit(1)).as("n_a"),
      sum(col("x")).as("sx_a"),
      sum(col("y")).as("sy_a"))
    val nD = "CAST(n AS DOUBLE)"
    val cov = s"($nD * sxy - CAST(sx AS DOUBLE) * sy)"
    val varx = s"($nD * sxx - CAST(sx AS DOUBLE) * sx)"
    val vary = s"($nD * syy - CAST(sy AS DOUBLE) * sy)"
    arms.crossJoin(broadcast(pooled))
      .select(
        col("variant"),
        col("n_a").as("n_users"),
        expr("CAST(sy_a AS DOUBLE) / n_a").as("mean_y_c"),
        expr(
          s"""CASE WHEN $varx = 0 THEN NULL
             |ELSE CAST(sy_a AS DOUBLE) / n_a - ($cov / $varx) *
             |  (CAST(sx_a AS DOUBLE) / n_a - CAST(sx AS DOUBLE) / n)
             |END""".stripMargin.replaceAll("\n", " ")).as("mean_y_adj_c"),
        expr(
          s"""CASE WHEN $varx = 0 THEN NULL
             |ELSE CAST(floor(1000000.0 * $cov / $varx) AS BIGINT)
             |END""".stripMargin.replaceAll("\n", " ")).as("theta_ppm"),
        expr(
          s"""CASE WHEN $varx = 0 OR $vary = 0 THEN NULL
             |ELSE CAST(floor(1000000.0 * $cov * $cov / ($varx * $vary))
             |  AS BIGINT) END""".stripMargin.replaceAll("\n", " "))
          .as("var_reduction_ppm"))
      .orderBy("variant")
  }

  def cupedAdjustOracle: String = {
    val c = Quantize.centsSql("value")
    val cov = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    val varx = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    val vary = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(COALESCE(SUM($c) FILTER (CAST(ts AS TIMESTAMP) <
       |      TIMESTAMP '2024-01-16'), 0) AS BIGINT) x,
       |    CAST(COALESCE(SUM($c) FILTER (CAST(ts AS TIMESTAMP) >=
       |      TIMESTAMP '2024-01-16'), 0) AS BIGINT) y,
       |    ${ContentHash.bucketSql("user_id", 2)} variant
       |  FROM events GROUP BY user_id),
       |p AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(x) AS BIGINT) sx,
       |    CAST(SUM(y) AS BIGINT) sy, CAST(SUM(x * y) AS BIGINT) sxy,
       |    CAST(SUM(x * x) AS BIGINT) sxx, CAST(SUM(y * y) AS BIGINT) syy
       |  FROM pu),
       |a AS (
       |  SELECT variant, CAST(COUNT(*) AS BIGINT) n_users,
       |    CAST(SUM(x) AS BIGINT) sx_a, CAST(SUM(y) AS BIGINT) sy_a
       |  FROM pu GROUP BY variant)
       |SELECT a.variant, a.n_users,
       |  CAST(sy_a AS DOUBLE) / n_users AS mean_y_c,
       |  CASE WHEN $varx = 0 THEN NULL
       |    ELSE CAST(sy_a AS DOUBLE) / n_users - ($cov / $varx) *
       |      (CAST(sx_a AS DOUBLE) / n_users - CAST(sx AS DOUBLE) / n)
       |  END AS mean_y_adj_c,
       |  CASE WHEN $varx = 0 THEN NULL
       |    ELSE CAST(floor(1000000.0 * $cov / $varx) AS BIGINT)
       |  END AS theta_ppm,
       |  CASE WHEN $varx = 0 OR $vary = 0 THEN NULL
       |    ELSE CAST(floor(1000000.0 * $cov * $cov / ($varx * $vary))
       |      AS BIGINT) END AS var_reduction_ppm
       |FROM a, p ORDER BY variant""".stripMargin
  }

  /** `tv_drift`: total-variation distance between the order-value
    * distributions of the window's two calendar halves — the
    * distribution-shift monitor beside the suite's mean-shift
    * (`cusum_shift`) and vocabulary (`vocab_drift`) detectors: TVD
    * sees a variance blowup or a reshaped mix that leaves the mean
    * untouched. For $5000-band histograms TVD = ½ Σ|p_b − q_b|,
    * cross-multiplied into exact integers (units of cntA·nB −
    * cntB·nA) so tvd_ppm = Σ|…| · 10⁶ div (2·nA·nB); alongside it
    * the worst band (max |diff|, low-band tie-break) and its own
    * contribution — the "where did it move" readout. The halves
    * derive from the data's own date bounds (day offset below
    * ⌈span/2⌉), no configuration.
    *
    * Plan: one orders scan → (half × band) grid; everything after is
    * grid arithmetic with 1-row broadcasts. int64: cnt·n caps at
    * ~3·10⁹ orders per half — loud under ANSI past it.
    */
  def tvDrift(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        expr(s"${Quantize.centsSql("o_totalprice")} div 500000").as("band"))
      .localCheckpoint(eager = false) // bounds + the grid share it
    val bounds = ord.agg(
      min(col("d")).as("d0"),
      ((datediff(max(col("d")), min(col("d"))) + 1) + 1).as("sp2")) // 2*half
    val grid = ord
      .crossJoin(broadcast(bounds)) // 1-row bounds: documented exception
      .select(
        (datediff(col("d"), col("d0")) * 2 < col("sp2")).cast("long")
          .as("ha"), // 1 = first half
        col("band"))
      .groupBy(col("band"))
      .agg(
        sum(col("ha")).as("ca"),
        (count(lit(1)) - sum(col("ha"))).as("cb"))
      .localCheckpoint(eager = false) // totals + diffs + argmax
    val tot = grid.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val diffs = grid
      .crossJoin(broadcast(tot)) // 1-row totals: documented exception
      .select(
        col("band"), col("na"), col("nb"),
        abs(col("ca") * col("nb") - col("cb") * col("na")).as("ad"))
      .localCheckpoint(eager = false) // sum fold + argmax fold
    val s = diffs.agg(
      max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      count(lit(1)).as("n_bands"), sum(col("ad")).as("sad"),
      max(col("ad")).as("mad"))
    val top = diffs
      .crossJoin(broadcast(diffs.agg(max(col("ad")).as("mx"))))
      .where(col("ad") === col("mx"))
      .agg(min(col("band")).as("top_band"))
    s.crossJoin(broadcast(top)) // 1-row folds: documented exception
      .select(
        col("n_a"), col("n_b"), col("n_bands"),
        expr("sad * 1000000 div (2 * n_a * n_b)").as("tvd_ppm"),
        col("top_band"),
        expr("mad * 1000000 div (2 * n_a * n_b)").as("top_band_ppm"))
  }

  def tvDriftOracle: String =
    s"""WITH o AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    ${Quantize.centsSql("o_totalprice")} // 500000 band
       |  FROM orders),
       |b AS (
       |  SELECT MIN(d) d0,
       |    (date_diff('day', MIN(d), MAX(d)) + 1) + 1 sp2
       |  FROM o),
       |g AS (
       |  SELECT band,
       |    CAST(SUM(CASE WHEN date_diff('day', d0, d) * 2 < sp2
       |      THEN 1 ELSE 0 END) AS BIGINT) ca,
       |    CAST(SUM(CASE WHEN date_diff('day', d0, d) * 2 < sp2
       |      THEN 0 ELSE 1 END) AS BIGINT) cb
       |  FROM o CROSS JOIN b GROUP BY 1),
       |tt AS (SELECT CAST(SUM(ca) AS BIGINT) na,
       |  CAST(SUM(cb) AS BIGINT) nb FROM g),
       |df AS (
       |  SELECT band, na, nb, abs(ca * nb - cb * na) ad
       |  FROM g CROSS JOIN tt),
       |s AS (
       |  SELECT MAX(na) n_a, MAX(nb) n_b, CAST(COUNT(*) AS BIGINT) n_bands,
       |    CAST(SUM(ad) AS BIGINT) sad, CAST(MAX(ad) AS BIGINT) mad
       |  FROM df),
       |tp AS (
       |  SELECT CAST(MIN(band) AS BIGINT) top_band FROM df
       |  WHERE ad = (SELECT MAX(ad) FROM df))
       |SELECT n_a, n_b, n_bands,
       |  sad * 1000000 // (2 * n_a * n_b) tvd_ppm,
       |  top_band,
       |  mad * 1000000 // (2 * n_a * n_b) top_band_ppm
       |FROM s CROSS JOIN tp""".stripMargin

  /** `gini_split_gain`: decision-stump feature ranking — for each
    * candidate customer feature (market segment, nation, $2000
    * balance band), the weighted Gini impurity of splitting on it
    * and the gain over the root, predicting the big-spender label
    * (any order over $400k — joinSemi's notion). "Which feature
    * would a tree split on first" is the first readout of every
    * feature-selection pass, and it is exact integer arithmetic
    * here: group impurity 1 − (pos/n)² − (neg/n)² cross-multiplies
    * to (n_g² − pos² − neg²), and the n-weighted sum floors per
    * group to ppm — term_ppm = (n_g² − pos² − neg²)·10⁶ div (n·n_g)
    * (the per-term floor is pinned semantics, as in log_rank_test).
    * A `zz_root` row carries the unsplit impurity inside the hash.
    *
    * Plan: the label is one orders semi-join onto customers
    * (broadcast key set), then each feature is a grid aggregate OF
    * THE SAME labeled relation (localCheckpointed, scanned once per
    * feature over cached rows); grids are ≤25 rows. int64:
    * n_g²·10⁶ caps a group at ~3M rows — the eval-slice bound.
    */
  def giniSplitGain(spark: SparkSession, dir: String): DataFrame = {
    val spenders = Tables.read(spark, dir, "orders")
      .where(col("o_totalprice") > 400000.0)
      .select(col("o_custkey")).distinct()
    val labeled = Tables.read(spark, dir, "customer")
      .join(
        spenders.withColumn("big", lit(1L)),
        col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_mktsegment").as("segment"),
        col("c_nationkey").cast("string").as("nation"),
        (expr(s"(${Quantize.centsSql("c_acctbal")} + 100000) div 200000"))
          .cast("string").as("bal_band"),
        coalesce(col("big"), lit(0L)).as("y"))
      .localCheckpoint(eager = false) // one cached scan per feature
    val tot = labeled.agg(
      count(lit(1)).as("n"), sum(col("y")).as("p"))
    def split(name: String, feat: String): DataFrame =
      labeled.groupBy(col(feat).as("g"))
        .agg(count(lit(1)).as("ng"), sum(col("y")).as("pg"))
        .crossJoin(broadcast(tot)) // 1-row totals: documented exception
        .select(expr(
          "(ng * ng - pg * pg - (ng - pg) * (ng - pg)) * 1000000" +
            " div (n * ng)").as("term"))
        .agg(count(lit(1)).as("n_groups"), sum(col("term")).as("gini_ppm"))
        .select(lit(name).as("feature"), col("n_groups"), col("gini_ppm"))
    val root = tot
      .select(
        lit("zz_root").as("feature"), lit(1L).as("n_groups"),
        expr("(n * n - p * p - (n - p) * (n - p)) * 1000000 div (n * n)")
          .as("gini_ppm"))
    split("segment", "segment")
      .unionByName(split("nation", "nation"))
      .unionByName(split("bal_band", "bal_band"))
      .unionByName(root)
      .crossJoin(broadcast(root.select(col("gini_ppm").as("rg"))))
      .select(
        col("feature"), col("n_groups"), col("gini_ppm"),
        (col("rg") - col("gini_ppm")).as("gain_ppm"))
      .orderBy("feature")
  }

  def giniSplitGainOracle: String = {
    def s(name: String, feat: String): String =
      s"""SELECT '$name' feature, CAST(COUNT(*) AS BIGINT) n_groups,
         |  CAST(SUM((ng * ng - pg * pg - (ng - pg) * (ng - pg)) * 1000000
         |    // (n * ng)) AS BIGINT) gini_ppm
         |FROM (
         |  SELECT $feat g, CAST(COUNT(*) AS BIGINT) ng,
         |    CAST(SUM(y) AS BIGINT) pg
         |  FROM lab GROUP BY 1) q CROSS JOIN tt""".stripMargin
    s"""WITH sp AS (
       |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0),
       |lab AS (
       |  SELECT c_mktsegment segment,
       |    CAST(c_nationkey AS VARCHAR) nation,
       |    CAST((${Quantize.centsSql("c_acctbal")} + 100000) // 200000
       |      AS VARCHAR) bal_band,
       |    CASE WHEN sp.o_custkey IS NOT NULL THEN 1 ELSE 0 END y
       |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey),
       |tt AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(y) AS BIGINT) p
       |  FROM lab),
       |rt AS (
       |  SELECT 'zz_root' feature, CAST(1 AS BIGINT) n_groups,
       |    (n * n - p * p - (n - p) * (n - p)) * 1000000 // (n * n) gini_ppm
       |  FROM tt),
       |u AS (
       |${s("segment", "segment")}
       |UNION ALL
       |${s("nation", "nation")}
       |UNION ALL
       |${s("bal_band", "bal_band")}
       |UNION ALL
       |SELECT feature, n_groups, gini_ppm FROM rt)
       |SELECT u.feature, u.n_groups, u.gini_ppm,
       |  rt.gini_ppm - u.gini_ppm AS gain_ppm
       |FROM u CROSS JOIN rt
       |ORDER BY u.feature""".stripMargin
  }

  /** `kendall_tau`: rank-stability of the nation revenue league table
    * across two consecutive years — Kendall's τ_a by concordant/
    * discordant PAIR COUNTING, the rank test that (unlike a
    * correlation of the revenue values) only moves when positions
    * actually swap. Pure integers end to end: exact-cent revenues,
    * a broadcast triangular self-join over the ≤25-nation relation
    * (i < j pairs once), C/D/T counted by sign agreement, and
    * τ_a_ppm = (C − D)·10⁶ div (n(n−1)/2) with the suite's
    * sign-split floor (τ < 0 = the table inverted). Ties count
    * neither way and are reported — τ_b's tie correction needs a
    * sqrt, and publishing T beside τ_a is the integer-honest form.
    *
    * Plan: one orders scan → (nation, year) grid → 25-row wide
    * relation → triangular broadcast join (≤300 pairs) → 1-row fold.
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.read(spark, dir, "orders")
      .join(
        broadcast(Tables.read(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").as("nation"))),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("nation"), year(col("o_orderdate")).as("yr"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .groupBy(col("nation"))
      .agg(
        sum(when(col("yr") === 1996, col("c")).otherwise(lit(0L))).as("r1"),
        sum(when(col("yr") === 1997, col("c")).otherwise(lit(0L))).as("r2"))
      .localCheckpoint(eager = false) // both sides of the pair join
    val pairs = wide.as("a")
      .join(
        broadcast(wide.select(
          col("nation").as("n2"), col("r1").as("s1"), col("r2").as("s2"))),
        col("n2") > col("a.nation"))
      .select(
        (((col("r1") < col("s1")) && (col("r2") < col("s2"))) ||
          ((col("r1") > col("s1")) && (col("r2") > col("s2"))))
          .cast("long").as("conc"),
        (((col("r1") < col("s1")) && (col("r2") > col("s2"))) ||
          ((col("r1") > col("s1")) && (col("r2") < col("s2"))))
          .cast("long").as("disc"))
    pairs.agg(
      count(lit(1)).as("n_pairs"),
      sum(col("conc")).as("concordant"),
      sum(col("disc")).as("discordant"))
      .select(
        col("n_pairs"), col("concordant"), col("discordant"),
        (col("n_pairs") - col("concordant") - col("discordant")).as("tied"),
        expr("""CASE WHEN concordant - discordant < 0
          THEN -((discordant - concordant) * 1000000 div n_pairs)
          ELSE (concordant - discordant) * 1000000 div n_pairs
          END""").as("tau_a_ppm"))
  }

  def kendallTauOracle: String =
    s"""WITH w AS (
       |  SELECT c_nationkey nation,
       |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS TIMESTAMP)) = 1996
       |      THEN ${Quantize.centsSql("o_totalprice")} ELSE 0 END)
       |      AS BIGINT) r1,
       |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS TIMESTAMP)) = 1997
       |      THEN ${Quantize.centsSql("o_totalprice")} ELSE 0 END)
       |      AS BIGINT) r2
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1),
       |p AS (
       |  SELECT
       |    CAST(CASE WHEN (a.r1 < b.r1 AND a.r2 < b.r2)
       |      OR (a.r1 > b.r1 AND a.r2 > b.r2) THEN 1 ELSE 0 END
       |      AS BIGINT) conc,
       |    CAST(CASE WHEN (a.r1 < b.r1 AND a.r2 > b.r2)
       |      OR (a.r1 > b.r1 AND a.r2 < b.r2) THEN 1 ELSE 0 END
       |      AS BIGINT) disc
       |  FROM w a JOIN w b ON b.nation > a.nation)
       |SELECT CAST(COUNT(*) AS BIGINT) n_pairs,
       |  CAST(SUM(conc) AS BIGINT) concordant,
       |  CAST(SUM(disc) AS BIGINT) discordant,
       |  CAST(COUNT(*) - SUM(conc) - SUM(disc) AS BIGINT) tied,
       |  CASE WHEN SUM(conc) - SUM(disc) < 0
       |    THEN -((CAST(SUM(disc) - SUM(conc) AS BIGINT)) * 1000000
       |      // COUNT(*))
       |    ELSE (CAST(SUM(conc) - SUM(disc) AS BIGINT)) * 1000000
       |      // COUNT(*)
       |  END tau_a_ppm
       |FROM p""".stripMargin

  /** `srm_check`: the sample-ratio-mismatch gate — the FIRST validity
    * check any experiment readout must pass (a biased assignment
    * invalidates ab_test/cuped_adjust/log_rank_test before their
    * statistics mean anything): arm sizes from the canonical
    * content-hash split vs the designed 50/50, χ²₁ collapsing
    * algebraically to (n_a−n_b)²/(n_a+n_b) exactly — pure integer,
    * no expected-count fraction ever materializes. Emits the arms,
    * the gap in ppm of total, χ² in milli, and the pinned 3.841
    * (5%) verdict. The md5 split is deterministic, so this gate's
    * value is itself reproducible — what it audits at 100 TB is the
    * UPSTREAM pipeline (dropped logs, bot filters) distorting arms.
    *
    * Plan: one user-grain aggregate → one 1-row fold. (On the sf0.01
    * set the gate genuinely fires — md5 buckets of its 150 regularly
    * spaced user ids land 60/90, χ²=6.0 — a correct readout of a
    * small, structured population, and exactly the kind of surprise
    * the gate exists to surface before anyone trusts a lift number.)
    */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .select(ContentHash.bucket(col("user_id"), 2).as("arm"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .select(
        col("n_a"), col("n_b"),
        expr("""CASE WHEN n_a - n_b < 0
          THEN -((n_b - n_a) * 1000000 div (n_a + n_b))
          ELSE (n_a - n_b) * 1000000 div (n_a + n_b)
          END""").as("gap_ppm"),
        expr("(n_a - n_b) * (n_a - n_b) * 1000 div (n_a + n_b)")
          .as("chi2_milli"))
      .withColumn("srm_detected", col("chi2_milli") > 3841L)

  def srmCheckOracle: String =
    s"""WITH u AS (
       |  SELECT ${ContentHash.bucketSql("user_id", 2)} arm
       |  FROM (SELECT DISTINCT user_id FROM events)),
       |a AS (
       |  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) n_a,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) n_b
       |  FROM u)
       |SELECT n_a, n_b,
       |  CASE WHEN n_a - n_b < 0
       |    THEN -((n_b - n_a) * 1000000 // (n_a + n_b))
       |    ELSE (n_a - n_b) * 1000000 // (n_a + n_b)
       |  END gap_ppm,
       |  (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) chi2_milli,
       |  (n_a - n_b) * (n_a - n_b) * 1000 // (n_a + n_b) > 3841
       |    srm_detected
       |FROM a""".stripMargin

  /** `ab_power`: the sample-size side of the experimentation battery
    * — given the observed conversion base rate (ab_test's heavy-buyer
    * cut), the per-arm n required to detect a 2-point absolute lift
    * at α=5% two-sided, power 80%:
    * n = (z_{α/2}+z_β)²·2·p̄(1−p̄)/δ², the formula every experiment
    * sizing sheet runs. Integer moments end to end (p̄ in ppm, δ
    * pinned at 20000 ppm, z constants pinned as micro literals
    * 1959964 and 841621 — the ndcg discount-table discipline), and
    * the one final division evaluates the textually-identical IEEE
    * expression over identical int64 operands, then floors to a
    * whole n (the suite's final-float convention). Also emits the
    * achieved-n verdict: whether the current arms already clear it.
    *
    * Plan: one user-grain aggregate → 1-row fold. The readout a
    * 100 TB pipeline computes BEFORE burning a quarter's traffic.
    */
  def abPower(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg((count(when(col("event_type") === "purchase", 1)) >= 14)
        .cast("long").as("conv"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
      .select(
        col("n_users"), col("n_conv"),
        expr("n_conv * 1000000 div n_users").as("p_ppm"))
      .select(
        col("n_users"), col("n_conv"), col("p_ppm"),
        // (z_a + z_b)² · 2·p(1−p) / δ²; all operands exact ints, the
        // division is one identical-IEEE double, floored to whole n.
        expr("""CAST(floor(
          (CAST(1959964 + 841621 AS DOUBLE) / 1000000) *
          (CAST(1959964 + 841621 AS DOUBLE) / 1000000) *
          (2.0 * p_ppm * (1000000 - p_ppm)) /
          (CAST(20000 AS DOUBLE) * 20000)) AS BIGINT)""")
          .as("n_required"),
        lit(20000L).as("mde_ppm"))
      .withColumn("powered", expr("n_users div 2 >= n_required"))

  def abPowerOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      >= 14 THEN 1 ELSE 0 END conv
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) n_users,
      |    CAST(SUM(conv) AS BIGINT) n_conv
      |  FROM u),
      |p AS (SELECT n_users, n_conv, n_conv * 1000000 // n_users p_ppm FROM a)
      |SELECT n_users, n_conv, p_ppm,
      |  CAST(floor(
      |    (CAST(1959964 + 841621 AS DOUBLE) / 1000000) *
      |    (CAST(1959964 + 841621 AS DOUBLE) / 1000000) *
      |    (2.0 * p_ppm * (1000000 - p_ppm)) /
      |    (CAST(20000 AS DOUBLE) * 20000)) AS BIGINT) n_required,
      |  CAST(20000 AS BIGINT) mde_ppm,
      |  n_users // 2 >= CAST(floor(
      |    (CAST(1959964 + 841621 AS DOUBLE) / 1000000) *
      |    (CAST(1959964 + 841621 AS DOUBLE) / 1000000) *
      |    (2.0 * p_ppm * (1000000 - p_ppm)) /
      |    (CAST(20000 AS DOUBLE) * 20000)) AS BIGINT) powered
      |FROM p""".stripMargin

  /** `median_merge`: the two-level mergeable median — each of 16
    * content-hash shards reports its exact lower median (the k-th
    * smallest value at k = (n_s+1) div 2, a VALUE-deterministic
    * statistic under ties) with its row weight, and the merged
    * estimate is the weighted lower median of the shard medians. This
    * is the aggregation topology every distributed percentile runs
    * (per-partition summary → small merge) with the approximation
    * error MEASURED instead of assumed: the estimate's true rank
    * position in the full multiset is computed in one conditional sum
    * (rank_ppm, ideally 500000) and its displacement pinned in the
    * hash beside the shard count. Exact medians stay shard-local; the
    * merge sees 16 rows.
    *
    * Plan shape: one (shard, value) histogram aggregate feeding the
    * shared [[lowerMedianBy]] kernel (never an unpartitioned or
    * 16-partition rank window over the fact), a 16-row broadcast
    * self-join for the weighted-median prefix (the lorenz offsets
    * pattern), and one conditional-sum audit scan. At 100 TB the
    * shard medians are partition summaries and the merge is
    * driver-sized.
    */
  def medianMerge(spark: SparkSession, dir: String): DataFrame = {
    // NOT checkpointed: a fact-grain cache is the same 100 TB smell
    // as a fact-grain shuffle — at the 100× replica the deserialized
    // 60M-row pin starved the unified pool into
    // UNABLE_TO_ACQUIRE_MEMORY. The md5 bucket re-evaluates per
    // consumer scan (bounds/grid/slice/total/audit), each a narrow
    // map-side pass — linear, spill-free, and the shape that holds at
    // any scale
    val xs = Tables.read(spark, dir, "lineitem")
      .select(
        Quantize.cents(col("l_extendedprice")).as("x"),
        ContentHash.bucket(
          concat(col("l_orderkey"), lit(":"), col("l_linenumber")), 16)
          .as("shard"))
    // per-shard exact lower median from the shared probe kernel: the
    // k-th smallest at k = (ns+1) div 2 is the smallest value whose
    // cumulative count reaches k — value-identical to the old
    // per-shard row_number pick under ties, without the 16-partition
    // full sort of the fact table
    val med = lowerMedianBy(xs, Seq("shard"), "x", None)
      .select(col("shard"), col("med").as("m"), col("wtot").as("ns"))
    // 16-ROW DRIVER MERGE (bounded driver-arithmetic exception, like
    // the kernel's own bounds collect): the merge step of a two-level
    // distributed median is by construction summary-sized — 16
    // (shard, median, count) rows — so the weighted lower median of
    // the shard medians is plain Long arithmetic here, replacing the
    // former triangular self-join + crossJoin probe (three extra
    // stages per run on a 16-row relation). Identical semantics: sort
    // by (m, shard), first cumulative weight reaching (n+1) div 2.
    val shardMeds = med.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (shard, m, _) => (m, shard) }
    val n = shardMeds.map(_._3).sum
    var cw = 0L
    val est = shardMeds
      .find { case (_, _, ns) => { cw += ns; cw * 2 >= n + (n & 1L) } }
      // cw >= (n+1) div 2  <=>  2*cw >= n + (n odd ? 1 : 0)
      .map(_._2).getOrElse(0L)
    // one audit scan against the literal estimate (column-pruned to x
    // — the md5 bucket is not evaluated here)
    xs.agg(
        count(lit(1)).as("n"),
        sum(when(col("x") <= lit(est), 1L).otherwise(0L)).as("le"))
      .select(
        col("n"), lit(16L).as("n_shards"), lit(est).as("est_median"),
        expr("le * 1000000 div n").as("rank_ppm"),
        expr("abs(le * 1000000 div n - 500000)").as("err_ppm"))
  }

  def medianMergeOracle: String = {
    val bucket = ContentHash.bucketSql(
      "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)",
      16)
    s"""WITH xs AS (
       |  SELECT ${Quantize.centsSql("l_extendedprice")} x, $bucket shard
       |  FROM lineitem),
       |st AS (SELECT shard, CAST(count(*) AS BIGINT) ns FROM xs GROUP BY 1),
       |rk AS (
       |  SELECT shard, x,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY x) rk FROM xs),
       |med AS (
       |  SELECT r.shard, r.x m, s.ns
       |  FROM rk r JOIN st s ON r.shard = s.shard AND r.rk = (s.ns + 1) // 2),
       |tot AS (SELECT CAST(count(*) AS BIGINT) n FROM xs),
       |cum AS (
       |  SELECT a.shard, a.m, CAST(SUM(b.ns) AS BIGINT) cw
       |  FROM med a JOIN med b
       |    ON b.m < a.m OR (b.m = a.m AND b.shard <= a.shard)
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT CAST(MIN(m) AS BIGINT) est_median
       |  FROM cum CROSS JOIN tot WHERE cw >= (n + 1) // 2),
       |fin AS (
       |  SELECT CAST(count(*) AS BIGINT) n,
       |    CAST(SUM(CASE WHEN x <= est_median THEN 1 ELSE 0 END) AS BIGINT) le,
       |    CAST(MAX(est_median) AS BIGINT) est_median
       |  FROM xs CROSS JOIN est)
       |SELECT n, CAST(16 AS BIGINT) n_shards, est_median,
       |  le * 1000000 // n rank_ppm,
       |  abs(le * 1000000 // n - 500000) err_ppm
       |FROM fin""".stripMargin
  }

  /** `did_estimate`: difference-in-differences — the experiment
    * family's observational cousin (ab_test randomizes, srm_check
    * validates the split, cuped_adjust shrinks variance; DiD is what
    * you run when assignment came from the WORLD, netting out both
    * the group baseline and the common time shock). Groups: treated =
    * nation key < 12 (a fixed, reproducible cohort, not data-peeked);
    * periods split at 1996-01-01; outcome = mean order value in
    * floor-division cents (mean_c = sum div n — the suite's exact-
    * until-the-last-div convention, and the DiD combines the four
    * FLOORED means so both engines state the identical estimate).
    * Emits the four cells (n, sum, mean) and the `zz_did` summary row
    * inside the hash.
    *
    * Plan shape: one orders ⋈ broadcast customer-cohort join → 4-cell
    * aggregate; scalar algebra after. Scan-bound at any scale.
    */
  def didEstimate(spark: SparkSession, dir: String): DataFrame = {
    val cohort = Tables.read(spark, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_nationkey") < 12, "treat").otherwise("control")
          .as("grp"))
    val cells = Tables.read(spark, dir, "orders")
      .select(
        col("o_custkey"),
        expr("CASE WHEN CAST(o_orderdate AS DATE) >= DATE'1996-01-01'" +
          " THEN 'post' ELSE 'pre' END").as("period"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .join(broadcast(cohort), col("o_custkey") === col("c_custkey"))
      .groupBy(col("grp"), col("period"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_c"))
      .withColumn("mean_c", expr("sum_c div n"))
      .localCheckpoint(eager = false) // cells + the zz fold
    val did = cells
      .groupBy()
      .agg(
        (sum(when(col("grp") === "treat" && col("period") === "post",
          col("mean_c")).otherwise(lit(0L))) -
          sum(when(col("grp") === "treat" && col("period") === "pre",
            col("mean_c")).otherwise(lit(0L))) -
          sum(when(col("grp") === "control" && col("period") === "post",
            col("mean_c")).otherwise(lit(0L))) +
          sum(when(col("grp") === "control" && col("period") === "pre",
            col("mean_c")).otherwise(lit(0L)))).as("mean_c"))
      .select(
        lit("zz_did").as("grp"), lit("diff").as("period"),
        lit(0L).as("n"), lit(0L).as("sum_c"), col("mean_c"))
    cells
      .select(col("grp"), col("period"), col("n"), col("sum_c"),
        col("mean_c"))
      .unionByName(did)
      .orderBy("grp", "period")
  }

  def didEstimateOracle: String =
    s"""WITH cells AS (
       |  SELECT CASE WHEN c_nationkey < 12 THEN 'treat'
       |      ELSE 'control' END grp,
       |    CASE WHEN o_orderdate >= DATE '1996-01-01' THEN 'post'
       |      ELSE 'pre' END period,
       |    CAST(COUNT(*) AS BIGINT) n,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) sum_c
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |m AS (SELECT grp, period, n, sum_c, sum_c // n mean_c FROM cells),
       |did AS (
       |  SELECT 'zz_did' grp, 'diff' period, CAST(0 AS BIGINT) n,
       |    CAST(0 AS BIGINT) sum_c,
       |    CAST(SUM(CASE WHEN grp = 'treat' AND period = 'post'
       |        THEN mean_c ELSE 0 END)
       |      - SUM(CASE WHEN grp = 'treat' AND period = 'pre'
       |        THEN mean_c ELSE 0 END)
       |      - SUM(CASE WHEN grp = 'control' AND period = 'post'
       |        THEN mean_c ELSE 0 END)
       |      + SUM(CASE WHEN grp = 'control' AND period = 'pre'
       |        THEN mean_c ELSE 0 END) AS BIGINT) mean_c
       |  FROM m)
       |SELECT * FROM m UNION ALL SELECT * FROM did
       |ORDER BY grp, period""".stripMargin

  /** `stratified_effect`: the treatment-effect estimate with
    * CONFOUNDER STRATIFICATION — [[didEstimate]] nets out a time
    * shock; this nets out composition (a cohort skewed toward
    * big-spending segments would fake an effect in the raw means):
    * within each market segment, treated-minus-control mean order
    * value; the overall ATT is the treated-weighted average of the
    * per-stratum gaps (the Cochran/MH direct-standardization form).
    * Same fixed nation cohort as DiD; means floor to cents
    * (mean = sum div n) so every gap — and the weighted fold — is
    * exact integer arithmetic. Per-stratum rows + the `zz_att`
    * summary inside the hash.
    *
    * Plan shape: one orders ⋈ broadcast customer (cohort + stratum)
    * join → ≤5×2-cell aggregate; scalar algebra after. Scan-bound.
    */
  def stratifiedEffect(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
      .select(
        col("c_custkey"),
        when(col("c_nationkey") < 12, "treat").otherwise("control")
          .as("grp"),
        col("c_mktsegment").as("stratum"))
    val cells = Tables.read(spark, dir, "orders")
      .select(col("o_custkey"), Quantize.cents(col("o_totalprice")).as("c"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("stratum"), col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      .withColumn("mean_c", expr("s div n"))
    val wide = cells.groupBy(col("stratum"))
      .agg(
        max(when(col("grp") === "treat", col("n"))).as("n_treat"),
        max(when(col("grp") === "treat", col("mean_c"))).as("m_treat_c"),
        max(when(col("grp") === "control", col("n"))).as("n_control"),
        max(when(col("grp") === "control", col("mean_c")))
          .as("m_control_c"))
      .withColumn("diff_c", col("m_treat_c") - col("m_control_c"))
      .localCheckpoint(eager = false) // strata rows + the ATT fold
    val att = wide.agg(
      sum(col("n_treat")).as("n_treat"),
      expr("sum(n_treat * diff_c) div sum(n_treat)").as("diff_c"))
      .select(
        lit("zz_att").as("stratum"), col("n_treat"),
        lit(null).cast("long").as("m_treat_c"),
        lit(null).cast("long").as("n_control"),
        lit(null).cast("long").as("m_control_c"), col("diff_c"))
    wide
      .select(col("stratum"), col("n_treat"), col("m_treat_c"),
        col("n_control"), col("m_control_c"), col("diff_c"))
      .unionByName(att)
      .orderBy("stratum")
  }

  def stratifiedEffectOracle: String =
    s"""WITH cells AS (
       |  SELECT c_mktsegment stratum,
       |    CASE WHEN c_nationkey < 12 THEN 'treat' ELSE 'control' END grp,
       |    CAST(COUNT(*) AS BIGINT) n,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) s
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2),
       |m AS (SELECT stratum, grp, n, s // n mean_c FROM cells),
       |w AS (
       |  SELECT stratum,
       |    MAX(CASE WHEN grp = 'treat' THEN n END) n_treat,
       |    MAX(CASE WHEN grp = 'treat' THEN mean_c END) m_treat_c,
       |    MAX(CASE WHEN grp = 'control' THEN n END) n_control,
       |    MAX(CASE WHEN grp = 'control' THEN mean_c END) m_control_c,
       |    MAX(CASE WHEN grp = 'treat' THEN mean_c END)
       |      - MAX(CASE WHEN grp = 'control' THEN mean_c END) diff_c
       |  FROM m GROUP BY 1),
       |att AS (
       |  SELECT 'zz_att' stratum, CAST(SUM(n_treat) AS BIGINT) n_treat,
       |    CAST(NULL AS BIGINT) m_treat_c, CAST(NULL AS BIGINT) n_control,
       |    CAST(NULL AS BIGINT) m_control_c,
       |    CAST(SUM(n_treat * diff_c) // SUM(n_treat) AS BIGINT) diff_c
       |  FROM w)
       |SELECT stratum, n_treat, m_treat_c, n_control, m_control_c, diff_c
       |FROM w
       |UNION ALL SELECT * FROM att ORDER BY stratum""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("did_estimate", didEstimate, Some(didEstimateOracle)),
    QueryDef(
      "stratified_effect", stratifiedEffect, Some(stratifiedEffectOracle)),
    QueryDef("median_merge", medianMerge, Some(medianMergeOracle)),
    QueryDef("srm_check", srmCheck, Some(srmCheckOracle)),
    QueryDef("ab_power", abPower, Some(abPowerOracle)),
    QueryDef("kendall_tau", kendallTau, Some(kendallTauOracle)),
    QueryDef("tv_drift", tvDrift, Some(tvDriftOracle)),
    QueryDef("gini_split_gain", giniSplitGain, Some(giniSplitGainOracle)),
    QueryDef("cuped_adjust", cupedAdjust, Some(cupedAdjustOracle)),
    QueryDef("bootstrap_ci", bootstrapCi, Some(bootstrapCiOracle)),
    QueryDef("theil_sen", theilSen, Some(theilSenOracle)),
    QueryDef("diff_in_diff", diffInDiff, Some(diffInDiffOracle)),
    QueryDef("equidepth_hist", equidepthHist, Some(equidepthHistOracle)),
    QueryDef(
      "selectivity_estimate", selectivityEstimate,
      Some(selectivityEstimateOracle)),
    QueryDef(
      "join_size_estimate", joinSizeEstimate, Some(joinSizeEstimateOracle)),
    QueryDef("salt_plan", saltPlan, Some(saltPlanOracle)),
    QueryDef("benford_test", benfordTest, Some(benfordTestOracle)),
    QueryDef(
      "hhi_concentration", hhiConcentration, Some(hhiConcentrationOracle)),
    QueryDef("ab_test", abTest, Some(abTestOracle)),
    QueryDef("ks_test", ksTest, Some(ksTestOracle)),
    QueryDef("linreg_trend", linregTrend, Some(linregTrendOracle)),
    QueryDef("skew_report", skewReport, Some(skewReportOracle)),
    QueryDef("stats_outliers", statsOutliers, Some(statsOutliersOracle)),
    QueryDef("corr_stats", corrStats, Some(corrStatsOracle)),
    QueryDef("chi_square", chiSquare, Some(chiSquareOracle)),
    QueryDef("mad_outliers", madOutliers, Some(madOutliersOracle)),
    QueryDef("heavy_hitters", heavyHitters, Some(heavyHittersOracle)),
    QueryDef(
      "heavy_hitters_grouped",
      heavyHittersGrouped,
      Some(heavyHittersGroupedOracle)))
}
