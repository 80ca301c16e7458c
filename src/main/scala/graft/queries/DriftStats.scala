package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-comparison statistics (north-star gap-fill: the drift
  * and dependence panel a training-data pipeline runs between corpus
  * snapshots before trusting a model refresh). Complements the
  * existing family — `ks_test` (max CDF gap), `tv_drift` (categorical
  * L1), `chi_square` (categorical independence), `drift_cusum` /
  * `cusum_shift` (temporal location) — with the integral transport
  * distance (`wasserstein_1d`), the zero-safe f-divergence
  * (`hellinger_drift`), rank dependence (`spearman_rho`), effect-size
  * association (`cramers_v`), and the k-group mean test (`anova_f`).
  *
  * Exactness discipline (the suite's): counts/cents aggregate as
  * integers (DECIMAL(38,0)/HUGEINT where products cross 2^63), and
  * floating point appears only in SCALAR expressions over those exact
  * integers — +, -, *, /, sqrt are IEEE correctly-rounded in both
  * engines, so quantized outputs are bit-identical. No ln/exp/pow
  * anywhere (their rounding is libm-specific — the reason this panel
  * has Hellinger where PSI/KL would sit). Multi-term double sums are
  * either per-row quantized to integers BEFORE the aggregate
  * (cramers_v, hellinger_drift) or written as fixed-order scalar
  * chains on a single wide row (anova_f), never order-dependent
  * distributed double sums.
  */
object DriftStats {

  /** `wasserstein_1d`: 1-D earth-mover distance between the click and
    * purchase value distributions — the INTEGRAL companion of
    * `ks_test`'s max statistic (KS sees the worst point; W1 prices the
    * whole transport, the "how far would mass have to move" number a
    * drift monitor alarms on). Exact integer form:
    * W1·n1·n2 = Σ_v |F1(v)·n2 − F2(v)·n1| · gap(v) over the pooled
    * distinct cent grid (gap = next value − value; the max value's
    * term is 0 since both scaled CDFs saturate at n1·n2). Reported in
    * milli-cents after one integer division; a pinned
    * `dominates_mean_gap` boolean asserts the transport identity
    * W1 ≥ |mean1 − mean2| inside the hash.
    *
    * Scale shape: ONE fact-sized histogram aggregate; cumulatives run
    * as the ks_test sharded prefix sum (value-domain shards, shard-
    * PARTITIONED windows, triangular offsets over the ~64-row shard
    * table — never a global window). The shard-boundary `lead` gap is
    * patched from the same bounded shard-minimum relation. Σ terms
    * cross 2^63 (F·n2 ≈ n1·n2 times cent gaps), so contributions sum
    * in DECIMAL(38,0)/HUGEINT.
    */
  def wasserstein1d(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(
        Quantize.cents(col("value")).as("vc"),
        col("event_type").as("g"))
    val hist = ev.groupBy(col("vc")).agg(
      count(when(col("g") === "click", 1)).as("c1"),
      count(when(col("g") === "purchase", 1)).as("c2"),
      sum(when(col("g") === "click", col("vc")).otherwise(lit(0L))).as("s1p"),
      sum(when(col("g") === "purchase", col("vc")).otherwise(lit(0L))).as("s2p"))
    val width = hist.agg(expr("max(vc) div 64 + 1").as("w"))
    val sharded = hist.crossJoin(broadcast(width))
      .withColumn("shard", expr("vc div w"))
      .localCheckpoint(eager = false) // shared by window/totals/firsts
    val w = Window.partitionBy(col("shard")).orderBy(col("vc"))
    val inShard = sharded
      .withColumn("cum1_in", sum(col("c1")).over(w))
      .withColumn("cum2_in", sum(col("c2")).over(w))
      .withColumn("lead_v", lead(col("vc"), 1).over(w))
    val shardTotals = sharded.groupBy(col("shard")).agg(
      sum(col("c1")).as("t1"), sum(col("c2")).as("t2"),
      min(col("vc")).as("firstv"))
    val offsets = shardTotals.as("a")
      .join(
        broadcast(shardTotals.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(
        coalesce(sum(col("b.t1")), lit(0L)).as("off1"),
        coalesce(sum(col("b.t2")), lit(0L)).as("off2"))
    // next shard's first value patches the shard-boundary lead; the
    // global max row needs no gap (its term is identically 0)
    val nextFirst = shardTotals.as("a")
      .join(
        broadcast(shardTotals.as("b")), col("b.shard") > col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(min(col("b.firstv")).as("next_first"))
    val n = hist.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"),
      sum(col("s1p")).as("s1"), sum(col("s2p")).as("s2"))
    inShard
      .join(broadcast(offsets), "shard")
      .join(broadcast(nextFirst), "shard")
      .crossJoin(broadcast(n))
      .select(
        col("n1"), col("n2"), col("s1"), col("s2"),
        (abs((col("off1") + col("cum1_in")) * col("n2") -
          (col("off2") + col("cum2_in")) * col("n1"))
          .cast("decimal(38,0)") *
          (coalesce(col("lead_v"), col("next_first"), col("vc")) - col("vc")))
          .as("contrib"))
      .groupBy(col("n1"), col("n2"), col("s1"), col("s2"))
      .agg(sum(col("contrib")).as("tot"))
      .select(
        col("n1"), col("n2"),
        expr("cast((tot * 1000) div (cast(n1 as decimal(38,0)) * n2) as bigint)")
          .as("w1_cents_milli"),
        expr("""cast((abs(cast(s1 as decimal(38,0)) * n2
          |  - cast(s2 as decimal(38,0)) * n1) * 1000)
          |  div (cast(n1 as decimal(38,0)) * n2) as bigint)""".stripMargin)
          .as("mean_gap_cents_milli"))
      .withColumn(
        "dominates_mean_gap",
        col("w1_cents_milli") >= col("mean_gap_cents_milli"))
  }

  def wasserstein1dOracle: String =
    """WITH ev AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) vc, event_type g
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |hist AS (
      |  SELECT vc,
      |    CAST(count(*) FILTER (g = 'click') AS BIGINT) c1,
      |    CAST(count(*) FILTER (g = 'purchase') AS BIGINT) c2
      |  FROM ev GROUP BY 1),
      |n AS (
      |  SELECT CAST(sum(c1) AS BIGINT) n1, CAST(sum(c2) AS BIGINT) n2,
      |    CAST(sum(vc * c1) AS BIGINT) s1, CAST(sum(vc * c2) AS BIGINT) s2
      |  FROM hist),
      |cum AS (
      |  SELECT vc,
      |    CAST(sum(c1) OVER (ORDER BY vc) AS BIGINT) f1,
      |    CAST(sum(c2) OVER (ORDER BY vc) AS BIGINT) f2,
      |    lead(vc) OVER (ORDER BY vc) lead_v
      |  FROM hist),
      |tot AS (
      |  SELECT CAST(sum(CAST(abs(f1 * n.n2 - f2 * n.n1) AS HUGEINT)
      |    * (coalesce(lead_v, vc) - vc)) AS HUGEINT) t
      |  FROM cum, n)
      |SELECT n.n1, n.n2,
      |  CAST((tot.t * 1000) // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT)
      |    AS w1_cents_milli,
      |  CAST((abs(CAST(n.s1 AS HUGEINT) * n.n2
      |    - CAST(n.s2 AS HUGEINT) * n.n1) * 1000)
      |    // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT)
      |    AS mean_gap_cents_milli,
      |  CAST((tot.t * 1000) // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT)
      |    >= CAST((abs(CAST(n.s1 AS HUGEINT) * n.n2
      |      - CAST(n.s2 AS HUGEINT) * n.n1) * 1000)
      |      // (CAST(n.n1 AS HUGEINT) * n.n2) AS BIGINT)
      |    AS dominates_mean_gap
      |FROM n, tot""".stripMargin

  /** `hellinger_drift`: squared Hellinger distance between the 1996
    * and 1997 ship-quantity distributions over 10 fixed-width bins —
    * the f-divergence a corpus monitor can run where PSI/KL cannot:
    * H² = ½Σ(√p−√q)² is FINITE on empty bins (a brand-new or vanished
    * bucket contributes its mass, not ∞) and needs only sqrt, which is
    * IEEE-exact in both engines where ln (PSI/KL/JS) is libm-specific.
    * Emits the per-bin audit rows (counts, shares in ppm, quantized
    * contribution) plus the `calibration_bins`-style summary row
    * (bin = 10) whose h_nano is the total H²·2·10⁹ and whose
    * p_ppm/q_ppm are the SUMS of the floor-divided per-bin shares
    * (slightly under 10⁶ — the honest total of what the audit rows
    * show, not a 10⁶ label pretending the floors didn't happen) —
    * all inside the hash.
    *
    * Scale shape: ONE fact aggregate to the bounded 10-bin grid; all
    * divergence arithmetic happens on grid-sized rows. Per-bin double
    * terms quantize to integer nano BEFORE the summary sum, so no
    * order-dependent double accumulation exists.
    */
  def hellingerDrift(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.read(spark, dir, "lineitem")
      .where(year(col("l_shipdate")).isin(1996, 1997))
      .select(
        expr("(cast(l_quantity as bigint) - 1) div 5").as("bin"),
        year(col("l_shipdate")).as("yr"))
      .groupBy(col("bin"))
      .agg(
        count(when(col("yr") === 1996, 1)).as("n1"),
        count(when(col("yr") === 1997, 1)).as("n2"))
    val totals = cells.agg(
      sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
    val perBin = cells.crossJoin(broadcast(totals))
      .select(
        col("bin"), col("n1"), col("n2"),
        expr("n1 * 1000000 div t1").as("p_ppm"),
        expr("n2 * 1000000 div t2").as("q_ppm"),
        floor(
          (sqrt(col("n1").cast("double") / col("t1").cast("double")) -
            sqrt(col("n2").cast("double") / col("t2").cast("double"))) *
            (sqrt(col("n1").cast("double") / col("t1").cast("double")) -
              sqrt(col("n2").cast("double") / col("t2").cast("double"))) *
            lit(1000000000.0)).as("h_nano"))
    // The summary row totals the per-bin FLOOR-divided shares, so its
    // p_ppm/q_ppm read slightly under 10^6 — an honest "what the audit
    // rows sum to", not a hardcoded 1000000 label masquerading as an
    // exact total (the floor residue is itself a useful quantization
    // readout: 10^6 − sum = ppm lost to rounding across bins).
    val summary = perBin.crossJoin(broadcast(totals))
      .groupBy()
      .agg(
        max(lit(10L)).as("bin"),
        max(col("t1")).as("n1"), max(col("t2")).as("n2"),
        sum(col("p_ppm")).as("p_ppm"), sum(col("q_ppm")).as("q_ppm"),
        sum(col("h_nano")).as("h_nano"))
    perBin.select("bin", "n1", "n2", "p_ppm", "q_ppm", "h_nano")
      .unionAll(summary)
      .orderBy("bin")
  }

  def hellingerDriftOracle: String =
    """WITH cells AS (
      |  SELECT (CAST(l_quantity AS BIGINT) - 1) // 5 AS bin,
      |    CAST(count(*) FILTER (year(CAST(l_shipdate AS TIMESTAMP)) = 1996)
      |      AS BIGINT) n1,
      |    CAST(count(*) FILTER (year(CAST(l_shipdate AS TIMESTAMP)) = 1997)
      |      AS BIGINT) n2
      |  FROM lineitem
      |  WHERE year(CAST(l_shipdate AS TIMESTAMP)) IN (1996, 1997)
      |  GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(n1) AS BIGINT) t1, CAST(sum(n2) AS BIGINT) t2
      |  FROM cells),
      |per AS (
      |  SELECT bin, n1, n2,
      |    n1 * 1000000 // t1 AS p_ppm,
      |    n2 * 1000000 // t2 AS q_ppm,
      |    CAST(floor(
      |      (sqrt(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
      |        - sqrt(CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)))
      |      * (sqrt(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
      |        - sqrt(CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)))
      |      * 1000000000.0) AS BIGINT) h_nano
      |  FROM cells, t)
      |SELECT bin, n1, n2, p_ppm, q_ppm, h_nano FROM per
      |UNION ALL
      |SELECT CAST(10 AS BIGINT), t.t1, t.t2,
      |  (SELECT CAST(sum(p_ppm) AS BIGINT) FROM per),
      |  (SELECT CAST(sum(q_ppm) AS BIGINT) FROM per),
      |  (SELECT CAST(sum(h_nano) AS BIGINT) FROM per)
      |FROM t
      |ORDER BY bin""".stripMargin

  /** `spearman_rho`: rank correlation between part size and retail
    * price — the dependence test that survives any monotone
    * transformation of either axis (Pearson on VALUES moves under a
    * price rescale; Spearman only when ORDERINGS change), completing
    * the rank-statistics family beside `kendall_tau` (τ counts pair
    * inversions on a 25-row league table; ρ here runs fact-sized with
    * proper tie handling). Tie-aware average ranks stay INTEGER by
    * doubling: 2·avgrank(v) = 2·|{x < v}| + |{x = v}| + 1, read off
    * the value histograms — never a global rank() window. Pearson on
    * the doubled ranks equals Pearson on ranks (affine invariance);
    * moments accumulate exactly in DECIMAL(38,0)/HUGEINT and the only
    * doubles are one scalar |num|/(√d1·√d2) on the final row,
    * sign-split-floored to ppm.
    *
    * Scale shape: two histogram aggregates (p_size: ≤50 rows,
    * broadcast triangular cum; price cents: hist-sized, cum via the
    * ks_test sharded prefix sum), two rank joins back onto the fact
    * rows (one broadcast, one shuffle-on-cents), ONE moment aggregate.
    */
  def spearmanRho(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables.read(spark, dir, "part")
      .select(
        col("p_size").cast("long").as("sz"),
        Quantize.cents(col("p_retailprice")).as("vc"))
      .localCheckpoint(eager = false) // feeds both hists and the joins
    // x side: <=50 distinct sizes -> triangular broadcast cumulative
    val xHist = rows.groupBy(col("sz")).agg(count(lit(1)).as("cnt"))
    val xRank = xHist.as("a")
      .join(broadcast(xHist.as("b")), col("b.sz") < col("a.sz"), "left")
      .groupBy(col("a.sz").as("sz"), col("a.cnt").as("cnt"))
      .agg(coalesce(sum(col("b.cnt")), lit(0L)).as("lt"))
      .select(
        col("sz"), (lit(2L) * col("lt") + col("cnt") + 1L).as("rx2"))
    // y side: cents histogram -> sharded prefix sum (ks_test idiom)
    val yHist = rows.groupBy(col("vc")).agg(count(lit(1)).as("cnt"))
    val width = yHist.agg(expr("max(vc) div 64 + 1").as("w"))
    val sharded = yHist.crossJoin(broadcast(width))
      .withColumn("shard", expr("vc div w"))
    val w = Window.partitionBy(col("shard")).orderBy(col("vc"))
    val inShard = sharded
      .withColumn("cum_in", sum(col("cnt")).over(w))
    val shardTotals = sharded.groupBy(col("shard"))
      .agg(sum(col("cnt")).as("t"))
    val offsets = shardTotals.as("a")
      .join(
        broadcast(shardTotals.as("b")), col("b.shard") < col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(coalesce(sum(col("b.t")), lit(0L)).as("off"))
    val yRank = inShard.join(broadcast(offsets), "shard")
      .select(
        col("vc"),
        (lit(2L) * (col("off") + col("cum_in") - col("cnt")) +
          col("cnt") + 1L).as("ry2"))
    val nx = xHist.agg(count(lit(1)).as("nx"))
    val ny = yHist.agg(count(lit(1)).as("ny"))
    rows
      .join(broadcast(xRank), "sz")
      .join(yRank, "vc")
      .agg(
        count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum((col("rx2") * col("rx2")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ry2") * col("ry2")).cast("decimal(38,0)")).as("syy"),
        sum((col("rx2") * col("ry2")).cast("decimal(38,0)")).as("sxy"))
      .crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
      .select(
        col("n"), col("nx"), col("ny"),
        expr("""CASE WHEN cast(n as decimal(38,0)) * sxx
          |    - cast(sx as decimal(38,0)) * sx = 0
          |  OR cast(n as decimal(38,0)) * syy
          |    - cast(sy as decimal(38,0)) * sy = 0 THEN CAST(NULL AS BIGINT)
          |ELSE CASE WHEN cast(n as decimal(38,0)) * sxy
          |    - cast(sx as decimal(38,0)) * sy < 0
          |  THEN -cast(floor(1000000.0
          |    * cast(-(cast(n as decimal(38,0)) * sxy
          |        - cast(sx as decimal(38,0)) * sy) as double)
          |    / (sqrt(cast(cast(n as decimal(38,0)) * sxx
          |        - cast(sx as decimal(38,0)) * sx as double))
          |      * sqrt(cast(cast(n as decimal(38,0)) * syy
          |        - cast(sy as decimal(38,0)) * sy as double)))) as bigint)
          |  ELSE cast(floor(1000000.0
          |    * cast(cast(n as decimal(38,0)) * sxy
          |        - cast(sx as decimal(38,0)) * sy as double)
          |    / (sqrt(cast(cast(n as decimal(38,0)) * sxx
          |        - cast(sx as decimal(38,0)) * sx as double))
          |      * sqrt(cast(cast(n as decimal(38,0)) * syy
          |        - cast(sy as decimal(38,0)) * sy as double)))) as bigint)
          |  END END""".stripMargin).as("rho_ppm"))
  }

  def spearmanRhoOracle: String =
    s"""WITH rows_ AS (
       |  SELECT CAST(p_size AS BIGINT) sz,
       |    ${Quantize.centsSql("p_retailprice")} vc
       |  FROM part),
       |xh AS (SELECT sz, CAST(count(*) AS BIGINT) cnt FROM rows_ GROUP BY 1),
       |xr AS (
       |  SELECT a.sz, 2 * coalesce(sum(b.cnt), 0) + a.cnt + 1 AS rx2
       |  FROM xh a LEFT JOIN xh b ON b.sz < a.sz
       |  GROUP BY a.sz, a.cnt),
       |yh AS (SELECT vc, CAST(count(*) AS BIGINT) cnt FROM rows_ GROUP BY 1),
       |yr AS (
       |  SELECT vc,
       |    2 * (sum(cnt) OVER (ORDER BY vc) - cnt) + cnt + 1 AS ry2
       |  FROM yh),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) n,
       |    CAST(sum(rx2) AS BIGINT) sx, CAST(sum(ry2) AS BIGINT) sy,
       |    CAST(sum(CAST(rx2 AS HUGEINT) * rx2) AS HUGEINT) sxx,
       |    CAST(sum(CAST(ry2 AS HUGEINT) * ry2) AS HUGEINT) syy,
       |    CAST(sum(CAST(rx2 AS HUGEINT) * ry2) AS HUGEINT) sxy
       |  FROM rows_ JOIN xr USING (sz) JOIN yr USING (vc))
       |SELECT m.n,
       |  (SELECT CAST(count(*) AS BIGINT) FROM xh) AS nx,
       |  (SELECT CAST(count(*) AS BIGINT) FROM yh) AS ny,
       |  CASE WHEN CAST(m.n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx = 0
       |    OR CAST(m.n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy = 0
       |    THEN CAST(NULL AS BIGINT)
       |  ELSE CASE WHEN CAST(m.n AS HUGEINT) * sxy
       |      - CAST(sx AS HUGEINT) * sy < 0
       |    THEN -CAST(floor(1000000.0
       |      * CAST(-(CAST(m.n AS HUGEINT) * sxy
       |          - CAST(sx AS HUGEINT) * sy) AS DOUBLE)
       |      / (sqrt(CAST(CAST(m.n AS HUGEINT) * sxx
       |          - CAST(sx AS HUGEINT) * sx AS DOUBLE))
       |        * sqrt(CAST(CAST(m.n AS HUGEINT) * syy
       |          - CAST(sy AS HUGEINT) * sy AS DOUBLE)))) AS BIGINT)
       |    ELSE CAST(floor(1000000.0
       |      * CAST(CAST(m.n AS HUGEINT) * sxy
       |          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
       |      / (sqrt(CAST(CAST(m.n AS HUGEINT) * sxx
       |          - CAST(sx AS HUGEINT) * sx AS DOUBLE))
       |        * sqrt(CAST(CAST(m.n AS HUGEINT) * syy
       |          - CAST(sy AS HUGEINT) * sy AS DOUBLE)))) AS BIGINT)
       |    END END AS rho_ppm
       |FROM m""".stripMargin

  /** `cramers_v`: effect-size of the market-segment × nation
    * association — the step past `chi_square`'s yes/no: χ² grows with
    * N even for a fixed weak association, while V = √(χ²/(N·k)),
    * k = min(r−1, c−1), is the [0,1] strength a 100 TB monitor can
    * threshold scale-free. The contingency runs over the FULL r×c
    * grid (margin cross join, observed cells left-joined, absent
    * cells contribute their expected mass — dropping them understates
    * χ²). Per-cell terms (N·O − R·C)²/(N·R·C) are scalar doubles from
    * exact integers, quantized to nano BEFORE the grid sum — no
    * order-dependent double accumulation.
    *
    * Scale shape: ONE fact aggregate to ≤125 cells; margins are
    * grid-sized rollups; everything after is bounded-grid arithmetic.
    */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.read(spark, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"))
    val cells = cust.groupBy(col("seg"), col("nat"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // cells + both margins + N
    val rMarg = cells.groupBy(col("seg")).agg(sum(col("o")).as("r"))
    val cMarg = cells.groupBy(col("nat")).agg(sum(col("o")).as("c"))
    val nTot = cells.agg(
      sum(col("o")).as("n"),
      count(lit(1)).as("n_cells"))
    val rCnt = rMarg.agg(count(lit(1)).as("n_rows"))
    val cCnt = cMarg.agg(count(lit(1)).as("n_cols"))
    val grid = rMarg.crossJoin(broadcast(cMarg))
      .join(cells, Seq("seg", "nat"), "left")
      .na.fill(0L, Seq("o"))
    grid.crossJoin(broadcast(nTot))
      .select(
        col("n"),
        floor(
          ((col("n") * col("o") - col("r") * col("c")).cast("double") *
            (col("n") * col("o") - col("r") * col("c")).cast("double")) /
            (col("n").cast("double") * col("r").cast("double") *
              col("c").cast("double")) * lit(1000000000.0)).as("t_nano"))
      .groupBy(col("n"))
      .agg(sum(col("t_nano")).as("chi2_nano"))
      .crossJoin(broadcast(rCnt))
      .crossJoin(broadcast(cCnt))
      .select(
        col("n"), col("n_rows"), col("n_cols"),
        expr("chi2_nano div 1000000").as("chi2_milli"),
        floor(
          sqrt((col("chi2_nano").cast("double") / lit(1000000000.0)) /
            (col("n").cast("double") *
              least(col("n_rows") - 1, col("n_cols") - 1).cast("double"))) *
            lit(1000000.0)).as("v_ppm"))
  }

  def cramersVOracle: String =
    """WITH cells AS (
      |  SELECT c_mktsegment seg, c_nationkey nat,
      |    CAST(count(*) AS BIGINT) o
      |  FROM customer GROUP BY 1, 2),
      |rm AS (SELECT seg, CAST(sum(o) AS BIGINT) r FROM cells GROUP BY 1),
      |cm AS (SELECT nat, CAST(sum(o) AS BIGINT) c FROM cells GROUP BY 1),
      |nt AS (SELECT CAST(sum(o) AS BIGINT) n FROM cells),
      |grid AS (
      |  SELECT rm.r, cm.c, coalesce(cells.o, 0) o
      |  FROM rm CROSS JOIN cm
      |  LEFT JOIN cells ON cells.seg = rm.seg AND cells.nat = cm.nat),
      |chi AS (
      |  SELECT CAST(sum(CAST(floor(
      |    (CAST(nt.n * o - r * c AS DOUBLE) * CAST(nt.n * o - r * c AS DOUBLE))
      |    / (CAST(nt.n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |    * 1000000000.0) AS BIGINT)) AS BIGINT) chi2_nano
      |  FROM grid, nt)
      |SELECT nt.n,
      |  (SELECT CAST(count(*) AS BIGINT) FROM rm) n_rows,
      |  (SELECT CAST(count(*) AS BIGINT) FROM cm) n_cols,
      |  chi.chi2_nano // 1000000 AS chi2_milli,
      |  CAST(floor(sqrt((CAST(chi.chi2_nano AS DOUBLE) / 1000000000.0)
      |    / (CAST(nt.n AS DOUBLE)
      |      * CAST(least((SELECT count(*) FROM rm) - 1,
      |                   (SELECT count(*) FROM cm) - 1) AS DOUBLE)))
      |    * 1000000.0) AS BIGINT) v_ppm
      |FROM nt, chi""".stripMargin

  /** `anova_f`: one-way ANOVA of extended price across the three
    * return flags — the k-group generalization of `ab_test`'s
    * two-arm z (k−1 pairwise tests inflate α; one F controls it).
    * The sums of squares come from per-group integer moments
    * (n, Σc, Σc² in cents; Σc² crosses 2^63 fact-sized, so it
    * accumulates in DECIMAL(38,0)/HUGEINT), pivoted by CONDITIONAL
    * aggregation into ONE wide row — the kendall_tau idiom — so the
    * double algebra (SSB, SSW, F, η²) is a fixed-order scalar chain,
    * never an order-dependent distributed double sum. Group labels
    * N/A/R are pinned literals in both engines.
    *
    * Scale shape: ONE fact-sized aggregate; everything after is
    * single-row arithmetic. η²_ppm = SSB/(SSB+SSW) is the effect size
    * read beside the F decision (F explodes with N; η² doesn't).
    */
  def anovaF(spark: SparkSession, dir: String): DataFrame = {
    val c = Quantize.cents(col("l_extendedprice"))
    val wide = Tables.read(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"), c.as("c"))
      .agg(
        count(when(col("g") === "N", 1)).as("n_n"),
        count(when(col("g") === "A", 1)).as("n_a"),
        count(when(col("g") === "R", 1)).as("n_r"),
        sum(when(col("g") === "N", col("c")).otherwise(lit(0L))).as("s1n"),
        sum(when(col("g") === "A", col("c")).otherwise(lit(0L))).as("s1a"),
        sum(when(col("g") === "R", col("c")).otherwise(lit(0L))).as("s1r"),
        sum(when(col("g") === "N", (col("c") * col("c")).cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("s2n"),
        sum(when(col("g") === "A", (col("c") * col("c")).cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("s2a"),
        sum(when(col("g") === "R", (col("c") * col("c")).cast("decimal(38,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("s2r"))
    // fixed-order scalar chain: N-term, then A, then R — both engines
    // state the identical expression tree, so the doubles agree bitwise
    wide.select(
      (col("n_n") + col("n_a") + col("n_r")).as("n"),
      col("n_n"), col("n_a"), col("n_r"),
      expr("""cast(floor(1000.0 * (
        |  ((cast(s1n as double) * cast(s1n as double) / cast(n_n as double)
        |    + cast(s1a as double) * cast(s1a as double) / cast(n_a as double)
        |    + cast(s1r as double) * cast(s1r as double) / cast(n_r as double))
        |   - (cast(s1n + s1a + s1r as double) * cast(s1n + s1a + s1r as double)
        |      / cast(n_n + n_a + n_r as double))) / 2.0)
        |  / (((cast(s2n as double)
        |       - cast(s1n as double) * cast(s1n as double) / cast(n_n as double))
        |      + (cast(s2a as double)
        |       - cast(s1a as double) * cast(s1a as double) / cast(n_a as double))
        |      + (cast(s2r as double)
        |       - cast(s1r as double) * cast(s1r as double) / cast(n_r as double)))
        |     / cast(n_n + n_a + n_r - 3 as double))) as bigint)"""
        .stripMargin).as("f_milli"),
      expr("""cast(floor(1000000.0 * (
        |  ((cast(s1n as double) * cast(s1n as double) / cast(n_n as double)
        |    + cast(s1a as double) * cast(s1a as double) / cast(n_a as double)
        |    + cast(s1r as double) * cast(s1r as double) / cast(n_r as double))
        |   - (cast(s1n + s1a + s1r as double) * cast(s1n + s1a + s1r as double)
        |      / cast(n_n + n_a + n_r as double)))
        |  / (((cast(s1n as double) * cast(s1n as double) / cast(n_n as double)
        |    + cast(s1a as double) * cast(s1a as double) / cast(n_a as double)
        |    + cast(s1r as double) * cast(s1r as double) / cast(n_r as double))
        |   - (cast(s1n + s1a + s1r as double) * cast(s1n + s1a + s1r as double)
        |      / cast(n_n + n_a + n_r as double)))
        |   + ((cast(s2n as double)
        |       - cast(s1n as double) * cast(s1n as double) / cast(n_n as double))
        |      + (cast(s2a as double)
        |       - cast(s1a as double) * cast(s1a as double) / cast(n_a as double))
        |      + (cast(s2r as double)
        |       - cast(s1r as double) * cast(s1r as double) / cast(n_r as double))))))
        |  as bigint)""".stripMargin).as("eta2_ppm"))
  }

  def anovaFOracle: String = {
    val cSql = Quantize.centsSql("l_extendedprice")
    val ssb =
      """((CAST(s1n AS DOUBLE) * CAST(s1n AS DOUBLE) / CAST(n_n AS DOUBLE)
        |    + CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    + CAST(s1r AS DOUBLE) * CAST(s1r AS DOUBLE) / CAST(n_r AS DOUBLE))
        |   - (CAST(s1n + s1a + s1r AS DOUBLE) * CAST(s1n + s1a + s1r AS DOUBLE)
        |      / CAST(n_n + n_a + n_r AS DOUBLE)))""".stripMargin
    val ssw =
      """(((CAST(s2n AS DOUBLE)
        |       - CAST(s1n AS DOUBLE) * CAST(s1n AS DOUBLE) / CAST(n_n AS DOUBLE))
        |      + (CAST(s2a AS DOUBLE)
        |       - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      + (CAST(s2r AS DOUBLE)
        |       - CAST(s1r AS DOUBLE) * CAST(s1r AS DOUBLE) / CAST(n_r AS DOUBLE))))"""
        .stripMargin
    s"""WITH w AS (
       |  SELECT
       |    CAST(count(*) FILTER (l_returnflag = 'N') AS BIGINT) n_n,
       |    CAST(count(*) FILTER (l_returnflag = 'A') AS BIGINT) n_a,
       |    CAST(count(*) FILTER (l_returnflag = 'R') AS BIGINT) n_r,
       |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN $cSql ELSE 0 END)
       |      AS BIGINT) s1n,
       |    CAST(sum(CASE WHEN l_returnflag = 'A' THEN $cSql ELSE 0 END)
       |      AS BIGINT) s1a,
       |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN $cSql ELSE 0 END)
       |      AS BIGINT) s1r,
       |    CAST(sum(CASE WHEN l_returnflag = 'N'
       |      THEN CAST($cSql AS HUGEINT) * $cSql ELSE 0 END) AS HUGEINT) s2n,
       |    CAST(sum(CASE WHEN l_returnflag = 'A'
       |      THEN CAST($cSql AS HUGEINT) * $cSql ELSE 0 END) AS HUGEINT) s2a,
       |    CAST(sum(CASE WHEN l_returnflag = 'R'
       |      THEN CAST($cSql AS HUGEINT) * $cSql ELSE 0 END) AS HUGEINT) s2r
       |  FROM lineitem)
       |SELECT CAST(n_n + n_a + n_r AS BIGINT) n, n_n, n_a, n_r,
       |  CAST(floor(1000.0 * ($ssb / 2.0)
       |    / ($ssw / CAST(n_n + n_a + n_r - 3 AS DOUBLE))) AS BIGINT)
       |    f_milli,
       |  CAST(floor(1000000.0 * ($ssb / ($ssb + $ssw))) AS BIGINT) eta2_ppm
       |FROM w""".stripMargin
  }

  /** `capture_recapture`: Lincoln–Petersen / Chapman population-size
    * estimation from two overlapping incomplete observations — "how
    * many users exist" when NEITHER log saw everyone (the question a
    * coverage audit answers before trusting any per-user rate):
    * capture A = users seen clicking, capture B = users seen
    * purchasing, N̂_LP = n1·n2/m, Chapman's bias-corrected
    * (n1+1)(n2+1)/(m+1) − 1. On this corpus the truth |A∪B| is
    * computable, so the estimator error itself is hash-pinned —
    * the measured-answer-quality stance (bloom_fpp/minhash_estimate/
    * countmin_error) applied to population inference. Independence
    * of captures is the assumption; the signed error ppm is exactly
    * the readout that audits it. Pure integer (floor divisions); the
    * n1·n2-class products cross 2^63 past ~3e9 users per capture, so
    * they run in DECIMAL(38,0)/HUGEINT (the suite's overflow
    * convention) with only the final estimates cast back to BIGINT.
    *
    * Plan shape: ONE user-grain conditional aggregate, then 1-row
    * algebra. Nothing else moves at 100 TB.
    */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        max((col("event_type") === "click").cast("long")).as("a"),
        max((col("event_type") === "purchase").cast("long")).as("b"))
      .agg(
        sum(col("a")).as("n1"),
        sum(col("b")).as("n2"),
        sum(col("a") * col("b")).as("overlap"),
        sum(when(col("a") + col("b") > 0, 1L).otherwise(0L)).as("n_true"))
      .select(
        col("n1"), col("n2"), col("overlap"), col("n_true"),
        expr("""CASE WHEN overlap = 0 THEN CAST(NULL AS BIGINT)
          |ELSE CAST(CAST(n1 AS DECIMAL(38,0)) * n2 div overlap AS BIGINT)
          |END""".stripMargin).as("lp_est"),
        expr("""CAST((CAST(n1 AS DECIMAL(38,0)) + 1) * (n2 + 1)
          |div (overlap + 1) - 1 AS BIGINT)""".stripMargin)
          .as("chapman_est"))
      .withColumn(
        "err_ppm",
        expr("""CASE WHEN chapman_est - n_true < 0
          |THEN -CAST((CAST(n_true AS DECIMAL(38,0)) - chapman_est)
          |  * 1000000 div n_true AS BIGINT)
          |ELSE CAST((CAST(chapman_est AS DECIMAL(38,0)) - n_true)
          |  * 1000000 div n_true AS BIGINT)
          |END""".stripMargin))

  def captureRecaptureOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) a,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) b
      |  FROM events GROUP BY 1),
      |w AS (
      |  SELECT CAST(sum(a) AS BIGINT) n1, CAST(sum(b) AS BIGINT) n2,
      |    CAST(sum(a * b) AS BIGINT) overlap,
      |    CAST(sum(CASE WHEN a + b > 0 THEN 1 ELSE 0 END) AS BIGINT) n_true
      |  FROM u),
      |c AS (
      |  SELECT n1, n2, overlap, n_true,
      |    CASE WHEN overlap = 0 THEN CAST(NULL AS BIGINT)
      |      ELSE CAST(CAST(n1 AS HUGEINT) * n2 // overlap AS BIGINT)
      |    END lp_est,
      |    CAST((CAST(n1 AS HUGEINT) + 1) * (n2 + 1) // (overlap + 1) - 1
      |      AS BIGINT) chapman_est
      |  FROM w)
      |SELECT n1, n2, overlap, n_true, lp_est, chapman_est,
      |  CASE WHEN chapman_est - n_true < 0
      |    THEN -CAST((CAST(n_true AS HUGEINT) - chapman_est)
      |      * 1000000 // n_true AS BIGINT)
      |    ELSE CAST((CAST(chapman_est AS HUGEINT) - n_true)
      |      * 1000000 // n_true AS BIGINT)
      |  END err_ppm
      |FROM c""".stripMargin

  /** `mann_kendall`: the distribution-free monotone-trend test on the
    * daily order-revenue series — linreg_trend fits a LINE (and its
    * slope moves with one outlier day); Mann-Kendall asks only "do
    * later days tend to exceed earlier days", S = Σ_{i<j}
    * sign(x_j − x_i), the test a seasonal, heavy-tailed series wants.
    * Tie-corrected variance 18·Var = n(n−1)(2n+5) − Σ_t c(c−1)(2c+5)
    * kept as the INTEGER var18 (publishing the ÷18 rational as its
    * numerator is the kendall_tau integer-honest form);
    * z = (S − sign(S))/√(var18/18) sign-split-floored to milli, with
    * the ±1.96 verdict derived FROM z_milli so the decision is
    * integer-exact.
    *
    * Plan shape: one fact aggregate to the BOUNDED day grid, pairs
    * via the triangular broadcast self-join over grid rows (the
    * kendall_tau discipline — the grid is calendar-bounded at any
    * corpus size), ties from a grid-sized value histogram, 1-row fold.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .groupBy(col("d"))
      .agg(sum(col("c")).as("x"))
      .localCheckpoint(eager = false) // pairs + ties + count
    val n = days.agg(count(lit(1)).as("n_days"))
    val s = days.as("a")
      .join(
        broadcast(days.select(col("d").as("d2"), col("x").as("x2"))),
        col("d2") > col("a.d"))
      .agg(
        sum(
          when(col("x2") > col("x"), 1L)
            .when(col("x2") < col("x"), -1L)
            .otherwise(0L)).as("s_stat"))
    val ties = days.groupBy(col("x"))
      .agg(count(lit(1)).as("c"))
      .agg(
        coalesce(
          sum(col("c") * (col("c") - 1) * (lit(2L) * col("c") + 5)),
          lit(0L)).as("tie_term"))
    n.crossJoin(broadcast(s)).crossJoin(broadcast(ties))
      .select(
        col("n_days"), col("s_stat"),
        (col("n_days") * (col("n_days") - 1) *
          (lit(2L) * col("n_days") + 5) - col("tie_term")).as("var18"))
      .select(
        col("n_days"), col("s_stat"), col("var18"),
        expr("""CASE WHEN s_stat = 0 OR var18 <= 0 THEN 0L
          |WHEN s_stat > 0 THEN cast(floor(1000.0
          |  * cast(s_stat - 1 as double)
          |  / sqrt(cast(var18 as double) / 18.0)) as bigint)
          |ELSE -cast(floor(1000.0 * cast(-s_stat - 1 as double)
          |  / sqrt(cast(var18 as double) / 18.0)) as bigint)
          |END""".stripMargin).as("z_milli"))
      .withColumn(
        "trend",
        when(col("z_milli") > 1960, lit("increasing"))
          .when(col("z_milli") < -1960, lit("decreasing"))
          .otherwise(lit("none")))
  }

  def mannKendallOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) n_days FROM days),
       |s AS (
       |  SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
       |    WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) s_stat
       |  FROM days a JOIN days b ON b.d > a.d),
       |t AS (
       |  SELECT CAST(coalesce(sum(c * (c - 1) * (2 * c + 5)), 0)
       |    AS BIGINT) tie_term
       |  FROM (SELECT CAST(count(*) AS BIGINT) c FROM days GROUP BY x)),
       |v AS (
       |  SELECT n.n_days, s.s_stat,
       |    n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term
       |      AS var18
       |  FROM n, s, t)
       |SELECT n_days, s_stat, var18,
       |  CASE WHEN s_stat = 0 OR var18 <= 0 THEN CAST(0 AS BIGINT)
       |    WHEN s_stat > 0 THEN CAST(floor(1000.0
       |      * CAST(s_stat - 1 AS DOUBLE)
       |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
       |    ELSE -CAST(floor(1000.0 * CAST(-s_stat - 1 AS DOUBLE)
       |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
       |  END z_milli,
       |  CASE WHEN (CASE WHEN s_stat = 0 OR var18 <= 0 THEN 0
       |      WHEN s_stat > 0 THEN CAST(floor(1000.0
       |        * CAST(s_stat - 1 AS DOUBLE)
       |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
       |      ELSE -CAST(floor(1000.0 * CAST(-s_stat - 1 AS DOUBLE)
       |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT) END) > 1960
       |    THEN 'increasing'
       |  WHEN (CASE WHEN s_stat = 0 OR var18 <= 0 THEN 0
       |      WHEN s_stat > 0 THEN CAST(floor(1000.0
       |        * CAST(s_stat - 1 AS DOUBLE)
       |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT)
       |      ELSE -CAST(floor(1000.0 * CAST(-s_stat - 1 AS DOUBLE)
       |        / sqrt(CAST(var18 AS DOUBLE) / 18.0)) AS BIGINT) END) < -1960
       |    THEN 'decreasing'
       |  ELSE 'none' END trend
       |FROM v""".stripMargin

  /** `levene_bf`: Brown–Forsythe equality-of-variances test across
    * the three return flags — `anova_f` asks whether group MEANS
    * differ; this asks whether group SPREADS do (and it gates
    * anova_f itself: the F test assumes homoscedasticity). The
    * Levene transform with the MEDIAN center (Brown–Forsythe — robust
    * where the mean-centered original is outlier-led): per group the
    * exact LOWER median of price cents (the weighted_median
    * convention: smallest value with 2·cum ≥ n), then a one-way F on
    * the absolute deviations |c − med_g| via the identical
    * conditional-aggregation wide-row chain as anova_f.
    *
    * Plan shape: one histogram aggregate (flag × cent value) with
    * cumulatives via the shared [[Statistics.lowerMedianBy]] kernel
    * ((flag, value-shard)-partitioned prefix sums + triangular
    * broadcast offsets — never a 3-partition window over a fact-sized
    * histogram), 3-row median broadcast back onto a second fact scan,
    * ONE wide-row conditional aggregate.
    */
  def leveneBf(spark: SparkSession, dir: String): DataFrame = {
    val c = Quantize.cents(col("l_extendedprice"))
    // NOT checkpointed (median_merge's lesson, re-proven by
    // weighted_median at the 1000× replica): a fact-grain
    // localCheckpoint pins deserialized row blocks and the GC churn
    // stalls the driver past the heartbeat budget. The kernel passes
    // and the deviation scan each re-read a 2-column pruned parquet
    // scan — cheaper than materializing at any replica scale
    val rows = Tables.read(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"), c.as("c"))
    // exact lower medians via the shared order-statistics kernel;
    // the 3-row result is checkpointed because it feeds TWO broadcast
    // consumers (the deviation join and the medWide pivot) — without
    // the pin the whole probe machinery evaluated twice
    val medians = Statistics.lowerMedianBy(rows, Seq("g"), "c", None)
      .select(col("g"), col("med"))
      .localCheckpoint(eager = false)
    val dev = rows.join(broadcast(medians), "g")
      .select(col("g"), abs(col("c") - col("med")).as("z"))
    val wide = dev.agg(
      count(when(col("g") === "N", 1)).as("n_n"),
      count(when(col("g") === "A", 1)).as("n_a"),
      count(when(col("g") === "R", 1)).as("n_r"),
      sum(when(col("g") === "N", col("z")).otherwise(lit(0L))).as("s1n"),
      sum(when(col("g") === "A", col("z")).otherwise(lit(0L))).as("s1a"),
      sum(when(col("g") === "R", col("z")).otherwise(lit(0L))).as("s1r"),
      sum(when(col("g") === "N", (col("z") * col("z")).cast("decimal(38,0)"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("s2n"),
      sum(when(col("g") === "A", (col("z") * col("z")).cast("decimal(38,0)"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("s2a"),
      sum(when(col("g") === "R", (col("z") * col("z")).cast("decimal(38,0)"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("s2r"))
    val medWide = medians.groupBy().agg(
      max(when(col("g") === "N", col("med"))).as("med_n_c"),
      max(when(col("g") === "A", col("med"))).as("med_a_c"),
      max(when(col("g") === "R", col("med"))).as("med_r_c"))
    wide.crossJoin(broadcast(medWide)).select(
      (col("n_n") + col("n_a") + col("n_r")).as("n"),
      col("med_n_c"), col("med_a_c"), col("med_r_c"),
      expr("""cast(floor(1000.0 * (
        |  ((cast(s1n as double) * cast(s1n as double) / cast(n_n as double)
        |    + cast(s1a as double) * cast(s1a as double) / cast(n_a as double)
        |    + cast(s1r as double) * cast(s1r as double) / cast(n_r as double))
        |   - (cast(s1n + s1a + s1r as double) * cast(s1n + s1a + s1r as double)
        |      / cast(n_n + n_a + n_r as double))) / 2.0)
        |  / (((cast(s2n as double)
        |       - cast(s1n as double) * cast(s1n as double) / cast(n_n as double))
        |      + (cast(s2a as double)
        |       - cast(s1a as double) * cast(s1a as double) / cast(n_a as double))
        |      + (cast(s2r as double)
        |       - cast(s1r as double) * cast(s1r as double) / cast(n_r as double)))
        |     / cast(n_n + n_a + n_r - 3 as double))) as bigint)"""
        .stripMargin).as("w_milli"))
  }

  def leveneBfOracle: String = {
    val cSql = Quantize.centsSql("l_extendedprice")
    val ssb =
      """((CAST(s1n AS DOUBLE) * CAST(s1n AS DOUBLE) / CAST(n_n AS DOUBLE)
        |    + CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |    + CAST(s1r AS DOUBLE) * CAST(s1r AS DOUBLE) / CAST(n_r AS DOUBLE))
        |   - (CAST(s1n + s1a + s1r AS DOUBLE) * CAST(s1n + s1a + s1r AS DOUBLE)
        |      / CAST(n_n + n_a + n_r AS DOUBLE)))""".stripMargin
    val ssw =
      """(((CAST(s2n AS DOUBLE)
        |       - CAST(s1n AS DOUBLE) * CAST(s1n AS DOUBLE) / CAST(n_n AS DOUBLE))
        |      + (CAST(s2a AS DOUBLE)
        |       - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      + (CAST(s2r AS DOUBLE)
        |       - CAST(s1r AS DOUBLE) * CAST(s1r AS DOUBLE) / CAST(n_r AS DOUBLE))))"""
        .stripMargin
    s"""WITH rows_ AS (
       |  SELECT l_returnflag g, $cSql c FROM lineitem),
       |hist AS (
       |  SELECT g, c, CAST(count(*) AS BIGINT) cnt FROM rows_ GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, c, sum(cnt) OVER (PARTITION BY g ORDER BY c) cum,
       |    sum(cnt) OVER (PARTITION BY g) n_g
       |  FROM hist),
       |med AS (
       |  SELECT g, CAST(min(c) AS BIGINT) med FROM cum
       |  WHERE cum * 2 >= n_g GROUP BY 1),
       |dev AS (
       |  SELECT rows_.g, abs(c - med) z
       |  FROM rows_ JOIN med ON med.g = rows_.g),
       |w AS (
       |  SELECT
       |    CAST(count(*) FILTER (g = 'N') AS BIGINT) n_n,
       |    CAST(count(*) FILTER (g = 'A') AS BIGINT) n_a,
       |    CAST(count(*) FILTER (g = 'R') AS BIGINT) n_r,
       |    CAST(sum(CASE WHEN g = 'N' THEN z ELSE 0 END) AS BIGINT) s1n,
       |    CAST(sum(CASE WHEN g = 'A' THEN z ELSE 0 END) AS BIGINT) s1a,
       |    CAST(sum(CASE WHEN g = 'R' THEN z ELSE 0 END) AS BIGINT) s1r,
       |    CAST(sum(CASE WHEN g = 'N'
       |      THEN CAST(z AS HUGEINT) * z ELSE 0 END) AS HUGEINT) s2n,
       |    CAST(sum(CASE WHEN g = 'A'
       |      THEN CAST(z AS HUGEINT) * z ELSE 0 END) AS HUGEINT) s2a,
       |    CAST(sum(CASE WHEN g = 'R'
       |      THEN CAST(z AS HUGEINT) * z ELSE 0 END) AS HUGEINT) s2r
       |  FROM dev),
       |mw AS (
       |  SELECT
       |    CAST(max(CASE WHEN g = 'N' THEN med END) AS BIGINT) med_n_c,
       |    CAST(max(CASE WHEN g = 'A' THEN med END) AS BIGINT) med_a_c,
       |    CAST(max(CASE WHEN g = 'R' THEN med END) AS BIGINT) med_r_c
       |  FROM med)
       |SELECT CAST(n_n + n_a + n_r AS BIGINT) n,
       |  med_n_c, med_a_c, med_r_c,
       |  CAST(floor(1000.0 * ($ssb / 2.0)
       |    / ($ssw / CAST(n_n + n_a + n_r - 3 AS DOUBLE))) AS BIGINT)
       |    w_milli
       |FROM w, mw""".stripMargin
  }

  /** `segmented_trend`: broken-stick trend readout — the cusum
    * changepoint (`cusum_shift` top-1) made ACTIONABLE: split the
    * daily revenue series at argmax |Sₜ| and fit exact integer
    * least-squares slopes on each side, so "the series shifted"
    * becomes "growth went from a to b cents/day at D". Slopes are
    * fully rational: day index from the triangular rank join,
    * slope_milli = 1000·(k·Σxy − ΣxΣy) div (k·Σx² − (Σx)²) in
    * DECIMAL(38,0), sign-split floor; the cut day itself (min-day
    * argmax tie-break) is inside the hash.
    *
    * Plan shape: one fact aggregate to the bounded day grid;
    * prefix sums, ranks and pairs all run as triangular broadcast
    * self-joins over grid rows (calendar-bounded at any corpus
    * size); two conditional moment sums in ONE grid aggregate.
    */
  def segmentedTrend(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.read(spark, dir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .groupBy(col("d"))
      .agg(sum(col("c")).as("x"))
      .localCheckpoint(eager = false) // rank join + totals + moments
    val ranked = days.as("a")
      .join(
        broadcast(days.select(col("d").as("d2"), col("x").as("x2"))),
        col("d2") <= col("a.d"))
      .groupBy(col("a.d").as("d"), col("a.x").as("x"))
      .agg(count(lit(1)).as("rn"), sum(col("x2")).as("pre"))
      .localCheckpoint(eager = false)
    val totals = days.agg(
      count(lit(1)).as("n_days"), sum(col("x")).as("t_sum"))
    val scored = ranked.crossJoin(broadcast(totals))
      .select(
        col("d"), col("x"), col("rn"), col("n_days"),
        abs(col("n_days") * col("pre") - col("rn") * col("t_sum"))
          .as("s_abs"))
    val cut = scored
      .orderBy(col("s_abs").desc, col("d"))
      .limit(1)
      .select(col("d").as("cut_day"), col("rn").as("cut_rn"))
    val m = ranked.crossJoin(broadcast(cut))
      .select(
        col("cut_day"),
        (col("rn") <= col("cut_rn")).as("left_side"),
        col("rn"), col("x"))
      .groupBy(col("cut_day"))
      .agg(
        sum(when(col("left_side"), 1L).otherwise(0L)).as("kl"),
        sum(when(col("left_side"), col("rn")).otherwise(lit(0L))).as("sxl"),
        sum(when(col("left_side"), col("x")).otherwise(lit(0L))).as("syl"),
        sum(when(col("left_side"), col("rn") * col("rn"))
          .otherwise(lit(0L))).as("sxxl"),
        sum(when(col("left_side"),
          (col("rn").cast("decimal(38,0)") * col("x")))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("sxyl"),
        sum(when(!col("left_side"), 1L).otherwise(0L)).as("kr"),
        sum(when(!col("left_side"), col("rn")).otherwise(lit(0L))).as("sxr"),
        sum(when(!col("left_side"), col("x")).otherwise(lit(0L))).as("syr"),
        sum(when(!col("left_side"), col("rn") * col("rn"))
          .otherwise(lit(0L))).as("sxxr"),
        sum(when(!col("left_side"),
          (col("rn").cast("decimal(38,0)") * col("x")))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("sxyr"))
    def slope(k: String, sx: String, sy: String, sxx: String, sxy: String) =
      s"""CASE WHEN cast($k as decimal(38,0)) * $sxx
         |    - cast($sx as decimal(38,0)) * $sx = 0 THEN CAST(NULL AS BIGINT)
         |WHEN cast($k as decimal(38,0)) * $sxy
         |    - cast($sx as decimal(38,0)) * $sy < 0
         |  THEN -cast((-(cast($k as decimal(38,0)) * $sxy
         |      - cast($sx as decimal(38,0)) * $sy) * 1000)
         |    div (cast($k as decimal(38,0)) * $sxx
         |      - cast($sx as decimal(38,0)) * $sx) as bigint)
         |ELSE cast(((cast($k as decimal(38,0)) * $sxy
         |      - cast($sx as decimal(38,0)) * $sy) * 1000)
         |    div (cast($k as decimal(38,0)) * $sxx
         |      - cast($sx as decimal(38,0)) * $sx) as bigint)
         |END""".stripMargin
    m.select(
      (col("kl") + col("kr")).as("n_days"),
      col("cut_day"),
      col("kl").as("n_left"), col("kr").as("n_right"),
      expr(slope("kl", "sxl", "syl", "sxxl", "sxyl"))
        .as("slope_left_milli"),
      expr(slope("kr", "sxr", "syr", "sxxr", "sxyr"))
        .as("slope_right_milli"))
      .withColumn(
        "delta_milli", col("slope_right_milli") - col("slope_left_milli"))
  }

  def segmentedTrendOracle: String = {
    def slope(k: String, sx: String, sy: String, sxx: String, sxy: String) =
      s"""CASE WHEN CAST($k AS HUGEINT) * $sxx
         |    - CAST($sx AS HUGEINT) * $sx = 0 THEN CAST(NULL AS BIGINT)
         |WHEN CAST($k AS HUGEINT) * $sxy
         |    - CAST($sx AS HUGEINT) * $sy < 0
         |  THEN -CAST((-(CAST($k AS HUGEINT) * $sxy
         |      - CAST($sx AS HUGEINT) * $sy) * 1000)
         |    // (CAST($k AS HUGEINT) * $sxx
         |      - CAST($sx AS HUGEINT) * $sx) AS BIGINT)
         |ELSE CAST(((CAST($k AS HUGEINT) * $sxy
         |      - CAST($sx AS HUGEINT) * $sy) * 1000)
         |    // (CAST($k AS HUGEINT) * $sxx
         |      - CAST($sx AS HUGEINT) * $sx) AS BIGINT)
         |END""".stripMargin
    s"""WITH days AS (
       |  SELECT CAST(o_orderdate AS DATE) d,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) x
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) n_days,
       |  CAST(sum(x) AS BIGINT) t_sum FROM days),
       |ranked AS (
       |  SELECT d, x,
       |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) rn,
       |    CAST(sum(x) OVER (ORDER BY d) AS BIGINT) pre
       |  FROM days),
       |cut AS (
       |  SELECT d cut_day, rn cut_rn
       |  FROM ranked, tot
       |  ORDER BY abs(n_days * pre - rn * t_sum) DESC, d LIMIT 1),
       |m AS (
       |  SELECT cut.cut_day,
       |    CAST(count(*) FILTER (rn <= cut_rn) AS BIGINT) kl,
       |    CAST(sum(rn) FILTER (rn <= cut_rn) AS BIGINT) sxl,
       |    CAST(sum(x) FILTER (rn <= cut_rn) AS BIGINT) syl,
       |    CAST(sum(rn * rn) FILTER (rn <= cut_rn) AS BIGINT) sxxl,
       |    CAST(sum(CAST(rn AS HUGEINT) * x) FILTER (rn <= cut_rn)
       |      AS HUGEINT) sxyl,
       |    CAST(count(*) FILTER (rn > cut_rn) AS BIGINT) kr,
       |    CAST(coalesce(sum(rn) FILTER (rn > cut_rn), 0) AS BIGINT) sxr,
       |    CAST(coalesce(sum(x) FILTER (rn > cut_rn), 0) AS BIGINT) syr,
       |    CAST(coalesce(sum(rn * rn) FILTER (rn > cut_rn), 0)
       |      AS BIGINT) sxxr,
       |    CAST(coalesce(sum(CAST(rn AS HUGEINT) * x) FILTER (rn > cut_rn),
       |      0) AS HUGEINT) sxyr
       |  FROM ranked, cut GROUP BY 1)
       |SELECT CAST(kl + kr AS BIGINT) n_days, cut_day,
       |  kl AS n_left, kr AS n_right,
       |  ${slope("kl", "sxl", "syl", "sxxl", "sxyl")} AS slope_left_milli,
       |  ${slope("kr", "sxr", "syr", "sxxr", "sxyr")} AS slope_right_milli,
       |  (${slope("kr", "sxr", "syr", "sxxr", "sxyr")})
       |    - (${slope("kl", "sxl", "syl", "sxxl", "sxyl")}) AS delta_milli
       |FROM m""".stripMargin
  }

  /** `gk_lambda`: Goodman–Kruskal λ over the documents lang × source
    * contingency grid — the PROPORTIONAL-REDUCTION-IN-ERROR
    * association measure this panel was missing: `cramers_v` answers
    * "are the columns dependent" in χ² effect-size units, λ answers
    * the operational question "how many prediction mistakes does
    * knowing the other column SAVE" (λ(lang|source) = the share of
    * modal-guess errors eliminated by conditioning on source).
    * Entirely integer — λ = (Σ_s max_l n_ls − max_l n_l) /
    * (N − max_l n_l), numerator/denominator exact counts, quotient
    * floored to ppm — i.e. the MI-shaped question answered with NO
    * logarithm (the panel's no-libm discipline). Emits all three
    * directions (λ(lang|source), λ(source|lang), symmetric) with the
    * exact numerator/denominator beside each ppm.
    *
    * Plan shape: one documents scan → the bounded (lang, source)
    * grid; margins, modes, and per-stratum maxima are re-aggregates
    * OF THE GRID (≤ |langs|·|sources| rows), never of the fact. At
    * 100 TB: scan-bound with a map-side-combinable count.
    */
  def gkLambda(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.read(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // margins + maxima re-aggregates
    val tot = grid.agg(sum(col("n")).as("nt"))
    // modal count of each variable (the "guess the mode" error base)
    val mLang = grid.groupBy(col("lang")).agg(sum(col("n")).as("nl"))
      .agg(max(col("nl")).as("m_lang"))
    val mSrc = grid.groupBy(col("source")).agg(sum(col("n")).as("ns"))
      .agg(max(col("ns")).as("m_src"))
    // Σ over strata of the within-stratum modal count
    val smGivenSrc = grid.groupBy(col("source")).agg(max(col("n")).as("mx"))
      .agg(sum(col("mx")).as("sm_ls"))
    val smGivenLang = grid.groupBy(col("lang")).agg(max(col("n")).as("mx"))
      .agg(sum(col("mx")).as("sm_sl"))
    val one = tot.crossJoin(broadcast(mLang)).crossJoin(broadcast(mSrc))
      .crossJoin(broadcast(smGivenSrc)).crossJoin(broadcast(smGivenLang))
    // 1-row scalar algebra: documented driver-free bounded exception
    one.select(
      lit("lang|source").as("direction"),
      (col("sm_ls") - col("m_lang")).as("saved"),
      (col("nt") - col("m_lang")).as("base"))
      .unionByName(one.select(
        lit("source|lang").as("direction"),
        (col("sm_sl") - col("m_src")).as("saved"),
        (col("nt") - col("m_src")).as("base")))
      .unionByName(one.select(
        lit("symmetric").as("direction"),
        (col("sm_ls") - col("m_lang") + col("sm_sl") - col("m_src"))
          .as("saved"),
        (col("nt") * 2 - col("m_lang") - col("m_src")).as("base")))
      .withColumn("lambda_ppm", expr("saved * 1000000 div base"))
      .orderBy("direction")
  }

  def gkLambdaOracle: String =
    """WITH grid AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) n
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) nt FROM grid),
      |ml AS (SELECT CAST(MAX(nl) AS BIGINT) m_lang FROM (
      |  SELECT SUM(n) nl FROM grid GROUP BY lang)),
      |ms AS (SELECT CAST(MAX(ns) AS BIGINT) m_src FROM (
      |  SELECT SUM(n) ns FROM grid GROUP BY source)),
      |sls AS (SELECT CAST(SUM(mx) AS BIGINT) sm_ls FROM (
      |  SELECT MAX(n) mx FROM grid GROUP BY source)),
      |ssl AS (SELECT CAST(SUM(mx) AS BIGINT) sm_sl FROM (
      |  SELECT MAX(n) mx FROM grid GROUP BY lang)),
      |one AS (SELECT * FROM tot, ml, ms, sls, ssl),
      |rows3 AS (
      |  SELECT 'lang|source' direction, sm_ls - m_lang saved,
      |    nt - m_lang base FROM one
      |  UNION ALL
      |  SELECT 'source|lang', sm_sl - m_src, nt - m_src FROM one
      |  UNION ALL
      |  SELECT 'symmetric', sm_ls - m_lang + sm_sl - m_src,
      |    nt * 2 - m_lang - m_src FROM one)
      |SELECT direction, saved, base, saved * 1000000 // base lambda_ppm
      |FROM rows3 ORDER BY direction""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "capture_recapture", captureRecapture, Some(captureRecaptureOracle)),
    QueryDef("gk_lambda", gkLambda, Some(gkLambdaOracle)),
    QueryDef("mann_kendall", mannKendall, Some(mannKendallOracle)),
    QueryDef("levene_bf", leveneBf, Some(leveneBfOracle)),
    QueryDef("segmented_trend", segmentedTrend, Some(segmentedTrendOracle)),
    QueryDef("wasserstein_1d", wasserstein1d, Some(wasserstein1dOracle)),
    QueryDef("hellinger_drift", hellingerDrift, Some(hellingerDriftOracle)),
    QueryDef("spearman_rho", spearmanRho, Some(spearmanRhoOracle)),
    QueryDef("cramers_v", cramersV, Some(cramersVOracle)),
    QueryDef("anova_f", anovaF, Some(anovaFOracle)))
}
