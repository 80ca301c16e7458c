package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation battery over the shared quality-score relation
  * ([[TrainingPipeline.qualityScoredDocs]]): the readouts a corpus
  * pipeline publishes about its quality classifier before trusting it
  * to gate training data. Reference behavioral anchor: the stats/
  * filter surface (`/root/reference/evtstrd/filter.py`,
  * `stats.py`) exposes per-stream counts; this module is the gap-fill
  * analytics layer a 100 TB curation pipeline needs on top.
  *
  * Every metric is exact integer arithmetic (ppm, div-floor, pinned
  * literal weights) so results hash-match DuckDB at any scale; every
  * plan is one doc-grain scan collapsed to score-grain (the score
  * domain is BOUNDED — a sum of ppm-floored features, ~[-25k, 3k] —
  * so everything after the first aggregate is dimension-sized
  * regardless of corpus size). Ranking sums use the weighted_median
  * sharded-prefix-sum discipline: per-shard running sums plus
  * triangular cross-shard offsets, never an unpartitioned window.
  *
  * Label convention: positive class = `lang = 'en'` (the stopword
  * feature is English-biased by construction, so "does the scorer
  * separate English" is the audit a real fasttext-style quality
  * gate gets).
  */
object Evaluation {

  /** Score-grain histogram (score, n_pos, n_neg) of the quality
    * scores — the one fact-sized aggregate every gate here shares.
    */
  private def scoreHist(spark: SparkSession, dir: String): DataFrame =
    TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(
        col("score"),
        (col("lang") === "en").cast("long").as("pos"))
      .groupBy(col("score"))
      .agg(
        sum(col("pos")).as("n_pos"),
        (count(lit(1)) - sum(col("pos"))).as("n_neg"))

  private val HistSql =
    """h AS (
      |  SELECT score,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) n_pos,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) n_neg
      |  FROM qscore GROUP BY score)""".stripMargin

  /** Value shards for the prefix-sum discipline, sized from the DATA
    * (the lorenz/gini width rule, (hi−lo) div 64 + 1, ≤65 shards on
    * any domain). Round-7 lesson: a FIXED width-1000 shard was fine
    * on the quality-score domain (~40 shards) but made ~50k shards
    * of the cent-exact price domain, and the triangular offsets join
    * priced mannwhitney_u at 18.7s — quadratic in shard count, the
    * exact failure the rule exists to prevent.
    */
  private val Shards = 64L

  /** Midrank pair-counting numerator shared by [[aucRoc]] and
    * [[mannwhitneyU]]: for a (value, n_pos, n_neg) histogram,
    * numer2 = Σ_v n_pos(v)·(2·NegBelow(v) + n_neg(v)) — twice the
    * Mann-Whitney U of the positive sample (ties counted ½, hence the
    * ×2 to stay integer). NegBelow comes from a per-shard running sum
    * plus broadcast triangular cross-shard offsets (weighted_median's
    * shape) — one histogram shuffle, everything after shard-grid-sized.
    */
  private def pairNumer2(hist: DataFrame): DataFrame = {
    val hist0 = hist.localCheckpoint(eager = false) // bounds + shards
    val bounds = hist0.agg(
      min(col("score")).as("lo"), max(col("score")).as("hi"))
      .select(
        col("lo"), expr(s"(hi - lo) div $Shards + 1").as("wd"))
    val h = hist0
      .crossJoin(broadcast(bounds)) // 1-row bounds: documented exception
      .withColumn("shard", expr("(score - lo) div wd"))
      .localCheckpoint(eager = false) // shard totals + ranked join
    val shardTot = h.groupBy(col("shard"))
      .agg(sum(col("n_neg")).as("tot"))
      .localCheckpoint(eager = false) // both sides of the offsets join
    val offsets = shardTot
      .join(
        broadcast(shardTot.toDF("s2", "t2")),
        col("s2") < col("shard"), "left")
      .groupBy(col("shard"))
      .agg(coalesce(sum(col("t2")), lit(0L)).as("neg_off"))
    val wsh = Window.partitionBy(col("shard")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h.join(broadcast(offsets), Seq("shard"))
      .withColumn(
        "neg_below",
        sum(col("n_neg")).over(wsh) - col("n_neg") + col("neg_off"))
      .agg(
        sum(col("n_pos")).as("n_pos"),
        sum(col("n_neg")).as("n_neg"),
        sum(col("n_pos") * (col("neg_below") * 2 + col("n_neg")))
          .as("numer2"))
  }

  /** The oracle's version — DuckDB runs one plain window over the
    * bounded histogram (the oracle need not shard).
    */
  private def pairNumer2Sql(histCte: String): String =
    s"""c AS (
       |  SELECT score, n_pos, n_neg,
       |    COALESCE(SUM(n_neg) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) neg_below
       |  FROM $histCte),
       |agg AS (
       |  SELECT CAST(SUM(n_pos) AS BIGINT) n_pos,
       |    CAST(SUM(n_neg) AS BIGINT) n_neg,
       |    CAST(SUM(n_pos * (neg_below * 2 + n_neg)) AS BIGINT) numer2
       |  FROM c)""".stripMargin

  /** `auc_roc`: EXACT area under the ROC curve of the quality scorer
    * against the lang='en' label — the first number a classifier
    * audit publishes. Computed by midrank pair counting over the
    * score-grain histogram (AUC = P(score⁺ > score⁻) + ½·P(tie); the
    * trapezoid identity), never by materializing a ranked list:
    * auc_ppm = numer2 · 500000 div (n_pos·n_neg), gini = 2·AUC − 1.
    *
    * Scale: one doc-grain scan → score-grain histogram (bounded
    * domain) → sharded prefix sums. int64 headroom: n_pos·n_neg·10⁶
    * caps the formula at ~3M docs per class — an EVAL SLICE bound,
    * not a corpus bound (AUC audits run on held-out samples; at 100
    * TB the slice is sampled first, per train_split's content-hash
    * rule). Overflow would fail loudly under ANSI, not drift.
    */
  def aucRoc(spark: SparkSession, dir: String): DataFrame =
    pairNumer2(scoreHist(spark, dir))
      .select(
        col("n_pos"), col("n_neg"),
        expr("numer2 * 500000 div (n_pos * n_neg)").as("auc_ppm"))
      .withColumn("gini_ppm", col("auc_ppm") * 2 - 1000000L)

  def aucRocOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |$HistSql,
       |${pairNumer2Sql("h")}
       |SELECT n_pos, n_neg,
       |  numer2 * 500000 // (n_pos * n_neg) AS auc_ppm,
       |  (numer2 * 500000 // (n_pos * n_neg)) * 2 - 1000000 AS gini_ppm
       |FROM agg""".stripMargin

  /** `mannwhitney_u`: the two-sample rank test on ORDER VALUES — do
    * BUILDING-segment customers place larger orders than MACHINERY?
    * Same midrank machinery as [[aucRoc]] but over the cent-exact
    * order-price histogram of the two segments (price-grain is
    * fact-sized, hence the same $10-shard prefix sums as
    * weighted_median). Emits 2U (integer — ties count ½ pair) and the
    * rank-biserial effect size r = 2U/(n1·n2) − 1 in ppm (the
    * directional readout; the z-test adds nothing the suite's
    * bootstrap_ci doesn't already pin). Sign-split division per the
    * suite convention — belt-and-suspenders here, not required:
    * DuckDB's integer `//` truncates toward zero on int operands
    * (verified: -9846//4 = -2461, matching Spark `div`; see
    * holt_linear's note), so the split only guards against a future
    * operand drifting to DOUBLE, where `//` floors.
    */
  def mannwhitneyU(spark: SparkSession, dir: String): DataFrame = {
    val seg = broadcast(
      Tables.read(spark, dir, "customer")
        .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING")
          .cast("long").as("pos")))
    val hist = Tables.read(spark, dir, "orders")
      .join(seg, col("o_custkey") === col("c_custkey"))
      .select(Quantize.cents(col("o_totalprice")).as("score"), col("pos"))
      .groupBy(col("score"))
      .agg(
        sum(col("pos")).as("n_pos"),
        (count(lit(1)) - sum(col("pos"))).as("n_neg"))
    pairNumer2(hist)
      .select(
        col("n_pos").as("n_building"),
        col("n_neg").as("n_machinery"),
        col("numer2").as("u2"),
        expr("""CASE WHEN numer2 - n_pos * n_neg < 0
          THEN -((n_pos * n_neg - numer2) * 1000000
                 div (n_pos * n_neg))
          ELSE (numer2 - n_pos * n_neg) * 1000000
               div (n_pos * n_neg) END""").as("rank_biserial_ppm"))
  }

  def mannwhitneyUOracle: String =
    s"""WITH seg AS (
       |  SELECT c_custkey,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END pos
       |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
       |h AS (
       |  SELECT ${Quantize.centsSql("o_totalprice")} score,
       |    CAST(SUM(pos) AS BIGINT) n_pos,
       |    CAST(SUM(1 - pos) AS BIGINT) n_neg
       |  FROM orders JOIN seg ON o_custkey = c_custkey
       |  GROUP BY 1),
       |${pairNumer2Sql("h")}
       |SELECT n_pos AS n_building, n_neg AS n_machinery, numer2 AS u2,
       |  CASE WHEN numer2 - n_pos * n_neg < 0
       |    THEN -((n_pos * n_neg - numer2) * 1000000 // (n_pos * n_neg))
       |    ELSE (numer2 - n_pos * n_neg) * 1000000 // (n_pos * n_neg)
       |  END rank_biserial_ppm
       |FROM agg""".stripMargin

  /** Clamp of the raw score onto a [0, 10⁶] ppm "probability": the
    * monotone calibration map the reliability diagram grades. Shared
    * by calibration_bins and pr_curve.
    */
  private def pPpm(score: Column): Column =
    least(greatest(score, lit(0L)), lit(1000L)) * 1000L

  private val PPpmSql = "least(greatest(score, 0), 1000) * 1000"

  /** `isotonic_calibration`: the monotone (PAVA) recalibration of the
    * quality scorer — [[calibrationBins]] MEASURES the miscalibration
    * (ECE); this emits the isotonic FIT that corrects it, via the
    * closed-form minimax identity ŷᵢ = max_{j≤i} min_{k≥i}
    * avg(y_j..y_k) (weighted) instead of the sequential pool-adjacent
    * algorithm — the identity turns an inherently iterative fit into
    * three bounded grid aggregates both engines state identically.
    * Segment averages floor to ppm BEFORE the minimax (the quantized
    * semantics ARE the pinned semantics, the pacf_lags discipline);
    * monotonicity of the output is structural (max over a growing j
    * set of min over a shrinking k set) and re-pinned in Wave20Spec.
    *
    * Plan shape: the 10-bin grid from one corpus scan; a ≤55-row
    * (j,k) segment grid and a ≤550-row minimax join — all broadcast
    * bounded grids. Scan-bound at any scale.
    */
  def isotonicCalibration(spark: SparkSession, dir: String): DataFrame = {
    val bins = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(
        pPpm(col("score")).as("p"),
        (col("lang") === "en").cast("long").as("pos"))
      .withColumn("bin", least(expr("p div 100000"), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
      .localCheckpoint(eager = false) // segment grid + output join
    val seg = bins.select(col("bin").as("j"))
      .crossJoin(broadcast(bins.select(col("bin").as("k"))))
      .where(col("j") <= col("k")) // bounded ≤55-pair grid
      .join(
        broadcast(bins),
        col("bin") >= col("j") && col("bin") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(expr("sum(npos) * 1000000 div sum(n)").as("a_jk"))
    val fit = bins.select(col("bin").as("i"))
      .crossJoin(broadcast(seg)) // bounded ≤550-row minimax grid
      .where(col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(min(col("a_jk")).as("m"))
      .groupBy(col("i"))
      .agg(max(col("m")).as("iso_ppm"))
    bins
      .join(fit, col("bin") === col("i"))
      .select(
        col("bin"), col("n"), col("npos"),
        expr("npos * 1000000 div n").as("raw_ppm"),
        col("iso_ppm"))
      .orderBy("bin")
  }

  def isotonicCalibrationOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |p AS (
       |  SELECT $PPpmSql p,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END pos
       |  FROM qscore),
       |b AS (
       |  SELECT least(p // 100000, 9) bin, CAST(count(*) AS BIGINT) n,
       |    CAST(SUM(pos) AS BIGINT) npos
       |  FROM p GROUP BY 1),
       |seg AS (
       |  SELECT j.bin j, k.bin k,
       |    CAST(SUM(x.npos) AS BIGINT) * 1000000
       |      // CAST(SUM(x.n) AS BIGINT) a_jk
       |  FROM b j, b k, b x
       |  WHERE j.bin <= k.bin AND x.bin BETWEEN j.bin AND k.bin
       |  GROUP BY 1, 2),
       |mm AS (
       |  SELECT i.bin i, seg.j, MIN(seg.a_jk) m
       |  FROM b i JOIN seg ON seg.j <= i.bin AND seg.k >= i.bin
       |  GROUP BY 1, 2),
       |fit AS (SELECT i, CAST(MAX(m) AS BIGINT) iso_ppm FROM mm GROUP BY 1)
       |SELECT bin, n, npos, npos * 1000000 // n raw_ppm, iso_ppm
       |FROM b JOIN fit ON fit.i = b.bin
       |ORDER BY bin""".stripMargin

  /** `calibration_bins`: the reliability diagram + expected
    * calibration error of the quality scorer read as a probability —
    * per confidence decile: n, mean claimed confidence (ppm), and the
    * observed positive rate (ppm); plus a `zz_overall` ECE row
    * (Σ n_b·|conf_b − acc_b| div N — the standard weighted-absolute
    * gap, integer because both terms are ppm ints) following the
    * classifier_eval summary-inside-the-hash convention (bin = 10
    * marks it — one past the 0..9 deciles, so the bin sort key puts
    * the summary row last).
    *
    * Scale: doc-grain scan → 10-row bin grid. Zero joins.
    */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val bins = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(
        pPpm(col("score")).as("p"),
        (col("lang") === "en").cast("long").as("pos"))
      .withColumn("bin", least(expr("p div 100000"), lit(9L)))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("p")).as("psum"),
        sum(col("pos")).as("npos"))
      .select(
        col("bin"), col("n"),
        expr("psum div n").as("conf_ppm"),
        expr("npos * 1000000 div n").as("pos_ppm"))
      .localCheckpoint(eager = false) // per-bin rows + the ECE fold
    val ece = bins.agg(
      sum(col("n")).as("ntot"),
      sum(col("n") * abs(col("conf_ppm") - col("pos_ppm"))).as("gap"))
      .select(
        lit(10L).as("bin"), col("ntot").as("n"),
        lit(null).cast("long").as("conf_ppm"),
        expr("gap div ntot").as("pos_ppm")) // ECE rides the pos_ppm slot
    bins.unionByName(ece).orderBy("bin")
  }

  def calibrationBinsOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |p AS (
       |  SELECT $PPpmSql p,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END pos
       |  FROM qscore),
       |b AS (
       |  SELECT least(p // 100000, 9) bin, CAST(count(*) AS BIGINT) n,
       |    CAST(SUM(p) AS BIGINT) psum, CAST(SUM(pos) AS BIGINT) npos
       |  FROM p GROUP BY 1),
       |pb AS (
       |  SELECT bin, n, psum // n conf_ppm, npos * 1000000 // n pos_ppm
       |  FROM b),
       |ece AS (
       |  SELECT CAST(10 AS BIGINT) bin, CAST(SUM(n) AS BIGINT) n,
       |    CAST(NULL AS BIGINT) conf_ppm,
       |    CAST(SUM(n * abs(conf_ppm - pos_ppm)) // SUM(n) AS BIGINT) pos_ppm
       |  FROM pb)
       |SELECT bin, n, conf_ppm, pos_ppm FROM pb
       |UNION ALL SELECT bin, n, conf_ppm, pos_ppm FROM ece
       |ORDER BY bin""".stripMargin

  /** `pr_curve`: precision/recall/F1 at the ten pinned operating
    * points t ∈ {0, 100k, …, 900k} ppm — the threshold sweep that
    * picks a production keep-gate (quality_classifier pins ONE
    * threshold; this publishes the whole knob). Computed from the
    * p-grain histogram joined against the broadcast 10-row threshold
    * grid — never ten passes over the corpus. NULL precision when a
    * threshold predicts nothing, per the suite's 0-denominator
    * convention.
    */
  def prCurve(spark: SparkSession, dir: String): DataFrame = {
    val hist = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(
        pPpm(col("score")).as("p"),
        (col("lang") === "en").cast("long").as("pos"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("npos"))
      .localCheckpoint(eager = false) // grid join + the P total
    val totPos = hist.agg(sum(col("npos")).as("tot_pos"))
    val grid = spark.range(0, 10)
      .select((col("id") * 100000L).as("threshold_ppm"))
    hist
      .join(broadcast(grid), col("p") >= col("threshold_ppm"))
      .groupBy(col("threshold_ppm"))
      .agg(sum(col("n")).as("n_pred"), sum(col("npos")).as("tp"))
      .crossJoin(broadcast(totPos)) // 1-row total: documented exception
      .select(
        col("threshold_ppm"), col("n_pred"), col("tp"),
        expr("CASE WHEN n_pred = 0 THEN NULL " +
          "ELSE tp * 1000000 div n_pred END").as("precision_ppm"),
        expr("CASE WHEN tot_pos = 0 THEN NULL " +
          "ELSE tp * 1000000 div tot_pos END").as("recall_ppm"),
        expr("CASE WHEN tp + n_pred + tot_pos = 0 THEN NULL " +
          "ELSE 2 * tp * 1000000 div (n_pred + tot_pos) END").as("f1_ppm"))
      .orderBy("threshold_ppm")
  }

  def prCurveOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |ph AS (
       |  SELECT $PPpmSql p, CAST(count(*) AS BIGINT) n,
       |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) npos
       |  FROM qscore GROUP BY 1),
       |tot AS (SELECT CAST(SUM(npos) AS BIGINT) tot_pos FROM ph),
       |grid AS (SELECT CAST(range * 100000 AS BIGINT) threshold_ppm
       |  FROM range(0, 10)),
       |sw AS (
       |  SELECT threshold_ppm, CAST(SUM(n) AS BIGINT) n_pred,
       |    CAST(SUM(npos) AS BIGINT) tp
       |  FROM ph JOIN grid ON p >= threshold_ppm
       |  GROUP BY 1)
       |SELECT threshold_ppm, n_pred, tp,
       |  CASE WHEN n_pred = 0 THEN NULL
       |    ELSE tp * 1000000 // n_pred END precision_ppm,
       |  CASE WHEN tot_pos = 0 THEN NULL
       |    ELSE tp * 1000000 // tot_pos END recall_ppm,
       |  CASE WHEN tp + n_pred + tot_pos = 0 THEN NULL
       |    ELSE 2 * tp * 1000000 // (n_pred + tot_pos) END f1_ppm
       |FROM sw CROSS JOIN tot
       |ORDER BY threshold_ppm""".stripMargin

  /** `cohens_kappa`: chance-corrected agreement of the langid
    * detector with the labeled `lang` column — the scalar that tells
    * an annotation pipeline whether its classifier beats the marginal
    * base rates that raw accuracy hides. Cross-multiplied to stay
    * integer: po = diag/N, pe = Σ_k n_true_k·n_pred_k / N², so
    * kappa_ppm = (diag·N − Σ n_true·n_pred)·10⁶ div (N² − Σ…), with
    * the suite's sign-split floor (κ < 0 = worse than chance) and a
    * NULL when pe = 1 (degenerate single-class matrix).
    *
    * Scale: everything after [[TextAnalysis.textLangid]]'s one corpus
    * aggregate is arithmetic over the ≤|langs|² confusion grid. int64
    * headroom: N²·10⁶ caps the formula at ~3M docs — the same EVAL
    * SLICE bound as [[aucRoc]] (kappa audits run on labeled held-out
    * samples, not the raw corpus); overflow fails loudly under ANSI.
    */
  def cohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val cm = TextAnalysis.textLangid(spark, dir)
      .localCheckpoint(eager = false) // margins + diagonal share it
    val byTrue = cm.groupBy(col("lang")).agg(sum(col("n")).as("n_true"))
    val byPred = cm.groupBy(col("predicted").as("lang"))
      .agg(sum(col("n")).as("n_pred"))
    val pe = byTrue.join(byPred, Seq("lang"), "full_outer")
      .agg(sum(
        coalesce(col("n_true"), lit(0L)) * coalesce(col("n_pred"), lit(0L)))
        .as("pe_num"))
    cm.agg(
      sum(col("n")).as("n"),
      sum(when(col("predicted") === col("lang"), col("n"))
        .otherwise(lit(0L))).as("diag"))
      .crossJoin(broadcast(pe)) // 1-row totals: documented exception
      .select(
        col("n"),
        expr("diag * 1000000 div n").as("po_ppm"),
        expr("pe_num * 1000000 div (n * n)").as("pe_ppm"),
        expr("""CASE WHEN n * n = pe_num THEN NULL
          WHEN diag * n - pe_num < 0
            THEN -((pe_num - diag * n) * 1000000 div (n * n - pe_num))
          ELSE (diag * n - pe_num) * 1000000 div (n * n - pe_num)
          END""").as("kappa_ppm"))
  }

  def cohensKappaOracle: String =
    s"""WITH ${TextAnalysis.LangidPredCtes},
       |cm AS (
       |  SELECT lang, predicted, CAST(COUNT(*) AS BIGINT) n
       |  FROM lpred GROUP BY 1, 2),
       |bt AS (SELECT lang, CAST(SUM(n) AS BIGINT) n_true FROM cm GROUP BY 1),
       |bp AS (SELECT predicted AS lang, CAST(SUM(n) AS BIGINT) n_pred
       |  FROM cm GROUP BY 1),
       |pe AS (
       |  SELECT CAST(SUM(COALESCE(n_true, 0) * COALESCE(n_pred, 0)) AS BIGINT) pe_num
       |  FROM bt FULL OUTER JOIN bp ON bt.lang = bp.lang),
       |ov AS (
       |  SELECT CAST(SUM(n) AS BIGINT) n,
       |    CAST(SUM(CASE WHEN predicted = lang THEN n ELSE 0 END) AS BIGINT) diag
       |  FROM cm)
       |SELECT n, diag * 1000000 // n po_ppm,
       |  pe_num * 1000000 // (n * n) pe_ppm,
       |  CASE WHEN n * n = pe_num THEN NULL
       |    WHEN diag * n - pe_num < 0
       |      THEN -((pe_num - diag * n) * 1000000 // (n * n - pe_num))
       |    ELSE (diag * n - pe_num) * 1000000 // (n * n - pe_num)
       |  END kappa_ppm
       |FROM ov CROSS JOIN pe""".stripMargin

  /** `mcnemar_test`: the PAIRED comparison of the suite's two
    * 'is-this-English' detectors on the same documents — langid's
    * marker argmax ([[TextAnalysis.langidPredictions]]) vs the quality
    * gate read as an English detector (score ≥ 800, the
    * quality_classifier keep threshold; its stopword feature is
    * English-biased by construction). McNemar looks ONLY at the
    * discordant counts — n10 (langid right, gate wrong) vs n01 (gate
    * right, langid wrong) — which is the correct test when both
    * classifiers saw the same rows; two independent accuracy numbers
    * would double-count the easy documents. Emits the 2×2 agreement
    * table and χ² = (n10−n01)²/(n10+n01) in milli (integer-exact;
    * NULL when no discordant pairs, per the 0-denominator convention).
    * No continuity correction — the reader compares against 3.84
    * (χ²₁ at 5%) either way, and keeping the statistic a pure count
    * identity keeps it hash-exact.
    *
    * Plan: two doc-grain relations from the same source, inner-joined
    * co-partitioned on doc_id (the quality side drops empty docs, so
    * the pairing is the common subset — exactly what a paired test
    * requires), then ONE 1-row aggregate. At 100 TB: one co-partition
    * shuffle, map-side-combinable fold.
    */
  def mcnemarTest(spark: SparkSession, dir: String): DataFrame = {
    val a = TextAnalysis.langidPredictions(spark, dir)
      .select(
        col("doc_id"),
        (col("lang") === "en").cast("long").as("y"),
        (col("predicted") === "en").cast("long").as("pa"))
    val b = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("doc_id"), (col("score") >= 800).cast("long").as("pb"))
    a.join(b, Seq("doc_id"))
      .select(
        (col("pa") === col("y")).cast("long").as("a_ok"),
        (col("pb") === col("y")).cast("long").as("b_ok"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("a_ok") * col("b_ok")).as("n11"),
        sum(col("a_ok") * (lit(1L) - col("b_ok"))).as("n10"),
        sum((lit(1L) - col("a_ok")) * col("b_ok")).as("n01"),
        sum((lit(1L) - col("a_ok")) * (lit(1L) - col("b_ok"))).as("n00"))
      .select(
        col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
        expr("""CASE WHEN n10 + n01 = 0 THEN NULL
          ELSE (n10 - n01) * (n10 - n01) * 1000 div (n10 + n01)
          END""").as("chi2_milli"))
  }

  def mcnemarTestOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |${TextAnalysis.LangidPredCtes},
       |p AS (
       |  SELECT
       |    CASE WHEN (l.predicted = 'en') = (l.lang = 'en')
       |      THEN 1 ELSE 0 END a_ok,
       |    CASE WHEN (q.score >= 800) = (l.lang = 'en')
       |      THEN 1 ELSE 0 END b_ok
       |  FROM lpred l JOIN qscore q ON l.doc_id = q.doc_id),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n,
       |    CAST(SUM(a_ok * b_ok) AS BIGINT) n11,
       |    CAST(SUM(a_ok * (1 - b_ok)) AS BIGINT) n10,
       |    CAST(SUM((1 - a_ok) * b_ok) AS BIGINT) n01,
       |    CAST(SUM((1 - a_ok) * (1 - b_ok)) AS BIGINT) n00
       |  FROM p)
       |SELECT n, n11, n10, n01, n00,
       |  CASE WHEN n10 + n01 = 0 THEN NULL
       |    ELSE (n10 - n01) * (n10 - n01) * 1000 // (n10 + n01)
       |  END chi2_milli
       |FROM agg""".stripMargin

  /** `brier_score`: the squared-error companion to
    * [[calibrationBins]] — mean (p − y)² of the clamped ppm
    * "probability" against the lang='en' label, plus the base-rate
    * Brier r(1−r) it must beat and the resulting skill score
    * 1 − brier/base (negative = the scorer is WORSE than predicting
    * the prevalence; sign-split floor per the suite convention).
    * Where ECE grades the calibration MAP, Brier grades calibration
    * AND discrimination in one number — a gate can be well-calibrated
    * and useless, and this is the readout that says so.
    *
    * Scale: one doc-grain scan, ONE 1-row aggregate; zero joins.
    * int64 headroom: Σ(p−y)² ≤ N·10¹² and n_pos·n_neg·10⁶ — the same
    * ~3M-doc EVAL SLICE bound as [[aucRoc]], loud under ANSI.
    */
  def brierScore(spark: SparkSession, dir: String): DataFrame =
    TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(
        pPpm(col("score")).as("p"),
        (col("lang") === "en").cast("long").as("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("pos")).as("n_pos"),
        sum((col("p") - col("pos") * 1000000L) *
          (col("p") - col("pos") * 1000000L)).as("sq"))
      .select(
        col("n"), col("n_pos"),
        expr("sq div (n * 1000000)").as("brier_ppm"),
        expr("n_pos * (n - n_pos) * 1000000 div (n * n)").as("base_ppm"))
      .select(
        col("n"), col("n_pos"), col("brier_ppm"), col("base_ppm"),
        expr("""CASE WHEN base_ppm = 0 THEN NULL
          WHEN base_ppm - brier_ppm < 0
            THEN -((brier_ppm - base_ppm) * 1000000 div base_ppm)
          ELSE (base_ppm - brier_ppm) * 1000000 div base_ppm
          END""").as("skill_ppm"))

  def brierScoreOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |p AS (
       |  SELECT $PPpmSql p,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END pos
       |  FROM qscore),
       |a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(pos) AS BIGINT) n_pos,
       |    CAST(SUM((p - pos * 1000000) * (p - pos * 1000000)) AS BIGINT) sq
       |  FROM p),
       |b AS (
       |  SELECT n, n_pos,
       |    sq // (n * 1000000) brier_ppm,
       |    n_pos * (n - n_pos) * 1000000 // (n * n) base_ppm
       |  FROM a)
       |SELECT n, n_pos, brier_ppm, base_ppm,
       |  CASE WHEN base_ppm = 0 THEN NULL
       |    WHEN base_ppm - brier_ppm < 0
       |      THEN -((brier_ppm - base_ppm) * 1000000 // base_ppm)
       |    ELSE (base_ppm - brier_ppm) * 1000000 // base_ppm
       |  END skill_ppm
       |FROM b""".stripMargin

  /** `cumulative_gains`: the decile capture curve — rank documents by
    * quality score DESCENDING, and at each population decile read off
    * what share of all positives the top d/10 captures, plus the lift
    * over random targeting. The marketing twin of [[aucRoc]]: AUC says
    * "0.74", gains says "the top 20% of the ranking holds 55% of the
    * English docs" — the number a curation budget is actually set by.
    * [[Analytics.lorenzDeciles]]'s selection rule mirrored downward:
    * decile row d = the last score row where cum-population ≤ d·n/10
    * (cross-multiplied, no interpolation, scale-invariant).
    *
    * Plan: [[scoreHist]]'s one corpus aggregate, then the
    * weighted_median sharded prefix sums over the bounded score
    * domain in DESCENDING direction (per-shard windows + triangular
    * cross-shard offsets from the shards ABOVE), decile selection as
    * a 10-way conditional aggregate. int64: cpos·n·10⁶ — the ~3M
    * EVAL SLICE bound again, loud under ANSI.
    */
  def cumulativeGains(spark: SparkSession, dir: String): DataFrame = {
    val hist0 = scoreHist(spark, dir)
      .withColumn("c", col("n_pos") + col("n_neg"))
      .localCheckpoint(eager = false) // bounds + the sharded relation
    val bounds = hist0.agg(
      min(col("score")).as("lo"), max(col("score")).as("hi"))
      .select(col("lo"), expr(s"(hi - lo) div $Shards + 1").as("wd"))
    val hist = hist0
      .crossJoin(broadcast(bounds)) // 1-row bounds: documented exception
      .withColumn("shard", expr("(score - lo) div wd"))
      .localCheckpoint(eager = false) // totals + shard sums + window
    val tot = hist.agg(
      sum(col("c")).as("n"), sum(col("n_pos")).as("tot_pos"))
    val shardTot = hist.groupBy(col("shard"))
      .agg(sum(col("c")).as("tc"), sum(col("n_pos")).as("tp"))
      .localCheckpoint(eager = false) // both sides of the offsets join
    val offsets = shardTot.as("a")
      .join(
        broadcast(shardTot.as("b")), col("b.shard") > col("a.shard"), "left")
      .groupBy(col("a.shard").as("shard"))
      .agg(
        coalesce(sum(col("b.tc")), lit(0L)).as("offc"),
        coalesce(sum(col("b.tp")), lit(0L)).as("offp"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cin", sum(col("c")).over(wIn))
      .withColumn("pin", sum(col("n_pos")).over(wIn))
      .join(broadcast(offsets), Seq("shard"))
      .select(
        (col("offc") + col("cin")).as("cpop"),
        (col("offp") + col("pin")).as("cpos"))
      .crossJoin(broadcast(tot)) // 1-row totals: documented exception
    val decile = explode(array((1L to 10L).map(lit(_)): _*)).as("decile")
    cum
      .select(col("cpop"), col("cpos"), col("n"), col("tot_pos"), decile)
      .where(col("cpop") * 10 <= col("n") * col("decile"))
      .groupBy(col("decile"))
      .agg(
        max(col("cpop")).as("mp"), max(col("cpos")).as("mpos"),
        max(col("n")).as("n"), max(col("tot_pos")).as("tot_pos"))
      .select(
        col("decile"),
        expr("mp * 1000000 div n").as("cum_pop_ppm"),
        expr("CASE WHEN tot_pos = 0 THEN NULL " +
          "ELSE mpos * 1000000 div tot_pos END").as("capture_ppm"),
        expr("CASE WHEN mp * tot_pos = 0 THEN NULL " +
          "ELSE mpos * n * 1000000 div (mp * tot_pos) END").as("lift_ppm"))
      .orderBy("decile")
  }

  def cumulativeGainsOracle: String =
    s"""WITH ${TrainingPipeline.QualityScoreCtes},
       |$HistSql,
       |hc AS (SELECT score, n_pos, n_pos + n_neg c FROM h),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) n,
       |    CAST(SUM(n_pos) AS BIGINT) tot_pos FROM hc),
       |cum AS (
       |  SELECT CAST(SUM(c) OVER (ORDER BY score DESC) AS BIGINT) cpop,
       |    CAST(SUM(n_pos) OVER (ORDER BY score DESC) AS BIGINT) cpos
       |  FROM hc),
       |d AS (SELECT CAST(unnest(range(1, 11)) AS BIGINT) decile)
       |SELECT decile,
       |  CAST(MAX(cpop) AS BIGINT) * 1000000 // n cum_pop_ppm,
       |  CASE WHEN tot_pos = 0 THEN NULL
       |    ELSE CAST(MAX(cpos) AS BIGINT) * 1000000 // tot_pos
       |  END capture_ppm,
       |  CASE WHEN MAX(cpop) * tot_pos = 0 THEN NULL
       |    ELSE CAST(MAX(cpos) AS BIGINT) * n * 1000000
       |         // (CAST(MAX(cpop) AS BIGINT) * tot_pos)
       |  END lift_ppm
       |FROM cum, d, tot
       |WHERE cpop * 10 <= n * decile
       |GROUP BY decile, n, tot_pos ORDER BY decile""".stripMargin

  /** `log_rank_test`: the two-cohort comparison of the
    * time-to-conversion survival curves — the A/B readout for
    * "does arm B convert FASTER", which the mean-difference `ab_test`
    * cannot see (censored users have no mean). Arms are the suite's
    * canonical content-hash split (md5-bucket of user_id, the
    * train_split/ab_test rule); durations and censoring are
    * [[SqlSurface.survivalLabels]] verbatim, so this and `survival_km`
    * can never disagree on the clock. At each duration hour with
    * pooled events: expected arm-1 events e1 = d·n1/(n1+n2) floored
    * to MILLI per term (pinned semantics — the floor is part of the
    * statistic's definition here), observed vs expected summed over
    * event hours only (censor-only hours carry no log-rank signal),
    * and the χ²₁ approximation (O−E)²/E₁ + (O−E)²/E₂ in milli
    * (compare against 3.841; NULL when an arm's expectation is zero).
    *
    * Plan: one fact shuffle (user grain) → bounded hour grid with
    * BOTH arms' d/c in one aggregate → the triangular broadcast
    * self-join for both at-risk prefixes at once → a 1-row fold.
    * int64: (O·10³)² caps O at ~3M converting users per arm — the
    * eval-slice convention, loud under ANSI.
    */
  def logRankTest(spark: SparkSession, dir: String): DataFrame = {
    val lab = SqlSurface.survivalLabels(spark, dir)
      .withColumn("arm", ContentHash.bucket(col("user_id"), 2))
    val dg = lab.groupBy(col("t"))
      .agg(
        sum(when(col("arm") === 0, col("ev")).otherwise(lit(0L))).as("d1"),
        sum(when(col("arm") === 0, lit(1L) - col("ev")).otherwise(lit(0L)))
          .as("c1"),
        sum(when(col("arm") === 1, col("ev")).otherwise(lit(0L))).as("d2"),
        sum(when(col("arm") === 1, lit(1L) - col("ev")).otherwise(lit(0L)))
          .as("c2"))
      .localCheckpoint(eager = false) // totals + triangular join reuse
    val tot = dg.agg(
      sum(col("d1") + col("c1")).as("n1tot"),
      sum(col("d2") + col("c2")).as("n2tot"))
    val atRisk = dg.as("a")
      .join(
        broadcast(dg.select(
          col("t").as("t2"),
          (col("d1") + col("c1")).as("rm1"),
          (col("d2") + col("c2")).as("rm2"))),
        col("t2") < col("a.t"), "left")
      .groupBy(col("a.t").as("t"), col("a.d1").as("d1"), col("a.d2").as("d2"))
      .agg(
        coalesce(sum(col("rm1")), lit(0L)).as("rb1"),
        coalesce(sum(col("rm2")), lit(0L)).as("rb2"))
      .crossJoin(broadcast(tot)) // 1-row totals: documented exception
      .select(
        col("t"), col("d1"), col("d2"),
        (col("n1tot") - col("rb1")).as("n1"),
        (col("n2tot") - col("rb2")).as("n2"))
    atRisk
      .where(col("d1") + col("d2") > 0)
      .agg(
        sum(col("d1")).as("o1"),
        sum(col("d2")).as("o2"),
        sum(expr("(d1 + d2) * n1 * 1000 div (n1 + n2)")).as("e1_milli"),
        sum(expr("(d1 + d2) * n2 * 1000 div (n1 + n2)")).as("e2_milli"))
      .select(
        col("o1"), col("e1_milli"), col("o2"), col("e2_milli"),
        expr("""CASE WHEN e1_milli = 0 OR e2_milli = 0 THEN NULL
          ELSE (o1 * 1000 - e1_milli) * (o1 * 1000 - e1_milli) div e1_milli
             + (o2 * 1000 - e2_milli) * (o2 * 1000 - e2_milli) div e2_milli
          END""").as("chi2_milli"))
  }

  def logRankTestOracle: String =
    s"""WITH ${SqlSurface.SurvivalLabelCtes},
       |al AS (
       |  SELECT t, ev, ${ContentHash.bucketSql("user_id", 2)} arm
       |  FROM svlab),
       |dg AS (
       |  SELECT CAST(t AS BIGINT) t,
       |    CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT) d1,
       |    CAST(SUM(CASE WHEN arm = 0 THEN 1 - ev ELSE 0 END) AS BIGINT) c1,
       |    CAST(SUM(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT) d2,
       |    CAST(SUM(CASE WHEN arm = 1 THEN 1 - ev ELSE 0 END) AS BIGINT) c2
       |  FROM al GROUP BY 1),
       |tot AS (
       |  SELECT CAST(SUM(d1 + c1) AS BIGINT) n1tot,
       |    CAST(SUM(d2 + c2) AS BIGINT) n2tot
       |  FROM dg),
       |ar AS (
       |  SELECT a.t, a.d1, a.d2,
       |    CAST(n1tot - COALESCE(SUM(b.d1 + b.c1), 0) AS BIGINT) n1,
       |    CAST(n2tot - COALESCE(SUM(b.d2 + b.c2), 0) AS BIGINT) n2
       |  FROM dg a CROSS JOIN tot LEFT JOIN dg b ON b.t < a.t
       |  GROUP BY a.t, a.d1, a.d2, n1tot, n2tot),
       |agg AS (
       |  SELECT CAST(SUM(d1) AS BIGINT) o1, CAST(SUM(d2) AS BIGINT) o2,
       |    CAST(SUM((d1 + d2) * n1 * 1000 // (n1 + n2)) AS BIGINT) e1_milli,
       |    CAST(SUM((d1 + d2) * n2 * 1000 // (n1 + n2)) AS BIGINT) e2_milli
       |  FROM ar WHERE d1 + d2 > 0)
       |SELECT o1, e1_milli, o2, e2_milli,
       |  CASE WHEN e1_milli = 0 OR e2_milli = 0 THEN NULL
       |    ELSE (o1 * 1000 - e1_milli) * (o1 * 1000 - e1_milli) // e1_milli
       |       + (o2 * 1000 - e2_milli) * (o2 * 1000 - e2_milli) // e2_milli
       |  END chi2_milli
       |FROM agg""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("auc_roc", aucRoc, Some(aucRocOracle)),
    QueryDef("mannwhitney_u", mannwhitneyU, Some(mannwhitneyUOracle)),
    QueryDef(
      "calibration_bins", calibrationBins, Some(calibrationBinsOracle)),
    QueryDef(
      "isotonic_calibration", isotonicCalibration,
      Some(isotonicCalibrationOracle)),
    QueryDef("pr_curve", prCurve, Some(prCurveOracle)),
    QueryDef("cohens_kappa", cohensKappa, Some(cohensKappaOracle)),
    QueryDef("mcnemar_test", mcnemarTest, Some(mcnemarTestOracle)),
    QueryDef("brier_score", brierScore, Some(brierScoreOracle)),
    QueryDef(
      "cumulative_gains", cumulativeGains, Some(cumulativeGainsOracle)),
    QueryDef("log_rank_test", logRankTest, Some(logRankTestOracle)))
}
