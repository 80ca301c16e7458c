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

  /** Score shards of width 1000 for the prefix-sum discipline: the
    * score domain spans a few tens of thousands of integer values, so
    * the shard grid is ~40 rows at any corpus size.
    */
  private val ScoreShard = 1000L

  /** Midrank pair-counting numerator shared by [[aucRoc]] and
    * [[mannwhitneyU]]: for a (value, n_pos, n_neg) histogram,
    * numer2 = Σ_v n_pos(v)·(2·NegBelow(v) + n_neg(v)) — twice the
    * Mann-Whitney U of the positive sample (ties counted ½, hence the
    * ×2 to stay integer). NegBelow comes from a per-shard running sum
    * plus broadcast triangular cross-shard offsets (weighted_median's
    * shape) — one histogram shuffle, everything after shard-grid-sized.
    */
  private def pairNumer2(hist: DataFrame): DataFrame = {
    val h = hist.withColumn("shard", expr(s"score div $ScoreShard"))
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
    * bootstrap_ci doesn't already pin). Sign-split floor division per
    * the suite convention (Spark `div` truncates, DuckDB `//` floors
    * — they only agree on non-negatives).
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

  /** `calibration_bins`: the reliability diagram + expected
    * calibration error of the quality scorer read as a probability —
    * per confidence decile: n, mean claimed confidence (ppm), and the
    * observed positive rate (ppm); plus a `zz_overall` ECE row
    * (Σ n_b·|conf_b − acc_b| div N — the standard weighted-absolute
    * gap, integer because both terms are ppm ints) following the
    * classifier_eval summary-inside-the-hash convention (bin = -1
    * marks it; the bin column is the sort key so it sorts last via
    * bin 10).
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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("auc_roc", aucRoc, Some(aucRocOracle)),
    QueryDef("mannwhitney_u", mannwhitneyU, Some(mannwhitneyUOracle)),
    QueryDef(
      "calibration_bins", calibrationBins, Some(calibrationBinsOracle)),
    QueryDef("pr_curve", prCurve, Some(prCurveOracle)))
}
