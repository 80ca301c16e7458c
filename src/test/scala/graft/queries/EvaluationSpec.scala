package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the evaluation battery: auc_roc / mannwhitney_u
  * replayed as brute-force pair counting in plain Scala, calibration
  * ECE and the pr_curve threshold sweep replayed doc-by-doc, the
  * pinned NDCG discount table re-derived from Math.log, and
  * ndcg_eval cross-checked against mrr_eval's best-rank on the shared
  * relevance labels. All on sf0.001.
  */
class EvaluationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val scored: Seq[(Long, String, Long)] =
    TrainingPipeline.qualityScoredDocs(spark, dir)
      .select("doc_id", "lang", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  /** Brute-force midrank pair count: Σ over (pos, neg) pairs of
    * 2·[s⁺ > s⁻] + 1·[tie].
    */
  private def bruteNumer2(pos: Seq[Long], neg: Seq[Long]): Long =
    (for { p <- pos; n <- neg } yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum

  test("auc_roc equals brute-force pair counting over all pos x neg") {
    val pos = scored.filter(_._2 == "en").map(_._3)
    val neg = scored.filter(_._2 != "en").map(_._3)
    val numer2 = bruteNumer2(pos, neg)
    val expectAuc = numer2 * 500000L / (pos.size.toLong * neg.size)
    val row = Evaluation.aucRoc(spark, dir).collect().head
    assert(row.getLong(0) === pos.size.toLong)
    assert(row.getLong(1) === neg.size.toLong)
    assert(row.getLong(2) === expectAuc)
    assert(row.getLong(3) === expectAuc * 2 - 1000000L)
  }

  test("mannwhitney_u equals brute-force pair counting on order prices") {
    val cust = Tables.read(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val prices = Tables.read(spark, dir, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS LONG)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = prices.collect {
      case (ck, p) if cust.get(ck).contains("BUILDING") => p
    }.toSeq
    val m = prices.collect {
      case (ck, p) if cust.get(ck).contains("MACHINERY") => p
    }.toSeq
    val u2 = bruteNumer2(b, m)
    val row = Evaluation.mannwhitneyU(spark, dir).collect().head
    assert(row.getLong(0) === b.size.toLong)
    assert(row.getLong(1) === m.size.toLong)
    assert(row.getLong(2) === u2)
    val d = u2 - b.size.toLong * m.size
    val rb =
      if (d < 0) -((-d) * 1000000L / (b.size.toLong * m.size))
      else d * 1000000L / (b.size.toLong * m.size)
    assert(row.getLong(3) === rb)
  }

  private def pPpm(score: Long): Long =
    math.min(math.max(score, 0L), 1000L) * 1000L

  test("calibration_bins ECE row equals a doc-by-doc replay") {
    val docs = scored.map { case (_, lang, s) =>
      (pPpm(s), if (lang == "en") 1L else 0L)
    }
    val byBin = docs.groupBy { case (p, _) => math.min(p / 100000L, 9L) }
    val model = byBin.map { case (bin, xs) =>
      val n = xs.size.toLong
      val conf = xs.map(_._1).sum / n
      val posR = xs.map(_._2).sum * 1000000L / n
      (bin, (n, conf, posR))
    }
    val rows = Evaluation.calibrationBins(spark, dir).collect()
    val (summary, perBin) = rows.partition(_.getLong(0) == 10L)
    perBin.foreach { r =>
      val (n, conf, posR) = model(r.getLong(0))
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === conf)
      assert(r.getLong(3) === posR)
    }
    assert(perBin.map(_.getLong(0)).toSet === model.keySet)
    val ntot = model.values.map(_._1).sum
    val ece = model.values.map { case (n, c, p) => n * math.abs(c - p) }
      .sum / ntot
    assert(summary.head.getLong(1) === ntot)
    assert(summary.head.isNullAt(2))
    assert(summary.head.getLong(3) === ece)
  }

  test("pr_curve equals a brute threshold sweep") {
    val docs = scored.map { case (_, lang, s) =>
      (pPpm(s), if (lang == "en") 1L else 0L)
    }
    val totPos = docs.map(_._2).sum
    val rows = Evaluation.prCurve(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq ===
      (0 until 10).map(_ * 100000L))
    rows.foreach { r =>
      val t = r.getLong(0)
      val kept = docs.filter(_._1 >= t)
      val tp = kept.map(_._2).sum
      assert(r.getLong(1) === kept.size.toLong)
      assert(r.getLong(2) === tp)
      assert(r.getLong(3) === tp * 1000000L / kept.size)
      assert(r.getLong(4) === tp * 1000000L / totPos)
      assert(r.getLong(5) === 2L * tp * 1000000L / (kept.size + totPos))
    }
  }

  test("NDCG discount table equals floor(1e6 / log2(1 + r))") {
    val w = (1 to 10).map(r =>
      math.floor(1000000.0 / (math.log(1.0 + r) / math.log(2.0))).toLong)
    assert(w === Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L))
  }

  test("ndcg_eval is consistent with mrr_eval on the shared labels") {
    val mrr = TextAnalysis.mrrEval(spark, dir).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    val ndcg = TextAnalysis.ndcgEval(spark, dir).collect()
    assert(ndcg.map(_.getLong(0)).toSet === mrr.keySet)
    val wTable = Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    ndcg.foreach { r =>
      val (nRel, bestRank) = mrr(r.getLong(0))
      assert(r.getLong(1) === nRel)
      val idcg = wTable.take(math.min(nRel, 10L).toInt).sum
      assert(r.getLong(4) === idcg)
      assert(r.getLong(5) === r.getLong(3) * 1000000L / idcg)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
      bestRank match {
        case Some(br) if br <= 10 =>
          // the best-ranked relevant doc is inside the DCG window, so
          // dcg must include at least its discount weight
          assert(r.getLong(2) >= 1L)
          assert(r.getLong(3) >= wTable(br.toInt - 1))
        case _ =>
          // best relevant outside top-10 (or unscored): nothing in
          // the window
          assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
      }
    }
  }
}
