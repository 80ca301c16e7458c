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

  test("cohens_kappa equals a brute confusion-matrix replay") {
    val preds = TextAnalysis.langidPredictions(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val n = preds.length.toLong
    val diag = preds.count { case (y, p) => y == p }.toLong
    val byTrue = preds.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byPred = preds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val peNum = (byTrue.keySet ++ byPred.keySet).toSeq.map { l =>
      byTrue.getOrElse(l, 0L) * byPred.getOrElse(l, 0L)
    }.sum
    val row = Evaluation.cohensKappa(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === diag * 1000000L / n)
    assert(row.getLong(2) === peNum * 1000000L / (n * n))
    val num = diag * n - peNum
    val den = n * n - peNum
    val expect =
      if (num < 0) -((-num) * 1000000L / den) else num * 1000000L / den
    assert(row.getLong(3) === expect)
  }

  test("mcnemar_test equals a doc-by-doc paired replay") {
    val langid = TextAnalysis.langidPredictions(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1) == "en",
        r.getString(2) == "en")).toMap
    val pairs = scored.flatMap { case (id, _, s) =>
      langid.get(id).map { case (y, pa) => (pa == y, (s >= 800L) == y) }
    }
    val n11 = pairs.count(p => p._1 && p._2).toLong
    val n10 = pairs.count(p => p._1 && !p._2).toLong
    val n01 = pairs.count(p => !p._1 && p._2).toLong
    val n00 = pairs.count(p => !p._1 && !p._2).toLong
    val row = Evaluation.mcnemarTest(spark, dir).collect().head
    assert(row.getLong(0) === pairs.size.toLong)
    assert((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      === ((n11, n10, n01, n00)))
    if (n10 + n01 == 0) assert(row.isNullAt(5))
    else assert(row.getLong(5) ===
      (n10 - n01) * (n10 - n01) * 1000L / (n10 + n01))
    // the pairing must be the quality side's domain (empty docs drop)
    assert(pairs.size === scored.size)
  }

  test("brier_score equals a doc-by-doc replay incl. skill sign-split") {
    val docs = scored.map { case (_, lang, s) =>
      (pPpm(s), if (lang == "en") 1000000L else 0L)
    }
    val n = docs.size.toLong
    val nPos = docs.count(_._2 == 1000000L).toLong
    val sq = docs.map { case (p, y) => (p - y) * (p - y) }.sum
    val brier = sq / (n * 1000000L)
    val base = nPos * (n - nPos) * 1000000L / (n * n)
    val row = Evaluation.brierScore(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === nPos)
    assert(row.getLong(2) === brier)
    assert(row.getLong(3) === base)
    if (base == 0) assert(row.isNullAt(4))
    else {
      val d = base - brier
      val expect = if (d < 0) -((-d) * 1000000L / base) else d * 1000000L / base
      assert(row.getLong(4) === expect)
    }
  }

  test("cumulative_gains equals a score-histogram replay") {
    val byScore = scored.groupBy(_._3).toSeq.sortBy(-_._1).map {
      case (s, xs) =>
        (s, xs.size.toLong, xs.count(_._2 == "en").toLong)
    }
    val n = byScore.map(_._2).sum
    val totPos = byScore.map(_._3).sum
    val cum = byScore.scanLeft((0L, 0L)) { case ((cp, cs), (_, c, p)) =>
      (cp + c, cs + p)
    }.tail
    val rows = Evaluation.cumulativeGains(spark, dir).collect()
    rows.foreach { r =>
      val d = r.getLong(0)
      val hits = cum.filter { case (cpop, _) => cpop * 10 <= n * d }
      assert(hits.nonEmpty) // a decile row only exists when selectable
      val (mp, mpos) = hits.last
      assert(r.getLong(1) === mp * 1000000L / n)
      assert(r.getLong(2) === mpos * 1000000L / totPos)
      assert(r.getLong(3) === mpos * n * 1000000L / (mp * totPos))
    }
    // capture and population shares are cumulative: both end at 100%
    assert(rows.last.getLong(1) === 1000000L)
    assert(rows.last.getLong(2) === 1000000L)
  }

  test("survival_km equals an iterative KM replay over user durations") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS u", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val endu = ev.map(_._2).max
    val horizon = 48L * 3600000000L
    val lab = ev.groupBy(_._1).values.map { es =>
      val fu = es.map(_._2).min
      val pu = es.filter(_._3 == "purchase").map(_._2).minOption
      val fup = math.min(fu + horizon, endu)
      pu match {
        case Some(p) if p < fup => ((p - fu) / 3600000000L, true)
        case _                  => ((fup - fu) / 3600000000L, false)
      }
    }.toSeq
    val grid = lab.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }
    var atRisk = lab.size.toLong
    var s = 1000000L
    val model = grid.map { case (t, d, c) =>
      s = s * (atRisk - d) / atRisk
      val row = (t, atRisk, d, c, s)
      atRisk -= d + c
      row
    }
    val rows = SqlSurface.survivalKm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows === model)
    // the curve must actually move: real events AND real censoring
    assert(model.map(_._3).sum > 0 && model.map(_._4).sum > 0)
  }

  test("log_rank_test equals an hour-by-hour observed-vs-expected replay") {
    val lab = SqlSurface.survivalLabels(spark, dir)
      .withColumn("arm", ContentHash.bucket(org.apache.spark.sql.functions.col("user_id"), 2))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val byT = lab.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val a1 = xs.filter(_._3 == 0L)
      val a2 = xs.filter(_._3 == 1L)
      (t, a1.map(_._2).sum, a1.count(_._2 == 0L).toLong,
        a2.map(_._2).sum, a2.count(_._2 == 0L).toLong)
    }
    var n1 = lab.count(_._3 == 0L).toLong
    var n2 = lab.count(_._3 == 1L).toLong
    var (o1, o2, e1, e2) = (0L, 0L, 0L, 0L)
    byT.foreach { case (_, d1, c1, d2, c2) =>
      if (d1 + d2 > 0) {
        o1 += d1; o2 += d2
        e1 += (d1 + d2) * n1 * 1000L / (n1 + n2)
        e2 += (d1 + d2) * n2 * 1000L / (n1 + n2)
      }
      n1 -= d1 + c1; n2 -= d2 + c2
    }
    val row = Evaluation.logRankTest(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((o1, e1, o2, e2)))
    val chi = (o1 * 1000 - e1) * (o1 * 1000 - e1) / e1 +
      (o2 * 1000 - e2) * (o2 * 1000 - e2) / e2
    assert(row.getLong(4) === chi)
    // both arms must be populated for the test to mean anything
    assert(o1 > 0 && o2 > 0)
  }

  test("holt_linear equals an iterative level/trend replay") {
    val days = Tables.events(spark, dir)
      .where(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("to_date(ts) AS day", "CAST(round(value * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (d, xs) =>
        (d, xs.map(_._2).sum)
      }
    var l = days.head._2
    var b = 0L
    val model = days.zipWithIndex.map { case ((d, y), i) =>
      if (i > 0) {
        val lNew = (y + 3 * (l + b)) / 4
        b = (lNew - l + 3 * b) / 4
        l = lNew
      }
      (d, y, l, b, l + 7 * b)
    }
    val rows = SqlSurface.holtLinear(spark, dir).collect().map(r =>
      (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows === model)
    // the trend term must actually engage (a dip exists in the series)
    assert(model.exists(_._4 < 0) || model.exists(_._4 > 0))
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
