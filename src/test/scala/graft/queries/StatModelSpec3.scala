package graft.queries

import java.time.LocalDate

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third wave of first-principles statistics models (rationale in
  * [[StatModelSpec]]): the survival family (Kaplan–Meier product
  * limit, log-rank), smoothing (EWMA with its pinned kernel audited
  * against α(1−α)^l), inequality (Gini from sorted ranks), and the
  * ranking-evaluation battery (PR sweep, NDCG with its pinned
  * discount table audited against 1/log2(1+r) and the ranker rebuilt
  * from raw trigrams). Pinned constant tables are themselves checked
  * against their irrational definitions — the exact failure mode a
  * formula-echoing oracle can never see.
  */
class StatModelSpec3 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def bucket(id: Long, mod: Int): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = f"${h(0) & 0xff}%02x${h(1) & 0xff}%02x".take(4)
    java.lang.Long.parseLong(hex, 16) % mod
  }

  /** (user, eventType, epochMicros, cents) — the raw event grain. */
  private def eventsUs(): Array[(Long, String, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")), round(col("value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  /** The survival labels recomputed from the stated censoring rule:
    * entry at first event, event at first purchase inside the 48 h
    * follow-up truncated at the data window's end, else censored.
    */
  private def survivalLabels(): Seq[(Long, Long, Long)] = {
    val HorizonUs = 48L * 3600000000L
    val ev = eventsUs()
    val endu = ev.map(_._3).max
    ev.groupBy(_._1).toSeq.map { case (u, xs) =>
      val fu = xs.map(_._3).min
      val pu = xs.filter(_._2 == "purchase").map(_._3).minOption
      val fup = math.min(fu + HorizonUs, endu)
      pu match {
        case Some(p) if p < fup => (u, (p - fu) / 3600000000L, 1L)
        case _ => (u, (fup - fu) / 3600000000L, 0L)
      }
    }
  }

  // ---------------------------------------------------------------
  // survival_km — Kaplan–Meier product limit from the raw labels
  // ---------------------------------------------------------------
  test("survival_km matches the product-limit estimator") {
    val grid = survivalLabels()
      .groupBy(_._2).toSeq
      .map { case (t, xs) =>
        (t, xs.count(_._3 == 1L).toLong, xs.count(_._3 == 0L).toLong)
      }
      .sortBy(_._1)
    val got = run("survival_km").sortBy(_.getAs[Long]("t"))
    assert(got.length == grid.length)
    var nAt = grid.map(r => r._2 + r._3).sum
    var sInt = BigInt(-1)
    var sFloat = 1.0
    got.zip(grid).foreach { case (r, (t, d, c)) =>
      assert(r.getAs[Long]("t") == t)
      assert(r.getAs[Long]("n_at") == nAt, s"t=$t at-risk")
      assert(r.getAs[Long]("d") == d, s"t=$t deaths")
      assert(r.getAs[Long]("c") == c, s"t=$t censored")
      // the pinned quantized chain (replayed with independent at-risk
      // bookkeeping) ...
      sInt =
        if (sInt < 0) BigInt(nAt - d) * 1000000 / nAt
        else sInt * (nAt - d) / nAt
      assert(BigInt(r.getAs[Long]("s_ppm")) == sInt, s"t=$t s_ppm")
      // ... must track the textbook product Π(1−d/n) within the ≤1
      // ppm per-step floor drift
      sFloat *= (nAt - d).toDouble / nAt
      assert(math.abs(r.getAs[Long]("s_ppm") - sFloat * 1e6) <=
        grid.length + 1, s"t=$t vs product limit ${sFloat * 1e6}")
      nAt -= d + c
    }
  }

  // ---------------------------------------------------------------
  // log_rank_test — O vs E over the pooled at-risk sets, two arms
  // ---------------------------------------------------------------
  test("log_rank_test matches observed-vs-expected from raw labels") {
    val labs = survivalLabels().map { case (u, t, e) => (bucket(u, 2), t, e) }
    val grid = labs.groupBy(_._2).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t,
        xs.count(x => x._1 == 0 && x._3 == 1L).toLong,
        xs.count(x => x._1 == 0 && x._3 == 0L).toLong,
        xs.count(x => x._1 == 1 && x._3 == 1L).toLong,
        xs.count(x => x._1 == 1 && x._3 == 0L).toLong)
    }
    var n1 = grid.map(g => g._2 + g._3).sum
    var n2 = grid.map(g => g._4 + g._5).sum
    var o1 = BigInt(0)
    var o2 = BigInt(0)
    var e1 = BigInt(0)
    var e2 = BigInt(0)
    grid.foreach { case (_, d1, c1, d2, c2) =>
      if (d1 + d2 > 0) {
        o1 += d1
        o2 += d2
        // expected events ∝ at-risk share, floored to milli per term
        // (the pinned quantization)
        e1 += BigInt(d1 + d2) * n1 * 1000 / (n1 + n2)
        e2 += BigInt(d1 + d2) * n2 * 1000 / (n1 + n2)
      }
      n1 -= d1 + c1
      n2 -= d2 + c2
    }
    val got = run("log_rank_test").head
    assert(BigInt(got.getAs[Long]("o1")) == o1)
    assert(BigInt(got.getAs[Long]("o2")) == o2)
    assert(BigInt(got.getAs[Long]("e1_milli")) == e1)
    assert(BigInt(got.getAs[Long]("e2_milli")) == e2)
    if (e1 == 0 || e2 == 0)
      assert(got.isNullAt(got.fieldIndex("chi2_milli")))
    else {
      val chi2 = (o1 * 1000 - e1).pow(2) / e1 + (o2 * 1000 - e2).pow(2) / e2
      assert(BigInt(got.getAs[Long]("chi2_milli")) == chi2)
    }
  }

  // ---------------------------------------------------------------
  // ewma_smooth — pinned kernel audited + self-normalized average
  // ---------------------------------------------------------------
  test("ewma_smooth matches alpha-decay weights and the windowed average") {
    // the pinned 14-tap kernel must BE floor(10⁶·α(1−α)^l), α = ¼
    val wants = (0 until 14).map(l =>
      math.floor(1e6 * 0.25 * math.pow(0.75, l)).toLong)
    val daily = eventsUs()
      .map(e => (LocalDate.ofInstant(
        java.time.Instant.ofEpochSecond(e._3 / 1000000),
        java.time.ZoneOffset.UTC), e._4))
      .groupBy(_._1).view.mapValues(xs => xs.map(_._2).sum).toMap
    val got = run("ewma_smooth").sortBy(_.getAs[java.sql.Date]("d").toString)
    assert(got.length == daily.size)
    got.foreach { r =>
      val d = LocalDate.parse(r.getAs[java.sql.Date]("d").toString)
      assert(r.getAs[Long]("day_cents") == daily(d), d)
      val taps = (0 until 14).flatMap { l =>
        daily.get(d.minusDays(l.toLong)).map(v => (wants(l), v))
      }
      val num = taps.map { case (w, v) => BigInt(w) * v }.sum
      val den = taps.map(t => BigInt(t._1)).sum
      val want = if (num < 0) -((-num) / den) else num / den
      assert(BigInt(r.getAs[Long]("ewma_cents")) == want, d)
    }
  }

  // ---------------------------------------------------------------
  // gini_index — G = (2Σi·x)/(nΣx) − (n+1)/n over sorted user revenue
  // ---------------------------------------------------------------
  test("gini_index matches the rank-sum definition over sorted values") {
    val perUser = eventsUs()
      .filter(_._2 == "purchase")
      .groupBy(_._1).values
      .map(xs => xs.map(_._4).sum).toSeq
      .sorted
    val n = BigInt(perUser.size)
    val sx = perUser.map(BigInt(_)).sum
    val six = perUser.zipWithIndex
      .map { case (x, i) => BigInt(x) * (i + 1) }.sum
    val want = 2 * six * 1000000 / (n * sx) - (n + 1) * 1000000 / n
    val got = run("gini_index").head
    assert(BigInt(got.getAs[Long]("n")) == n)
    assert(BigInt(got.getAs[Long]("sx")) == sx)
    assert(BigInt(got.getAs[Long]("gini_ppm")) == want)
  }

  // ---------------------------------------------------------------
  // pr_curve — precision/recall/F1 sweep over pinned thresholds
  // ---------------------------------------------------------------
  test("pr_curve matches the threshold-sweep definitions") {
    val rows = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("score").cast("long"), (col("lang") === "en"))
      .collect()
      .map(r => (math.min(math.max(r.getLong(0), 0L), 1000L) * 1000,
        r.getBoolean(1)))
    val totPos = BigInt(rows.count(_._2))
    val got = run("pr_curve").sortBy(_.getAs[Long]("threshold_ppm"))
    assert(got.length == 10)
    got.zipWithIndex.foreach { case (r, i) =>
      val t = i * 100000L
      assert(r.getAs[Long]("threshold_ppm") == t)
      val pred = rows.filter(_._1 >= t)
      val nPred = BigInt(pred.length)
      val tp = BigInt(pred.count(_._2))
      assert(BigInt(r.getAs[Long]("n_pred")) == nPred, t)
      assert(BigInt(r.getAs[Long]("tp")) == tp, t)
      if (nPred == 0) assert(r.isNullAt(r.fieldIndex("precision_ppm")), t)
      else assert(BigInt(r.getAs[Long]("precision_ppm")) ==
        tp * 1000000 / nPred, t)
      if (totPos == 0) assert(r.isNullAt(r.fieldIndex("recall_ppm")), t)
      else assert(BigInt(r.getAs[Long]("recall_ppm")) ==
        tp * 1000000 / totPos, t)
      // F1 = 2PR/(P+R) = 2tp/(n_pred + tot_pos) — harmonic mean form
      if (tp + nPred + totPos == 0)
        assert(r.isNullAt(r.fieldIndex("f1_ppm")), t)
      else assert(BigInt(r.getAs[Long]("f1_ppm")) ==
        2 * tp * 1000000 / (nPred + totPos), t)
    }
  }

  // ---------------------------------------------------------------
  // ndcg_eval — discount table vs 1/log2(1+r); ranker rebuilt from
  // raw trigrams; DCG/IDCG/NDCG per query
  // ---------------------------------------------------------------
  test("ndcg_eval matches NDCG@10 with the ranker rebuilt from raw text") {
    // the pinned discount table must BE floor(10⁶ / log2(1+r))
    val w = (1 to 10).map(rk =>
      math.floor(1e6 / (math.log(1.0 + rk) / math.log(2.0))).toLong)
    val cum = w.scanLeft(0L)(_ + _).tail
    // relevance labels: the dedup clusters are the GIVEN judgment
    // (their own machinery is model-checked in GraphPropertySpec /
    // LshBandingSpec); the RANKER is rebuilt here from raw text
    val labels = Dedup.ccLabelsShared(spark, dir)
      .select(col("doc"), col("root"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val rel = labels.filter(l => l._1 != l._2)
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val shingles = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), lower(col("text")))
      .collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty)
        r.getLong(0) -> toks.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
    // score(q, d) = |shingles(q) ∩ shingles(d)| over co-shingled docs
    def scores(q: Long): Map[Long, Long] = {
      val qs = shingles(q)
      shingles.collect {
        case (d, ds) if d != q && qs.exists(ds.contains) =>
          d -> qs.count(ds.contains).toLong
      }.filter(_._2 > 0)
    }
    val got = run("ndcg_eval")
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = r.getAs[Long]("query_doc")
      val rdocs = rel(q)
      assert(r.getAs[Long]("n_relevant") == rdocs.size, q)
      val sc = scores(q)
      // rank of each SCORED relevant doc: 1 + strictly-better count
      // under (score DESC, doc ASC); unscored relevant docs are
      // unranked (contribute to IDCG only)
      val ranked = rdocs.toSeq.flatMap { rd =>
        sc.get(rd).map { s =>
          val better = sc.count { case (c, cs) =>
            c != rd && (cs > s || (cs == s && c < rd))
          }
          (rd, better + 1)
        }
      }
      val top10 = ranked.filter(_._2 <= 10)
      val dcg = top10.map(t => w(t._2.toInt - 1)).sum
      val idcg = cum(math.min(rdocs.size, 10) - 1)
      assert(r.getAs[Long]("n_top10") == top10.size, q)
      assert(r.getAs[Long]("dcg_wppm") == dcg, q)
      assert(r.getAs[Long]("idcg_wppm") == idcg, q)
      assert(BigInt(r.getAs[Long]("ndcg_ppm")) ==
        BigInt(dcg) * 1000000 / idcg, q)
    }
  }
}
