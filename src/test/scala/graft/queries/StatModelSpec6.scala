package graft.queries

import java.time.LocalDate

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sixth wave of first-principles statistics models (rationale in
  * [[StatModelSpec]]): the remaining formula-bearing queries the
  * round-9 sweep left unmodeled — paired-classifier McNemar, Brier
  * skill, the gains/lift curve, the multiplier bootstrap, both Holt
  * smoothers (checked per-step against the textbook recurrence with
  * independent BigInt arithmetic over an independently re-aggregated
  * day grid), MASE, the LTV triangle, seasonal anomaly/classical
  * decomposition, and the two sketch-error-economics readouts
  * (Bloom FPR vs occupancy theory, Count-Min vs the e·N/w bound).
  * Engine code appears ONLY as input prep (table reads, cent
  * quantization, `Tables.events` timestamp dispatch, the langid /
  * quality-score feature relations); every statistic is recomputed
  * here from its definition in plain Scala over collected sf0.001
  * rows. All twelve outputs are integer- or IEEE-deterministic, so
  * every comparison is EXACT.
  */
class StatModelSpec6 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  /** Truncate-toward-zero quotient — Spark `div` / DuckDB integer
    * `//` / Scala Long `/` semantics, over BigInt.
    */
  private def tdiv(n: BigInt, d: BigInt): BigInt = n / d

  /** The suite's sign-split floor ppm: magnitudes divide, sign
    * reapplies (identical to tdiv for BigInt, kept for readability
    * at the call sites that state it).
    */
  private def signSplit(num: BigInt, den: BigInt): BigInt =
    if (num < 0) -((-num) / den) else num / den

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  // ---------------------------------------------------------------
  // mcnemar_test — paired discordant-count χ² of the two detectors
  // ---------------------------------------------------------------
  test("mcnemar_test matches the discordant-pair chi-square definition") {
    val a = TextAnalysis.langidPredictions(spark, dir)
      .select(col("doc_id"), col("lang"), col("predicted"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang") == "en", r.getAs[String]("predicted") == "en")))
      .toMap
    val b = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("doc_id"), col("score"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("score") >= 800L))
      .toMap
    // the paired population is the common doc set (a paired test is
    // only defined where both classifiers saw the row)
    val paired = a.keySet.intersect(b.keySet).toSeq
    var n11, n10, n01, n00 = BigInt(0)
    paired.foreach { id =>
      val (y, pa) = a(id)
      val aOk = pa == y
      val bOk = b(id) == y
      if (aOk && bOk) n11 += 1
      else if (aOk && !bOk) n10 += 1
      else if (!aOk && bOk) n01 += 1
      else n00 += 1
    }
    val got = run("mcnemar_test").head
    assert(BigInt(got.getAs[Long]("n")) == BigInt(paired.size))
    assert(BigInt(got.getAs[Long]("n11")) == n11)
    assert(BigInt(got.getAs[Long]("n10")) == n10)
    assert(BigInt(got.getAs[Long]("n01")) == n01)
    assert(BigInt(got.getAs[Long]("n00")) == n00)
    // McNemar: χ² = (n10 − n01)² / (n10 + n01), discordant pairs only
    if (n10 + n01 == 0) assert(got.isNullAt(got.fieldIndex("chi2_milli")))
    else assert(BigInt(got.getAs[Long]("chi2_milli")) ==
      (n10 - n01).pow(2) * 1000 / (n10 + n01))
  }

  // ---------------------------------------------------------------
  // brier_score — mean squared error vs base rate r(1−r) + skill
  // ---------------------------------------------------------------
  test("brier_score matches mean-squared-error and skill definitions") {
    val rows = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("score"), col("lang"))
      .collect()
      .map(r => (r.getAs[Long]("score"), r.getAs[String]("lang") == "en"))
    val n = BigInt(rows.length)
    val nPos = BigInt(rows.count(_._2))
    // p = clamp(score, 0..1000)·1000 ppm; Brier = mean (p − y)²
    val sq = rows.map { case (s, y) =>
      val p = BigInt(math.min(math.max(s, 0L), 1000L) * 1000L)
      val d = p - (if (y) BigInt(1000000) else BigInt(0))
      d * d
    }.sum
    val brierPpm = sq / (n * 1000000)
    val basePpm = nPos * (n - nPos) * 1000000 / (n * n)
    val got = run("brier_score").head
    assert(BigInt(got.getAs[Long]("n")) == n)
    assert(BigInt(got.getAs[Long]("n_pos")) == nPos)
    assert(BigInt(got.getAs[Long]("brier_ppm")) == brierPpm)
    assert(BigInt(got.getAs[Long]("base_ppm")) == basePpm)
    // skill = 1 − brier/base, stated over the quantized ppm values
    if (basePpm == 0) assert(got.isNullAt(got.fieldIndex("skill_ppm")))
    else assert(BigInt(got.getAs[Long]("skill_ppm")) ==
      signSplit((basePpm - brierPpm) * 1000000, basePpm))
  }

  // ---------------------------------------------------------------
  // cumulative_gains — decile capture + lift from explicit sorting
  // ---------------------------------------------------------------
  test("cumulative_gains matches the sorted decile capture curve") {
    val rows = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("score"), col("lang"))
      .collect()
      .map(r => (r.getAs[Long]("score"), r.getAs[String]("lang") == "en"))
    val n = BigInt(rows.length)
    val totPos = BigInt(rows.count(_._2))
    // score-grain prefix sums along the DESCENDING ranking
    val hist = rows.groupBy(_._1).toSeq.sortBy(-_._1).map { case (s, xs) =>
      (s, BigInt(xs.length), BigInt(xs.count(_._2)))
    }
    val prefixes = hist.scanLeft((BigInt(0), BigInt(0))) {
      case ((cp, cs), (_, c, p)) => (cp + c, cs + p)
    }.drop(1)
    val got = run("cumulative_gains")
    val expected = (1 to 10).flatMap { d =>
      // decile row = deepest prefix with cum-pop ≤ d·n/10 (cross-
      // multiplied); a decile with no qualifying prefix emits no row
      val qual = prefixes.filter { case (cp, _) => cp * 10 <= n * d }
      qual.lastOption.map { case (mp, mpos) =>
        val lift =
          if (mp * totPos == 0) None
          else Some(mpos * n * 1000000 / (mp * totPos))
        (d.toLong, mp * 1000000 / n,
          if (totPos == 0) None else Some(mpos * 1000000 / totPos), lift)
      }
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (d, pop, cap, lift)) =>
      assert(r.getAs[Long]("decile") == d)
      assert(BigInt(r.getAs[Long]("cum_pop_ppm")) == pop, s"decile $d")
      cap match {
        case None => assert(r.isNullAt(r.fieldIndex("capture_ppm")), s"decile $d")
        case Some(v) =>
          assert(BigInt(r.getAs[Long]("capture_ppm")) == v, s"decile $d")
      }
      lift match {
        case None => assert(r.isNullAt(r.fieldIndex("lift_ppm")), s"decile $d")
        case Some(v) =>
          assert(BigInt(r.getAs[Long]("lift_ppm")) == v, s"decile $d")
      }
    }
  }

  // ---------------------------------------------------------------
  // bootstrap_ci — two-bit multiplier bootstrap, 2nd/31st of B=32
  // ---------------------------------------------------------------
  test("bootstrap_ci matches the deterministic multiplier bootstrap") {
    val orders = Tables.read(spark, dir, "orders")
      .select(col("o_orderkey").cast("long").as("k"),
        Quantize.cents(col("o_totalprice")).as("yc"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // weight w(k, r) ∈ {0,1,2} with P = ¼/½/¼ from the first md5 hex
    // digit of "k:r": v = digit mod 4, w = v div 2 + v mod 2
    def weight(k: Long, r: Int): Long = {
      val v = Integer.parseInt(md5hex(s"$k:$r").substring(0, 1), 16) % 4
      v / 2 + v % 2
    }
    val reps = (0 until 32).map { r =>
      var nr = 0L
      var sr = BigInt(0)
      orders.foreach { case (k, yc) =>
        val w = weight(k, r)
        nr += w; sr += BigInt(yc) * w
      }
      // replicate mean: the same two exact integers divide in both
      // engines, so the IEEE result is identical
      (r, sr.toDouble / nr.toDouble)
    }
    val sorted = reps.sortBy { case (r, m) => (m, r) }
    val bootLo = sorted(1)._2 // rank 2 of 32
    val bootHi = sorted(30)._2 // rank 31 of 32
    val meanC = orders.map(o => BigInt(o._2)).sum.toDouble / orders.length
    val got = run("bootstrap_ci").head
    assert(got.getAs[Long]("n_orders") == orders.length.toLong)
    assert(got.getAs[Double]("mean_c") == meanC)
    assert(got.getAs[Double]("boot_lo") == bootLo)
    assert(got.getAs[Double]("boot_hi") == bootHi)
    // the interval is an interval and brackets the point estimate in
    // any non-degenerate resample set
    assert(bootLo <= bootHi)
  }

  /** The purchase-revenue day grid, re-aggregated here from row-grain
    * collected events (engine used only for the timestamp dispatch
    * and cent quantization — input prep).
    */
  private def purchaseDayGrid(): Seq[(String, BigInt)] =
    Tables.events(spark, dir)
      .where(col("event_type") === "purchase")
      .select(to_date(col("ts")).cast("string").as("day"),
        Quantize.cents(col("value")).as("c"))
      .collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1)

  // ---------------------------------------------------------------
  // holt_linear — per-step check of the textbook Holt recurrence
  // ---------------------------------------------------------------
  test("holt_linear matches Holt's recurrence step by step") {
    val grid = purchaseDayGrid()
    val got = run("holt_linear").sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(got.length == grid.length)
    // seed: l₁ = y₁, b₁ = 0; step: l = α·y + (1−α)(l+b),
    // b = β(l−l_prev) + (1−β)b with α = β = ¼, every quantity
    // truncated to integer cents (toward zero — the engine-identical
    // convention verified in the holt_linear doc)
    var l = grid.head._2
    var b = BigInt(0)
    got.zip(grid).zipWithIndex.foreach { case ((r, (d, y)), i) =>
      assert(r.getAs[java.sql.Date]("day").toString == d, s"row $i")
      assert(BigInt(r.getAs[Long]("y_c")) == y, s"row $i")
      if (i > 0) {
        val ln = tdiv(y + 3 * (l + b), 4)
        b = tdiv(ln - l + 3 * b, 4)
        l = ln
      }
      assert(BigInt(r.getAs[Long]("level_c")) == l, s"row $i level")
      assert(BigInt(r.getAs[Long]("trend_c")) == b, s"row $i trend")
      assert(BigInt(r.getAs[Long]("forecast7_c")) == l + 7 * b, s"row $i fc")
    }
  }

  // ---------------------------------------------------------------
  // holt_winters — additive triple smoothing, 7 weekday components
  // ---------------------------------------------------------------
  test("holt_winters matches the additive Holt-Winters recurrence") {
    val grid = purchaseDayGrid()
    val got = run("holt_winters").sortBy(_.getAs[java.sql.Date]("day").toString)
    assert(got.length == grid.length)
    var l = grid.head._2
    var b = BigInt(0)
    val s = Array.fill(8)(BigInt(0)) // isodow 1..7
    got.zip(grid).zipWithIndex.foreach { case ((r, (d, y)), i) =>
      // independent weekday: ISO Monday=1..Sunday=7 from LocalDate
      val wd = LocalDate.parse(d).getDayOfWeek.getValue
      assert(r.getAs[java.sql.Date]("day").toString == d, s"row $i")
      assert(BigInt(r.getAs[Long]("y_c")) == y, s"row $i")
      val (seas, fitted) =
        if (i == 0) { l = y; b = BigInt(0); (BigInt(0), y) }
        else {
          val sOld = s(wd)
          val f = l + b + sOld // one-step-ahead forecast BEFORE update
          val lN = tdiv(y - sOld + 3 * (l + b), 4)
          val bN = tdiv(lN - l + 3 * b, 4)
          val sN = tdiv(y - lN + 3 * sOld, 4)
          l = lN; b = bN; s(wd) = sN
          (sN, f)
        }
      assert(BigInt(r.getAs[Long]("level_c")) == l, s"row $i level")
      assert(BigInt(r.getAs[Long]("trend_c")) == b, s"row $i trend")
      assert(BigInt(r.getAs[Long]("seas_c")) == seas, s"row $i seas")
      assert(BigInt(r.getAs[Long]("fitted_c")) == fitted, s"row $i fitted")
    }
  }

  // ---------------------------------------------------------------
  // mase_eval — MASE of naive(1) scaled by seasonal-naive(7)
  // ---------------------------------------------------------------
  test("mase_eval matches Hyndman-Koehler MASE from the day grid") {
    val days = Tables.read(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), BigInt(r.getLong(1))))
      .groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).sum }
    def err(lag: Int): (Long, BigInt) = {
      val pairs = days.keys.toSeq
        .flatMap(d => days.get(d.minusDays(lag)).map(p => (days(d) - p).abs))
      (pairs.length.toLong, pairs.sum)
    }
    val (n1, sae1) = err(1)
    val (n7, sae7) = err(7)
    val got = run("mase_eval").head
    assert(got.getAs[Long]("n1") == n1)
    assert(BigInt(got.getAs[Long]("sae1_c")) == sae1)
    assert(got.getAs[Long]("n7") == n7)
    assert(BigInt(got.getAs[Long]("sae7_c")) == sae7)
    // MASE = MAE(naive1) / MAE(seasonal-naive7) = (sae1/n1)/(sae7/n7)
    assert(got.getAs[Double]("mase") ==
      sae1.toDouble * n7 / (sae7.toDouble * n1))
  }

  // ---------------------------------------------------------------
  // cohort_ltv — cumulative revenue triangle per signup cohort
  // ---------------------------------------------------------------
  test("cohort_ltv matches the cohort-by-age cumulative triangle") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("u"),
        to_date(col("ts")).cast("string").as("d"),
        col("event_type").as("t"), Quantize.cents(col("value")).as("c"))
      .collect()
      .map(r => (r.getLong(0), LocalDate.parse(r.getString(1)),
        r.getString(2), BigInt(r.getLong(3))))
    val cohort = ev.groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).minBy(_.toEpochDay) }
    // purchase cents per (cohort day, age offset ≤ 14)
    val cells = ev.filter(_._3 == "purchase")
      .map { case (u, d, _, c) =>
        val cd = cohort(u)
        ((cd, java.time.temporal.ChronoUnit.DAYS.between(cd, d)), c)
      }
      .filter(_._1._2 <= 14)
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).sum }
    val sizes = cohort.values.groupBy(identity).map { case (d, xs) => d -> xs.size }
    val expected = cells.keys.toSeq.sortBy(k => (k._1.toString, k._2)).map {
      case (cd, off) =>
        val cum = cells.filter { case ((c, o), _) => c == cd && o <= off }
          .values.sum
        (cd.toString, off, BigInt(sizes(cd)), cells((cd, off)), cum,
          cum * 1000 / sizes(cd))
    }
    val got = run("cohort_ltv")
    assert(got.length == expected.length)
    got.zip(expected).foreach {
      case (r, (cd, off, nc, rev, cum, ltv)) =>
        assert(r.getAs[java.sql.Date]("cohort_day").toString == cd)
        assert(r.getAs[Long]("day_offset") == off)
        assert(BigInt(r.getAs[Long]("n_cohort")) == nc, s"$cd/$off")
        assert(BigInt(r.getAs[Long]("rev_c")) == rev, s"$cd/$off")
        assert(BigInt(r.getAs[Long]("cum_rev_c")) == cum, s"$cd/$off")
        assert(BigInt(r.getAs[Long]("ltv_milli")) == ltv, s"$cd/$off")
    }
  }

  // ---------------------------------------------------------------
  // seasonal_anomaly — cell vs weekday×hour class mean, top 25
  // ---------------------------------------------------------------
  test("seasonal_anomaly matches the weekday-hour expectation model") {
    val rows = Tables.events(spark, dir)
      .select(to_date(col("ts")).cast("string").as("d"),
        hour(col("ts")).cast("long").as("h"),
        Quantize.cents(col("value")).as("c"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), BigInt(r.getLong(2))))
    val grid = rows.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    def dow(d: String): Long = LocalDate.parse(d).getDayOfWeek.getValue.toLong
    val profile = grid.toSeq.groupBy { case ((d, h), _) => (dow(d), h) }
      .map { case (k, cells) =>
        k -> tdiv(cells.map(_._2).sum, BigInt(cells.size))
      }
    val scored = grid.toSeq.map { case ((d, h), obs) =>
      val exp = profile((dow(d), h))
      val dev = signSplit((obs - exp) * 1000000, exp)
      (d, h, dow(d), obs, exp, dev)
    }
    val top = scored.sortBy { case (d, h, _, _, _, dev) => (-dev.abs, d, h) }
      .take(25)
    val got = run("seasonal_anomaly")
    assert(got.length == top.length)
    got.zip(top).foreach { case (r, (d, h, w, obs, exp, dev)) =>
      assert(r.getAs[java.sql.Date]("day").toString == d, s"$d $h")
      assert(r.getAs[Long]("hr") == h, s"$d $h")
      assert(r.getAs[Long]("dow") == w, s"$d $h")
      assert(BigInt(r.getAs[Long]("obs_cents")) == obs, s"$d $h")
      assert(BigInt(r.getAs[Long]("exp_cents")) == exp, s"$d $h")
      assert(BigInt(r.getAs[Long]("dev_ppm")) == dev, s"$d $h")
    }
  }

  // ---------------------------------------------------------------
  // trend_decompose — centered MA-7 trend + weekday seasonal + resid
  // ---------------------------------------------------------------
  test("trend_decompose matches classical decomposition from sorting") {
    val daily = Tables.read(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), BigInt(r.getLong(1))))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    // trend: centered 7-day moving average, FULL neighborhoods only
    val trend = daily.keys.toSeq.flatMap { d =>
      val win = (-3 to 3).flatMap(o => daily.get(d.plusDays(o)))
      if (win.size == 7) Some(d -> tdiv(win.sum, 7)) else None
    }.toMap
    val detr = trend.map { case (d, t) => d -> (daily(d) - t) }
    val seasonal = detr.toSeq.groupBy(_._1.getDayOfWeek.getValue)
      .map { case (w, xs) =>
        w -> signSplit(xs.map(_._2).sum, BigInt(xs.size))
      }
    val expected = trend.keys.toSeq.sortBy(_.toString).map { d =>
      val seas = seasonal(d.getDayOfWeek.getValue)
      (d.toString, daily(d), trend(d), seas, detr(d) - seas)
    }
    val got = run("trend_decompose")
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (d, obs, t, seas, resid)) =>
      assert(r.getAs[java.sql.Date]("day").toString == d)
      assert(BigInt(r.getAs[Long]("obs_cents")) == obs, d)
      assert(BigInt(r.getAs[Long]("trend")) == t, d)
      assert(BigInt(r.getAs[Long]("seasonal")) == seas, d)
      assert(BigInt(r.getAs[Long]("residual")) == resid, d)
    }
  }

  // ---------------------------------------------------------------
  // bloom_fpp — measured FPR vs the occupancy³ expectation
  // ---------------------------------------------------------------
  test("bloom_fpp matches a from-scratch Bloom filter replay") {
    val members = Tables.read(spark, dir, "orders")
      .select(col("o_custkey").cast("long")).collect().map(_.getLong(0))
      .distinct
    val mBits = members.length.toLong * 8
    def pos(k: Long, seed: Int): Long = {
      val v = java.lang.Long.parseLong(md5hex(s"$seed:$k").substring(0, 15), 16)
      Math.floorMod(v, mBits)
    }
    val occupied = members.flatMap(k => Seq(1, 2, 3).map(pos(k, _))).toSet
    val mx = members.max
    val probes = Tables.read(spark, dir, "customer")
      .select(col("c_custkey").cast("long")).collect()
      .map(_.getLong(0) + mx)
    // false positive = non-member whose THREE positions are all set
    val fp = probes.count(k => Seq(1, 2, 3).forall(s => occupied(pos(k, s))))
    val setBits = BigInt(occupied.size)
    val m = BigInt(mBits)
    val theory = tdiv(tdiv(tdiv(setBits * 1000000, m) * setBits, m) * setBits, m)
    val got = run("bloom_fpp").head
    assert(got.getAs[Long]("n_members") == members.length.toLong)
    assert(got.getAs[Long]("n_probes") == probes.length.toLong)
    assert(got.getAs[Long]("m_bits") == mBits)
    assert(BigInt(got.getAs[Long]("set_bits")) == setBits)
    assert(got.getAs[Long]("fp_count") == fp.toLong)
    assert(BigInt(got.getAs[Long]("fp_ppm")) ==
      BigInt(fp) * 1000000 / probes.length)
    assert(BigInt(got.getAs[Long]("theory_ppm")) == theory)
  }

  // ---------------------------------------------------------------
  // countmin_error — CM overestimate economics vs the e·N/w bound
  // ---------------------------------------------------------------
  test("countmin_error matches a from-scratch Count-Min replay") {
    val W = 64
    val users = Tables.events(spark, dir)
      .select(col("user_id").cast("long")).collect().map(_.getLong(0))
    val nEv = BigInt(users.length)
    def cell(d: Int, u: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$d:$u").substring(0, 8), 16) % W
    // the full sketch: 3 rows × 64 cells of plain counts
    val cells = (0 to 2).map { d =>
      d -> users.groupBy(cell(d, _)).map { case (c, xs) => c -> BigInt(xs.length) }
    }.toMap
    val exact = users.groupBy(identity).map { case (u, xs) => u -> BigInt(xs.length) }
    val keys = exact.keys.filter(_ % 10 == 0).toSeq
    // est(key) = min over rows of the key's cell count; err ≥ 0 always
    val errs = keys.map { u =>
      val est = (0 to 2).map(d => cells(d)(cell(d, u))).min
      est - exact(u)
    }
    val nKeys = BigInt(keys.length)
    val got = run("countmin_error").head
    assert(BigInt(got.getAs[Long]("n_keys")) == nKeys)
    assert(BigInt(got.getAs[Long]("n_exact")) == BigInt(errs.count(_ == 0)))
    assert(BigInt(got.getAs[Long]("max_err")) == errs.max)
    assert(BigInt(got.getAs[Long]("avg_err_milli")) ==
      errs.sum * 1000 / nKeys)
    // Markov bound e·N/w in whole counts (e as the pinned micro
    // literal 2718282) and how many keys landed within it
    assert(BigInt(got.getAs[Long]("bound")) ==
      BigInt(2718282) * nEv / (BigInt(1000000) * W))
    assert(BigInt(got.getAs[Long]("n_within")) ==
      BigInt(errs.count(e => e * 1000000 * W <= BigInt(2718282) * nEv)))
  }
}
