package graft.queries

import java.time.LocalDate

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seventh wave of first-principles statistics models (rationale in
  * [[StatModelSpec]]): the time-series / order-statistics / quality-
  * control panel the registry audit after wave 6 still showed
  * unmodeled — ACF and cross-correlation, Pearson by group, the three
  * median machines (exact, MAD, rolling), z-score outliers, TWAP,
  * drawdown, the two CUSUM variants, DiD, equi-depth ranks, quantile
  * mapping, the seasonal-naive forecaster and Kleinberg-style burst
  * ratios. Engine code appears ONLY as input prep; every statistic is
  * recomputed here from its definition by explicit sorting/prefix
  * arithmetic over collected sf0.001 rows (BigInt where the engine is
  * integer-exact, IEEE doubles in the engine's own operation order
  * where the output is a double), so every comparison is EXACT.
  */
class StatModelSpec7 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def tdiv(n: BigInt, d: BigInt): BigInt = n / d

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** Daily revenue-cents grid from orders, re-aggregated at row grain. */
  private def orderDayGrid(): Seq[(LocalDate, BigInt)] =
    Tables.read(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), BigInt(r.getLong(1))))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toString)

  // ---------------------------------------------------------------
  // autocorr_lag — ACF at lags 1 and 7 over centered daily revenue
  // ---------------------------------------------------------------
  test("autocorr_lag matches the centered-series ACF definition") {
    val g = orderDayGrid()
    val n = BigInt(g.length)
    val s = g.map(_._2).sum
    val c = g.map { case (d, x) => d -> (n * x - s) }.toMap
    val den = c.values.map(v => v * v).sum
    val got = run("autocorr_lag")
    assert(got.length == 2)
    got.zip(Seq(1, 7)).foreach { case (r, lag) =>
      val pairs = c.keys.toSeq
        .flatMap(d => c.get(d.plusDays(lag)).map(lc => c(d) * lc))
      val num = pairs.sum
      assert(r.getAs[Long]("lag") == lag.toLong)
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong)
      assert(BigInt(r.getAs[Long]("n_days")) == n)
      // acf = Σ c_t·c_{t+lag} / Σ c², sign-split floor ppm
      val want = num.signum * tdiv(num.abs * 1000000, den)
      assert(BigInt(r.getAs[Long]("acf_ppm")) == want, s"lag $lag")
    }
  }

  // ---------------------------------------------------------------
  // corr_stats — Pearson r per return flag from raw moments
  // ---------------------------------------------------------------
  test("corr_stats matches Pearson correlation from raw moments") {
    val rows = Tables.read(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        Quantize.cents(col("l_quantity")).as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
      .collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val got = run("corr_stats")
    val groups = rows.groupBy(_._1)
    assert(got.length == groups.size)
    got.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      val xs = groups(f)
      val n = xs.length
      val sx = xs.map(_._2).sum
      val sy = xs.map(_._3).sum
      val sxx = xs.map(t => t._2 * t._2).sum
      val syy = xs.map(t => t._3 * t._3).sum
      val sxy = xs.map(t => t._2 * t._3).sum
      // r = (nΣxy − ΣxΣy) / sqrt((nΣx²−(Σx)²)(nΣy²−(Σy)²)), in the
      // engine's own double order over exact integer moments
      val nD = n.toDouble
      val want = (nD * sxy.toDouble - sx.toDouble * sy.toDouble) /
        math.sqrt((nD * sxx.toDouble - sx.toDouble * sx.toDouble) *
          (nD * syy.toDouble - sy.toDouble * sy.toDouble))
      assert(r.getAs[Long]("n") == n.toLong, f)
      assert(r.getAs[Double]("corr_qty_price") == want, f)
    }
  }

  // ---------------------------------------------------------------
  // exact_median — classic two-middle-ranks median per flag
  // ---------------------------------------------------------------
  test("exact_median matches the sorted two-middle-ranks definition") {
    val rows = Tables.read(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val got = run("exact_median")
    rows.groupBy(_._1).foreach { case (f, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val v1 = sorted((n + 1) / 2 - 1)
      val v2 = sorted((n + 2) / 2 - 1)
      val want = (v1 + v2) / 2
      val r = got.find(_.getString(0) == f).get
      val gotMed = r.get(r.fieldIndex("median_qty")) match {
        case d: java.math.BigDecimal => d.doubleValue
        case d: Double => d
        case x => x.toString.toDouble
      }
      assert(gotMed == want, f)
    }
  }

  // ---------------------------------------------------------------
  // mad_outliers — median/MAD/5-sigma-equivalent outlier counts
  // ---------------------------------------------------------------
  test("mad_outliers matches median-absolute-deviation from sorting") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val got = run("mad_outliers")
    rows.groupBy(_._1).foreach { case (t, xs) =>
      val vs = xs.map(_._2)
      val m = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - m)))
      val out = vs.count(v => math.abs(v - m) > 5L * mad)
      val r = got.find(_.getString(0) == t).get
      assert(r.getAs[Long]("median_cents") == m, t)
      assert(r.getAs[Long]("mad_cents") == mad, t)
      assert(r.getAs[Long]("n_outliers") == out.toLong, t)
    }
  }

  // ---------------------------------------------------------------
  // stats_outliers — 2-sigma outliers from exact integer moments
  // ---------------------------------------------------------------
  test("stats_outliers matches the moment-form z-score rule") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = run("stats_outliers")
    rows.groupBy(_._1).foreach { case (t, xs) =>
      val n = xs.length
      val s1 = xs.map(x => BigInt(x._2)).sum
      val s2 = xs.map(x => BigInt(x._2) * x._2).sum
      val nD = n.toDouble
      val s1D = s1.toDouble
      val s2D = s2.toDouble
      // |n·x − Σx| > 2·sqrt(n(nΣx² − (Σx)²)/(n−1)) — the moment form
      // of |x − mean| > 2·stddev, evaluated in the engine's order
      val thresh = 2.0 * math.sqrt(nD * (nD * s2D - s1D * s1D) / (nD - 1.0))
      val out = xs.count(x => math.abs(nD * x._2.toDouble - s1D) > thresh)
      val r = got.find(_.getString(0) == t).get
      assert(r.getAs[Long]("n") == n.toLong, t)
      assert(r.getAs[Double]("mean_value") == s1D / nD / 100.0, t)
      assert(r.getAs[Long]("n_outliers") == out.toLong, t)
    }
  }

  // ---------------------------------------------------------------
  // twap — hold-until-next time weighting within (user, day)
  // ---------------------------------------------------------------
  test("twap matches the time-weighted average from explicit sorting") {
    val rows = Tables.events(spark, dir)
      .where(col("user_id") < 40)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        to_date(col("ts")).cast("string"), unix_micros(col("ts")),
        Quantize.cents(col("value")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val got = run("twap")
    val expected = rows.groupBy(r => (r._1, r._3)).toSeq
      .sortBy { case ((u, d), _) => (u, d) }
      .map { case ((u, d), xs) =>
        val sortedEv = xs.sortBy(e => (e._4, e._2))
        val dayEnd = LocalDate.parse(d).toEpochDay * 86400000000L + 86400000000L
        val held = sortedEv.zipWithIndex.map { case (e, i) =>
          val next =
            if (i == sortedEv.length - 1) dayEnd else sortedEv(i + 1)._4
          (e._5, next - e._4)
        }
        val span = held.map(_._2).sum
        val wsum = held.map { case (vc, h) => BigInt(vc) * h }.sum
        (u, d, sortedEv.length.toLong, span, tdiv(wsum, span))
      }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (u, d, ne, span, tw)) =>
      assert(r.getAs[Long]("user_id") == u)
      assert(r.getAs[java.sql.Date]("d").toString == d, u)
      assert(r.getAs[Long]("n_events") == ne, s"$u/$d")
      assert(r.getAs[Long]("span_us") == span, s"$u/$d")
      assert(BigInt(r.getAs[Long]("twap_cents")) == tw, s"$u/$d")
    }
  }

  // ---------------------------------------------------------------
  // max_drawdown — running peak minus running sum, top 10
  // ---------------------------------------------------------------
  test("max_drawdown matches the running-peak definition") {
    val g = orderDayGrid()
    var s = BigInt(0)
    var peak = BigInt(Long.MinValue)
    val scored = g.map { case (d, x) =>
      s += x
      if (s > peak) peak = s
      (d, x, s, peak, peak - s)
    }
    val top = scored.sortBy { case (d, _, _, _, dd) => (-dd, d.toString) }
      .take(10)
    val got = run("max_drawdown")
    assert(got.length == top.length)
    got.zip(top).foreach { case (r, (d, x, rs, pk, dd)) =>
      assert(r.getAs[java.sql.Date]("d").toString == d.toString)
      assert(BigInt(r.getAs[Long]("x_cents")) == x, d)
      assert(BigInt(r.getAs[Long]("s_cents")) == rs, d)
      assert(BigInt(r.getAs[Long]("peak_cents")) == pk, d)
      assert(BigInt(r.getAs[Long]("dd_cents")) == dd, d)
    }
  }

  // ---------------------------------------------------------------
  // xcorr_lags — cross-correlation of revenue vs order count
  // ---------------------------------------------------------------
  test("xcorr_lags matches the centered cross-correlation definition") {
    val daily = Tables.read(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), BigInt(r.getLong(1))))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d, xs.map(_._2).sum, BigInt(xs.length)) }
      .sortBy(_._1.toString)
    val n = BigInt(daily.length)
    val sx = daily.map(_._2).sum
    val sy = daily.map(_._3).sum
    val cx = daily.map { case (d, x, _) => d -> (n * x - sx) }.toMap
    val cy = daily.map { case (d, _, y) => d -> (n * y - sy) }.toMap
    val denx = cx.values.map(v => v * v).sum
    val deny = cy.values.map(v => v * v).sum
    val got = run("xcorr_lags")
    assert(got.length == 7)
    got.zip(-3 to 3).foreach { case (r, lag) =>
      val pairs = cx.keys.toSeq
        .flatMap(d => cy.get(d.plusDays(lag)).map(l => cx(d) * l))
      val num = pairs.sum
      val want = math.floor(1000000.0 * num.toDouble /
        math.sqrt(denx.toDouble * deny.toDouble)).toLong
      assert(r.getAs[Long]("lag") == lag.toLong)
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong, s"lag $lag")
      assert(r.getAs[Long]("xcorr_ppm") == want, s"lag $lag")
    }
  }

  // ---------------------------------------------------------------
  // cusum_shift — scale-free CUSUM n·S_k − k·S_n, top 10
  // ---------------------------------------------------------------
  test("cusum_shift matches the cross-multiplied CUSUM definition") {
    val g = orderDayGrid()
    val n = BigInt(g.length)
    val tsum = g.map(_._2).sum
    var pre = BigInt(0)
    val scored = g.zipWithIndex.map { case ((d, x), i) =>
      pre += x
      (d, x, n * pre - BigInt(i + 1) * tsum)
    }
    val top = scored.sortBy { case (d, _, s) => (-s.abs, d.toString) }.take(10)
    val got = run("cusum_shift")
    assert(got.length == top.length)
    got.zip(top).foreach { case (r, (d, x, s)) =>
      assert(r.getAs[java.sql.Date]("d").toString == d.toString)
      assert(BigInt(r.getAs[Long]("x_cents")) == x, d)
      assert(BigInt(r.getAs[Long]("s_scaled")) == s, d)
    }
  }

  // ---------------------------------------------------------------
  // drift_cusum — one-sided reflected CUSUM per event type
  // ---------------------------------------------------------------
  test("drift_cusum matches the reflected one-sided CUSUM recurrence") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        Quantize.cents(col("value")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), BigInt(r.getLong(2))))
    val got = run("drift_cusum")
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (t, xs) =>
      val daily = xs.groupBy(_._2).toSeq
        .map { case (d, es) => (d, es.map(_._3).sum) }
        .sortBy(_._1)
      val mu = tdiv(daily.map(_._2).sum, BigInt(daily.size))
      val slack = tdiv(mu, 20)
      var r = BigInt(0)
      var m = BigInt(Long.MaxValue)
      daily.map { case (d, x) =>
        // reflected CUSUM: r_k = Σ(x − μ − slack); c_k = r_k − min(0,
        // min_{j≤k} r_j) — the standard drift detector kept exact
        r += x - mu - slack
        if (r < m) m = r
        val cus = r - (if (m < 0) m else BigInt(0))
        (t, d, x, cus, cus > tdiv(mu, 4))
      }
    }.sortBy { case (t, d, _, _, _) => (t, d) }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (row, (t, d, x, cus, drift)) =>
      assert(row.getAs[String]("event_type") == t)
      assert(row.getAs[Long]("day") == d, t)
      assert(BigInt(row.getAs[Long]("x")) == x, s"$t/$d")
      assert(BigInt(row.getAs[Long]("cusum")) == cus, s"$t/$d")
      assert(row.getAs[Boolean]("drift") == drift, s"$t/$d")
    }
  }

  // ---------------------------------------------------------------
  // diff_in_diff — 2x2 cell means and the DiD contrast
  // ---------------------------------------------------------------
  test("diff_in_diff matches the four-cell contrast definition") {
    val rows = Tables.events(spark, dir)
      .select(col("user_id").cast("string").as("u"),
        to_date(col("ts")).cast("string").as("d"),
        Quantize.cents(col("value")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), BigInt(r.getLong(2))))
    val cutoff = LocalDate.parse("2024-01-16")
    def cellMean(g: Int, post: Boolean): BigInt = {
      val xs = rows.filter { case (u, d, _) =>
        (Integer.parseInt(md5hex(u).substring(0, 4), 16) % 2) == g &&
          (!LocalDate.parse(d).isBefore(cutoff)) == post
      }
      tdiv(xs.map(_._3).sum * 1000000, BigInt(xs.length))
    }
    val tPre = cellMean(1, post = false)
    val tPost = cellMean(1, post = true)
    val cPre = cellMean(0, post = false)
    val cPost = cellMean(0, post = true)
    val got = run("diff_in_diff").head
    assert(BigInt(got.getAs[Long]("t_pre_uc")) == tPre)
    assert(BigInt(got.getAs[Long]("t_post_uc")) == tPost)
    assert(BigInt(got.getAs[Long]("c_pre_uc")) == cPre)
    assert(BigInt(got.getAs[Long]("c_post_uc")) == cPost)
    assert(BigInt(got.getAs[Long]("did_uc")) ==
      (tPost - tPre) - (cPost - cPre))
  }

  // ---------------------------------------------------------------
  // equidepth_hist — 8 equal-depth buckets from global value ranks
  // ---------------------------------------------------------------
  test("equidepth_hist matches explicit global rank bucketing") {
    val vals = Tables.read(spark, dir, "orders")
      .select(Quantize.cents(col("o_totalprice"))).collect().map(_.getLong(0))
    val n = vals.length.toLong
    val hist = vals.groupBy(identity).toSeq.map { case (v, xs) => (v, xs.length.toLong) }
      .sortBy(_._1)
    var cum = 0L
    val bucketed = hist.map { case (v, cnt) =>
      val lo = cum + 1
      cum += cnt
      (v, cnt, (lo - 1) * 8 / n)
    }
    val expected = bucketed.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (b, xs) =>
        (b, xs.map(_._1).min, xs.map(_._1).max, xs.map(_._2).sum, xs.size.toLong)
    }
    val got = run("equidepth_hist")
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (b, lo, hi, nr, nv)) =>
      assert(r.getAs[Long]("bucket") == b)
      assert(r.getAs[Long]("lo_cents") == lo, b)
      assert(r.getAs[Long]("hi_cents") == hi, b)
      assert(r.getAs[Long]("n_rows") == nr, b)
      assert(r.getAs[Long]("n_values") == nv, b)
    }
  }

  // ---------------------------------------------------------------
  // rolling_median — 7-day range-window median per priority
  // ---------------------------------------------------------------
  test("rolling_median matches the trailing-range sorted median") {
    val rows = Tables.read(spark, dir, "orders")
      .select(col("o_orderpriority"),
        to_date(col("o_orderdate")).cast("string"),
        Quantize.cents(col("o_totalprice")))
      .collect()
      .map(r => (r.getString(0), LocalDate.parse(r.getString(1)),
        BigInt(r.getLong(2))))
    val got = run("rolling_median")
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (p, xs) =>
      val daily = xs.groupBy(_._2).toSeq
        .map { case (d, es) => (d, es.map(_._3).sum) }
      val byDay = daily.toMap
      daily.map(_._1).sorted.map { d =>
        val win = (0 to 6).flatMap(o => byDay.get(d.minusDays(o))).sorted
        val k = win.length
        val med = tdiv(win((k + 1) / 2 - 1) + win(k / 2), 2)
        (p, d, k.toLong, med)
      }
    }.sortBy { case (p, d, _, _) => (p, d.toString) }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (p, d, k, med)) =>
      assert(r.getAs[String]("priority") == p)
      assert(r.getAs[java.sql.Date]("sale_day").toString == d.toString, p)
      assert(r.getAs[Long]("n_days") == k, s"$p/$d")
      assert(BigInt(r.getAs[Long]("median_cents")) == med, s"$p/$d")
    }
  }

  // ---------------------------------------------------------------
  // forecast_baseline — seasonal-naive per pseudo-weekday + MAE
  // ---------------------------------------------------------------
  test("forecast_baseline matches the train/test seasonal-naive MAE") {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).cast("string").as("d"),
        Quantize.cents(col("value")).as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), BigInt(r.getLong(1))))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d.getDayOfMonth, xs.map(_._2).sum) }
    val byDow = daily.groupBy { case (dom, _) => (dom - 1) % 7 }
    val got = run("forecast_baseline")
    val expected = byDow.toSeq.sortBy(_._1).flatMap { case (dow, xs) =>
      val train = xs.filter(_._1 <= 23).map(_._2)
      val test = xs.filter(_._1 > 23).map(_._2)
      if (train.isEmpty || test.isEmpty) None
      else {
        val fc = tdiv(train.sum, BigInt(train.length))
        val mae = tdiv(test.map(v => (v - fc).abs).sum, BigInt(test.length))
        Some((dow.toLong, train.length.toLong, fc, test.length.toLong, mae))
      }
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (dow, nt, fc, ntest, mae)) =>
      assert(r.getAs[Long]("dow") == dow)
      assert(r.getAs[Long]("n_train") == nt, dow)
      assert(BigInt(r.getAs[Long]("forecast_cents")) == fc, dow)
      assert(r.getAs[Long]("n_test") == ntest, dow)
      assert(BigInt(r.getAs[Long]("mae_cents")) == mae, dow)
    }
  }

  // ---------------------------------------------------------------
  // quantile_map — decile-rank value mapping between segments
  // ---------------------------------------------------------------
  test("quantile_map matches explicit decile ranks per segment") {
    val seg = Tables.read(spark, dir, "customer")
      .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey").cast("long"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vals = Tables.read(spark, dir, "orders")
      .select(col("o_custkey").cast("long"),
        Quantize.cents(col("o_totalprice")))
      .collect()
      .flatMap(r => seg.get(r.getLong(0)).map(s => (s, r.getLong(1))))
    def decile(s: String, q: Int): Long = {
      val sorted = vals.filter(_._1 == s).map(_._2).sorted
      val n = sorted.length.toLong
      // rank r_q = (q·n + 90) div 100 on 1-based sorted order
      sorted(((q * n + 90) / 100 - 1).toInt)
    }
    val got = run("quantile_map")
    assert(got.length == 9)
    got.zip(10 to 90 by 10).foreach { case (r, q) =>
      val va = decile("BUILDING", q)
      val vb = decile("AUTOMOBILE", q)
      assert(r.getAs[Long]("q") == q.toLong)
      assert(r.getAs[Long]("v_a_c") == va, q)
      assert(r.getAs[Long]("v_b_c") == vb, q)
      assert(r.getAs[Long]("shift_c") == vb - va, q)
      assert(BigInt(r.getAs[Long]("ratio_ppm")) ==
        tdiv(BigInt(vb) * 1000000, BigInt(va)), q)
    }
  }

  // ---------------------------------------------------------------
  // burst_days — trailing-week ratio with full-window edge rule
  // ---------------------------------------------------------------
  test("burst_days matches the trailing-7-day ratio definition") {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).cast("string"))
      .collect()
      .map(r => LocalDate.parse(r.getString(0)))
      .groupBy(identity).map { case (d, xs) => d -> BigInt(xs.length) }
    val got = run("burst_days")
    val expected = daily.keys.toSeq.sortBy(_.toString).flatMap { d =>
      val trail = (1 to 7).flatMap(o => daily.get(d.minusDays(o)))
      if (trail.length != 7) None
      else {
        val ts = trail.sum
        val ratio = tdiv(daily(d) * 7 * 1000000, ts)
        Some((d, daily(d), ts, ratio, ratio > 3000000))
      }
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (d, n, ts, ratio, burst)) =>
      assert(r.getAs[java.sql.Date]("d").toString == d.toString)
      assert(BigInt(r.getAs[Long]("n")) == n, d)
      assert(BigInt(r.getAs[Long]("trail_sum")) == ts, d)
      assert(BigInt(r.getAs[Long]("ratio_ppm")) == ratio, d)
      assert(r.getAs[Boolean]("burst") == burst, d)
    }
  }
}
