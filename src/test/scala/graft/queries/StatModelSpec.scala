package graft.queries

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** First-principles model checks for the formula-bearing statistics
  * queries — the round-8 lesson (ADVICE's p_chart finding): the DuckDB
  * oracle REPLICATES each query's formula, so a hash-green row proves
  * engine ≡ oracle, not engine ≡ statistics. A wrong control-limit or
  * variance formula sails through 392/392. This spec closes that
  * blindspot the way `SketchesSpec`/`GraphPropertySpec` do for
  * sketches/graphs: each statistic is recomputed from its TEXTBOOK
  * definition in plain Scala over collected sf0.001 rows — independent
  * arithmetic (sorting, ranking, pair counting, exact BigInt
  * rationals), never the query's own SQL shape — and compared against
  * the registered query's output.
  *
  * Comparison discipline:
  *  - integer-exact outputs (floor-division ppm over exact counts)
  *    must match EXACTLY;
  *  - floor(double)-quantized outputs compare within ±1 quantum: the
  *    model computes the TRUE value (exact rationals / correctly-
  *    rounded doubles), the engine a fixed-order double chain — they
  *    can legitimately disagree by one unit exactly at a floor
  *    boundary, while a wrong FORMULA (the failure class this spec
  *    exists for) moves results by orders of magnitude more.
  *
  * Engine code is used ONLY to prepare input relations (table reads,
  * the shared cent quantization, `Tables.events`' timestamp dispatch,
  * `TrainingPipeline.qualityScoredDocs`' feature scores) — the
  * statistic under test is always recomputed here from scratch.
  */
class StatModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def cents(c: String) = round(col(c) * 100).cast("long")

  /** The suite's sign-split idiom: divide magnitudes, reapply sign
    * (BigInt `/` truncates toward zero — Spark `div` semantics; all
    * magnitudes here are non-negative, so it is also floor).
    */
  private def signSplit(num: BigInt, den: BigInt): BigInt =
    if (num < 0) -((-num) / den) else num / den

  /** Exact rational — statistics whose engine form is a double chain
    * over exact integer moments are modelled here as TRUE rationals,
    * quantized only at the end.
    */
  private case class Frac(n: BigInt, d: BigInt) {
    def +(o: Frac) = Frac(n * o.d + o.n * d, d * o.d)
    def -(o: Frac) = Frac(n * o.d - o.n * d, d * o.d)
    def /(o: Frac) = {
      val s = o.n.signum
      Frac(n * o.d * s, d * o.n.abs)
    }
    def floorTimes(q: BigInt): BigInt = {
      val num = q * n
      if (num.signum >= 0) num / d else -((-num + d - 1) / d)
    }
    def toDouble: Double = (BigDecimal(n) / BigDecimal(d)).toDouble
  }

  private def approx(got: Long, want: BigInt, tol: Long, label: String): Unit =
    assert(
      (BigInt(got) - want).abs <= tol,
      s"$label: got $got, first-principles $want (tol $tol)")

  /** One-way ANOVA from the definition: SSB = Σ n_g(x̄_g − x̄)²,
    * SSW = Σ_g Σ (x − x̄_g)², F = (SSB/(k−1)) / (SSW/(N−k)) — carried
    * as exact rationals via the algebraically-equal moment identities
    * over BigInt sums (no double until the caller quantizes).
    */
  private def anovaFrac(groups: Map[String, Seq[Long]]): (Frac, Frac, Frac) = {
    val k = groups.size
    val n = groups.values.map(_.size).sum
    val s = groups.values.flatten.map(BigInt(_)).sum
    val q = groups.values.flatten.map(v => BigInt(v) * v).sum
    // Σ s_g²/n_g as one exact fraction
    val between = groups.values
      .map(g => Frac(g.map(BigInt(_)).sum.pow(2), g.size))
      .reduce(_ + _)
    val ssb = between - Frac(s * s, n)
    val ssw = Frac(q, 1) - between
    val f = (ssb / Frac(k - 1, 1)) / (ssw / Frac(n - k, 1))
    val eta2 = ssb / (ssb + ssw)
    (f, eta2, ssw)
  }

  // ---------------------------------------------------------------
  // anova_f — one-way ANOVA of l_extendedprice cents across N/A/R
  // ---------------------------------------------------------------
  test("anova_f matches the textbook one-way ANOVA") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag").as("g"), cents("l_extendedprice").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSeq }
    val (f, eta2, _) = anovaFrac(groups)
    val got = run("anova_f").head
    assert(got.getAs[Long]("n") == rows.length)
    assert(got.getAs[Long]("n_n") == groups("N").size)
    assert(got.getAs[Long]("n_a") == groups("A").size)
    assert(got.getAs[Long]("n_r") == groups("R").size)
    approx(got.getAs[Long]("f_milli"), f.floorTimes(1000), 1, "f_milli")
    approx(got.getAs[Long]("eta2_ppm"), eta2.floorTimes(1000000), 1, "eta2_ppm")
  }

  // ---------------------------------------------------------------
  // levene_bf — Brown–Forsythe: ANOVA on |x − median_g|
  // ---------------------------------------------------------------
  test("levene_bf matches Brown–Forsythe from sorted medians") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag").as("g"), cents("l_extendedprice").as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val groups = rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSeq }
    // lower median: smallest value with 2·(# ≤ v) ≥ n ⇒ sorted((n−1)/2)
    val med = groups.map { case (g, xs) =>
      g -> xs.sorted.apply((xs.size - 1) / 2)
    }
    val devs = groups.map { case (g, xs) =>
      g -> xs.map(x => math.abs(x - med(g)))
    }
    val (f, _, _) = anovaFrac(devs)
    val got = run("levene_bf").head
    assert(got.getAs[Long]("n") == rows.length)
    assert(got.getAs[Long]("med_n_c") == med("N"))
    assert(got.getAs[Long]("med_a_c") == med("A"))
    assert(got.getAs[Long]("med_r_c") == med("R"))
    approx(got.getAs[Long]("w_milli"), f.floorTimes(1000), 1, "w_milli")
  }

  // ---------------------------------------------------------------
  // seasonal_strength — η² of ISO weekday on the daily revenue grid
  // ---------------------------------------------------------------
  test("seasonal_strength matches textbook eta-squared by weekday") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        cents("o_totalprice").as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), r.getLong(1)))
      .groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).sum }
    val byWeekday = daily.toSeq
      .groupBy { case (d, _) => d.getDayOfWeek.getValue.toString }
      .map { case (wd, xs) => wd -> xs.map(_._2) }
    val (_, eta2, _) = anovaFrac(byWeekday)
    val got = run("seasonal_strength").head
    assert(got.getAs[Long]("n_days") == daily.size)
    approx(got.getAs[Long]("eta2_ppm"), eta2.floorTimes(1000000), 1, "eta2_ppm")
  }

  // ---------------------------------------------------------------
  // spearman_rho — rank correlation p_size vs p_retailprice cents
  // ---------------------------------------------------------------
  test("spearman_rho matches Pearson over tie-averaged ranks") {
    val rows = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_size").cast("long").as("x"),
        cents("p_retailprice").as("y"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // tie-averaged rank, doubled to stay integer: 2·r(v) = 2·|{<v}| + |{=v}| + 1
    def rank2(vs: Seq[Long]): Map[Long, BigInt] = {
      val hist = vs.groupBy(identity).view.mapValues(_.size).toMap
      val sorted = hist.keys.toSeq.sorted
      var below = 0L
      sorted.map { v =>
        val r = BigInt(2 * below + hist(v) + 1)
        below += hist(v)
        v -> r
      }.toMap
    }
    val rx = rank2(rows.map(_._1))
    val ry = rank2(rows.map(_._2))
    val n = BigInt(rows.length)
    val pairs = rows.map { case (x, y) => (rx(x), ry(y)) }
    val sx = pairs.map(_._1).sum
    val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy
    val d1 = n * sxx - sx * sx
    val d2 = n * syy - sy * sy
    val got = run("spearman_rho").head
    assert(got.getAs[Long]("n") == rows.length)
    if (d1 == 0 || d2 == 0) assert(got.isNullAt(got.fieldIndex("rho_ppm")))
    else {
      val mag = math.floor(1000000.0 * num.abs.toDouble /
        (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))).toLong
      val want = BigInt(if (num < 0) -mag else mag)
      approx(got.getAs[Long]("rho_ppm"), want, 1, "rho_ppm")
    }
  }

  // ---------------------------------------------------------------
  // cramers_v — χ² effect size over the mktsegment × nation grid
  // ---------------------------------------------------------------
  test("cramers_v matches chi-square over the full contingency grid") {
    val rows = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_mktsegment").as("s"), col("c_nationkey").cast("long").as("t"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val obs = rows.groupBy(identity).view.mapValues(x => BigInt(x.size)).toMap
    val segs = rows.map(_._1).distinct
    val nats = rows.map(_._2).distinct
    val rMarg = segs.map(s => s -> rows.count(_._1 == s)).toMap
    val cMarg = nats.map(t => t -> rows.count(_._2 == t)).toMap
    val n = BigInt(rows.length)
    // per-cell χ² term (O − E)²/E with E = R·C/N ⇒ exactly
    // (N·O − R·C)² / (N·R·C); floored to nano per cell (the pinned
    // quantized semantics), summed exactly
    val chi2Nano = (for { s <- segs; t <- nats } yield {
      val o = obs.getOrElse((s, t), BigInt(0))
      val r = BigInt(rMarg(s))
      val c = BigInt(cMarg(t))
      val dev = n * o - r * c
      Frac(dev * dev, n * r * c).floorTimes(1000000000L)
    }).sum
    val got = run("cramers_v").head
    assert(got.getAs[Long]("n") == rows.length)
    assert(got.getAs[Long]("n_rows") == segs.size)
    assert(got.getAs[Long]("n_cols") == nats.size)
    // engine floors each cell in double: ≤1 nano per cell of slack
    val cells = segs.size.toLong * nats.size
    approx(got.getAs[Long]("chi2_milli"), chi2Nano / 1000000, 1, "chi2_milli")
    val k = math.min(segs.size, nats.size) - 1
    val v = math.sqrt(
      (chi2Nano.toDouble / 1e9) / (n.toDouble * k))
    approx(got.getAs[Long]("v_ppm"),
      BigInt(math.floor(v * 1e6).toLong), 1, "v_ppm")
    assert(cells <= 200, "grid stayed bounded") // sanity on the model itself
  }

  // ---------------------------------------------------------------
  // gk_lambda — Goodman–Kruskal λ over documents lang × source
  // ---------------------------------------------------------------
  test("gk_lambda matches the PRE definition exactly") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), col("source"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = BigInt(rows.length)
    val grid = rows.groupBy(identity).view.mapValues(_.size).toMap
    val mLang = BigInt(rows.groupBy(_._1).values.map(_.size).max)
    val mSrc = BigInt(rows.groupBy(_._2).values.map(_.size).max)
    // Σ over strata of the within-stratum modal count
    val smLs = BigInt(rows.groupBy(_._2).values
      .map(g => g.groupBy(_._1).values.map(_.size).max).sum)
    val smSl = BigInt(rows.groupBy(_._1).values
      .map(g => g.groupBy(_._2).values.map(_.size).max).sum)
    val want = Map(
      "lang|source" -> (smLs - mLang, n - mLang),
      "source|lang" -> (smSl - mSrc, n - mSrc),
      "symmetric" -> (smLs - mLang + smSl - mSrc, n * 2 - mLang - mSrc))
    val got = run("gk_lambda")
    assert(got.length == 3)
    got.foreach { r =>
      val (saved, base) = want(r.getAs[String]("direction"))
      assert(BigInt(r.getAs[Long]("saved")) == saved, r)
      assert(BigInt(r.getAs[Long]("base")) == base, r)
      assert(BigInt(r.getAs[Long]("lambda_ppm")) == saved * 1000000 / base, r)
    }
    assert(grid.nonEmpty)
  }

  // ---------------------------------------------------------------
  // mann_kendall — S, tie-corrected variance, z on daily revenue
  // ---------------------------------------------------------------
  test("mann_kendall matches the tie-corrected textbook test") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        cents("o_totalprice").as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val xs = daily.map(_._2)
    val nD = xs.length
    var s = 0L
    for (i <- 0 until nD; j <- i + 1 until nD)
      s += java.lang.Long.signum(xs(j) - xs(i))
    val tieTerm = xs.groupBy(identity).values
      .map(_.size.toLong)
      .map(c => c * (c - 1) * (2 * c + 5)).sum
    val var18 = nD.toLong * (nD - 1) * (2L * nD + 5) - tieTerm
    val zMilli =
      if (s == 0 || var18 <= 0) 0L
      else {
        val mag = math.floor(
          1000.0 * (math.abs(s) - 1) / math.sqrt(var18.toDouble / 18.0)).toLong
        if (s > 0) mag else -mag
      }
    val got = run("mann_kendall").head
    assert(got.getAs[Long]("n_days") == nD)
    assert(got.getAs[Long]("s_stat") == s)
    assert(got.getAs[Long]("var18") == var18)
    approx(got.getAs[Long]("z_milli"), BigInt(zMilli), 1, "z_milli")
    // the ±1.96 verdict derives from the ENGINE's z (pins the rule)
    val gz = got.getAs[Long]("z_milli")
    val wantTrend =
      if (gz > 1960) "increasing" else if (gz < -1960) "decreasing" else "none"
    assert(got.getAs[String]("trend") == wantTrend)
  }

  // ---------------------------------------------------------------
  // theil_sen — median of pairwise weekly slopes + OLS beside it
  // ---------------------------------------------------------------
  test("theil_sen matches median-of-pairwise-slopes and OLS") {
    val weekly = spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        cents("o_totalprice").as("c"))
      .collect()
      .map { r =>
        val d = LocalDate.parse(r.getString(0))
        val wk = ChronoUnit.DAYS.between(LocalDate.of(1992, 1, 1), d) / 7
        (wk, r.getLong(1))
      }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
      .toSeq.sortBy(_._1)
    val slopes = (for {
      i <- weekly.indices; j <- (i + 1) until weekly.length
    } yield {
      val (w1, y1) = weekly(i); val (w2, y2) = weekly(j)
      math.floor((y2 - y1) * 1000.0 / (w2 - w1)).toLong
    }).sorted
    val nPairs = slopes.length
    val tsSlope = slopes((nPairs - 1) / 2) // smallest s with 2·cum ≥ n
    val n = BigInt(weekly.length)
    val sx = weekly.map(w => BigInt(w._1)).sum
    val sy = weekly.map(w => BigInt(w._2 / 100)).sum
    val sxy = weekly.map(w => BigInt(w._1) * (w._2 / 100)).sum
    val sxx = weekly.map(w => BigInt(w._1) * w._1).sum
    val ols = math.floor(
      100000.0 * (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
      .toLong
    val got = run("theil_sen").head
    assert(got.getAs[Long]("n_weeks") == weekly.length)
    assert(got.getAs[Long]("n_pairs") == nPairs)
    assert(got.getAs[Long]("ts_slope_mc") == tsSlope)
    approx(got.getAs[Long]("ols_slope_mc"), BigInt(ols), 1, "ols_slope_mc")
  }

  // ---------------------------------------------------------------
  // mannwhitney_u — brute-force pair counting, BUILDING vs MACHINERY
  // ---------------------------------------------------------------
  test("mannwhitney_u matches brute-force 2U pair counting") {
    val seg = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vals = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long"), cents("o_totalprice"))
      .collect()
      .flatMap { r =>
        seg.get(r.getLong(0)) match {
          case Some("BUILDING") => Some((true, r.getLong(1)))
          case Some("MACHINERY") => Some((false, r.getLong(1)))
          case _ => None
        }
      }
    val pos = vals.filter(_._1).map(_._2)
    val neg = vals.filterNot(_._1).map(_._2)
    // 2U = Σ_pairs (2·[p > n] + [p = n]) — ties count half a pair
    var u2 = BigInt(0)
    for (p <- pos; q <- neg)
      u2 += (if (p > q) 2 else if (p == q) 1 else 0)
    val n1n2 = BigInt(pos.length) * neg.length
    val got = run("mannwhitney_u").head
    assert(got.getAs[Long]("n_building") == pos.length)
    assert(got.getAs[Long]("n_machinery") == neg.length)
    assert(BigInt(got.getAs[Long]("u2")) == u2)
    assert(BigInt(got.getAs[Long]("rank_biserial_ppm")) ==
      signSplit((u2 - n1n2) * 1000000, n1n2))
  }

  // ---------------------------------------------------------------
  // ks_test — max CDF gap, click vs purchase value cents
  // ---------------------------------------------------------------
  test("ks_test matches the brute-force two-sample KS statistic") {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(cents("value").as("vc"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clicks = ev.filter(_._2 == "click").map(_._1)
    val purch = ev.filter(_._2 == "purchase").map(_._1)
    val n1 = BigInt(clicks.length)
    val n2 = BigInt(purch.length)
    val grid = ev.map(_._1).distinct.sorted
    val dns = grid.map { v =>
      val f1 = BigInt(clicks.count(_ <= v))
      val f2 = BigInt(purch.count(_ <= v))
      v -> (f1 * n2 - f2 * n1).abs
    }
    val maxdn = dns.map(_._2).max
    val atCents = dns.filter(_._2 == maxdn).map(_._1).min
    val got = run("ks_test").head
    assert(BigInt(got.getAs[Long]("n1")) == n1)
    assert(BigInt(got.getAs[Long]("n2")) == n2)
    assert(BigInt(got.getAs[Long]("d_ppm")) == maxdn * 1000000 / (n1 * n2))
    assert(got.getAs[Long]("at_cents") == atCents)
    // α=0.05: D > 1.358·√((n1+n2)/(n1·n2)), cross-multiplied exact
    val reject = maxdn * maxdn * 1000000 >
      BigInt(1844164) * (n1 + n2) * n1 * n2
    assert(got.getAs[Boolean]("reject_95") == reject)
  }

  // ---------------------------------------------------------------
  // auc_roc — brute-force P(score⁺ > score⁻) + ½ ties
  // ---------------------------------------------------------------
  test("auc_roc matches brute-force pair counting") {
    val rows = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("score").cast("long"), (col("lang") === "en"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    var numer2 = BigInt(0)
    for (p <- pos; q <- neg)
      numer2 += (if (p > q) 2 else if (p == q) 1 else 0)
    val got = run("auc_roc").head
    assert(got.getAs[Long]("n_pos") == pos.length)
    assert(got.getAs[Long]("n_neg") == neg.length)
    val auc = numer2 * 500000 / (BigInt(pos.length) * neg.length)
    assert(BigInt(got.getAs[Long]("auc_ppm")) == auc)
    assert(BigInt(got.getAs[Long]("gini_ppm")) == auc * 2 - 1000000)
  }

  // ---------------------------------------------------------------
  // benford_test — leading significant digit of o_totalprice cents
  // ---------------------------------------------------------------
  test("benford_test matches leading-digit counting and log-table ppm") {
    val digits = spark.read.parquet(s"$dir/orders.parquet")
      .select(cents("o_totalprice"))
      .collect()
      .map(r => r.getLong(0).toString.charAt(0).asDigit)
    val tot = BigInt(digits.length)
    // expected shares from the DEFINITION log10(1 + 1/d), floored ppm
    val expPpm = (1 to 9).map(d =>
      d -> math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong).toMap
    val counts = digits.groupBy(identity).view.mapValues(x => BigInt(x.size))
    val got = run("benford_test")
    assert(got.map(_.getAs[Long]("n_obs")).sum == digits.length)
    got.foreach { r =>
      val d = r.getAs[Long]("digit").toInt
      val nObs = counts.getOrElse(d, BigInt(0))
      assert(BigInt(r.getAs[Long]("n_obs")) == nObs, s"digit $d")
      val obsPpm = nObs * 1000000 / tot
      assert(BigInt(r.getAs[Long]("obs_ppm")) == obsPpm, s"digit $d")
      assert(r.getAs[Long]("exp_ppm") == expPpm(d), s"digit $d exp")
      assert(BigInt(r.getAs[Long]("dev_ppm")) == obsPpm - expPpm(d), s"digit $d")
    }
  }

  // ---------------------------------------------------------------
  // chi_square — independence of o_orderpriority × o_orderstatus
  // ---------------------------------------------------------------
  test("chi_square matches the (O-E)²/E definition") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"), col("o_orderstatus"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.size).toMap
    val rowM = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val colM = rows.groupBy(_._2).view.mapValues(_.size).toMap
    // textbook (O − E)²/E per OBSERVED cell (the query's grid is the
    // observed cells — empty cells never form in its groupBy)
    val chi2 = cells.map { case ((p, s), o) =>
      val e = rowM(p).toDouble * colM(s) / n
      (o - e) * (o - e) / e
    }.sum
    val got = run("chi_square").head
    assert(got.getAs[Long]("n_orders") == rows.length)
    assert(got.getAs[Long]("dof") ==
      (rowM.size - 1).toLong * (colM.size - 1))
    val gotChi2 = got.getAs[Double]("chi2")
    assert(math.abs(gotChi2 - chi2) <= 1e-9 * math.max(1.0, chi2),
      s"chi2: got $gotChi2, model $chi2")
  }

  // ---------------------------------------------------------------
  // isotonic_calibration — PAVA ≡ minimax identity, exact rationals
  // ---------------------------------------------------------------
  test("isotonic_calibration matches sequential PAVA on exact rationals") {
    val rows = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("score").cast("long"), (col("lang") === "en"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val binned = rows.map { case (score, pos) =>
      val p = math.min(math.max(score, 0L), 1000L) * 1000
      (math.min(p / 100000, 9L), pos)
    }
    val bins = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, xs) =>
      (b, BigInt(xs.size), BigInt(xs.count(_._2)))
    }
    // sequential pool-adjacent-violators with exact rational block means
    case class Block(npos: BigInt, n: BigInt) {
      def mean = Frac(npos, n)
      def merge(o: Block) = Block(npos + o.npos, n + o.n)
    }
    var stack = List.empty[(Block, Int)] // (block, #bins pooled)
    bins.foreach { case (_, bn, bp) =>
      var cur = (Block(bp, bn), 1)
      while (stack.nonEmpty &&
        (stack.head._1.mean - cur._1.mean).n.signum > 0) {
        cur = (stack.head._1.merge(cur._1), stack.head._2 + cur._2)
        stack = stack.tail
      }
      stack = cur :: stack
    }
    val fitted = stack.reverse.flatMap { case (b, cnt) =>
      Seq.fill(cnt)(b.mean.floorTimes(1000000))
    }
    val got = run("isotonic_calibration").sortBy(_.getAs[Long]("bin"))
    assert(got.length == bins.length)
    got.zip(bins).zip(fitted).foreach { case ((r, (b, bn, bp)), isoWant) =>
      assert(r.getAs[Long]("bin") == b)
      assert(BigInt(r.getAs[Long]("n")) == bn)
      assert(BigInt(r.getAs[Long]("npos")) == bp)
      assert(BigInt(r.getAs[Long]("raw_ppm")) == bp * 1000000 / bn)
      // PAVA fit ≡ minimax identity; floor commutes with max/min
      // (both monotone), so the exact-rational fit floors to the
      // engine's quantize-then-minimax integers
      assert(BigInt(r.getAs[Long]("iso_ppm")) == isoWant, s"bin $b iso")
    }
    // monotonicity of the published fit — structural property of PAVA
    val iso = got.map(_.getAs[Long]("iso_ppm"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
  }

  // ---------------------------------------------------------------
  // stratified_effect — per-stratum gaps + treated-weighted ATT
  // ---------------------------------------------------------------
  test("stratified_effect matches the direct-standardization ATT") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1) < 12, r.getString(2))).toMap
    val cells = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long"), cents("o_totalprice"))
      .collect()
      .flatMap { r => cust.get(r.getLong(0)).map { case (t, s) =>
        ((s, t), r.getLong(1))
      } }
      .groupBy(_._1).view
      .mapValues { xs => (BigInt(xs.length), xs.map(x => BigInt(x._2)).sum) }
      .toMap
    val strata = cells.keys.map(_._1).toSeq.distinct.sorted
    val wide = strata.map { s =>
      val (nt, st) = cells((s, true))
      val (nc, sc) = cells((s, false))
      (s, nt, st / nt, nc, sc / nc) // mean = sum div n, exact floor
    }
    val attNum = wide.map { case (_, nt, mt, _, mc) => nt * (mt - mc) }.sum
    val attDen = wide.map(_._2).sum
    val got = run("stratified_effect")
    val byName = got.map(r => r.getAs[String]("stratum") -> r).toMap
    wide.foreach { case (s, nt, mt, nc, mc) =>
      val r = byName(s)
      assert(BigInt(r.getAs[Long]("n_treat")) == nt, s)
      assert(BigInt(r.getAs[Long]("m_treat_c")) == mt, s)
      assert(BigInt(r.getAs[Long]("n_control")) == nc, s)
      assert(BigInt(r.getAs[Long]("m_control_c")) == mc, s)
      assert(BigInt(r.getAs[Long]("diff_c")) == mt - mc, s)
    }
    val att = byName("zz_att")
    assert(BigInt(att.getAs[Long]("n_treat")) == attDen)
    assert(BigInt(att.getAs[Long]("diff_c")) == attNum / attDen)
  }

  // ---------------------------------------------------------------
  // did_estimate — four cells and the difference-in-differences
  // ---------------------------------------------------------------
  test("did_estimate matches the four-cell DiD from raw rows") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1) < 12)).toMap
    val cells = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long"),
        to_date(col("o_orderdate")).cast("string"), cents("o_totalprice"))
      .collect()
      .flatMap { r => cust.get(r.getLong(0)).map { treat =>
        val post = !LocalDate.parse(r.getString(1))
          .isBefore(LocalDate.of(1996, 1, 1))
        ((if (treat) "treat" else "control", if (post) "post" else "pre"),
          r.getLong(2))
      } }
      .groupBy(_._1).view
      .mapValues(xs => (BigInt(xs.length), xs.map(x => BigInt(x._2)).sum))
      .toMap
    def mean(g: String, p: String): BigInt = {
      val (n, s) = cells((g, p)); s / n
    }
    val did = mean("treat", "post") - mean("treat", "pre") -
      mean("control", "post") + mean("control", "pre")
    val got = run("did_estimate")
    got.foreach { r =>
      (r.getAs[String]("grp"), r.getAs[String]("period")) match {
        case ("zz_did", _) =>
          assert(BigInt(r.getAs[Long]("mean_c")) == did)
        case (g, p) =>
          val (n, s) = cells((g, p))
          assert(BigInt(r.getAs[Long]("n")) == n, (g, p))
          assert(BigInt(r.getAs[Long]("sum_c")) == s, (g, p))
          assert(BigInt(r.getAs[Long]("mean_c")) == s / n, (g, p))
      }
    }
    assert(got.length == 5)
  }

  // ---------------------------------------------------------------
  // capture_recapture — Lincoln–Petersen / Chapman from raw captures
  // ---------------------------------------------------------------
  test("capture_recapture matches LP/Chapman from raw capture sets") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = ev.filter(_._2 == "click").map(_._1).toSet
    val b = ev.filter(_._2 == "purchase").map(_._1).toSet
    val n1 = BigInt(a.size)
    val n2 = BigInt(b.size)
    val m = BigInt((a intersect b).size)
    val nTrue = BigInt((a union b).size)
    val lp = if (m == 0) None else Some(n1 * n2 / m)
    val chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val err = signSplit((chapman - nTrue) * 1000000, nTrue)
    val got = run("capture_recapture").head
    assert(BigInt(got.getAs[Long]("n1")) == n1)
    assert(BigInt(got.getAs[Long]("n2")) == n2)
    assert(BigInt(got.getAs[Long]("overlap")) == m)
    assert(BigInt(got.getAs[Long]("n_true")) == nTrue)
    lp match {
      case Some(v) => assert(BigInt(got.getAs[Long]("lp_est")) == v)
      case None => assert(got.isNullAt(got.fieldIndex("lp_est")))
    }
    assert(BigInt(got.getAs[Long]("chapman_est")) == chapman)
    assert(BigInt(got.getAs[Long]("err_ppm")) == err)
  }

  // ---------------------------------------------------------------
  // wasserstein_1d — ∫|F1−F2| over the pooled grid, exact integers
  // ---------------------------------------------------------------
  test("wasserstein_1d matches the integral transport definition") {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(cents("value").as("vc"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clicks = ev.filter(_._2 == "click").map(_._1)
    val purch = ev.filter(_._2 == "purchase").map(_._1)
    val n1 = BigInt(clicks.length)
    val n2 = BigInt(purch.length)
    val grid = ev.map(_._1).distinct.sorted
    // W1·n1·n2 = Σ_v |F1(v)·n2 − F2(v)·n1| · (next(v) − v)
    var tot = BigInt(0)
    for (i <- grid.indices.dropRight(1)) {
      val v = grid(i)
      val f1 = BigInt(clicks.count(_ <= v))
      val f2 = BigInt(purch.count(_ <= v))
      tot += (f1 * n2 - f2 * n1).abs * (grid(i + 1) - v)
    }
    val s1 = clicks.map(BigInt(_)).sum
    val s2 = purch.map(BigInt(_)).sum
    val w1Milli = tot * 1000 / (n1 * n2)
    val gapMilli = (s1 * n2 - s2 * n1).abs * 1000 / (n1 * n2)
    val got = run("wasserstein_1d").head
    assert(BigInt(got.getAs[Long]("n1")) == n1)
    assert(BigInt(got.getAs[Long]("n2")) == n2)
    assert(BigInt(got.getAs[Long]("w1_cents_milli")) == w1Milli)
    assert(BigInt(got.getAs[Long]("mean_gap_cents_milli")) == gapMilli)
    // transport identity W1 ≥ |mean1 − mean2| — true of the MODEL too
    assert(w1Milli >= gapMilli)
    assert(got.getAs[Boolean]("dominates_mean_gap") == (w1Milli >= gapMilli))
  }

  // ---------------------------------------------------------------
  // hellinger_drift — ½Σ(√p−√q)² over 10 quantity bins, 1996 vs 1997
  // ---------------------------------------------------------------
  test("hellinger_drift matches the f-divergence definition per bin") {
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("long").as("q"),
        year(to_date(col("l_shipdate"))).as("yr"))
      .where(col("yr").isin(1996, 1997))
      .collect()
      .map(r => ((r.getLong(0) - 1) / 5, r.getInt(1)))
    val bins = rows.map(_._1).distinct.sorted
    val c1 = rows.filter(_._2 == 1996).groupBy(_._1).view.mapValues(_.size).toMap
    val c2 = rows.filter(_._2 == 1997).groupBy(_._1).view.mapValues(_.size).toMap
    val t1 = BigInt(rows.count(_._2 == 1996))
    val t2 = BigInt(rows.count(_._2 == 1997))
    val got = run("hellinger_drift").sortBy(_.getAs[Long]("bin"))
    val perBin = got.filter(_.getAs[Long]("bin") < 10)
    assert(perBin.length == bins.length)
    var sumH = BigInt(0)
    var sumP = BigInt(0)
    var sumQ = BigInt(0)
    perBin.zip(bins).foreach { case (r, b) =>
      val n1 = BigInt(c1.getOrElse(b, 0))
      val n2 = BigInt(c2.getOrElse(b, 0))
      assert(r.getAs[Long]("bin") == b)
      assert(BigInt(r.getAs[Long]("n1")) == n1, s"bin $b")
      assert(BigInt(r.getAs[Long]("n2")) == n2, s"bin $b")
      val pPpm = n1 * 1000000 / t1
      val qPpm = n2 * 1000000 / t2
      assert(BigInt(r.getAs[Long]("p_ppm")) == pPpm, s"bin $b")
      assert(BigInt(r.getAs[Long]("q_ppm")) == qPpm, s"bin $b")
      val diff = math.sqrt(n1.toDouble / t1.toDouble) -
        math.sqrt(n2.toDouble / t2.toDouble)
      approx(r.getAs[Long]("h_nano"),
        BigInt(math.floor(diff * diff * 1e9).toLong), 1, s"bin $b h_nano")
      sumH += BigInt(r.getAs[Long]("h_nano"))
      sumP += pPpm
      sumQ += qPpm
    }
    val summary = got.find(_.getAs[Long]("bin") == 10).get
    assert(BigInt(summary.getAs[Long]("n1")) == t1)
    assert(BigInt(summary.getAs[Long]("n2")) == t2)
    assert(BigInt(summary.getAs[Long]("p_ppm")) == sumP)
    assert(BigInt(summary.getAs[Long]("q_ppm")) == sumQ)
    // summary h_nano is the sum of the (already-compared) bin rows
    assert(BigInt(summary.getAs[Long]("h_nano")) == sumH)
  }

  // ---------------------------------------------------------------
  // pacf_lags — Durbin–Levinson from the definition, two ways
  // ---------------------------------------------------------------
  test("pacf_lags matches Durbin-Levinson (quantized replay + float bound)") {
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string").as("d"),
        cents("o_totalprice").as("c"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
    val n = BigInt(daily.size)
    val s = daily.values.map(BigInt(_)).sum
    val c = daily.map { case (d, x) => d -> (n * x - s) }
    val den = c.values.map(v => v * v).sum
    val r = (1 to 5).map { lag =>
      val num = c.collect {
        case (d, v) if c.contains(d.plusDays(lag.toLong)) =>
          v * c(d.plusDays(lag.toLong))
      }.sum
      signSplit(num * 1000000, den).toLong
    }
    // (a) replay of the PUBLISHED quantized recursion in plain Scala
    // (loop form, ppm Longs, truncating div — independent of the SQL
    // unrolling): phi(k,k) = (r_k − Σ_j φ(k−1,j)·r_{k−j}) /
    // (1 − Σ_j φ(k−1,j)·r_j), φ(k,j) = φ(k−1,j) − φ(k,k)·φ(k−1,k−j)
    val M = 1000000L
    def g(x: Long) = if (x == 0) 1L else x
    val phi = Array.ofDim[Long](6, 6)
    phi(1)(1) = r(0)
    for (k <- 2 to 5) {
      val numSum = (1 until k).map(j => phi(k - 1)(j) * r(k - 1 - j)).sum / M
      val denSum = (1 until k).map(j => phi(k - 1)(j) * r(j - 1)).sum / M
      phi(k)(k) = (r(k - 1) - numSum) * M / g(M - denSum)
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j) / M
    }
    // (b) the float recursion from the same definition — the quantized
    // published values must track it (≤5 ppm/level per the pinned
    // semantics; allow cumulative slack)
    val rf = r.map(_ / 1e6)
    val phif = Array.ofDim[Double](6, 6)
    phif(1)(1) = rf(0)
    for (k <- 2 to 5) {
      val numSum = (1 until k).map(j => phif(k - 1)(j) * rf(k - 1 - j)).sum
      val denSum = (1 until k).map(j => phif(k - 1)(j) * rf(j - 1)).sum
      phif(k)(k) = (rf(k - 1) - numSum) / (if (denSum == 1.0) 1.0 else 1.0 - denSum)
      for (j <- 1 until k)
        phif(k)(j) = phif(k - 1)(j) - phif(k)(k) * phif(k - 1)(k - j)
    }
    val got = run("pacf_lags").sortBy(_.getAs[Long]("lag"))
    assert(got.length == 5)
    got.zipWithIndex.foreach { case (row, i) =>
      val k = i + 1
      assert(row.getAs[Long]("acf_ppm") == r(i), s"lag $k acf")
      assert(row.getAs[Long]("pacf_ppm") == phi(k)(k), s"lag $k pacf replay")
      assert(math.abs(row.getAs[Long]("pacf_ppm") - phif(k)(k) * 1e6) <= 60,
        s"lag $k: quantized ${row.getAs[Long]("pacf_ppm")} vs float " +
          s"${phif(k)(k) * 1e6}")
    }
    // pacf(1) ≡ acf(1) — structural
    assert(got.head.getAs[Long]("pacf_ppm") == got.head.getAs[Long]("acf_ppm"))
  }
}
