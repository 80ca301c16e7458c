package graft.queries

import java.time.{LocalDate, LocalDateTime}

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Second wave of first-principles statistics models (see
  * [[StatModelSpec]] for the rationale and comparison discipline):
  * the experimentation battery (ab_test, ab_power, srm_check,
  * cuped_adjust), SPC (p_chart — the round-8 defect itself, now
  * model-pinned), association/regression (kendall_tau, linreg_trend,
  * gini_split_gain), drift (tv_drift), concentration
  * (hhi_concentration) and calibration (calibration_bins ECE).
  * Every expectation is derived from the textbook definition in plain
  * Scala — including an independent reimplementation of the md5
  * content-hash split where a query uses it.
  */
class StatModelSpec2 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def cents(c: String) = round(col(c) * 100).cast("long")

  private def signSplit(num: BigInt, den: BigInt): BigInt =
    if (num < 0) -((-num) / den) else num / den

  private def approx(got: Long, want: BigInt, tol: Long, label: String): Unit =
    assert(
      (BigInt(got) - want).abs <= tol,
      s"$label: got $got, first-principles $want (tol $tol)")

  private def relEq(got: Double, want: Double, label: String): Unit =
    assert(math.abs(got - want) <= 1e-9 * math.max(1.0, math.abs(want)),
      s"$label: got $got, first-principles $want")

  /** Independent replay of the suite's content-hash split
    * (ContentHash.bucket): first 16 bits of md5 of the decimal id,
    * mod `mod`.
    */
  private def bucket(id: Long, mod: Int): Long = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = f"${h(0) & 0xff}%02x${h(1) & 0xff}%02x".take(4)
    java.lang.Long.parseLong(hex, 16) % mod
  }

  private def eventsRows(): Array[(Long, String, String, Long)] =
    Tables.events(spark, dir)
      .select(col("user_id").cast("long"), col("event_type"),
        col("ts").cast("string"), cents("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  // ---------------------------------------------------------------
  // p_chart — the round-8 defect class: 3σ binomial control limits
  // ---------------------------------------------------------------
  test("p_chart matches the Shewhart 3-sigma binomial limits") {
    val days = eventsRows()
      .map { case (_, et, ts, _) =>
        (ts.substring(0, 10), if (et == "error") 1L else 0L)
      }
      .groupBy(_._1)
      .map { case (d, xs) => (d, xs.size.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val nt = BigInt(days.map(_._2).sum)
    val et = BigInt(days.map(_._3).sum)
    val pbar = et * 1000000 / nt
    val got = run("p_chart").sortBy(_.getAs[java.sql.Date]("d").toString)
    assert(got.length == days.length)
    got.zip(days).foreach { case (r, (d, n, nErr)) =>
      assert(r.getAs[java.sql.Date]("d").toString == d)
      assert(r.getAs[Long]("n") == n, d)
      assert(r.getAs[Long]("n_err") == nErr, d)
      assert(BigInt(r.getAs[Long]("p_ppm")) == BigInt(nErr) * 1000000 / n, d)
      assert(BigInt(r.getAs[Long]("pbar_ppm")) == pbar, d)
      // UCL/LCL = p̄ ± 3·√(p̄(1−p̄)/n), everything in ppm units
      val lim = 3.0 * math.sqrt(
        pbar.toDouble * (1000000.0 - pbar.toDouble) / n)
      val ucl = (pbar + BigInt(math.floor(lim).toLong)).min(BigInt(1000000))
      val lcl = (pbar - BigInt(math.floor(lim).toLong)).max(BigInt(0))
      approx(r.getAs[Long]("ucl_ppm"), ucl, 1, s"$d ucl")
      approx(r.getAs[Long]("lcl_ppm"), lcl, 1, s"$d lcl")
      // the verdict applies the engine's own limits (pins the rule)
      assert(r.getAs[Boolean]("out_of_control") ==
        (r.getAs[Long]("p_ppm") > r.getAs[Long]("ucl_ppm") ||
          r.getAs[Long]("p_ppm") < r.getAs[Long]("lcl_ppm")), d)
    }
  }

  // ---------------------------------------------------------------
  // kendall_tau — concordant/discordant pairs over the nation table
  // ---------------------------------------------------------------
  test("kendall_tau matches pair counting over the nation league table") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wide = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long"),
        year(to_date(col("o_orderdate"))).as("yr"), cents("o_totalprice"))
      .collect()
      .flatMap { r =>
        cust.get(r.getLong(0)).map(n => (n, r.getInt(1), r.getLong(2)))
      }
      .groupBy(_._1)
      .map { case (n, xs) =>
        (n, xs.filter(_._2 == 1996).map(_._3).sum,
          xs.filter(_._2 == 1997).map(_._3).sum)
      }
      .toSeq.sortBy(_._1)
    var conc = 0L
    var disc = 0L
    var pairs = 0L
    for (i <- wide.indices; j <- (i + 1) until wide.length) {
      val (_, a1, a2) = wide(i); val (_, b1, b2) = wide(j)
      pairs += 1
      if ((a1 < b1 && a2 < b2) || (a1 > b1 && a2 > b2)) conc += 1
      else if ((a1 < b1 && a2 > b2) || (a1 > b1 && a2 < b2)) disc += 1
    }
    val got = run("kendall_tau").head
    assert(got.getAs[Long]("n_pairs") == pairs)
    assert(got.getAs[Long]("concordant") == conc)
    assert(got.getAs[Long]("discordant") == disc)
    assert(got.getAs[Long]("tied") == pairs - conc - disc)
    assert(BigInt(got.getAs[Long]("tau_a_ppm")) ==
      signSplit(BigInt(conc - disc) * 1000000, BigInt(pairs)))
  }

  // ---------------------------------------------------------------
  // ab_test — two-proportion pooled z² from the p̂ definition
  // ---------------------------------------------------------------
  test("ab_test matches the pooled two-proportion z-squared") {
    val perUser = eventsRows()
      .groupBy(_._1)
      .toSeq // BEFORE the map: pair results would re-key the Map
      .map { case (u, xs) =>
        (bucket(u, 2), if (xs.count(_._2 == "purchase") >= 14) 1L else 0L)
      }
    val na = BigInt(perUser.count(_._1 == 0))
    val ca = BigInt(perUser.filter(_._1 == 0).map(_._2).sum)
    val nb = BigInt(perUser.count(_._1 == 1))
    val cb = BigInt(perUser.filter(_._1 == 1).map(_._2).sum)
    val got = run("ab_test").head
    assert(BigInt(got.getAs[Long]("n_a")) == na)
    assert(BigInt(got.getAs[Long]("c_a")) == ca)
    assert(BigInt(got.getAs[Long]("n_b")) == nb)
    assert(BigInt(got.getAs[Long]("c_b")) == cb)
    val c = ca + cb
    val n = na + nb
    if (c == 0 || n - c == 0)
      assert(got.isNullAt(got.fieldIndex("z2_milli")))
    else {
      // z² = (p̂a − p̂b)² / (p̄(1−p̄)(1/na + 1/nb)); composed from the
      // definition it collapses to the exact rational below
      val num = (ca * nb - cb * na).pow(2) * n * 1000
      val den = na * nb * c * (n - c)
      assert(BigInt(got.getAs[Long]("z2_milli")) == num / den)
      assert(got.getAs[Boolean]("reject_95") ==
        ((ca * nb - cb * na).pow(2) * n * 1000000 >
          BigInt(3841459) * na * nb * c * (n - c)))
    }
  }

  // ---------------------------------------------------------------
  // ab_power — (z_{α/2}+z_β)²·2p̄(1−p̄)/δ² sample-size formula
  // ---------------------------------------------------------------
  test("ab_power matches the textbook sample-size formula") {
    val perUser = eventsRows()
      .groupBy(_._1)
      .map { case (_, xs) => if (xs.count(_._2 == "purchase") >= 14) 1L else 0L }
      .toSeq
    val users = BigInt(perUser.size)
    val conv = BigInt(perUser.sum)
    val pPpm = conv * 1000000 / users
    val got = run("ab_power").head
    assert(BigInt(got.getAs[Long]("n_users")) == users)
    assert(BigInt(got.getAs[Long]("n_conv")) == conv)
    assert(BigInt(got.getAs[Long]("p_ppm")) == pPpm)
    // n = (z_{0.025} + z_{0.2})² · 2·p(1−p) / δ², p from the published
    // ppm (the pinned quantized semantics), δ = 0.02, z constants the
    // pinned micro literals
    val z = 1.959964 + 0.841621
    val p = pPpm.toDouble / 1e6
    val nReq = math.floor(z * z * 2.0 * p * (1.0 - p) / (0.02 * 0.02)).toLong
    approx(got.getAs[Long]("n_required"), BigInt(nReq), 1, "n_required")
    assert(got.getAs[Long]("mde_ppm") == 20000L)
    assert(got.getAs[Boolean]("powered") ==
      (users / 2 >= BigInt(got.getAs[Long]("n_required"))))
  }

  // ---------------------------------------------------------------
  // srm_check — χ²₁ of the arm split vs designed 50/50
  // ---------------------------------------------------------------
  test("srm_check matches chi-square against the designed 50/50") {
    val arms = eventsRows().map(_._1).distinct.map(bucket(_, 2))
    val na = BigInt(arms.count(_ == 0))
    val nb = BigInt(arms.count(_ == 1))
    val n = na + nb
    val got = run("srm_check").head
    assert(BigInt(got.getAs[Long]("n_a")) == na)
    assert(BigInt(got.getAs[Long]("n_b")) == nb)
    assert(BigInt(got.getAs[Long]("gap_ppm")) ==
      signSplit((na - nb) * 1000000, n))
    // χ² = Σ(O−E)²/E with E = N/2 per arm — collapses exactly to
    // (n_a − n_b)²/N
    val chi2Milli = (na - nb).pow(2) * 1000 / n
    assert(BigInt(got.getAs[Long]("chi2_milli")) == chi2Milli)
    assert(got.getAs[Boolean]("srm_detected") == (chi2Milli > 3841))
  }

  // ---------------------------------------------------------------
  // cuped_adjust — θ = cov(x,y)/var(x), adjusted means, var reduction
  // ---------------------------------------------------------------
  test("cuped_adjust matches the covariance-adjustment definition") {
    val boundary = LocalDateTime.of(2024, 1, 16, 0, 0)
    val perUser = eventsRows()
      .groupBy(_._1)
      .map { case (u, xs) =>
        val pre = xs.filter(e =>
          LocalDateTime.parse(e._3.replace(' ', 'T')).isBefore(boundary))
          .map(_._4).sum
        val post = xs.filterNot(e =>
          LocalDateTime.parse(e._3.replace(' ', 'T')).isBefore(boundary))
          .map(_._4).sum
        (bucket(u, 2), BigInt(pre), BigInt(post))
      }.toSeq
    val n = BigInt(perUser.size)
    val sx = perUser.map(_._2).sum
    val sy = perUser.map(_._3).sum
    val sxy = perUser.map(u => u._2 * u._3).sum
    val sxx = perUser.map(u => u._2 * u._2).sum
    val syy = perUser.map(u => u._3 * u._3).sum
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val got = run("cuped_adjust").sortBy(_.getAs[Long]("variant"))
    Seq(0L, 1L).foreach { v =>
      val arm = perUser.filter(_._1 == v)
      val r = got(v.toInt)
      assert(r.getAs[Long]("variant") == v)
      assert(r.getAs[Long]("n_users") == arm.size, v)
      val meanY = arm.map(_._3).sum.toDouble / arm.size
      relEq(r.getAs[Double]("mean_y_c"), meanY, s"arm $v mean_y")
      if (varx == 0) assert(r.isNullAt(r.fieldIndex("theta_ppm")))
      else {
        val theta = cov.toDouble / varx.toDouble
        val adj = meanY - theta *
          (arm.map(_._2).sum.toDouble / arm.size - sx.toDouble / n.toDouble)
        relEq(r.getAs[Double]("mean_y_adj_c"), adj, s"arm $v adj mean")
        approx(r.getAs[Long]("theta_ppm"),
          BigInt(math.floor(1e6 * theta).toLong), 1, s"arm $v theta")
        approx(r.getAs[Long]("var_reduction_ppm"),
          BigInt(math.floor(
            1e6 * cov.toDouble * cov.toDouble /
              (varx.toDouble * vary.toDouble)).toLong),
          1, s"arm $v var reduction")
      }
    }
  }

  // ---------------------------------------------------------------
  // linreg_trend — per-nation OLS slope/intercept/r² on monthly sums
  // ---------------------------------------------------------------
  test("linreg_trend matches the OLS closed form per nation") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nation = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val monthly = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").cast("long"),
        to_date(col("o_orderdate")).cast("string"), cents("o_totalprice"))
      .collect()
      .flatMap { r =>
        cust.get(r.getLong(0)).map { nk =>
          val d = LocalDate.parse(r.getString(1))
          ((nation(nk), (d.getYear - 1995) * 12L + d.getMonthValue - 1),
            r.getLong(2))
        }
      }
      .groupBy(_._1).view.mapValues(xs => xs.map(x => BigInt(x._2)).sum)
      .toMap
    val got = run("linreg_trend")
    assert(got.nonEmpty)
    got.foreach { r =>
      val nm = r.getAs[String]("n_name")
      val pts = monthly.collect { case ((`nm`, x), y) => (BigInt(x), y) }.toSeq
      val n = BigInt(pts.size)
      assert(r.getAs[Long]("n_months") == pts.size, nm)
      val sx = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val cov = n * sxy - sx * sy
      val varx = n * sxx - sx * sx
      val vary = n * syy - sy * sy
      val slope = cov.toDouble / varx.toDouble
      relEq(r.getAs[Double]("slope_cents"), slope, s"$nm slope")
      relEq(r.getAs[Double]("intercept_cents"),
        (sy.toDouble - slope * sx.toDouble) / n.toDouble, s"$nm intercept")
      if (varx * vary == 0) assert(r.isNullAt(r.fieldIndex("r2_ppm")))
      else assert(BigInt(r.getAs[Long]("r2_ppm")) ==
        BigInt(1000000) * cov * cov / (varx * vary), s"$nm r2")
    }
  }

  // ---------------------------------------------------------------
  // gini_split_gain — weighted Gini impurity per candidate feature
  // ---------------------------------------------------------------
  test("gini_split_gain matches weighted Gini impurity from labels") {
    val spenders = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val labeled = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_mktsegment"),
        col("c_nationkey").cast("long"), cents("c_acctbal"))
      .collect()
      .map { r =>
        (r.getString(1), r.getLong(2).toString,
          ((r.getLong(3) + 100000) / 200000).toString,
          if (spenders(r.getLong(0))) 1L else 0L)
      }
    val n = BigInt(labeled.length)
    val p = BigInt(labeled.map(_._4).sum)
    // weighted Gini = Σ_g (n_g/n)·(1 − (p_g/n_g)² − (q_g/n_g)²), each
    // group term floored to ppm (the pinned per-term quantization)
    def gini(groups: Map[String, Seq[Long]]): (Int, BigInt) = {
      val terms = groups.values.map { ys =>
        val ng = BigInt(ys.size)
        val pg = BigInt(ys.sum)
        val qg = ng - pg
        (ng * ng - pg * pg - qg * qg) * 1000000 / (n * ng)
      }
      (groups.size, terms.sum)
    }
    val feats = Map(
      "segment" -> labeled.groupBy(_._1),
      "nation" -> labeled.groupBy(_._2),
      "bal_band" -> labeled.groupBy(_._3))
      .view.mapValues(g =>
        gini(g.view.mapValues(_.map(_._4).toSeq).toMap)).toMap
    val rootGini = (n * n - p * p - (n - p) * (n - p)) * 1000000 / (n * n)
    val got = run("gini_split_gain")
    got.foreach { r =>
      r.getAs[String]("feature") match {
        case "zz_root" =>
          assert(r.getAs[Long]("n_groups") == 1L)
          assert(BigInt(r.getAs[Long]("gini_ppm")) == rootGini)
          assert(r.getAs[Long]("gain_ppm") == 0L)
        case f =>
          val (ng, g) = feats(f)
          assert(r.getAs[Long]("n_groups") == ng, f)
          assert(BigInt(r.getAs[Long]("gini_ppm")) == g, f)
          assert(BigInt(r.getAs[Long]("gain_ppm")) == rootGini - g, f)
      }
    }
    assert(got.length == 4)
  }

  // ---------------------------------------------------------------
  // tv_drift — ½ Σ|p_b − q_b| between the two calendar halves
  // ---------------------------------------------------------------
  test("tv_drift matches the total-variation definition") {
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string"),
        cents("o_totalprice"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), r.getLong(1) / 500000))
    val d0 = rows.map(_._1).min
    val dN = rows.map(_._1).max
    val sp2 = (java.time.temporal.ChronoUnit.DAYS.between(d0, dN) + 1) + 1
    val grid = rows
      .map { case (d, b) =>
        (b, java.time.temporal.ChronoUnit.DAYS.between(d0, d) * 2 < sp2)
      }
      .groupBy(_._1).view
      .mapValues(xs => (BigInt(xs.count(_._2)), BigInt(xs.count(!_._2))))
      .toMap
    val na = grid.values.map(_._1).sum
    val nb = grid.values.map(_._2).sum
    val diffs = grid.map { case (b, (ca, cb)) => b -> (ca * nb - cb * na).abs }
    val sad = diffs.values.sum
    val mad = diffs.values.max
    val topBand = diffs.filter(_._2 == mad).keys.min
    val got = run("tv_drift").head
    assert(BigInt(got.getAs[Long]("n_a")) == na)
    assert(BigInt(got.getAs[Long]("n_b")) == nb)
    assert(got.getAs[Long]("n_bands") == grid.size)
    assert(BigInt(got.getAs[Long]("tvd_ppm")) == sad * 1000000 / (2 * na * nb))
    assert(got.getAs[Long]("top_band") == topBand)
    assert(BigInt(got.getAs[Long]("top_band_ppm")) ==
      mad * 1000000 / (2 * na * nb))
  }

  // ---------------------------------------------------------------
  // hhi_concentration — Σ share² per part, exact integer ppm
  // ---------------------------------------------------------------
  test("hhi_concentration matches the Herfindahl definition per part") {
    val ps = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_partkey") < 50)
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"),
        floor(col("l_quantity")).cast("long"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).view.mapValues(xs => BigInt(xs.map(_._2).sum)).toMap
    val got = run("hhi_concentration")
    val byPart = ps.groupBy(_._1._1)
    assert(got.length == byPart.size)
    got.foreach { r =>
      val part = r.getAs[Long]("part")
      val qs = byPart(part).values.toSeq
      val tot = qs.sum
      val hhi = qs.map(q => q * q).sum * 1000000 / (tot * tot)
      assert(r.getAs[Long]("n_suppliers") == qs.size, part)
      assert(BigInt(r.getAs[Long]("total_q")) == tot, part)
      assert(BigInt(r.getAs[Long]("hhi_ppm")) == hhi, part)
      assert(r.getAs[Boolean]("concentrated") == (hhi >= 250000), part)
    }
  }

  // ---------------------------------------------------------------
  // calibration_bins — reliability diagram + weighted ECE
  // ---------------------------------------------------------------
  test("calibration_bins matches the ECE definition") {
    val rows = TrainingPipeline.qualityScoredDocs(spark, dir)
      .select(col("score").cast("long"), (col("lang") === "en"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    val binned = rows.map { case (score, pos) =>
      val p = math.min(math.max(score, 0L), 1000L) * 1000
      (math.min(p / 100000, 9L), BigInt(p), pos)
    }
    val bins = binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (b, xs) =>
      (b, BigInt(xs.size), xs.map(_._2).sum, BigInt(xs.count(_._3)))
    }
    val got = run("calibration_bins").sortBy(_.getAs[Long]("bin"))
    val perBin = got.filter(_.getAs[Long]("bin") < 10)
    assert(perBin.length == bins.length)
    var eceNum = BigInt(0)
    var nTot = BigInt(0)
    perBin.zip(bins).foreach { case (r, (b, n, psum, npos)) =>
      assert(r.getAs[Long]("bin") == b)
      assert(BigInt(r.getAs[Long]("n")) == n, b)
      val conf = psum / n
      val posR = npos * 1000000 / n
      assert(BigInt(r.getAs[Long]("conf_ppm")) == conf, b)
      assert(BigInt(r.getAs[Long]("pos_ppm")) == posR, b)
      eceNum += n * (conf - posR).abs
      nTot += n
    }
    val summary = got.find(_.getAs[Long]("bin") == 10).get
    assert(BigInt(summary.getAs[Long]("n")) == nTot)
    assert(summary.isNullAt(summary.fieldIndex("conf_ppm")))
    // ECE = Σ n_b·|conf_b − acc_b| / N — rides the pos_ppm slot
    assert(BigInt(summary.getAs[Long]("pos_ppm")) == eceNum / nTot)
  }
}
