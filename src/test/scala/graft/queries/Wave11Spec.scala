package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-7 sixth-wave additions: countmin_error's
  * summary replayed from countmin_freq's own per-key rows (plus the
  * never-underestimates soundness), cohort_ltv rebuilt doc-by-doc as a
  * cumulative triangle, and time_split_cv's fold accounting re-derived
  * from raw event days (train+embargo+test must tile each fold's
  * visible window, folds must nest). All on sf0.001.
  */
class Wave11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("countmin_error equals a replay over countmin_freq's rows") {
    val perKey = Sketches.countminFreq(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // soundness: CM never underestimates, on every probed key
    assert(perKey.forall(_._3))
    val errs = perKey.map { case (exact, est, _) => est - exact }
    assert(errs.forall(_ >= 0))
    val nEv = Tables.events(spark, dir).count()
    val w = 64L
    val bound = 2718282L * nEv / (1000000L * w)
    val row = Sketches.countminError(spark, dir).collect().head
    assert(row.getLong(0) === errs.length.toLong)
    assert(row.getLong(1) === errs.count(_ == 0L).toLong)
    assert(row.getLong(2) === errs.max)
    assert(row.getLong(3) === errs.sum * 1000L / errs.length)
    assert(row.getLong(4) === bound)
    assert(row.getLong(5) ===
      errs.count(e => e * 1000000L * w <= 2718282L * nEv).toLong)
  }

  test("cohort_ltv equals a per-user cumulative replay") {
    val ev = Tables.events(spark, dir)
      .selectExpr(
        "user_id", "to_date(ts) AS d", "event_type",
        "CAST(round(value * 100) AS LONG) c")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2),
        r.getLong(3)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong)
    val cells = ev.filter(_._3 == "purchase")
      .map { case (u, d, _, c) =>
        ((cohort(u), java.time.temporal.ChronoUnit.DAYS
          .between(cohort(u), d)), c)
      }
      .filter(_._1._2 <= 14)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val model = cells.keySet.toSeq.sorted.map { case (cd, off) =>
      val cum = cells.collect {
        case ((c2, o2), v) if c2 == cd && o2 <= off => v
      }.sum
      (cd, off, sizes(cd), cells((cd, off)), cum, cum * 1000L / sizes(cd))
    }
    val rows = Analytics.cohortLtv(spark, dir).collect().map(r =>
      (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows === model)
  }

  test("target_encoding never sees its own fold (leakage check)") {
    val rows = Tables.read(spark, dir, "orders")
      .selectExpr(
        "o_orderpriority cat",
        "o_orderkey k",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def fold(k: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5, 16) % 5
    }
    val tagged = rows.map { case (cat, k, c) => (cat, fold(k), c) }
    val enc = TrainingPipeline.targetEncoding(spark, dir).collect()
    enc.foreach { r =>
      val (cat, f) = (r.getString(0), r.getLong(1))
      val oof = tagged.filter(x => x._1 == cat && x._2 != f)
      assert(r.getLong(2) === tagged.count(x => x._1 == cat && x._2 == f))
      if (oof.isEmpty) assert(r.isNullAt(3))
      else assert(r.getLong(3) === oof.map(_._3).sum / oof.length)
    }
  }

  test("feature_hash_collisions equals a vocab-hash replay") {
    val toks = Tables.read(spark, dir, "documents")
      .selectExpr("explode(filter(split(lower(text), '\\\\s+'), x -> x != '')) tok")
      .collect().map(_.getString(0))
    def bucket(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5, 16) % 1024
    }
    val vocab = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byBucket = vocab.toSeq.map { case (t, df) => (bucket(t), df) }
      .groupBy(_._1).view
      .mapValues(xs => (xs.size.toLong, xs.map(_._2).sum)).toMap
    val nTokens = vocab.size.toLong
    val nColl = byBucket.values.collect {
      case (n, _) if n >= 2 => n
    }.sum
    val tOcc = vocab.values.sum
    val aOcc = byBucket.values.collect {
      case (n, occ) if n >= 2 => occ
    }.sum
    val row = TrainingPipeline.featureHashCollisions(spark, dir)
      .collect().head
    assert(row.getLong(0) === nTokens)
    assert(row.getLong(1) === byBucket.size.toLong)
    assert(row.getLong(2) === nColl)
    assert(row.getLong(3) === nColl * 1000000L / nTokens)
    assert(row.getLong(4) === aOcc * 1000000L / tOcc)
    assert(row.getLong(5) === byBucket.values.map(_._1).max)
  }

  test("quota_sample keeps a deterministic subset within its gate") {
    val rows = TrainingPipeline.quotaSample(spark, dir).collect()
    val totalDocs = rows.map(_.getLong(1)).sum
    val budget = totalDocs / 2
    val nSrc = rows.length.toLong
    rows.foreach { r =>
      assert(r.getLong(2) === budget / nSrc)
      assert(r.getLong(3) ===
        math.min(1000000L, (budget / nSrc) * 1000000L / r.getLong(1)))
      // the gate can't keep more than the population
      assert(r.getLong(4) <= r.getLong(1))
    }
    // re-running yields the identical kept counts (hash, not RNG)
    val again = TrainingPipeline.quotaSample(spark, dir).collect()
    assert(rows.map(_.getLong(4)).toSeq === again.map(_.getLong(4)).toSeq)
  }

  test("t_closeness equals a per-class cumulative-EMD replay") {
    val rows = Tables.read(spark, dir, "customer")
      .selectExpr(
        "CAST(c_nationkey AS LONG) nation", "c_mktsegment segment",
        "(CAST(round(c_acctbal * 100) AS LONG) + 100000) div 100000 band")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bands = rows.map(_._3).distinct.sorted
    val nAll = rows.length.toLong
    val global = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val out = DataQuality.tCloseness(spark, dir).collect()
    out.foreach { r =>
      val cls = rows.filter(x => x._1 == r.getLong(0) && x._2 == r.getString(1))
      val m = cls.length.toLong
      assert(r.getLong(2) === m)
      val byBand = cls.groupBy(_._3).view.mapValues(_.length.toLong).toMap
      var cum = 0L
      var s = 0L
      bands.foreach { b =>
        cum += byBand.getOrElse(b, 0L) * nAll - global(b) * m
        s += math.abs(cum)
      }
      val emd = s * 1000000L / (m * nAll * (bands.length - 1))
      assert(r.getLong(3) === emd)
      assert(r.getBoolean(4) === (emd > 200000L))
      // EMD is a normalized distance: inside [0, 1e6]
      assert(emd >= 0L && emd <= 1000000L)
    }
  }

  test("id_gap_audit equals a sorted-neighbor replay") {
    val ids = Tables.events(spark, dir)
      .where(org.apache.spark.sql.functions.col("event_type") =!= "error")
      .select("event_id").distinct().collect().map(_.getLong(0)).sorted
    val gaps = ids.sliding(2).collect {
      case Array(a, b) if b > a + 1 => b - a - 1
    }.toSeq
    val row = DataQuality.idGapAudit(spark, dir).collect().head
    assert(row.getLong(0) === ids.length.toLong)
    assert(row.getLong(1) === ids.head)
    assert(row.getLong(2) === ids.last)
    assert(row.getLong(3) === ids.last - ids.head + 1 - ids.length)
    assert(row.getLong(4) === gaps.size.toLong)
    assert(row.getLong(5) === (if (gaps.isEmpty) 0L else gaps.max))
    // missing mass must equal the sum of the gap runs
    assert(row.getLong(3) === gaps.sum)
    // the audit must actually see gaps on this stream
    assert(row.getLong(4) > 0L)
  }

  test("tv_drift equals a band-histogram replay") {
    val rows = Tables.read(spark, dir, "orders")
      .selectExpr(
        "to_date(o_orderdate) d",
        "CAST(round(o_totalprice * 100) AS LONG) div 500000 band")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val d0 = rows.map(_._1).min
    val sp2 = java.time.temporal.ChronoUnit.DAYS
      .between(d0, rows.map(_._1).max) + 2
    val (a, bHalf) = rows.partition(r =>
      java.time.temporal.ChronoUnit.DAYS.between(d0, r._1) * 2 < sp2)
    val (na, nb) = (a.length.toLong, bHalf.length.toLong)
    val ha = a.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val hb = bHalf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val bands = (ha.keySet ++ hb.keySet).toSeq.sorted
    val ads = bands.map(b =>
      b -> math.abs(ha.getOrElse(b, 0L) * nb - hb.getOrElse(b, 0L) * na))
    val row = Statistics.tvDrift(spark, dir).collect().head
    assert(row.getLong(0) === na)
    assert(row.getLong(1) === nb)
    assert(row.getLong(2) === bands.length.toLong)
    assert(row.getLong(3) === ads.map(_._2).sum * 1000000L / (2 * na * nb))
    val mx = ads.map(_._2).max
    assert(row.getLong(4) === ads.filter(_._2 == mx).map(_._1).min)
    assert(row.getLong(5) === mx * 1000000L / (2 * na * nb))
    // TVD is a normalized distance
    assert(row.getLong(3) >= 0L && row.getLong(3) <= 1000000L)
  }

  test("gini_split_gain equals a per-feature impurity replay") {
    val spenders = Tables.read(spark, dir, "orders")
      .where(org.apache.spark.sql.functions.col("o_totalprice") > 400000.0)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val cust = Tables.read(spark, dir, "customer")
      .selectExpr(
        "c_custkey", "c_mktsegment",
        "CAST(c_nationkey AS STRING) nation",
        "CAST((CAST(round(c_acctbal * 100) AS LONG) + 100000) div 200000 AS STRING) bb")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    val y = cust.map(c => (c, if (spenders(c._1)) 1L else 0L))
    val n = y.length.toLong
    val p = y.map(_._2).sum
    def gini(sel: ((Long, String, String, String)) => String): Long =
      y.groupBy(x => sel(x._1)).values.map { xs =>
        val ng = xs.length.toLong
        val pg = xs.map(_._2).sum
        (ng * ng - pg * pg - (ng - pg) * (ng - pg)) * 1000000L / (n * ng)
      }.sum
    val root = (n * n - p * p - (n - p) * (n - p)) * 1000000L / (n * n)
    val expect = Map(
      "segment" -> gini(_._2), "nation" -> gini(_._3),
      "bal_band" -> gini(_._4), "zz_root" -> root)
    val rows = Statistics.giniSplitGain(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(2) === expect(r.getString(0)))
      assert(r.getLong(3) === root - expect(r.getString(0)))
    }
    // a split can never be worse than the root (up to per-group floors)
    rows.foreach(r => assert(r.getLong(3) >= -4L))
  }

  test("zone_map_prune: date layout dominates arrival layout") {
    val rows = Layout.zoneMapPrune(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val (afl, ahit, ascan, amatch) = rows("arrival")
    val (dfl, dhit, dscan, dmatch) = rows("date_partitioned")
    // both layouts must find the same matching rows
    assert(amatch === dmatch)
    // scanned can never be less than matched; hit files bounded by files
    assert(ascan >= amatch && dscan >= dmatch)
    assert(ahit <= afl && dhit <= dfl)
    // the date-partitioned layout scans exactly the matching rows
    // (each file is one day, the predicate is a date range)
    assert(dscan === dmatch)
    // arrival order scans strictly more unless the data is degenerate
    assert(ascan >= dscan)
  }

  test("kendall_tau equals a brute pair count over the league table") {
    val wide = Tables.read(spark, dir, "orders")
      .join(
        Tables.read(spark, dir, "customer"),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .selectExpr(
        "CAST(c_nationkey AS LONG) nation", "year(o_orderdate) yr",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byNation = wide.groupBy(_._1).view.mapValues { xs =>
      (xs.filter(_._2 == 1996).map(_._3).sum,
        xs.filter(_._2 == 1997).map(_._3).sum)
    }.toMap
    val ns = byNation.keys.toSeq.sorted
    val pairs = for { i <- ns; j <- ns if j > i } yield (byNation(i), byNation(j))
    val conc = pairs.count { case ((a1, a2), (b1, b2)) =>
      (a1 < b1 && a2 < b2) || (a1 > b1 && a2 > b2)
    }.toLong
    val disc = pairs.count { case ((a1, a2), (b1, b2)) =>
      (a1 < b1 && a2 > b2) || (a1 > b1 && a2 < b2)
    }.toLong
    val row = Statistics.kendallTau(spark, dir).collect().head
    assert(row.getLong(0) === pairs.size.toLong)
    assert(row.getLong(1) === conc)
    assert(row.getLong(2) === disc)
    assert(row.getLong(3) === pairs.size - conc - disc)
    val d = conc - disc
    val expect =
      if (d < 0) -((-d) * 1000000L / pairs.size) else d * 1000000L / pairs.size
    assert(row.getLong(4) === expect)
  }

  test("srm_check chi2 equals the algebraic identity (na-nb)^2/(na+nb)") {
    val row = Statistics.srmCheck(spark, dir).collect().head
    val (na, nb) = (row.getLong(0), row.getLong(1))
    val d = na - nb
    assert(row.getLong(3) === d * d * 1000L / (na + nb))
    assert(row.getBoolean(4) === (row.getLong(3) > 3841L))
    val gap = if (d < 0) -((-d) * 1000000L / (na + nb))
      else d * 1000000L / (na + nb)
    assert(row.getLong(2) === gap)
    // arms partition the distinct-user population
    val users = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(na + nb === users)
  }

  test("ab_power matches the closed-form sizing formula") {
    val row = Statistics.abPower(spark, dir).collect().head
    val p = row.getLong(2)
    val z = (1959964.0 + 841621.0) / 1000000.0
    val expect = math.floor(z * z * (2.0 * p * (1000000 - p)) /
      (20000.0 * 20000.0)).toLong
    assert(row.getLong(3) === expect)
    assert(row.getBoolean(5) === (row.getLong(0) / 2 >= expect))
    // sanity: detecting a 2-point lift near p=0.5 needs thousands
    if (p > 300000 && p < 700000) assert(expect > 5000L)
  }

  test("p_chart limits equal the 3-sigma binomial formula") {
    val days = Tables.events(spark, dir)
      .selectExpr("to_date(ts) d", "CAST(event_type = 'error' AS LONG) e")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(xs =>
        (xs.size.toLong, xs.map(_._2).sum)).toMap
    val nt = days.values.map(_._1).sum
    val et = days.values.map(_._2).sum
    val pbar = et * 1000000L / nt
    val rows = Analytics.pChart(spark, dir).collect()
    assert(rows.length === days.size)
    rows.foreach { r =>
      val (n, ne) = days(r.getDate(0).toLocalDate)
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === ne)
      assert(r.getLong(3) === ne * 1000000L / n)
      assert(r.getLong(4) === pbar)
      val lim = math.floor(
        3.0 * math.sqrt(pbar.toDouble * (1000000.0 - pbar) / n)).toLong
      assert(r.getLong(5) === math.min(1000000L, pbar + lim))
      assert(r.getLong(6) === math.max(0L, pbar - lim))
      assert(r.getBoolean(7) ===
        (r.getLong(3) > r.getLong(5) || r.getLong(3) < r.getLong(6)))
    }
  }

  test("time_split_cv folds tile and nest") {
    val days = Tables.events(spark, dir)
      .selectExpr("to_date(ts) AS d").collect()
      .map(_.getDate(0).toLocalDate)
    val d0 = days.min
    val span = (java.time.temporal.ChronoUnit.DAYS
      .between(d0, days.max) + 1) / 6
    val rows = TrainingPipeline.timeSplitCv(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq === (1L to 5L))
    rows.foreach { case (fold, s, tr, em, te) =>
      assert(s === span)
      // the three roles tile the fold's visible prefix exactly
      val visible = days.count(d =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, d) <
          (fold + 1) * span).toLong
      assert(tr + em + te === visible)
      // a later fold's train set contains this fold's train AND test
      assert(te > 0L)
    }
    // expanding window: train counts strictly grow with the fold
    val trains = rows.map(_._3).toSeq
    assert(trains === trains.sorted)
  }
}
