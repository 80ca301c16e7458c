package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 drift/dependence wave: each DriftStats
  * query replayed in plain Scala from the raw sf0.001 rows — integer
  * moments in BigInt, the scalar double chains stated in the SAME
  * fixed order as the engine expressions (correctly-rounded IEEE ops
  * on identical inputs ⇒ identical doubles), floors via math.floor.
  * Also pins the structural invariants (W1 dominates the mean gap,
  * Hellinger summary = Σ per-bin, χ² non-negative).
  */
class Wave12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def cents(v: Double): Long = math.round(v * 100)

  test("wasserstein_1d equals a sorted-merge replay; dominates mean gap") {
    val ev = Tables.events(spark, dir)
      .selectExpr("CAST(round(value * 100) AS LONG) vc", "event_type g")
      .where("g IN ('click','purchase')")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val a = ev.filter(_._2 == "click").map(_._1)
    val b = ev.filter(_._2 == "purchase").map(_._1)
    val n1 = a.length.toLong
    val n2 = b.length.toLong
    val hist = ev.groupBy(_._1).view
      .mapValues(g => (g.count(_._2 == "click").toLong,
        g.count(_._2 == "purchase").toLong)).toMap
    val vs = hist.keySet.toSeq.sorted
    var f1 = 0L; var f2 = 0L
    var tot = BigInt(0)
    vs.zipWithIndex.foreach { case (v, i) =>
      val (c1, c2) = hist(v)
      f1 += c1; f2 += c2
      if (i + 1 < vs.length)
        tot += BigInt((f1 * n2 - f2 * n1).abs) * (vs(i + 1) - v)
    }
    val w1Milli = (tot * 1000 / (BigInt(n1) * n2)).toLong
    val meanGap = (BigInt((a.sum * n2 - b.sum * n1).abs) * 1000 /
      (BigInt(n1) * n2)).toLong
    val row = DriftStats.wasserstein1d(spark, dir).collect().head
    assert(row.getLong(0) === n1)
    assert(row.getLong(1) === n2)
    assert(row.getLong(2) === w1Milli)
    assert(row.getLong(3) === meanGap)
    assert(row.getBoolean(4))
    assert(w1Milli >= meanGap) // transport identity, model-side too
  }

  test("hellinger_drift equals a binned replay; summary row sums bins") {
    val li = Tables.read(spark, dir, "lineitem")
      .selectExpr("CAST(l_quantity AS LONG) q",
        "year(l_shipdate) yr")
      .where("yr IN (1996, 1997)")
      .collect().map(r => ((r.getLong(0) - 1) / 5, r.getInt(1)))
    val t1 = li.count(_._2 == 1996).toLong
    val t2 = li.count(_._2 == 1997).toLong
    val model = li.groupBy(_._1).toSeq.sortBy(_._1).map { case (bin, g) =>
      val n1 = g.count(_._2 == 1996).toLong
      val n2 = g.count(_._2 == 1997).toLong
      val d = math.sqrt(n1.toDouble / t1.toDouble) -
        math.sqrt(n2.toDouble / t2.toDouble)
      (bin, n1, n2, n1 * 1000000 / t1, n2 * 1000000 / t2,
        math.floor(d * d * 1000000000.0).toLong)
    }
    val rows = DriftStats.hellingerDrift(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rows.init === model)
    val s = rows.last
    assert(s._1 === 10L)
    assert(s._2 === t1 && s._3 === t2)
    assert(s._6 === model.map(_._6).sum) // summary = Σ per-bin h_nano
    assert(s._6 >= 0L && s._6 <= 2000000000L) // H² ∈ [0,1] ⇒ 2H²·1e9 ≤ 2e9
  }

  test("spearman_rho equals an average-rank Pearson replay") {
    val rows = Tables.read(spark, dir, "part")
      .selectExpr("CAST(p_size AS LONG) sz",
        "CAST(round(p_retailprice * 100) AS LONG) vc")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def rank2(vals: Seq[Long]): Map[Long, Long] = {
      val cnt = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      cnt.map { case (v, c) =>
        val lt = vals.count(_ < v).toLong
        v -> (2 * lt + c + 1)
      }
    }
    val rx = rank2(rows.map(_._1).toSeq)
    val ry = rank2(rows.map(_._2).toSeq)
    val n = rows.length.toLong
    var sx = 0L; var sy = 0L
    var sxx = BigInt(0); var syy = BigInt(0); var sxy = BigInt(0)
    rows.foreach { case (s, v) =>
      val x = rx(s); val y = ry(v)
      sx += x; sy += y
      sxx += BigInt(x) * x; syy += BigInt(y) * y; sxy += BigInt(x) * y
    }
    val num = BigInt(n) * sxy - BigInt(sx) * sy
    val d1 = BigInt(n) * sxx - BigInt(sx) * sx
    val d2 = BigInt(n) * syy - BigInt(sy) * sy
    val expected =
      if (d1 == 0 || d2 == 0) None
      else {
        val m = math.floor(1000000.0 * num.abs.toDouble /
          (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))).toLong
        Some(if (num < 0) -m else m)
      }
    val row = DriftStats.spearmanRho(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === rx.size.toLong)
    assert(row.getLong(2) === ry.size.toLong)
    assert((if (row.isNullAt(3)) None else Some(row.getLong(3))) === expected)
  }

  test("cramers_v equals a full-grid chi-square replay") {
    val cust = Tables.read(spark, dir, "customer")
      .selectExpr("c_mktsegment seg", "CAST(c_nationkey AS LONG) nat")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = cust.length.toLong
    val segs = cust.map(_._1).distinct
    val nats = cust.map(_._2).distinct
    val cellCnt = cust.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rMarg = cust.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cMarg = cust.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    var chi2Nano = 0L
    for (s <- segs; t <- nats) {
      val o = cellCnt.getOrElse((s, t), 0L)
      val r = rMarg(s); val c = cMarg(t)
      val numD = (n * o - r * c).toDouble
      chi2Nano += math.floor(numD * numD /
        (n.toDouble * r.toDouble * c.toDouble) * 1000000000.0).toLong
    }
    val k = math.min(segs.length - 1, nats.length - 1).toLong
    val vPpm = math.floor(math.sqrt((chi2Nano.toDouble / 1000000000.0) /
      (n.toDouble * k.toDouble)) * 1000000.0).toLong
    val row = DriftStats.cramersV(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === segs.length.toLong)
    assert(row.getLong(2) === nats.length.toLong)
    assert(row.getLong(3) === chi2Nano / 1000000)
    assert(row.getLong(4) === vPpm)
    assert(chi2Nano >= 0L)
  }

  test("video_scene_cuts: cuts sit exactly on the scene boundaries") {
    // scene = f div 2 ⇒ boundaries at even f ≥ 2; the 64/pixel
    // threshold must flag ALL of them and NONE of the odd frames
    val rows = MultimodalQueries.videoSceneCuts(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val nf = r.getLong(1)
      assert(r.getLong(2) === nf / 2 - 1) // n_cuts
      assert(r.getLong(3) === 2L) // first_cut
      assert(r.getLong(5) === nf / 2) // n_scenes
    }
  }

  test("knn_mips equals an integer brute-force replay") {
    val vecs = Tables.read(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS LONG)) v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val byId = vecs.toMap
    val model = vecs.filter(_._1 < 10).sortBy(_._1).flatMap { case (q, qv) =>
      vecs.filter(_._1 != q)
        .map { case (id, v) =>
          (id, qv.zip(v).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (id, ip) => (-ip, id) }
        .take(5).zipWithIndex
        .map { case ((id, ip), i) => (q, (i + 1).toLong, id, ip) }
    }.toSeq
    val got = Similarity.knnMips(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === model)
    assert(byId.size === vecs.length)
  }

  test("referential_integrity equals a set-membership replay") {
    def keys(t: String, k: String): Array[Long] =
      Tables.read(spark, dir, t).selectExpr(s"CAST($k AS LONG)")
        .collect().map(_.getLong(0))
    val edges = Seq(
      ("customer->nation", keys("customer", "c_nationkey"),
        keys("nation", "n_nationkey")),
      ("lineitem->orders", keys("lineitem", "l_orderkey"),
        keys("orders", "o_orderkey")),
      ("lineitem->part", keys("lineitem", "l_partkey"),
        keys("part", "p_partkey")),
      ("lineitem->supplier", keys("lineitem", "l_suppkey"),
        keys("supplier", "s_suppkey")),
      ("nation->region", keys("nation", "n_regionkey"),
        keys("region", "r_regionkey")),
      ("orders->customer", keys("orders", "o_custkey"),
        keys("customer", "c_custkey")),
      ("supplier->nation", keys("supplier", "s_nationkey"),
        keys("nation", "n_nationkey")))
    val model = edges.map { case (name, child, parent) =>
      val pset = parent.toSet
      val orphans = child.filterNot(pset)
      (name, child.length.toLong, child.distinct.length.toLong,
        orphans.length.toLong, orphans.distinct.length.toLong,
        orphans.isEmpty)
    }.sortBy(_._1)
    val got = DataQuality.referentialIntegrity(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === model)
  }

  test("query registry has no duplicate names (shadowing guard)") {
    // SparkEntry.queries is a Map — a second QueryDef reusing an
    // existing name would silently SHADOW one of the two (last in
    // registration order wins), and every gate would keep passing
    // against whichever survived. Pin uniqueness structurally.
    val names = graft.SparkEntry.allQueryNames
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
  }

  test("holt_winters equals a java.time weekday replay; seeds like holt") {
    val grid = Tables.events(spark, dir)
      .where("event_type = 'purchase'")
      .selectExpr("to_date(ts) day", "CAST(round(value * 100) AS LONG) c")
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toEpochDay)
    var l = 0L; var b = 0L
    val s = Array.fill(8)(0L)
    val model = grid.zipWithIndex.map { case ((d, y), i) =>
      val wd = d.getDayOfWeek.getValue // ISO 1..7, independent mapping
      if (i == 0) { l = y; b = 0L; (d, y, l, b, 0L, y) }
      else {
        val sOld = s(wd)
        val fitted = l + b + sOld
        val lN = (y - sOld + 3 * (l + b)) / 4
        val bN = (lN - l + 3 * b) / 4
        val sN = (y - lN + 3 * sOld) / 4
        l = lN; b = bN; s(wd) = sN
        (d, y, l, b, sN, fitted)
      }
    }
    val got = SqlSurface.holtWinters(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === model)
    assert(got.head._6 === got.head._2) // day-1 fitted = observed
  }

  test("capture_recapture equals a set replay") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a = ev.filter(_._2 == "click").map(_._1).toSet
    val b = ev.filter(_._2 == "purchase").map(_._1).toSet
    val n1 = a.size.toLong; val n2 = b.size.toLong
    val m = (a & b).size.toLong
    val nTrue = (a | b).size.toLong
    val chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val err = if (chapman >= nTrue) (chapman - nTrue) * 1000000 / nTrue
    else -((nTrue - chapman) * 1000000 / nTrue)
    val row = DriftStats.captureRecapture(spark, dir).collect().head
    assert(row.getLong(0) === n1)
    assert(row.getLong(1) === n2)
    assert(row.getLong(2) === m)
    assert(row.getLong(3) === nTrue)
    if (m > 0) assert(row.getLong(4) === n1 * n2 / m)
    else assert(row.isNullAt(4))
    assert(row.getLong(5) === chapman)
    assert(row.getLong(6) === err)
  }

  test("mann_kendall equals a brute-force pair replay") {
    val days = Tables.read(spark, dir, "orders")
      .selectExpr("to_date(o_orderdate) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toEpochDay).map(_._2)
    val n = days.length.toLong
    var s = 0L
    for (i <- days.indices; j <- i + 1 until days.length)
      s += java.lang.Long.signum(days(j) - days(i))
    val tie = days.groupBy(identity).values
      .map(g => { val c = g.size.toLong; c * (c - 1) * (2 * c + 5) }).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tie
    val zMilli =
      if (s == 0 || var18 <= 0) 0L
      else {
        val m = math.floor(1000.0 * (s.abs - 1).toDouble /
          math.sqrt(var18.toDouble / 18.0)).toLong
        if (s > 0) m else -m
      }
    val row = DriftStats.mannKendall(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === s)
    assert(row.getLong(2) === var18)
    assert(row.getLong(3) === zMilli)
    assert(row.getString(4) ===
      (if (zMilli > 1960) "increasing"
      else if (zMilli < -1960) "decreasing" else "none"))
  }

  test("levene_bf equals a lower-median deviation replay") {
    val li = Tables.read(spark, dir, "lineitem")
      .selectExpr("l_returnflag g",
        "CAST(round(l_extendedprice * 100) AS LONG) c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med(flag: String): Long = {
      val v = li.filter(_._1 == flag).map(_._2).sorted
      // lower median: smallest value with 2*cum >= n
      v((v.length - 1) / 2)
    }
    val medByG = Map("N" -> med("N"), "A" -> med("A"), "R" -> med("R"))
    val dev = li.map { case (g, c) => (g, (c - medByG(g)).abs) }
    def m(flag: String): (Long, Long, BigInt) = {
      val g = dev.filter(_._1 == flag).map(_._2)
      (g.length.toLong, g.sum,
        g.map(z => BigInt(z) * z).foldLeft(BigInt(0))(_ + _))
    }
    val (nn, s1n, s2n) = m("N")
    val (na, s1a, s2a) = m("A")
    val (nr, s1r, s2r) = m("R")
    val n = nn + na + nr
    val sumTerm = s1n.toDouble * s1n.toDouble / nn.toDouble +
      s1a.toDouble * s1a.toDouble / na.toDouble +
      s1r.toDouble * s1r.toDouble / nr.toDouble
    val s1 = s1n + s1a + s1r
    val ssb = sumTerm - s1.toDouble * s1.toDouble / n.toDouble
    val ssw = (s2n.toDouble - s1n.toDouble * s1n.toDouble / nn.toDouble) +
      (s2a.toDouble - s1a.toDouble * s1a.toDouble / na.toDouble) +
      (s2r.toDouble - s1r.toDouble * s1r.toDouble / nr.toDouble)
    val wMilli = math.floor(1000.0 * (ssb / 2.0) /
      (ssw / (n - 3).toDouble)).toLong
    val row = DriftStats.leveneBf(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === medByG("N"))
    assert(row.getLong(2) === medByG("A"))
    assert(row.getLong(3) === medByG("R"))
    assert(row.getLong(4) === wMilli)
  }

  test("segmented_trend equals a prefix/argmax/slope replay") {
    val grid = Tables.read(spark, dir, "orders")
      .selectExpr("to_date(o_orderdate) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toEpochDay)
    val n = grid.length.toLong
    val tSum = grid.map(_._2).sum
    var pre = 0L
    val scored = grid.zipWithIndex.map { case ((d, x), i) =>
      pre += x
      (d, i + 1L, x, (BigInt(n) * pre - BigInt(i + 1L) * tSum).abs)
    }
    val cut = scored.maxBy(t => (t._4, -t._1.toEpochDay))
    def slope(seg: Seq[(Long, Long)]): Option[Long] = {
      val k = BigInt(seg.length)
      val sx = seg.map(t => BigInt(t._1)).sum
      val sy = seg.map(t => BigInt(t._2)).sum
      val sxx = seg.map(t => BigInt(t._1) * t._1).sum
      val sxy = seg.map(t => BigInt(t._1) * t._2).sum
      val den = k * sxx - sx * sx
      if (den == 0) None
      else {
        val num = k * sxy - sx * sy
        val q = (num.abs * 1000) / den
        Some(if (num < 0) (-q).toLong else q.toLong)
      }
    }
    val left = scored.filter(_._2 <= cut._2).map(t => (t._2, t._3))
    val right = scored.filter(_._2 > cut._2).map(t => (t._2, t._3))
    val row = DriftStats.segmentedTrend(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getDate(1).toLocalDate === cut._1)
    assert(row.getLong(2) === left.length.toLong)
    assert(row.getLong(3) === right.length.toLong)
    assert((if (row.isNullAt(4)) None else Some(row.getLong(4))) ===
      slope(left))
    assert((if (row.isNullAt(5)) None else Some(row.getLong(5))) ===
      slope(right))
  }

  test("ams_f2 equals an md5-sign replay; estimators are unbiased-ish") {
    val users = Tables.events(spark, dir)
      .selectExpr("user_id").collect().map(_.getLong(0))
    def sign(j: Int, u: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$u".getBytes("UTF-8"))
      val hex = "%02x".format(h(0)).charAt(0)
      if (java.lang.Long.parseLong(hex.toString, 16) % 2 == 0) 1L else -1L
    }
    val zs = (0 until 8).map(j => users.map(u => sign(j, u)).sum)
    val f2 = users.groupBy(identity).values
      .map(g => g.size.toLong * g.size).sum
    val est = zs.map(z => z * z).sum / 8
    val row = Sketches.amsF2(spark, dir).collect().head
    assert(row.getLong(0) === users.length.toLong)
    assert(row.getLong(2) === f2)
    assert(row.getLong(3) === est)
    assert(row.getLong(4) === zs.map(z => z * z).min)
    assert(row.getLong(5) === zs.map(z => z * z).max)
  }

  test("knn_rerank equals a two-stage replay; shortlist loss is real") {
    val vecs = Tables.read(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS LONG)) v")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val model = vecs.filter(_._1 < 10).sortBy(_._1).flatMap { case (q, qv) =>
      val qn = dot(qv, qv)
      val short = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, v, dot(qv.take(16), v.take(16))) }
        .sortBy { case (id, _, p) => (-p, id) }
        .take(20)
      short
        .map { case (id, v, _) =>
          (id, dot(qv, v).toDouble / math.sqrt((qn * dot(v, v)).toDouble))
        }
        .sortBy { case (id, c) => (-c, id) }
        .take(5).zipWithIndex
        .map { case ((id, c), i) => (q, (i + 1).toLong, id, c) }
    }.toSeq
    val got = Similarity.knnRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got === model)
  }

  test("anova_f equals a fixed-order moment replay") {
    val li = Tables.read(spark, dir, "lineitem")
      .selectExpr("l_returnflag g",
        "CAST(round(l_extendedprice * 100) AS LONG) c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def m(flag: String): (Long, Long, BigInt) = {
      val g = li.filter(_._1 == flag).map(_._2)
      (g.length.toLong, g.sum,
        g.map(c => BigInt(c) * c).foldLeft(BigInt(0))(_ + _))
    }
    val (nn, s1n, s2n) = m("N")
    val (na, s1a, s2a) = m("A")
    val (nr, s1r, s2r) = m("R")
    val n = nn + na + nr
    // the engine's exact scalar chain, same association order
    val sumTerm = s1n.toDouble * s1n.toDouble / nn.toDouble +
      s1a.toDouble * s1a.toDouble / na.toDouble +
      s1r.toDouble * s1r.toDouble / nr.toDouble
    val s1 = s1n + s1a + s1r
    val ssb = sumTerm - s1.toDouble * s1.toDouble / n.toDouble
    val ssw = (s2n.toDouble - s1n.toDouble * s1n.toDouble / nn.toDouble) +
      (s2a.toDouble - s1a.toDouble * s1a.toDouble / na.toDouble) +
      (s2r.toDouble - s1r.toDouble * s1r.toDouble / nr.toDouble)
    val fMilli = math.floor(1000.0 * (ssb / 2.0) /
      (ssw / (n - 3).toDouble)).toLong
    val eta2 = math.floor(1000000.0 * (ssb / (ssb + ssw))).toLong
    val row = DriftStats.anovaF(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === nn)
    assert(row.getLong(2) === na)
    assert(row.getLong(3) === nr)
    assert(row.getLong(4) === fMilli)
    assert(row.getLong(5) === eta2)
    assert(ssb >= 0.0 && ssw > 0.0)
  }
}
