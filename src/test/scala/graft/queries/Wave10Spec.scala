package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-7 mining/curation additions:
  * seq_support and collision_entropy replayed in plain Scala from the
  * raw tables, keeper_quality cross-checked against the cluster
  * roster invariants it must share with dedup_clusters. All on
  * sf0.001.
  */
class Wave10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("seq_support equals a brute-force subsequence-exists model") {
    val events = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "cast(ts as long) tsl")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = events.map(_._1).distinct
    val types = events.map(_._2).distinct.sorted
    val byUser = events.groupBy(_._1)
    val model = (for {
      a <- types; b <- types
      support = users.count { u =>
        val es = byUser(u)
        val as = es.filter(_._2 == a)
        val bs = es.filter(_._2 == b)
        as.nonEmpty && bs.nonEmpty && as.map(_._3).min < bs.map(_._3).max
      }
      if support > 0
    } yield ((a, b), (support.toLong,
      support.toLong * 1000000L / users.length))).toMap

    val got = Association.seqSupport(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(got === model)
  }

  test("collision_entropy equals a plain-Scala Simpson-index replay") {
    val docs = Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val scored = docs.map { case (id, text) =>
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val counts = tk.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val sumSq = counts.map(c => c * c).sum
      (id, n, counts.size.toLong, counts.max,
        sumSq * 1000000L / n / n)
    }
    val model = scored
      .sortBy { case (id, _, _, _, ppm) => (-ppm, id) }
      .take(100).toSeq

    val got = TextAnalysis.collisionEntropy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === model)
  }

  test("seq_support3 equals a brute-force three-level witness model") {
    val events = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "cast(ts as long) tsl")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = events.map(_._1).distinct
    val types = events.map(_._2).distinct.sorted
    val byUser = events.groupBy(_._1)
    def hasTriple(u: Long, a: String, b: String, c: String): Boolean = {
      val es = byUser(u)
      // literal witness search, no greedy shortcut: the model must be
      // independent of the identity the engine relies on
      es.exists { case (_, ta, tsa) =>
        ta == a && es.exists { case (_, tb, tsb) =>
          tb == b && tsb > tsa && es.exists { case (_, tc, tsc) =>
            tc == c && tsc > tsb
          }
        }
      }
    }
    val model = (for {
      a <- types; b <- types; c <- types
      support = users.count(hasTriple(_, a, b, c))
      if support > 0
    } yield ((a, b, c),
      (support.toLong, support.toLong * 1000000L / users.length))).toMap
    val got = Association.seqSupport3(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4)))).toMap
    assert(got === model)
  }

  test("mix_allocate: quotas sum EXACTLY to the budget; Hamilton replay") {
    val B = 1000000L
    val rows = TrainingPipeline.mixAllocate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._6).sum === B)
    val t = rows.map(_._2).sum
    // plain-Scala largest-remainder apportionment from the raw masses
    val floorQ = rows.map { case (s, tok, _, _, _, _) =>
      (s, tok, tok * B / t, (tok * B) % t)
    }
    val deficit = B - floorQ.map(_._3).sum
    val winners = floorQ.sortBy { case (s, _, _, rem) => (-rem, s) }
      .take(deficit.toInt).map(_._1).toSet
    floorQ.foreach { case (s, _, fq, rem) =>
      val r = rows.find(_._1 == s).get
      assert(r._3 === fq)
      assert(r._4 === rem)
      assert(r._5 === (if (winners(s)) 1L else 0L))
      assert(r._6 === fq + r._5)
    }
  }

  test("curation_funnel: stage monotonicity + quality/exact stage replay") {
    val rows = TrainingPipeline.curationFunnel(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    rows.foreach { case (s, raw, q, e, nr, tok) =>
      assert(raw >= q && q >= e && e >= nr, s"funnel not monotone for $s")
      assert(nr > 0 ==> (tok > 0))
    }
    // replay stages 1–2 in plain Scala from the raw table
    val docs = Tables.read(spark, dir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def collPpm(text: String): (Long, Long) = {
      val tk = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (tk.isEmpty) (0L, 1000000L)
      else {
        val counts = tk.groupBy(identity).map(_._2.length.toLong)
        val n = counts.sum
        (n, counts.map(c => c * c).sum * 1000000L / n / n)
      }
    }
    val qualified = docs.filter { case (_, _, t) =>
      val (n, cp) = collPpm(t); n >= 30 && cp <= 100000
    }
    val bySrcQ = qualified.groupBy(_._2).view.mapValues(_.length.toLong)
    rows.foreach { case (s, _, q, _, _, _) =>
      assert(q === bySrcQ.getOrElse(s, 0L), s"n_quality mismatch for $s")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hexOf(t: String): String =
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val keepers = qualified.groupBy { case (_, _, t) => md5hexOf(t) }
      .map(_._2.minBy(_._1))
    val bySrcE = keepers.groupBy(_._2).view.mapValues(_.size.toLong)
    rows.foreach { case (s, _, _, e, _, _) =>
      assert(e === bySrcE.getOrElse(s, 0L), s"n_exact mismatch for $s")
    }
  }

  test("mrr_eval equals a plain-Scala overlap-ranking replay") {
    val docs = Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams(t: String): Set[String] = {
      val tk = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }
    val gmap = docs.map { case (id, t) => id -> grams(t) }.toMap
    val labels = Dedup.ccLabelsShared(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byRoot = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val model = byRoot.toSeq.sortBy(_._1).map { case (root, members) =>
      val relSet = members.filter(_ != root).toSet
      val scores = docs.map(_._1).filter(_ != root)
        .map(d => (d, (gmap(root) & gmap(d)).size))
        .filter(_._2 > 0)
      val scoredRel = scores.filter(p => relSet(p._1))
      if (scoredRel.isEmpty)
        (root, relSet.size.toLong, None, None, 0L)
      else {
        val bestRel = scoredRel.minBy { case (d, s) => (-s, d) }
        val nBetter = scores.count { case (d, s) =>
          s > bestRel._2 || (s == bestRel._2 && d < bestRel._1)
        }
        val rank = nBetter + 1L
        (root, relSet.size.toLong, Some(rank), Some(1000000L / rank),
          if (rank <= 10) 1L else 0L)
      }
    }
    val got = TextAnalysis.mrrEval(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))
    }.toSeq
    assert(got === model)
  }

  test("cusum_shift equals a plain-Scala exact-CUSUM replay") {
    val days = Tables.read(spark, dir, "orders")
      .selectExpr(
        "cast(o_orderdate as date) d",
        "cast(round(o_totalprice * 100) as long) cents")
      .groupBy("d").agg(org.apache.spark.sql.functions.sum("cents").as("x"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val n = days.length.toLong
    val t = days.map(_._2).sum
    var pre = 0L
    val s = days.zipWithIndex.map { case ((d, x), i) =>
      pre += x
      (d, x, n * pre - (i + 1L) * t)
    }
    val model = s.sortBy { case (d, _, sc) => (-math.abs(sc), d) }.take(10)
      .toSeq
    val got = Analytics.cusumShift(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got === model)
  }

  test("bloom_fpp equals a plain-Scala portable-Bloom replay") {
    val members = Tables.read(spark, dir, "orders")
      .select("o_custkey").distinct().collect().map(_.getLong(0))
    val custs = Tables.read(spark, dir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val mx = members.max
    val probes = custs.map(_ + mx)
    val n = members.length.toLong
    val m = n * 8
    def pos(seed: Int, k: Long): Long = {
      val hex = md5hex(s"$seed:$k").take(15)
      java.lang.Long.parseLong(hex, 16) % m
    }
    val occupied = members.flatMap(k => Seq(1, 2, 3).map(pos(_, k))).toSet
    val fpCount = probes.count { k =>
      Seq(1, 2, 3).forall(s => occupied(pos(s, k)))
    }.toLong
    // soundness: every member must pass its own filter
    members.take(200).foreach { k =>
      assert(Seq(1, 2, 3).forall(s => occupied(pos(s, k))))
    }
    val sb = occupied.size.toLong
    val expected = (n, probes.length.toLong, m, sb, fpCount,
      fpCount * 1000000L / probes.length,
      sb * 1000000L / m * sb / m * sb / m)
    val got = Sketches.bloomFpp(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got === expected)
  }

  test("degree_assortativity equals a plain-Scala Pearson replay") {
    val os = Tables.read(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = os.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length)
        yield (ss(i), ss(j))
    }.groupBy(identity).filter(_._2.size >= 5).keys.toSeq
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val pts = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val n = pts.size.toLong
    val sx = pts.map(_._1).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val denom = n.toDouble * sxx - sx.toDouble * sx
    val expected =
      if (denom == 0) None
      else Some((n.toDouble * sxy - sx.toDouble * sx) / denom)
    val r = Graph.degreeAssortativity(spark, dir).collect().head
    assert(r.getLong(0) === n / 2)
    val got = if (r.isNullAt(1)) None else Some(r.getDouble(1))
    assert(got === expected)
  }

  test("conversion_latency equals a per-user greedy replay") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val signups = ev.filter(_._2 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val lat = signups.toSeq.flatMap { case (u, s) =>
      val ps = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 > s)
      if (ps.isEmpty) None else Some((ps.map(_._3).min - s) / 60000000L)
    }
    val sorted = lat.sorted
    def pct(p: Int): Long =
      sorted.zipWithIndex
        .find { case (_, i) => (i + 1L) * 100 >= lat.size.toLong * p }
        .get._1
    val r = Analytics.conversionLatency(spark, dir).collect().head
    assert(r.getLong(0) === signups.size.toLong)
    assert(r.getLong(1) === lat.size.toLong)
    assert(r.getLong(2) === lat.size.toLong * 1000000L / signups.size)
    assert(r.getLong(3) === pct(50))
    assert(r.getLong(4) === pct(90))
  }

  test("jaccard_threshold_curve: monotone in t; recall consistent") {
    val rows = Dedup.jaccardThresholdCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq === (20L to 80L by 10L))
    // true pairs and candidate-true pairs both shrink as t rises;
    // candidates never exceed truth at any threshold
    rows.sliding(2).foreach { case Array((_, t1, c1, _), (_, t2, c2, _)) =>
      assert(t2 <= t1 && c2 <= c1)
    }
    rows.foreach { case (_, nTrue, nCandTrue, nCand) =>
      assert(nCandTrue <= nTrue)
      assert(nCandTrue <= nCand)
    }
    // LSH recall at 0.5 must agree with the lsh_recall gate's
    // numerator/denominator relation: every verified lshpair IS a
    // true pair at 0.5 reached by a candidate
    val lshAt50 = Dedup.minhashLshShared(spark, dir).count()
    val row50 = rows.find(_._1 == 50L).get
    assert(row50._3 === lshAt50)
  }

  test("image_phash_dedup equals a plain-Scala aHash + brute-force replay") {
    val ids = Tables.read(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    def hashOf(id: Long): (Long, Long) = {
      val w = 16 + (id % 16).toInt
      val h = 16 + (id % 8).toInt
      val sums = Array.ofDim[Long](8, 8)
      val cnts = Array.ofDim[Long](8, 8)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (7L * x + 13L * y + 31L * id) % 256L
        sums(8 * y / h)(8 * x / w) += v
        cnts(8 * y / h)(8 * x / w) += 1
      }
      val means = for (j <- 0 until 8; i <- 0 until 8)
        yield sums(j)(i) / cnts(j)(i)
      val thr = means.sum / 64
      var hi = 0L; var lo = 0L
      means.zipWithIndex.foreach { case (m, b) =>
        if (m >= thr) { if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32) }
      }
      (hi, lo)
    }
    val hs = ids.map(id => id -> hashOf(id)).toMap
    val classes = ids.groupBy(hs).map { case (h, ds) =>
      (ds.min, ds.length.toLong, h)
    }.toSeq
    val within = classes.collect { case (rep, n, _) if n >= 2 =>
      (rep, rep, 0L, n * (n - 1) / 2)
    }
    val cross = for {
      (ra, na, ha) <- classes; (rb, nb, hb) <- classes
      if ra < rb
      ham = java.lang.Long.bitCount(ha._1 ^ hb._1) +
        java.lang.Long.bitCount(ha._2 ^ hb._2)
      if ham <= 3
    } yield (ra, rb, ham.toLong, na * nb)
    val model = (within ++ cross).sortBy(t => (t._1, t._2))
    val got = MultimodalQueries.imagePhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === model)
  }

  test("abc_classification equals a plain-Scala Pareto replay") {
    val rev = Tables.read(spark, dir, "lineitem")
      .selectExpr("l_partkey", "cast(round(l_extendedprice * 100) as long) c")
      .groupBy("l_partkey").agg(org.apache.spark.sql.functions.sum("c")
        .as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val t = rev.map(_._2).sum
    var cum = 0L
    val classed = rev.sortBy { case (pk, r) => (-r, pk) }.map { case (_, r) =>
      cum += r
      (r, if (cum * 5 <= t * 4) "A" else if (cum * 20 <= t * 19) "B"
        else "C")
    }
    val model = classed.groupBy(_._2).map { case (cl, xs) =>
      (cl, xs.length.toLong, xs.map(_._1).sum,
        (BigInt(xs.map(_._1).sum) * 1000000 / t).toLong)
    }.toSeq.sortBy(_._1)
    val got = Analytics.abcClassification(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === model)
  }

  test("lorenz_deciles equals a plain-Scala cumulative replay") {
    val xs = Tables.events(spark, dir)
      .where("event_type = 'purchase'")
      .selectExpr("user_id", "cast(round(value * 100) as long) c")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.sum("c")
        .as("x"))
      .collect().map(_.getLong(1)).sorted
    val n = xs.length.toLong
    val tv = xs.sum
    // histogram (distinct-value) grain, matching the stated
    // semantics: cumulative rows are tie-group ENDS, not per-user
    // positions (diverges on ties otherwise)
    val hist = xs.groupBy(identity).toSeq
      .map { case (v, g) => (v, g.length.toLong) }.sortBy(_._1)
    val cums = hist
      .scanLeft((0L, 0L)) { case ((cp, cv), (v, c)) =>
        (cp + c, cv + v * c)
      }.tail
    val model = (1L to 10L).flatMap { d =>
      val qual = cums.filter { case (cpop, _) => cpop * 10 <= n * d }
      if (qual.isEmpty) None
      else {
        val (mp, mv) = (qual.map(_._1).max, qual.map(_._2).max)
        Some((d, mp * 1000000L / n, mv * 1000000L / tv))
      }
    }
    val got = Analytics.lorenzDeciles(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === model)
    // the curve is convex-monotone: value share never exceeds pop share
    got.foreach { case (_, p, v) => assert(v <= p) }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private implicit class Implies(private val p: Boolean) {
    def ==>(q: => Boolean): Boolean = !p || q
  }

  test("keeper_quality: rosters match dedup_clusters; keeper is argmax") {
    val clusters = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val chars = Tables.read(spark, dir, "documents")
      .selectExpr("doc_id", "cast(n_chars as long)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val members = Dedup.ccLabelsShared(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSeq).toMap

    val got = Dedup.keeperQuality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._1).toSeq === clusters.keys.toSeq.sorted)
    got.foreach { case (root, n, keeper, kChars) =>
      assert(n === clusters(root))
      val roster = members(root)
      assert(roster.contains(keeper))
      assert(kChars === chars(keeper))
      // argmax(n_chars), min doc_id on ties — no member beats it
      val best = roster.map(d => (-chars(d), d)).min
      assert((keeper, -kChars) === (best._2, best._1))
    }
  }
}
