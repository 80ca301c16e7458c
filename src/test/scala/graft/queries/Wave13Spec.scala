package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 fourth wave: each query replayed in
  * plain Scala from the raw sf0.001 rows — md5 via MessageDigest,
  * integer arithmetic in Long/BigInt, truncating integer division via
  * BigInt quotient (both engines truncate toward zero). Also pins the
  * structural invariants: sketch join-size estimates never
  * underestimate, the merged median's rank displacement is bounded,
  * containment dominates Jaccard on every emitted pair.
  */
class Wave13Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket16(id: String): Long =
    java.lang.Long.parseLong(md5hex(id).substring(0, 4), 16) % 16

  test("sample_extrapolate equals a hash-sample replay; one scan") {
    val li = Tables.read(spark, dir, "lineitem")
      .selectExpr("l_returnflag f", "CAST(round(l_extendedprice * 100) AS LONG) c",
        "CAST(l_orderkey AS STRING) ok", "CAST(l_linenumber AS STRING) ln")
      .collect().map(r => (r.getString(0), r.getLong(1),
        bucket16(r.getString(2) + ":" + r.getString(3)) == 0))
    val rows = Sketches.sampleExtrapolate(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    li.groupBy(_._1).foreach { case (f, g) =>
      val nEx = g.length.toLong
      val revEx = g.map(_._2).sum
      val nEst = 16L * g.count(_._3)
      val revEst = 16L * g.filter(_._3).map(_._2).sum
      val (n1, n2, r1, r2, nerr, rerr) = rows(f)
      assert(n1 === nEx); assert(n2 === nEst)
      assert(r1 === revEx); assert(r2 === revEst)
      assert(nerr === (nEst - nEx).abs * 1000000L / nEx)
      assert(rerr ===
        (BigInt((revEst - revEx).abs) * 1000000 / BigInt(revEx)).toLong)
      // a 1/16 hash sample of thousands of rows lands within 25%
      assert(nerr < 250000, s"sample wildly off for $f")
    }
  }

  test("join_size_est equals a CM inner-product replay; never under") {
    val eKeys = Tables.events(spark, dir)
      .selectExpr("user_id").collect().map(_.getLong(0))
    val oKeys = Tables.read(spark, dir, "orders")
      .selectExpr("o_custkey").collect().map(_.getLong(0))
    def cell(d: Int, k: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$d:$k").substring(0, 8), 16) % 512
    val ips = (0 until 4).map { d =>
      val se = eKeys.groupBy(cell(d, _)).view.mapValues(_.length.toLong)
      val so = oKeys.groupBy(cell(d, _)).view.mapValues(_.length.toLong)
      se.toSeq.map { case (b, ce) => ce * so.getOrElse(b, 0L) }.sum
    }
    val oSet = oKeys.groupBy(identity).view.mapValues(_.length.toLong)
    val exact = eKeys.map(k => oSet.getOrElse(k, 0L)).sum
    val row = Sketches.joinSizeEst(spark, dir).collect().head
    assert(row.getLong(0) === exact)
    assert(row.getLong(1) === ips.min)
    assert(row.getLong(2) === ips.max)
    assert(row.getLong(3) === (ips.min - exact) * 1000000L / exact)
    assert(ips.min >= exact, "CM join-size estimate must not underestimate")
  }

  test("median_merge equals a shard-median replay; rank stays close") {
    val xs = Tables.read(spark, dir, "lineitem")
      .selectExpr("CAST(round(l_extendedprice * 100) AS LONG) x",
        "CAST(l_orderkey AS STRING) ok", "CAST(l_linenumber AS STRING) ln")
      .collect()
      .map(r => (r.getLong(0), bucket16(r.getString(1) + ":" + r.getString(2))))
    val byShard = xs.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val med = byShard.toSeq.map { case (s, v) =>
      (s, v((v.length + 1) / 2 - 1), v.length.toLong)
    }
    val n = xs.length.toLong
    // weighted lower median of the shard medians, ordered (m, shard)
    val sortedMed = med.sortBy(t => (t._2, t._1))
    var cw = 0L
    val est = sortedMed.find { t => cw += t._3; cw >= (n + 1) / 2 }.get._2
    val le = xs.count(_._1 <= est).toLong
    val row = Statistics.medianMerge(spark, dir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === 16L)
    assert(row.getLong(2) === est)
    assert(row.getLong(3) === le * 1000000L / n)
    assert(row.getLong(4) === (le * 1000000L / n - 500000L).abs)
    // 16 exact shard medians cannot displace the merged rank far
    assert(row.getLong(4) < 100000, "merged median rank off by >10%")
  }

  test("markov_next equals a sequence replay; rows normalize to ~1") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_micros(ts) us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1))
    }.toSeq
    val cnt = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tot = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val rows = Analytics.markovNext(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    assert(rows.map(_._1).toSet === cnt.keySet)
    rows.foreach { case ((p, nx), (nC, ppm)) =>
      assert(nC === cnt((p, nx)))
      assert(ppm === nC * 1000000L / tot(p))
    }
    // each source state's probabilities sum to 1 within flooring loss
    rows.groupBy(_._1._1).foreach { case (p, g) =>
      val s = g.map(_._2._2).sum
      assert(s <= 1000000L && s > 1000000L - g.length)
    }
  }

  test("jl_projection equals a sign-matrix replay") {
    val vecs = Tables.read(spark, dir, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS LONG)) v")
      .where("vec_id < 40")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val signs = (0 until 16).map { j =>
      (1 to 64).map { i =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"jl:$j:$i".getBytes("UTF-8"))
        if (((h(0) & 0xff) >>> 4) % 2 == 0) 1L else -1L
      }.toArray
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val proj = vecs.map { case (id, v) =>
      (id, v, signs.map(s => dot(s, v)).toArray)
    }
    def tdiv(a: Long, b: Long): Long = { // truncate toward zero
      val q = a / b; q // JVM / already truncates toward zero
    }
    val pairs = for {
      (ia, va, pa) <- proj
      (ib, vb, pb) <- proj
      if ia < ib
    } yield {
      val d = dot(va, vb)
      val est = tdiv(dot(pa, pb), 16L)
      (d, est, (est - d).abs, (est >= 0) == (d >= 0))
    }
    val row = Similarity.jlProjection(spark, dir).collect().head
    assert(row.getLong(0) === pairs.length.toLong)
    assert(row.getLong(1) === pairs.map(_._1.abs).sum / pairs.length)
    assert(row.getLong(2) === pairs.map(_._3).sum / pairs.length)
    assert(row.getLong(3) === pairs.map(_._3).max)
    assert(row.getLong(4) === pairs.count(_._4).toLong)
  }

  test("clustering_coefficient equals a brute triangle replay") {
    val li = Tables.read(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val edgeCnt = byOrder.flatMap(s =>
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val edges = edgeCnt.filter(_._2 >= 5).keySet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val tri = adj.map { case (n, nb) =>
      n -> nb.toSeq.combinations(2)
        .count(p => edges.contains((p(0) min p(1), p(0) max p(1)))).toLong
    }
    val expect = deg.filter(_._2 >= 2).toSeq.map { case (n, d) =>
      val t = tri.getOrElse(n, 0L)
      (n, d, t, t * 2000000L / (d * (d - 1)))
    }.sortBy(t => (-t._4, t._1)).take(25)
    val rows = Graph.clusteringCoefficient(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === expect)
  }

  test("interarrival_hist equals a lag replay; shares sum to ~1") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) us", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3)).map(_._2)
      s.zip(s.drop(1)).map { case (a, b) => b - a }
    }.toSeq
    val hist = gaps.groupBy(g =>
      java.lang.Long.toBinaryString(g + 1).length.toLong - 1)
      .view.mapValues(_.size.toLong).toMap
    val t = gaps.length.toLong
    val rows = Analytics.interarrivalHist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet === hist.keySet)
    rows.foreach { case (b, n, ppm) =>
      assert(n === hist(b))
      assert(ppm === n * 1000000L / t)
    }
    val s = rows.map(_._3).sum
    assert(s <= 1000000L && s > 1000000L - rows.length)
  }

  test("dict_economics equals a distinct-payload replay") {
    val part = Tables.read(spark, dir, "part")
      .selectExpr("CAST(p_brand AS STRING) b", "CAST(p_name AS STRING) nm",
        "CAST(p_size AS STRING) sz", "CAST(p_type AS STRING) tp")
      .collect()
    def replay(vs: Seq[String]): (Long, Long, Long, Long) = {
      val n = vs.length.toLong
      val grp = vs.groupBy(identity)
      val d = grp.size.toLong
      val plain = vs.map(_.length.toLong).sum
      val width = if (d <= 256) 1L else if (d <= 65536) 2L else 4L
      val dict = grp.keySet.toSeq.map(_.length.toLong).sum + n * width
      (n, d, plain, dict)
    }
    val expect = Map(
      "p_brand" -> replay(part.map(_.getString(0))),
      "p_name" -> replay(part.map(_.getString(1))),
      "p_size" -> replay(part.map(_.getString(2))),
      "p_type" -> replay(part.map(_.getString(3))))
    val rows = Layout.dictEconomics(spark, dir).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val (n, d, plain, dict) = expect(r.getString(0))
      assert(r.getLong(1) === n); assert(r.getLong(2) === d)
      assert(r.getLong(3) === plain); assert(r.getLong(4) === dict)
      assert(r.getLong(5) === dict * 1000L / plain)
      assert(r.getBoolean(6) === (dict < plain))
    }
    // the economics story holds on real data: enum wins, near-unique text loses
    val byName = rows.map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(byName("p_brand"), "low-cardinality column should dict-win")
  }

  test("dedup_containment: containment dominates jaccard on every row") {
    val rows = Dedup.dedupContainment(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val inter = r.getLong(2)
      val nc = r.getLong(3); val ng = r.getLong(4)
      val cont = r.getLong(5); val jm = r.getLong(6)
      assert(nc <= ng)
      assert(cont === inter * 1000000L / nc)
      assert(jm === inter * 1000L / (nc + ng - inter))
      assert(cont >= jm * 1000 / 1000, "containment >= jaccard")
      assert(jm < 500) // the sub-Jaccard gate
    }
    // ranked descending, ties broken by (contained, container)
    val keys = rows.map(r => (-r.getLong(5), r.getLong(0), r.getLong(1)))
    assert(keys.sameElements(keys.sorted))
  }
}
