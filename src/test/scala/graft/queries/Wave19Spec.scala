package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 eleventh wave: the negation funnel
  * and the trailing-baseline burst detector, replayed in memory.
  */
class Wave19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def events(): Array[(Long, Long, String)] =
    Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) tm", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("funnel_negation equals an interval-count replay") {
    val ev = events()
    val su = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, g) => u -> g.map(_._2).min }
    val conv = su.flatMap { case (u, s) =>
      val ps = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2 > s)
      if (ps.isEmpty) None else Some((u, s, ps.map(_._2).min))
    }
    val clean = conv.count { case (u, s, p) =>
      !ev.exists(e => e._1 == u && e._3 == "error" && e._2 > s && e._2 < p)
    }.toLong
    val r = Analytics.funnelNegation(spark, dir).collect().head
    assert(r.getLong(0) === conv.size.toLong)
    assert(r.getLong(1) === clean)
    assert(r.getLong(2) === clean * 1000000L / conv.size)
    // negation bites on this data: some conversions are contaminated
    assert(clean < conv.size.toLong)
  }

  test("rfm_features equals a per-user fold replay") {
    val withVal = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) tm", "event_type",
        "CAST(round(value * 100) AS LONG) c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val mx = withVal.map(_._2).max
    val rows = withVal.groupBy(_._1).flatMap { case (u, g) =>
      val p = g.filter(_._3 == "purchase")
      if (p.isEmpty) None
      else Some((u,
        (mx - p.map(_._2).max) / 86400000000L,
        p.size.toLong,
        p.map(_._4).sum,
        (mx - g.map(_._2).min) / 86400000000L,
        g.count(_._3 == "error").toLong * 1000000L / g.size))
    }.toSeq.sortBy(t => (-t._4, t._1)).take(100)
    val got = TrainingPipeline.rfmFeatures(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === rows)
    // purchasers only: every emitted user really has a purchase
    val purchasers = withVal.filter(_._3 == "purchase").map(_._1).toSet
    assert(got.forall(r => purchasers(r._1)))
  }

  test("embedding_drift equals a parity-split centroid replay") {
    val vecs = Tables.read(spark, dir, "embeddings")
      .selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(round(x * 1000) AS LONG)) v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def centroid(half: Long): Array[Long] = {
      val g = vecs.filter(_._1 % 2 == half).map(_._2)
      (0 until 64).map(i =>
        math.floor(g.map(_(i)).sum.toDouble / g.length + 0.5).toLong)
        .toArray
    }
    val ma = centroid(0); val mb = centroid(1)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val shifts = ma.zip(mb).map { case (x, y) => (x - y).abs }
    val r = Similarity.embeddingDrift(spark, dir).collect().head
    assert(r.getLong(0) === dot(ma, mb))
    assert(r.getLong(1) === dot(ma, ma))
    assert(r.getLong(2) === dot(mb, mb))
    assert(r.getLong(3) ===
      ma.zip(mb).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(r.getLong(4) === shifts.max)
    assert(r.getLong(5) === (shifts.indexOf(shifts.max) + 1).toLong)
    assert(r.getDouble(6) === dot(ma, mb).toDouble /
      math.sqrt((dot(ma, ma) * dot(mb, mb)).toDouble))
    // dist² identity: ‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b
    assert(r.getLong(3) === r.getLong(1) + r.getLong(2) - 2 * r.getLong(0))
  }

  test("burst_days equals a trailing-window replay; gaps excluded") {
    val byDay = Tables.events(spark, dir)
      .selectExpr("CAST(ts AS DATE) d").collect()
      .map(_.getDate(0).toLocalDate)
      .groupBy(identity).map { case (d, g) => d -> g.size.toLong }
    val expect = byDay.toSeq.sortBy(_._1).flatMap { case (d, n) =>
      val trail = (1 to 7).flatMap(k => byDay.get(d.minusDays(k.toLong)))
      if (trail.size != 7) None
      else {
        val ts = trail.sum
        val ratio = n * 7L * 1000000L / ts
        Some((d.toString, n, ts, ratio, ratio > 3000000L))
      }
    }
    val got = Analytics.burstDays(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got === expect)
    assert(got.nonEmpty) // the day grid is dense enough to window
  }
}
