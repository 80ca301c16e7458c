package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 eighth wave. The Hilbert curve is
  * pinned by its DEFINING properties, exhaustively: the 10-level
  * xy→d map is a bijection on the full 1024×1024 grid and every pair
  * of consecutive indices is a grid NEIGHBOR (|Δx|+|Δy| = 1) — the
  * locality Z-order lacks (Z's diagonal jumps are why its bucket
  * spans inflate); the layout queries are then compared end to end.
  */
class Wave16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Plain-Scala replica of the 10-level integer xy→d map. */
  private def hilbertD(x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 512L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * (3 * rx + ry - 2 * rx * ry)
      if (ry == 0) {
        val nx = if (rx == 1) s - 1 - y else y
        val ny = if (rx == 1) s - 1 - x else x
        x = nx; y = ny
      }
      s /= 2
    }
    d
  }

  test("hilbert xy->d is a bijection on the full 1024^2 grid") {
    val seen = new java.util.BitSet(1 << 20)
    var x = 0
    while (x < 1024) {
      var y = 0
      while (y < 1024) {
        val d = hilbertD(x.toLong, y.toLong)
        assert(d >= 0 && d < (1L << 20))
        assert(!seen.get(d.toInt), s"collision at d=$d")
        seen.set(d.toInt)
        y += 1
      }
      x += 1
    }
    assert(seen.cardinality() === (1 << 20))
  }

  test("consecutive hilbert indices are grid neighbors (locality)") {
    // invert via a full scan table, then walk d = 0 .. 2^20-1
    val xy = new Array[Int](1 << 20)
    var x = 0
    while (x < 1024) {
      var y = 0
      while (y < 1024) {
        xy(hilbertD(x.toLong, y.toLong).toInt) = (x << 10) | y
        y += 1
      }
      x += 1
    }
    var d = 1
    while (d < (1 << 20)) {
      val a = xy(d - 1); val b = xy(d)
      val dist = math.abs((a >> 10) - (b >> 10)) +
        math.abs((a & 1023) - (b & 1023))
      assert(dist === 1, s"jump at d=$d")
      d += 1
    }
  }

  test("hilbert_layout equals a replay; beats zorder spans here") {
    val pts = Tables.read(spark, dir, "orders")
      .selectExpr(
        "o_custkey & 1023 x",
        "(CAST(round(o_totalprice * 100) AS LONG) div 6000) & 1023 y")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = pts.groupBy { case (x, y) => hilbertD(x, y) >> 14 }
      .map { case (b, g) =>
        val (xs, ys) = (g.map(_._1), g.map(_._2))
        (b, (g.size.toLong, xs.min, xs.max, ys.min, ys.max,
          (xs.max - xs.min + 1) * (ys.max - ys.min + 1)))
      }
    val got = Layout.hilbertLayout(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expect)
    // locality payoff on this dataset: total pruning-span area of the
    // Hilbert buckets does not exceed the Z-order layout's
    val zSpan = Layout.zorderLayout(spark, dir).collect()
      .map(_.getLong(6)).sum
    val hSpan = got.values.map(_._6).sum
    assert(hSpan <= zSpan, s"hilbert $hSpan vs zorder $zSpan")
  }

  test("cluster_silhouette equals a squared-distance replay") {
    val vecs = Tables.read(spark, dir, "embeddings")
      .selectExpr(
        "vec_id", "CAST(label AS LONG) label",
        "transform(embedding, x -> CAST(round(x * 1000) AS LONG)) v")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, g) =>
      val n = g.size
      l -> (0 until 64).map { i =>
        math.floor(g.map(_._3(i)).sum.toDouble / n + 0.5).toLong
      }.toArray
    }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
    val sv = vecs.map { case (_, l, v) =>
      val a2 = d2(v, cents(l))
      val b2 = cents.filter(_._1 != l).values.map(d2(v, _)).min
      (l, BigInt((b2 - a2)) * 1000000 / BigInt(math.max(1L, math.max(a2, b2))))
    }.map { case (l, s) => (l, s.toLong) }
    val expectLab = sv.groupBy(_._1).map { case (l, g) =>
      l -> (g.size.toLong, g.map(_._2).sum / g.size, g.map(_._2).min)
    }
    val got = Similarity.clusterSilhouette(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    expectLab.foreach { case (l, e) => assert(got(l) === e, s"label $l") }
    assert(got(-1L)._1 === sv.length.toLong)
    assert(got(-1L)._3 === sv.map(_._2).min)
  }

  test("source_coverage_greedy equals an in-memory greedy replay") {
    val docs = Tables.read(spark, dir, "documents")
      .selectExpr("doc_id", "source", "lower(text) t").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val bySource = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.flatMap { case (_, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        w.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet
    }
    var covered = Set.empty[String]
    var pickedNames = Set.empty[String]
    val expect = (1 to 5).map { r =>
      val (src, gain) = bySource.view
        .filterKeys(!pickedNames(_))
        .map { case (s, sh) => (s, (sh -- covered).size.toLong) }
        .toSeq.minBy { case (s, g) => (-g, s) }
      covered ++= bySource(src)
      pickedNames += src
      (r.toLong, src, gain, covered.size.toLong)
    }
    val rows = TrainingPipeline.sourceCoverageGreedy(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(rows === expect)
    // greedy invariant: marginal gains are non-increasing
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(b._3 <= a._3)
      case _ =>
    }
  }
}
