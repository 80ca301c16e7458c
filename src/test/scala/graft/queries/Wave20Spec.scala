package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 fifteenth wave: the minimax isotonic
  * fit replayed against a REAL sequential PAVA (quantized), and the
  * stratified effect replayed cell by cell.
  */
class Wave20Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("isotonic_calibration: minimax equals sequential PAVA; monotone") {
    // (two independent derivations of the same fit: the engine's
    // bounded-grid minimax and the classical pool-adjacent algorithm)
    val rows = Evaluation.isotonicCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // minimax replay on the floored segment averages
    val bins = rows.map(r => (r._1, r._2, r._3))
    def aJK(j: Int, k: Int): Long = {
      val seg = bins.filter(b => b._1 >= bins(j)._1 && b._1 <= bins(k)._1)
      seg.map(_._3).sum * 1000000L / seg.map(_._2).sum
    }
    val n = bins.length
    val minimax = (0 until n).map { i =>
      (0 to i).map(j => (i until n).map(k => aJK(j, k)).min).max
    }
    assert(rows.map(_._5).toSeq === minimax)
    // and the minimax identity agrees with a REAL sequential PAVA:
    // exact-rational pooling (cross-multiplied average compares), block
    // averages floored to ppm at the end — floor commutes with min/max,
    // so this equals the engine's floored-minimax semantics
    val pavaPerBin = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stack2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      // redo PAVA tracking bin counts
      bins.foreach { case (_, nb, pb) =>
        var cur = (pb, nb, 1)
        while (stack2.nonEmpty && {
          val a = stack2.last
          a._1 * cur._2 >= cur._1 * a._2
        }) {
          val a = stack2.remove(stack2.length - 1)
          cur = (a._1 + cur._1, a._2 + cur._2, a._3 + cur._3)
        }
        stack2 += cur
      }
      stack2.foreach { case (p, w, nbins) =>
        (0 until nbins).foreach(_ => out += p * 1000000L / w)
      }
      out.toSeq
    }
    assert(rows.map(_._5).toSeq === pavaPerBin,
      "minimax identity must equal sequential PAVA")
    // structural monotonicity
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(a <= b)
      case _ =>
    }
  }

  test("quantile_map equals an order-statistic replay; map is monotone") {
    val cust = Tables.read(spark, dir, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val byId = Tables.read(spark, dir, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (cust(r.getLong(0)), r.getLong(1)))
    def decile(seg: String, q: Int): Long = {
      val vs = byId.filter(_._1 == seg).map(_._2).sorted
      vs(((q * vs.length + 90) / 100 - 1).toInt) // 1-based rank
    }
    val got = Analytics.quantileMap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(got.map(_._1).toSeq === (1 to 9).map(_ * 10L))
    got.foreach { case (q, va, vb, sh, ratio) =>
      assert(va === decile("BUILDING", q.toInt))
      assert(vb === decile("AUTOMOBILE", q.toInt))
      assert(sh === vb - va)
      assert(ratio === vb * 1000000L / va)
    }
    // both decile ladders are monotone non-decreasing
    got.map(_._2).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ => }
    got.map(_._3).sliding(2).foreach {
      case Array(a, b) => assert(a <= b); case _ => }
  }

  test("double_changepoint equals an exhaustive SSE replay") {
    val days = Tables.read(spark, dir, "orders")
      .selectExpr(
        "CAST(o_orderdate AS DATE) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val n = days.length
    val s1 = days.scanLeft(BigInt(0))(_ + _._2).tail
    val s2 = days.scanLeft(BigInt(0))((a, t) =>
      a + BigInt(t._2) * t._2).tail
    def obj(i1: Int, i2: Int): Double = {
      def seg(a1: BigInt, a2: BigInt, cnt: Int): Double =
        a2.toDouble - a1.toDouble * a1.toDouble / cnt.toDouble
      seg(s1(i1 - 1), s2(i1 - 1), i1) +
        seg(s1(i2 - 1) - s1(i1 - 1), s2(i2 - 1) - s2(i1 - 1), i2 - i1) +
        seg(s1(n - 1) - s1(i2 - 1), s2(n - 1) - s2(i2 - 1), n - i2)
    }
    val best = (for {
      i1 <- 1 until n - 1
      i2 <- i1 + 1 until n
    } yield (obj(i1, i2), i1, i2)).minBy(t => (t._1, t._2, t._3))
    val (_, b1, b2) = best
    val r = Analytics.doubleChangepoint(spark, dir).collect().head
    assert(r.getDate(0).toLocalDate === days(b1 - 1)._1)
    assert(r.getDate(1).toLocalDate === days(b2 - 1)._1)
    assert(r.getLong(2) === b1.toLong)
    assert(r.getLong(3) === (b2 - b1).toLong)
    assert(r.getLong(4) === (n - b2).toLong)
    assert(r.getLong(5) === (s1(b1 - 1) / b1).toLong)
    assert(r.getLong(6) ===
      ((s1(b2 - 1) - s1(b1 - 1)) / (b2 - b1)).toLong)
    assert(r.getLong(7) === ((s1(n - 1) - s1(b2 - 1)) / (n - b2)).toLong)
  }

  test("seasonal_strength equals a fixed-order eta-squared replay") {
    val days = Tables.read(spark, dir, "orders")
      .selectExpr(
        "CAST(o_orderdate AS DATE) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (d, g) =>
        (d.getDayOfWeek.getValue.toLong, g.map(_._2).sum)
      }
    val n = days.length.toLong
    val s = days.map(t => BigInt(t._2)).sum
    val q = days.map(t => BigInt(t._2) * t._2).sum
    val cells = days.groupBy(_._1).map { case (wd, g) =>
      wd -> (g.size.toLong, g.map(t => BigInt(t._2)).sum)
    }
    // the engine's fixed-order wd=1..7 double chain, replayed verbatim
    val b = (1L to 7L).map { wd =>
      val (nw, sw) = cells(wd)
      sw.toDouble * sw.toDouble / nw.toDouble
    }.sum // Seq.sum folds left in index order — the same fixed order
    val eta2 = math.floor(
      (n.toDouble * b - s.toDouble * s.toDouble) * 1000000.0 /
        (n.toDouble * q.toDouble - s.toDouble * s.toDouble)).toLong
    val r = Analytics.seasonalStrength(spark, dir).collect().head
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === eta2)
    assert(eta2 >= 0L && eta2 <= 1000000L) // variance share bounds
  }

  test("stratified_effect equals a per-cell replay; ATT is the fold") {
    val cust = Tables.read(spark, dir, "customer")
      .selectExpr("c_custkey", "c_nationkey < 12 t", "c_mktsegment s")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    val cells = Tables.read(spark, dir, "orders")
      .selectExpr("o_custkey", "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect()
      .map(r => (cust(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._2).sum)
      }
    val strata = cells.keys.map(_._2).toSeq.distinct.sorted
    def mean(t: Boolean, s: String): Long = {
      val (n, sum) = cells((t, s)); sum / n
    }
    val got = Statistics.stratifiedEffect(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.get(2), r.get(4), r.getLong(5))).toMap
    strata.foreach { s =>
      val (nT, _) = cells((true, s))
      val d = mean(true, s) - mean(false, s)
      val (gn, gmt, gmc, gd) = got(s)
      assert(gn === nT && gd === d, s)
      assert(gmt === mean(true, s) && gmc === mean(false, s), s)
    }
    val att = strata.map(s =>
      cells((true, s))._1 * (mean(true, s) - mean(false, s))).sum /
      strata.map(s => cells((true, s))._1).sum
    assert(got("zz_att")._4 === att)
  }
}
