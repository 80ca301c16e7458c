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
