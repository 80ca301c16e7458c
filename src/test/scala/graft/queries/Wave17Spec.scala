package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 ninth wave: the ppm-quantized
  * Durbin–Levinson recursion and the volume↔value cross-correlation,
  * both replayed from raw sf0.001 rows with BigInt moments.
  */
class Wave17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def dailyRevenue(): Seq[(java.time.LocalDate, Long, Long)] =
    Tables.read(spark, dir, "orders")
      .selectExpr(
        "CAST(o_orderdate AS DATE) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).map { case (d, g) =>
        (d, g.map(_._2).sum, g.size.toLong)
      }.toSeq.sortBy(_._1)

  /** exact ACF ppm at the given lags, autocorr_lag's convention. */
  private def acfPpm(
      days: Seq[(java.time.LocalDate, Long)], lags: Seq[Int]): Map[Int, Long] = {
    val n = BigInt(days.length)
    val s = days.map(d => BigInt(d._2)).sum
    val c = days.map { case (d, x) => (d, n * x - s) }.toMap
    val den = c.values.map(v => v * v).sum
    lags.map { lag =>
      val num = c.toSeq.flatMap { case (d, v) =>
        c.get(d.plusDays(lag.toLong)).map(v * _)
      }.sum
      val r =
        if (num < 0) -((BigInt(1000000) * -num) / den)
        else (BigInt(1000000) * num) / den
      lag -> r.toLong
    }.toMap
  }

  test("pacf_lags equals a quantized Durbin-Levinson replay") {
    val days = dailyRevenue().map(t => (t._1, t._2))
    val r = acfPpm(days, 1 to 5)
    // Long '/' truncates toward zero like Spark div / DuckDB //
    def dv(a: Long, b: Long): Long = a / (if (b == 0) 1L else b)
    val p11 = r(1)
    val num2 = r(2) - dv(p11 * r(1), 1000000)
    val den2 = 1000000 - dv(p11 * r(1), 1000000)
    val p22 = dv(num2 * 1000000, den2)
    val p21 = p11 - dv(p22 * p11, 1000000)
    val p33 = dv(
      (r(3) - dv(p21 * r(2) + p22 * r(1), 1000000)) * 1000000,
      1000000 - dv(p21 * r(1) + p22 * r(2), 1000000))
    val p31 = p21 - dv(p33 * p22, 1000000)
    val p32 = p22 - dv(p33 * p21, 1000000)
    val p44 = dv(
      (r(4) - dv(p31 * r(3) + p32 * r(2) + p33 * r(1), 1000000)) * 1000000,
      1000000 - dv(p31 * r(1) + p32 * r(2) + p33 * r(3), 1000000))
    val p41 = p31 - dv(p44 * p33, 1000000)
    val p42 = p32 - dv(p44 * p32, 1000000)
    val p43 = p33 - dv(p44 * p31, 1000000)
    val p55 = dv(
      (r(5) - dv(p41 * r(4) + p42 * r(3) + p43 * r(2) + p44 * r(1),
        1000000)) * 1000000,
      1000000 - dv(p41 * r(1) + p42 * r(2) + p43 * r(3) + p44 * r(4),
        1000000))
    val expect = Seq(
      (1L, r(1), p11), (2L, r(2), p22), (3L, r(3), p33),
      (4L, r(4), p44), (5L, r(5), p55))
    val got = Analytics.pacfLags(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got === expect)
    assert(got.head._2 === got.head._3) // pacf(1) == acf(1) structural
  }

  test("xcorr_lags equals a BigInt-moment replay; lag grid complete") {
    val days = dailyRevenue()
    val n = BigInt(days.length)
    val sx = days.map(d => BigInt(d._2)).sum
    val sy = days.map(d => BigInt(d._3)).sum
    val cx = days.map { case (d, x, _) => (d, n * x - sx) }.toMap
    val cy = days.map { case (d, _, y) => (d, n * y - sy) }.toMap
    val denx = cx.values.map(v => v * v).sum
    val deny = cy.values.map(v => v * v).sum
    val expect = (-3 to 3).map { lag =>
      val pairs = cx.toSeq.flatMap { case (d, v) =>
        cy.get(d.plusDays(lag.toLong)).map(w => (v, w))
      }
      val num = pairs.map { case (v, w) => v * w }.sum
      val ppm = math.floor(1000000.0 * num.toDouble /
        math.sqrt(denx.toDouble * deny.toDouble)).toLong
      (lag.toLong, pairs.length.toLong, ppm)
    }
    val got = Analytics.xcorrLags(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
    // same-day volume and value are strongly positively correlated
    assert(got.find(_._1 == 0L).get._3 > 500000L)
  }
}
