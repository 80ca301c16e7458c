package graft.queries

import java.time.LocalDate

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fourth wave of first-principles statistics models (rationale in
  * [[StatModelSpec]]): the changepoint/trend family (double-break SSE
  * segmentation, broken-stick slopes, MoM growth) and the economics
  * readout (midpoint arc elasticity — whose sign convention this very
  * sweep corrected: the earlier form emitted −ε against its own
  * documented definition).
  */
class StatModelSpec4 extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String): Array[Row] =
    SparkEntry.queries(name)(spark, dir).collect()

  private def cents(c: String) = round(col(c) * 100).cast("long")

  private def tdiv(a: BigInt, b: BigInt): BigInt = a / b // trunc-to-zero

  /** (date, Σ order cents) day grid, the shared trend-series input. */
  private def dayGrid(): Seq[(LocalDate, Long)] =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(to_date(col("o_orderdate")).cast("string"),
        cents("o_totalprice"))
      .collect()
      .map(r => (LocalDate.parse(r.getString(0)), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => d -> xs.map(_._2).sum }
      .sortBy(_._1)

  // ---------------------------------------------------------------
  // price_elasticity — midpoint arc elasticity, textbook sign
  // ---------------------------------------------------------------
  test("price_elasticity matches the midpoint arc elasticity definition") {
    val levels = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(round(col("l_discount") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view
      .mapValues(xs => (BigInt(xs.size), xs.map(x => BigInt(x._2)).sum))
      .toMap
    val got = run("price_elasticity").sortBy(_.getAs[Long]("disc_from"))
    assert(got.nonEmpty)
    got.foreach { r =>
      val d1 = r.getAs[Long]("disc_from")
      val d2 = r.getAs[Long]("disc_to")
      assert(d2 == d1 + 1)
      val (n1, s1) = levels(d1)
      val (n2, s2) = levels(d2)
      assert(BigInt(r.getAs[Long]("n1")) == n1, d1)
      assert(BigInt(r.getAs[Long]("qty1")) == s1, d1)
      assert(BigInt(r.getAs[Long]("n2")) == n2, d1)
      assert(BigInt(r.getAs[Long]("qty2")) == s2, d1)
      // ε = (Δq/q̄)/(Δp/p̄) with q = S/n and p = 100 − d: composed
      // from the definition it is exactly
      // (S₂n₁−S₁n₂)(p₁+p₂) / ((p₂−p₁)(S₂n₁+S₁n₂));
      // a volume gain on a price CUT must read negative
      val p1 = BigInt(100 - d1)
      val p2 = BigInt(100 - d2)
      val want = tdiv(
        (s2 * n1 - s1 * n2) * (p1 + p2) * 1000000,
        (p2 - p1) * (s2 * n1 + s1 * n2))
      assert(BigInt(r.getAs[Long]("elasticity_ppm")) == want, d1)
      // orientation sanity on the definition itself, not the engine:
      // if quantity strictly rises as price strictly falls, ε < 0
      if (s2 * n1 > s1 * n2) assert(want < 0, d1)
    }
  }

  // ---------------------------------------------------------------
  // mom_growth — month-over-month ppm growth, sign-split
  // ---------------------------------------------------------------
  test("mom_growth matches consecutive-month growth from raw sums") {
    val monthly = dayGrid()
      .groupBy(d => (d._1.getYear, d._1.getMonthValue)).toSeq
      .map { case ((y, m), xs) =>
        (y * 12L + m, xs.map(x => BigInt(x._2)).sum)
      }
      .sortBy(_._1).toMap
    val got = run("mom_growth")
    // every month with a predecessor appears; first month drops
    assert(got.length == monthly.keys.count(k => monthly.contains(k - 1)))
    got.foreach { r =>
      val mo = LocalDate.parse(r.getAs[java.sql.Date]("month").toString)
      val k = mo.getYear * 12L + mo.getMonthValue
      val rev = monthly(k)
      val prev = monthly(k - 1)
      assert(BigInt(r.getAs[Long]("rev_cents")) == rev, mo)
      assert(BigInt(r.getAs[Long]("prev_cents")) == prev, mo)
      val want =
        if (rev >= prev) (rev - prev) * 1000000 / prev
        else -((prev - rev) * 1000000 / prev)
      assert(BigInt(r.getAs[Long]("growth_ppm")) == want, mo)
    }
  }

  // ---------------------------------------------------------------
  // segmented_trend — argmax |cusum| cut + per-side OLS slopes
  // ---------------------------------------------------------------
  test("segmented_trend matches broken-stick slopes around the cusum cut") {
    val days = dayGrid().map(d => BigInt(d._2))
    val dates = dayGrid().map(_._1)
    val n = days.length
    val tSum = days.sum
    // cut = argmax |n·prefix − rank·total| (min day tie-break)
    var pre = BigInt(0)
    val scores = days.zipWithIndex.map { case (x, i) =>
      pre += x
      (i, (BigInt(n) * pre - BigInt(i + 1) * tSum).abs)
    }
    val best = scores.maxBy(s => (s._2, BigInt(-s._1)))._1 // max, min-i tie
    def slope(idx: Seq[Int]): Option[BigInt] = {
      val k = BigInt(idx.size)
      val sx = idx.map(i => BigInt(i + 1)).sum
      val sy = idx.map(days(_)).sum
      val sxx = idx.map(i => BigInt(i + 1).pow(2)).sum
      val sxy = idx.map(i => BigInt(i + 1) * days(i)).sum
      val den = k * sxx - sx * sx
      if (den == 0) None
      else {
        val num = (k * sxy - sx * sy) * 1000
        Some(if (num < 0) -((-num) / den) else num / den)
      }
    }
    val left = slope((0 to best).toSeq)
    val right = slope(((best + 1) until n).toSeq)
    val got = run("segmented_trend").head
    assert(got.getAs[Long]("n_days") == n)
    assert(got.getAs[java.sql.Date]("cut_day").toString ==
      dates(best).toString)
    assert(got.getAs[Long]("n_left") == best + 1)
    assert(got.getAs[Long]("n_right") == n - best - 1)
    def check(name: String, want: Option[BigInt]): Unit = want match {
      case Some(v) => assert(BigInt(got.getAs[Long](name)) == v, name)
      case None => assert(got.isNullAt(got.fieldIndex(name)), name)
    }
    check("slope_left_milli", left)
    check("slope_right_milli", right)
    (left, right) match {
      case (Some(l), Some(rr)) =>
        assert(BigInt(got.getAs[Long]("delta_milli")) == rr - l)
      case _ => assert(got.isNullAt(got.fieldIndex("delta_milli")))
    }
  }

  // ---------------------------------------------------------------
  // double_changepoint — exhaustive 2-break SSE, exact rationals
  // ---------------------------------------------------------------
  test("double_changepoint picks an SSE-optimal pair (exact rationals)") {
    val ys = dayGrid().map(d => BigInt(d._2))
    val dates = dayGrid().map(_._1)
    val n = ys.length
    val s1 = ys.scanLeft(BigInt(0))(_ + _).tail // prefix Σy
    val s2 = ys.scanLeft(BigInt(0))((a, y) => a + y * y).tail // prefix Σy²
    // pooled SSE of a segment (i, j] as an exact fraction numerator
    // over denominator (j−i): SSE·(j−i) = (j−i)·(S2j−S2i) − (S1j−S1i)²
    def sseNum(i: Int, j: Int): BigInt =
      BigInt(j - i) * (s2(j - 1) - (if (i == 0) BigInt(0) else s2(i - 1))) -
        ((s1(j - 1) - (if (i == 0) BigInt(0) else s1(i - 1)))).pow(2)
    // total objective as exact rational: Σ sseNum/len — compare via a
    // common denominator len1·len2·len3
    def obj(i1: Int, i2: Int): (BigInt, BigInt) = {
      val l1 = BigInt(i1)
      val l2 = BigInt(i2 - i1)
      val l3 = BigInt(n - i2)
      val num = sseNum(0, i1) * l2 * l3 + sseNum(i1, i2) * l1 * l3 +
        sseNum(i2, n) * l1 * l2
      (num, l1 * l2 * l3)
    }
    var bestNum = BigInt(-1)
    var bestDen = BigInt(1)
    for (i1 <- 1 until n; i2 <- (i1 + 1) until n) {
      val (num, den) = obj(i1, i2)
      if (bestNum < 0 || num * bestDen < bestNum * den) {
        bestNum = num; bestDen = den
      }
    }
    val got = run("double_changepoint").head
    val i1 = got.getAs[Long]("n1").toInt
    val i2 = i1 + got.getAs[Long]("n2").toInt
    assert(got.getAs[Long]("n3") == n - i2)
    assert(got.getAs[java.sql.Date]("d1").toString == dates(i1 - 1).toString)
    assert(got.getAs[java.sql.Date]("d2").toString == dates(i2 - 1).toString)
    // the engine argmin runs the objective in doubles; require its
    // pick to be ε-OPTIMAL against the exact-rational minimum (a
    // wrong SSE formula misses by orders of magnitude; double
    // rounding at a near-tie by parts in 1e12)
    val (gNum, gDen) = obj(i1, i2)
    val lhs = (gNum * bestDen - bestNum * gDen).toDouble
    val rhs = 1e-9 * bestNum.toDouble * gDen.toDouble
    assert(lhs >= 0, "picked cut beats the exact optimum?!")
    assert(lhs <= math.max(rhs, 1e-9 * gDen.toDouble * bestDen.toDouble),
      s"picked cut is not eps-optimal: excess $lhs vs $rhs")
    // segment means: floored exact integers for the emitted cut
    val a1 = s1(i1 - 1)
    val b1 = s1(i2 - 1)
    assert(BigInt(got.getAs[Long]("mean1_c")) == a1 / i1)
    assert(BigInt(got.getAs[Long]("mean2_c")) == (b1 - a1) / (i2 - i1))
    assert(BigInt(got.getAs[Long]("mean3_c")) == (s1(n - 1) - b1) / (n - i2))
  }
}
