package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 seventh wave, replayed in plain Scala
  * from the raw sf0.001 rows. Also re-pins the structural facts: the
  * journey cut is exactly 8, keyness χ² is non-negative with the
  * 2×2 determinant identity, reciprocity ratios stay in [0, 10⁶].
  */
class Wave15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("top_journeys equals an in-memory first-8 path replay") {
    val ev = Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) tm", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = ev.groupBy(_._1).map { case (_, g) =>
      g.sortBy(e => (e._2, e._3)).take(8).map(_._4).mkString(">")
    }.groupBy(identity).map { case (j, js) => (j, js.size.toLong) }
      .toSeq.sortBy(t => (-t._2, t._1)).take(10)
    val got = Analytics.topJourneys(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expect)
    got.foreach { case (j, _) => assert(j.split(">").length <= 8) }
  }

  test("weekday_seasonality: shares sum to ~1e6; index replay exact") {
    val days = Tables.read(spark, dir, "orders")
      .selectExpr(
        "CAST(o_orderdate AS DATE) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
    val wg = days.groupBy(_._1.getDayOfWeek.getValue).map { case (wd, g) =>
      (wd.toLong, g.size.toLong, g.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val ndAll = wg.map(_._2).sum
    val revAll = wg.map(_._3).sum
    val got = Analytics.weekdaySeasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.length === wg.length)
    got.zip(wg).foreach { case ((wd, nd, rev, share, idx), (w2, n2, r2)) =>
      assert(wd === w2 && nd === n2 && rev === r2)
      assert(share ===
        (BigInt(rev) * 1000000 / BigInt(revAll)).toLong)
      assert(idx ===
        (BigInt(rev) * ndAll * 1000000 / (BigInt(revAll) * nd)).toLong)
    }
    // floor rounding: shares underestimate by < 7 ppm total
    val shareSum = got.map(_._4).sum
    assert(shareSum > 1000000L - 7 && shareSum <= 1000000L)
  }

  test("term_keyness equals a 2x2 chi-square replay; det identity") {
    val tk = Tables.read(spark, dir, "documents")
      .selectExpr("lang", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(t => (r.getString(0) == "en", t)))
    val ta = tk.count(_._1).toLong
    val tb = tk.size.toLong - ta
    val expect = tk.groupBy(_._2).map { case (term, g) =>
      val a = g.count(_._1).toLong
      val b = g.size.toLong - a
      val diff = (a * tb - b * ta).toDouble
      val chi2 = (ta + tb).toDouble * (diff * diff) /
        ((a + b).toDouble * (ta + tb - a - b).toDouble *
          ta.toDouble * tb.toDouble)
      (term, a, b, a * tb > b * ta, chi2)
    }.toSeq.sortBy(t => (-t._5, t._1)).take(20)
    val rows = TextAnalysis.termKeyness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getDouble(4))).toSeq
    assert(rows === expect)
    rows.foreach { case (_, a, b, enr, chi2) =>
      assert(chi2 >= 0.0)
      assert(enr === (a * tb > b * ta)) // determinant sign == direction
    }
  }

  test("trade_reciprocity equals a nation-grid replay; bounds hold") {
    val cn = Tables.read(spark, dir, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS LONG)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sn = Tables.read(spark, dir, "supplier")
      .selectExpr("s_suppkey", "CAST(s_nationkey AS LONG)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val ok = Tables.read(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val grid = Tables.read(spark, dir, "lineitem")
      .selectExpr(
        "l_orderkey", "l_suppkey",
        "CAST(round(l_extendedprice * 100) AS LONG) c")
      .collect()
      .map(r => ((sn(r.getLong(1)), cn(ok(r.getLong(0)))), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
      .filter { case ((s, c), _) => s != c }
    val nE = grid.size.toLong
    val nR = grid.keys.count { case (s, c) => grid.contains((c, s)) }.toLong
    val wT = grid.values.sum
    val wM = grid.map { case ((s, c), w) =>
      math.min(w, grid.getOrElse((c, s), 0L))
    }.sum
    val r = Graph.tradeReciprocity(spark, dir).collect().head
    assert(r.getLong(0) === nE)
    assert(r.getLong(1) === nR)
    assert(r.getLong(2) === nR * 1000000L / nE)
    assert(r.getLong(3) === wT)
    assert(r.getLong(4) === wM)
    assert(r.getLong(5) === (BigInt(wM) * 1000000 / BigInt(wT)).toLong)
    assert(r.getLong(2) <= 1000000L && r.getLong(5) <= 1000000L)
  }
}
