package graft.queries

import java.security.MessageDigest

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the deterministic-sketch and regression queries:
  * the same estimators re-derived in plain Scala over collected
  * sf0.001 rows must agree EXACTLY (they are integer/closed-form
  * deterministic — that is the design claim the oracle hash also
  * pins, checked here without DuckDB in the loop).
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def kmvHash(key: Long): Long =
    java.lang.Long.parseLong(md5hex(key.toString).take(15), 16)

  private val K = 64
  private val Space = 1152921504606846976L // 2^60

  private def kmvEst(hashes: Set[Long]): Long = {
    val mins = hashes.toSeq.sorted.take(K)
    if (mins.size < K) mins.size.toLong
    else math.floor((K - 1).toDouble * Space.toDouble / mins.last.toDouble).toLong
  }

  test("kmv_distinct == plain-Scala KMV model (sf0.001)") {
    val orders = Tables.read(spark, dir, "orders")
      .select("o_orderpriority", "o_custkey").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySeg = orders.groupBy(_._1).view
      .mapValues(_.map(p => kmvHash(p._2)).toSet).toMap

    val got = Sketches.kmvDistinct(spark, dir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap

    for ((seg, hs) <- bySeg) {
      val (exact, est) = got(seg)
      assert(exact == orders.filter(_._1 == seg).map(_._2).distinct.length.toLong, seg)
      assert(est == kmvEst(hs), seg)
      // k=64 ⇒ rse ≈ 1/√62; 5σ guard against a broken estimator
      assert(math.abs(est.toDouble - exact) <= 0.65 * exact + 5, s"$seg est=$est exact=$exact")
    }

    // union/intersect from the two minima sets, as the query merges them
    val aMins = bySeg("1-URGENT").toSeq.sorted.take(K)
    val bMins = bySeg("2-HIGH").toSeq.sorted.take(K)
    val uMins = (aMins ++ bMins).distinct.sorted.take(K)
    val estU =
      if (uMins.size < K) uMins.size.toLong
      else math.floor((K - 1).toDouble * Space.toDouble / uMins.last.toDouble).toLong
    val rho = uMins.count(h => aMins.contains(h) && bMins.contains(h)).toLong
    val estI = if (uMins.size < K) rho else rho * estU / K
    assert(got("union:1-URGENT|2-HIGH")._2 == estU)
    assert(got("intersect:1-URGENT|2-HIGH")._2 == estI)
  }

  test("countmin_freq == plain-Scala CM model; never underestimates (sf0.001)") {
    val users = Tables.events(spark, dir)
      .select("user_id").collect().map(_.getLong(0))
    def cell(d: Int, u: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$d:$u").take(8), 16) % 64
    val cells: Map[(Int, Long), Long] = users
      .flatMap(u => (0 until 3).map(d => (d, cell(d, u))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = users.groupBy(identity).view.mapValues(_.length.toLong).toMap

    val got = Sketches.countminFreq(spark, dir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val u = r.getLong(0)
      val est = (0 until 3).map(d => cells((d, cell(d, u)))).min
      assert(r.getLong(1) == exact(u), s"exact user=$u")
      assert(r.getLong(2) == est, s"est user=$u")
      assert(r.getBoolean(3) && est >= exact(u), s"overestimate user=$u")
    }
  }

  test("linreg_trend == plain-Scala OLS over monthly sums (sf0.001)") {
    val rows = Tables.read(spark, dir, "orders")
      .join(
        Tables.read(spark, dir, "customer"),
        org.apache.spark.sql.functions.expr("o_custkey = c_custkey"))
      .join(
        Tables.read(spark, dir, "nation"),
        org.apache.spark.sql.functions.expr("c_nationkey = n_nationkey"))
      .selectExpr(
        "n_name",
        "(year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS x",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS yc")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))

    val monthly = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap // exact: longs far from overflow
    val got = Statistics.linregTrend(spark, dir).collect()
    assert(got.length == 25)
    for (r <- got) {
      val nation = r.getString(0)
      val pts = monthly.collect { case ((n, x), y) if n == nation => (x.toLong, BigInt(y)) }.toSeq
      val n = BigInt(pts.size)
      val sx = pts.map(p => BigInt(p._1)).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val covN = (n * sxy - sx * sy).toDouble
      val varX = (n * sxx - sx * sx).toDouble
      assert(r.getLong(1) == pts.size.toLong, nation)
      assert(math.abs(r.getDouble(2) - covN / varX) <= 1e-9 * math.abs(covN / varX), nation)
      val r2ppm = (BigInt(1000000) * (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))).toLong
      assert(r.getLong(4) == r2ppm, nation)
      assert(r2ppm >= 0 && r2ppm <= 1000000, nation)
    }
  }

  test("forecast_baseline == plain-Scala seasonal-naive backtest (sf0.001)") {
    val daily = Tables.events(spark, dir)
      .selectExpr("CAST(ts AS DATE) d", "CAST(round(value * 100) AS BIGINT) vc")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tagged = daily.toSeq.map { case (d, c) =>
      (d.getDayOfMonth, (d.getDayOfMonth - 1) % 7, c)
    }
    val fc = tagged.filter(_._1 <= 23).groupBy(_._2).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._3).sum / xs.size) // floor div, positive sums
    }.toMap
    val rows = Analytics.forecastBaseline(spark, dir).collect()
    assert(rows.length == 7)
    for (r <- rows) {
      val dow = r.getLong(0).toInt
      val (nTrain, forecast) = fc(dow)
      val test = tagged.filter(t => t._1 > 23 && t._2 == dow)
      assert(r.getLong(1) == nTrain, s"n_train dow=$dow")
      assert(r.getLong(2) == forecast, s"forecast dow=$dow")
      assert(r.getLong(3) == test.size.toLong, s"n_test dow=$dow")
      assert(r.getLong(4) == test.map(t => math.abs(t._3 - forecast)).sum / test.size,
        s"mae dow=$dow")
    }
  }
}
