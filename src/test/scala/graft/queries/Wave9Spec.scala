package graft.queries

import java.security.MessageDigest

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-7 statistics/similarity wave: the
  * SymSpell blocking identity behind fuzzy_term_join (property-checked
  * against a plain-Scala Levenshtein), Theil–Sen and CUPED replayed in
  * plain Scala from the collected base data, and the bootstrap weight
  * law — all on sf0.001.
  */
class Wave9Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def delKeys(s: String): Set[String] =
    (0 until s.length).map(i => s.take(i) + s.drop(i + 1)).toSet + s

  test("SymSpell identity: ed<=1 implies a shared deletion key (property)") {
    // deterministic pseudo-random words + every 1-edit perturbation:
    // the blocking must NEVER lose such a pair (soundness of the
    // candidate generation fuzzy_term_join relies on)
    val alpha = "abcdefgh"
    val words = (0 until 60).map { i =>
      val len = 3 + i % 6
      (0 until len).map(j => alpha((i * 7 + j * 3) % alpha.length)).mkString
    }
    for (w <- words; i <- 0 until w.length) {
      val del = w.take(i) + w.drop(i + 1)
      val sub = w.take(i) + alpha((i + 1) % alpha.length) + w.drop(i + 1)
      val ins = w.take(i) + alpha((i + 5) % alpha.length) + w.drop(i)
      for (v <- Seq(del, sub, ins) if v.nonEmpty) {
        assert(lev(w, v) <= 1)
        assert(
          delKeys(w).intersect(delKeys(v)).nonEmpty,
          s"blocking lost the ed<=1 pair ($w, $v)")
      }
    }
    // and blocking candidates are never wider than ed<=2 (the verify
    // filter's job stays bounded)
    for (a <- words; b <- words
         if delKeys(a).intersect(delKeys(b)).nonEmpty)
      assert(lev(a, b) <= 2, s"($a, $b) blocked together but ed > 2")
  }

  test("fuzzy_term_join equals a brute-force all-pairs model") {
    val got = TextAnalysis.fuzzyTermJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // plain-Scala replay: vocab + dirty from the raw docs
    val docs = Tables.read(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val word = "^[a-z]{3,}$".r
    val tokensOf = (t: String) =>
      t.toLowerCase.split("\\s+").filter(w => word.matches(w))
    val df = docs.flatMap { case (id, t) => tokensOf(t).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val vocab = df.filter { case (_, n) => n * 50 >= docs.length }
    val dirty = docs.flatMap { case (id, t) =>
      tokensOf(t).headOption.map { w =>
        val p = (id % w.length).toInt // 0-based split point
        val c = (97 + id % 26).toChar
        val d = (id % 3) match {
          case 0 => w.take(p) + w.drop(p + 1)
          case 1 => w.take(p) + c + w.drop(p + 1)
          case _ => w.take(p) + c + w.drop(p)
        }
        id -> d
      }
    }
    val want = (for {
      (id, d) <- dirty
      (t, n) <- vocab
      if lev(d, t) <= 1
    } yield (id, d, t, n, lev(d, t).toLong)).sortBy(x => (x._1, x._3))
    assert(got.toSeq == want.toSeq)
  }

  test("theil_sen equals a plain-Scala pairwise-median replay") {
    val r = Statistics.theilSen(spark, dir).collect().head
    val weekly = Tables.read(spark, dir, "orders")
      .selectExpr("CAST(to_date(o_orderdate) AS STRING)", "o_totalprice")
      .collect()
      .map { row =>
        val d = java.time.LocalDate.parse(row.getString(0))
        val wk = java.time.temporal.ChronoUnit.DAYS
          .between(java.time.LocalDate.of(1992, 1, 1), d) / 7
        wk -> math.round(row.getDouble(1) * 100)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap.toSeq.sorted
    val slopes = (for {
      (w1, y1) <- weekly; (w2, y2) <- weekly if w1 < w2
    } yield math.floor(((y2 - y1) * 1000L).toDouble / (w2 - w1)).toLong)
      .sorted
    val nPairs = slopes.length.toLong
    // lower median: first value whose cumulative rank doubles past n
    val tsSlope = slopes((nPairs.toInt + 1) / 2 - 1)
    assert(r.getLong(0) == weekly.length.toLong)
    assert(r.getLong(1) == nPairs)
    assert(r.getLong(2) == tsSlope)
    // OLS replay in whole dollars
    val n = weekly.length.toLong
    val sx = weekly.map(_._1).sum
    val sy = weekly.map(_._2 / 100).sum
    val sxy = weekly.map { case (w, y) => w * (y / 100) }.sum
    val sxx = weekly.map { case (w, _) => w * w }.sum
    val ols = math.floor(
      100000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx)).toLong
    assert(r.getLong(3) == ols)
  }

  test("bootstrap_ci: weight law, interval sanity, exact replay") {
    val r = Statistics.bootstrapCi(spark, dir).collect().head
    val orders = Tables.read(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(row => row.getLong(0) -> math.round(row.getDouble(1) * 100))
    assert(r.getLong(0) == orders.length.toLong)
    val meanC = orders.map(_._2).sum.toDouble / orders.length
    assert(r.getDouble(1) == meanC)
    // replicate means replayed exactly
    val means = (0 until 32).map { rep =>
      var n = 0L; var s = 0L
      for ((k, yc) <- orders) {
        val v = java.lang.Long.parseLong(
          md5hex(s"$k:$rep").substring(0, 1), 16) % 4
        val w = v / 2 + v % 2
        n += w; s += w * yc
      }
      s.toDouble / n
    }
    val sortedMeans = means.sorted
    assert(r.getDouble(2) == sortedMeans(1)) // rank 2 of 32
    assert(r.getDouble(3) == sortedMeans(30)) // rank 31 of 32
    assert(r.getDouble(2) < r.getDouble(3))
    // the two-bit weight law: mean weight 1 within a loose band
    val totalW = (0 until 32).map { rep =>
      orders.map { case (k, _) =>
        val v = java.lang.Long.parseLong(
          md5hex(s"$k:$rep").substring(0, 1), 16) % 4
        v / 2 + v % 2
      }.sum
    }.sum
    val expected = 32L * orders.length
    assert(math.abs(totalW - expected) < expected / 10)
  }

  test("cuped_adjust: theta and variance reduction replay exactly") {
    val rows = Statistics.cupedAdjust(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val boundary = java.time.Instant.parse("2024-01-16T00:00:00Z")
    val perUser = Tables.events(spark, dir)
      .select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).view.mapValues { evs =>
        (evs.filter(_._2.isBefore(boundary)).map(_._3).sum,
          evs.filter(e => !e._2.isBefore(boundary)).map(_._3).sum)
      }.toMap
    def bucket(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 4), 16) % 2
    val xs = perUser.values.map(_._1)
    val ys = perUser.values.map(_._2)
    val n = perUser.size.toLong
    val sx = xs.sum; val sy = ys.sum
    val sxy = perUser.values.map(v => v._1 * v._2).sum
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val cov = n.toDouble * sxy - sx.toDouble * sy
    val varx = n.toDouble * sxx - sx.toDouble * sx
    val vary = n.toDouble * syy - sy.toDouble * sy
    val thetaPpm = math.floor(1000000.0 * cov / varx).toLong
    val varRedPpm = math.floor(1000000.0 * cov * cov / (varx * vary)).toLong
    for (variant <- Seq(0L, 1L)) {
      val arm = perUser.filter { case (id, _) => bucket(id) == variant }
      val r = rows(variant)
      assert(r.getLong(1) == arm.size.toLong)
      val meanY = arm.values.map(_._2).sum.toDouble / arm.size
      assert(r.getDouble(2) == meanY)
      val adj = meanY - (cov / varx) *
        (arm.values.map(_._1).sum.toDouble / arm.size - sx.toDouble / n)
      assert(r.getDouble(3) == adj)
      assert(r.getLong(4) == thetaPpm)
      assert(r.getLong(5) == varRedPpm)
      // CUPED must not LOSE precision: the realized reduction is
      // positive whenever pre- and post-period spend correlate at all
      assert(r.getLong(5) >= 0)
    }
  }
}
