package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Model checks for the new interval/graph algebra cores — the
  * battery-vs-model discipline of GraphPropertySpec applied to the
  * operators whose correctness rests on non-obvious closed forms:
  * the day-partitioned sweep line (peak_concurrency), the FIFO
  * cumulative-interval overlap (fifo_match), and common-neighbor
  * Jaccard (node_similarity). Seeded random inputs cover shapes the
  * fixed tables rarely produce (midnight-straddling sessions,
  * unbalanced buy/sell totals, disconnected graph pockets).
  */
class SweepPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val DayUs = 86400L * 1000000L

  test("dailyPeakOf matches a brute-force per-instant counter on random intervals") {
    import spark.implicits._
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      // intervals inside a 4-day span; some deliberately cross midnight
      val sessions = (1 to (10 + rnd.nextInt(30))).map { _ =>
        val start = rnd.nextLong(4 * DayUs - 2)
        val len = rnd.nextLong(DayUs + DayUs / 2) // up to 1.5 days
        (start, math.min(start + len, 4 * DayUs - 1))
      }
      val got = Extended.dailyPeakOf(
        sessions.toDF("start_us", "end_us"))
        .collect()
        .map(r => (
          r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
          r.getAs[Long]("peak"), r.getAs[Long]("n_sessions")))
        .toSeq.sortBy(_._1)
      // model: concurrency only increases at interval starts or day
      // starts, so the per-day peak is attained at one of those
      val model = (0L until 4L).flatMap { day =>
        val d0 = day * DayUs
        val d1 = d0 + DayUs
        val active = sessions.filter(s => s._1 < d1 && s._2 >= d0)
        if (active.isEmpty) None
        else {
          val candidates = (d0 +: active.map(_._1)).filter(t => t >= d0 && t < d1)
          val peak = candidates.map(t =>
            sessions.count(s => s._1 <= t && t <= s._2).toLong).max
          Some((java.time.LocalDate.of(1970, 1, 1).plusDays(0).toEpochDay
            + day, peak, active.size.toLong))
        }
      }
      assert(got == model, s"trial $trial: $sessions")
    }
  }

  test("fifoPairsOf matches a sequential queue simulation on random flows") {
    import spark.implicits._
    val rnd = new Random(11)
    for (trial <- 1 to 5) {
      // per part: interleaved buys/sells with unbalanced totals
      val flows = (0L until 3L).flatMap { part =>
        (1 to (4 + rnd.nextInt(10))).map { i =>
          val st = if (rnd.nextBoolean()) "O" else "F"
          // sd as a distinct long per row keeps ordering unambiguous
          (part, st, i.toLong, 1L, 1L + rnd.nextInt(20), i.toLong)
        }
      }
      val got = Extended.fifoPairsOf(
        flows.toDF("part", "st", "ok", "ln", "qty", "sd"))
        .collect()
        .map(r => (
          r.getAs[Long]("part"), r.getAs[Long]("b_ok"),
          r.getAs[Long]("s_ok"), r.getAs[Long]("qty_matched")))
        .toSet
      // model: positional FIFO — the i-th outflow unit consumes the
      // i-th inflow unit (both sides in their own sd order), exactly
      // the "oldest unconsumed inflow" rule the operator states; a
      // queue of inflow rows consumed by outflow rows in order
      val model = flows.groupBy(_._1).flatMap { case (part, rows) =>
        val buys = scala.collection.mutable.Queue(
          rows.filter(_._2 == "O").sortBy(_._6).map(r => (r._3, r._5.toLong)): _*)
        val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
        for ((_, _, ok, _, qty, _) <- rows.filter(_._2 == "F").sortBy(_._6)) {
          var need = qty.toLong
          while (need > 0 && buys.nonEmpty) {
            val (bok, left) = buys.head
            val take = math.min(left, need)
            out += ((part, bok, ok, take))
            need -= take
            if (left == take) buys.dequeue()
            else buys.update(0, (bok, left - take))
          }
          // unmatched sell remainder: no buy interval overlaps it
        }
        out
      }.toSet
      assert(got == model, s"trial $trial: $flows")
    }
  }

  test("nodeSimilarityOn matches brute-force neighbor-set Jaccard on random graphs") {
    import spark.implicits._
    val rnd = new Random(13)
    for (trial <- 1 to 5) {
      val n = 5 + rnd.nextInt(15)
      val edges = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextInt(3) == 0
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val got = Graph.nodeSimilarityOn(edges.toDF("a", "b"))
          .collect()
          .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) ->
            (r.getAs[Long]("cn"), r.getAs[Long]("jacc_ppm")))
          .toMap
        val nbr = (edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        val model = (for {
          x <- nbr.keys; y <- nbr.keys
          if x < y
          inter = (nbr(x) & nbr(y)).size.toLong
          if inter > 0
        } yield (x, y) -> (
          inter,
          inter * 1000000L / (nbr(x).size + nbr(y).size - inter))).toMap
        assert(got == model, s"trial $trial: $edges")
      }
    }
  }
}
