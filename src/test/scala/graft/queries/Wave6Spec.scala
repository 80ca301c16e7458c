package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Model checks for the round-6 additions whose cores have semantics a
  * fixed test table can't exercise: synchronous LPA (tie-breaks under
  * label-frequency collisions on random graphs), the RRF triangular
  * rank (must equal the window-free rank definition exactly), and the
  * deterministic MLM mask (pure function of (doc_id, pos) — rate and
  * reproducibility, not distribution luck).
  */
class Wave6Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Plain-Scala synchronous LPA, most-frequent-neighbor-label with
    * min-label tie-break — the model [[Graph.lpaOn]] must match.
    */
  private def lpaModel(
      und: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (und ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (u, vs) =>
        val counts = vs.groupBy(labels).map { case (l, g) => l -> g.size }
        val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        u -> best
      }
    }
    labels
  }

  test("lpaOn matches the synchronous-LPA model on seeded random graphs") {
    import spark.implicits._
    val rnd = new Random(46)
    for (trial <- 1 to 5) {
      val n = 6 + rnd.nextInt(20)
      val und = (for {
        a <- 0L until n
        b <- (a + 1) until n
        if rnd.nextInt(3) == 0
      } yield (a, b)).toSeq
      if (und.nonEmpty) {
        val got = Graph.lpaOn(und.toDF("a", "b"), rounds = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = lpaModel(und, rounds = 3)
        assert(got == want, s"trial $trial: $und")
      }
    }
  }

  test("rrf_fusion ranks are a 1..k prefix per ranker and fuse to a sane panel") {
    // The triangular-join rank must behave exactly like ROW_NUMBER
    // over (score desc, doc_id): within each ranker the emitted ranks
    // are a permutation of 1..k_r with no gaps or duplicates, and the
    // fused score is the exact integer RRF of the two ranks.
    val dir = "/root/testdata/sf0.001"
    val rows = TextAnalysis.rrfFusion(spark, dir).collect()
    assert(rows.nonEmpty)
    def ranks(i: Int): Seq[Long] =
      rows.map(r => if (r.isNullAt(i)) -1L else r.getLong(i)).filter(_ > 0)
    for (col <- Seq(1, 2)) { // rank_a, rank_b
      val rs = ranks(col)
      assert(rs.distinct.size == rs.size, s"duplicate ranks in col $col")
    }
    for (r <- rows) {
      val ra = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rb = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val expect = ra.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        rb.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) == expect, s"rrf mismatch in $r")
    }
    // descending by fused score (the output ordering contract)
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("mlm_mask is reproducible and masks ~15% overall") {
    val dir = "/root/testdata/sf0.001"
    val a = TrainingPipeline.mlmMask(spark, dir).collect()
    val b = TrainingPipeline.mlmMask(spark, dir).collect()
    assert(a.toSeq == b.toSeq) // pure content-hash: no RNG state anywhere
    val tok = a.map(_.getLong(1)).sum
    val masked = a.map(_.getLong(2)).sum
    val ratePpm = masked * 1000000L / tok
    // binomial(0.15) over the corpus: generous band, deterministic data
    assert(ratePpm > 120000 && ratePpm < 180000, s"mask rate $ratePpm ppm")
  }
}
