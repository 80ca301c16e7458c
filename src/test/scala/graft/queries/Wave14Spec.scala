package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 sixth wave: each query replayed in
  * plain Scala from the raw sf0.001 rows — md5 via MessageDigest,
  * integer arithmetic in Long/BigInt. Also pins the one sanctioned
  * data-dependent logarithm in the suite: HLL's linear-counting
  * branch, whose finite domain (V in 1..1024) was exhaustively
  * audited against DuckDB's libm (identical on all 1024 inputs);
  * the spot literals below are from that audit table.
  */
class Wave14Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(id: Long): Long =
    java.lang.Long.parseLong(md5hex(id.toString).substring(0, 15), 16)

  // --- hll_distinct ---

  private def hllEst(registers: Map[Long, Long]): Long = {
    val m = 1024L
    val w = 1L << 51
    val sPresent = registers.values.map(mj => 1L << (51 - mj).toInt).sum
    val s = sPresent + (m - registers.size) * w
    val v = m - registers.size
    val alpha = 0.7213 / (1.0 + 1.079 / 1024.0)
    val raw = alpha * 1048576.0 * 2251799813685248.0 / s.toDouble
    if (raw <= 2560.0 && v > 0)
      math.floor(1024.0 * math.log(1024.0 / v.toDouble)).toLong
    else math.floor(raw).toLong
  }

  private def hllRegisters(keys: Seq[Long]): Map[Long, Long] =
    keys.map(h60).groupBy(_ / 1125899906842624L).map { case (b, hs) =>
      b -> hs.map { h =>
        val w = h % 1125899906842624L
        if (w == 0) 51L
        else 51L - java.lang.Long.toBinaryString(w).length
      }.max
    }

  test("hll_distinct equals a register replay; merge == recompute") {
    val rows = Tables.read(spark, dir, "orders")
      .selectExpr("o_orderpriority", "o_custkey")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySeg = rows.groupBy(_._1)
    val out = Sketches.hllDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    bySeg.foreach { case (seg, g) =>
      val keys = g.map(_._2).toSeq
      val exact = keys.distinct.size.toLong
      val est = hllEst(hllRegisters(keys))
      val (nEx, e, err) = out((seg, "direct"))
      assert(nEx === exact, seg)
      assert(e === est, seg)
      assert(err === (est - exact).abs * 1000000L / exact, seg)
    }
    // union: merged registers (elementwise max) == recomputed from rows
    val segs = Set("1-URGENT", "2-HIGH")
    val uKeys = rows.filter(r => segs(r._1)).map(_._2).toSeq
    val ra = hllRegisters(bySeg("1-URGENT").map(_._2).toSeq)
    val rb = hllRegisters(bySeg("2-HIGH").map(_._2).toSeq)
    val merged = (ra.keySet ++ rb.keySet).map(b =>
      b -> math.max(ra.getOrElse(b, 0L), rb.getOrElse(b, 0L))).toMap
    assert(merged === hllRegisters(uKeys)) // max-associativity, pinned
    val uEst = hllEst(merged)
    val uExact = uKeys.distinct.size.toLong
    assert(out(("union:1-URGENT|2-HIGH", "merged"))._2 === uEst)
    assert(out(("union:1-URGENT|2-HIGH", "recomputed"))._2 === uEst)
    assert(out(("union:1-URGENT|2-HIGH", "merged"))._1 === uExact)
  }

  test("linear-counting spot values match the audited cross-libm table") {
    // audit table: floor(1024*ln(1024/V)) identical JVM vs DuckDB for
    // ALL V in 1..1024; spot-pinned here so a libm change is caught.
    val expected = Map(1L -> 7097L, 2L -> 6388L, 3L -> 5972L,
      256L -> 1419L, 512L -> 709L, 768L -> 294L, 1023L -> 1L, 1024L -> 0L)
    expected.foreach { case (v, want) =>
      assert(math.floor(1024.0 * math.log(1024.0 / v.toDouble)).toLong
        === want, s"V=$v")
    }
  }

  // --- gk_lambda ---

  test("gk_lambda equals a PRE replay over the contingency grid") {
    val rows = Tables.read(spark, dir, "documents")
      .selectExpr("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val grid = rows.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val mLang = rows.groupBy(_._1).values.map(_.length.toLong).max
    val mSrc = rows.groupBy(_._2).values.map(_.length.toLong).max
    val smLs = grid.groupBy(_._1._2).values
      .map(_.values.max).sum // per-source modal lang count
    val smSl = grid.groupBy(_._1._1).values
      .map(_.values.max).sum // per-lang modal source count
    val out = DriftStats.gkLambda(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("lang|source") ===
      ((smLs - mLang, n - mLang, (smLs - mLang) * 1000000L / (n - mLang))))
    assert(out("source|lang") ===
      ((smSl - mSrc, n - mSrc, (smSl - mSrc) * 1000000L / (n - mSrc))))
    val sNum = smLs - mLang + smSl - mSrc
    val sDen = 2 * n - mLang - mSrc
    assert(out("symmetric") === ((sNum, sDen, sNum * 1000000L / sDen)))
    // PRE bounds: 0 <= lambda <= 1 by construction
    out.values.foreach { case (num, den, ppm) =>
      assert(num >= 0 && num <= den && ppm <= 1000000L)
    }
  }

  // --- max_drawdown ---

  test("max_drawdown equals a sequential peak replay") {
    val days = Tables.read(spark, dir, "orders")
      .selectExpr(
        "CAST(o_orderdate AS DATE) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    var s = 0L
    var peak = Long.MinValue
    val expect = days.map { case (d, x) =>
      s += x; peak = math.max(peak, s); (d, x, s, peak, peak - s)
    }.sortBy(t => (-t._5, t._1)).take(10)
    val got = Analytics.maxDrawdown(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect)
    got.foreach { case (_, _, sc, pc, dd) =>
      assert(pc >= sc && dd === pc - sc)
    }
  }

  // --- mase_eval ---

  test("mase_eval equals a lag-join replay; gaps drop out") {
    val byDay = Tables.read(spark, dir, "orders")
      .selectExpr(
        "CAST(o_orderdate AS DATE) d",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def err(lag: Int): (Long, Long) = {
      val pairs = byDay.toSeq.flatMap { case (d, x) =>
        byDay.get(d.minusDays(lag.toLong)).map(p => (x - p).abs)
      }
      (pairs.length.toLong, pairs.sum)
    }
    val (n1, sae1) = err(1)
    val (n7, sae7) = err(7)
    val r = Analytics.maseEval(spark, dir).collect().head
    assert(r.getLong(0) === n1)
    assert(r.getLong(1) === sae1)
    assert(r.getLong(2) === n7)
    assert(r.getLong(3) === sae7)
    assert(r.getDouble(4) === sae1.toDouble * n7 / (sae7.toDouble * n1))
  }

  // --- hybrid_rank_fusion ---

  test("hybrid_rank_fusion equals a full-ranking replay, exact ranks") {
    val docs = Tables.read(spark, dir, "documents")
      .selectExpr("doc_id", "lower(text) t").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split("\\s+").count(_ == "join").toLong)).toMap
    // replicate the quantized-vector scoring from the engine's shared
    // relation (vec = milli-unit longs)
    val vecs = Tables.read(spark, dir, "embeddings")
      .selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(round(x * 1000) AS LONG)) v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toMap
    val qv = vecs(0L)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qn = dot(qv, qv)
    val scored = docs.keys.filter(vecs.contains).toSeq.map { id =>
      val v = vecs(id)
      val nrm = dot(v, v)
      val cos =
        if (nrm == 0) -2000000L
        else math.floor(
          1000000.0 * dot(qv, v) / math.sqrt(qn.toDouble * nrm)).toLong
      (id, docs(id), cos)
    }
    val rLex = scored.sortBy(t => (-t._2, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rVec = scored.sortBy(t => (-t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val fused = scored.map { case (id, tf, cos) =>
      (id, tf, cos, rLex(id), rVec(id),
        1000000L / (60 + rLex(id)) + 1000000L / (60 + rVec(id)))
    }.sortBy(t => (-t._6, t._1)).take(20)
    val got = Similarity.hybridRankFusion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === fused)
  }
}
