package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-8 tenth wave: DiD cell algebra, the
  * all-tables key audit, and the arc-elasticity cross-multiply, each
  * replayed from raw sf0.001 rows.
  */
class Wave18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("did_estimate equals a 2x2 floored-mean replay") {
    val cohort = Tables.read(spark, dir, "customer")
      .selectExpr("c_custkey", "c_nationkey < 12 t").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val cells = Tables.read(spark, dir, "orders")
      .selectExpr(
        "o_custkey",
        "CAST(o_orderdate AS DATE) >= DATE'1996-01-01' post",
        "CAST(round(o_totalprice * 100) AS LONG) c")
      .collect()
      .map(r => ((cohort(r.getLong(0)), r.getBoolean(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._2).sum)
      }
    def mean(k: (Boolean, Boolean)): Long = cells(k)._2 / cells(k)._1
    val did = mean((true, true)) - mean((true, false)) -
      mean((false, true)) + mean((false, false))
    val got = Statistics.didEstimate(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    Seq(
      (("treat", "post"), (true, true)), (("treat", "pre"), (true, false)),
      (("control", "post"), (false, true)),
      (("control", "pre"), (false, false))).foreach { case (gk, ck) =>
      val (n, s) = cells(ck)
      assert(got(gk) === ((n, s, s / n)), gk)
    }
    assert(got(("zz_did", "diff"))._3 === did)
  }

  test("primary_key_audit equals a distinct replay; catches real dups") {
    val rows = DataQuality.primaryKeyAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(rows.size === 10)
    // replay each single-column key from raw rows
    Seq(
      ("region", "r_regionkey"), ("nation", "n_nationkey"),
      ("customer", "c_custkey"), ("supplier", "s_suppkey"),
      ("part", "p_partkey"), ("orders", "o_orderkey"),
      ("documents", "doc_id"), ("embeddings", "vec_id")).foreach {
      case (t, k) =>
        val ks = Tables.read(spark, dir, t)
          .selectExpr(s"CAST($k AS LONG)").collect().map(_.getLong(0))
        val (n, d, dup, ok) = rows(t)
        assert(n === ks.length.toLong && d === ks.distinct.length.toLong)
        assert(dup === n - d && ok === (dup == 0L), s"table $t")
    }
    // the audit EARNS its keep on this data: the driver's synthetic
    // lineitem genuinely duplicates (orderkey, linenumber) pairs — the
    // audit must report it, not hide it
    val li = Tables.read(spark, dir, "lineitem")
      .selectExpr("l_orderkey", "CAST(l_linenumber AS LONG)").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (n, d, dup, ok) = rows("lineitem")
    assert(n === li.length.toLong && d === li.distinct.length.toLong)
    assert(dup === n - d)
    assert(dup > 0L && !ok, "expected the real composite-key dups flagged")
  }

  test("price_elasticity equals a rational cross-multiply replay") {
    val lv = Tables.read(spark, dir, "lineitem")
      .selectExpr(
        "CAST(round(l_discount * 100) AS LONG) d",
        "CAST(l_quantity AS LONG) q")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, g) =>
        d -> (g.size.toLong, g.map(_._2).sum)
      }
    val expect = lv.keys.toSeq.sorted.flatMap { d =>
      lv.get(d + 1).map { case (n2, s2) =>
        val (n1, s1) = lv(d)
        val num = (BigInt(s2) * n1 - BigInt(s1) * n2) *
          ((100 - d) + (100 - (d + 1))) * 1000000
        // Δp = p₂ − p₁ (the round-9 sign fix: a volume gain on a
        // price cut reads textbook-negative)
        val den = BigInt((100 - (d + 1)) - (100 - d)) *
          (BigInt(s2) * n1 + BigInt(s1) * n2)
        (d, d + 1, n1, s1, n2, s2, (num / den).toLong)
      }
    }
    val got = Analytics.priceElasticity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expect)
    assert(got.length === 10) // the full 0..10% discount ladder
  }
}
