package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries mergeable-summary guarantees, model-checked on
  * generated skewed data across DIFFERENT partitionings (different
  * merge trees): estimates never overestimate, error is bounded by
  * N/(k+1), and every true heavy hitter is present in the summary.
  * Estimates themselves are allowed to differ between partitionings —
  * only the bounds are contractual (queries surface exactly the
  * bounded facts, see Statistics.heavyHitters).
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[T](g: Gen[T], n: Int, seedOffset: Long): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, rng.Seed(31L + seedOffset + i)))

  // zipf-ish: item "v<i>" with weight ~ 1/(i+1)
  private val skewed: Gen[String] =
    Gen.frequency((1 to 20).map(i => (420 / i, Gen.const(s"v$i"))): _*)

  private def summarize(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    val df = items.toDF("item").repartition(parts)
    val row = df.agg(SketchFunctions.misraGries(col("item"), k)).head()
    row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("MG bounds hold for every item under varying merge trees") {
    val k = 5
    for (seed <- 0 to 2) {
      val items = sample(skewed, 3000, seed * 10000L)
      val exact = items.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      val n = items.size.toLong
      for (parts <- Seq(1, 3, 7)) {
        val est = summarize(items, k, parts)
        assert(est.size <= k)
        est.foreach { case (item, e) =>
          val ex = exact.getOrElse(item, 0L)
          assert(e <= ex, s"overestimate for $item: est=$e exact=$ex")
          // the exact integer guarantee the shipped heavy_hitters
          // bound_ok column pins against the oracle — not the weaker
          // floor-division slack n/(k+1) + 1 (ADVICE r3)
          assert((ex - e) * (k + 1) <= n,
            s"error bound broken for $item: est=$e exact=$ex n=$n")
        }
        exact.foreach { case (item, ex) =>
          if (ex * (k + 1) > n)
            assert(est.contains(item),
              s"true heavy hitter $item (exact=$ex, n=$n) missing at parts=$parts")
        }
      }
    }
  }

  test("exact when distinct <= k, any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(7)("c")
    val exact = Map("a" -> 40L, "b" -> 25L, "c" -> 7L)
    for (parts <- Seq(1, 4)) {
      assert(summarize(items, k = 8, parts) == exact)
    }
  }

  test("nulls are skipped, not counted") {
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("item")
    val row = df.agg(SketchFunctions.misraGries(col("item"), 4)).head()
    val got = row.getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L))
  }

  test("SQL surface: misra_gries registered, literal-k enforced, typed") {
    graft.GraftFunctions.register(spark)
    import spark.implicits._
    Seq("p", "q", "p").toDF("s").createOrReplaceTempView("mg_in")
    val got = spark.sql("SELECT misra_gries(s, 2) FROM mg_in").head()
      .getSeq[Row](0).map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("p" -> 2L, "q" -> 1L))
    // wrong input type fails at analysis, not execution
    Seq(1L, 2L).toDF("v").createOrReplaceTempView("mg_bad")
    val err = intercept[Exception](
      spark.sql("SELECT misra_gries(v, 2) FROM mg_bad").head())
    assert(err.getMessage.contains("string"))
  }
}
