package graft.functions

import graft.{GraftFunctions, TestSpark}
import graft.queries.{Sketches, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable KMV aggregate must produce the SAME estimates as the
  * relational WindowGroupLimit form (`kmv_distinct`) — "k smallest
  * distinct hashes" is merge-order invariant, so unlike Misra–Gries
  * the estimate itself is deterministic under any partitioning.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def hashed(parts: Int) =
    Tables.read(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("seg"),
        conv(substring(md5(col("o_custkey").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .repartition(parts)

  test("aggregate estimates == relational kmv_distinct estimates") {
    val agg = hashed(7)
      .groupBy("seg")
      .agg(SketchFunctions.kmvSketch(col("h"), 64).as("s"))
      .select(col("seg"), col("s.est").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rel = Sketches.kmvDistinct(spark, dir).collect()
      .filter(!_.getString(0).contains(":"))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(agg == rel)
  }

  test("estimates are invariant to partitioning (merge-order)") {
    def run(parts: Int) = hashed(parts)
      .groupBy("seg")
      .agg(SketchFunctions.kmvSketch(col("h"), 64).as("s"))
      .select(col("seg"), col("s.n_min"), col("s.theta"), col("s.est"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("below-k segments report exact counts; SQL surface registered") {
    GraftFunctions.register(spark)
    hashed(3).createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      """SELECT seg, kmv_sketch(h, 1000) s FROM kmv_in GROUP BY seg""")
      .selectExpr("seg", "s.n_min", "s.est").collect()
    assert(rows.nonEmpty)
    val exact = hashed(1).groupBy("seg")
      .agg(countDistinct(col("h")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), r.getString(0))
      assert(r.getLong(2) == exact(r.getString(0)), r.getString(0))
    }
  }
}
