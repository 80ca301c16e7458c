package graft.functions

import graft.TestSpark
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bitmap aggregate is EXACT: popcount(OR of set-bits) must equal
  * the built-in `count(distinct)` under every partitioning (merge =
  * bitwise OR is order/shape invariant), and keys outside the dense
  * domain must fail loudly — never fold into a wrong bit.
  */
class BitmapDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def orders = Tables.read(spark, dir, "orders")

  test("bitmap cardinality == count(distinct) per group") {
    val got = orders.groupBy("o_orderpriority")
      .agg(BitmapFunctions.bitmapDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("exact under any partitioning / merge tree") {
    def run(parts: Int) = orders.repartition(parts)
      .groupBy("o_orderpriority")
      .agg(BitmapFunctions.bitmapDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13) && run(13) == run(32))
  }

  test("nulls are ignored, empty group counts zero") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", 1L), ("a", null), ("b", null))
      .toDF("g", "k")
    val got = df.groupBy("g")
      .agg(BitmapFunctions.bitmapDistinct(col("k"), 1024).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }

  test("slice bitmaps OR-merged == direct distinct (bitmap as value)") {
    // build per-priority-and-clerk-shard bitmaps, then roll up per
    // priority by OR — must equal the one-shot distinct count
    val sliced = orders
      .groupBy(col("o_orderpriority"), (col("o_orderkey") % 7).as("shard"))
      .agg(BitmapFunctions.bitmapAgg(col("o_custkey")).as("bm"))
      .groupBy("o_orderpriority")
      .agg(BitmapFunctions.bitmapCount(
        BitmapFunctions.bitmapOr(col("bm"))).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sliced == direct)
  }

  test("bitmap family is reachable from SQL") {
    graft.GraftFunctions.register(spark)
    orders.createOrReplaceTempView("orders_bm")
    val got = spark.sql(
      """SELECT bitmap_count(bitmap_or(bm)) n FROM (
        |  SELECT bitmap_agg(o_custkey, 1048576) bm
        |  FROM orders_bm GROUP BY o_orderkey % 5)""".stripMargin)
      .collect().head.getLong(0)
    val direct = spark.sql(
      "SELECT bitmap_distinct(o_custkey, 1048576) FROM orders_bm")
      .collect().head.getLong(0)
    assert(got == direct &&
      got == orders.select(countDistinct(col("o_custkey"))).collect().head.getLong(0))
  }

  test("bitmap_and == set intersection on random key sets (incl. cross-container)") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 10) {
      // keys spanning several 64Ki containers, so the container-drop
      // path (no common container / no intersecting word) exercises
      val a = Set.fill(50 + rnd.nextInt(100))(rnd.nextLong(1L << 20))
      val b = Set.fill(50 + rnd.nextInt(100))(rnd.nextLong(1L << 20)) ++
        a.take(rnd.nextInt(20))
      def ser(s: Set[Long]) = {
        val c = RoaringLite.empty
        s.foreach(RoaringLite.set(c, _))
        RoaringLite.serialize(c)
      }
      val and = RoaringLite.and2(ser(a), ser(b))
      assert(RoaringLite.popcount(and) == (a & b).size.toLong)
      // result round-trips and equals the directly-built intersection
      assert(java.util.Arrays.equals(and, ser(a & b)))
    }
  }

  test("bitmap_andnot == set difference on random key sets (incl. cross-container)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 10) {
      val a = Set.fill(50 + rnd.nextInt(100))(rnd.nextLong(1L << 20))
      val b = Set.fill(50 + rnd.nextInt(100))(rnd.nextLong(1L << 20)) ++
        a.take(rnd.nextInt(20))
      def ser(s: Set[Long]) = {
        val c = RoaringLite.empty
        s.foreach(RoaringLite.set(c, _))
        RoaringLite.serialize(c)
      }
      val diff = RoaringLite.andNot2(ser(a), ser(b))
      assert(RoaringLite.popcount(diff) == (a -- b).size.toLong)
      assert(java.util.Arrays.equals(diff, ser(a -- b)))
      // algebra identity: |a\b| + |a∩b| == |a|
      assert(
        RoaringLite.popcount(diff) +
          RoaringLite.popcount(RoaringLite.and2(ser(a), ser(b))) ==
          a.size.toLong)
    }
  }

  test("out-of-domain key fails loudly, naming the cap") {
    import spark.implicits._
    val df = Seq(5L, 2048L).toDF("k")
    val e = intercept[Exception] {
      df.agg(BitmapFunctions.bitmapDistinct(col("k"), 1024)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c =>
        c.getMessage != null && c.getMessage.contains("outside domain")),
      s"expected the dense-domain guard, got: $e")
  }
}
