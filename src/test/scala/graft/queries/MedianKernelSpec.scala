package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Direct unit coverage for the [[Statistics.lowerMedianBy]] probe
  * kernel, pinned after the round-11 driver-side crossing-search
  * rewrite (grid → collect → Long arithmetic → LocalRelation star):
  * the generic-key edge cases the registry callers never exercise —
  * NULL-keyed groups, all-tied values, single-row groups, weighted
  * ranks — must keep flowing through every stage.
  */
class MedianKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def medians(rows: Seq[(java.lang.Long, Long)]): Map[Option[Long], (Long, Long)] =
    Statistics
      .lowerMedianBy(rows.toDF("g", "v"), Seq("g"), "v", None)
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        (r.getLong(1), r.getLong(2))))
      .toMap

  test("NULL-keyed group survives every stage (grid, star, slice join)") {
    val rows = Seq[(java.lang.Long, Long)](
      (1L, 10L), (1L, 20L), (1L, 30L),
      (null, 5L), (null, 7L), (null, 9L), (null, 11L))
    val m = medians(rows)
    assert(m(Some(1L)) == ((20L, 3L)))
    // lower median of {5,7,9,11}: k = (4+1) div 2 = 2 → 7
    assert(m(None) == ((7L, 4L)))
  }

  test("all-tied values: median is the tied value, single-row group works") {
    val m = medians(Seq[(java.lang.Long, Long)](
      (1L, 42L), (1L, 42L), (1L, 42L), (2L, -3L)))
    assert(m(Some(1L)) == ((42L, 3L)))
    assert(m(Some(2L)) == ((-3L, 1L)))
  }

  test("weighted lower median: first value whose cumulative weight reaches (W+1) div 2") {
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 6L))
      .toDF("g", "v", "wt")
    val r = Statistics.lowerMedianBy(df, Seq("g"), "v", Some("wt"))
      .collect().head
    // W = 9, target = 5; cum(10)=1, cum(20)=3, cum(30)=9 → 30
    assert(r.getLong(1) == 30L && r.getLong(2) == 9L)
  }

  test("wide domain: values spanning many shards still pick the exact median") {
    val vals = (0 until 1001).map(i => (1L, i * 1000003L))
    val m = medians(vals.map { case (g, v) => (java.lang.Long.valueOf(g), v) })
    assert(m(Some(1L)) == ((500L * 1000003L, 1001L)))
  }

  test("empty input yields an empty result with the kernel schema") {
    val df = Seq.empty[(Long, Long)].toDF("g", "v")
    val out = Statistics.lowerMedianBy(df, Seq("g"), "v", None)
    assert(out.columns.toSeq == Seq("g", "med", "wtot"))
    assert(out.count() == 0)
  }
}
