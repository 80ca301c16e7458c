package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The V2 pushdown contract, observed end to end: Catalyst delivers
  * id-range filters and required columns to the custom ScanBuilder,
  * accepted filters shrink the generated range (work, not cosmetics),
  * unsupported predicates stay as the post-scan residual, and
  * partition planning follows the slices option.
  */
class GraftGenSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def table(rows: Long = 1000, slices: Int = 4) =
    spark.read.format("graft.sources.GraftGenSource")
      .option("rows", rows.toString).option("slices", slices.toString)
      .load()

  test("full scan generates the deterministic table") {
    val df = table(rows = 500)
    assert(df.count() == 500)
    val r = df.where(col("id") === 123).collect().head
    assert(r.getLong(1) == 123 % 97)
    assert(r.getLong(2) == GraftGenSource.valueOf(123))
    assert(r.getString(3) == "T3")
  }

  test("id range predicates push into the scan and bound the range") {
    val df = table(rows = 100000)
      .where(col("id") >= 60000 && col("id") < 60500)
    val n = df.count()
    assert(n == 500)
    assert(GraftGenSource.lastRange == (60000L, 60500L),
      s"scan range not narrowed: ${GraftGenSource.lastRange}")
    assert(GraftGenSource.lastPushed.nonEmpty)
  }

  test("unsupported predicates remain as post-scan residual") {
    val df = table(rows = 10000)
      .where(col("id") < 1000 && col("bucket") === 5)
    // bucket filter can't push: the scan range only narrows on id
    assert(df.count() == (0L until 1000L).count(_ % 97 == 5))
    assert(GraftGenSource.lastRange == (0L, 1000L))
    assert(GraftGenSource.lastPushed.forall(_.references.sameElements(Array("id"))))
    // and the plan still carries a Filter for the residual
    val hasFilter = df.queryExecution.executedPlan.toString.contains("Filter")
    assert(hasFilter, "residual bucket predicate must survive above the scan")
  }

  test("column pruning reaches the reader (only requested columns generated)") {
    // a bare projection (no aggregate, which would take the
    // aggregate-pushdown path instead) exercises pruneColumns
    val df = table(rows = 1000).select(col("value"))
    val got = df.collect().map(_.getLong(0)).sum
    assert(GraftGenSource.lastSchema.fieldNames.toSeq == Seq("value"),
      s"pruned schema: ${GraftGenSource.lastSchema.fieldNames.toSeq}")
    assert(got == (0L until 1000L).map(GraftGenSource.valueOf).sum)
  }

  test("partition planning follows the slices option") {
    val df = table(rows = 1000, slices = 7)
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 1000)
    // empty range -> zero partitions, not a crash
    val empty = table(rows = 1000).where(col("id") >= 2000)
    assert(empty.count() == 0)
  }

  test("aggregate pushdown engages for bucket grouping; values exact") {
    val df = table(rows = 20000, slices = 4)
      .where(col("id") >= 3000 && col("id") < 17000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("id")).as("mn"),
        max(col("id")).as("mx"), sum(col("value")).as("sv"))
    val got = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(GraftGenSource.lastAggPushed.isDefined,
      "aggregation must reach the ScanBuilder")
    assert(GraftGenSource.lastRange == (3000L, 17000L),
      "filter pushdown must compose with aggregate pushdown")
    // the executed plan scans partial rows, not the raw table
    assert(df.queryExecution.executedPlan.toString
      .contains("GraftGenAggScan"))
    val expect = (3000L until 17000L).groupBy(_ % 97).map { case (b, g) =>
      b -> (g.size.toLong, g.min, g.max,
        g.map(GraftGenSource.valueOf).sum)
    }
    assert(got === expect)
  }

  test("aggregate pushdown declines unsupported shapes (tag group)") {
    val df = table(rows = 5000)
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
    val n = df.collect().map(_.getLong(1)).sum
    assert(n == 5000L)
    assert(GraftGenSource.lastAggPushed.isEmpty,
      "tag grouping must fall back to the raw scan")
  }
}
