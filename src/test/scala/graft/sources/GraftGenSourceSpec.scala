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
    val df = table(rows = 1000).select(sum(col("value")).as("s"))
    val got = df.collect().head.getLong(0)
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
}
