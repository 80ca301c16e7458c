package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: writing both fact tables bucketed by
  * the join key lets the sort-merge join run with ZERO exchanges —
  * the repeated-workload layout for fact⋈fact joins at 100 TB
  * (SCALE.md). Verified by asserting the physical plan contains no
  * Exchange.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed fact tables join without any shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b")
        .saveAsTable("li_b")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord_b")
        .saveAsTable("ord_b")

      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      // the final groupBy (different key) legitimately shuffles; the
      // JOIN subtree — everything below the SortMergeJoin — must not
      val plan = joined.queryExecution.executedPlan.toString
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!joinSubtree.contains("Exchange"),
        s"bucketed join subtree should not shuffle:\n$plan")

      // and it computes the same thing as the plain-parquet join
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(
          spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
    }
  }

  test("ORC round trip preserves rows and pushes filters to the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val dir = "/root/testdata/sf0.001"
    val src = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    // row-for-row identical content
    assert(back.count() == src.count())
    assert(
      back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "ORC round trip changed rows")
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.where(col("o_orderkey") === 7L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_orderkey"),
      s"no pushed filter in ORC scan:\n$plan")
  }

  test("XML round trip preserves rows (Spark 4 built-in xml source)") {
    // like ORC: DuckDB reads no XML, so the connector is spec-asserted
    // (round-trip equality + schema), not oracle-compared
    val out = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val dir = "/root/testdata/sf0.001"
    val src = spark.read.parquet(s"$dir/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey")
    src.write.mode("overwrite")
      .option("rootTag", "nations").option("rowTag", "nation")
      .format("xml").save(out)
    val back = spark.read
      .option("rowTag", "nation")
      .schema(src.schema) // pin types: XML infers strings otherwise
      .format("xml").load(out)
    assert(back.count() == src.count())
    assert(
      back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
      "XML round trip changed rows")
  }

  test("partitioned write is pruned to one partition at read time") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val dir = "/root/testdata/sf0.001"
    Tables.events(spark, dir)
      .write.mode("overwrite")
      .partitionBy("event_type")
      .parquet(s"$out/events_p")
    val one = spark.read.parquet(s"$out/events_p")
      .where(col("event_type") === "purchase")
    // the directory-partition filter must prune at planning time, not
    // scan-and-filter: the scan node reports it as a PartitionFilter
    // and reads only the matching directory
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"partition filter not pushed:\n$scan")
    val expected = Tables.events(spark, dir)
      .where(col("event_type") === "purchase").count()
    assert(one.count() == expected && expected > 0)
  }
}
