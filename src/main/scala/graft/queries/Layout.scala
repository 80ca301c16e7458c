package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: how 100 TB gets ARRANGED so queries skip
  * most of it. Z-ordering interleaves the bits of several filter
  * dimensions into one sort key; files written in that order carry
  * tight min/max ranges on EVERY interleaved dimension at once, so a
  * scan with a predicate on any of them prunes most files — the
  * multi-dimensional generalization of partitioning-by-one-column
  * (which prunes perfectly on one dimension and not at all on the
  * others).
  */
object Layout {

  private val Bits = 10 // per dimension => 20-bit z-values
  private val BucketBits = 6 // 64 file buckets = top 6 z-bits

  /** Interleave the low `Bits` bits of x (even positions) and y (odd
    * positions) — plain integer arithmetic, identical in any engine.
    */
  private def zval(x: Column, y: Column): Column =
    (0 until Bits).map { i =>
      (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)

  private def zvalSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)}) + " +
        s"((($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString("(", " + ", ")")

  /** `zorder_layout`: lay orders out by the z-value of (customer
    * bucket, price bucket) and report each file bucket's min/max on
    * BOTH dimensions — the pruning ranges a scan would use. The whole
    * query is one narrow projection + one aggregate: the integer
    * z-key is exactly what `df.repartitionByRange(zval).sortWithin…`
    * would write at ingest, and the per-bucket spans measure layout
    * quality (sum of span products ≪ naive layouts ⇒ a predicate on
    * either dimension prunes most buckets).
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val mask = (1L << Bits) - 1
    val ord = Tables.read(spark, dir, "orders").select(
      (col("o_custkey").bitwiseAND(lit(mask))).as("x"),
      (Quantize.cents(col("o_totalprice"))
        .divide(lit(6000)).cast("long").bitwiseAND(lit(mask))).as("y"))
    ord
      .withColumn(
        "bucket", shiftright(zval(col("x"), col("y")), 2 * Bits - BucketBits))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn(
        "span_product",
        (col("x_max") - col("x_min") + 1) * (col("y_max") - col("y_min") + 1))
      .orderBy("bucket")
  }

  def zorderLayoutOracle: String = {
    val mask = (1L << Bits) - 1
    s"""WITH pts AS (
       |  SELECT o_custkey & $mask AS x,
       |    (${Quantize.centsSql("o_totalprice")} // 6000) & $mask AS y
       |  FROM orders),
       |z AS (
       |  SELECT x, y, ${zvalSql("x", "y")} >> ${2 * Bits - BucketBits} AS bucket
       |  FROM pts)
       |SELECT bucket, CAST(COUNT(*) AS BIGINT) n,
       |  MIN(x) x_min, MAX(x) x_max, MIN(y) y_min, MAX(y) y_max,
       |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS span_product
       |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("zorder_layout", zorderLayout, Some(zorderLayoutOracle)))
}
