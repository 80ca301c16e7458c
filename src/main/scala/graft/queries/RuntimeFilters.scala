package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Explicit runtime-filter (bloom-pruned join): build a bloom filter
  * over the small side's join keys, kill fact rows at the scan edge
  * before the exact join ever shuffles them. Spark's optimizer does
  * this automatically under `spark.sql.optimizer.runtime.bloomFilter
  * .enabled` when statistics line up; this operator is the explicit,
  * always-on form a pipeline uses when it KNOWS the dim side is
  * selective (e.g. one segment of customers against 100 TB of orders).
  *
  * The one-row materialization of the bloom binary mirrors what
  * Spark's InjectRuntimeFilter plans as a reused scalar subquery: the
  * build side aggregates to a single ~MB blob which then rides the
  * probe side's task binaries as a literal. Bloom filters have NO
  * false negatives, so pruned⋈dim ≡ full⋈dim exactly — the oracle is
  * the plain join — and false positives only cost the exact join a
  * few extra probe rows.
  */
object RuntimeFilters {

  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.read(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.eagerExpression(xxhash64(col("c_custkey"))))
        .toAggregateExpression())
    val bfBytes = dim.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = ColumnBridge.column(
      new BloomFilterMightContain(
        Literal.create(bfBytes, BinaryType),
        ColumnBridge.eagerExpression(xxhash64(col("o_custkey")))))
    val pruned = Tables.read(spark, dir, "orders").where(mightContain)
    pruned.join(dim, pruned("o_custkey") === dim("c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(Quantize.cents(col("o_totalprice"))).as("revenue_cents"))
      .orderBy("o_orderpriority")
  }

  def bloomPruneJoinOracle: String =
    s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) n_orders,
      |  CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) revenue_cents
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("bloom_prune_join", bloomPruneJoin, Some(bloomPruneJoinOracle)))
}
