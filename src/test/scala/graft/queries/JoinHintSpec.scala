package graft.queries

import graft.TestSpark
import org.apache.spark.sql.execution.joins.{
  BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy selection under hints: the four production levers
  * (BROADCAST, MERGE, SHUFFLE_HASH, and the default) each produce the
  * requested physical join, and all four agree on the answer — the
  * property a 100 TB operator RELIES on when a memory ceiling forces
  * SMJ or a dimension fits in a broadcast. Also pins the
  * hint-survives-transforms rule (a projection between hint and join
  * must not drop it) — losing a broadcast hint silently re-plans the
  * exchange, the regression PlanShapeSpec's cartesian ban cannot see.
  */
class JoinHintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def orders = Tables.read(spark, dir, "orders")
    .select(col("o_custkey"), col("o_totalprice"))
  private def cust = Tables.read(spark, dir, "customer")
    .select(col("c_custkey"), col("c_mktsegment"))

  // AQE wraps the tree in AdaptiveSparkPlanExec whose children only
  // materialize at execution — plan-shape assertions read the
  // non-adaptive compile, like PlanShapeSpec's
  private def planOf(df: => org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def answer(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq

  test("each join hint yields its physical operator; answers agree") {
    val base = orders.join(cust.hint("broadcast"),
      col("o_custkey") === col("c_custkey"))
    assert(planOf(base).collectFirst {
      case b: BroadcastHashJoinExec => b
    }.nonEmpty, "broadcast hint must plan BroadcastHashJoinExec")

    val merge = orders.join(cust.hint("merge"),
      col("o_custkey") === col("c_custkey"))
    assert(planOf(merge).collectFirst {
      case m: SortMergeJoinExec => m
    }.nonEmpty, "merge hint must plan SortMergeJoinExec")

    val shj = orders.join(cust.hint("shuffle_hash"),
      col("o_custkey") === col("c_custkey"))
    assert(planOf(shj).collectFirst {
      case s: ShuffledHashJoinExec => s
    }.nonEmpty, "shuffle_hash hint must plan ShuffledHashJoinExec")

    val want = answer(base)
    assert(answer(merge) == want, "SMJ answer must equal BHJ answer")
    assert(answer(shj) == want, "SHJ answer must equal BHJ answer")
  }

  test("a projection between hint and join preserves the hint") {
    val hinted = cust.hint("merge")
      .withColumn("seg2", upper(col("c_mktsegment"))) // transform AFTER hint
    val df = orders.join(hinted, col("o_custkey") === col("c_custkey"))
    assert(planOf(df).collectFirst {
      case m: SortMergeJoinExec => m
    }.nonEmpty, "hint lost through an intervening projection")
  }
}
