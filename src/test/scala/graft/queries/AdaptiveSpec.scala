package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proofs that the two runtime re-plan mechanisms the 100 TB design
  * leans on actually engage on this build of Spark — not just that
  * the configuration flags exist:
  *
  *  - AQE skew-join splitting: a hot key that would pin one reducer
  *    is split into parallel sub-partitions at runtime (the
  *    `skew=true` mark on the sort-merge join).
  *  - Dynamic partition pruning: a selective dim-side filter prunes
  *    fact partitions at RUNTIME via a reused broadcast subquery,
  *    so the fact scan never reads partitions the join would drop.
  */
class AdaptiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Throwable => None })
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    import spark.implicits._
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep AQE from fusing everything into one partition first
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      // 50k rows on ONE key vs 100 spread keys: the classic hot-key
      // shape that pins a single reducer without runtime splitting
      val left = spark.range(0, 55000)
        .select(
          when(col("id") < 50000, 0L).otherwise(col("id") % 100)
            .as("k"),
          col("id").as("v"))
      val right = spark.range(0, 100).select(
        col("id").as("k"), (col("id") * 7).as("w"))
      val joined = left.join(right, "k")
      // the action must run THIS dataset's QueryExecution — count()
      // would execute a derived plan and leave this one non-final
      assert(joined.collect().length == 55000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew split in final adaptive plan:\n$finalPlan")
    }
  }

  test("dynamic partition pruning prunes fact partitions at runtime") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dpp").toString
    // fact partitioned by p (20 partitions); dim maps p -> category
    spark.range(0, 20000)
      .select(col("id"), (col("id") % 20).as("p"))
      .write.mode("overwrite").partitionBy("p")
      .parquet(s"$tmp/fact")
    // p must match the partition column's read-back type (int): a
    // cast on the partition attribute defeats partition-filter
    // pushdown and with it the pruning subquery. The dim must also be
    // a real scan — on an in-memory relation the optimizer folds the
    // filter into the LocalTableScan and DPP no longer sees a
    // selective predicate to prune with.
    (0 until 20).map(p => (p, if (p < 3) "hot" else "cold"))
      .toDF("p", "cat")
      .write.mode("overwrite").parquet(s"$tmp/dim")
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // the dim side is tiny; let DPP reuse its broadcast
      "spark.sql.autoBroadcastJoinThreshold" -> "10MB") {
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim")
      val joined = fact.join(dim, Seq("p")).where(col("cat") === "hot")
      assert(joined.collect().length == 3000) // 3 of 20 partitions survive
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning subquery in plan:\n$plan")
    }
  }
}
