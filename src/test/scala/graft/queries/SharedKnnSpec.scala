package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-12 recall-gate share: `knn_recall` scores each ANN
  * method's persisted (q_id, neighbor) slice instead of re-running all
  * six pipelines per gate invocation — and the share must NOT leak
  * into the REGISTERED method queries via CacheManager plan
  * substitution (the round-11 `minhash_lsh` honesty lesson: a cached
  * plan that is semantically equal to a registered query silently
  * turns that query's bench into a cache read).
  */
class SharedKnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("gate hits equal a direct re-derivation from the method queries") {
    val gate = Similarity.knnRecall(spark, dir)
      .select(col("method"), col("hits")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Similarity.knnBrute(spark, dir)
      .where(col("rnk") <= 3).select(col("q_id"), col("neighbor"))
    def direct(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("q_id"), col("neighbor"))
        .join(truth, Seq("q_id", "neighbor"), "left_semi").count()
    assert(gate("knn_ivf") == direct(Similarity.knnIvf(spark, dir)))
    assert(gate("knn_lsh") == direct(Similarity.knnLsh(spark, dir)))
    assert(gate("knn_pq") == direct(Similarity.knnPq(spark, dir)))
    assert(gate.size == 6)
  }

  test("cache-hit observable: one persisted slice per method") {
    Similarity.knnRecall(spark, dir).collect() // populates all six
    val first = Similarity.knnMethodShared(
      spark, dir, "knn_ivf", Similarity.knnIvf)
    assert(first.storageLevel.useMemory || first.storageLevel.useDisk)
    Similarity.knnRecall(spark, dir).collect()
    assert(Similarity.knnMethodShared(
      spark, dir, "knn_ivf", Similarity.knnIvf) eq first)
  }

  test("registered method queries are NOT cache-substituted") {
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    Similarity.knnRecall(spark, dir).collect() // shares live
    // the method queries may read the legitimately-shared vector
    // relation (4-col InMemory scan) but must never read the gate's
    // (q_id, neighbor) slice — that would turn their bench into a
    // cache read (the round-11 minhash_lsh honesty lesson). AQE off so
    // the physical tree is directly traversable (PlanShapeSpec idiom).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try for (df <- Seq(
        Similarity.knnIvf(spark, dir), Similarity.knnIvfKmeans(spark, dir),
        Similarity.knnIvfProbe2(spark, dir), Similarity.knnIvfPq(spark, dir),
        Similarity.knnLsh(spark, dir), Similarity.knnPq(spark, dir))) {
      val leaked = df.queryExecution.executedPlan.collect {
        case s: InMemoryTableScanExec
            if s.output.map(_.name).toSet == Set("q_id", "neighbor") => s
      }
      assert(leaked.isEmpty,
        "registered kNN query would read the gate's cached slice")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
