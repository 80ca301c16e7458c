package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sink half of exactly-once at 100 TB: recovery replays a
  * micro-batch into the sink, so the write itself must be idempotent.
  * With `partitionOverwriteMode=dynamic`, re-writing a batch replaces
  * exactly the partitions it touches — a replay converges to the same
  * bytes instead of appending duplicates. Plus the ops-side
  * guardrail: writes bound their file count (a 1000-executor job
  * otherwise emits 1000 small files per partition per batch).
  */
class IdempotentSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dynamic partition overwrite makes batch replay idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-idem").toString
    val old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      def batch(ids: Range) = ids.map(i => (i.toLong, i % 3)).toDF("id", "p")
      // day-0 history in partitions 0-2
      batch(0 until 300).write.mode("overwrite").partitionBy("p")
        .parquet(tmp)
      // batch touching only partition 1 — then REPLAYED (failure sim)
      val b = Seq((1000L, 1), (1001L, 1)).toDF("id", "p")
      b.write.mode("overwrite").partitionBy("p").parquet(tmp)
      b.write.mode("overwrite").partitionBy("p").parquet(tmp) // replay
      val got = spark.read.parquet(tmp)
      // untouched partitions intact, replayed partition exact — no
      // duplicates, no loss
      assert(got.where(col("p") =!= 1).count() == 200L)
      assert(got.where(col("p") === 1).select("id").as[Long]
        .collect().sorted.toSeq == Seq(1000L, 1001L))
    } finally {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    }
  }

  test("compacted write bounds the output file count") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-compact").toString
    // 4-partition source would emit 4 files per table partition;
    // repartition by the partition column compacts to one each
    (0 until 4000).map(i => (i.toLong, i % 2)).toDF("id", "p")
      .repartition(col("p"))
      .write.mode("overwrite").partitionBy("p").parquet(tmp)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      .filter(f => f.toString.endsWith(".parquet"))
      .count()
    assert(files == 2L, s"expected one file per partition, got $files")
    assert(spark.read.parquet(tmp).count() == 4000L)
  }
}
