package graft.queries

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connector robustness a long-lived 100 TB corpus actually needs:
  * columns get added over time (schema evolution across parquet
  * batches) and upstream producers ship broken records (corrupt-line
  * capture instead of job failure).
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("parquet mergeSchema unifies evolving batches, null-filling old rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-evolve").toString
    // v1 batch: (id, text); v2 adds a quality score column
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
      .write.parquet(s"$tmp/b=1")
    Seq((3L, "gamma", 70L), (4L, "delta", 90L))
      .toDF("id", "text", "quality")
      .write.parquet(s"$tmp/b=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(tmp)
    assert(merged.columns.sorted.toSeq == Seq("b", "id", "quality", "text"))
    val rows = merged.select("id", "quality").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    // old rows surface the new column as NULL; new rows keep values
    assert(rows == Map(
      1L -> None, 2L -> None, 3L -> Some(70L), 4L -> Some(90L)))
    // and filters on the evolved column still prune correctly
    assert(merged.where(col("quality") >= 80).count() == 1L)
  }

  test("PERMISSIVE json capture: corrupt lines land in a column, not a crash") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-corrupt").toString
    val lines = Seq(
      """{"id": 1, "text": "good"}""",
      """{"id": oops not json""",
      """{"id": 2, "text": "also good"}""",
      "plain garbage")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/data.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))

    val df = spark.read
      .schema("id LONG, text STRING, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$tmp/data.jsonl")
      // corrupt-record visibility requires materializing the row
      // (Spark refuses a bare filter on only the corrupt column)
      .cache()
    assert(df.count() == 4L)
    assert(df.where(col("_corrupt_record").isNotNull).count() == 2L)
    assert(df.where(col("_corrupt_record").isNull)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    df.unpersist()
  }
}
