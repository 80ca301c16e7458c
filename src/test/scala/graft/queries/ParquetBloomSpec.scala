package graft.queries

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of parquet BLOOM-FILTER row-group pruning — the
  * point-lookup complement to LayoutSpec's min/max proof: a
  * high-entropy unsorted key defeats min/max stats (every row group
  * spans nearly the full value range) AND dictionary filtering (all
  * values distinct, so encoding falls back to plain), so an equality
  * probe decodes everything… unless the files carry bloom filters,
  * in which case only the row group actually containing the probed
  * value (plus false positives) decodes. This is the layout a 100 TB
  * id-lookup table is written in when it can't afford to be sorted
  * by the lookup key.
  */
class ParquetBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  /** High-entropy unique key per order: the md5-derived 60-bit id. */
  private def keyed() =
    Tables.read(spark, dir, "orders").select(
      conv(substring(md5(col("o_orderkey").cast("string")), 1, 15), 16, 10)
        .cast("long").as("k"),
      col("o_orderkey"))

  private def decodedRows(path: String, probe: Long): (Long, Long) = {
    val df = spark.read.parquet(path).where(col("k") === probe)
    val n = df.collect().length.toLong
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    (n, scans.head.metrics("numOutputRows").value)
  }

  test("bloom-filtered files skip row groups on a point lookup; plain files decode all") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val out = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    try {
      val rows = keyed().localCheckpoint()
      val total = rows.count()
      val probe = rows.orderBy(col("o_orderkey")).select(col("k"))
        .head().getLong(0)
      // same 16 unsorted files, with and without a bloom filter on k
      rows.repartition(16)
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", total.toString)
        .parquet(s"$out/bloom")
      rows.repartition(16)
        .write.mode("overwrite").parquet(s"$out/plain")

      val (bCount, bDecoded) = decodedRows(s"$out/bloom", probe)
      val (pCount, pDecoded) = decodedRows(s"$out/plain", probe)
      // both layouts find the row...
      assert(bCount == 1 && pCount == 1)
      // ...the plain layout decodes (nearly) every row group: random
      // high-entropy keys make min/max spans useless...
      assert(pDecoded >= (total * 0.9).toLong,
        s"plain layout unexpectedly skipped: $pDecoded of $total")
      // ...while bloom filters confine the probe to the one matching
      // row group (~1/16 of rows) plus any false-positive groups.
      assert(bDecoded <= (total / 4),
        s"bloom layout decoded $bDecoded of $total rows — no skipping")
      assert(bDecoded < pDecoded)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
