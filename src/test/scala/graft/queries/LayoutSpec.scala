package graft.queries

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof that the z-order layout's span metric translates
  * into REAL I/O skipping: write the same rows z-ordered vs sorted by
  * a single dimension, scan with a predicate on the OTHER dimension,
  * and observe the parquet reader decode only the z-layout's matching
  * row groups (each file here is one row group, so file min/max stats
  * are row-group stats). The `zorder_layout` query computes the span
  * arithmetic; this spec demonstrates the win it claims.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private val Bits = 10
  private val mask = (1L << Bits) - 1

  /** The same (x, y) dims as zorder_layout, plus the interleaved z. */
  private def points(): DataFrame = {
    def zval(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      (0 until Bits).map { i =>
        (shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
          (shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
      }.reduce(_ + _)
    Tables.read(spark, dir, "orders").select(
        col("o_orderkey"),
        (col("o_custkey").bitwiseAND(lit(mask))).as("x"),
        (Quantize.cents(col("o_totalprice"))
          .divide(lit(6000)).cast("long").bitwiseAND(lit(mask))).as("y"))
      .withColumn("z", zval(col("x"), col("y")))
  }

  /** Rows DECODED by the scan (i.e. surviving row-group pruning) for a
    * y-predicate count over the given layout.
    */
  private def decodedRows(path: String): (Long, Long) = {
    // a RANGE predicate: prunable only via row-group min/max stats
    // (an equality would also engage parquet dictionary filtering,
    // which lets even the single-column layout skip coincidentally)
    val df = spark.read.parquet(path).where(col("y") < 8L)
    // run THIS queryExecution (count() would plan its own) so the scan
    // node's metrics below are the executed ones
    val n = df.collect().length.toLong
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan, got ${scans.size}")
    (n, scans.head.metrics("numOutputRows").value)
  }

  test("z-ordered files skip most row groups on a cross-dimension predicate") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE re-wraps the executed plan; the raw scan node keeps the test
    // simple and the metric unambiguous
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      val pts = points().localCheckpoint() // same rows into both layouts
      val total = pts.count()
      // 16 files each: one ordered by the interleaved z-value, one by
      // the x dimension alone (the classic single-column sort)
      pts.repartitionByRange(16, col("z")).sortWithinPartitions("z")
        .write.mode("overwrite").parquet(s"$out/zorder")
      pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.mode("overwrite").parquet(s"$out/xsort")

      val (zCount, zDecoded) = decodedRows(s"$out/zorder")
      val (xCount, xDecoded) = decodedRows(s"$out/xsort")
      // both layouts return identical results...
      assert(zCount == xCount && zCount > 0)
      // ...but the x-sorted layout's files all span the full y range,
      // so its scan decodes (nearly) everything...
      assert(xDecoded >= (total * 0.9).toLong,
        s"x-sorted layout unexpectedly skipped: $xDecoded of $total")
      // ...while the z-order layout confines y = 7 to the files whose
      // top y-bits cover it — 16 buckets interleave 2 bits per dim, so
      // only ~1/4 of the files qualify. Generous bound: under 40%.
      assert(zDecoded <= (total * 0.4).toLong,
        s"z-order layout decoded $zDecoded of $total rows — no skipping")
      assert(zDecoded < xDecoded)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }
}
