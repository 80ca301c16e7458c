package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the target scale
  * factor and prints one JSON line. Queries are forced through the
  * `noop` sink so full column projections are computed (a bare
  * `count()` lets Catalyst prune every projection away), after one
  * untimed warmup pass to absorb JIT/classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Codegen class cache sized to the registry (round 11): the
      // 100-entry default LRU thrashes across a 392-query session —
      // whole-stage classes are evicted and Janino-recompiled on
      // every timed pass (measured as the uniform full-suite
      // inflation vs isolated runs). Static conf, so it is set at
      // session build; a few thousand generated classes cost tens of
      // MB against the 16g driver heap.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // optional comma-separated name filter for focused local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warmup: exercise scans, codegen and shuffle machinery once
    for (n <- names) {
      try run(n)
      catch { case _: Throwable => () }
    }
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { run(name); true }
        catch { case _: Throwable => false }
      // -1 marks a failed query so a regression can't masquerade as a
      // fast pass
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // Environment fingerprint + calibration: a fixed CPU-bound probe
    // (sum/xor reduction over a 200M generated range — no I/O, plan
    // identical every round) timed min-of-3 AFTER its own warmup. Round
    // 7 burned a full investigation proving a 1.63x cross-round swing
    // was machine drift, not regression; with calibration_s in the
    // artifact, next time the drift is self-evident — per-query ratios
    // normalize by it (SCALE.md cites normalized numbers).
    def calibrate(): Double = {
      def probe(): Unit = spark.range(0, 200000000L, 1, cpus.toInt)
        .selectExpr("sum(id * 3 + 1) s", "sum(id ^ 2654435761) x")
        .write.format("noop").mode("overwrite").save()
      probe() // warmup: codegen + JIT
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        probe()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val calibration = calibrate()
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val procs = Runtime.getRuntime.availableProcessors

    val firstPass = names.map(n => n -> timed(n))
    // Re-run EVERY query and keep min-of-runs: this machine swings up
    // to +50% under concurrent load, and a one-off spike on a single
    // query otherwise reads as a regression in the round artifact. The
    // min of two runs is a far better estimate of the plan's true cost
    // than either sample — and retrying all of them keeps the
    // methodology uniform across queries, so cross-query ratios (e.g.
    // the SCALE.md 10x table) compare like with like.
    val results = firstPass.map { case (name, t1) =>
      if (t1 >= 0) {
        val t2 = timed(name)
        name -> (if (t2 >= 0) math.min(t1, t2) else t1)
      } else name -> t1
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","calibration_s":$calibration,""" +
        s""""loadavg":$loadAvg,"cpus":$procs}"""
    println(line)
    // The driver captures stdout with a bounded tail; a 191-query JSON
    // line can lose its head to truncation (round 5's BENCH artifact
    // did). Persist the full line so per-query numbers always survive.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    spark.stop()
  }
}
