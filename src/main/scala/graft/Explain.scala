package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan for the
  * named queries and times an action over each, so shuffle/broadcast/
  * codegen decisions can be reviewed per operator.
  *
  * Usage: runMain graft.Explain <sfDir> <query...|all> [--no-explain]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val noExplain = args.contains("--no-explain")
    val names = args.drop(1).filterNot(_.startsWith("--")) match {
      case Array() | Array("all") => SparkEntry.queries.keys.toSeq.sorted
      case xs => xs.toSeq
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true") // match Bench/Verify
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
    for (n <- names) {
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (!noExplain) df.explain("formatted")
      val t0 = System.nanoTime()
      val cnt = df.count()
      println(f"[$n] rows=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
