package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for optimization work: times labeled
  * sub-plans of a query with the noop sink (guide §1.4/§1.5). Not part
  * of the bench contract; run via
  * `sbt "runMain graft.Prof <probe>"`.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    def t(label: String)(df: => DataFrame): Unit = {
      // rebuild per run: eager localCheckpoint queries do their real
      // work at BUILD time, so hoisting the build out of the timed
      // region (as this tool originally did) under-reports them.
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm once, then min-of-2 like the bench
      val v = math.min(run(), run())
      println(f"PROF $label%-40s $v%8.3f s")
    }

    // per-job wall times: attribute a query's cost to its jobs
    if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = Option(starts.remove(j.jobId))
            val ms = t0.map(t => (System.nanoTime() - t) / 1e6).getOrElse(-1.0)
            println(f"JOB ${j.jobId}%4d ${ms}%9.1f ms")
          }
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = s.stageInfo
            val wall = (for {
              a <- i.completionTime; b <- i.submissionTime
            } yield a - b).getOrElse(-1L)
            val run = i.taskMetrics.executorRunTime
            val cpu = i.taskMetrics.executorCpuTime / 1000000
            println(
              f"  STAGE ${i.stageId}%4d tasks=${i.numTasks}%3d " +
                f"wall=${wall}%6d run=${run}%6d cpu=${cpu}%6d  ${i.name.take(60)}")
          }
        })
    }
    args.headOption.getOrElse("scg") match {
      case "scg" => queries.Probes.scg(spark, sfDir, t)
      case "dcp" => queries.Probes.dcp(spark, sfDir, t)
      case "q9" => queries.Probes.q9(spark, sfDir, t)
      case "pr" => queries.Probes.pr(spark, sfDir, t)
      case "prpart" => queries.Probes.prpart(spark, sfDir, t)
      // generic: time any registered queries (comma-separated) with the
      // bench methodology; with SPARK_GRAFT_JOBLOG=1 the listener above
      // attributes each to its jobs/stages.
      case "query" =>
        val names = args.drop(1).flatMap(_.split(',')).map(_.trim)
          .filter(_.nonEmpty)
        for (n <- names) t(n)(SparkEntry.queries(n)(spark, sfDir))
      // session-age bisect: time sentinel queries in a FRESH session,
      // again after running the whole registry once (the bench's aged
      // state), and again after clearCache() — attributes the in-suite
      // vs isolated gap to cached-relation state vs JVM aging. Pick
      // share-free sentinels or the clearCache leg reads low.
      case "aging" =>
        val names = args.drop(1).flatMap(_.split(',')).map(_.trim)
          .filter(_.nonEmpty)
        def leg(tag: String): Unit =
          for (n <- names) t(s"$tag:$n")(SparkEntry.queries(n)(spark, sfDir))
        leg("fresh")
        for ((n, fn) <- SparkEntry.queries)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
        leg("aged")
        spark.catalog.clearCache()
        leg("nocache")
      case other => println(s"unknown probe $other")
    }
    spark.stop()
  }
}
