ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "eventstreamdspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32g local default (round 12, was 16g from round 11): the 392-query
  // bench session carries codegen classes + shared caches for the whole
  // registry; at 8g the old-gen stayed near-full late in the run and GC
  // time inflated the back half of the suite; 32g (on a 128 GiB box)
  // also halves GC frequency mid-suite. Env-tunable as before.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Round 12, the in-suite session tax: the JDK-17 default 240 MB
  // reserved code cache fills across 392 queries x (warmup + 2 timed
  // passes) of whole-stage-codegen classes, and UseCodeCacheFlushing
  // then evicts hot JIT'd runtime methods (parquet reader, shuffle,
  // Janino itself) between a query's two timed runs — measured as a
  // uniform ~1.2-1.8x in-suite inflation vs isolated runs of the SAME
  // query (even the fixed calibration probe read 0.162 in-suite vs
  // 0.095 isolated). 2g reserves headroom for the whole registry;
  // full-bench A/B: 261.2 -> 218.0 s with median per-query -0.086 s.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "2g")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(' '))
