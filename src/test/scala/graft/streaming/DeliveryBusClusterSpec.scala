package graft.streaming

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Drives [[DeliveryBusClusterCheck]] in a subprocess: a second
  * SparkContext (master `local-cluster[2,1,1024]`) cannot coexist
  * with the suite's shared local[*] one, and the whole point is
  * separate executor JVMs. Asserts the check's three contract points
  * (per-executor shard registration, executor-side delivery writes,
  * loud failure for an unregistered JVM) via its exit status.
  */
class DeliveryBusClusterSpec extends AnyFunSuite {

  test("DeliveryBus contract holds on a real multi-JVM local-cluster") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bus").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = new java.io.File(
      sys.props("java.home"), "bin/java").getAbsolutePath
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g",
      "-cp", sys.props("java.class.path"),
      "graft.streaming.DeliveryBusClusterCheck", tmp)
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'))
    // local-cluster workers resolve the Spark installation via
    // SPARK_HOME; the in-JVM executor command builder also needs
    // SPARK_SCALA_VERSION (normally exported by load-spark-env.sh,
    // which never runs here) or it hunts for source-build directories
    val exit = Process(cmd, None,
      "SPARK_HOME" -> "/opt/spark",
      "SPARK_SCALA_VERSION" -> "2.13").!(logger)
    val tail = out.toString.linesIterator.toSeq.takeRight(40).mkString("\n")
    assert(exit == 0, s"cluster check failed (exit $exit):\n$tail")
    assert(out.toString.contains("CLUSTER-CHECK-OK"), tail)
  }
}
