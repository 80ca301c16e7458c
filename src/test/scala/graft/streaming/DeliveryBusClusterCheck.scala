package graft.streaming

import java.io.File
import java.lang.management.ManagementFactory

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSession

/** Beyond-local proof of the [[DeliveryBus]] contract, run as its own
  * driver JVM against `local-cluster[2,1,1024]` (a REAL standalone
  * cluster: separate executor JVMs, not local-mode threads):
  *
  *   1. each executor JVM registers a connection-shard sink under the
  *      shared bus id (the per-executor shard server of the SCALE.md
  *      deployment model);
  *   2. a repartitioned delivery job writes through
  *      `DeliveryBus.sink` — every write must land in an EXECUTOR JVM
  *      (never the driver), proving the partition-wise hand-off works
  *      where the sockets live;
  *   3. a task resolving an UNREGISTERED bus id must fail the job
  *      loudly with the deployment-error message (silent drops would
  *      look like subscriber loss).
  *
  * Launched by DeliveryBusClusterSpec as a subprocess (a second
  * SparkContext cannot coexist with the suite's local[*] one). Prints
  * CLUSTER-CHECK-OK and exits 0 on success.
  */
object DeliveryBusClusterCheck {
  private def jvmName: String =
    ManagementFactory.getRuntimeMXBean.getName.replace('@', '_')

  def main(args: Array[String]): Unit = {
    val tmp = args(0)
    val driverJvm = jvmName
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("deliverybus-cluster-check")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .config("spark.locality.wait", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sc = spark.sparkContext
      val busId = "cluster-bus"

      // 1) register a shard sink in EVERY executor JVM. Tasks land on
      // whichever executors have come up, so retry until BOTH JVMs
      // have registered (idempotent: same id, same behavior).
      def registerRound(): Set[String] =
        sc.parallelize(1 to 8, 8).mapPartitions { _ =>
          DeliveryBus.register(busId, (lid, bytes) => {
            val f = new File(tmp, s"delivery-$lid-$jvmName")
            val out = new java.io.FileOutputStream(f, true)
            try out.write(bytes)
            finally out.close()
          })
          Iterator(jvmName)
        }.collect().toSet
      val deadline = System.currentTimeMillis() + 120000
      var executorJvms = registerRound()
      while (executorJvms.size < 2 && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        executorJvms ++= registerRound()
      }
      require(executorJvms.size >= 2,
        s"expected 2 executor JVMs, saw $executorJvms")
      require(!executorJvms.contains(driverJvm),
        "executor tasks unexpectedly ran in the driver JVM")

      // 2) partition-wise delivery through the registered shards
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      (1L to 40L).map(i => (i % 4, s"chunk-$i\n")).toDF("sub_id", "chunk")
        .repartition(4, col("sub_id"))
        .foreachPartition {
          (rows: Iterator[org.apache.spark.sql.Row]) =>
            if (rows.hasNext) {
              val sink = DeliveryBus.sink(busId)
              rows.foreach(r => sink(r.getLong(0), r.getString(1).getBytes("UTF-8")))
            }
        }
      val proofs = new File(tmp).listFiles().filter(_.getName.startsWith("delivery-"))
      require(proofs.nonEmpty, "no delivery proof files written")
      require(proofs.forall(!_.getName.endsWith(driverJvm)),
        s"a delivery write ran in the DRIVER JVM: ${proofs.map(_.getName).toSeq}")
      val bytes = proofs.map(_.length()).sum
      require(bytes > 0, "proof files are empty")

      // 3) an unregistered bus id fails the job loudly
      val failure =
        try {
          sc.parallelize(1 to 4, 4).foreachPartition { _ =>
            DeliveryBus.sink("not-registered-anywhere")
            ()
          }
          None
        } catch { case e: SparkException => Some(e) }
      require(failure.isDefined, "unregistered bus id did NOT fail the job")
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      require(
        messages(failure.get).exists(_.contains("no DeliveryBus sink")),
        s"failure lacks the deployment-error message: ${messages(failure.get)}")

      // scalastyle:off println
      println("CLUSTER-CHECK-OK")
      // scalastyle:on println
    } finally spark.stop()
  }
}
