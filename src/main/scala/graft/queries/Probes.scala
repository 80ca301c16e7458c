package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe bodies for [[Prof]]: labeled sub-plans of queries under
  * optimization. Uses package-private query internals.
  */
object Probes {
  def scg(
      spark: SparkSession, sfDir: String,
      t: String => (=> DataFrame) => Unit): Unit = {
    import spark.implicits._
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
    t("docarr cache read")(Dedup.docShingleArraysShared(spark, sfDir))
    t("shingle explode")(Dedup.shingles(spark, sfDir))
    val ss = Dedup.shingles(spark, sfDir).join(docs, "doc_id")
    t("ss = explode+join")(ss)
    val srcs = docs.select(col("source")).distinct()
      .orderBy(col("source")).as[String].collect()
    val dim = srcs.zipWithIndex
      .map { case (s, i) => (s, 1L << i) }.toSeq.toDF("source", "bit")
    val masks = ss.join(broadcast(dim), "source")
      .groupBy(col("shingle"))
      .agg(expr("bit_or(bit)").as("m"))
    t("masks = groupBy(shingle)")(masks)
    val rolled = masks.groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    t("mask rollup")(rolled)
    val r = rolled.persist()
    println(s"PROFC masks=${masks.count()} rolled=${r.count()}")
    t("one greedy round")(
      r.where(col("m").bitwiseAND(lit(0L)) === 0)
        .join(broadcast(dim), col("m").bitwiseAND(col("bit")) =!= 0)
        .groupBy(col("source")).agg(sum(col("cnt")).as("gain"))
        .orderBy(col("gain").desc, col("source")).limit(1))
    r.unpersist()
  }

  def q9(
      spark: SparkSession, sfDir: String,
      t: String => (=> DataFrame) => Unit): Unit = {
    import org.apache.spark.sql.types.DecimalType
    val li = Tables.read(spark, sfDir, "lineitem")
    t("li 6-col scan")(li.select(
      col("l_partkey"), col("l_suppkey"), col("l_extendedprice"),
      col("l_discount"), col("l_quantity"), col("l_shipdate")))
    t("li scan+year")(li.select(
      col("l_partkey"), col("l_suppkey"),
      year(col("l_shipdate")).as("y")))
    val epC = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    t("li scan+1 dec cast")(li.select(col("l_partkey"), epC.as("e")))
    val dC = (col("l_discount").cast(DecimalType(18, 2)) * 100).cast("long")
    val qC = (col("l_quantity").cast(DecimalType(18, 2)) * 100).cast("long")
    t("li scan+3 dec casts")(
      li.select(col("l_partkey"), epC.as("e"), dC.as("d"), qC.as("q")))
    val part = Tables.read(spark, sfDir, "part").select(
      col("p_partkey"),
      (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("rp_c"))
    t("+3 bcast joins")(
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(
          broadcast(Tables.read(spark, sfDir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(
          broadcast(Tables.read(spark, sfDir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name"), epC.as("e")))
    t("full q9")(Relational.q9Profit(spark, sfDir))
    t("full q1")(Relational.q1Agg(spark, sfDir))
    t("li scan+to_date")(
      li.select(col("l_partkey"), to_date(col("l_shipdate")).as("d")))
    t("li scan+cents")(
      li.select(col("l_partkey"), Quantize.cents(col("l_extendedprice")).as("c")))
    t("li scan+rawts groupBy")(
      li.groupBy(col("l_shipdate")).agg(count(lit(1)).as("n")))
    t("li scan+year groupBy")(
      li.groupBy(year(col("l_shipdate")).as("y")).agg(count(lit(1)).as("n")))
    t("ord scan+to_date grpBy")(
      Tables.read(spark, sfDir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n")))
    t("ord scan+rawts grpBy")(
      Tables.read(spark, sfDir, "orders")
        .groupBy(col("o_orderdate")).agg(count(lit(1)).as("n")))
  }

  def pr(
      spark: SparkSession, sfDir: String,
      t: String => (=> DataFrame) => Unit): Unit = {
    // warm shared caches
    Graph.pagerank(spark, sfDir).write.format("noop").mode("overwrite").save()
    println("=== pagerank timed ===")
    val t0 = System.nanoTime()
    Graph.pagerank(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL pagerank ${(System.nanoTime() - t0) / 1e9}%.3f s")
    println("=== hits timed ===")
    val t1 = System.nanoTime()
    Graph.hits(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL hits ${(System.nanoTime() - t1) / 1e9}%.3f s")
    println("=== median_merge timed ===")
    val t2 = System.nanoTime()
    Statistics.medianMerge(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL median_merge ${(System.nanoTime() - t2) / 1e9}%.3f s")
  }

  def prpart(
      spark: SparkSession, sfDir: String,
      t: String => (=> DataFrame) => Unit): Unit = {
    val (outw, edges) = Graph.weightedTradeEdges(spark, sfDir)
    println(s"PROFC edges=${edges.count()} parts=${edges.rdd.getNumPartitions}")
    val r0 = edges.groupBy(col("dst"))
      .agg((sum(expr("(1000000L * 85 * w) div (tw * 100)"))
        + lit(150000L)).as("r"))
    t("iter on 64-part cache")(r0)
    for (p <- Seq(32, 8, 2, 1)) {
      val e = edges.coalesce(p)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      t(s"iter on $p-part cache")(
        e.groupBy(col("dst"))
          .agg((sum(expr("(1000000L * 85 * w) div (tw * 100)"))
            + lit(150000L)).as("r")))
      e.unpersist()
    }
  }

  def dcp(
      spark: SparkSession, sfDir: String,
      t: String => (=> DataFrame) => Unit): Unit = {
    val days = Tables.read(spark, sfDir, "orders")
      .select(
        to_date(col("o_orderdate")).as("d"),
        Quantize.cents(col("o_totalprice")).as("cents"))
      .groupBy(col("d"))
      .agg(sum(col("cents")).as("y"))
    t("days agg")(days)
    t("full query")(Analytics.doubleChangepoint(spark, sfDir))
  }
}
