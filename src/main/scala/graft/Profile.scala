package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.PairFunctions

/** Ad-hoc stage bisection for slow queries (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[$name] rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docarr = Dedup.docShingleArrays(spark, dir)
    time("docarr")(docarr.count())
    time("docarr2")(docarr.count())
    val sh = Dedup.shingles(spark, dir)
    time("shingles")(sh.count())
    val post = sh.groupBy(col("shingle")).agg(collect_list(col("doc_id")).as("ds"))
    time("postings")(post.count())
    val pairs = post.where(size(col("ds")) > 1)
      .select(explode(PairFunctions.orderedPairs(col("ds"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    time("pairs")(pairs.count())
    time("full")(Dedup.ngramJaccard(spark, dir).count())
    time("full2")(Dedup.ngramJaccard(spark, dir).count())
    spark.stop()
  }
}
