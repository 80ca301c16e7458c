package graft.queries

import java.security.MessageDigest

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Model checks for the round-7 mergeable-aggregation wave: the
  * minwise-merge identity (shard signature mins ≡ corpus recompute),
  * the bitmap hierarchy rollup against plain distinct sets, and the
  * scalar-quantization error bound that must hold structurally
  * (err ≤ range/254 + 1), all re-derived in plain Scala on sf0.001.
  */
class Wave8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("minhash_merge: merged corpus signature equals direct recompute") {
    val rows = Sketches.minhashMerge(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((1 to 4).map(r.getString), r.getLong(5))).toMap
    val (mergedSig, _) = rows("corpus_merged")
    val (directSig, _) = rows("corpus_direct")
    assert(mergedSig == directSig) // the map-side-combinability identity
    assert(rows("corpus_merged")._2 == 4L)

    // Plain-Scala model of one shard's signature AND the corpus's.
    val docs = Tables.read(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val bySource = docs.groupBy(_._1).view.mapValues(
      _.flatMap(_._2.split("\\s+").filter(_.nonEmpty)).toSet).toMap
    def sig(toks: Set[String]): Seq[String] =
      (0 until 4).map(h => toks.map(t => md5hex(s"$h|$t")).min)
    for ((src, toks) <- bySource) {
      assert(rows(src)._1 == sig(toks), s"shard signature for $src")
    }
    assert(directSig == sig(bySource.values.flatten.toSet))
  }

  test("bitmap_rollup_merge: every level equals plain distinct sets") {
    val custGeo = Tables.read(spark, dir, "customer")
      .join(Tables.read(spark, dir, "nation"),
        org.apache.spark.sql.functions.col("c_nationkey") ===
          org.apache.spark.sql.functions.col("n_nationkey"))
      .join(Tables.read(spark, dir, "region"),
        org.apache.spark.sql.functions.col("n_regionkey") ===
          org.apache.spark.sql.functions.col("r_regionkey"))
      .select("c_custkey", "n_name", "r_name").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val orderCust = Tables.read(spark, dir, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
    val byNation = orderCust.groupBy(c => custGeo(c)._1).view
      .mapValues(_.toSet).toMap
    val byRegion = orderCust.groupBy(c => custGeo(c)._2).view
      .mapValues(_.toSet).toMap
    val rows = Sketches.bitmapRollupMerge(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for ((n, s) <- byNation)
      assert(rows(("1_nation", n)) == s.size.toLong)
    for ((g, s) <- byRegion)
      assert(rows(("2_region", g)) == s.size.toLong)
    assert(rows(("3_corpus", "ALL")) == orderCust.toSet.size.toLong)
    // rollup consistency: regions partition nations, corpus tops all
    assert(rows.count(_._1._1 == "1_nation") >= rows.count(_._1._1 == "2_region"))
  }

  test("bpe_train learns the same merge table as a plain-Scala BPE model") {
    val words = Tables.read(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), "\\s+")).as("w"))
      .collect().map(_.getString(0)).filter(_.nonEmpty)
    val wc = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var sym: Map[Seq[String], Long] =
      wc.toSeq.groupBy(_._1.map(_.toString).toSeq).view
        .mapValues(_.map(_._2).sum).toMap
    val learned = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    for (_ <- 1 to 5) {
      val counts = scala.collection.mutable.Map[String, Long]()
      for ((s, c) <- sym; i <- 0 until s.length - 1) {
        val p = s(i) + " " + s(i + 1)
        counts(p) = counts.getOrElse(p, 0L) + c
      }
      val (bp, n) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      learned += ((bp, n))
      val Array(a, b) = bp.split(" ", 2)
      // the query's boundary-guarded string replace is left-to-right
      // NON-OVERLAPPING with the shared boundary space consumed —
      // replay exactly that rule, not greedy BPE
      sym = sym.toSeq.map { case (s, c) =>
        val merged = ("," + s.mkString(",") + ",")
          .replace("," + a + "," + b + ",", "," + a + b + ",")
          .stripPrefix(",").stripSuffix(",")
        merged.split(",").toSeq -> c
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val got = TrainingPipeline.bpeTrain(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val merges = got.filter(_._1 <= 5)
    assert(merges.length == 5)
    for ((m, i) <- merges.sortBy(_._1).zipWithIndex) {
      assert(m._2 == learned(i)._1, s"round ${i + 1} pair")
      assert(m._4 == learned(i)._2, s"round ${i + 1} count")
      assert(m._3 == learned(i)._1.replace(" ", ""))
    }
    val vocabRow = got.find(_._1 == 99L).get
    assert(vocabRow._4 == sym.keySet.flatten.size.toLong,
      "post-merge distinct symbol count")
  }

  test("embedding_quantize: 8-bit reconstruction error is bounded by range/254") {
    val rows = Similarity.embeddingQuantize(spark, dir).collect()
    assert(rows.length == 64) // one row per dimension
    for (r <- rows) {
      val (minMu, maxMu, maxErr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val bound = (maxMu - minMu) / 254 + 1
      assert(maxErr <= bound,
        s"dim ${r.getLong(0)}: err $maxErr exceeds bound $bound")
      assert(r.getLong(4) >= 0 && r.getLong(5) > 0)
    }
  }
}
