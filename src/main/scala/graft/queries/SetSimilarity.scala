package graft.queries

import graft.functions.PairFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join via PREFIX FILTERING (the SSJoin /
  * PPJoin family, Chaudhuri et al. ICDE'06): the third member of the
  * near-dup candidate-generation trio beside banded MinHash
  * (approximate, bounded) and the capped posting-list expansion
  * (exact but lower-bounded). Prefix filtering is BOTH exact and
  * bounded-candidate: a pair can reach Jaccard >= t only if the two
  * docs share a shingle inside their df-ordered prefixes, so only
  * prefix postings expand into pairs — and prefixes are dominated by
  * RARE shingles (the global order puts low-df shingles first), which
  * is precisely what kills the hot-shingle quadratic traffic the
  * exact baseline suffers.
  */
object SetSimilarity {

  /** Jaccard threshold (ppm): pairs at >= 0.8 — the near-replica
    * band a crawl-dedup keep/drop decision uses.
    */
  private[queries] val ThresholdPpm = 800000L

  /** `jaccard_prefix_join`: all document pairs with exact shingle
    * Jaccard >= 0.8, found WITHOUT enumerating the exact baseline's
    * Σ df² co-shingle pairs.
    *
    * Plan shape (scale story): shingle df is one vocabulary-sized
    * aggregate; the prefix relation is a doc-PARTITIONED row_number
    * over (df, shingle) — never a global window — keeping the first
    * p = n - ceil(0.8·n) + 1 shingles of each doc (for t = 0.8
    * that's ~n/5 rows, a 5x posting shrink before any join); pair
    * expansion then runs over PREFIX postings only, where hot
    * stopword-class shingles can't appear unless a doc consists of
    * almost nothing else. Verification joins the two shingle arrays
    * (the shared DISK_ONLY relation — no re-shingling) and computes
    * the exact intersection narrowly. Lossless by the prefix-filter
    * lemma: jacc(x,y) >= t forces |x∩y| >= ceil(t·|x|) and
    * >= ceil(t·|y|), and the smallest common shingle in global
    * (df, shingle) order then sits inside BOTH prefixes, so the
    * candidate join cannot miss a qualifying pair — the oracle is
    * the plain exact all-pairs join.
    *
    * jacc_ppm is floor-division integer, so the DuckDB comparison is
    * bit-exact.
    */
  def jaccardPrefixJoin(spark: SparkSession, dir: String): DataFrame = {
    val docarr = Dedup.docShingleArraysShared(spark, dir)
    val sh = docarr.select(
      col("doc_id"), size(col("arr")).cast("long").as("n"),
      explode(col("arr")).as("shingle"))
    val df = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val prefix = sh
      .join(df, "shingle")
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("doc_id"))
            .orderBy(col("df"), col("shingle"))))
      // p = n - ceil(0.8 n) + 1; ceil(4n/5) = (4n+4) div 5 exactly
      .where(col("rk") <= col("n") - expr("(4 * n + 4) div 5") + 1)
      .select(col("shingle"), col("doc_id"))
    val cands = prefix
      .groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .where(size(col("ds")) > 1)
      .select(explode(PairFunctions.orderedPairs(col("ds"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
    val arrs = docarr.select(col("doc_id"), col("arr"))
    cands
      .join(arrs.select(col("doc_id").as("a"), col("arr").as("arr_a")), "a")
      .join(arrs.select(col("doc_id").as("b"), col("arr").as("arr_b")), "b")
      .select(
        col("a"), col("b"),
        size(array_intersect(col("arr_a"), col("arr_b")))
          .cast("long").as("inter"),
        size(col("arr_a")).cast("long").as("na"),
        size(col("arr_b")).cast("long").as("nb"))
      .withColumn("jacc_ppm", expr("inter * 1000000 div (na + nb - inter)"))
      .where(col("jacc_ppm") >= ThresholdPpm)
      .orderBy("a", "b")
  }

  /** Oracle: the exact all-pairs Jaccard join (prefix filtering is
    * lossless, so the bounded plan must reproduce it bit-for-bit).
    */
  def jaccardPrefixJoinOracle: String =
    s"""WITH ${Dedup.ShinglesSql},
       |${Dedup.jaccSql()}
       |SELECT a, b, inter, na, nb,
       |  inter * 1000000 // (na + nb - inter) AS jacc_ppm
       |FROM jacc
       |WHERE inter * 1000000 // (na + nb - inter) >= $ThresholdPpm
       |ORDER BY a, b""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "jaccard_prefix_join", jaccardPrefixJoin,
      Some(jaccardPrefixJoinOracle)))
}
